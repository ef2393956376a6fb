from . import meters, saver
from .meters import AverageMeter, EMAMeter, ProgressMeter, StopWatch
from .saver import Saver, has_final_checkpoint, load_checkpoint, save_checkpoint
