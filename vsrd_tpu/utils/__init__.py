from . import meters, model, saver
from .meters import AverageMeter, EMAMeter, ProgressMeter, StopWatch
from .model import average_update, ema_update, freeze_mask, spectral_normalize
from .saver import Saver, has_final_checkpoint, load_checkpoint, save_checkpoint
