from . import dicts, meters, model, saver
from .dicts import DefaultDict, Dict
from .meters import AverageMeter, EMAMeter, ProgressMeter, StopWatch
from .model import average_update, ema_update, freeze_mask, spectral_normalize
from .saver import Saver, has_final_checkpoint, load_checkpoint, save_checkpoint
