from . import kitti360, rle, transforms
from .kitti360 import KITTI360Dataset, KITTIRawDataset, align_to_target
