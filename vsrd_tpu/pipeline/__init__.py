from . import frame, optimize, photometric, render_image, sharded
from .frame import FrameData, build_frame_data, synthetic_frame
from .optimize import OptimizationConfig, optimize_frame, init_params
