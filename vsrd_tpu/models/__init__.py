from . import box_parameters, detr3d, encoders, hyper_field
from .box_parameters import (
    decode_box_3d,
    decode_boxes,
    encode_box_3d,
    encode_box_3d_yaw,
    init_box_parameters,
)
from .detr3d import DETR3D, DeformableDETR3D, detr_loss
from .encoders import sinusoidal_encode
from .hyper_field import (
    field_apply,
    hypernetwork_apply,
    init_hyper_field,
    init_hyper_radiance_field,
)
