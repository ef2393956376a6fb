from . import box_parameters, encoders, hyper_field
from .box_parameters import (
    decode_box_3d,
    decode_boxes,
    encode_box_3d,
    encode_box_3d_yaw,
    init_box_parameters,
)
from .encoders import sinusoidal_encode
from .hyper_field import field_apply, hypernetwork_apply, init_hyper_field
