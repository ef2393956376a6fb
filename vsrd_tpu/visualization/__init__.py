from . import drawers
from .drawers import (
    draw_boxes_2d,
    draw_boxes_3d,
    draw_boxes_bev,
    draw_masks,
    draw_points_2d,
)
