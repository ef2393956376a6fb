from . import geometry, grid_sample, iou2d, iou3d, matching, sampling, warping
from .geometry import (
    LINE_INDICES,
    backprojection,
    clip_boxes_to_image,
    clip_lines_to_front,
    essential_matrix,
    expand_to_4x4,
    fundamental_matrix,
    homogeneous,
    project_box_3d,
    projection,
    rectification_from_extrinsic,
    rotation_matrix,
    rotation_matrix_x,
    rotation_matrix_y,
    rotation_matrix_z,
    skew_symmetric_matrix,
    transform_points,
    translation_matrix,
)
from .iou3d import box_3d_iou
from .matching import linear_sum_assignment, masked_linear_sum_assignment
from .sampling import multinomial_no_replacement
