"""Geometric operations (rotations, projections, warping helpers).

TPU-native re-design of the reference geometry layer
(`/root/reference/vsrd/operations/geometric_operations.py:29-389`): every
function is a pure jax function over static-shape arrays, written to be
`vmap`-ed over views/instances rather than looped, and jit-safe (no
data-dependent Python control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 12 box edges in the KITTI-360 "evaluation" corner order
# (reference: scripts/main.py:26-30).
LINE_INDICES = jnp.array(
    [
        [0, 1], [1, 2], [2, 3], [3, 0],
        [4, 5], [5, 6], [6, 7], [7, 4],
        [0, 4], [1, 5], [2, 6], [3, 7],
    ],
    dtype=jnp.int32,
)


def expand_to_4x4(matrices: jax.Array) -> jax.Array:
    """Embed ...x3x3 (or smaller) matrices into homogeneous ...x4x4."""
    *batch, rows, cols = matrices.shape
    eye = jnp.broadcast_to(jnp.eye(4, dtype=matrices.dtype), (*batch, 4, 4))
    return eye.at[..., :rows, :cols].set(matrices)


def skew_symmetric_matrix(vectors: jax.Array) -> jax.Array:
    x, y, z = jnp.moveaxis(vectors, -1, 0)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def _rotation_stack(rows) -> jax.Array:
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def rotation_matrix_x(angles: jax.Array) -> jax.Array:
    angles = jnp.asarray(angles)
    c, s = jnp.cos(angles), jnp.sin(angles)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    return _rotation_stack([[one, zero, zero], [zero, c, -s], [zero, s, c]])


def rotation_matrix_y(angles: jax.Array) -> jax.Array:
    angles = jnp.asarray(angles)
    c, s = jnp.cos(angles), jnp.sin(angles)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    return _rotation_stack([[c, zero, s], [zero, one, zero], [-s, zero, c]])


def rotation_matrix_z(angles: jax.Array) -> jax.Array:
    angles = jnp.asarray(angles)
    c, s = jnp.cos(angles), jnp.sin(angles)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    return _rotation_stack([[c, -s, zero], [s, c, zero], [zero, zero, one]])


def rotation_matrix_y_from_cos_sin(cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Y-axis rotation from (cos, sin) pairs (reference:
    vsrd/models/detectors/box_parameters.py:5-13)."""
    one, zero = jnp.ones_like(cos), jnp.zeros_like(cos)
    return _rotation_stack([[cos, zero, sin], [zero, one, zero], [-sin, zero, cos]])


def rotation_matrix(rotation_axes: jax.Array, rotation_angles: jax.Array) -> jax.Array:
    """Axis-angle rotation (Rodrigues)."""
    cos = jnp.cos(rotation_angles)[..., None, None]
    sin = jnp.sin(rotation_angles)[..., None, None]
    outer = jnp.einsum("...m,...n->...mn", rotation_axes, rotation_axes)
    eye = jnp.eye(3, dtype=rotation_axes.dtype)
    return (1.0 - cos) * outer + sin * skew_symmetric_matrix(rotation_axes) + cos * eye


def translation_matrix(translation_vectors: jax.Array) -> jax.Array:
    *batch, _ = translation_vectors.shape
    eye = jnp.broadcast_to(
        jnp.eye(4, dtype=translation_vectors.dtype), (*batch, 4, 4)
    )
    return eye.at[..., :3, 3].set(translation_vectors)


def essential_matrix(rotation_matrices: jax.Array, translation_vectors: jax.Array) -> jax.Array:
    return skew_symmetric_matrix(translation_vectors) @ rotation_matrices


def fundamental_matrix(
    essential_matrices: jax.Array,
    intrinsic_matrices_1: jax.Array,
    intrinsic_matrices_2: jax.Array,
) -> jax.Array:
    inv1 = jnp.linalg.inv(intrinsic_matrices_1)
    inv2 = jnp.linalg.inv(intrinsic_matrices_2)
    return jnp.swapaxes(inv2, -2, -1) @ essential_matrices @ inv1


def homogeneous(points: jax.Array, value: float = 1.0) -> jax.Array:
    """Append a homogeneous coordinate along the last axis."""
    pad = jnp.full((*points.shape[:-1], 1), value, dtype=points.dtype)
    return jnp.concatenate([points, pad], axis=-1)


def transform_points(matrices: jax.Array, points: jax.Array) -> jax.Array:
    """Apply ...x4x4 homogeneous transforms to ...xNx3 points."""
    points_h = homogeneous(points)
    out = jnp.einsum("...mn,...kn->...km", matrices, points_h)
    return out[..., :3] / out[..., 3:]


def projection(
    coords: jax.Array,
    intrinsic_matrices: jax.Array,
    extrinsic_matrices: jax.Array | None = None,
) -> jax.Array:
    """World/camera homogeneous coords -> pixel-space coords.

    ``coords`` is ``[..., 4]`` (homogeneous); intrinsics broadcast over
    leading dims. Returns ``[..., 3]`` (x*z, y*z, z scaled by K).
    Mirrors reference geometric_operations.py:97-115.
    """
    if extrinsic_matrices is not None:
        coords = jnp.einsum("...mn,...n->...m", extrinsic_matrices, coords)
    coords = coords[..., :-1] / coords[..., -1:]
    return jnp.einsum("...mn,...n->...m", intrinsic_matrices, coords)


def backprojection(
    depth_maps: jax.Array,
    intrinsic_matrices: jax.Array,
    extrinsic_matrices: jax.Array | None = None,
) -> jax.Array:
    """Depth map [..., H, W] -> homogeneous world coords [..., H, W, 4].

    Mirrors reference geometric_operations.py:118-144.
    """
    h, w = depth_maps.shape[-2:]
    ys = jnp.arange(h, dtype=depth_maps.dtype)
    xs = jnp.arange(w, dtype=depth_maps.dtype)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    pixels = jnp.stack([grid_x, grid_y, jnp.ones_like(grid_x)], axis=-1)
    rays = jnp.einsum(
        "...mn,hwn->...hwm", jnp.linalg.inv(intrinsic_matrices), pixels
    )
    points = rays * depth_maps[..., None]
    points = homogeneous(points)
    if extrinsic_matrices is not None:
        points = jnp.einsum(
            "...mn,...hwn->...hwm", jnp.linalg.inv(extrinsic_matrices), points
        )
    return points


def clip_lines_to_front(lines: jax.Array, epsilon: float = 1e-6):
    """Clip 3D line segments to the z>0 half space.

    ``lines``: ``[..., 2, 3]`` camera-space segments. Returns the clipped
    segments and a mask of lines with at least one point in front.
    Mirrors reference geometric_operations.py:343-365.
    """
    points_1 = lines[..., 0, :]
    points_2 = lines[..., 1, :]
    depths_1 = points_1[..., -1:]
    depths_2 = points_2[..., -1:]

    front_first = depths_1 > depths_2
    near = jnp.where(front_first, points_2, points_1)
    far = jnp.where(front_first, points_1, points_2)
    near_d = jnp.where(front_first, depths_2, depths_1)
    far_d = jnp.where(front_first, depths_1, depths_2)

    weights = far_d / jnp.clip(far_d - near_d, min=epsilon)
    weights = jnp.clip(weights, max=1.0)
    near = far + (near - far) * weights

    clipped = jnp.stack([far, near], axis=-2)
    masks = far[..., -1] > 0
    return clipped, masks


def project_box_3d(
    box_3d: jax.Array,
    intrinsic_matrix: jax.Array,
    line_indices: jax.Array = LINE_INDICES,
    epsilon: float = 1e-6,
) -> jax.Array:
    """Project a camera-space 8-corner box to a 2D box with front clipping.

    jit-safe re-design of reference geometric_operations.py:368-389: the
    data-dependent `if torch.any(masks)` becomes masked min/max with a
    zero fallback. Returns ``[2, 2]`` as ``[[x0, y0], [x1, y1]]``.
    Fully vmappable over leading batch dims of ``box_3d``.
    """
    lines = box_3d[..., line_indices, :]  # [..., 12, 2, 3]
    lines, masks = clip_lines_to_front(lines, epsilon)

    pix = lines @ intrinsic_matrix.T
    pix = pix[..., :-1] / jnp.clip(pix[..., -1:], min=epsilon)  # [..., 12, 2, 2]

    valid = masks[..., None, None]  # [..., 12, 1, 1]
    big = jnp.asarray(jnp.finfo(pix.dtype).max, dtype=pix.dtype)
    mins = jnp.min(jnp.where(valid, pix, big), axis=(-3, -2))
    maxs = jnp.max(jnp.where(valid, pix, -big), axis=(-3, -2))

    any_valid = jnp.any(masks, axis=-1)[..., None]
    box_2d = jnp.stack(
        [
            jnp.where(any_valid, mins, 0.0),
            jnp.where(any_valid, maxs, 0.0),
        ],
        axis=-2,
    )
    return box_2d


def clip_boxes_to_image(boxes: jax.Array, image_size) -> jax.Array:
    """Clamp ``[..., 2, 2]`` boxes to ``[0, W] x [0, H]``.

    Matches torchvision.ops.clip_boxes_to_image semantics used at
    reference scripts/main.py:359-362.
    """
    height, width = image_size
    x = jnp.clip(boxes[..., 0], 0.0, float(width))
    y = jnp.clip(boxes[..., 1], 0.0, float(height))
    return jnp.stack([x, y], axis=-1)


def boxes_to_corners(boxes: jax.Array) -> jax.Array:
    """[..., 2, 2] min/max boxes -> flattened [..., 4] (x0, y0, x1, y1)."""
    return boxes.reshape(*boxes.shape[:-2], 4)


def rectification_from_extrinsic(extrinsic_matrix: jax.Array) -> jax.Array:
    """Gravity-rectification rotation from a camera extrinsic matrix.

    Mirrors reference kitti_360_dataset.py:221-226: the angle between the
    camera y axis and the nearest integer axis, signed by the x axis.
    """
    rot = extrinsic_matrix[..., :3, :3]
    x_axis = rot[0]
    y_axis = rot[1]
    y_round = jnp.round(y_axis)
    angle = jnp.arccos(jnp.clip(jnp.dot(y_round, y_axis), -1.0, 1.0)) * jnp.sign(
        jnp.dot(jnp.cross(y_round, y_axis), x_axis)
    )
    return rotation_matrix_x(angle)
