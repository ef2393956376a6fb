"""Learnable 3D box parameters — the "detector" of the per-frame
optimization.

TPU-native re-design of
`/root/reference/vsrd/models/detectors/box_parameters.py:16-146`: a plain
parameter pytree plus pure decode functions, so the whole model threads
through `jax.jit` / `optax` / `lax.scan` without module machinery.
Instance counts are padded to a static maximum; a validity mask travels
alongside (built by the pipeline, not stored here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.geometry import rotation_matrix_y_from_cos_sin

# KITTI-360 "evaluation" corner order (reference box_parameters.py:78-87).
UNIT_BOX_CORNERS = jnp.array(
    [
        [-1.0, -1.0, +1.0],
        [+1.0, -1.0, +1.0],
        [+1.0, -1.0, -1.0],
        [-1.0, -1.0, -1.0],
        [-1.0, +1.0, +1.0],
        [+1.0, +1.0, +1.0],
        [+1.0, +1.0, -1.0],
        [-1.0, +1.0, -1.0],
    ]
)

DEFAULT_LOCATION_RANGE = (
    (-50.0, 1.55 - 1.75 / 2.0 - 5.0, 0.0),
    (+50.0, 1.55 - 1.75 / 2.0 + 5.0, 100.0),
)
DEFAULT_DIMENSION_RANGE = ((0.75, 0.75, 1.5), (1.00, 1.00, 2.5))


def init_box_parameters(
    key: jax.Array,
    batch_size: int,
    num_instances: int,
    num_features: int = 256,
    dtype=jnp.float32,
):
    """Initial parameter pytree (reference box_parameters.py:34-49).

    Note the reference initializes *one* random embedding vector shared by
    every instance (torch.rand(F).repeat(B, N, 1)); instances are
    distinguished only by their box parameters until gradients diverge.
    """
    embedding = jax.random.uniform(key, (num_features,), dtype)
    return {
        "locations": jnp.zeros((batch_size, num_instances, 3), dtype),
        "dimensions": jnp.zeros((batch_size, num_instances, 3), dtype),
        "orientations": jnp.tile(
            jnp.asarray([1.0, 0.0], dtype), (batch_size, num_instances, 1)
        ),
        "embeddings": jnp.tile(embedding, (batch_size, num_instances, 1)),
    }


def decode_location(locations: jax.Array, location_range=DEFAULT_LOCATION_RANGE) -> jax.Array:
    lo, hi = (jnp.asarray(r, locations.dtype) for r in location_range)
    return lo + (hi - lo) * jax.nn.sigmoid(locations)


def decode_dimension(dimensions: jax.Array, dimension_range=DEFAULT_DIMENSION_RANGE) -> jax.Array:
    lo, hi = (jnp.asarray(r, dimensions.dtype) for r in dimension_range)
    return lo + (hi - lo) * jax.nn.sigmoid(dimensions)


def decode_orientation(orientations: jax.Array) -> jax.Array:
    """(cos, sin) logits -> y-axis rotation matrices."""
    norm = jnp.linalg.norm(orientations, axis=-1, keepdims=True)
    unit = orientations / jnp.clip(norm, min=1e-12)
    return rotation_matrix_y_from_cos_sin(unit[..., 0], unit[..., 1])


def decode_box_3d(
    locations: jax.Array, dimensions: jax.Array, orientations: jax.Array
) -> jax.Array:
    """(loc [..., 3], half-dims [..., 3], R [..., 3, 3]) -> corners [..., 8, 3]."""
    corners = UNIT_BOX_CORNERS.astype(dimensions.dtype) * dimensions[..., None, :]
    corners = corners @ jnp.swapaxes(orientations, -2, -1)
    return corners + locations[..., None, :]


def encode_box_3d(boxes_3d: jax.Array):
    """Corners [..., 8, 3] -> (locations, half-dims, rotation matrices).

    Mirrors reference box_parameters.py:92-122 (averaged edge lengths in
    the evaluation corner order).
    """
    locations = jnp.mean(boxes_3d, axis=-2)

    def edge_mean(a, b):
        return jnp.mean(
            jnp.linalg.norm(boxes_3d[..., a, :] - boxes_3d[..., b, :], axis=-1),
            axis=-1,
        )

    widths = edge_mean([1, 2, 6, 5], [0, 3, 7, 4])
    heights = edge_mean([4, 5, 6, 7], [0, 1, 2, 3])
    lengths = edge_mean([1, 0, 4, 5], [2, 3, 7, 6])
    dimensions = jnp.stack([widths, heights, lengths], axis=-1) / 2.0

    direction = jnp.mean(
        boxes_3d[..., [1, 0, 4, 5], :] - boxes_3d[..., [2, 3, 7, 6], :], axis=-2
    )
    cos_sin = direction[..., jnp.array([2, 0])]
    cos_sin = cos_sin / jnp.clip(
        jnp.linalg.norm(cos_sin, axis=-1, keepdims=True), min=1e-12
    )
    orientations = rotation_matrix_y_from_cos_sin(cos_sin[..., 0], cos_sin[..., 1])
    return locations, dimensions, orientations


def encode_box_3d_yaw(boxes_3d: jax.Array):
    """Corners -> (location, full dims [h-ordering applied by caller], yaw).

    Variant used by prediction conversion
    (reference tools/kitti_360/convert_predictions.py:16-45): full (not
    half) dimensions and a scalar yaw angle.
    """
    locations = jnp.mean(boxes_3d, axis=-2)

    def edge_mean(a, b):
        return jnp.mean(
            jnp.linalg.norm(boxes_3d[..., a, :] - boxes_3d[..., b, :], axis=-1),
            axis=-1,
        )

    widths = edge_mean([1, 2, 6, 5], [0, 3, 7, 4])
    heights = edge_mean([4, 5, 6, 7], [0, 1, 2, 3])
    lengths = edge_mean([1, 0, 4, 5], [2, 3, 7, 6])
    dimensions = jnp.stack([widths, heights, lengths], axis=-1)

    direction = jnp.mean(
        boxes_3d[..., [1, 0, 4, 5], :] - boxes_3d[..., [2, 3, 7, 6], :], axis=-2
    )
    cos_sin = direction[..., jnp.array([2, 0])]
    cos_sin = cos_sin / jnp.clip(
        jnp.linalg.norm(cos_sin, axis=-1, keepdims=True), min=1e-12
    )
    yaw = jnp.arctan2(cos_sin[..., 1], cos_sin[..., 0])
    return locations, dimensions, yaw


def decode_boxes(params: dict, location_range=DEFAULT_LOCATION_RANGE,
                 dimension_range=DEFAULT_DIMENSION_RANGE) -> dict:
    """Full forward pass (reference box_parameters.py:124-146)."""
    locations = decode_location(params["locations"], location_range)
    dimensions = decode_dimension(params["dimensions"], dimension_range)
    orientations = decode_orientation(params["orientations"])
    return {
        "boxes_3d": decode_box_3d(locations, dimensions, orientations),
        "locations": locations,
        "dimensions": dimensions,
        "orientations": orientations,
        "embeddings": params["embeddings"],
    }
