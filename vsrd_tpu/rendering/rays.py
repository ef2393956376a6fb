"""Ray generation from camera intrinsics/extrinsics.

TPU-native re-design of `/root/reference/vsrd/rendering/utils.py:5-18`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_casting(
    image_size,
    intrinsic_matrices: jax.Array,
    extrinsic_matrices: jax.Array,
):
    """Pixel grid -> normalized world-space ray directions + camera origin.

    ``intrinsic_matrices [..., 3, 3]``, ``extrinsic_matrices [..., 4, 4]``
    (world->camera). Returns ``(camera_positions [..., 3],
    ray_directions [..., H, W, 3])``.
    """
    height, width = image_size
    ys = jnp.arange(height, dtype=intrinsic_matrices.dtype)
    xs = jnp.arange(width, dtype=intrinsic_matrices.dtype)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    pixels = jnp.stack([grid_x, grid_y, jnp.ones_like(grid_x)], axis=-1)

    inv_k = jnp.linalg.inv(intrinsic_matrices)
    inv_e = jnp.linalg.inv(extrinsic_matrices)
    inv_p = inv_e[..., :3, :3] @ inv_k

    directions = jnp.einsum("...mn,hwn->...hwm", inv_p, pixels)
    directions = directions / jnp.clip(
        jnp.linalg.norm(directions, axis=-1, keepdims=True), min=1e-12
    )
    camera_positions = inv_e[..., :3, 3]
    return camera_positions, directions


def pixel_rays_at(
    ray_directions_flat: jax.Array,
    camera_positions_flat: jax.Array,
    indices: jax.Array,
):
    """Gather (origin, direction) pairs for flattened pixel ``indices``.

    ``ray_directions_flat [P, 3]``, ``camera_positions_flat [P, 3]``:
    per-pixel origins pre-broadcast (reference scripts/main.py:285-292
    expands camera positions to the pixel grid before flattening).
    """
    return (
        jnp.take(camera_positions_flat, indices, axis=0),
        jnp.take(ray_directions_flat, indices, axis=0),
    )
