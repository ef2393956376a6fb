"""Occupancy-grid-accelerated volumetric rendering.

TPU-native re-design of the reference's nerfacc-based
`occupancy_volumetric_rendering` (`/root/reference/vsrd/rendering/
renderers.py:273-375`, the repo's only would-be CUDA-kernel dependency,
unreachable in shipped configs). nerfacc packs a *ragged* list of
occupied samples per ray and runs CUDA `exclusive_prod` over the
packing; on TPU ragged packing is an anti-pattern, so the equivalent
here is dense fixed-step marching with an occupancy *mask*: unoccupied
samples get zero opacity (they contribute exactly nothing to the
exclusive cumprod), and the field is only *differentiated* where
occupied. Same math, static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .renderer import (
    RenderOutputs,
    anneal_cosines,
    eval_field_with_grad,
    exclusive_cumprod,
)


class OccupancyGrid(NamedTuple):
    """Dense binary occupancy over an axis-aligned box."""

    occupancy: jax.Array   # [G, G, G] bool
    origin: jax.Array      # [3] world min corner
    extent: jax.Array      # [3] world size

    def lookup(self, positions: jax.Array) -> jax.Array:
        """True where positions fall in occupied cells ([..., 3] -> [...])."""
        g = self.occupancy.shape[0]
        normalized = (positions - self.origin) / self.extent
        idx = jnp.clip((normalized * g).astype(jnp.int32), 0, g - 1)
        inside = jnp.all((normalized >= 0.0) & (normalized < 1.0), axis=-1)
        values = self.occupancy[idx[..., 0], idx[..., 1], idx[..., 2]]
        return values & inside


def update_occupancy_grid(
    sdf_fn,
    grid: OccupancyGrid,
    threshold: float = 1.0,
) -> OccupancyGrid:
    """Mark cells whose center SDF is below ``threshold`` (a dilation of
    the surface; nerfacc updates from density estimates)."""
    g = grid.occupancy.shape[0]
    centers = (jnp.stack(
        jnp.meshgrid(*[jnp.arange(g)] * 3, indexing="ij"), axis=-1
    ) + 0.5) / g
    positions = grid.origin + centers * grid.extent
    sdf = sdf_fn(positions.reshape(-1, 3)).reshape(g, g, g)
    return grid._replace(occupancy=sdf < threshold)


def occupancy_volumetric_rendering(
    field,
    grid: OccupancyGrid,
    ray_positions: jax.Array,
    ray_directions: jax.Array,
    marching_step_size: float,
    num_samples: int,
    sdf_std_deviation,
    cosine_ratio=1.0,
    *,
    key: jax.Array | None = None,
    stratified: bool = True,
    epsilon: float = 1e-6,
) -> RenderOutputs:
    """Fixed-step marching with occupancy masking.

    ``field(positions [..., 3]) -> (sdf, features)`` as in renderer.py.
    Samples start at the ray origin and advance ``marching_step_size``
    per step (optionally stratified); samples in unoccupied cells are
    masked out of the compositing.
    """
    steps = jnp.arange(num_samples, dtype=ray_directions.dtype)
    distances = steps * marching_step_size
    if stratified and key is not None:
        jitter = jax.random.uniform(
            key, (*ray_directions.shape[:-1], num_samples),
            dtype=ray_directions.dtype,
        )
        distances = distances + jitter * marching_step_size
    else:
        distances = jnp.broadcast_to(
            distances, (*ray_directions.shape[:-1], num_samples)
        )

    positions = (
        ray_positions[..., None, :]
        + ray_directions[..., None, :] * distances[..., None]
    )
    occupied = grid.lookup(positions)                      # [..., S]

    sdf, features, gradients = eval_field_with_grad(field, positions)

    norms = jnp.linalg.norm(gradients, axis=-1)
    normals = gradients / jnp.clip(norms, min=1e-12)[..., None]
    cosines = jnp.sum(ray_directions[..., None, :] * normals, axis=-1)

    # opacities are zeroed for unoccupied samples *before* the exclusive
    # cumprod — exactly nerfacc's packed transmittance over occupied
    # samples only (reference renderers.py:350-358)
    cosines = anneal_cosines(cosines, cosine_ratio)
    prev_sdf = sdf - cosines * marching_step_size / 2.0
    next_sdf = sdf + cosines * marching_step_size / 2.0
    prev_cdf = jax.nn.sigmoid(prev_sdf / sdf_std_deviation)
    next_cdf = jax.nn.sigmoid(next_sdf / sdf_std_deviation)
    opacities = jax.nn.relu((prev_cdf - next_cdf) / (prev_cdf + epsilon))
    opacities = jnp.where(occupied, opacities, 0.0)
    # elementwise cumprod ON PURPOSE (vs renderer._exclusive_cumprod_mxu's
    # log/exp matmul): this [T] march is small, and the elementwise form
    # keeps exact torch/nerfacc semantics incl. finite gradients at
    # opacity==1; the two paths agree to ~1e-6 f32 rounding otherwise
    transmittances = exclusive_cumprod(1.0 - opacities, axis=-1)
    weights = transmittances * opacities

    accumulated = jnp.sum(features * weights[..., None], axis=-2)
    return RenderOutputs(accumulated, gradients, distances, weights)
