"""Differentiable bilinear grid sampling (torch-compatible semantics).

Replaces both `torch.nn.functional.grid_sample` (used by the reference's
photometric loss, scripts/main.py:816-821) and the reference's custom
input-differentiable sampler (`vsrd/modules/grid_sampler.py:5-49`).
Normalized coords in [-1, 1]; ``align_corners=False`` matches torch's
default pixel-center convention; zero padding outside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coords, size, align_corners):
    if align_corners:
        return (coords + 1.0) / 2.0 * (size - 1)
    return ((coords + 1.0) * size - 1.0) / 2.0


def grid_sample(
    inputs: jax.Array,
    grid: jax.Array,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jax.Array:
    """``inputs [C, H, W]``, ``grid [..., 2]`` (x, y in [-1, 1]) ->
    ``[C, ...]`` bilinear samples. vmap for batches."""
    c, h, w = inputs.shape
    gx = _unnormalize(grid[..., 0], w, align_corners)
    gy = _unnormalize(grid[..., 1], h, align_corners)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        values = inputs[:, yi_c, xi_c]  # [C, ...]
        if padding_mode == "zeros":
            values = jnp.where(inside, values, 0.0)
        return values

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)

    top = v00 * (1.0 - wx) + v01 * wx
    bottom = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bottom * wy


def grid_sample_nchw(inputs, grid, **kwargs):
    """Batched variant: ``inputs [B, C, H, W]``, ``grid [B, ..., 2]``."""
    return jax.vmap(lambda im, g: grid_sample(im, g, **kwargs))(inputs, grid)
