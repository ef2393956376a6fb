"""Positional encoders.

TPU-native re-design of `/root/reference/vsrd/models/encoders/*`:
pure functions / parameter pytrees instead of nn.Modules.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sinusoidal_frequencies(num_frequencies: int, dtype=jnp.float32) -> jax.Array:
    """2^k * pi, k = 0..num_frequencies-1 (reference sinusoidal_encoder.py:12)."""
    return (2.0 ** jnp.arange(num_frequencies, dtype=dtype)) * math.pi


def sinusoidal_encode(positions: jax.Array, num_frequencies: int = 8) -> jax.Array:
    """NeRF sinusoidal encoding.

    ``[..., D] -> [..., D * num_frequencies * 2]`` with the reference's
    channel order (dim-major, then frequency, then (cos, sin);
    sinusoidal_encoder.py:14-19).
    """
    freqs = sinusoidal_frequencies(num_frequencies, positions.dtype)
    phases = positions[..., None] * freqs  # [..., D, F]
    enc = jnp.stack([jnp.cos(phases), jnp.sin(phases)], axis=-1)  # [..., D, F, 2]
    return enc.reshape(*positions.shape[:-1], -1)


def init_tensorial_cp_encoder(
    key: jax.Array,
    num_features: int,
    grid_size,
    dtype=jnp.float32,
):
    """TensoRF CP-factorized grid (reference tensorial_encoder.py:8-40).

    Three 1D factor lines of shape ``[num_features, size_axis]``.
    """
    keys = jax.random.split(key, 3)
    return {
        "lines": [
            jax.random.normal(k, (num_features, s), dtype) * 0.1
            for k, s in zip(keys, grid_size)
        ]
    }


def _line_sample(line: jax.Array, coords: jax.Array) -> jax.Array:
    """Differentiable 1D linear interpolation of ``line [F, S]`` at
    normalized coords in [-1, 1] (replaces the reference's custom
    grid_sampler, modules/grid_sampler.py:5-49, in 1D)."""
    size = line.shape[-1]
    x = (coords + 1.0) * 0.5 * (size - 1)
    x0 = jnp.clip(jnp.floor(x), 0, size - 2)
    w = x - x0
    i0 = x0.astype(jnp.int32)
    f0 = jnp.take(line, i0, axis=-1)
    f1 = jnp.take(line, i0 + 1, axis=-1)
    return f0 * (1.0 - w) + f1 * w  # [F, ...]


def tensorial_cp_encode(params, positions: jax.Array) -> jax.Array:
    """CP encoding: product of three line features.

    ``positions [..., 3]`` in [-1, 1] -> ``[..., num_features]``.
    """
    feats = 1.0
    for axis, line in enumerate(params["lines"]):
        feats = feats * _line_sample(line, positions[..., axis])
    return jnp.moveaxis(feats, 0, -1)
