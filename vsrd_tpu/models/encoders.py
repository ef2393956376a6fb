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


def init_tensorial_vm_encoder(
    key: jax.Array,
    num_features: int,
    grid_size,
    dtype=jnp.float32,
):
    """TensoRF VM factorization (reference tensorial_encoder.py:43-81):
    three plane grids [F, S_a, S_b] paired with three orthogonal lines."""
    keys = jax.random.split(key, 6)
    axes = [(0, 1), (0, 2), (1, 2)]
    planes = [
        jax.random.normal(k, (num_features, grid_size[a], grid_size[b]), dtype)
        * 0.1
        for k, (a, b) in zip(keys[:3], axes)
    ]
    lines = [
        jax.random.normal(k, (num_features, grid_size[c]), dtype) * 0.1
        for k, c in zip(keys[3:], [2, 1, 0])
    ]
    return {"planes": planes, "lines": lines}


def _plane_sample(plane: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear interpolation of ``plane [F, Sa, Sb]`` at normalized 2D
    coords ``[..., 2]`` in [-1, 1]."""
    f, sa, sb = plane.shape
    a = (coords[..., 0] + 1.0) * 0.5 * (sa - 1)
    b = (coords[..., 1] + 1.0) * 0.5 * (sb - 1)
    a0 = jnp.clip(jnp.floor(a), 0, sa - 2)
    b0 = jnp.clip(jnp.floor(b), 0, sb - 2)
    wa = a - a0
    wb = b - b0
    ia = a0.astype(jnp.int32)
    ib = b0.astype(jnp.int32)
    v00 = plane[:, ia, ib]
    v01 = plane[:, ia, ib + 1]
    v10 = plane[:, ia + 1, ib]
    v11 = plane[:, ia + 1, ib + 1]
    top = v00 * (1 - wb) + v01 * wb
    bot = v10 * (1 - wb) + v11 * wb
    return top * (1 - wa) + bot * wa  # [F, ...]


def tensorial_vm_encode(params, positions: jax.Array) -> jax.Array:
    """VM encoding: sum over the three plane x line products.

    ``positions [..., 3]`` in [-1, 1] -> ``[..., num_features]``.
    """
    axes = [(0, 1), (0, 2), (1, 2)]
    complements = [2, 1, 0]
    feats = 0.0
    for plane, line, (a, b), c in zip(
        params["planes"], params["lines"], axes, complements
    ):
        plane_feat = _plane_sample(
            plane, jnp.stack([positions[..., a], positions[..., b]], axis=-1)
        )
        line_feat = _line_sample(line, positions[..., c])
        feats = feats + plane_feat * line_feat
    return jnp.moveaxis(feats, 0, -1)
