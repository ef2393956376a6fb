"""Ray-distance samplers (stratified quadrature + inverse-CDF importance).

TPU-native re-design of `/root/reference/vsrd/rendering/samplers.py:5-36`:
pure functions of explicit `jax.random` keys, static shapes, and a
vectorized `searchsorted` that XLA lowers to a fused gather — no host
syncs, fully vmappable over rays/views/frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quadrature_sampler(
    key: jax.Array | None,
    bins: jax.Array,
    deterministic: bool = False,
) -> jax.Array:
    """Stratified samples within consecutive bins.

    ``bins [..., S+1]`` -> samples ``[..., S]``; one uniform jitter per
    bin (reference samplers.py:5-8).
    """
    lo = bins[..., :-1]
    hi = bins[..., 1:]
    if deterministic:
        w = 0.5
    else:
        w = jax.random.uniform(key, lo.shape, dtype=bins.dtype)
    return lo + (hi - lo) * w


def inverse_transform_sampler(
    key: jax.Array | None,
    bins: jax.Array,
    weights: jax.Array,
    num_samples: int,
    deterministic: bool = False,
) -> jax.Array:
    """Importance-sample distances from a piecewise-constant PDF.

    ``bins [..., S]`` are existing sample positions, ``weights [..., S-1]``
    the per-interval weights (reference samplers.py:11-36). Returns
    ``[..., num_samples]`` new samples.
    """
    pdf = weights / jnp.clip(
        jnp.sum(jnp.abs(weights), axis=-1, keepdims=True), min=1e-12
    )
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., S]

    if deterministic:
        uniform = jnp.linspace(0.0, 1.0, num_samples, dtype=cdf.dtype)
        uniform = jnp.broadcast_to(uniform, (*cdf.shape[:-1], num_samples))
    else:
        uniform = jax.random.uniform(
            key, (*cdf.shape[:-1], num_samples), dtype=cdf.dtype
        )
        uniform = jnp.sort(uniform, axis=-1)
    # Keep u inside the realized CDF range. cdf[-1] is ~1.0 only up to
    # rounding; a u above it (linspace's exact 1.0 endpoint — every ray,
    # every step in deterministic mode) would pair with a clipped index
    # whose bracket no longer contains u, making t's numerator the
    # chaotic residual (1.0 - cdf[-1]) ~ 1e-7 against the 1e-6 guard
    # denominator — the last fine sample of every ray then jumps O(bin)
    # with compilation-dependent rounding. (The reference's searchsorted
    # hits the same knife edge only when torch.rand lands within
    # rounding of 1.0; clipping only alters cases where the reference
    # itself is unstable.)
    uniform = jnp.minimum(uniform, cdf[..., -1:])

    # Batched searchsorted(side="left") as a dense comparison-count:
    # i = #\{cdf < u\}. A dense [S x K] reduction maps onto the VPU far
    # better than a per-ray binary search.
    below = (cdf[..., :, None] < uniform[..., None, :]).astype(cdf.dtype)
    indices = jnp.sum(below, axis=-2).astype(jnp.int32)
    indices = jnp.clip(indices, 1, cdf.shape[-1] - 1)

    # Gather cdf/bins at i-1 and i via one-hot matmuls instead of
    # take_along_axis: XLA lowers batched per-row gathers to ~1 ms
    # fusions on TPU (4 of them dominated the whole sampling step),
    # while the dense [K, S] x [S, 2] contraction is microseconds of
    # VPU work on a tensor the comparison above already materialized.
    oh_next = jax.nn.one_hot(indices, cdf.shape[-1], dtype=cdf.dtype)
    oh_prev = jax.nn.one_hot(indices - 1, cdf.shape[-1], dtype=cdf.dtype)
    stacked = jnp.stack([cdf, bins], axis=-1)               # [.., S, 2]
    prev = jnp.einsum(
        "...ks,...sc->...kc", oh_prev, stacked,
        precision=jax.lax.Precision.HIGHEST,
    )
    nxt = jnp.einsum(
        "...ks,...sc->...kc", oh_next, stacked,
        precision=jax.lax.Precision.HIGHEST,
    )
    min_cdf, min_bins = prev[..., 0], prev[..., 1]
    max_cdf, max_bins = nxt[..., 0], nxt[..., 1]

    t = (uniform - min_cdf) / (max_cdf - min_cdf + 1e-6)
    # With u clipped into the CDF range t is already in [0, 1) wherever
    # the bracket is proper; the clamp only binds on degenerate brackets
    # (near-zero-mass bins), where it pins the sample inside its bin
    # instead of extrapolating along a ~1e6-amplified direction.
    t = jnp.clip(t, 0.0, 1.0)
    return min_bins + (max_bins - min_bins) * t
