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

    # Batched searchsorted(side="left") as a dense comparison-count:
    # i = #\{cdf < u\}. A dense [S x K] reduction maps onto the VPU far
    # better than a per-ray binary search.
    indices = jnp.sum(
        (cdf[..., :, None] < uniform[..., None, :]).astype(jnp.int32), axis=-2
    )
    indices = jnp.clip(indices, 1, cdf.shape[-1] - 1)

    min_cdf = jnp.take_along_axis(cdf, indices - 1, axis=-1)
    max_cdf = jnp.take_along_axis(cdf, indices, axis=-1)
    min_bins = jnp.take_along_axis(bins, indices - 1, axis=-1)
    max_bins = jnp.take_along_axis(bins, indices, axis=-1)

    t = (uniform - min_cdf) / (max_cdf - min_cdf + 1e-6)
    return min_bins + (max_bins - min_bins) * t
