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
) -> jax.Array:
    """Gumbel top-k over precomputed log-weights."""
    gumbel = jax.random.gumbel(key, logits.shape, logits.dtype)
    _, indices = jax.lax.top_k(logits + gumbel, num_samples)
    return indices.astype(jnp.int32)


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
