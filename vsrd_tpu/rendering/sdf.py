"""Signed distance fields and CSG combinators.

TPU-native re-design of the reference SDF layer
(`/root/reference/vsrd/rendering/sdfs.py:9-58` and the richer closures at
`/root/reference/scripts/main.py:433-509`). Instead of Python lists of
per-instance closures, everything here is expressed over a *padded
instance axis* with validity masks, so the union over instances is a
single masked softmin reduction that XLA can fuse and tile — no ragged
shapes, no Python loops at trace time.

Conventions:
  * positions: ``[..., 3]`` world-space points.
  * per-instance params are stacked along a leading ``N`` axis
    (``locations [N, 3]``, ``rotations [N, 3, 3]``, ...).
  * ``valid [N]`` marks real instances; padded slots never win a union.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_norm(x: jax.Array, axis=-1, keepdims=False, epsilon: float = 1e-6) -> jax.Array:
    """sqrt(sum(x^2) + eps) — smooth at 0 (reference sdfs.py:5-6)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + epsilon)


def box_sdf(positions: jax.Array, half_dimensions: jax.Array) -> jax.Array:
    """Axis-aligned box SDF (reference sdfs.py:9-19).

    ``half_dimensions`` broadcasts against ``positions[..., 3]``.
    Returns ``[...]`` (no trailing channel).
    """
    q = jnp.abs(positions) - half_dimensions
    outside = safe_norm(jax.nn.relu(q), axis=-1)
    inside = jax.nn.relu(-jnp.max(q, axis=-1))
    return outside - inside


def into_instance_frame(
    positions: jax.Array,
    locations: jax.Array,
    rotations: jax.Array,
) -> jax.Array:
    """World points -> per-instance local frames.

    The reference composes ``translation(rotation(sdf))`` closures
    (sdfs.py:22-37): local = (p - t) @ R. Batched over instances here:
    ``positions [..., 3]``, ``locations [N, 3]``, ``rotations [N, 3, 3]``
    -> ``[N, ..., 3]``.
    """
    rel = positions[None, ...] - locations.reshape(
        locations.shape[0], *([1] * (positions.ndim - 1)), 3
    )
    return jnp.einsum("n...i,nij->n...j", rel, rotations)


def masked_softmin_union(
    distances: jax.Array,
    valid: jax.Array,
    temperature: float | jax.Array = 1.0,
):
    """Temperature softmin union over the leading instance axis.

    Reference scripts/main.py:477-492: ``w = softmin(d / T)``,
    ``d_union = sum(d * w)``; features are blended with the same weights.
    Padded instances get weight 0 via an additive -inf mask on the
    softmin logits. Returns ``(union_distances, weights)`` where weights
    has the same shape as ``distances``.
    """
    valid = valid.reshape(valid.shape[0], *([1] * (distances.ndim - 1)))
    logits = jnp.where(valid, -distances / temperature, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=0)
    union = jnp.sum(distances * weights, axis=0)
    return union, weights


def masked_hard_union(
    distances: jax.Array,
    valid: jax.Array,
):
    """Argmin union over instances (reference scripts/main.py:494-509).

    Returns ``(union_distances, one_hot_weights)`` so features can be
    gathered with the same weights as the soft union.
    """
    valid = valid.reshape(valid.shape[0], *([1] * (distances.ndim - 1)))
    big = jnp.asarray(jnp.finfo(distances.dtype).max, distances.dtype)
    masked = jnp.where(valid, distances, big)
    indices = jnp.argmin(masked, axis=0)
    weights = jax.nn.one_hot(indices, distances.shape[0], axis=0, dtype=distances.dtype)
    union = jnp.sum(masked * weights, axis=0)
    return union, weights


def residual_squash(raw: jax.Array) -> jax.Array:
    """RDF output squashing: sigmoid(x - 1) (reference main.py:444-445)."""
    return jax.nn.sigmoid(raw - 1.0)
