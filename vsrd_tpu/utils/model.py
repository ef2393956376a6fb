"""Model parameter utilities.

jax analogues of the reference's model-utility surface
(`/root/reference/vsrd/utils.py:231-315,458-549`): EMA/averaged
parameters, parameter freezing via optax masks, and spectral
normalization — pytree-functional instead of module-mutating.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def ema_update(ema_params, params, decay: float = 0.999):
    """Exponential moving average of a parameter pytree
    (reference EMAModel, utils.py:303-315)."""
    return jax.tree.map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params
    )


def average_update(avg_params, params, count):
    """Cumulative average (reference AveragedModel, utils.py:289-300)."""
    new = jax.tree.map(
        lambda a, p: a + (p - a) / (count + 1), avg_params, params
    )
    return new, count + 1


def freeze_mask(params, predicate: Callable[[tuple, jax.Array], bool]):
    """Boolean mask pytree: True where trainable.

    Use with ``optax.masked`` to freeze subtrees (the reference's
    ParameterFreezer / NormFreezer, utils.py:231-274)::

        tx = optax.masked(optax.adam(lr), freeze_mask(params, pred))
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: bool(predicate(path, leaf)), params
    )


def frozen_optimizer(tx, params, predicate):
    """Optimizer that only updates leaves where ``predicate`` is True."""
    mask = freeze_mask(params, predicate)
    return optax.chain(
        optax.masked(tx, mask),
        optax.masked(optax.set_to_zero(), jax.tree.map(lambda m: not m, mask)),
    )


def spectral_normalize(weight: jax.Array, num_iterations: int = 1,
                       epsilon: float = 1e-12):
    """Spectral normalization of a 2D weight by power iteration
    (reference utils.py:544-549 applies torch's hook-based variant)."""
    u = jnp.ones((weight.shape[0],), weight.dtype)

    def body(_, u):
        v = weight.T @ u
        v = v / jnp.clip(jnp.linalg.norm(v), min=epsilon)
        u = weight @ v
        u = u / jnp.clip(jnp.linalg.norm(u), min=epsilon)
        return u

    u = jax.lax.fori_loop(0, num_iterations, body, u)
    v = weight.T @ u
    sigma = jnp.linalg.norm(v)
    return weight / jnp.clip(sigma, min=epsilon)
