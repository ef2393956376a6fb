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


def fuse_post_norm(weight: jax.Array, bias, norm_scale, norm_bias,
                   running_mean, running_var, epsilon: float = 1e-5):
    """Fold a trailing (batch/instance) normalization into the preceding
    conv/linear weights for inference.

    Functional analogue of reference utils.py:458-514: given
    ``y = norm(conv(x))`` with tracked ``running_mean/var``, returns
    ``(fused_weight, fused_bias)`` such that a plain conv/linear with
    them computes the same output, and the norm becomes identity.
    ``weight`` has the output-channel axis first ([O, ...] — flax conv
    kernels [kh, kw, I, O] should be moved to O-first before fusing).
    """
    gain = norm_scale * jax.lax.rsqrt(running_var + epsilon)   # [O]
    shaped = gain.reshape((-1,) + (1,) * (weight.ndim - 1))
    fused_weight = weight * shaped
    if bias is None:
        bias = jnp.zeros_like(running_mean)
    fused_bias = norm_bias + (bias - running_mean) * gain
    return fused_weight, fused_bias


def batch_norm_to_group_norm_params(bn_params: dict, num_groups=None,
                                    group_size=None) -> dict:
    """BatchNorm param dict -> GroupNorm param dict, keeping the affine
    scale/bias and dropping the tracked statistics (reference
    utils.py:517-530 copies weight/bias only). ``bn_params`` uses flax
    naming: {'scale', 'bias'} (+ optional 'mean'/'var', ignored)."""
    channels = bn_params["scale"].shape[0]
    assert (num_groups is None) != (group_size is None)
    groups = num_groups if num_groups is not None else channels // group_size
    assert channels % groups == 0, (channels, groups)
    return {
        "scale": bn_params["scale"],
        "bias": bn_params["bias"],
        "num_groups": groups,
    }


def group_norm_to_batch_norm_params(gn_params: dict) -> dict:
    """GroupNorm param dict -> BatchNorm param dict with fresh neutral
    statistics (reference utils.py:533-541)."""
    channels = gn_params["scale"].shape[0]
    return {
        "scale": gn_params["scale"],
        "bias": gn_params["bias"],
        "mean": jnp.zeros((channels,), gn_params["scale"].dtype),
        "var": jnp.ones((channels,), gn_params["scale"].dtype),
    }
