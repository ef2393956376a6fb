"""Probabilistic regression losses (NLLs + energy scores).

jax re-design of `/root/reference/vsrd/losses/probabilistic_losses.py`:
explicit log-density formulas (no distribution objects) and explicit RNG
keys for the Monte-Carlo energy scores.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .utils import reduced


def _normal_log_prob(x, loc, scale):
    z = (x - loc) / scale
    return -0.5 * z * z - jnp.log(scale) - 0.5 * math.log(2.0 * math.pi)


def _student_t_log_prob(x, df, loc, scale):
    z = (x - loc) / scale
    return (
        gammaln((df + 1.0) / 2.0)
        - gammaln(df / 2.0)
        - 0.5 * jnp.log(df * math.pi)
        - jnp.log(scale)
        - (df + 1.0) / 2.0 * jnp.log1p(z * z / df)
    )


@reduced
def gaussian_nll(means, variances, targets, epsilon=1e-6):
    return -_normal_log_prob(targets, means, jnp.sqrt(variances + epsilon))


@reduced
def student_nll(means, shapes, scales, targets, epsilon=1e-6):
    """NLL of the generalized Student-t arising from a Gaussian with
    Inverse-Gamma variance: dof=2*shape, scale^2=scale/shape
    (reference probabilistic_losses.py:15-41)."""
    degrees = 2.0 * shapes
    variances = scales / shapes
    return -_student_t_log_prob(
        targets, degrees, means, jnp.sqrt(variances + epsilon)
    )


@reduced
def gaussian_energy_score(key, means, variances, targets, num_samples=1000, epsilon=1e-6):
    scale = jnp.sqrt(variances + epsilon)
    samples = (
        means + scale * jax.random.normal(key, (num_samples, *jnp.shape(means)))
    )
    inter = jnp.mean(jnp.abs(samples - targets[None, ...]), axis=0)
    intra = jnp.mean(jnp.abs(samples[:-1] - samples[1:]), axis=0)
    return inter - intra * 0.5


@reduced
def student_energy_score(key, means, shapes, scales, targets, num_samples=1000, epsilon=1e-6):
    degrees = 2.0 * shapes
    scale = jnp.sqrt(scales / shapes + epsilon)
    samples = (
        means + scale * jax.random.t(key, degrees, (num_samples, *jnp.shape(means)))
    )
    inter = jnp.mean(jnp.abs(samples - targets[None, ...]), axis=0)
    intra = jnp.mean(jnp.abs(samples[:-1] - samples[1:]), axis=0)
    return inter - intra * 0.5


@reduced
def logit_gaussian_nll(means, variances, targets, epsilon=1e-6):
    """NLL of sigmoid(Normal) evaluated at targets in (0, 1)
    (reference probabilistic_losses.py:87-110)."""
    targets = jnp.clip(targets, epsilon, 1.0 - epsilon)
    logits = jnp.log(targets) - jnp.log1p(-targets)
    base = _normal_log_prob(logits, means, jnp.sqrt(variances + epsilon))
    # change of variables: d logit / d x = 1 / (x (1 - x))
    log_det = -jnp.log(targets) - jnp.log1p(-targets)
    return -(base + log_det)


@reduced
def logit_student_nll(means, shapes, scales, targets, epsilon=1e-6):
    targets = jnp.clip(targets, epsilon, 1.0 - epsilon)
    logits = jnp.log(targets) - jnp.log1p(-targets)
    degrees = 2.0 * shapes
    base = _student_t_log_prob(
        logits, degrees, means, jnp.sqrt(scales / shapes + epsilon)
    )
    log_det = -jnp.log(targets) - jnp.log1p(-targets)
    return -(base + log_det)
