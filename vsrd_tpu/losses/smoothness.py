"""Edge-aware / motion smoothness losses (NCHW).

jax re-design of `/root/reference/vsrd/losses/smoothness_losses.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import reduced


def gradient_x(inputs):
    padded = jnp.pad(inputs, ((0, 0),) * (inputs.ndim - 1) + ((0, 1),), mode="edge")
    return padded[..., :, 1:] - padded[..., :, :-1]


def gradient_y(inputs):
    pad = ((0, 0),) * (inputs.ndim - 2) + ((0, 1), (0, 0))
    padded = jnp.pad(inputs, pad, mode="edge")
    return padded[..., 1:, :] - padded[..., :-1, :]


@reduced
def smoothness_loss(inputs, references, normalize=True, epsilon=1e-6):
    if normalize:
        means = jnp.mean(inputs, axis=(-2, -1), keepdims=True)
        inputs = inputs / (means + epsilon)

    gx = jnp.abs(gradient_x(inputs))
    gy = jnp.abs(gradient_y(inputs))

    wx = jnp.exp(-jnp.mean(jnp.abs(gradient_x(references)), axis=1, keepdims=True))
    wy = jnp.exp(-jnp.mean(jnp.abs(gradient_y(references)), axis=1, keepdims=True))

    return gx * wx + gy * wy


@reduced
def motion_smoothness_loss(inputs, epsilon=1e-6):
    gx = jnp.abs(gradient_x(inputs))
    gy = jnp.abs(gradient_y(inputs))
    return jnp.sqrt(gx**2.0 + gy**2.0 + epsilon)


@reduced
def motion_sparsity_loss(inputs, epsilon=1e-6):
    means = jax.lax.stop_gradient(
        jnp.mean(jnp.abs(inputs), axis=(-2, -1), keepdims=True)
    )
    return jnp.sqrt(jnp.abs(inputs) * means + means * means + epsilon)
