"""NN building blocks (flax.linen, NHWC).

TPU-native re-design of the reference module zoo
(`/root/reference/vsrd/modules/`): feature maps are NHWC (the layout XLA
prefers on TPU), randomness is explicit (`deterministic` flags + RNG
collections), and the custom autograd bits become `jax.custom_vjp`.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@jax.custom_vjp
def grad_scale(inputs, scale):
    """Identity forward, gradient scaled by ``scale``
    (reference grad_scale.py:5-23)."""
    return inputs


def _grad_scale_fwd(inputs, scale):
    return inputs, scale


def _grad_scale_bwd(scale, cotangent):
    return cotangent * scale, None


grad_scale.defvjp(_grad_scale_fwd, _grad_scale_bwd)


def pixel_unshuffle(inputs: jax.Array, factor: int) -> jax.Array:
    """NHWC space-to-depth (reference packing_block.py:4-16)."""
    b, h, w, c = inputs.shape
    x = inputs.reshape(b, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


def pixel_shuffle(inputs: jax.Array, factor: int) -> jax.Array:
    """NHWC depth-to-space."""
    b, h, w, c = inputs.shape
    out_c = c // (factor * factor)
    x = inputs.reshape(b, h, w, out_c, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * factor, w * factor, out_c)


class Scale(nn.Module):
    """Learnable scalar multiplier (reference layer_scale.py:5-12)."""

    scale: float = 1.0

    @nn.compact
    def __call__(self, inputs):
        weight = self.param("weight", lambda _: jnp.asarray(self.scale))
        return weight * inputs


class LayerScale(nn.Module):
    """Per-channel learnable scale initialized small
    (reference layer_scale.py:15-23; channel-last here)."""

    num_channels: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, inputs):
        weight = self.param(
            "weight", lambda _: jnp.full((self.num_channels,), self.epsilon)
        )
        return weight * inputs


class DropPath(nn.Module):
    """Stochastic depth (reference drop_path.py:5-19)."""

    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        if deterministic or self.drop_prob == 0.0:
            return inputs
        keep_prob = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        shape = (inputs.shape[0],) + (1,) * (inputs.ndim - 1)
        keep = jax.random.bernoulli(rng, keep_prob, shape)
        return inputs * keep / keep_prob


class SqueezeExcitation(nn.Module):
    """Channel gating (reference squeeze_excitation.py:6-28; NHWC)."""

    squeeze_channels: int

    @nn.compact
    def __call__(self, inputs):
        pooled = jnp.mean(inputs, axis=(1, 2), keepdims=True)
        x = nn.Dense(self.squeeze_channels)(pooled)
        x = nn.relu(x)
        x = nn.Dense(inputs.shape[-1])(x)
        return jax.nn.sigmoid(x) * inputs


class Residual(nn.Module):
    """y = x + f(x) (reference modules/utils.py:5-12)."""

    fn: Callable

    @nn.compact
    def __call__(self, inputs, *args, **kwargs):
        return inputs + self.fn(inputs, *args, **kwargs)


class Sequential(nn.Module):
    """Chain of callables (reference modules/utils.py:35-45)."""

    layers: Sequence[Callable]

    @nn.compact
    def __call__(self, inputs, *args, **kwargs):
        x = inputs
        for layer in self.layers:
            x = layer(x)
        return x


class PackingBlock(nn.Module):
    """PackNet-style detail-preserving downsampling
    (reference packing_block.py:19-61): space-to-depth -> 3D conv over a
    synthetic depth axis -> 2D conv + GroupNorm + ELU. NHWC / NDHWC."""

    out_channels: int
    depth: int = 8
    kernel_size: int = 3
    stride: int = 2
    num_groups: int = 16

    @nn.compact
    def __call__(self, inputs):
        x = pixel_unshuffle(inputs, self.stride)            # [B, H', W', C R^2]
        x = x[..., None]                                    # depth-expand
        x = nn.Conv(
            self.depth, (self.kernel_size,) * 3, padding="SAME"
        )(x[:, :, :, :, :])                                 # [B, H', W', CR2, D]
        x = x.reshape(*x.shape[:3], -1)
        x = nn.Conv(
            self.out_channels, (self.kernel_size,) * 2,
            padding="SAME", use_bias=False,
        )(x)
        x = nn.GroupNorm(
            num_groups=math.gcd(self.num_groups, self.out_channels)
        )(x)
        return nn.elu(x)


class UnpackingBlock(nn.Module):
    """PackNet-style upsampling (reference packing_block.py:64-106)."""

    out_channels: int
    depth: int = 8
    kernel_size: int = 3
    stride: int = 2
    num_groups: int = 16

    @nn.compact
    def __call__(self, inputs):
        mid = self.out_channels * self.stride**2 // self.depth
        x = nn.Conv(
            mid, (self.kernel_size,) * 2, padding="SAME", use_bias=False
        )(inputs)
        x = nn.GroupNorm(num_groups=math.gcd(self.num_groups, mid))(x)
        x = nn.elu(x)
        x = x[..., None]
        x = nn.Conv(self.depth, (self.kernel_size,) * 3, padding="SAME")(x)
        x = x.reshape(*x.shape[:3], -1)
        return pixel_shuffle(x, self.stride)
