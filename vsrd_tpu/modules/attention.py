"""Attention modules (flax.linen, NHWC).

TPU-native re-design of `/root/reference/vsrd/modules/attention.py`:
local window attention uses `conv_general_dilated_patches` (XLA's native
patch extraction) instead of torch Unfold; deformable attention samples
with this framework's differentiable grid_sample.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample_nchw


def conv_output_size(input_size, kernel_size, stride, padding, dilation):
    return (input_size + padding * 2 - dilation * (kernel_size - 1) - 1) // stride + 1


class MultiHeadLocalAttention2d(nn.Module):
    """Windowed attention: each query pixel attends to a KxK neighborhood
    (reference attention.py:13-143)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    num_heads: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, queries, keys, values):
        # NHWC inputs
        k = self.kernel_size
        pad = self.dilation * (k - 1) // 2
        c = self.out_channels
        m = self.num_heads
        head = c // m

        q = nn.Dense(c, use_bias=self.use_bias)(queries)
        key_maps = nn.Dense(c, use_bias=self.use_bias)(keys)
        val_maps = nn.Dense(c, use_bias=self.use_bias)(values)

        def patches(x):
            # [B, H', W', C*K*K] with channel-major patch layout
            out = jax.lax.conv_general_dilated_patches(
                x.transpose(0, 3, 1, 2),
                filter_shape=(k, k),
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                rhs_dilation=(self.dilation, self.dilation),
            )
            return out.transpose(0, 2, 3, 1)

        key_patches = patches(key_maps)
        val_patches = patches(val_maps)
        b, h, w, _ = key_patches.shape

        q = q[:, :: self.stride, :: self.stride]
        q = q.reshape(b, h, w, m, head, 1)
        kp = key_patches.reshape(b, h, w, m, head, k * k)
        vp = val_patches.reshape(b, h, w, m, head, k * k)

        logits = jnp.einsum("bhwmci,bhwmcs->bhwmis", q, kp) / math.sqrt(c)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhwmis,bhwmcs->bhwmci", attn, vp)
        out = out.reshape(b, h, w, c)
        return nn.Dense(c, use_bias=self.use_bias)(out)


class MultiHeadGlobalAttention2d(nn.Module):
    """Full spatial attention over feature maps
    (reference attention.py:146-231)."""

    out_channels: int
    num_heads: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, queries, keys, values):
        c = self.out_channels
        m = self.num_heads
        head = c // m
        b, hq, wq, _ = queries.shape
        _, hk, wk, _ = keys.shape

        q = nn.Dense(c, use_bias=self.use_bias)(queries).reshape(b, hq * wq, m, head)
        k = nn.Dense(c, use_bias=self.use_bias)(keys).reshape(b, hk * wk, m, head)
        v = nn.Dense(c, use_bias=self.use_bias)(values).reshape(b, hk * wk, m, head)

        logits = jnp.einsum("bqmc,bkmc->bmqk", q, k) / math.sqrt(c)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bmqk,bkmc->bqmc", attn, v).reshape(b, hq, wq, c)
        return nn.Dense(c, use_bias=self.use_bias)(out)


class MultiHeadDeformableAttention(nn.Module):
    """Query-conditioned sparse sampling attention
    (reference attention.py:234-352): each query predicts S normalized
    locations, keys/values are bilinearly sampled there."""

    out_channels: int
    num_samples: int
    num_heads: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, queries, keys, values):
        # queries [B, N, C]; keys/values [B, H, W, C]
        c = self.out_channels
        m = self.num_heads
        head = c // m
        b, n, _ = queries.shape

        # named so per-subsystem parameter groups can target the offset
        # predictors separately (reference deformable_detr.py:288-305)
        locations = jnp.tanh(
            nn.Dense(
                self.num_samples * 2, use_bias=self.use_bias,
                name="sampling_offsets",
            )(queries)
        ).reshape(b, n, self.num_samples, 2)

        q = nn.Dense(c, use_bias=self.use_bias)(queries)
        key_maps = nn.Dense(c, use_bias=self.use_bias)(keys).transpose(0, 3, 1, 2)
        val_maps = nn.Dense(c, use_bias=self.use_bias)(values).transpose(0, 3, 1, 2)

        sampled_k = grid_sample_nchw(key_maps, locations)   # [B, C, N, S]
        sampled_v = grid_sample_nchw(val_maps, locations)

        q = q.reshape(b, n, m, head, 1)
        sampled_k = sampled_k.transpose(0, 2, 1, 3).reshape(
            b, n, m, head, self.num_samples
        )
        sampled_v = sampled_v.transpose(0, 2, 1, 3).reshape(
            b, n, m, head, self.num_samples
        )

        logits = jnp.einsum("bnmci,bnmcs->bnmis", q, sampled_k) / math.sqrt(c)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bnmis,bnmcs->bnmci", attn, sampled_v)
        out = out.reshape(b, n, c)
        return nn.Dense(c, use_bias=self.use_bias)(out)
