"""Hypernetwork-conditioned distance / radiance fields.

TPU-native re-design of
`/root/reference/vsrd/models/fields/hyper_distance_field.py:7-77` and
`hyper_radiance_field.py:7-77`: the hypernetwork is a pytree of
weight-normalized linear layers, and the generated field is evaluated
*functionally* — per-instance flattened weights are batched along a
leading instance axis so the inner MLP becomes batched matmuls that map
onto the MXU, instead of Python-level per-instance closures.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def field_layer_sizes(in_channels: int, out_channels_list: Sequence[int], final_channels: int = 1):
    """Per-layer (in, out) and flattened parameter counts of the generated
    MLP (reference hyper_distance_field.py:18-25)."""
    ins = [in_channels, *out_channels_list]
    outs = [*out_channels_list, final_channels]
    num_neurons = [o * (i + 1) for i, o in zip(ins, outs)]
    return list(zip(ins, outs)), num_neurons


def _linear_init(key: jax.Array, in_channels: int, out_channels: int, dtype):
    """torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for both
    weight and bias (kaiming_uniform with a=sqrt(5))."""
    bound = 1.0 / math.sqrt(in_channels)
    k_w, k_b = jax.random.split(key)
    v = jax.random.uniform(k_w, (out_channels, in_channels), dtype, -bound, bound)
    b = jax.random.uniform(k_b, (out_channels,), dtype, -bound, bound)
    return v, b


def init_hyper_field(
    key: jax.Array,
    in_channels: int = 48,
    out_channels_list: Sequence[int] = (16, 16, 16, 16),
    hyper_in_channels: int = 256,
    hyper_out_channels_list: Sequence[int] = (256, 256, 256, 256),
    final_channels: int = 1,
    dtype=jnp.float32,
):
    """Initialize the hypernetwork parameters.

    Architecture (reference hyper_distance_field.py:30-47): N hidden
    blocks of [weight-norm Linear -> LayerNorm -> GELU] followed by one
    weight-norm Linear emitting the flattened field-MLP weights.
    """
    _, num_neurons = field_layer_sizes(in_channels, out_channels_list, final_channels)
    hyper_ins = [hyper_in_channels, *hyper_out_channels_list]
    hyper_outs = [*hyper_out_channels_list, sum(num_neurons)]

    layers = []
    keys = jax.random.split(key, len(hyper_ins))
    for index, (k, h_in, h_out) in enumerate(zip(keys, hyper_ins, hyper_outs)):
        v, b = _linear_init(k, h_in, h_out, dtype)
        layer = {
            # weight normalization (reference hyper_distance_field.py:53-55):
            # w = g * v / ||v||_row, g initialized to ||v||_row.
            "v": v,
            "g": jnp.linalg.norm(v, axis=-1),
            "b": b,
        }
        if index < len(hyper_ins) - 1:
            layer["ln_scale"] = jnp.ones((h_out,), dtype)
            layer["ln_bias"] = jnp.zeros((h_out,), dtype)
        layers.append(layer)
    return {"layers": layers}


def init_hyper_radiance_field(key, **kwargs):
    """RGB twin of the distance field: the generated MLP emits 3 channels
    (reference hyper_radiance_field.py:7-77)."""
    kwargs.setdefault("final_channels", 3)
    return init_hyper_field(key, **kwargs)


def _weight_norm(v: jax.Array, g: jax.Array, epsilon: float = 0.0) -> jax.Array:
    norms = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v * (g[:, None] / (norms + epsilon))


def _layer_norm(x: jax.Array, scale=None, bias=None, epsilon: float = 1e-5) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + epsilon)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    return y


def hypernetwork_apply(params, embeddings: jax.Array) -> jax.Array:
    """Embeddings ``[..., E]`` -> flattened field weights ``[..., W]``.

    Mirrors reference hyper_distance_field.py:75-77 forward.
    """
    x = embeddings
    layers = params["layers"]
    for layer in layers[:-1]:
        w = _weight_norm(layer["v"], layer["g"])
        x = x @ w.T + layer["b"]
        x = _layer_norm(x, layer["ln_scale"], layer["ln_bias"])
        x = jax.nn.gelu(x, approximate=False)
    last = layers[-1]
    w = _weight_norm(last["v"], last["g"])
    return x @ w.T + last["b"]


def field_apply(
    weights: jax.Array,
    features: jax.Array,
    in_channels: int = 48,
    out_channels_list: Sequence[int] = (16, 16, 16, 16),
    final_channels: int = 1,
) -> jax.Array:
    """Evaluate the generated MLP functionally.

    ``weights [*B, W]`` — flattened per-instance weights; ``features
    [*B, P, C]`` — one explicit point axis so the per-layer contraction
    is a *batched matmul* (``[*B, P, in+1] x [*B, out, in+1]^T``) that
    XLA tiles onto the MXU across all instances at once. Between layers:
    parameter-free LayerNorm + exact GELU (reference
    hyper_distance_field.py:57-73). Returns ``[*B, P, final_channels]``.
    """
    sizes, num_neurons = field_layer_sizes(in_channels, out_channels_list, final_channels)
    offsets = [0]
    for n in num_neurons:
        offsets.append(offsets[-1] + n)

    x = features
    for index, ((c_in, c_out), start, stop) in enumerate(
        zip(sizes, offsets[:-1], offsets[1:])
    ):
        if index:
            x = _layer_norm(x)
            x = jax.nn.gelu(x, approximate=False)
        w = weights[..., start:stop].reshape(*weights.shape[:-1], c_out, c_in + 1)
        x_h = jnp.concatenate(
            [x, jnp.ones((*x.shape[:-1], 1), x.dtype)], axis=-1
        )
        x = jnp.einsum("...mn,...pn->...pm", w, x_h)
    return x


def pack_block_diagonal(
    weights: jax.Array,
    in_channels: int = 48,
    out_channels_list: Sequence[int] = (16, 16, 16, 16),
    final_channels: int = 1,
    input_permutation=None,
):
    """Pack per-instance MLP weights into block-diagonal layer matrices.

    ``weights [N, W]`` -> list of ``[N*(c_in+1), N*c_out]`` matrices, one
    per layer, where instance n's block sits at rows ``n*(c_in+1)`` /
    cols ``n*c_out`` and everything else is zero.

    Why: the generated MLPs are 16-wide — as per-instance batched GEMMs
    they waste ~94% of the MXU's 128 lanes. Packed block-diagonally, one
    *dense* GEMM evaluates all N instances with contraction/output dims
    of N*(c_in+1) / N*c_out (~128-400 for N=8): the redundant zero FLOPs
    are far cheaper than idle lanes, turning the renderer's hot matmuls
    from bandwidth-bound trickles into MXU-saturating tiles.
    """
    n = weights.shape[0]
    sizes, num_neurons = field_layer_sizes(in_channels, out_channels_list, final_channels)
    offsets = [0]
    for m in num_neurons:
        offsets.append(offsets[-1] + m)

    packed = []
    idx = jnp.arange(n)
    for layer, ((c_in, c_out), start, stop) in enumerate(
        zip(sizes, offsets[:-1], offsets[1:])
    ):
        w = weights[:, start:stop].reshape(n, c_out, c_in + 1)  # [N, out, in+1]
        if layer == 0 and input_permutation is not None:
            # reorder input channels (bias row stays last); used to match
            # the fused kernel's encoding channel order
            perm = jnp.asarray([*input_permutation, c_in], jnp.int32)
            w = w[:, :, perm]
        block = jnp.zeros((n, c_in + 1, n, c_out), weights.dtype)
        block = block.at[idx, :, idx, :].set(jnp.swapaxes(w, -2, -1))
        packed.append(block.reshape(n * (c_in + 1), n * c_out))
    return packed


def field_apply_packed(
    packed,
    features: jax.Array,
    num_instances: int,
    out_channels_list: Sequence[int] = (16, 16, 16, 16),
    final_channels: int = 1,
) -> jax.Array:
    """Evaluate the packed block-diagonal MLPs.

    ``features [..., N, C]`` -> ``[..., N, final_channels]``. Numerically
    identical to per-instance evaluation (zero blocks contribute exact
    zeros); LayerNorm/GELU stay per-instance via a [..., N, c] reshape.
    """
    n = num_instances
    x = features
    widths = [*out_channels_list, final_channels]
    for index, (mat, c_out) in enumerate(zip(packed, widths)):
        if index:
            x = _layer_norm(x)
            x = jax.nn.gelu(x, approximate=False)
        x_h = jnp.concatenate(
            [x, jnp.ones((*x.shape[:-1], 1), x.dtype)], axis=-1
        )
        flat = x_h.reshape(*x_h.shape[:-2], n * x_h.shape[-1])
        # bf16 inputs take the native one-pass MXU path with f32
        # accumulation; f32 inputs keep the framework-default full
        # precision.
        precision = (
            jax.lax.Precision.DEFAULT
            if flat.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST
        )
        out = jnp.matmul(
            flat, mat, precision=precision, preferred_element_type=jnp.float32
        ).astype(flat.dtype)
        x = out.reshape(*x_h.shape[:-2], n, c_out)
    return x


def field_apply_instances(
    weights: jax.Array,
    features: jax.Array,
    in_channels: int = 48,
    out_channels_list: Sequence[int] = (16, 16, 16, 16),
    final_channels: int = 1,
) -> jax.Array:
    """Instance-batched functional MLP: ``weights [N, W]``,
    ``features [..., N, C]`` -> ``[..., N, final_channels]``.

    The per-layer contraction is a single batched GEMM with the instance
    axis as the batch (``[N, P, in+1] x [N, out, in+1]^T``), which is the
    layout XLA tiles best on the MXU for the renderer's point clouds
    (P ~ rays x samples).
    """
    sizes, num_neurons = field_layer_sizes(in_channels, out_channels_list, final_channels)
    offsets = [0]
    for n in num_neurons:
        offsets.append(offsets[-1] + n)

    x = features
    for index, ((c_in, c_out), start, stop) in enumerate(
        zip(sizes, offsets[:-1], offsets[1:])
    ):
        if index:
            x = _layer_norm(x)
            x = jax.nn.gelu(x, approximate=False)
        w = weights[:, start:stop].reshape(-1, c_out, c_in + 1)
        x_h = jnp.concatenate(
            [x, jnp.ones((*x.shape[:-1], 1), x.dtype)], axis=-1
        )
        x = jnp.einsum("nmc,...nc->...nm", w, x_h)
    return x
