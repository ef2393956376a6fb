"""Functional core of the multi-instance scene field (kernel-traceable).

`scene_eval` is THE hot function of the framework: box SDF + residual
hyper-MLP + masked softmin union for a point tile, written so it can be
traced *inside* Pallas kernel bodies (pallas_field.py), where jvp/vjp
happen on VMEM-resident values. That imposes Mosaic-specific shape
discipline: everything stays <= 2D per instance (no >2D reshapes, no
gathers, no float iota, no erf primitive), with the instance loop
unrolled statically.

Mirrors the reference closure stack at /root/reference/scripts/
main.py:433-618 with padded instances.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7).

    Mosaic has no erf/erfc lowering; this is elementwise VPU work and
    accurate to fp32 noise levels.
    """
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """0.5 x (1 + erf(x / sqrt(2))) — jax.nn.gelu(approximate=False)
    routes through erfc, which the Mosaic lowering lacks."""
    return 0.5 * x * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))


def enc_permutation(num_frequencies: int = 8, num_dims: int = 3):
    """Map scene_eval's (k, cos/sin, dim)-ordered encoding channels to
    reference channels (dim, k, cos/sin): ``perm[c_kernel] = c_ref``."""
    perm = []
    for k in range(num_frequencies):
        for cs in range(2):
            for dim in range(num_dims):
                perm.append(dim * 2 * num_frequencies + k * 2 + cs)
    return perm


class FieldStatics(NamedTuple):
    """Static (compile-time) field configuration."""

    num_instances: int
    num_frequencies: int = 8
    position_scale: float = 100.0
    out_channels_list: tuple = (16, 16, 16, 16)
    use_rdf: bool = True
    field_dtype: str | None = "bfloat16"
    # matmul precision for the stacked evaluator ('highest' = exact f32,
    # 'default' = one-pass bf16 multiply with f32 accumulation)
    matmul_precision: str = "highest"


def split_field_layers(weights: jax.Array,
                       in_channels: int = 48,
                       out_channels_list: Sequence[int] = (16, 16, 16, 16),
                       final_channels: int = 1):
    """Per-instance flattened weights [N, W] -> per-layer [N, out, in+1]
    tensors (host/XLA side; kernels index instance n to get 2D blocks)."""
    from ..models.hyper_field import field_layer_sizes

    sizes, num_neurons = field_layer_sizes(
        in_channels, out_channels_list, final_channels
    )
    n = weights.shape[0]
    # layer-0 input channels follow scene_eval's (k, cos/sin, dim) enc
    # order; reference weights are (dim, k, cos/sin)-ordered
    perm = jnp.asarray(
        [*enc_permutation(in_channels // 6), in_channels], jnp.int32
    )
    layers = []
    offset = 0
    for index, ((c_in, c_out), count) in enumerate(zip(sizes, num_neurons)):
        w = weights[:, offset : offset + count].reshape(n, c_out, c_in + 1)
        if index == 0:
            w = w[:, :, perm]
        layers.append(w)
        offset += count
    return tuple(layers)


def _instance_distance(position_tile, loc_n, rot_n, half_n, layers_n,
                       statics: FieldStatics):
    """Signed distance of one instance at a tile of points.

    ``position_tile [P, 3]``; per-instance params are 2D/1D slices.
    Returns ``[P]``. All intermediate shapes are rank <= 2.
    """
    rel = position_tile - loc_n[None, :]                        # [P, 3]
    local = (
        rel[:, 0:1] * rot_n[0][None]
        + rel[:, 1:2] * rot_n[1][None]
        + rel[:, 2:3] * rot_n[2][None]
    )                                                           # [P, 3]

    q = jnp.abs(local) - half_n[None, :]
    outside = jnp.sqrt(jnp.sum(jnp.square(jax.nn.relu(q)), axis=-1) + 1e-6)
    # pairwise maximum: reduce-max JVP lowers to an unsupported gather
    q_max = jnp.maximum(jnp.maximum(q[:, 0], q[:, 1]), q[:, 2])
    inside = jax.nn.relu(-q_max)
    distance = outside - inside                                 # [P]

    if statics.use_rdf:
        sym = jnp.concatenate([jnp.abs(local[:, :1]), local[:, 1:]], axis=-1)
        sym = sym / statics.position_scale
        chunks = []
        for k in range(statics.num_frequencies):
            phase = sym * (math.pi * (2.0**k))                  # [P, 3]
            chunks.append(jnp.cos(phase))
            chunks.append(jnp.sin(phase))
        x = jnp.concatenate(chunks, axis=-1)                    # [P, 48]

        dtype = jnp.dtype(statics.field_dtype) if statics.field_dtype else None
        if dtype is not None:
            x = x.astype(dtype)
        for index, w_full in enumerate(layers_n):
            if index:
                mean = jnp.mean(x, axis=-1, keepdims=True)
                var = jnp.var(x, axis=-1, keepdims=True)
                x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
                x = _gelu_exact(x)
            c_in = w_full.shape[-1] - 1
            c_out = w_full.shape[0]
            w = w_full[:, :c_in]
            b = w_full[:, c_in]
            if dtype is not None:
                w = w.astype(dtype)
                b = b.astype(dtype)
            if c_out == 1:
                # explicit mul+sum: a width-1 dot lowers to a Mosaic
                # multi_reduction with a (rejected) non-constant
                # accumulator when the bias gets fused in
                y = jnp.sum(x * w[0][None, :], axis=-1, keepdims=True)
                x = y.astype(x.dtype) + b[None, :]
            else:
                precision = (
                    jax.lax.Precision.DEFAULT
                    if x.dtype == jnp.bfloat16
                    else jax.lax.Precision.HIGHEST
                )
                x = jax.lax.dot_general(
                    x, w,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype) + b[None, :]

        raw = x[:, 0].astype(distance.dtype)                    # [P]
        distance = distance + jax.nn.sigmoid(raw - 1.0)

    return distance


def scene_eval(
    positions,      # [P, 3]
    locations,      # [N, 3]
    rotations,      # [N, 3, 3]
    half_dims,      # [N, 3]
    valid,          # [N] float (1.0 real / 0.0 pad)
    layers,         # tuple of [N, out, in+1] weight tensors (or ())
    temperature,    # scalar
    statics: FieldStatics,
):
    """(union sdf [P], softmin weights [P, N]) for a point tile.

    Instance loop statically unrolled; see module docstring for why.
    """
    n = statics.num_instances
    distances = jnp.stack(
        [
            _instance_distance(
                positions,
                locations[i],
                rotations[i],
                half_dims[i],
                tuple(layer[i] for layer in layers),
                statics,
            )
            for i in range(n)
        ],
        axis=-1,
    )                                                            # [P, N]

    logits = -distances / temperature + (valid[None, :] - 1.0) * 1e30
    weights = jax.nn.softmax(logits, axis=-1)
    union = jnp.sum(distances * weights, axis=-1)
    return union, weights


def _instance_distance_with_tangents_t(pos_t, loc_n, rot_n, half_n,
                                       layers_n, statics: FieldStatics):
    """(distance [1, T], spatial tangents 3 x [1, T]) for one instance,
    in transposed (channels x points) layout.

    Hand-rolled forward-mode AD: tangents advance *with* the primal so a
    Pallas kernel's live set stays O(one layer) — `jax.linearize` inside
    a kernel retains residuals for the whole unrolled computation and
    blows the 16 MB VMEM budget. The transposed layout puts the point
    axis on vector lanes: channel-sized buffers (3, 16, 48 rows) pad to
    sublane multiples of 8 instead of lane multiples of 128, cutting
    VMEM ~10x versus the (points x channels) layout.
    """
    t = pos_t.shape[1]
    rel = pos_t - loc_n[:, None]                                # [3, T]

    def lin3(vec3):
        """rows: out[j] = sum_i rel[i] * vec3[i, j]."""
        return jnp.concatenate(
            [
                rel[0:1] * vec3[0, j] + rel[1:2] * vec3[1, j] + rel[2:3] * vec3[2, j]
                for j in range(3)
            ],
            axis=0,
        )

    local = lin3(rot_n)                                         # [3, T]
    # d local / d p along basis e_j is the constant row R[j, :]
    t_local = tuple(
        jnp.broadcast_to(rot_n[j][:, None], (3, t)) for j in range(3)
    )

    sign_l = jnp.sign(local)
    q = jnp.abs(local) - half_n[:, None]
    t_q = tuple(sign_l * tl for tl in t_local)

    relu_q = jax.nn.relu(q)
    outside = jnp.sqrt(jnp.sum(jnp.square(relu_q), axis=0, keepdims=True) + 1e-6)
    t_outside = tuple(
        jnp.sum(relu_q * tq, axis=0, keepdims=True) / outside for tq in t_q
    )

    m1 = jnp.maximum(q[0:1], q[1:2])
    q_max = jnp.maximum(m1, q[2:3])                             # [1, T]
    pick01 = q[0:1] > q[1:2]
    pick2 = q_max > m1
    t_max = tuple(
        jnp.where(pick2, tq[2:3], jnp.where(pick01, tq[0:1], tq[1:2]))
        for tq in t_q
    )
    inside_gate = (q_max < 0.0).astype(q.dtype)

    distance = outside - jax.nn.relu(-q_max)                    # [1, T]
    t_dist = tuple(
        to + inside_gate * tm for to, tm in zip(t_outside, t_max)
    )

    if statics.use_rdf:
        inv_scale = 1.0 / statics.position_scale
        sym = jnp.concatenate([jnp.abs(local[0:1]), local[1:]], axis=0)
        sym = sym * inv_scale
        sym_gate = jnp.concatenate(
            [sign_l[0:1], jnp.ones_like(local[1:])], axis=0
        )
        t_sym = tuple(sym_gate * tl * inv_scale for tl in t_local)

        chunks, t_chunks = [], [[], [], []]
        for k in range(statics.num_frequencies):
            f = math.pi * (2.0**k)
            phase = sym * f
            c, s = jnp.cos(phase), jnp.sin(phase)
            chunks.append(c)
            chunks.append(s)
            for j in range(3):
                t_chunks[j].append(-s * (f * t_sym[j]))
                t_chunks[j].append(c * (f * t_sym[j]))
        x = jnp.concatenate(chunks, axis=0)                     # [48, T]
        t_x = tuple(jnp.concatenate(tc, axis=0) for tc in t_chunks)

        dtype = jnp.dtype(statics.field_dtype) if statics.field_dtype else None
        if dtype is not None:
            x = x.astype(dtype)
            t_x = tuple(tx.astype(dtype) for tx in t_x)

        for index, w_full in enumerate(layers_n):
            if index:
                mean = jnp.mean(x, axis=0, keepdims=True)
                centered = x - mean
                var = jnp.mean(jnp.square(centered), axis=0, keepdims=True)
                inv_std = jax.lax.rsqrt(var + 1e-5)
                y = centered * inv_std
                new_t = []
                for tx in t_x:
                    tc = tx - jnp.mean(tx, axis=0, keepdims=True)
                    proj = jnp.mean(centered * tc, axis=0, keepdims=True)
                    new_t.append(inv_std * (tc - y * inv_std * proj))
                inv_sqrt2 = 1.0 / math.sqrt(2.0)
                cdf = 0.5 * (1.0 + _erf(y * inv_sqrt2))
                pdf = jnp.exp(-0.5 * y * y) * (1.0 / math.sqrt(2.0 * math.pi))
                x = y * cdf
                dgelu = cdf + y * pdf
                t_x = tuple(dgelu * tc for tc in new_t)

            c_in = w_full.shape[-1] - 1
            c_out = w_full.shape[0]
            # slice / transpose in f32, cast last (bf16 minor-dim
            # insertion has no Mosaic lowering)
            w = w_full[:, :c_in]
            b_col = w_full[:, c_in][:, None]                    # [out, 1] f32
            row1 = w_full[0, :c_in][:, None] if c_out == 1 else None
            if dtype is not None:
                w = w.astype(dtype)
                b_col = b_col.astype(dtype)
                row1 = row1.astype(dtype) if row1 is not None else None
            precision = (
                jax.lax.Precision.DEFAULT
                if x.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST
            )
            if c_out == 1:
                y0 = jnp.sum(x * row1, axis=0, keepdims=True) + b_col
                t_x = tuple(
                    jnp.sum(tx * row1, axis=0, keepdims=True) for tx in t_x
                )
                x = y0
            else:
                # one MXU call for primal + 3 tangents: [out, C] @ [C, 4T]
                stacked = jnp.concatenate([x, *t_x], axis=1)
                out = jax.lax.dot_general(
                    w, stacked,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
                x = out[:, :t] + b_col
                t_x = tuple(out[:, (j + 1) * t : (j + 2) * t] for j in range(3))

        raw = x[0:1].astype(distance.dtype)                     # [1, T]
        sig = jax.nn.sigmoid(raw - 1.0)
        distance = distance + sig
        dsig = sig * (1.0 - sig)
        t_dist = tuple(
            td + dsig * tx[0:1].astype(td.dtype)
            for td, tx in zip(t_dist, t_x)
        )

    return distance, t_dist


def scene_eval_manual_grad_t(pos_t, locations, rotations, half_dims, valid,
                             layers, temperature, statics: FieldStatics):
    """Transposed manual-gradient scene eval (kernel body).

    ``pos_t [3, T]`` -> (sdf [1, T], weights [N, T], grads [3, T]).
    """
    n = statics.num_instances
    ds, ts = [], []
    for i in range(n):
        d_i, t_i = _instance_distance_with_tangents_t(
            pos_t,
            locations[i],
            rotations[i],
            half_dims[i],
            tuple(layer[i] for layer in layers),
            statics,
        )
        ds.append(d_i)
        ts.append(t_i)

    distances = jnp.concatenate(ds, axis=0)                      # [N, T]
    logits = -distances / temperature + (valid[:, None] - 1.0) * 1e30
    weights = jax.nn.softmax(logits, axis=0)
    union = jnp.sum(distances * weights, axis=0, keepdims=True)  # [1, T]

    grads = []
    for j in range(3):
        d_dot = jnp.concatenate([t[j] for t in ts], axis=0)      # [N, T]
        mean_dot = jnp.sum(weights * d_dot, axis=0, keepdims=True)
        u_dot = mean_dot + jnp.sum(
            distances * weights * (mean_dot - d_dot), axis=0, keepdims=True
        ) / temperature
        grads.append(u_dot)
    return union, weights, jnp.concatenate(grads, axis=0)        # [3, T]


def scene_eval_manual_grad(positions, locations, rotations, half_dims, valid,
                           layers, temperature, statics: FieldStatics):
    """(sdf [P], weights [P, N], grads [P, 3]) — standard-layout adapter
    over the transposed hand-rolled forward-mode evaluator."""
    union, weights, grads = scene_eval_manual_grad_t(
        positions.T, locations, rotations, half_dims, valid, layers,
        temperature, statics,
    )
    return union[0], weights.T, grads.T


# ---------------------------------------------------------------------------
# Instance-stacked ("structure of arrays") evaluator: the kernel hot path.
# All elementwise work happens on [N, T] slabs (one row per instance) and the
# per-instance MLPs collapse into one interleaved block-diagonal matmul per
# layer — channel-major rows (channel slabs of N instances), so LayerNorm is
# a static sum over 16 slabs and the matmul is [C_out*N, (C_in+1)*N] @
# [(C_in+1)*N, 4T] (~128x392 @ 392x4T: MXU-shaped).
# ---------------------------------------------------------------------------


def group_size_of(num_instances: int) -> int:
    """Instances per interleave group: the whole scene below 8, groups
    of 8 beyond (the padded kernel counts are always multiples of 8).

    The interleaved block-diagonal matmul costs O(g^2) per group — one
    [16g, 49g] LHS. g=8 gives the MXU-shaped 128-row matmul; letting g
    grow with N instead (as the original single-group layout did) made
    the MLP cost O(N^2) and the 24-instance bucket 3x more expensive
    than necessary.
    """
    if num_instances <= 8:
        return num_instances
    assert num_instances % 8 == 0, num_instances
    return 8


def build_interleaved_layers(weights: jax.Array,
                             in_channels: int = 48,
                             out_channels_list: Sequence[int] = (16, 16, 16, 16),
                             final_channels: int = 1):
    """[N, W] flattened per-instance weights -> per-layer group-stacked
    interleaved block-diagonal matrices [G, C_out*g, (C_in+1)*g]
    (g = `group_size_of(N)`, G = N/g) with row c*g+n and column layout
    [input channels c*g+n ... bias slab last] within each group.

    Runs in XLA (outside kernels); rebuilt each step from the hypernet.
    """
    from ..models.hyper_field import field_layer_sizes

    sizes, num_neurons = field_layer_sizes(
        in_channels, out_channels_list, final_channels
    )
    n = weights.shape[0]
    g_size = group_size_of(n)
    num_groups = n // g_size
    idx = jnp.arange(g_size)
    # layer-0 input channels follow the stacked evaluator's slab order
    # (k, dim, cos/sin); reference weights are (dim, k, cos/sin)-ordered
    num_frequencies = in_channels // 6
    perm = []
    for k in range(num_frequencies):
        for d in range(3):
            for cs in range(2):
                perm.append(d * 2 * num_frequencies + k * 2 + cs)
    perm = jnp.asarray([*perm, in_channels], jnp.int32)  # bias last

    mats = []
    offset = 0
    for layer, ((c_in, c_out), count) in enumerate(zip(sizes, num_neurons)):
        w = weights[:, offset : offset + count].reshape(n, c_out, c_in + 1)
        offset += count
        if layer == 0:
            w = w[:, :, perm]
        w = w.reshape(num_groups, g_size, c_out, c_in + 1)
        # block[G, c, k, i, k] = w[G, k, c, i]; the two advanced indices
        # (separated by a slice) move to the FRONT of the update shape,
        # so the update is w laid out as [g, G, c_out, c_in+1]
        block = jnp.zeros(
            (num_groups, c_out, g_size, c_in + 1, g_size), weights.dtype
        )
        block = block.at[:, :, idx, :, idx].set(jnp.swapaxes(w, 0, 1))
        mats.append(
            block.reshape(num_groups, c_out * g_size, (c_in + 1) * g_size)
        )
    return tuple(mats)


def _group_distances(pos_t, dirs, locations, rotations, half_dims, mats_g,
                     temperature, statics: FieldStatics, n: int,
                     k_tangents: int):
    """Per-group box SDF + residual MLP with hand-rolled tangents.

    ``n`` is the GROUP size (<= 8); per-instance params are the group's
    slices; ``mats_g`` the group's interleaved layer matrices. Returns
    ``(distances [n, T], t_dist list of K x [n, T])``.
    """
    t = pos_t.shape[1]

    px = jnp.tile(pos_t[0:1], (n, 1))                          # [n, T]
    py = jnp.tile(pos_t[1:2], (n, 1))
    pz = jnp.tile(pos_t[2:3], (n, 1))
    rel = (
        px - locations[:, 0:1],
        py - locations[:, 1:2],
        pz - locations[:, 2:3],
    )

    # local_c = sum_i rel_i * R[:, i, c]; tangent along e_j is R[:, j, c]
    def col(i, c):
        return rotations[:, i, c][:, None]                      # [n, 1]

    local = tuple(
        rel[0] * col(0, c) + rel[1] * col(1, c) + rel[2] * col(2, c)
        for c in range(3)
    )
    ones_nt = jnp.ones((n, t), pos_t.dtype)
    if dirs is None:
        t_local = tuple(
            tuple(col(j, c) * ones_nt for c in range(3)) for j in range(3)
        )  # t_local[k][c] : [n, T]
    else:
        v = tuple(jnp.tile(dirs[j : j + 1], (n, 1)) for j in range(3))
        t_local = (
            tuple(
                v[0] * col(0, c) + v[1] * col(1, c) + v[2] * col(2, c)
                for c in range(3)
            ),
        )

    sign_l = tuple(jnp.sign(l) for l in local)
    q = tuple(
        jnp.abs(local[c]) - half_dims[:, c : c + 1] for c in range(3)
    )
    t_q = tuple(
        tuple(sign_l[c] * t_local[j][c] for c in range(3))
        for j in range(k_tangents)
    )

    relu_q = tuple(jax.nn.relu(qc) for qc in q)
    outside = jnp.sqrt(
        relu_q[0] ** 2 + relu_q[1] ** 2 + relu_q[2] ** 2 + 1e-6
    )
    t_outside = tuple(
        (relu_q[0] * t_q[j][0] + relu_q[1] * t_q[j][1] + relu_q[2] * t_q[j][2])
        / outside
        for j in range(k_tangents)
    )

    m1 = jnp.maximum(q[0], q[1])
    q_max = jnp.maximum(m1, q[2])
    pick01 = q[0] > q[1]
    pick2 = q_max > m1
    t_max = tuple(
        jnp.where(pick2, t_q[j][2], jnp.where(pick01, t_q[j][0], t_q[j][1]))
        for j in range(k_tangents)
    )
    inside_gate = (q_max < 0.0).astype(pos_t.dtype)

    distances = outside - jax.nn.relu(-q_max)                   # [n, T]
    t_dist = [t_outside[j] + inside_gate * t_max[j] for j in range(k_tangents)]

    if statics.use_rdf:
        inv_scale = 1.0 / statics.position_scale
        sym = (jnp.abs(local[0]) * inv_scale,
               local[1] * inv_scale,
               local[2] * inv_scale)
        t_sym = tuple(
            (
                sign_l[0] * t_local[j][0] * inv_scale,
                t_local[j][1] * inv_scale,
                t_local[j][2] * inv_scale,
            )
            for j in range(k_tangents)
        )

        # channel-major slabs: rows c*n+i; order (k, cos/sin, dim)
        chunks = []
        t_chunks = [[] for _ in range(k_tangents)]
        for k in range(statics.num_frequencies):
            f = math.pi * (2.0**k)
            for d in range(3):
                phase = sym[d] * f
                c_, s_ = jnp.cos(phase), jnp.sin(phase)
                chunks.append(c_)
                chunks.append(s_)
                for j in range(k_tangents):
                    t_chunks[j].append(-s_ * (f * t_sym[j][d]))
                    t_chunks[j].append(c_ * (f * t_sym[j][d]))
        x = jnp.concatenate(chunks, axis=0)                     # [48n, T]
        t_x = tuple(jnp.concatenate(tc, axis=0) for tc in t_chunks)

        widths = [*statics.out_channels_list, 1]
        for index, mat in enumerate(mats_g):
            c_out = widths[index]
            if index:
                c_in = widths[index - 1]
                # LayerNorm per instance over channel slabs (static sum)
                slabs = [x[c * n : (c + 1) * n] for c in range(c_in)]
                mean = sum(slabs) / c_in
                centered = x - jnp.tile(mean, (c_in, 1))
                c_slabs = [
                    centered[c * n : (c + 1) * n] for c in range(c_in)
                ]
                var = sum(cs * cs for cs in c_slabs) / c_in
                inv_std = jax.lax.rsqrt(var + 1e-5)
                inv_std_t = jnp.tile(inv_std, (c_in, 1))
                y = centered * inv_std_t
                new_t = []
                for tx in t_x:
                    tx_slabs = [tx[c * n : (c + 1) * n] for c in range(c_in)]
                    t_mean = sum(tx_slabs) / c_in
                    tc = tx - jnp.tile(t_mean, (c_in, 1))
                    proj = sum(
                        cs * (ts - t_mean)
                        for cs, ts in zip(c_slabs, tx_slabs)
                    ) / c_in
                    new_t.append(
                        inv_std_t * (tc - y * inv_std_t * jnp.tile(proj, (c_in, 1)))
                    )
                inv_sqrt2 = 1.0 / math.sqrt(2.0)
                cdf = 0.5 * (1.0 + _erf(y * inv_sqrt2))
                pdf = jnp.exp(-0.5 * y * y) * (1.0 / math.sqrt(2.0 * math.pi))
                x = y * cdf
                dgelu = cdf + y * pdf
                t_x = tuple(dgelu * tc for tc in new_t)

            # bias slab: ones for primal, zeros for tangents
            x_h = jnp.concatenate([x, ones_nt], axis=0)
            t_h = tuple(
                jnp.concatenate([tx, jnp.zeros((n, t), x.dtype)], axis=0)
                for tx in t_x
            )
            stacked = jnp.concatenate([x_h, *t_h], axis=1)      # [(C+1)n, (K+1)T]
            precision = (
                jax.lax.Precision.HIGHEST
                if statics.matmul_precision == "highest"
                else jax.lax.Precision.DEFAULT
            )
            out = jax.lax.dot_general(
                mat, stacked,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )                                                    # [C_out*n, (K+1)T]
            x = out[:, :t]
            t_x = tuple(
                out[:, (j + 1) * t : (j + 2) * t] for j in range(k_tangents)
            )

        raw = x                                                  # [n, T]
        sig = jax.nn.sigmoid(raw - 1.0)
        distances = distances + sig
        dsig = sig * (1.0 - sig)
        t_dist = [td + dsig * tx for td, tx in zip(t_dist, t_x)]

    return distances, t_dist


def _scene_eval_stacked_core(pos_t, dirs, locations, rotations, half_dims,
                             valid, mats, temperature,
                             statics: FieldStatics):
    """(u [1, T], weights [N, T], u_dots [K, T]) with hand-rolled tangents.

    ``pos_t [3, T]``; per-instance params stacked as [N, ...] with all
    per-point work on instance-slab rows; ``valid [N, 1]`` (2D so the
    Pallas auto-vmap batching rule accepts it). ``mats`` from
    `build_interleaved_layers` (empty tuple during warmup): per layer a
    group-stacked [G, C_out*g, (C_in+1)*g] matrix — instances run in
    groups of `group_size_of(N)` so the block-diagonal matmul cost stays
    O(N) while each group keeps the MXU-shaped 128-row LHS.

    ``dirs`` selects the forward-mode tangents: ``None`` pushes the 3
    coordinate basis tangents (K=3, u_dots = the spatial gradient);
    a ``[3, T]`` array pushes ONE tangent along that per-point direction
    (K=1, u_dots = the directional derivative). The single-direction mode
    is what the Pallas backward kernel uses: the gradient cotangent dg
    fixes one direction per point, so its VJP only needs a 2T-wide
    stacked matmul instead of 4T.
    """
    n = statics.num_instances
    k_tangents = 3 if dirs is None else 1
    g_size = group_size_of(n)
    num_groups = n // g_size

    if num_groups == 1:
        distances, t_dist = _group_distances(
            pos_t, dirs, locations, rotations, half_dims,
            tuple(m[0] for m in mats), temperature, statics, n, k_tangents,
        )
    else:
        dist_parts = []
        tdist_parts = [[] for _ in range(k_tangents)]
        for g in range(num_groups):
            sl = slice(g * g_size, (g + 1) * g_size)
            d_g, t_g = _group_distances(
                pos_t, dirs, locations[sl], rotations[sl], half_dims[sl],
                tuple(m[g] for m in mats), temperature, statics, g_size,
                k_tangents,
            )
            dist_parts.append(d_g)
            for j in range(k_tangents):
                tdist_parts[j].append(t_g[j])
        distances = jnp.concatenate(dist_parts, axis=0)          # [N, T]
        t_dist = [jnp.concatenate(p, axis=0) for p in tdist_parts]

    logits = -distances / temperature + (valid - 1.0) * 1e30
    weights = jax.nn.softmax(logits, axis=0)
    union = jnp.sum(distances * weights, axis=0, keepdims=True)  # [1, T]

    grads = []
    for j in range(k_tangents):
        d_dot = t_dist[j]                                        # [N, T]
        mean_dot = jnp.sum(weights * d_dot, axis=0, keepdims=True)
        u_dot = mean_dot + jnp.sum(
            distances * weights * (mean_dot - d_dot), axis=0, keepdims=True
        ) / temperature
        grads.append(u_dot)
    if k_tangents == 1:
        return union, weights, grads[0]
    return union, weights, jnp.concatenate(grads, axis=0)


def scene_eval_stacked_t(pos_t, locations, rotations, half_dims, valid,
                         mats, temperature, statics: FieldStatics):
    """(u [1, T], weights [N, T], grads [3, T]): spatial gradient via the
    3 coordinate basis tangents. See `_scene_eval_stacked_core`."""
    return _scene_eval_stacked_core(
        pos_t, None, locations, rotations, half_dims, valid, mats,
        temperature, statics,
    )


def scene_eval_stacked_dir_t(pos_t, dir_t, locations, rotations, half_dims,
                             valid, mats, temperature,
                             statics: FieldStatics):
    """(u [1, T], weights [N, T], u_dot [1, T]): directional derivative of
    the union SDF along the per-point direction ``dir_t [3, T]``.

    By linearity of the JVP, ``u_dot = sum_j dir_j * (d u / d x_j)`` — so
    VJP-ing this function with cotangent 1 on ``u_dot`` yields exactly the
    parameter cotangents of the gradient output contracted with ``dir_t``,
    at one tangent's cost instead of three.
    """
    return _scene_eval_stacked_core(
        pos_t, dir_t, locations, rotations, half_dims, valid, mats,
        temperature, statics,
    )


def scene_eval_stacked(positions, locations, rotations, half_dims, valid,
                       mats, temperature, statics: FieldStatics):
    """Standard-layout adapter over the stacked evaluator (for tests)."""
    union, weights, grads = scene_eval_stacked_t(
        positions.T, locations, rotations, half_dims, valid[:, None], mats,
        temperature, statics,
    )
    return union[0], weights.T, grads.T


def scene_eval_with_grad(positions, locations, rotations, half_dims, valid,
                         layers, temperature, statics: FieldStatics):
    """(sdf [P], weights [P, N], d sdf/d position [P, 3]).

    Spatial gradient via 3 forward-mode tangents through `scene_eval`
    (one linearize, three cheap linear evals).
    """

    def f(pos):
        return scene_eval(
            pos, locations, rotations, half_dims, valid, layers,
            temperature, statics,
        )

    (union, weights), f_lin = jax.linearize(f, positions)
    # full-shape tangent basis via arithmetic (slice+broadcast of an eye
    # constant hits Mosaic's unimplemented two-axis broadcast)
    zero = positions * 0.0
    grads = jnp.stack(
        [
            f_lin(
                jnp.concatenate(
                    [
                        zero[:, :1] + (1.0 if i == 0 else 0.0),
                        zero[:, 1:2] + (1.0 if i == 1 else 0.0),
                        zero[:, 2:3] + (1.0 if i == 2 else 0.0),
                    ],
                    axis=-1,
                )
            )[0]
            for i in range(3)
        ],
        axis=-1,
    )
    return union, weights, grads
