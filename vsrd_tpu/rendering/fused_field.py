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


def _erf_poly_exp(ax):
    """(poly(t), exp(-ax^2)) core of the Abramowitz-Stegun 7.1.26
    rational erf (max abs err 1.5e-7), for ax = |x| >= 0:
    erf(|x|) = 1 - poly * exp(-ax^2). Shared by `_erf` and
    `_gelu_cdf_pdf` so the coefficients live in exactly one place.

    Mosaic has no erf/erfc lowering; this is elementwise VPU work and
    accurate to fp32 noise levels.
    """
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return poly, jnp.exp(-ax * ax)


def _erf(x):
    sign = jnp.sign(x)
    poly, e = _erf_poly_exp(jnp.abs(x))
    return sign * (1.0 - poly * e)


def _gelu_exact(x):
    """0.5 x (1 + erf(x / sqrt(2))) — jax.nn.gelu(approximate=False)
    routes through erfc, which the Mosaic lowering lacks."""
    return 0.5 * x * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))


def _gelu_cdf_pdf(y):
    """(Phi(y), phi(y)) sharing ONE exp: the A-S erf polynomial's
    exp(-(y/sqrt2)^2) term equals sqrt(2 pi) * phi(y), so the normal
    pdf the GELU tangent chains need comes for free."""
    poly, e = _erf_poly_exp(jnp.abs(y) * (1.0 / math.sqrt(2.0)))
    cdf = 0.5 * (1.0 + jnp.sign(y) * (1.0 - poly * e))
    pdf = e * (1.0 / math.sqrt(2.0 * math.pi))
    return cdf, pdf


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
    # Per-tile instance-group skipping: a kernel grid step only
    # evaluates instance groups that come within `group_skip_margin +
    # group_skip_tau_scale * temperature` meters OF THE NEAREST group
    # for some point of the tile (a RELATIVE criterion — softmin weights
    # depend on d_g - u, not on d_g: a group 50 m away still gets ~37%
    # weight if the nearest group is 49 m away and tau = 1). Skipped
    # groups read as distance `_SKIP_DISTANCE`, so their softmin weights
    # underflow to exactly 0 and the dropped weight / alpha / gradient
    # terms are O(exp(-(margin + tau_scale*tau)/tau)) = O(e^-tau_scale).
    # Only meaningful for num_instances > 8 (multiple groups) on
    # spatially spread scenes.
    group_skip: bool = False
    group_skip_margin: float = 2.0
    group_skip_tau_scale: float = 12.0
    # Spatial-gradient mode for the K=3 fine forward: False pushes 3
    # forward-mode basis tangents through the field; True computes the
    # same gradient with ONE reverse sweep w.r.t. the query position
    # (primal + position-only transpose — no LN-JVP triple chains, no
    # 4T-wide stacked matmuls). Exact same math, reverse-mode rounding;
    # ~2x faster fine forward. See `_scene_eval_stacked_rev`.
    rev_grad: bool = False


# Distance reported for instances in skipped groups: far enough that
# exp(-d/tau) underflows to exactly 0.0 in f32 for every annealed tau,
# small enough that d/tau and d*du stay finite.
_SKIP_DISTANCE = 1.0e4


def group_skip_threshold(statics: FieldStatics, temperature):
    """The relative keep-slack A(tau): groups whose lower-bound distance
    exceeds the union distance's upper bound by more than A everywhere in
    a tile are skipped. Sized so the dropped softmin-weight terms
    exp(-(d_g - u)/tau) are O(e^-tau_scale) (std and tau share the same
    cosine annealing schedule, optimize.py:49-52; the margin absorbs the
    sphere-bound slack and the <= 1 m sigmoid residual)."""
    return statics.group_skip_margin + statics.group_skip_tau_scale * temperature


# The RDF residual added to each box SDF is sigmoid(raw - 1) in (0, 1)
# (see `_group_distances`), so each d_i is upper-bounded by
# ||p - c_i|| + 1 (the box center is inside the box, so the box SDF is
# at most the distance to the center). What this bounds is the softmin
# LOG-PARTITION lse(p) = -tau * logsumexp(-d/tau), which satisfies
# lse <= min_i d_i <= min_i ||p - c_i|| + 1 and is the quantity that
# normalizes the softmax weights exp(-(d_g - lse)/tau) the skip
# criterion controls. The softmax-weighted AVERAGE union that
# `scene_eval` actually returns is >= min_i d_i and is NOT bounded by
# min + 1 (it can exceed it by up to ~(N-1)*tau/e) — but the skip
# safety argument never needs a bound on it, only on lse.
_RESIDUAL_BOUND = 1.0


def group_tile_mask(positions, locations, half_dims, valid, threshold,
                    tile: int, g_size: int):
    """Per-(group, tile) keep mask [G, ceil(P/tile)] int32.

    A group is kept iff for some point p of the tile its optimistic
    distance (distance to the circumscribed sphere of some valid member
    instance — a lower bound on box SDF + non-negative residual) comes
    within ``threshold`` meters of an UPPER bound on the softmin
    log-partition lse(p) = -tau*logsumexp(-d/tau) (min over valid
    instances of center distance + residual bound; lse <= min_i d_i <=
    that bound — see _RESIDUAL_BOUND). The log-partition is what
    normalizes the softmax weights exp(-(d_g - lse)/tau), so bounding it
    bounds every dropped weight. The criterion is relative, not
    absolute: what must be large is the gap to
    the nearest group, not the distance itself — the eikonal term
    evaluates grad u at ray samples far from every instance, where two
    distant groups can still share the softmin weight. The per-tile
    nearest group is force-kept so every tile has at least one live
    group.

    ``positions [P, 3]`` is the UNPADDED point set; tail-tile padding
    slots never force a keep. Instance index g * g_size + j must match
    the kernel's group slicing.
    """
    p = positions.shape[0]
    n = locations.shape[0]
    num_groups = n // g_size
    num_tiles = (p + tile - 1) // tile
    big = 1e9
    positions = jax.lax.stop_gradient(positions)
    locations = jax.lax.stop_gradient(locations)
    half_dims = jax.lax.stop_gradient(half_dims)
    d = jnp.linalg.norm(
        positions[:, None, :] - locations[None, :, :], axis=-1
    )                                                            # [P, N]
    valid_row = valid.reshape(1, n) > 0.5
    lower = jnp.where(valid_row, d - jnp.linalg.norm(half_dims, axis=-1)[None, :], big)
    upper = jnp.where(valid_row, d + _RESIDUAL_BOUND, big)
    ub_min = jnp.min(upper, axis=-1, keepdims=True)              # [P, 1]
    # gap to the nearest group, with big - big = 0 when everything is
    # invalid (keep-all: the frame contributes nothing anyway)
    rel = lower - ub_min
    rel_g = jnp.min(rel.reshape(p, num_groups, g_size), axis=-1)
    pad = num_tiles * tile - p
    if pad:
        rel_g = jnp.concatenate(
            [rel_g, jnp.full((pad, num_groups), big, rel_g.dtype)],
            axis=0,
        )
    tile_min = jnp.min(
        rel_g.reshape(num_tiles, tile, num_groups), axis=1
    )                                                            # [T, G]
    keep = tile_min <= threshold
    nearest = jnp.argmin(tile_min, axis=-1)
    keep = keep | (jnp.arange(num_groups)[None, :] == nearest[:, None])
    return keep.T.astype(jnp.int32)                              # [G, T]


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
                cdf, pdf = _gelu_cdf_pdf(y)
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


def _encoding_trig(sym, num_frequencies: int, fast: bool):
    """[(cos, sin)] per (k, d) in k-major order for phases
    ``sym[d] * pi * 2**k``.

    ``fast=True`` evaluates exact sin/cos only at anchor frequencies
    (k % 4 == 0) and fills the rest with the double-angle recurrence
    (c' = 2c^2 - 1, s' = 2sc): 12 transcendentals instead of 48 per
    tile at the default 8 frequencies. Error compounds ~2.8x per
    doubling from the nearest anchor (<= 3 levels), measured max abs
    error ~1.5e-6 at k=7 — well inside the default-precision kernel's
    existing bf16-matmul error budget (~4e-3 m SDF, NOTES.md). The
    'highest' parity mode keeps exact sin/cos everywhere.
    """
    if not fast:
        return [
            (
                jnp.cos(sym[d] * (math.pi * 2.0**k)),
                jnp.sin(sym[d] * (math.pi * 2.0**k)),
            )
            for k in range(num_frequencies)
            for d in range(3)
        ]
    per_dim = []
    for d in range(3):
        chain = []
        for k in range(num_frequencies):
            if k % 4 == 0:
                phase = sym[d] * (math.pi * 2.0**k)
                c, s = jnp.cos(phase), jnp.sin(phase)
            else:
                cp, sp = chain[-1]
                c = 2.0 * cp * cp - 1.0
                s = 2.0 * sp * cp
            chain.append((c, s))
        per_dim.append(chain)
    return [per_dim[d][k] for k in range(num_frequencies) for d in range(3)]


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
    # K=3 spatial-gradient mode propagates the tangents in the LOCAL
    # box frame (seeds e_c on l = R^T(x - loc)) and rotates the three
    # results back to world axes at the very end (dl_c/dx_i = R[i, c],
    # per-instance constants). In this basis the seed slabs collapse:
    # t_local[j][c] = delta_jc, so t_q[j][c] = sign(l_c) delta_jc and
    # the encoding tangents are nonzero only on dimension-j rows —
    # which deletes ~150 [n, T] vector ops per group vs pushing three
    # dense world-axis tangents through the same chain.
    local_basis = dirs is None
    if not local_basis:
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
    relu_q = tuple(jax.nn.relu(qc) for qc in q)
    outside = jnp.sqrt(
        relu_q[0] ** 2 + relu_q[1] ** 2 + relu_q[2] ** 2 + 1e-6
    )
    m1 = jnp.maximum(q[0], q[1])
    q_max = jnp.maximum(m1, q[2])
    pick01 = q[0] > q[1]
    pick2 = q_max > m1
    inside_gate = (q_max < 0.0).astype(pos_t.dtype)
    distances = outside - jax.nn.relu(-q_max)                   # [n, T]

    if local_basis:
        assert k_tangents == 3
        inv_outside = 1.0 / outside
        t_outside = tuple(
            relu_q[j] * sign_l[j] * inv_outside for j in range(3)
        )
        zero = jnp.zeros((), pos_t.dtype)
        t_max = (
            jnp.where(pick2, zero, jnp.where(pick01, sign_l[0], zero)),
            jnp.where(pick2, zero, jnp.where(pick01, zero, sign_l[1])),
            jnp.where(pick2, sign_l[2], zero),
        )
    else:
        t_q = tuple(
            tuple(sign_l[c] * t_local[j][c] for c in range(3))
            for j in range(k_tangents)
        )
        t_outside = tuple(
            (
                relu_q[0] * t_q[j][0]
                + relu_q[1] * t_q[j][1]
                + relu_q[2] * t_q[j][2]
            )
            / outside
            for j in range(k_tangents)
        )
        t_max = tuple(
            jnp.where(
                pick2, t_q[j][2], jnp.where(pick01, t_q[j][0], t_q[j][1])
            )
            for j in range(k_tangents)
        )

    t_dist = [t_outside[j] + inside_gate * t_max[j] for j in range(k_tangents)]

    if statics.use_rdf:
        inv_scale = 1.0 / statics.position_scale
        sym = (jnp.abs(local[0]) * inv_scale,
               local[1] * inv_scale,
               local[2] * inv_scale)
        if not local_basis:
            t_sym = tuple(
                (
                    sign_l[0] * t_local[j][0] * inv_scale,
                    t_local[j][1] * inv_scale,
                    t_local[j][2] * inv_scale,
                )
                for j in range(k_tangents)
            )

        # channel-major slabs: rows c*n+i; order (k, cos/sin, dim)
        trig = _encoding_trig(
            sym, statics.num_frequencies,
            fast=statics.matmul_precision != "highest",
        )
        chunks = []
        t_chunks = [[] for _ in range(k_tangents)]
        zeros_nt = jnp.zeros((n, t), pos_t.dtype)
        idx = 0
        for k in range(statics.num_frequencies):
            f = math.pi * (2.0**k)
            for d in range(3):
                c_, s_ = trig[idx]
                idx += 1
                chunks.append(c_)
                chunks.append(s_)
                if local_basis:
                    # seed e_d in the local frame: dsym_d/dl_j =
                    # delta_jd inv_scale (times sign(l_0) for d=0) —
                    # tangents j != d get exact-zero rows, tangent d
                    # gets the bare trig derivative
                    fi = f * inv_scale
                    fc, fns = fi * c_, -fi * s_
                    if d == 0:
                        fc, fns = fc * sign_l[0], fns * sign_l[0]
                    t_chunks[d].append(fns)
                    t_chunks[d].append(fc)
                    for j in range(3):
                        if j != d:
                            t_chunks[j].append(zeros_nt)
                            t_chunks[j].append(zeros_nt)
                elif k_tangents >= 2:
                    # fold the frequency scalar into the trig values once
                    # per (k, d) (shared across tangents): 2 + 2K vector
                    # ops instead of 3K. For K=1 the fold costs more
                    # (4 > 3), so keep the direct product there.
                    fc, fns = f * c_, -f * s_
                    for j in range(k_tangents):
                        t_chunks[j].append(fns * t_sym[j][d])
                        t_chunks[j].append(fc * t_sym[j][d])
                else:
                    for j in range(k_tangents):
                        ft = f * t_sym[j][d]
                        t_chunks[j].append(-s_ * ft)
                        t_chunks[j].append(c_ * ft)
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
                # y * inv_std^2 is tangent-independent (hoisted out of
                # the tangent loop); the t_mean term of the projection
                # sum is exactly zero (sum_c centered = 0 by
                # construction), so proj needs no per-slab centering.
                y_inv2 = y * inv_std_t * inv_std_t
                new_t = []
                for tx in t_x:
                    tx_slabs = [tx[c * n : (c + 1) * n] for c in range(c_in)]
                    t_mean = sum(tx_slabs) / c_in
                    tc = tx - jnp.tile(t_mean, (c_in, 1))
                    proj = sum(
                        cs * ts for cs, ts in zip(c_slabs, tx_slabs)
                    ) / c_in
                    new_t.append(
                        inv_std_t * tc - y_inv2 * jnp.tile(proj, (c_in, 1))
                    )
                cdf, pdf = _gelu_cdf_pdf(y)
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

    if local_basis:
        # rotate the local-frame tangents back to world axes:
        # du/dx_i = sum_c (du/dl_c) R[i, c] (per-instance constants)
        t_dist = [
            t_dist[0] * col(i, 0)
            + t_dist[1] * col(i, 1)
            + t_dist[2] * col(i, 2)
            for i in range(3)
        ]

    return distances, t_dist


def _scene_eval_stacked_core(pos_t, dirs, locations, rotations, half_dims,
                             valid, mats, temperature,
                             statics: FieldStatics, group_mask=None):
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

    ``group_mask`` (optional, one int scalar per group) skips whole
    instance groups: a masked-off group's compute sits in the dead arm
    of a `lax.cond` and its distances read `_SKIP_DISTANCE` (softmin
    weight exactly 0). Built for per-tile group skipping inside the
    Pallas kernels (`group_tile_mask`).
    """
    n = statics.num_instances
    k_tangents = 3 if dirs is None else 1
    g_size = group_size_of(n)
    num_groups = n // g_size
    t = pos_t.shape[1]

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

            def live(sl=sl, g=g):
                d_g, t_g = _group_distances(
                    pos_t, dirs, locations[sl], rotations[sl],
                    half_dims[sl], tuple(m[g] for m in mats), temperature,
                    statics, g_size, k_tangents,
                )
                return d_g, tuple(t_g)

            if group_mask is None:
                d_g, t_g = live()
            else:

                def dead():
                    return (
                        jnp.full((g_size, t), _SKIP_DISTANCE, pos_t.dtype),
                        tuple(
                            jnp.zeros((g_size, t), pos_t.dtype)
                            for _ in range(k_tangents)
                        ),
                    )

                d_g, t_g = jax.lax.cond(group_mask[g] != 0, live, dead)
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
                         mats, temperature, statics: FieldStatics,
                         group_mask=None):
    """(u [1, T], weights [N, T], grads [3, T]): spatial gradient via the
    3 coordinate basis tangents, or — when ``statics.rev_grad`` — via a
    single reverse sweep. See `_scene_eval_stacked_core` /
    `_scene_eval_stacked_rev`."""
    if statics.rev_grad and group_mask is None:
        return _scene_eval_stacked_rev(
            pos_t, locations, rotations, half_dims, valid, mats,
            temperature, statics,
        )
    return _scene_eval_stacked_core(
        pos_t, None, locations, rotations, half_dims, valid, mats,
        temperature, statics, group_mask,
    )


def scene_eval_stacked_dir_t(pos_t, dir_t, locations, rotations, half_dims,
                             valid, mats, temperature,
                             statics: FieldStatics, group_mask=None):
    """(u [1, T], weights [N, T], u_dot [1, T]): directional derivative of
    the union SDF along the per-point direction ``dir_t [3, T]``.

    By linearity of the JVP, ``u_dot = sum_j dir_j * (d u / d x_j)`` — so
    VJP-ing this function with cotangent 1 on ``u_dot`` yields exactly the
    parameter cotangents of the gradient output contracted with ``dir_t``,
    at one tangent's cost instead of three.
    """
    return _scene_eval_stacked_core(
        pos_t, dir_t, locations, rotations, half_dims, valid, mats,
        temperature, statics, group_mask,
    )


# ---------------------------------------------------------------------------
# Hand-written reverse pass (the backward-kernel hot path).
#
# The backward Pallas kernel needs, per tile, the VJP of
#     f(loc, R, half, mats) -> (u, w, u_dot = <dg, grad_x u>)
# with cotangents (du, dw, 1).  `jax.vjp` of the tangent-augmented
# forward computes this but pays framework overhead — unshared
# subexpressions between the tangent chain and its transpose, a generic
# LayerNorm second-order transpose, and extra selects: measured 6.6 ms
# reverse vs the 4.0 ms K=1 recompute at the bench workload (NOTES.md).
# This hand-derived reverse fuses the recompute with a minimal-residual
# reverse sweep sharing every forward subexpression.
#
# Math summary (per point, N instances, temperature tau):
#   stage A:  w = softmax(-d/tau), u = sum d_i w_i, m = sum w_i td_i,
#             u_dot = m + (u m - sum d_i w_i td_i)/tau
#     =>  td_bar_i = w_i (1 + (u - d_i)/tau)
#         w_tot_i  = dw_i + du d_i + td_i (1 + (u - d_i)/tau) + m d_i/tau
#         l_bar    = softmax-transpose(w_tot)
#         d_bar_i  = du w_i + w_i (m - td_i)/tau - l_bar_i/tau
#   LayerNorm pair (y, ty) = (LN(a), JVP_LN_a(t)): the t-cotangent
#     transposes with the SAME form as the primal LN transpose; the
#     a-cotangent additionally picks up d/da <ty_bar, JVP_LN_a(t)> =
#       -(istd^2/C) [ y (A - 3 istd proj By) + By tc ]
#       - istd^3 proj (ty_bar - Sy/C)
#     with A = sum_c ty_bar tc, By = sum_c ty_bar y, Sy = sum_c ty_bar,
#     proj = mean_c(centered . tc)  (all per-instance channel-slab sums).
#
# Validated against jax.vjp in tests/test_fused_field.py.
# ---------------------------------------------------------------------------

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _group_dir_fwd_res(pos_t, dirs, locations, rotations, half_dims, mats_g,
                       statics: FieldStatics, n: int):
    """K=1 directional forward for one instance group, saving the
    residuals `_group_dir_bwd` needs. Mirrors `_group_distances` with
    ``k_tangents=1`` (kept separate: the residual set differs)."""
    t = pos_t.shape[1]
    ones_nt = jnp.ones((n, t), pos_t.dtype)

    rel = tuple(
        jnp.tile(pos_t[i : i + 1], (n, 1)) - locations[:, i : i + 1]
        for i in range(3)
    )
    v = tuple(jnp.tile(dirs[i : i + 1], (n, 1)) for i in range(3))

    def col(i, c):
        return rotations[:, i, c][:, None]

    local = tuple(
        rel[0] * col(0, c) + rel[1] * col(1, c) + rel[2] * col(2, c)
        for c in range(3)
    )
    vloc = tuple(
        v[0] * col(0, c) + v[1] * col(1, c) + v[2] * col(2, c)
        for c in range(3)
    )
    sign_l = tuple(jnp.sign(l) for l in local)
    q = tuple(jnp.abs(local[c]) - half_dims[:, c : c + 1] for c in range(3))
    tq = tuple(sign_l[c] * vloc[c] for c in range(3))
    rq = tuple(jax.nn.relu(qc) for qc in q)
    outside = jnp.sqrt(rq[0] ** 2 + rq[1] ** 2 + rq[2] ** 2 + 1e-6)
    s_r = rq[0] * tq[0] + rq[1] * tq[1] + rq[2] * tq[2]
    m1 = jnp.maximum(q[0], q[1])
    qmax = jnp.maximum(m1, q[2])
    pick01 = q[0] > q[1]
    pick2 = qmax > m1
    t_max = jnp.where(pick2, tq[2], jnp.where(pick01, tq[0], tq[1]))
    ig = (qmax < 0.0).astype(pos_t.dtype)
    distances = outside - jax.nn.relu(-qmax)
    t_dist = s_r / outside + ig * t_max

    res = {"rel": rel, "v": v, "local": local, "vloc": vloc, "q": q,
           "outside": outside, "s_r": s_r, "stacked": [], "ln": []}

    if statics.use_rdf:
        inv_scale = 1.0 / statics.position_scale
        sym = (jnp.abs(local[0]) * inv_scale, local[1] * inv_scale,
               local[2] * inv_scale)
        tsym = (sign_l[0] * vloc[0] * inv_scale, vloc[1] * inv_scale,
                vloc[2] * inv_scale)
        res["tsym"] = tsym
        trig = _encoding_trig(
            sym, statics.num_frequencies,
            fast=statics.matmul_precision != "highest",
        )
        chunks, t_chunks = [], []
        idx = 0
        for k in range(statics.num_frequencies):
            f = math.pi * (2.0**k)
            for d in range(3):
                c_, s_ = trig[idx]
                idx += 1
                chunks.append(c_)
                chunks.append(s_)
                ft = f * tsym[d]
                t_chunks.append(-s_ * ft)
                t_chunks.append(c_ * ft)
        res["trig"] = trig
        x = jnp.concatenate(chunks, axis=0)                      # [48n, T]
        tx = jnp.concatenate(t_chunks, axis=0)

        widths = [*statics.out_channels_list, 1]
        precision = (
            jax.lax.Precision.HIGHEST
            if statics.matmul_precision == "highest"
            else jax.lax.Precision.DEFAULT
        )
        for index, mat in enumerate(mats_g):
            if index:
                c_in = widths[index - 1]
                slabs = [x[c * n : (c + 1) * n] for c in range(c_in)]
                mean = sum(slabs) / c_in
                centered = x - jnp.tile(mean, (c_in, 1))
                c_slabs = [centered[c * n : (c + 1) * n] for c in range(c_in)]
                var = sum(cs * cs for cs in c_slabs) / c_in
                istd = jax.lax.rsqrt(var + 1e-5)
                istd_t = jnp.tile(istd, (c_in, 1))
                y = centered * istd_t
                tx_slabs = [tx[c * n : (c + 1) * n] for c in range(c_in)]
                t_mean = sum(tx_slabs) / c_in
                tc = tx - jnp.tile(t_mean, (c_in, 1))
                # the t_mean term of proj is exactly zero: sum_c cs = 0
                proj = sum(
                    cs * ts for cs, ts in zip(c_slabs, tx_slabs)
                ) / c_in
                ty = istd_t * (tc - y * istd_t * jnp.tile(proj, (c_in, 1)))
                cdf, pdf = _gelu_cdf_pdf(y)
                res["ln"].append(
                    {"y": y, "istd": istd, "tc": tc, "proj": proj,
                     "cdf": cdf, "pdf": pdf, "ty": ty, "c_in": c_in}
                )
                x = y * cdf
                tx = (cdf + y * pdf) * ty
            x_h = jnp.concatenate([x, ones_nt], axis=0)
            t_h = jnp.concatenate([tx, jnp.zeros((n, t), x.dtype)], axis=0)
            stacked = jnp.concatenate([x_h, t_h], axis=1)   # [(C+1)n, 2T]
            res["stacked"].append(stacked)
            out = jax.lax.dot_general(
                mat, stacked,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )
            x = out[:, :t]
            tx = out[:, t:]
        sig = jax.nn.sigmoid(x - 1.0)
        res["raw"] = x
        res["traw"] = tx
        res["sig"] = sig
        distances = distances + sig
        t_dist = t_dist + sig * (1.0 - sig) * tx

    return distances, t_dist, res


def _group_dir_bwd(res, mats_g, rotations, d_bar, td_bar,
                   statics: FieldStatics, n: int):
    """Reverse sweep for one group. ``d_bar``/``td_bar`` are the group's
    slices of the stage-A cotangents. Returns (dloc [n,3], drot9 [n,9]
    row-major (i*3+c), dhalf [n,3], dmats list of 2D per-layer blocks)."""
    t = d_bar.shape[1]
    local = res["local"]
    vloc = res["vloc"]
    q = res["q"]
    outside = res["outside"]
    s_r = res["s_r"]
    sign_l = tuple(jnp.sign(l) for l in local)
    tq = tuple(sign_l[c] * vloc[c] for c in range(3))
    rq = tuple(jax.nn.relu(qc) for qc in q)
    m1 = jnp.maximum(q[0], q[1])
    qmax = jnp.maximum(m1, q[2])
    pick01 = q[0] > q[1]
    pick2 = qmax > m1
    ig = (qmax < 0.0).astype(d_bar.dtype)
    not2 = jnp.logical_not(pick2)
    sel = (
        jnp.logical_and(not2, pick01).astype(d_bar.dtype),
        jnp.logical_and(not2, jnp.logical_not(pick01)).astype(d_bar.dtype),
        pick2.astype(d_bar.dtype),
    )

    local_bar = [0.0, 0.0, 0.0]
    vloc_bar = [0.0, 0.0, 0.0]
    dmats = []

    if statics.use_rdf:
        traw = res["traw"]
        sig = res["sig"]
        sigp = sig * (1.0 - sig)
        xo = d_bar * sigp + td_bar * traw * (sigp * (1.0 - 2.0 * sig))
        txo = td_bar * sigp
        precision = (
            jax.lax.Precision.HIGHEST
            if statics.matmul_precision == "highest"
            else jax.lax.Precision.DEFAULT
        )
        x_enc_bar = t_enc_bar = None
        for index in reversed(range(len(mats_g))):
            stacked = res["stacked"][index]
            obar = jnp.concatenate([xo, txo], axis=1)        # [C_out n, 2T]
            dmats.append(
                jax.lax.dot_general(
                    obar, stacked,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32,
                )
            )                                                # [C_out n, (C+1)n]
            xbar_full = jax.lax.dot_general(
                mats_g[index], obar,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )                                                # [(C+1)n, 2T]
            c_rows = stacked.shape[0] - n                    # C_in * n
            gbar = xbar_full[:c_rows, :t]
            tgbar = xbar_full[:c_rows, t:]
            if index:
                ln = res["ln"][index - 1]
                y, istd, tc = ln["y"], ln["istd"], ln["tc"]
                proj, cdf, pdf, ty = ln["proj"], ln["cdf"], ln["pdf"], ln["ty"]
                c_in = ln["c_in"]
                dgelu = cdf + y * pdf
                ybar = gbar * dgelu + tgbar * ty * (pdf * (2.0 - y * y))
                tybar = tgbar * dgelu

                def ssum(z):
                    return sum(z[c * n : (c + 1) * n] for c in range(c_in))

                istd_t = jnp.tile(istd, (c_in, 1))
                # tangent-channel adjoint: same form as the LN transpose
                m_ty = ssum(tybar) / c_in
                m_tyy = ssum(tybar * y) / c_in
                txo = istd_t * (
                    tybar
                    - jnp.tile(m_ty, (c_in, 1))
                    - y * jnp.tile(m_tyy, (c_in, 1))
                )
                # primal LN transpose
                m_y = ssum(ybar) / c_in
                m_yy = ssum(ybar * y) / c_in
                a1 = istd_t * (
                    ybar
                    - jnp.tile(m_y, (c_in, 1))
                    - y * jnp.tile(m_yy, (c_in, 1))
                )
                # second-order term d/da <tybar, JVP_LN_a(t)>
                a_sum = ssum(tybar * tc)
                by = ssum(tybar * y)
                sy = ssum(tybar)
                istd2 = istd * istd
                istd3p = istd2 * istd * proj
                coef = istd2 * (1.0 / c_in)
                a2 = (
                    -jnp.tile(coef * (a_sum - 3.0 * istd * proj * by), (c_in, 1)) * y
                    - jnp.tile(coef * by, (c_in, 1)) * tc
                    - jnp.tile(istd3p, (c_in, 1)) * tybar
                    + jnp.tile(istd3p * sy * (1.0 / c_in), (c_in, 1))
                )
                xo = a1 + a2
            else:
                x_enc_bar = gbar
                t_enc_bar = tgbar
        dmats.reverse()

        # encoding reverse
        tsym = res["tsym"]
        trig = res["trig"]
        inv_scale = 1.0 / statics.position_scale
        sym_bar = [0.0, 0.0, 0.0]
        tsym_bar = [0.0, 0.0, 0.0]
        idx = 0
        for k in range(statics.num_frequencies):
            f = math.pi * (2.0**k)
            for d in range(3):
                c_, s_ = trig[idx]
                r0 = (2 * idx) * n
                cbar = x_enc_bar[r0 : r0 + n]
                sbar = x_enc_bar[r0 + n : r0 + 2 * n]
                tcbar = t_enc_bar[r0 : r0 + n]
                tsbar = t_enc_bar[r0 + n : r0 + 2 * n]
                sym_bar[d] = (
                    sym_bar[d]
                    + f * (sbar * c_ - cbar * s_)
                    - (f * f) * tsym[d] * (tcbar * c_ + tsbar * s_)
                )
                tsym_bar[d] = tsym_bar[d] + f * (tsbar * c_ - tcbar * s_)
                idx += 1
        local_bar[0] = sym_bar[0] * sign_l[0] * inv_scale
        local_bar[1] = sym_bar[1] * inv_scale
        local_bar[2] = sym_bar[2] * inv_scale
        vloc_bar[0] = tsym_bar[0] * sign_l[0] * inv_scale
        vloc_bar[1] = tsym_bar[1] * inv_scale
        vloc_bar[2] = tsym_bar[2] * inv_scale

    # box part
    inv_out = 1.0 / outside
    inv_out3 = inv_out * inv_out * inv_out
    q_bar = []
    for c in range(3):
        qpos = (q[c] > 0.0).astype(d_bar.dtype)
        qb = (
            d_bar * (rq[c] * inv_out)
            + td_bar * (qpos * tq[c] * inv_out - s_r * rq[c] * inv_out3)
            + d_bar * ig * sel[c]
        )
        tqb = td_bar * (rq[c] * inv_out) + td_bar * ig * sel[c]
        q_bar.append(qb)
        local_bar[c] = local_bar[c] + qb * sign_l[c]
        vloc_bar[c] = vloc_bar[c] + tqb * sign_l[c]

    def col(i, c):
        return rotations[:, i, c][:, None]

    rel = res["rel"]
    v = res["v"]
    dloc = jnp.concatenate(
        [
            -jnp.sum(
                local_bar[0] * col(i, 0)
                + local_bar[1] * col(i, 1)
                + local_bar[2] * col(i, 2),
                axis=1, keepdims=True,
            )
            for i in range(3)
        ],
        axis=1,
    )
    drot9 = jnp.concatenate(
        [
            jnp.sum(
                local_bar[c] * rel[i] + vloc_bar[c] * v[i],
                axis=1, keepdims=True,
            )
            for i in range(3)
            for c in range(3)
        ],
        axis=1,
    )
    dhalf = jnp.concatenate(
        [-jnp.sum(qb, axis=1, keepdims=True) for qb in q_bar], axis=1
    )
    return dloc, drot9, dhalf, dmats


def _stage_a_bwd(distances, td, valid, temperature, du, dw):
    """Cotangents (d_bar, td_bar) of the softmin union + directional
    derivative given output cotangents (du on u, dw on w, ones on u_dot).
    All [N, T] slab arithmetic; see the derivation in the section
    comment above."""
    inv_t = 1.0 / temperature
    logits = -distances * inv_t + (valid - 1.0) * 1e30
    w = jax.nn.softmax(logits, axis=0)
    u = jnp.sum(distances * w, axis=0, keepdims=True)
    m = jnp.sum(w * td, axis=0, keepdims=True)
    scale = 1.0 + (u - distances) * inv_t
    td_bar = w * scale
    w_tot = dw + du * distances + td * scale + m * distances * inv_t
    l_bar = w * (w_tot - jnp.sum(w * w_tot, axis=0, keepdims=True))
    d_bar = du * w + w * (m - td) * inv_t - l_bar * inv_t
    return d_bar, td_bar


# ---------------------------------------------------------------------------
# Reverse-mode spatial gradient for the fine forward.
#
# The K=3 forward-tangent evaluator pays 3 tangent chains (each with an
# LN-JVP per layer) and 4T-wide stacked matmuls to produce grad_x u.
# But u is SCALAR per point, so reverse-mode gets all 3 components in
# ONE sweep: with w = softmax(-d/tau) and u = sum_i w_i d_i,
#     grad_x u = sum_i c_i grad_x d_i,   c_i = w_i (1 + (u - d_i)/tau)
# (the same stage-A cotangent as `_stage_a_bwd`'s td_bar). Each group
# then runs a primal forward saving residuals plus a position-only
# transpose: T-wide matmuls both ways, one LN transpose per layer, no
# second-order terms, no parameter-cotangent matmuls.
#
# Math identical to the tangent path (reverse-mode rounding only);
# equality is pinned by tests/test_fused_field.py. Reference semantics:
# /root/reference/vsrd/rendering/renderers.py:214-236 (grad via
# torch.autograd.grad of the union distance).
# ---------------------------------------------------------------------------


def _group_fwd_res_x(pos_t, locations, rotations, half_dims, mats_g,
                     statics: FieldStatics, n: int):
    """Primal-only group forward saving the residuals `_group_rev_x`
    needs for the position transpose. Mirrors `_group_distances`'
    primal exactly (same op order, so u/w match the tangent path)."""
    t = pos_t.shape[1]
    ones_nt = jnp.ones((n, t), pos_t.dtype)
    rel = tuple(
        jnp.tile(pos_t[i : i + 1], (n, 1)) - locations[:, i : i + 1]
        for i in range(3)
    )

    def col(i, c):
        return rotations[:, i, c][:, None]

    local = tuple(
        rel[0] * col(0, c) + rel[1] * col(1, c) + rel[2] * col(2, c)
        for c in range(3)
    )
    sign_l = tuple(jnp.sign(l) for l in local)
    q = tuple(
        jnp.abs(local[c]) - half_dims[:, c : c + 1] for c in range(3)
    )
    relu_q = tuple(jax.nn.relu(qc) for qc in q)
    outside = jnp.sqrt(
        relu_q[0] ** 2 + relu_q[1] ** 2 + relu_q[2] ** 2 + 1e-6
    )
    m1 = jnp.maximum(q[0], q[1])
    q_max = jnp.maximum(m1, q[2])
    distances = outside - jax.nn.relu(-q_max)                   # [n, T]

    res = {"sign_l": sign_l, "q": q, "rq": relu_q, "outside": outside,
           "m1": m1, "qmax": q_max, "ln": []}

    if statics.use_rdf:
        inv_scale = 1.0 / statics.position_scale
        sym = (jnp.abs(local[0]) * inv_scale,
               local[1] * inv_scale,
               local[2] * inv_scale)
        trig = _encoding_trig(
            sym, statics.num_frequencies,
            fast=statics.matmul_precision != "highest",
        )
        res["trig"] = trig
        x = jnp.concatenate(
            [v for pair in trig for v in pair], axis=0
        )                                                       # [48n, T]
        widths = [*statics.out_channels_list, 1]
        precision = (
            jax.lax.Precision.HIGHEST
            if statics.matmul_precision == "highest"
            else jax.lax.Precision.DEFAULT
        )
        for index, mat in enumerate(mats_g):
            if index:
                c_in = widths[index - 1]
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
                cdf, pdf = _gelu_cdf_pdf(y)
                res["ln"].append(
                    {"y": y, "istd": inv_std, "dgelu": cdf + y * pdf,
                     "c_in": c_in}
                )
                x = y * cdf
            x_h = jnp.concatenate([x, ones_nt], axis=0)
            x = jax.lax.dot_general(
                mat, x_h,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )                                                   # [C_out n, T]
        sig = jax.nn.sigmoid(x - 1.0)
        res["sig"] = sig
        distances = distances + sig

    return distances, res


def _group_rev_x(res, mats_g, rotations, d_bar, statics: FieldStatics,
                 n: int):
    """Position transpose for one group: cotangent ``d_bar [n, T]`` on
    the group's distances -> contribution to grad_x u, a list of 3
    ``[1, T]`` rows (world axes). Parameters are constants here — no
    dmats / dloc / drot / dhalf work."""
    sign_l = res["sign_l"]
    q = res["q"]
    rq = res["rq"]
    outside = res["outside"]
    pick01 = q[0] > q[1]
    pick2 = res["qmax"] > res["m1"]
    ig = (res["qmax"] < 0.0).astype(d_bar.dtype)
    not2 = jnp.logical_not(pick2)
    sel = (
        jnp.logical_and(not2, pick01).astype(d_bar.dtype),
        jnp.logical_and(not2, jnp.logical_not(pick01)).astype(d_bar.dtype),
        pick2.astype(d_bar.dtype),
    )

    local_bar = [0.0, 0.0, 0.0]
    if statics.use_rdf:
        sig = res["sig"]
        xo = d_bar * (sig * (1.0 - sig))                        # [n, T]
        precision = (
            jax.lax.Precision.HIGHEST
            if statics.matmul_precision == "highest"
            else jax.lax.Precision.DEFAULT
        )
        x_enc_bar = None
        for index in reversed(range(len(mats_g))):
            xbar_full = jax.lax.dot_general(
                mats_g[index], xo,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )                                                   # [(C+1)n, T]
            gbar = xbar_full[: xbar_full.shape[0] - n]          # drop bias
            if index:
                ln = res["ln"][index - 1]
                y, c_in = ln["y"], ln["c_in"]
                ybar = gbar * ln["dgelu"]

                def ssum(z, c_in=c_in):
                    return sum(z[c * n : (c + 1) * n] for c in range(c_in))

                istd_t = jnp.tile(ln["istd"], (c_in, 1))
                m_y = ssum(ybar) / c_in
                m_yy = ssum(ybar * y) / c_in
                xo = istd_t * (
                    ybar
                    - jnp.tile(m_y, (c_in, 1))
                    - y * jnp.tile(m_yy, (c_in, 1))
                )
            else:
                x_enc_bar = gbar
        # encoding reverse
        trig = res["trig"]
        inv_scale = 1.0 / statics.position_scale
        sym_bar = [0.0, 0.0, 0.0]
        idx = 0
        for k in range(statics.num_frequencies):
            f = math.pi * (2.0**k)
            for d in range(3):
                c_, s_ = trig[idx]
                r0 = (2 * idx) * n
                cbar = x_enc_bar[r0 : r0 + n]
                sbar = x_enc_bar[r0 + n : r0 + 2 * n]
                sym_bar[d] = sym_bar[d] + f * (sbar * c_ - cbar * s_)
                idx += 1
        local_bar[0] = sym_bar[0] * sign_l[0] * inv_scale
        local_bar[1] = sym_bar[1] * inv_scale
        local_bar[2] = sym_bar[2] * inv_scale

    # box part
    inv_out = 1.0 / outside
    for c in range(3):
        qb = d_bar * (rq[c] * inv_out) + d_bar * ig * sel[c]
        local_bar[c] = local_bar[c] + qb * sign_l[c]

    def col(i, c):
        return rotations[:, i, c][:, None]

    return [
        jnp.sum(
            local_bar[0] * col(i, 0)
            + local_bar[1] * col(i, 1)
            + local_bar[2] * col(i, 2),
            axis=0, keepdims=True,
        )
        for i in range(3)
    ]


def _scene_eval_stacked_rev(pos_t, locations, rotations, half_dims, valid,
                            mats, temperature, statics: FieldStatics):
    """(u [1, T], weights [N, T], grads [3, T]) with the gradient from
    one reverse sweep per group instead of 3 forward tangents. Primal
    math matches `_scene_eval_stacked_core` op-for-op; the gradient is
    the exact stage-A-weighted sum of per-group position transposes."""
    n = statics.num_instances
    g_size = group_size_of(n)
    num_groups = n // g_size

    dist_parts, residuals = [], []
    for g in range(num_groups):
        sl = slice(g * g_size, (g + 1) * g_size)
        d_g, res_g = _group_fwd_res_x(
            pos_t, locations[sl], rotations[sl], half_dims[sl],
            tuple(m[g] for m in mats), statics, g_size,
        )
        dist_parts.append(d_g)
        residuals.append(res_g)
    distances = (
        jnp.concatenate(dist_parts, axis=0) if num_groups > 1
        else dist_parts[0]
    )                                                           # [N, T]

    logits = -distances / temperature + (valid - 1.0) * 1e30
    weights = jax.nn.softmax(logits, axis=0)
    union = jnp.sum(distances * weights, axis=0, keepdims=True)  # [1, T]
    # du/dd_i with u = sum w d, w = softmax(-d/tau) (== stage-A td_bar)
    c_bar = weights * (1.0 + (union - distances) / temperature)  # [N, T]

    grads = None
    for g in range(num_groups):
        sl = slice(g * g_size, (g + 1) * g_size)
        pb = _group_rev_x(
            residuals[g], tuple(m[g] for m in mats), rotations[sl],
            c_bar[sl], statics, g_size,
        )
        grads = pb if grads is None else [a + b for a, b in zip(grads, pb)]
    return union, weights, jnp.concatenate(grads, axis=0)        # [3, T]


def scene_eval_stacked_dir_bwd_t(pos_t, dg_t, locations, rotations, half_dims,
                                 valid, mats, temperature,
                                 statics: FieldStatics, du, dw,
                                 group_mask=None):
    """Hand-written VJP of ``scene_eval_stacked_dir_t`` w.r.t.
    (locations, rotations, half_dims, mats) with output cotangents
    (``du`` [1, T] on u, ``dw`` [N, T] on weights, ones on u_dot).

    Returns ``(dloc [N,3], drot9 [N,9] row-major, dhalf [N,3],
    dmats: list per layer of list per group of 2D blocks)`` — 2D shapes
    throughout so the Pallas kernel body never reshapes >2D.

    With ``group_mask`` (per-tile group skipping) the sweep runs in TWO
    passes instead of one: pass 1 computes only (d, td) per group under
    `lax.cond` (the residual keeps are dead code there, so XLA prunes
    them and the dead arm fills two [g, T] slabs); after stage A, pass 2
    re-runs the residual-saving forward FUSED with the reverse sweep
    inside the live arm, so the big recompute residuals never escape a
    cond as values (a dead arm would otherwise have to zero-fill ~10 MB
    of residual buffers per skipped group). Live groups pay one extra
    plain forward; skipped groups cost two slab fills. Skipped groups'
    d_bar/td_bar are exactly zero (their softmin weights underflow), so
    dropping their reverse sweep is exact given pass 1's distances.
    """
    n = statics.num_instances
    g_size = group_size_of(n)
    num_groups = n // g_size
    t = pos_t.shape[1]

    if group_mask is not None and num_groups > 1:
        ds, tds = [], []
        for g in range(num_groups):
            sl = slice(g * g_size, (g + 1) * g_size)

            def live_fwd(sl=sl, g=g):
                d_g, td_g, _ = _group_dir_fwd_res(
                    pos_t, dg_t, locations[sl], rotations[sl],
                    half_dims[sl], tuple(m[g] for m in mats), statics,
                    g_size,
                )
                return d_g, td_g

            def dead_fwd():
                return (
                    jnp.full((g_size, t), _SKIP_DISTANCE, pos_t.dtype),
                    jnp.zeros((g_size, t), pos_t.dtype),
                )

            d_g, td_g = jax.lax.cond(group_mask[g] != 0, live_fwd, dead_fwd)
            ds.append(d_g)
            tds.append(td_g)
        distances = jnp.concatenate(ds, axis=0)
        td = jnp.concatenate(tds, axis=0)

        d_bar, td_bar = _stage_a_bwd(distances, td, valid, temperature, du, dw)

        dlocs, drots, dhalfs = [], [], []
        dmats_groups = [[] for _ in mats]
        for g in range(num_groups):
            sl = slice(g * g_size, (g + 1) * g_size)

            def live_bwd(sl=sl, g=g):
                _, _, res = _group_dir_fwd_res(
                    pos_t, dg_t, locations[sl], rotations[sl],
                    half_dims[sl], tuple(m[g] for m in mats), statics,
                    g_size,
                )
                dloc_g, drot9_g, dhalf_g, dmats_g = _group_dir_bwd(
                    res, tuple(m[g] for m in mats), rotations[sl],
                    d_bar[sl], td_bar[sl], statics, g_size,
                )
                return dloc_g, drot9_g, dhalf_g, tuple(dmats_g)

            def dead_bwd(g=g):
                return (
                    jnp.zeros((g_size, 3), pos_t.dtype),
                    jnp.zeros((g_size, 9), pos_t.dtype),
                    jnp.zeros((g_size, 3), pos_t.dtype),
                    tuple(
                        jnp.zeros((m.shape[1], m.shape[2]), pos_t.dtype)
                        for m in mats
                    ),
                )

            dloc_g, drot9_g, dhalf_g, dmats_g = jax.lax.cond(
                group_mask[g] != 0, live_bwd, dead_bwd
            )
            dlocs.append(dloc_g)
            drots.append(drot9_g)
            dhalfs.append(dhalf_g)
            for li, dm in enumerate(dmats_g):
                dmats_groups[li].append(dm)

        cat = lambda xs: jnp.concatenate(xs, axis=0)  # noqa: E731
        return cat(dlocs), cat(drots), cat(dhalfs), dmats_groups

    ds, tds, reses = [], [], []
    for g in range(num_groups):
        sl = slice(g * g_size, (g + 1) * g_size)
        d_g, td_g, res = _group_dir_fwd_res(
            pos_t, dg_t, locations[sl], rotations[sl], half_dims[sl],
            tuple(m[g] for m in mats), statics, g_size,
        )
        ds.append(d_g)
        tds.append(td_g)
        reses.append(res)
    distances = jnp.concatenate(ds, axis=0) if num_groups > 1 else ds[0]
    td = jnp.concatenate(tds, axis=0) if num_groups > 1 else tds[0]

    d_bar, td_bar = _stage_a_bwd(distances, td, valid, temperature, du, dw)

    dlocs, drots, dhalfs = [], [], []
    dmats_groups = [[] for _ in mats]
    for g in range(num_groups):
        sl = slice(g * g_size, (g + 1) * g_size)
        dloc_g, drot9_g, dhalf_g, dmats_g = _group_dir_bwd(
            reses[g], tuple(m[g] for m in mats), rotations[sl],
            d_bar[sl], td_bar[sl], statics, g_size,
        )
        dlocs.append(dloc_g)
        drots.append(drot9_g)
        dhalfs.append(dhalf_g)
        for li, dm in enumerate(dmats_g):
            dmats_groups[li].append(dm)

    cat = (lambda xs: jnp.concatenate(xs, axis=0)) if num_groups > 1 else (
        lambda xs: xs[0]
    )
    return cat(dlocs), cat(drots), cat(dhalfs), dmats_groups


def scene_eval_stacked_dir_bwd(positions, dg, locations, rotations, half_dims,
                               valid, mats, temperature,
                               statics: FieldStatics, du, dw):
    """Standard-layout adapter over the hand-written reverse (tests/XLA):
    returns (dloc [N,3], drot [N,3,3], dhalf [N,3], dmats like ``mats``)."""
    n = statics.num_instances
    dloc, drot9, dhalf, dmats_groups = scene_eval_stacked_dir_bwd_t(
        positions.T, dg.T, locations, rotations, half_dims, valid[:, None],
        mats, temperature, statics, du[None, :], dw.T,
    )
    drot = drot9.reshape(n, 3, 3)
    dmats = tuple(jnp.stack(groups, axis=0) for groups in dmats_groups)
    return dloc, drot, dhalf, dmats


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
