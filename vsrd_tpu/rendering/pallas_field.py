"""Fused Pallas TPU kernel for the scene field + spatial gradient.

This is the framework's flagship kernel: it evaluates, for a tile of
sample points held entirely in VMEM, the whole per-point pipeline —

    instance-frame transform -> box SDF -> sinusoidal encoding ->
    per-instance hyper-MLP residual -> masked softmin union ->
    hand-rolled forward-mode spatial gradient (3 tangents)

— writing only the results (sdf, d sdf/d x, union weights) back to HBM.
The pure-XLA path materializes ~2-3 GB/step of [P, N, 48]-sized
intermediates in HBM; the kernel's HBM traffic is the ~12 MB of inputs
and outputs, turning the renderer from bandwidth-bound to compute-bound.

Everything runs in transposed (channels x points) layout so channel
buffers pad to sublane multiples of 8 instead of lane multiples of 128
(~10x VMEM saving; see fused_field._instance_distance_with_tangents_t).

The backward pass is a second kernel that *recomputes* the tile in VMEM
(flash-attention style) and applies `jax.vjp` to the tile-local function
— tracing happens at kernel-build time, so reverse-mode runs inside the
kernel with no HBM residuals. Parameter cotangents accumulate across
sequential grid steps into revisited output blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_field import (
    FieldStatics,
    group_size_of,
    group_skip_threshold,
    group_tile_mask,
    scene_eval_stacked_dir_bwd_t,
    scene_eval_stacked_dir_t,
    scene_eval_stacked_t,
)


def _skip_active(statics: FieldStatics) -> bool:
    """Group skipping engages only when there are multiple groups."""
    return (
        statics.group_skip
        and statics.num_instances > group_size_of(statics.num_instances)
    )


def _read_group_mask(statics, tile_axis, mask_ref):
    """Per-group scalars for this grid step from the SMEM mask array
    ([G, tiles] single-frame / [F, G, tiles] batched)."""
    num_groups = statics.num_instances // group_size_of(statics.num_instances)
    tid = pl.program_id(tile_axis)
    if tile_axis == 0:
        return tuple(mask_ref[g, tid] for g in range(num_groups))
    f = pl.program_id(0)
    return tuple(mask_ref[f, g, tid] for g in range(num_groups))


def _compute_masks(statics, positions, locations, half_dims, valid,
                   temperature, tile):
    """[G, ceil(P/tile)] (or [F, G, tiles] batched) keep masks, or None
    when skipping is off. ``positions`` unpadded, ``valid`` float [N]."""
    if not _skip_active(statics):
        return None
    g_size = group_size_of(statics.num_instances)
    threshold = group_skip_threshold(
        statics, jnp.asarray(temperature, jnp.float32)
    )
    fn = functools.partial(
        group_tile_mask, tile=tile, g_size=g_size, threshold=threshold
    )
    if positions.ndim == 3:
        return jax.vmap(lambda p, l, h, v: fn(p, l, h, v))(
            positions, locations, half_dims, valid
        )
    return fn(positions, locations, half_dims, valid)


# Set True (e.g. in CPU tests) to run kernels in the Pallas interpreter.
INTERPRET = False

# Backward-kernel implementation: the hand-written reverse sweep
# (fused_field.scene_eval_stacked_dir_bwd_t) or `jax.vjp` of the
# directional forward traced at kernel-build time. The manual reverse
# shares every recompute subexpression with its reverse sweep and fuses
# the LayerNorm second-order transpose; flip to False to A/B against
# the autodiff kernel (bench.py --verify checks both against XLA).
MANUAL_BACKWARD = True


def pallas_supported() -> bool:
    return jax.default_backend() == "tpu"


def _pad_to(x, multiple, axis):
    size = x.shape[axis]
    padded = (size + multiple - 1) // multiple * multiple
    if padded == size:
        return x, size
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, padded - size)
    return jnp.pad(x, pad), size


def _fwd_kernel(statics, tile_axis, pos_ref, loc_ref, rot_ref, half_ref,
                valid_ref, temp_ref, *rest):
    group_mask = None
    if _skip_active(statics):
        mask_ref, *rest = rest
        group_mask = _read_group_mask(statics, tile_axis, mask_ref)
    n_layers = len(rest) - 3
    layer_refs = rest[:n_layers]
    u_ref, g_ref, w_ref = rest[n_layers:]

    layers = tuple(r[:] for r in layer_refs)
    union, weights, grads = scene_eval_stacked_t(
        pos_ref[:],
        loc_ref[:],
        rot_ref[:],
        half_ref[:],
        valid_ref[:],
        layers,
        temp_ref[0],
        statics,
        group_mask,
    )
    u_ref[:] = union
    g_ref[:] = grads
    w_ref[:] = weights


def _dir_fwd_kernel(statics, tile_axis, pos_ref, dir_ref, loc_ref, rot_ref,
                    half_ref, valid_ref, temp_ref, *rest):
    group_mask = None
    if _skip_active(statics):
        mask_ref, *rest = rest
        group_mask = _read_group_mask(statics, tile_axis, mask_ref)
    n_layers = len(rest) - 3
    layer_refs = rest[:n_layers]
    u_ref, ud_ref, w_ref = rest[n_layers:]

    layers = tuple(r[:] for r in layer_refs)
    union, weights, u_dot = scene_eval_stacked_dir_t(
        pos_ref[:],
        dir_ref[:],
        loc_ref[:],
        rot_ref[:],
        half_ref[:],
        valid_ref[:],
        layers,
        temp_ref[0],
        statics,
        group_mask,
    )
    u_ref[:] = union
    ud_ref[:] = u_dot
    w_ref[:] = weights


def _bwd_kernel(statics, n_layers, tile_axis, pos_ref, loc_ref, rot_ref,
                half_ref, valid_ref, temp_ref, *rest):
    # rest layout: [*layers] [du dg dw] [dloc drot dhalf *dlayers]
    layer_refs = rest[:n_layers]
    du_ref, dg_ref, dw_ref = rest[n_layers : n_layers + 3]
    dloc_ref, drot_ref, dhalf_ref = rest[n_layers + 3 : n_layers + 6]
    dlayer_refs = rest[n_layers + 6 :]

    pos_t = pos_ref[:]
    temperature = temp_ref[0]
    valid = valid_ref[:]
    layers = tuple(r[:] for r in layer_refs)
    dg_t = dg_ref[:]                                             # [3, T]

    # The gradient cotangent dg fixes ONE direction per point, so instead
    # of VJP-ing the 3-basis-tangent forward (whose reverse pass pays
    # second-order cost for all three tangents), recompute a single
    # directional tangent along dg and VJP it with cotangent 1:
    #   sum_j dg_j * d(grad_j)/d(theta) == d(D_dg u)/d(theta).
    def f(loc, rot, half, layers):
        return scene_eval_stacked_dir_t(
            pos_t, dg_t, loc, rot, half, valid, layers, temperature, statics
        )

    (u, _, u_dot), vjp_fn = jax.vjp(
        f, loc_ref[:], rot_ref[:], half_ref[:], layers
    )
    dloc, drot, dhalf, dlayers = vjp_fn(
        (du_ref[:], dw_ref[:], jnp.ones_like(u_dot))
    )

    step = pl.program_id(tile_axis)

    @pl.when(step == 0)
    def _():
        dloc_ref[:] = jnp.zeros_like(dloc_ref)
        drot_ref[:] = jnp.zeros_like(drot_ref)
        dhalf_ref[:] = jnp.zeros_like(dhalf_ref)
        for ref in dlayer_refs:
            ref[:] = jnp.zeros_like(ref)

    dloc_ref[:] += dloc
    drot_ref[:] += drot
    dhalf_ref[:] += dhalf
    for ref, grad in zip(dlayer_refs, dlayers):
        ref[:] += grad.astype(ref.dtype)


def _bwd_kernel_manual(statics, n_layers, tile_axis, pos_ref, loc_ref,
                       rot_ref, half_ref, valid_ref, temp_ref, *rest):
    """Hand-written reverse kernel body. Same operand layout as
    `_bwd_kernel` except the rotation cotangent is a 2D [N, 9] block and
    each layer cotangent a 2D [G*rows, cols] block (reshaped by the
    caller) so the kernel never builds >2D values."""
    group_mask = None
    if _skip_active(statics):
        mask_ref, *rest = rest
        group_mask = _read_group_mask(statics, tile_axis, mask_ref)
    layer_refs = rest[:n_layers]
    du_ref, dg_ref, dw_ref = rest[n_layers : n_layers + 3]
    dloc_ref, drot_ref, dhalf_ref = rest[n_layers + 3 : n_layers + 6]
    dlayer_refs = rest[n_layers + 6 :]

    layers = tuple(r[:] for r in layer_refs)
    dloc, drot9, dhalf, dmats_groups = scene_eval_stacked_dir_bwd_t(
        pos_ref[:], dg_ref[:], loc_ref[:], rot_ref[:], half_ref[:],
        valid_ref[:], layers, temp_ref[0], statics, du_ref[:], dw_ref[:],
        group_mask,
    )

    step = pl.program_id(tile_axis)

    @pl.when(step == 0)
    def _():
        dloc_ref[:] = jnp.zeros_like(dloc_ref)
        drot_ref[:] = jnp.zeros_like(drot_ref)
        dhalf_ref[:] = jnp.zeros_like(dhalf_ref)
        for ref in dlayer_refs:
            ref[:] = jnp.zeros_like(ref)

    dloc_ref[:] += dloc
    drot_ref[:] += drot9
    dhalf_ref[:] += dhalf
    for ref, groups in zip(dlayer_refs, dmats_groups):
        rows = groups[0].shape[0]
        for g, dm in enumerate(groups):
            ref[g * rows : (g + 1) * rows, :] += dm


def _tile_spec(rows, tile):
    return pl.BlockSpec((rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM)


def _const_spec(shape):
    return pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )


# Batched (frame-axis) specs: grid (F, tiles); the leading frame dim of
# every operand is squeezed (block dim None) so the SAME kernel bodies
# serve both the single-frame and the batched calls. The frame axis is
# a real grid dimension instead of `vmap`-of-pallas_call because the
# auto-batched module is rejected by the compile service at this kernel's
# size (see NOTES.md).
def _tile_spec_b(rows, tile):
    return pl.BlockSpec(
        (None, rows, tile), lambda f, i: (f, 0, i), memory_space=pltpu.VMEM
    )


def _const_spec_b(shape):
    # per-frame constant: shape is the per-frame block (without F)
    return pl.BlockSpec(
        (None, *shape),
        lambda f, i: (f,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_field_with_grad(statics: FieldStatics, tile, positions,
                          locations, rotations, half_dims, valid, layers,
                          temperature):
    """(sdf [P], weights [P, N], grads [P, 3]) on TPU via Pallas.

    ``positions [P, 3]``; differentiable w.r.t. locations / rotations /
    half_dims / layer weights (positions and temperature are constants on
    this path, matching the optimization's stop-gradient ray sampling).

    ``tile`` is the forward points-per-grid-step, or a ``(fwd, bwd)``
    pair to size the backward (recompute) kernel's tile separately.

    Batched mode: ``positions [F, P, 3]`` with a matching leading frame
    axis on locations/rotations/half_dims/valid/layers runs ONE kernel
    with grid ``(F, tiles)`` (temperature stays scalar — co-optimized
    frames share the annealing step). Returns ``(sdf [F, P], weights
    [F, P, N], grads [F, P, 3])``.
    """
    fwd_tile = tile[0] if isinstance(tile, tuple) else tile
    return _fused_forward(
        statics, fwd_tile, positions, locations, rotations, half_dims, valid,
        layers, temperature,
    )


def _fused_forward(statics, tile, positions, locations, rotations, half_dims,
                   valid, layers, temperature):
    if positions.ndim == 3:
        return _fused_forward_batched(
            statics, tile, positions, locations, rotations, half_dims,
            valid, layers, temperature,
        )
    n = statics.num_instances
    masks = _compute_masks(
        statics, positions, locations, half_dims, valid, temperature, tile
    )
    pos_t, p_real = _pad_to(positions.T, tile, axis=1)           # [3, P]
    p = pos_t.shape[1]
    grid = (p // tile,)
    valid = valid.reshape(n, 1)

    temperature = jnp.asarray(temperature, jnp.float32).reshape(1)

    out_shape = (
        jax.ShapeDtypeStruct((1, p), jnp.float32),
        jax.ShapeDtypeStruct((3, p), jnp.float32),
        jax.ShapeDtypeStruct((n, p), jnp.float32),
    )
    out_specs = (
        _tile_spec(1, tile),
        _tile_spec(3, tile),
        _tile_spec(n, tile),
    )

    mask_ops = () if masks is None else (masks,)
    in_specs = [
        _tile_spec(3, tile),                    # positions (transposed)
        _const_spec(locations.shape),
        _const_spec(rotations.shape),
        _const_spec(half_dims.shape),
        _const_spec(valid.shape),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # temperature
        *[pl.BlockSpec(memory_space=pltpu.SMEM) for _ in mask_ops],
        *[_const_spec(m.shape) for m in layers],
    ]

    u, g, w = pl.pallas_call(
        functools.partial(_fwd_kernel, statics, 0),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # default scoped VMEM (16 MB) throttles double-buffering of
            # the stacked [392, 4T] activation buffers
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(pos_t, locations, rotations, half_dims, valid, temperature,
      *mask_ops, *layers)

    return u[0, :p_real], w[:, :p_real].T, g[:, :p_real].T


def _fused_forward_batched(statics, tile, positions, locations, rotations,
                           half_dims, valid, layers, temperature):
    n = statics.num_instances
    f = positions.shape[0]
    masks = _compute_masks(
        statics, positions, locations, half_dims, valid, temperature, tile
    )
    pos_t, p_real = _pad_to(positions.transpose(0, 2, 1), tile, axis=2)
    p = pos_t.shape[2]
    grid = (f, p // tile)
    valid = valid.reshape(f, n, 1)

    temperature = jnp.asarray(temperature, jnp.float32).reshape(1)

    out_shape = (
        jax.ShapeDtypeStruct((f, 1, p), jnp.float32),
        jax.ShapeDtypeStruct((f, 3, p), jnp.float32),
        jax.ShapeDtypeStruct((f, n, p), jnp.float32),
    )
    out_specs = (
        _tile_spec_b(1, tile),
        _tile_spec_b(3, tile),
        _tile_spec_b(n, tile),
    )

    mask_ops = () if masks is None else (masks,)
    in_specs = [
        _tile_spec_b(3, tile),                  # positions (transposed)
        _const_spec_b(locations.shape[1:]),
        _const_spec_b(rotations.shape[1:]),
        _const_spec_b(half_dims.shape[1:]),
        _const_spec_b(valid.shape[1:]),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # temperature
        *[pl.BlockSpec(memory_space=pltpu.SMEM) for _ in mask_ops],
        *[_const_spec_b(m.shape[1:]) for m in layers],
    ]

    u, g, w = pl.pallas_call(
        functools.partial(_fwd_kernel, statics, 1),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(pos_t, locations, rotations, half_dims, valid, temperature,
      *mask_ops, *layers)

    return (
        u[:, 0, :p_real],
        w[:, :, :p_real].transpose(0, 2, 1),
        g[:, :, :p_real].transpose(0, 2, 1),
    )


def fused_field_dir_forward(statics, tile, positions, directions, locations,
                            rotations, half_dims, valid, layers, temperature):
    """(sdf [P], weights [P, N], u_dot [P]): forward-only evaluation with
    the directional derivative of the union SDF along per-point
    ``directions [P, 3]`` (K=1 tangent) instead of the full spatial
    gradient (K=3).

    Built for the hierarchical renderer's coarse pass: it runs under
    stop_gradient and only consumes NeuS section cosines, which for a
    near-unit-norm SDF gradient equal the directional derivative along
    the (unit) ray direction — so the 4T-wide tangent matmuls and two of
    the three tangent chains can be dropped. No VJP is defined: callers
    must keep this on gradient-stopped paths.

    Batched mode mirrors `fused_field_with_grad`: a leading frame axis on
    positions/directions/params runs one kernel with grid ``(F, tiles)``.
    """
    if positions.ndim == 3:
        return _fused_dir_forward_batched(
            statics, tile, positions, directions, locations, rotations,
            half_dims, valid, layers, temperature,
        )
    n = statics.num_instances
    masks = _compute_masks(
        statics, positions, locations, half_dims, valid, temperature, tile
    )
    pos_t, p_real = _pad_to(positions.T, tile, axis=1)           # [3, P]
    dir_t, _ = _pad_to(directions.T, tile, axis=1)
    p = pos_t.shape[1]
    grid = (p // tile,)
    valid = valid.reshape(n, 1)

    temperature = jnp.asarray(temperature, jnp.float32).reshape(1)

    out_shape = (
        jax.ShapeDtypeStruct((1, p), jnp.float32),
        jax.ShapeDtypeStruct((1, p), jnp.float32),
        jax.ShapeDtypeStruct((n, p), jnp.float32),
    )
    out_specs = (
        _tile_spec(1, tile),
        _tile_spec(1, tile),
        _tile_spec(n, tile),
    )

    mask_ops = () if masks is None else (masks,)
    in_specs = [
        _tile_spec(3, tile),                    # positions (transposed)
        _tile_spec(3, tile),                    # directions (transposed)
        _const_spec(locations.shape),
        _const_spec(rotations.shape),
        _const_spec(half_dims.shape),
        _const_spec(valid.shape),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # temperature
        *[pl.BlockSpec(memory_space=pltpu.SMEM) for _ in mask_ops],
        *[_const_spec(m.shape) for m in layers],
    ]

    u, ud, w = pl.pallas_call(
        functools.partial(_dir_fwd_kernel, statics, 0),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(pos_t, dir_t, locations, rotations, half_dims, valid, temperature,
      *mask_ops, *layers)

    return u[0, :p_real], w[:, :p_real].T, ud[0, :p_real]


def _fused_dir_forward_batched(statics, tile, positions, directions,
                               locations, rotations, half_dims, valid,
                               layers, temperature):
    n = statics.num_instances
    f = positions.shape[0]
    masks = _compute_masks(
        statics, positions, locations, half_dims, valid, temperature, tile
    )
    pos_t, p_real = _pad_to(positions.transpose(0, 2, 1), tile, axis=2)
    dir_t, _ = _pad_to(directions.transpose(0, 2, 1), tile, axis=2)
    p = pos_t.shape[2]
    grid = (f, p // tile)
    valid = valid.reshape(f, n, 1)

    temperature = jnp.asarray(temperature, jnp.float32).reshape(1)

    out_shape = (
        jax.ShapeDtypeStruct((f, 1, p), jnp.float32),
        jax.ShapeDtypeStruct((f, 1, p), jnp.float32),
        jax.ShapeDtypeStruct((f, n, p), jnp.float32),
    )
    out_specs = (
        _tile_spec_b(1, tile),
        _tile_spec_b(1, tile),
        _tile_spec_b(n, tile),
    )

    mask_ops = () if masks is None else (masks,)
    in_specs = [
        _tile_spec_b(3, tile),                  # positions (transposed)
        _tile_spec_b(3, tile),                  # directions (transposed)
        _const_spec_b(locations.shape[1:]),
        _const_spec_b(rotations.shape[1:]),
        _const_spec_b(half_dims.shape[1:]),
        _const_spec_b(valid.shape[1:]),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # temperature
        *[pl.BlockSpec(memory_space=pltpu.SMEM) for _ in mask_ops],
        *[_const_spec_b(m.shape[1:]) for m in layers],
    ]

    u, ud, w = pl.pallas_call(
        functools.partial(_dir_fwd_kernel, statics, 1),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(pos_t, dir_t, locations, rotations, half_dims, valid, temperature,
      *mask_ops, *layers)

    return (
        u[:, 0, :p_real],
        w[:, :, :p_real].transpose(0, 2, 1),
        ud[:, 0, :p_real],
    )


def _fused_fwd_rule(statics, tile, positions, locations, rotations, half_dims,
                    valid, layers, temperature):
    fwd_tile = tile[0] if isinstance(tile, tuple) else tile
    out = _fused_forward(
        statics, fwd_tile, positions, locations, rotations, half_dims, valid,
        layers, temperature,
    )
    residuals = (positions, locations, rotations, half_dims, valid, layers,
                 temperature)
    return out, residuals


def _fused_bwd_rule(statics, tile, residuals, cotangents):
    (positions, locations, rotations, half_dims, valid, layers,
     temperature) = residuals
    du, dw, dg = cotangents

    # The recompute inside the kernel holds the tile's reverse-sweep
    # residuals in VMEM, so the backward tile is sized separately — the
    # hand-written reverse's residual set is small enough for 2048-point
    # tiles (measured optimum); the vjp fallback's second-order residual
    # set is ~8x larger and needs 256. Both caps are enforced HERE (where
    # the tile is resolved) so they hold regardless of whether the caller
    # passed a (fwd, bwd) tuple or a scalar, and regardless of
    # MANUAL_BACKWARD — the caller-side groups x tile VMEM cap
    # (optimize.py) composes with this one via min().
    if isinstance(tile, tuple):
        tile = tile[1]
    if statics.use_rdf:
        if MANUAL_BACKWARD:
            # groups x tile scales the residual footprint (see
            # optimize.py's 5120 budget); apply it even for scalar-tile
            # callers so N>=24 doesn't overflow the 100 MB scoped VMEM
            num_groups = statics.num_instances // group_size_of(
                statics.num_instances
            )
            cap = max(256, (5120 // num_groups) // 256 * 256)
        else:
            cap = 256
        tile = min(tile, cap)

    if positions.ndim == 3:
        return _fused_bwd_batched(
            statics, tile, positions, locations, rotations, half_dims,
            valid, layers, temperature, du, dw, dg,
        )

    n = statics.num_instances
    valid2 = valid.reshape(n, 1)
    masks = (
        _compute_masks(
            statics, positions, locations, half_dims, valid, temperature,
            tile,
        )
        if MANUAL_BACKWARD
        else None
    )
    mask_ops = () if masks is None else (masks,)
    pos_t, p_real = _pad_to(positions.T, tile, axis=1)
    p = pos_t.shape[1]
    du_t, _ = _pad_to(du[None, :], tile, axis=1)                 # [1, P]
    dg_t, _ = _pad_to(dg.T, tile, axis=1)                        # [3, P]
    dw_t, _ = _pad_to(dw.T, tile, axis=1)                        # [N, P]
    grid = (p // tile,)

    temperature_arr = jnp.asarray(temperature, jnp.float32).reshape(1)

    manual = MANUAL_BACKWARD
    # manual mode keeps every kernel value 2D: [N, 9] rotation block and
    # [G*rows, cols] layer blocks, reshaped back below
    rot_shape = (n, 9) if manual else rotations.shape
    layer_shapes = [
        (m.shape[0] * m.shape[1], m.shape[2]) if manual else m.shape
        for m in layers
    ]
    kernel = _bwd_kernel_manual if manual else _bwd_kernel

    out_shape = (
        jax.ShapeDtypeStruct(locations.shape, jnp.float32),
        jax.ShapeDtypeStruct(rot_shape, jnp.float32),
        jax.ShapeDtypeStruct(half_dims.shape, jnp.float32),
        *[jax.ShapeDtypeStruct(s, jnp.float32) for s in layer_shapes],
    )
    out_specs = (
        _const_spec(locations.shape),
        _const_spec(rot_shape),
        _const_spec(half_dims.shape),
        *[_const_spec(s) for s in layer_shapes],
    )
    in_specs = [
        _tile_spec(3, tile),                     # positions (transposed)
        _const_spec(locations.shape),
        _const_spec(rotations.shape),
        _const_spec(half_dims.shape),
        _const_spec(valid2.shape),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        *[pl.BlockSpec(memory_space=pltpu.SMEM) for _ in mask_ops],
        *[_const_spec(m.shape) for m in layers],
        _tile_spec(1, tile),                     # du
        _tile_spec(3, tile),                     # dg
        _tile_spec(n, tile),                     # dw
    ]

    outs = pl.pallas_call(
        functools.partial(kernel, statics, len(layers), 0),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # the recompute residuals legitimately need more than the
            # conservative 16 MB default scoped budget
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(pos_t, locations, rotations, half_dims, valid2, temperature_arr,
      *mask_ops, *layers, du_t, dg_t, dw_t)

    dloc, drot, dhalf, *dlayers = outs
    if manual:
        drot = drot.reshape(rotations.shape)
        dlayers = [g.reshape(m.shape) for g, m in zip(dlayers, layers)]
    dlayers = tuple(g.astype(m.dtype) for g, m in zip(dlayers, layers))
    return (
        jnp.zeros_like(positions),               # positions: not differentiated
        dloc.astype(locations.dtype),
        drot.astype(rotations.dtype),
        dhalf.astype(half_dims.dtype),
        jnp.zeros_like(valid),
        dlayers,
        jnp.zeros_like(jnp.asarray(temperature)),
    )


def _fused_bwd_batched(statics, tile, positions, locations, rotations,
                       half_dims, valid, layers, temperature, du, dw, dg):
    n = statics.num_instances
    f = positions.shape[0]
    valid2 = valid.reshape(f, n, 1)
    masks = (
        _compute_masks(
            statics, positions, locations, half_dims, valid, temperature,
            tile,
        )
        if MANUAL_BACKWARD
        else None
    )
    mask_ops = () if masks is None else (masks,)
    pos_t, p_real = _pad_to(positions.transpose(0, 2, 1), tile, axis=2)
    p = pos_t.shape[2]
    du_t, _ = _pad_to(du[:, None, :], tile, axis=2)              # [F, 1, P]
    dg_t, _ = _pad_to(dg.transpose(0, 2, 1), tile, axis=2)       # [F, 3, P]
    dw_t, _ = _pad_to(dw.transpose(0, 2, 1), tile, axis=2)       # [F, N, P]
    grid = (f, p // tile)

    temperature_arr = jnp.asarray(temperature, jnp.float32).reshape(1)

    manual = MANUAL_BACKWARD
    rot_shape = (f, n, 9) if manual else rotations.shape
    layer_shapes = [
        (m.shape[0], m.shape[1] * m.shape[2], m.shape[3])
        if manual
        else m.shape
        for m in layers
    ]
    kernel = _bwd_kernel_manual if manual else _bwd_kernel

    out_shape = (
        jax.ShapeDtypeStruct(locations.shape, jnp.float32),
        jax.ShapeDtypeStruct(rot_shape, jnp.float32),
        jax.ShapeDtypeStruct(half_dims.shape, jnp.float32),
        *[jax.ShapeDtypeStruct(s, jnp.float32) for s in layer_shapes],
    )
    # param cotangents revisit their frame's block across tile steps;
    # zero-init fires at tile step 0 of each frame (program_id axis 1)
    out_specs = (
        _const_spec_b(locations.shape[1:]),
        _const_spec_b(rot_shape[1:]),
        _const_spec_b(half_dims.shape[1:]),
        *[_const_spec_b(s[1:]) for s in layer_shapes],
    )
    in_specs = [
        _tile_spec_b(3, tile),                   # positions (transposed)
        _const_spec_b(locations.shape[1:]),
        _const_spec_b(rotations.shape[1:]),
        _const_spec_b(half_dims.shape[1:]),
        _const_spec_b(valid2.shape[1:]),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        *[pl.BlockSpec(memory_space=pltpu.SMEM) for _ in mask_ops],
        *[_const_spec_b(m.shape[1:]) for m in layers],
        _tile_spec_b(1, tile),                   # du
        _tile_spec_b(3, tile),                   # dg
        _tile_spec_b(n, tile),                   # dw
    ]

    outs = pl.pallas_call(
        functools.partial(kernel, statics, len(layers), 1),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(pos_t, locations, rotations, half_dims, valid2, temperature_arr,
      *mask_ops, *layers, du_t, dg_t, dw_t)

    dloc, drot, dhalf, *dlayers = outs
    if manual:
        drot = drot.reshape(rotations.shape)
        dlayers = [g.reshape(m.shape) for g, m in zip(dlayers, layers)]
    dlayers = tuple(g.astype(m.dtype) for g, m in zip(dlayers, layers))
    return (
        jnp.zeros_like(positions),               # positions: not differentiated
        dloc.astype(locations.dtype),
        drot.astype(rotations.dtype),
        dhalf.astype(half_dims.dtype),
        jnp.zeros_like(valid),
        dlayers,
        jnp.zeros_like(jnp.asarray(temperature)),
    )


fused_field_with_grad.defvjp(_fused_fwd_rule, _fused_bwd_rule)
