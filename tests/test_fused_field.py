"""Parity tests of the fused field evaluators and Pallas kernels.

Chain of trust: scene.py's batched path is golden-tested against torch
(test_fields.py); here every kernel-side evaluator is checked against it,
and the Pallas kernels run in interpreter mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsrd_tpu.models import hyper_field
from vsrd_tpu.rendering import fused_field as ff
from vsrd_tpu.rendering import pallas_field as pf
from vsrd_tpu.rendering import scene as scene_mod

# jitted wrappers (shared compile across tests + persistent cache; the
# statically-unrolled evaluators are expensive to dispatch op-by-op)
_scene_eval = jax.jit(ff.scene_eval, static_argnums=(7,))
_manual_grad = jax.jit(ff.scene_eval_manual_grad, static_argnums=(7,))
_stacked = jax.jit(ff.scene_eval_stacked, static_argnums=(7,))
_dir_bwd = jax.jit(ff.scene_eval_stacked_dir_bwd, static_argnums=(8,))


@pytest.fixture(scope="module")
def setup():
    n = 4
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(96, 3)).astype(np.float32) * 5)
    loc = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 3)
    angles = rng.uniform(-1, 1, n)
    rot = jnp.asarray(
        np.stack(
            [
                np.array(
                    [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
                    np.float32,
                )
                for a in angles
            ]
        )
    )
    half = jnp.asarray(rng.uniform(0.5, 2.0, size=(n, 3)).astype(np.float32))
    valid = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    w = jnp.asarray(rng.normal(size=(n, 1617)).astype(np.float32) * 0.3)
    return n, pos, loc, rot, half, valid, w


def _ground_truth(setup):
    n, pos, loc, rot, half, valid, w = setup
    packed = tuple(hyper_field.pack_block_diagonal(w))
    sp = scene_mod.SceneParams(
        loc, rot, half, valid.astype(bool), packed_weights=packed
    )
    return jax.jit(scene_mod.soft_scene_field(sp, 0.5))(pos)


def test_scene_eval_matches_ground_truth(setup):
    n, pos, loc, rot, half, valid, w = setup
    u_gt, w_gt = _ground_truth(setup)
    layers = ff.split_field_layers(w)
    statics = ff.FieldStatics(num_instances=n, field_dtype=None)
    u, wts = _scene_eval(pos, loc, rot, half, valid, layers, 0.5, statics)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_gt), atol=1e-4)
    np.testing.assert_allclose(np.asarray(wts), np.asarray(w_gt), atol=1e-5)


def test_manual_grad_matches_linearize(setup):
    n, pos, loc, rot, half, valid, w = setup
    layers = ff.split_field_layers(w)
    statics = ff.FieldStatics(num_instances=n, field_dtype=None)
    # eager on purpose: jitting the linearize-based evaluator costs
    # more to compile than these 96-point evals cost to dispatch
    u0, w0, g0 = ff.scene_eval_with_grad(
        pos, loc, rot, half, valid, layers, 0.5, statics
    )
    u1, w1, g1 = ff.scene_eval_manual_grad(
        pos, loc, rot, half, valid, layers, 0.5, statics
    )
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-4)


def test_stacked_matches_ground_truth(setup):
    n, pos, loc, rot, half, valid, w = setup
    u_gt, w_gt = _ground_truth(setup)
    mats = ff.build_interleaved_layers(w)
    statics = ff.FieldStatics(num_instances=n, field_dtype=None)
    u, wts, g = _stacked(
        pos, loc, rot, half, valid, mats, 0.5, statics
    )
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_gt), atol=1e-4)
    np.testing.assert_allclose(np.asarray(wts), np.asarray(w_gt), atol=1e-5)
    # gradients vs linearize reference (eager: see
    # test_manual_grad_matches_linearize for why this path isn't jitted)
    layers = ff.split_field_layers(w)
    _, _, g_ref = ff.scene_eval_with_grad(
        pos, loc, rot, half, valid, layers, 0.5, statics
    )
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_stacked_box_only(setup):
    n, pos, loc, rot, half, valid, w = setup
    statics = ff.FieldStatics(num_instances=n, use_rdf=False, field_dtype=None)
    u0, w0, g0 = _manual_grad(
        pos, loc, rot, half, valid, (), 0.5, statics
    )
    u1, w1, g1 = _stacked(pos, loc, rot, half, valid, (), 0.5, statics)
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-5)


def test_pallas_kernel_interpret_forward(setup):
    n, pos, loc, rot, half, valid, w = setup
    mats = ff.build_interleaved_layers(w)
    statics = ff.FieldStatics(num_instances=n, field_dtype=None)
    u_ref, w_ref, g_ref = ff.scene_eval_stacked(
        pos, loc, rot, half, valid, mats, 0.5, statics
    )
    old = pf.INTERPRET
    pf.INTERPRET = True
    try:
        u, wts, g = pf.fused_field_with_grad(
            statics, 32, pos, loc, rot, half, valid, mats, 0.5
        )
    finally:
        pf.INTERPRET = old
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wts), np.asarray(w_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_pallas_dir_forward_matches_full_gradient(setup):
    """The K=1 directional coarse kernel returns the same sdf/weights as
    the K=3 kernel, and its u_dot equals <grad, dir> (linearity of the
    JVP) — the contract behind OptimizationConfig.pallas_dir_coarse."""
    n, pos, loc, rot, half, valid, w = setup
    mats = ff.build_interleaved_layers(w)
    statics = ff.FieldStatics(num_instances=n, field_dtype=None)
    rng = np.random.default_rng(9)
    dirs = rng.normal(size=pos.shape).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)

    u_ref, w_ref, g_ref = ff.scene_eval_stacked(
        pos, loc, rot, half, valid, mats, 0.5, statics
    )
    old = pf.INTERPRET
    pf.INTERPRET = True
    try:
        u, wts, ud = pf.fused_field_dir_forward(
            statics, 32, pos, dirs, loc, rot, half, valid, mats, 0.5
        )
        # batched (frame-grid) variant: two stacked copies
        ub, wb, udb = pf.fused_field_dir_forward(
            statics, 32,
            jnp.stack([pos, pos]), jnp.stack([dirs, dirs]),
            jnp.stack([loc, loc]), jnp.stack([rot, rot]),
            jnp.stack([half, half]), jnp.stack([valid, valid]),
            tuple(jnp.stack([m, m]) for m in mats), 0.5,
        )
    finally:
        pf.INTERPRET = old
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wts), np.asarray(w_ref), atol=1e-5)
    ud_ref = np.sum(np.asarray(g_ref) * np.asarray(dirs), axis=-1)
    np.testing.assert_allclose(np.asarray(ud), ud_ref, atol=1e-4)
    for a, b in ((ub, u), (wb, wts), (udb, ud)):
        for f in range(2):
            np.testing.assert_allclose(
                np.asarray(a)[f], np.asarray(b), atol=1e-5
            )


def _vjp_reference_cotangents(setup, statics, mats, du, dw, dg, temp=0.5):
    """(dloc, drot, dhalf, dmats) via jax.vjp of the directional forward
    with cotangents (du, dw, ones) — the contract the hand-written
    reverse must reproduce."""
    n, pos, loc, rot, half, valid, w = setup

    def f(loc, rot, half, mats):
        return ff.scene_eval_stacked_dir_t(
            pos.T, dg.T, loc, rot, half, valid[:, None], mats, temp, statics
        )

    @jax.jit
    def run(loc, rot, half, mats, du, dw):
        (u, wts, udot), vjp_fn = jax.vjp(f, loc, rot, half, mats)
        return vjp_fn((du[None, :], dw.T, jnp.ones_like(udot)))

    return run(loc, rot, half, mats, du, dw)


@pytest.mark.parametrize("use_rdf", [True, False])
def test_manual_dir_bwd_matches_vjp(setup, use_rdf):
    """The hand-written reverse sweep (scene_eval_stacked_dir_bwd) must
    match jax.vjp of the K=1 directional forward to f32 tolerance, in
    both RDF and box-only (warmup) modes."""
    n, pos, loc, rot, half, valid, w = setup
    rng = np.random.default_rng(3)
    t = pos.shape[0]
    du = jnp.asarray(rng.normal(size=(t,)).astype(np.float32))
    dw = jnp.asarray(rng.normal(size=(t, n)).astype(np.float32))
    dg = jnp.asarray(rng.normal(size=(t, 3)).astype(np.float32))
    statics = ff.FieldStatics(
        num_instances=n, use_rdf=use_rdf, field_dtype=None
    )
    mats = ff.build_interleaved_layers(w) if use_rdf else ()

    ref = _vjp_reference_cotangents(setup, statics, mats, du, dw, dg)
    got = _dir_bwd(
        pos, dg, loc, rot, half, valid, mats, 0.5, statics, du, dw
    )
    for name, a, b in zip(("dloc", "drot", "dhalf"), got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
            err_msg=name,
        )
    for i, (a, b) in enumerate(zip(got[3], ref[3])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
            err_msg=f"dmat{i}",
        )


@pytest.mark.slow
def test_manual_dir_bwd_multi_group():
    """Hand-written reverse across multiple instance groups (N=16)."""
    n = 16
    rng = np.random.default_rng(5)
    t = 48
    pos = jnp.asarray(rng.normal(size=(t, 3)).astype(np.float32) * 5)
    loc = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 3)
    angles = rng.uniform(-1, 1, n)
    rot = jnp.asarray(
        np.stack(
            [
                np.array(
                    [[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                     [-np.sin(a), 0, np.cos(a)]],
                    np.float32,
                )
                for a in angles
            ]
        )
    )
    half = jnp.asarray(rng.uniform(0.5, 2.0, size=(n, 3)).astype(np.float32))
    valid = jnp.asarray((np.arange(n) < n - 2).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(n, 1617)).astype(np.float32) * 0.3)
    mats = ff.build_interleaved_layers(w)
    statics = ff.FieldStatics(num_instances=n, field_dtype=None)
    du = jnp.asarray(rng.normal(size=(t,)).astype(np.float32))
    dw = jnp.asarray(rng.normal(size=(t, n)).astype(np.float32))
    dg = jnp.asarray(rng.normal(size=(t, 3)).astype(np.float32))

    ref = _vjp_reference_cotangents(
        (n, pos, loc, rot, half, valid, w), statics, mats, du, dw, dg
    )
    got = _dir_bwd(
        pos, dg, loc, rot, half, valid, mats, 0.5, statics, du, dw
    )
    for name, a, b in zip(("dloc", "drot", "dhalf"), got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4, err_msg=name
        )
    for i, (a, b) in enumerate(zip(got[3], ref[3])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
            err_msg=f"dmat{i}",
        )


@pytest.mark.slow
@pytest.mark.parametrize("manual", [True, False])
def test_pallas_kernel_interpret_backward(setup, manual):
    n, pos, loc, rot, half, valid, w = setup
    statics = ff.FieldStatics(num_instances=n, field_dtype=None)

    # Parameter cotangents are compared as the pullback to the packed
    # hypernet weights through `build_interleaved_layers`, not as raw
    # d_mats: the interleaved group matrices have structurally-zero
    # off-block entries whose cotangents are gauge — the kernel's
    # local-basis tangent seeding and the world-basis XLA reference put
    # different (equally correct) values there, while the pullback —
    # the only thing training ever consumes — is basis-independent.
    # Same contract as bench.py --verify.
    def loss_kernel(loc, half, w_):
        mats_w = ff.build_interleaved_layers(w_)
        u, wts, g = pf.fused_field_with_grad(
            statics, 32, pos, loc, rot, half, valid, mats_w, 0.5
        )
        return jnp.sum(u) + jnp.sum(wts[:, :2]) + jnp.sum(jnp.square(g))

    def loss_ref(loc, half, w_):
        mats_w = ff.build_interleaved_layers(w_)
        u, wts, g = ff.scene_eval_stacked(
            pos, loc, rot, half, valid, mats_w, 0.5, statics
        )
        return jnp.sum(u) + jnp.sum(wts[:, :2]) + jnp.sum(jnp.square(g))

    old = pf.INTERPRET
    old_manual = pf.MANUAL_BACKWARD
    pf.INTERPRET = True
    pf.MANUAL_BACKWARD = manual
    try:
        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(loc, half, w)
    finally:
        pf.INTERPRET = old
        pf.MANUAL_BACKWARD = old_manual
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(loc, half, w)

    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk[2]), np.asarray(gr[2]), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("n", [16, 24])
def test_stacked_multi_group_matches_ground_truth(n):
    """Instances beyond 8 run as groups of 8 (O(N) interleave cost);
    the grouped evaluator must match the per-instance reference path."""
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32) * 5)
    loc = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 3)
    angles = rng.uniform(-1, 1, n)
    rot = jnp.asarray(
        np.stack(
            [
                np.array(
                    [[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                     [-np.sin(a), 0, np.cos(a)]],
                    np.float32,
                )
                for a in angles
            ]
        )
    )
    half = jnp.asarray(rng.uniform(0.5, 2.0, size=(n, 3)).astype(np.float32))
    valid = jnp.asarray((np.arange(n) < n - 2).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(n, 1617)).astype(np.float32) * 0.3)
    statics = ff.FieldStatics(num_instances=n, field_dtype=None)

    packed = tuple(hyper_field.pack_block_diagonal(w))
    sp = scene_mod.SceneParams(
        loc, rot, half, valid.astype(bool), packed_weights=packed
    )
    u_gt, w_gt = scene_mod.soft_scene_field(sp, 0.5)(pos)

    mats = ff.build_interleaved_layers(w)
    assert mats[0].shape[0] == n // 8       # group-stacked layout
    # eager on purpose: the unrolled N=16/24 graph compiles slower
    # than it dispatches eagerly at this tiny point count
    u, wts, _ = ff.scene_eval_stacked(pos, loc, rot, half, valid, mats, 0.5, statics)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_gt), atol=2e-5)
    np.testing.assert_allclose(np.asarray(wts), np.asarray(w_gt), atol=2e-5)


@pytest.mark.parametrize("n", [4, 16])
def test_stacked_rev_grad_matches_tangent(n):
    """The reverse-sweep spatial gradient (statics.rev_grad) must equal
    the 3-tangent forward path: identical primal math, only the AD
    direction of the gradient changes (rounding-level differences)."""
    rng = np.random.default_rng(2)
    pos = jnp.asarray(rng.normal(size=(96, 3)).astype(np.float32) * 5)
    loc = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 3)
    angles = rng.uniform(-1, 1, n)
    rot = jnp.asarray(
        np.stack(
            [
                np.array(
                    [[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                     [-np.sin(a), 0, np.cos(a)]],
                    np.float32,
                )
                for a in angles
            ]
        )
    )
    half = jnp.asarray(rng.uniform(0.5, 2.0, size=(n, 3)).astype(np.float32))
    valid = jnp.asarray((np.arange(n) < n - 1).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(n, 1617)).astype(np.float32) * 0.3)
    mats = ff.build_interleaved_layers(w)
    base = ff.FieldStatics(num_instances=n, field_dtype=None)
    rev = base._replace(rev_grad=True)

    u0, w0, g0 = ff.scene_eval_stacked(pos, loc, rot, half, valid, mats, 0.5, base)
    u1, w1, g1 = ff.scene_eval_stacked(pos, loc, rot, half, valid, mats, 0.5, rev)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-4)

    # box-only phase (warmup: empty mats, use_rdf=False)
    ub0, wb0, gb0 = ff.scene_eval_stacked(
        pos, loc, rot, half, valid, (), 0.5, base._replace(use_rdf=False)
    )
    ub1, wb1, gb1 = ff.scene_eval_stacked(
        pos, loc, rot, half, valid, (), 0.5, rev._replace(use_rdf=False)
    )
    np.testing.assert_allclose(np.asarray(ub1), np.asarray(ub0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb0), atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("box_coarse", [False, True])
def test_pallas_loss_path_interpret_smoke(box_coarse, monkeypatch):
    """End-to-end plumbing of the kernel path (fwd + custom-VJP bwd +
    K=1 dir-coarse, optionally box-only coarse) through compute_loss,
    in Pallas interpret mode on CPU — the only place this wiring is
    exercisable without a TPU. Asserts the graph builds, runs, and
    produces finite losses/grads in the same ballpark as the XLA path
    (not exact: the coarse approximations move fine-sample placement)."""
    import jax
    import jax.numpy as jnp
    from vsrd_tpu.pipeline import frame as fm, optimize as opt

    monkeypatch.setattr(pf, "INTERPRET", True)
    monkeypatch.setattr(pf, "pallas_supported", lambda: True)

    frame = fm.synthetic_frame(
        jax.random.PRNGKey(0), num_views=2, image_size=(24, 32),
        num_instances=2, max_instances=3,
    )
    cfg_kernel = opt.OptimizationConfig(
        num_steps=8, warmup_steps=2, num_rays=8, num_samples=4,
        deterministic=True, pallas_box_coarse=box_coarse,
        pallas_tile=32, pallas_bwd_tile=32, pallas_box_tile=32,
    )
    rays = jnp.arange(8, dtype=jnp.int32) * 7
    params = opt.init_params(jax.random.PRNGKey(1), 3, cfg_kernel)

    def loss_of(cfg, use_pallas):
        def f(p):
            total, _ = opt.compute_loss(
                p, frame, jnp.asarray(5), jax.random.PRNGKey(2), cfg,
                True, ray_indices=rays,
            )
            return total

        if not use_pallas:
            monkeypatch.setattr(pf, "pallas_supported", lambda: False)
        value, grads = jax.value_and_grad(f)(params)
        monkeypatch.setattr(pf, "pallas_supported", lambda: True)
        return value, grads

    v_kernel, g_kernel = loss_of(cfg_kernel, use_pallas=True)
    v_xla, _ = loss_of(cfg_kernel, use_pallas=False)
    assert np.isfinite(float(v_kernel))
    assert np.isfinite(float(v_xla))
    # same ballpark (coarse approximations only move sample placement)
    assert abs(float(v_kernel) - float(v_xla)) < 0.5 * abs(float(v_xla)) + 0.5
    gsum = sum(
        float(jnp.sum(jnp.abs(leaf))) for leaf in jax.tree.leaves(g_kernel)
    )
    assert np.isfinite(gsum) and gsum > 0.0
