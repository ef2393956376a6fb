"""Per-tile instance-group skipping (OptimizationConfig.pallas_group_skip).

Contract under test: kernel grid steps may skip an instance group's
compute entirely only when the group's lower-bound distance exceeds the
union distance's upper bound by the keep slack for EVERY point of the
tile — a relative-gap criterion, because softmin weights are
exp(-(d_g - u)/tau), so what must be large is the gap to the nearest
group, not the absolute distance (an absolute criterion corrupts
eikonal gradients up to 2x at far samples where two groups tie; the
tied-points case below pins that). Covers the mask helper, the cond'd
forward core, the two-pass manual backward, the Pallas kernels in
interpret mode, and the compute_loss wiring (azimuth instance
permutation + ray sorting).

The feature defaults OFF (see OptimizationConfig.pallas_group_skip for
the measured rejection); these tests keep the machinery correct for
clustered-scene opt-in use.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsrd_tpu.rendering import fused_field as ff
from vsrd_tpu.rendering import pallas_field as pf


def _scene(n=16, far_offset=60.0, seed=0):
    """n instances in groups of 8: group 0 near the origin, every later
    group displaced by `far_offset` meters along +z per group."""
    rng = np.random.default_rng(seed)
    loc = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
    for g in range(1, n // 8):
        loc[g * 8 : (g + 1) * 8, 2] += far_offset * g
    angles = rng.uniform(-1, 1, n)
    rot = np.stack(
        [
            np.array(
                [[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                 [-np.sin(a), 0, np.cos(a)]],
                np.float32,
            )
            for a in angles
        ]
    )
    half = rng.uniform(0.5, 2.0, size=(n, 3)).astype(np.float32)
    valid = (np.arange(n) < n - 1).astype(np.float32)  # last slot invalid
    w = rng.normal(size=(n, 1617)).astype(np.float32) * 0.3
    return (jnp.asarray(loc), jnp.asarray(rot), jnp.asarray(half),
            jnp.asarray(valid), jnp.asarray(w))


def _points(p=96, scale=4.0, seed=3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(p, 3)).astype(np.float32) * scale)


def test_group_tile_mask_behavior():
    loc, rot, half, valid, w = _scene(16)
    pos = _points(64)  # all near the origin -> group 1 (z ~ +60) far
    mask = ff.group_tile_mask(pos, loc, half, valid, 10.0, tile=32, g_size=8)
    assert mask.shape == (2, 2)
    np.testing.assert_array_equal(np.asarray(mask[0]), [1, 1])  # near kept
    np.testing.assert_array_equal(np.asarray(mask[1]), [0, 0])  # far skipped

    # nearest group force-kept even when beyond the threshold
    far_pos = pos + jnp.asarray([[0.0, 0.0, 500.0]])
    mask = ff.group_tile_mask(far_pos, loc, half, valid, 1.0, tile=32,
                              g_size=8)
    assert np.asarray(mask).sum(axis=0).min() >= 1
    np.testing.assert_array_equal(np.asarray(mask[1]), [1, 1])  # z+60 nearest

    # all-invalid group is skippable regardless of distance
    valid0 = valid.at[8:].set(0.0)
    mask = ff.group_tile_mask(
        pos.at[:, 2].add(60.0), loc, half, valid0, 10.0, tile=32, g_size=8
    )
    np.testing.assert_array_equal(np.asarray(mask[1]), [0, 0])

    # tail-tile padding slots must not force keeps: 33 points -> 2 tiles,
    # second tile has 1 real near point + 31 pad slots
    mask = ff.group_tile_mask(
        pos[:33], loc, half, valid, 10.0, tile=32, g_size=8
    )
    np.testing.assert_array_equal(np.asarray(mask[1]), [0, 0])

    # RELATIVE criterion: points ~200 m from BOTH groups but equidistant
    # (on the z=30 mid-plane between group 0 at z~0 and group 1 at z~60)
    # must keep both — each group's softmin weight is exp(-(d_g - u)/tau)
    # with d_g - u ~ 0 there, even though d_g >> threshold. The eikonal
    # term samples such points; skipping one group there doubles the
    # other's gradient (the round-4 bug this case pins).
    tied_pos = jnp.asarray(
        np.stack(
            [200.0 + np.arange(64) * 0.01, np.zeros(64),
             np.full(64, 30.0)], axis=-1
        ).astype(np.float32)
    )
    mask = ff.group_tile_mask(tied_pos, loc, half, valid, 10.0, tile=32,
                              g_size=8)
    np.testing.assert_array_equal(np.asarray(mask), [[1, 1], [1, 1]])


@pytest.mark.parametrize("dirs", [False, True])
def test_core_group_mask_matches_full(dirs):
    """Masked-off far group changes u/w/grads only at the softmin
    underflow level; an all-live mask is exactly the unmasked path."""
    loc, rot, half, valid, w = _scene(16)
    pos = _points(96)
    mats = ff.build_interleaved_layers(w)
    statics = ff.FieldStatics(num_instances=16, field_dtype=None)
    pos_t = pos.T
    dir_t = None
    if dirs:
        rng = np.random.default_rng(7)
        d = rng.normal(size=pos.shape).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        dir_t = jnp.asarray(d).T

    args = (pos_t, dir_t, loc, rot, half, valid[:, None], mats, 0.5, statics)
    u0, w0, g0 = ff._scene_eval_stacked_core(*args)
    u1, w1, g1 = ff._scene_eval_stacked_core(
        *args, group_mask=(jnp.int32(1), jnp.int32(1))
    )
    # not bit-exact: the cond branch is a separate XLA sub-computation
    # with its own fusion decisions (~1e-6 f32 reassociation)
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-5)

    u2, w2, g2 = ff._scene_eval_stacked_core(
        *args, group_mask=(jnp.int32(1), jnp.int32(0))
    )
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g2), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(w0[:8]), np.asarray(w2[:8]), atol=1e-5
    )
    assert float(jnp.max(jnp.abs(w2[8:]))) == 0.0  # skipped weights exact 0
    assert float(jnp.max(w0[8:])) < 1e-20          # ... matching the truth


def test_two_pass_bwd_matches_single_pass():
    loc, rot, half, valid, w = _scene(16)
    pos = _points(96)
    mats = ff.build_interleaved_layers(w)
    statics = ff.FieldStatics(num_instances=16, field_dtype=None)
    rng = np.random.default_rng(11)
    dg = rng.normal(size=pos.shape).astype(np.float32)
    dg /= np.linalg.norm(dg, axis=-1, keepdims=True)
    du = jnp.asarray(rng.normal(size=(1, 96)).astype(np.float32))
    dw = jnp.asarray(rng.normal(size=(16, 96)).astype(np.float32))

    args = (pos.T, jnp.asarray(dg).T, loc, rot, half, valid[:, None], mats,
            0.5, statics, du, dw)
    ref = ff.scene_eval_stacked_dir_bwd_t(*args)
    live = ff.scene_eval_stacked_dir_bwd_t(
        *args, group_mask=(jnp.int32(1), jnp.int32(1))
    )
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(live)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )

    skip = ff.scene_eval_stacked_dir_bwd_t(
        *args, group_mask=(jnp.int32(1), jnp.int32(0))
    )
    # near-group cotangents agree to fp noise; far group gets exact zeros
    for a, b in zip(jax.tree.leaves(ref)[:3], jax.tree.leaves(skip)[:3]):
        np.testing.assert_allclose(
            np.asarray(a)[:8], np.asarray(b)[:8], rtol=1e-4, atol=1e-5
        )
        assert float(np.abs(np.asarray(b)[8:]).max()) == 0.0
        assert float(np.abs(np.asarray(a)[8:]).max()) < 1e-12


def test_pallas_kernels_group_skip_interpret(monkeypatch):
    """fused_field_with_grad + dir forward with statics.group_skip: the
    real mask machinery (threshold from temperature) skips the far group
    and outputs/grads match the unskipped kernels."""
    monkeypatch.setattr(pf, "INTERPRET", True)
    loc, rot, half, valid, w = _scene(16)
    pos = _points(96)
    mats = ff.build_interleaved_layers(w)
    base = ff.FieldStatics(num_instances=16, field_dtype=None)
    skip = base._replace(group_skip=True)
    temperature = 0.25  # threshold = 2 + 12*0.25 = 5 m << 60 m offset

    rng = np.random.default_rng(13)
    cu = jnp.asarray(rng.normal(size=(96,)).astype(np.float32))
    cw = jnp.asarray(rng.normal(size=(96, 16)).astype(np.float32))
    cg = jnp.asarray(rng.normal(size=(96, 3)).astype(np.float32))

    def loss(statics, loc, half, mats):
        u, wts, g = pf.fused_field_with_grad(
            statics, 32, pos, loc, rot, half, valid, mats, temperature
        )
        return jnp.sum(u * cu) + jnp.sum(wts * cw) + jnp.sum(g * cg)

    v0, g0 = jax.value_and_grad(
        lambda *a: loss(base, *a), argnums=(0, 1, 2)
    )(loc, half, mats)
    v1, g1 = jax.value_and_grad(
        lambda *a: loss(skip, *a), argnums=(0, 1, 2)
    )(loc, half, mats)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    # same tolerance as test_fused_field's kernel-grad parity: per-tile
    # cond sub-computations refuse (~1e-4 relative on accumulated
    # parameter cotangents)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        )

    dirs = rng.normal(size=pos.shape).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)
    u0, w0, ud0 = pf.fused_field_dir_forward(
        base, 32, pos, dirs, loc, rot, half, valid, mats, temperature
    )
    u1, w1, ud1 = pf.fused_field_dir_forward(
        skip, 32, pos, dirs, loc, rot, half, valid, mats, temperature
    )
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ud0), np.asarray(ud1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1), atol=1e-6)

    # batched (frame-grid) kernels carry per-frame masks
    stack2 = lambda x: jnp.stack([x, x])  # noqa: E731
    ub, wb, gb = pf.fused_field_with_grad(
        skip, 32, stack2(pos), stack2(loc), stack2(rot), stack2(half),
        stack2(valid), tuple(stack2(m) for m in mats), temperature
    )
    np.testing.assert_allclose(
        np.asarray(gb[0]),
        np.asarray(
            pf.fused_field_with_grad(
                skip, 32, pos, loc, rot, half, valid, mats, temperature
            )[2]
        ),
        atol=1e-6,
    )


@pytest.mark.slow
def test_compute_loss_group_skip_consistency(monkeypatch):
    """compute_loss on a spread (kitti-layout) 16-instance frame with
    pallas_group_skip on vs off: same loss and parameter gradients up to
    the documented O(e^-12) approximation (plus the ray reorder, which
    is RNG-neutral in deterministic mode)."""
    from vsrd_tpu.pipeline import frame as fm, optimize as opt

    monkeypatch.setattr(pf, "INTERPRET", True)
    monkeypatch.setattr(pf, "pallas_supported", lambda: True)

    frame = fm.synthetic_frame(
        jax.random.PRNGKey(0), num_views=2, image_size=(24, 32),
        num_instances=16, max_instances=16, layout="kitti",
    )
    rays = jnp.arange(8, dtype=jnp.int32) * 7
    base = dict(
        num_steps=8, warmup_steps=2, num_rays=8, num_samples=4,
        deterministic=True, pallas_tile=32, pallas_bwd_tile=32,
        pallas_box_tile=32,
    )
    cfg_on = opt.OptimizationConfig(**base, pallas_group_skip=True)
    cfg_off = opt.OptimizationConfig(**base, pallas_group_skip=False)
    params = opt.init_params(jax.random.PRNGKey(1), 16, cfg_on)

    def loss_of(cfg):
        def f(p):
            total, _ = opt.compute_loss(
                p, frame, jnp.asarray(5), jax.random.PRNGKey(2), cfg,
                True, ray_indices=rays,
            )
            return total

        return jax.value_and_grad(f)(params)

    v_on, g_on = loss_of(cfg_on)
    v_off, g_off = loss_of(cfg_off)
    assert np.isfinite(float(v_on))
    # The ray azimuth sort changes fine-sample placement pairing even in
    # deterministic mode only via tile composition of the skip masks;
    # the loss itself must agree tightly.
    np.testing.assert_allclose(float(v_on), float(v_off), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_on), jax.tree.leaves(g_off)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3,
            atol=2e-4 * max(1.0, float(np.abs(np.asarray(b)).max())),
        )
