"""Frame-batched (co-optimized) pipeline: equivalence with the
single-frame path.

The reference shards frames across ranks (README.md:128); this framework
additionally co-optimizes F stacked frames on ONE chip — one jitted scan
and one Pallas kernel with a frame grid axis (`optimize.compute_loss`
batched mode / `pallas_field` grid ``(F, tiles)``). Frames are
independent, so batched results must match per-frame runs exactly in
deterministic mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsrd_tpu.pipeline import frame as fm
from vsrd_tpu.pipeline import optimize as opt
from vsrd_tpu.pipeline import sharded as sh

TINY = dict(num_views=2, image_size=(32, 48), num_instances=2, max_instances=3)


@pytest.fixture(scope="module")
def two_frames():
    return [fm.synthetic_frame(jax.random.PRNGKey(i), **TINY) for i in range(2)]


@pytest.fixture(scope="module")
def det_cfg():
    return opt.OptimizationConfig(
        num_steps=8, warmup_steps=4, num_rays=32, num_samples=8,
        checkpoint_interval=8, deterministic=True,
    )


def _fixed_rays(num_frames, num_rays):
    h, w = TINY["image_size"]
    p = TINY["num_views"] * h * w
    rng = np.random.default_rng(0)
    return jnp.asarray(
        np.stack(
            [rng.choice(p, size=num_rays, replace=False) for _ in range(num_frames)]
        ).astype(np.int32)
    )


# jit wrapper: the eager (op-by-op) CPU evaluation of the full loss
# graph dominated the suite's runtime; jitting compiles once per phase
# and lands in the persistent cache for later runs
_loss_jit = jax.jit(opt.compute_loss, static_argnums=(4, 5))


def test_batched_compute_loss_matches_single_warmup(two_frames, det_cfg):
    """Batched losses equal per-frame losses on a fixed ray schedule
    (box-only warmup phase; forward-only — the box graph is small)."""
    cfg = det_cfg
    ray_idx = _fixed_rays(2, cfg.num_rays)
    key = jax.random.PRNGKey(3)
    params = opt.init_params_batched(jax.random.PRNGKey(5), 2, 3, cfg)
    fb = sh.stack_frames(two_frames)
    step = jnp.asarray(1)

    total_b, aux_b = _loss_jit(
        params, fb, step, key, cfg, False, ray_indices=ray_idx
    )
    assert total_b.shape == (2,)
    for f in range(2):
        p_f = jax.tree.map(lambda x: x[f], params)
        total_s, aux_s = _loss_jit(
            p_f, two_frames[f], step, key, cfg, False,
            ray_indices=ray_idx[f],
        )
        np.testing.assert_allclose(
            np.asarray(total_b)[f], np.asarray(total_s), rtol=1e-5, atol=1e-6
        )
        for name, val in aux_s["losses"].items():
            np.testing.assert_allclose(
                np.asarray(aux_b["losses"][name])[f],
                np.asarray(val),
                rtol=1e-5,
                atol=1e-6,
                err_msg=name,
            )
        np.testing.assert_array_equal(
            np.asarray(aux_b["row_to_col"][f]), np.asarray(aux_s["row_to_col"])
        )


def test_batched_losses_and_grads_match_single_rdf(two_frames, det_cfg):
    """RDF phase: batched losses equal per-frame losses AND each frame's
    params receive exactly their own-frame gradient (the frame-grid
    Pallas/XLA backward must not mix frames). One value_and_grad compile
    per side covers both claims — the forward is a strict subgraph of
    the grad graph, and compiling forward and grads separately was the
    single biggest compile cost in this module."""
    cfg = det_cfg
    ray_idx = _fixed_rays(2, cfg.num_rays)
    key = jax.random.PRNGKey(3)
    params = opt.init_params_batched(jax.random.PRNGKey(5), 2, 3, cfg)
    fb = sh.stack_frames(two_frames)
    step = jnp.asarray(5)

    def batched_loss(p):
        total, aux = opt.compute_loss(
            p, fb, step, key, cfg, True, ray_indices=ray_idx
        )
        return jnp.sum(total), (total, aux)

    (_, (total_b, aux_b)), grads_b = jax.jit(
        jax.value_and_grad(batched_loss, has_aux=True)
    )(params)
    assert total_b.shape == (2,)

    @jax.jit
    def single_run(p, frame, rays):
        def single_loss(p):
            total, aux = opt.compute_loss(
                p, frame, step, key, cfg, True, ray_indices=rays
            )
            return total, (total, aux)

        return jax.value_and_grad(single_loss, has_aux=True)(p)

    for f in range(2):
        p_f = jax.tree.map(lambda x: x[f], params)
        (_, (total_s, aux_s)), grads_s = single_run(
            p_f, two_frames[f], ray_idx[f]
        )
        np.testing.assert_allclose(
            np.asarray(total_b)[f], np.asarray(total_s), rtol=1e-5, atol=1e-6
        )
        for name, val in aux_s["losses"].items():
            np.testing.assert_allclose(
                np.asarray(aux_b["losses"][name])[f],
                np.asarray(val),
                rtol=1e-5,
                atol=1e-6,
                err_msg=name,
            )
        np.testing.assert_array_equal(
            np.asarray(aux_b["row_to_col"][f]), np.asarray(aux_s["row_to_col"])
        )
        for a, b in zip(jax.tree.leaves(grads_b), jax.tree.leaves(grads_s)):
            np.testing.assert_allclose(
                np.asarray(a)[f], np.asarray(b), rtol=2e-4, atol=1e-6
            )


@pytest.mark.slow
def test_optimize_frames_batched_runs(two_frames, det_cfg):
    fb = sh.stack_frames(two_frames)
    params, scalars = opt.optimize_frames_batched(
        fb, jax.random.PRNGKey(7), det_cfg
    )
    assert scalars["loss"].shape == (det_cfg.num_steps, 2)
    assert np.isfinite(scalars["loss"]).all()
    for leaf in jax.tree.leaves(params):
        assert leaf.shape[0] == 2
        assert np.isfinite(np.asarray(leaf)).all()


def test_batched_metrics_fire_at_interval(two_frames):
    """The vmapped compute_metrics branch runs at the metric cadence."""
    cfg = opt.OptimizationConfig(
        num_steps=4, warmup_steps=2, num_rays=32, num_samples=8,
        checkpoint_interval=4, metric_interval=2, deterministic=True,
    )
    fb = sh.stack_frames(two_frames)
    _, scalars = opt.optimize_frames_batched(fb, jax.random.PRNGKey(7), cfg)
    matched = np.asarray(scalars["num_matched"])
    assert matched.shape == (4, 2)
    # metric steps (step+1) % 2 == 0 -> indices 1, 3
    assert (matched[1::2] == 2.0).all()
    # non-metric steps stay zero (gated)
    assert (matched[0::2] == 0.0).all()
    assert np.isfinite(np.asarray(scalars["iou_3d"])).all()


def test_multinomial_logits_batched_rows():
    """The bucketed two-phase top-k draws independently per row."""
    from vsrd_tpu.ops import sampling

    k = 16
    size = 1 << 17
    rng = np.random.default_rng(0)
    logits = np.sort(rng.normal(size=(2, size)).astype(np.float32))[:, ::-1]
    logits = jnp.asarray(logits.copy())
    idx = sampling.multinomial_logits(
        jax.random.PRNGKey(0), logits, k, sorted_logits=True
    )
    assert idx.shape == (2, k)
    for row in np.asarray(idx):
        assert len(set(row.tolist())) == k  # no replacement
    # rows draw different indices (independent noise)
    assert not np.array_equal(np.asarray(idx[0]), np.asarray(idx[1]))
    # flat path agrees in distributional support: indices in range
    assert int(idx.max()) < size
