"""End-to-end tests of the jitted per-frame optimization (CPU, tiny)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsrd_tpu.pipeline import frame as fm
from vsrd_tpu.pipeline import optimize as opt
from vsrd_tpu.pipeline import sharded as sh

TINY = dict(num_views=2, image_size=(32, 48), num_instances=2, max_instances=3)


@pytest.fixture(scope="module")
def tiny_frame():
    return fm.synthetic_frame(jax.random.PRNGKey(0), **TINY)


@pytest.mark.slow
def test_optimize_frame_runs_and_improves(tiny_frame):
    cfg = opt.OptimizationConfig(
        num_steps=40, warmup_steps=20, num_rays=64, num_samples=8,
        checkpoint_interval=20,
    )
    params, scalars = opt.optimize_frame(tiny_frame, jax.random.PRNGKey(1), cfg)
    assert np.isfinite(scalars["loss"]).all()
    assert scalars["loss"].shape == (40,)
    # projection losses should drop during warmup
    assert scalars["l1_projection_loss"][-1] < scalars["l1_projection_loss"][0]
    # params stay finite
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_checkpoint_callback_cadence(tiny_frame):
    cfg = opt.OptimizationConfig(
        num_steps=30, warmup_steps=10, num_rays=32, num_samples=8,
        checkpoint_interval=10,
    )
    seen = []
    opt.optimize_frame(
        tiny_frame, jax.random.PRNGKey(1), cfg,
        callback=lambda step, params, scalars: seen.append(step),
    )
    assert seen == [10, 20, 30]


@pytest.mark.slow
def test_optimization_is_deterministic(tiny_frame):
    cfg = opt.OptimizationConfig(
        num_steps=10, warmup_steps=5, num_rays=32, num_samples=8,
        checkpoint_interval=10,
    )
    p1, s1 = opt.optimize_frame(tiny_frame, jax.random.PRNGKey(7), cfg)
    p2, s2 = opt.optimize_frame(tiny_frame, jax.random.PRNGKey(7), cfg)
    np.testing.assert_array_equal(s1["loss"], s2["loss"])
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ray_directions_at_matches_full_grid(tiny_frame):
    from vsrd_tpu.rendering import rays as rays_mod

    h, w = tiny_frame.image_size
    cam, dirs = rays_mod.ray_casting(
        (h, w), tiny_frame.intrinsics, tiny_frame.extrinsics
    )
    flat_dirs = np.asarray(dirs).reshape(-1, 3)
    idx = jnp.asarray([0, 5, w * h - 1, w * h + 3])
    origins, directions = fm.ray_directions_at(tiny_frame, idx)
    np.testing.assert_allclose(
        np.asarray(directions), flat_dirs[np.asarray(idx)], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(origins[0]), np.asarray(cam[0]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(origins[3]), np.asarray(cam[1]), atol=1e-6
    )


@pytest.mark.slow
def test_sharded_step_matches_shapes():
    n_dev = len(jax.devices())
    if n_dev < 4:
        pytest.skip("needs >=4 virtual devices")
    cfg = opt.OptimizationConfig(
        num_steps=6, warmup_steps=2, num_rays=32, num_samples=8
    )
    mesh = sh.make_mesh(jax.devices()[:4], dp=2, sp=2)
    frames = [
        fm.synthetic_frame(jax.random.PRNGKey(i), **TINY) for i in range(2)
    ]
    fb = sh.stack_frames(frames)
    params_b, opt_b = sh.init_sharded_state(
        jax.random.PRNGKey(0), 2, TINY["max_instances"], cfg, mesh
    )
    step_fn = sh.make_sharded_train_step(mesh, cfg)
    p, o, s = step_fn(params_b, opt_b, fb, jnp.asarray(0), jax.random.PRNGKey(1))
    p, o, s = step_fn(p, o, fb, jnp.asarray(3), jax.random.PRNGKey(1))
    assert s["loss"].shape == (2,)
    assert np.isfinite(np.asarray(s["loss"])).all()


def test_synthetic_frame_contract(tiny_frame):
    h, w = tiny_frame.image_size
    v = tiny_frame.num_views
    n = tiny_frame.max_instances
    assert tiny_frame.soft_masks_flat.shape == (v * h * w, n)
    assert tiny_frame.valid.sum() == 2
    # target view is rectified to the world origin
    tgt = int(tiny_frame.target_index)
    np.testing.assert_allclose(
        np.asarray(tiny_frame.extrinsics[tgt]), np.eye(4), atol=1e-6
    )
    # visible instances have nonzero gt boxes
    vis = np.asarray(tiny_frame.visible)
    boxes = np.asarray(tiny_frame.gt_boxes_2d)
    assert (np.abs(boxes[vis]).sum(axis=(-2, -1)) > 0).all()
