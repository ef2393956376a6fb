"""Photometric branch through the REAL pipeline (reference
main.py:689-853): sphere-traced surfels, plane-induced homographies,
top-k cross-view patch correlation, reached from compute_loss /
optimize_frame with a nonzero weight and images on the frame."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsrd_tpu.pipeline import frame as fm, optimize as opt


@pytest.fixture(scope="module")
def photo_setup():
    cfg = opt.OptimizationConfig(
        num_steps=6,
        warmup_steps=2,
        num_rays=48,
        num_samples=8,
        photometric_weight=0.1,
        surface_num_rays=16,
        surface_num_iterations=24,
        checkpoint_interval=6,
    )
    frame = fm.synthetic_frame(
        jax.random.PRNGKey(0), num_views=3, image_size=(48, 64),
        num_instances=2, max_instances=2, with_images=True,
    )
    assert frame.gray_images is not None
    return cfg, frame


def test_photometric_loss_and_gradients(photo_setup):
    """compute_loss reaches the photometric branch AND its gradients flow
    into the boxes. One value_and_grad compile serves both claims (the
    forward is a strict subgraph of the grad graph; compiling them
    separately doubled this module's compile-bound runtime)."""
    cfg, frame = photo_setup

    def photometric_only(p):
        total, aux = opt.compute_loss(
            p, frame, jnp.asarray(3), jax.random.PRNGKey(2), cfg, True
        )
        return aux["losses"]["photometric_loss"], total

    (photometric, total), grads = jax.jit(
        jax.value_and_grad(photometric_only, has_aux=True)
    )(opt.init_params(jax.random.PRNGKey(1), 2, cfg))
    assert np.isfinite(float(total))
    assert np.isfinite(float(photometric))
    assert float(photometric) != 0.0  # the branch actually ran
    leaves = jax.tree.leaves(grads["boxes"])
    gsum = sum(float(jnp.sum(jnp.abs(leaf))) for leaf in leaves)
    assert np.isfinite(gsum)
    assert gsum > 0.0  # surfel positions backprop into the boxes


def test_batched_photometric_matches_per_frame(photo_setup):
    """`vmap` of the photometric body (the batched compute_loss path)
    must reproduce the per-frame photometric_loss exactly when the
    per-frame keys match — the semantic claim behind lifting the old
    batched-frames NotImplementedError. (compute_loss derives per-frame
    surface keys by splitting, so its batched values are not numerically
    comparable to separate per-frame compute_loss calls; the equivalence
    is asserted here at the body level with shared keys.)"""
    cfg, frame = photo_setup
    from vsrd_tpu.models import box_parameters, hyper_field
    from vsrd_tpu.pipeline import photometric as pm, sharded as sh
    from vsrd_tpu.rendering import scene

    frame2 = fm.synthetic_frame(
        jax.random.PRNGKey(7), num_views=3, image_size=(48, 64),
        num_instances=2, max_instances=2, with_images=True,
    )
    frames = [frame, frame2]
    params = [opt.init_params(jax.random.PRNGKey(i), 2, cfg) for i in (1, 5)]
    # fixed keys chosen so frame 0's surfels converge (sphere tracing at
    # random init with only 16 rays / 24 iterations is key-sensitive;
    # a non-converged frame returns exactly 0 and would vacuously pass)
    keys = jnp.stack([jax.random.PRNGKey(4), jax.random.PRNGKey(6)])

    def photo(p, fr, k):
        decoded = box_parameters.decode_boxes(p["boxes"])
        fw = hyper_field.hypernetwork_apply(
            p["hyper"], decoded["embeddings"]
        )
        packed = tuple(
            hyper_field.pack_block_diagonal(
                fw,
                in_channels=3 * cfg.num_frequencies * 2,
                out_channels_list=cfg.field_channels,
            )
        )
        sp = scene.SceneParams(
            locations=decoded["locations"],
            rotations=decoded["orientations"],
            half_dimensions=decoded["dimensions"],
            valid=fr.valid,
            packed_weights=packed,
        )
        hf = scene.hard_scene_field(
            sp, cfg.position_scale, cfg.num_frequencies, cfg.field_channels
        )
        loss, _ = pm.photometric_loss(
            fr, hf, k,
            num_rays=cfg.surface_num_rays,
            num_iterations=cfg.surface_num_iterations,
            convergence_criteria=cfg.surface_convergence_criteria,
            bounding_radius=cfg.surface_bounding_radius,
            patch_size=cfg.surface_patch_size,
        )
        return loss

    fb = sh.stack_frames(frames)
    pb = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
    batched = np.asarray(jax.jit(jax.vmap(photo))(pb, fb, keys))
    singles = np.asarray(
        [jax.jit(photo)(params[f], frames[f], keys[f]) for f in range(2)]
    )
    np.testing.assert_allclose(batched, singles, rtol=2e-5, atol=1e-7)
    # the comparison must exercise a converged, nonzero loss on at least
    # one frame (an all-zero pair would vacuously pass)
    assert np.abs(singles).max() > 0.0


def test_batched_photometric_gradients_flow(photo_setup):
    cfg, frame = photo_setup
    from vsrd_tpu.pipeline import sharded as sh

    fb = sh.stack_frames([frame, frame])
    params = [opt.init_params(jax.random.PRNGKey(i), 2, cfg) for i in (1, 5)]
    pb = jax.tree.map(lambda *xs: jnp.stack(xs), *params)

    def photometric_only(p):
        _, aux = opt.compute_loss(
            p, fb, jnp.asarray(3), jax.random.PRNGKey(2), cfg, True
        )
        return jnp.sum(aux["losses"]["photometric_loss"])

    grads = jax.jit(jax.grad(photometric_only))(pb)
    leaves = jax.tree.leaves(grads["boxes"])
    total = sum(float(jnp.sum(jnp.abs(leaf))) for leaf in leaves)
    assert np.isfinite(total)
    assert total > 0.0


@pytest.mark.slow
def test_optimize_frame_with_photometric(photo_setup):
    cfg, frame = photo_setup
    params, scalars = opt.optimize_frame(frame, jax.random.PRNGKey(3), cfg)
    assert np.isfinite(scalars["loss"]).all()
    # warmup steps exclude it; post-warmup steps include it
    assert (scalars["photometric_loss"][: cfg.warmup_steps] == 0.0).all()
    assert np.isfinite(scalars["photometric_loss"][cfg.warmup_steps :]).all()
