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


def test_compute_loss_reaches_photometric(photo_setup):
    cfg, frame = photo_setup
    params = opt.init_params(jax.random.PRNGKey(1), 2, cfg)
    loss, aux = jax.jit(
        lambda p: opt.compute_loss(
            p, frame, jnp.asarray(3), jax.random.PRNGKey(2), cfg, True
        )
    )(params)
    photometric = float(aux["losses"]["photometric_loss"])
    assert np.isfinite(float(loss))
    assert np.isfinite(photometric)
    assert photometric != 0.0  # the branch actually ran


def test_photometric_gradients_flow(photo_setup):
    cfg, frame = photo_setup

    def photometric_only(p):
        _, aux = opt.compute_loss(
            p, frame, jnp.asarray(3), jax.random.PRNGKey(2), cfg, True
        )
        return aux["losses"]["photometric_loss"]

    grads = jax.jit(jax.grad(photometric_only))(
        opt.init_params(jax.random.PRNGKey(1), 2, cfg)
    )
    leaves = jax.tree.leaves(grads["boxes"])
    total = sum(float(jnp.sum(jnp.abs(leaf))) for leaf in leaves)
    assert np.isfinite(total)
    assert total > 0.0  # surfel positions backprop into the boxes


@pytest.mark.slow
def test_optimize_frame_with_photometric(photo_setup):
    cfg, frame = photo_setup
    params, scalars = opt.optimize_frame(frame, jax.random.PRNGKey(3), cfg)
    assert np.isfinite(scalars["loss"]).all()
    # warmup steps exclude it; post-warmup steps include it
    assert (scalars["photometric_loss"][: cfg.warmup_steps] == 0.0).all()
    assert np.isfinite(scalars["photometric_loss"][cfg.warmup_steps :]).all()
