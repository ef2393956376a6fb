"""Loss-library parity tests against torch functional goldens."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsrd_tpu import losses


@pytest.fixture(scope="module")
def probs():
    rng = np.random.default_rng(0)
    inputs = rng.uniform(0.05, 0.95, (4, 8, 8)).astype(np.float32)
    targets = rng.uniform(0.0, 1.0, (4, 8, 8)).astype(np.float32)
    return inputs, targets


class TestClassification:
    def test_binary_cross_entropy_matches_torch(self, probs):
        torch = pytest.importorskip("torch")
        inputs, targets = probs
        ref = torch.nn.functional.binary_cross_entropy(
            torch.from_numpy(inputs), torch.from_numpy(targets),
            reduction="none",
        ).numpy()
        ours = losses.binary_cross_entropy(
            jnp.asarray(inputs), jnp.asarray(targets), reduction="none"
        )
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)

    def test_kl_divergence_properties(self, probs):
        inputs, _ = probs
        same = losses.kl_divergence(
            jnp.asarray(inputs), jnp.asarray(inputs), reduction="mean"
        )
        assert float(same) == pytest.approx(0.0, abs=1e-6)

    def test_js_symmetry(self, probs):
        inputs, targets = probs
        ab = losses.js_divergence(jnp.asarray(inputs), jnp.asarray(targets))
        ba = losses.js_divergence(jnp.asarray(targets), jnp.asarray(inputs))
        assert float(ab) == pytest.approx(float(ba), rel=1e-4)

    def test_tversky_perfect_prediction(self):
        mask = jnp.zeros((1, 16, 16)).at[:, 4:10, 4:10].set(1.0)
        loss = losses.tversky_loss(mask, mask)
        assert float(loss) == pytest.approx(0.0, abs=1e-3)

    def test_focal_reduces_easy_examples(self, probs):
        targets = jnp.ones((4, 4))
        easy = jnp.full((4, 4), 0.95)
        hard = jnp.full((4, 4), 0.55)
        assert float(losses.focal_loss(easy, targets)) < float(
            losses.focal_loss(hard, targets)
        )


class TestPhotometric:
    def test_ssim_zero_for_identical(self):
        rng = np.random.default_rng(1)
        image = jnp.asarray(rng.random((1, 3, 16, 16)).astype(np.float32))
        loss = losses.ssim_loss(image, image)
        assert float(loss) == pytest.approx(0.0, abs=1e-5)

    def test_photometric_blend(self):
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.random((1, 3, 16, 16)).astype(np.float32))
        b = jnp.asarray(rng.random((1, 3, 16, 16)).astype(np.float32))
        assert float(losses.photometric_loss(a, b)) > float(
            losses.photometric_loss(a, a)
        )


class TestGeometric:
    def test_consistency_zero_for_inverse_poses(self):
        from vsrd_tpu.ops import geometry

        rot = geometry.expand_to_4x4(geometry.rotation_matrix_y(jnp.asarray(0.3)))
        rot = rot.at[:3, 3].set(jnp.asarray([1.0, 0.0, 2.0]))
        inv = jnp.linalg.inv(rot)
        r_loss = losses.rotation_consistency_loss(rot[None], inv[None])
        t_loss = losses.translation_consistency_loss(rot[None], inv[None])
        assert float(r_loss) == pytest.approx(0.0, abs=1e-5)
        assert float(t_loss) == pytest.approx(0.0, abs=1e-5)

    def test_sampson_zero_on_epipolar_points(self):
        from vsrd_tpu.ops import geometry

        rot = geometry.rotation_matrix_y(jnp.asarray(0.1))
        t = jnp.asarray([1.0, 0.0, 0.0])
        essential = geometry.essential_matrix(rot, t)
        k = jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
        fundamental = geometry.fundamental_matrix(essential, k, k)
        # project a 3D point into both views
        point = jnp.asarray([0.5, -0.2, 5.0])
        p1 = k @ point
        p2 = k @ (rot @ point + t)
        kp1 = (p1[:2] / p1[2])[None]
        kp2 = (p2[:2] / p2[2])[None]
        dist = losses.sampson_epipolar_distance(kp1, kp2, fundamental)
        assert float(dist) == pytest.approx(0.0, abs=1e-2)


class TestProbabilistic:
    def test_gaussian_nll_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(3)
        means = rng.normal(size=(16,)).astype(np.float32)
        variances = rng.uniform(0.5, 2.0, (16,)).astype(np.float32)
        targets = rng.normal(size=(16,)).astype(np.float32)
        ref = -torch.distributions.Normal(
            torch.from_numpy(means),
            torch.from_numpy(np.sqrt(variances + 1e-6)),
        ).log_prob(torch.from_numpy(targets)).numpy()
        ours = losses.gaussian_nll(
            jnp.asarray(means), jnp.asarray(variances), jnp.asarray(targets),
            reduction="none",
        )
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_student_nll_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(4)
        means = rng.normal(size=(16,)).astype(np.float32)
        shapes = rng.uniform(1.0, 3.0, (16,)).astype(np.float32)
        scales = rng.uniform(0.5, 2.0, (16,)).astype(np.float32)
        targets = rng.normal(size=(16,)).astype(np.float32)
        ref = -torch.distributions.StudentT(
            torch.from_numpy(2.0 * shapes),
            torch.from_numpy(means),
            torch.from_numpy(np.sqrt(scales / shapes + 1e-6)),
        ).log_prob(torch.from_numpy(targets)).numpy()
        ours = losses.student_nll(
            jnp.asarray(means), jnp.asarray(shapes), jnp.asarray(scales),
            jnp.asarray(targets), reduction="none",
        )
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)

    def test_energy_score_finite(self):
        key = jax.random.PRNGKey(0)
        score = losses.gaussian_energy_score(
            key, jnp.zeros(8), jnp.ones(8), jnp.ones(8) * 0.5, num_samples=64
        )
        assert np.isfinite(float(score))


class TestModelUtils:
    def test_ema_update(self):
        from vsrd_tpu.utils import model as mu

        ema = {"w": jnp.zeros(3)}
        params = {"w": jnp.ones(3)}
        out = mu.ema_update(ema, params, decay=0.9)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)

    def test_freeze_mask_and_optimizer(self):
        import optax
        from vsrd_tpu.utils import model as mu

        params = {"backbone": jnp.ones(3), "head": jnp.ones(3)}
        tx = mu.frozen_optimizer(
            optax.sgd(1.0), params,
            lambda path, leaf: path[0].key == "head",
        )
        state = tx.init(params)
        grads = {"backbone": jnp.ones(3), "head": jnp.ones(3)}
        updates, _ = tx.update(grads, state, params)
        np.testing.assert_allclose(np.asarray(updates["backbone"]), 0.0)
        assert float(jnp.abs(updates["head"]).sum()) > 0

    def test_spectral_normalize(self):
        from vsrd_tpu.utils import model as mu

        rng = np.random.default_rng(5)
        w = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32)) * 3
        normalized = mu.spectral_normalize(w, num_iterations=30)
        sigma = np.linalg.svd(np.asarray(normalized), compute_uv=False)[0]
        assert sigma == pytest.approx(1.0, rel=1e-2)


class TestNormFusion:
    def test_fuse_post_norm_matches_composition(self):
        # linear -> batchnorm(inference) == fused linear
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
        scale = jnp.asarray(rng.uniform(0.5, 2.0, 6).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
        mean = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
        var = jnp.asarray(rng.uniform(0.5, 2.0, 6).astype(np.float32))
        eps = 1e-5

        from vsrd_tpu.utils import model as mu

        fw, fb = mu.fuse_post_norm(w, b, scale, bias, mean, var, eps)
        x = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
        y = x @ w.T + b
        normed = (y - mean) * scale * jax.lax.rsqrt(var + eps) + bias
        fused = x @ fw.T + fb
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(normed), rtol=1e-5, atol=1e-5
        )

    def test_bn_gn_conversions(self):
        from vsrd_tpu.utils import model as mu

        bn = {
            "scale": jnp.arange(8.0) + 1.0,
            "bias": jnp.arange(8.0),
            "mean": jnp.zeros(8),
            "var": jnp.ones(8),
        }
        gn = mu.batch_norm_to_group_norm_params(bn, group_size=4)
        assert gn["num_groups"] == 2
        np.testing.assert_array_equal(np.asarray(gn["scale"]), np.asarray(bn["scale"]))
        back = mu.group_norm_to_batch_norm_params(gn)
        np.testing.assert_array_equal(np.asarray(back["mean"]), np.zeros(8))
        np.testing.assert_array_equal(np.asarray(back["var"]), np.ones(8))


class TestPhotometricReferenceParity:
    """Value parity vs the live reference implementation
    (/root/reference/vsrd/losses/photometric_losses.py:8-36), imported
    read-only via the parity harness's refload."""

    @pytest.fixture(scope="class")
    def ref_photo(self):
        import os
        import sys

        if not os.path.isdir("/root/reference"):
            pytest.skip("reference repo not mounted")
        sys.path.insert(
            0,
            os.path.join(
                os.path.dirname(__file__), "..", "tools", "parity"
            ),
        )
        import refload

        return refload.load_reference().photometric_losses

    @pytest.fixture(scope="class")
    def images(self):
        rng = np.random.default_rng(7)
        a = rng.uniform(0.0, 1.0, (2, 3, 24, 32)).astype(np.float32)
        b = np.clip(
            a + rng.normal(scale=0.15, size=a.shape).astype(np.float32),
            0.0,
            1.0,
        )
        return a, b

    @pytest.mark.parametrize("reduction", ["none", "mean", "sum"])
    def test_ssim_matches_reference(self, ref_photo, images, reduction):
        torch = pytest.importorskip("torch")
        a, b = images
        ref = ref_photo.ssim_loss(
            torch.from_numpy(a), torch.from_numpy(b), reduction=reduction
        ).numpy()
        ours = losses.ssim_loss(
            jnp.asarray(a), jnp.asarray(b), reduction=reduction
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref, rtol=1e-5, atol=1e-6
        )

    def test_photometric_matches_reference(self, ref_photo, images):
        torch = pytest.importorskip("torch")
        a, b = images
        ref = ref_photo.photometric_loss(
            torch.from_numpy(a), torch.from_numpy(b)
        ).numpy()
        ours = losses.photometric_loss(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(
            float(ours), float(ref), rtol=1e-5, atol=1e-6
        )
