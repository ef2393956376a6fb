import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsrd_tpu import modules
from vsrd_tpu.ops import warping
from vsrd_tpu.ops.grid_sample import grid_sample


class TestGridSample:
    def test_matches_torch_bilinear(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        image = rng.random((1, 3, 9, 13)).astype(np.float32)
        grid = (rng.random((1, 5, 7, 2)).astype(np.float32) * 2 - 1) * 1.2
        ref = torch.nn.functional.grid_sample(
            torch.from_numpy(image), torch.from_numpy(grid),
            mode="bilinear", padding_mode="zeros", align_corners=False,
        ).numpy()
        ours = np.asarray(grid_sample(jnp.asarray(image[0]), jnp.asarray(grid[0])))
        np.testing.assert_allclose(ours, ref[0], atol=1e-5)

    def test_align_corners_true(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        image = rng.random((1, 2, 8, 8)).astype(np.float32)
        grid = (rng.random((1, 4, 4, 2)).astype(np.float32) * 2 - 1)
        ref = torch.nn.functional.grid_sample(
            torch.from_numpy(image), torch.from_numpy(grid),
            mode="bilinear", padding_mode="zeros", align_corners=True,
        ).numpy()
        ours = np.asarray(
            grid_sample(jnp.asarray(image[0]), jnp.asarray(grid[0]),
                        align_corners=True)
        )
        np.testing.assert_allclose(ours, ref[0], atol=1e-5)


class TestBlocks:
    def test_grad_scale(self):
        g = jax.grad(lambda x: jnp.sum(modules.grad_scale(x, 0.25) ** 1))(
            jnp.ones(4)
        )
        np.testing.assert_allclose(np.asarray(g), 0.25)

    def test_pixel_shuffle_roundtrip(self):
        x = jnp.arange(2 * 4 * 6 * 8, dtype=jnp.float32).reshape(2, 4, 6, 8)
        down = modules.pixel_unshuffle(x, 2)
        assert down.shape == (2, 2, 3, 32)
        up = modules.pixel_shuffle(down, 2)
        np.testing.assert_array_equal(np.asarray(up), np.asarray(x))

    def test_squeeze_excitation(self):
        model = modules.SqueezeExcitation(squeeze_channels=4)
        x = jnp.ones((1, 8, 8, 16))
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == x.shape

    def test_packing_unpacking_shapes(self):
        x = jnp.ones((1, 16, 16, 8))
        pack = modules.PackingBlock(out_channels=32)
        params = pack.init(jax.random.PRNGKey(0), x)
        packed = pack.apply(params, x)
        assert packed.shape == (1, 8, 8, 32)
        unpack = modules.UnpackingBlock(out_channels=8)
        params = unpack.init(jax.random.PRNGKey(1), packed)
        unpacked = unpack.apply(params, packed)
        assert unpacked.shape == (1, 16, 16, 8)

    def test_drop_path_deterministic_identity(self):
        model = modules.DropPath(drop_prob=0.5)
        x = jnp.ones((4, 3))
        y = model.apply({}, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_layer_scale(self):
        model = modules.LayerScale(num_channels=6, epsilon=0.1)
        x = jnp.ones((2, 6))
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        np.testing.assert_allclose(np.asarray(y), 0.1, rtol=1e-6)


class TestAttention:
    def test_local_attention_shapes(self):
        model = modules.MultiHeadLocalAttention2d(
            out_channels=16, kernel_size=3, num_heads=4
        )
        x = jnp.ones((2, 8, 10, 12))
        params = model.init(jax.random.PRNGKey(0), x, x, x)
        y = model.apply(params, x, x, x)
        assert y.shape == (2, 8, 10, 16)

    def test_global_attention_shapes(self):
        model = modules.MultiHeadGlobalAttention2d(out_channels=16, num_heads=2)
        x = jnp.ones((2, 6, 7, 12))
        params = model.init(jax.random.PRNGKey(0), x, x, x)
        y = model.apply(params, x, x, x)
        assert y.shape == (2, 6, 7, 16)

    def test_deformable_attention_shapes(self):
        model = modules.MultiHeadDeformableAttention(
            out_channels=16, num_samples=4, num_heads=2
        )
        q = jnp.ones((2, 5, 12))
        kv = jnp.ones((2, 8, 10, 12))
        params = model.init(jax.random.PRNGKey(0), q, kv, kv)
        y = model.apply(params, q, kv, kv)
        assert y.shape == (2, 5, 16)


class TestSinkhorn:
    def test_marginals(self):
        rng = np.random.default_rng(0)
        cost = jnp.asarray(rng.random((6, 4)).astype(np.float32))
        d = jnp.asarray([2.0, 1.0, 1.0, 1.0, 0.5, 0.5])
        s = jnp.asarray([1.5, 1.5, 1.5, 1.5])
        plan = modules.sinkhorn_knopp(cost, d, s, gamma=0.5, num_steps=200)
        np.testing.assert_allclose(np.asarray(plan.sum(axis=0)), np.asarray(s),
                                   rtol=1e-2)
        np.testing.assert_allclose(np.asarray(plan.sum(axis=1)), np.asarray(d),
                                   rtol=1e-2)


class TestWarping:
    def test_backward_warping_identity(self):
        # same camera, constant depth -> identity warp
        rng = np.random.default_rng(0)
        features = jnp.asarray(rng.random((1, 2, 16, 20)).astype(np.float32))
        depth = jnp.full((1, 1, 16, 20), 5.0)
        k = jnp.asarray(
            [[[20.0, 0, 10.0], [0, 20.0, 8.0], [0, 0, 1]]], jnp.float32
        )
        e = jnp.eye(4)[None]
        warped = warping.backward_warping(features, depth, k, k, e, e)
        np.testing.assert_allclose(
            np.asarray(warped), np.asarray(features), atol=1e-4
        )

    def test_forward_warping_identity(self):
        rng = np.random.default_rng(1)
        features = jnp.asarray(rng.random((1, 2, 12, 14)).astype(np.float32))
        depth = jnp.full((1, 1, 12, 14), 3.0)
        k = jnp.asarray(
            [[[15.0, 0, 7.0], [0, 15.0, 6.0], [0, 0, 1]]], jnp.float32
        )
        warped = warping.forward_warping(features, depth, k, k)
        np.testing.assert_allclose(
            np.asarray(warped), np.asarray(features), atol=1e-4
        )

    def test_plane_sweep_minimizes_at_true_depth(self):
        # a textured plane at depth 5 seen from two shifted cameras: the
        # correlation cost peaks at the correct hypothesis
        rng = np.random.default_rng(2)
        h, w = 24, 32
        k = jnp.asarray(
            [[[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]]], jnp.float32
        )
        target_e = jnp.eye(4)[None]
        source_e = jnp.eye(4)[None].at[0, 0, 3].set(-0.5)  # shifted camera

        texture = rng.random((1, 4, h, w)).astype(np.float32)
        true_depth = jnp.full((1, 1, h, w), 5.0)
        # synthesize the source view's image of the plane: for each source
        # pixel, look up the target texture at its depth-5 reprojection
        # (roles of source/target swapped relative to the sweep itself)
        source_maps = warping.backward_warping(
            jnp.asarray(texture), true_depth, k, k, target_e, source_e
        )
        sweep = modules.PlaneSweepStereo(depth_range=(2.0, 20.0),
                                         num_hypotheses=16)
        volumes = sweep(
            {"feature_maps": jnp.asarray(texture),
             "intrinsic_matrices": k, "extrinsic_matrices": target_e},
            {"feature_maps": source_maps,
             "intrinsic_matrices": k, "extrinsic_matrices": source_e},
        )
        assert volumes.shape == (1, 16, h, w)
        # score on the central crop (borders fall outside the source view)
        central = np.asarray(volumes[0][:, 6:-6, 8:-8].mean(axis=(1, 2)))
        best = central.argmax()
        hypothesis_depths = 1.0 / np.linspace(1 / 20.0, 1 / 2.0, 16)
        assert abs(hypothesis_depths[best] - 5.0) < 2.0

    def test_spatial_propagation_smooths(self):
        prop = modules.SpatialPropagation2d(kernel_size=3, num_steps=5)
        x = jnp.zeros((1, 1, 9, 9)).at[0, 0, 4, 4].set(1.0)
        kernels = jnp.ones((1, 1, 3, 3, 9, 9)) * 0.2
        out = prop(x, kernels)
        assert out.shape == x.shape
        assert float(out[0, 0, 4, 4]) < 1.0
        assert float(out[0, 0, 3, 4]) > 0.0
