import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsrd_tpu.models import box_parameters
from vsrd_tpu.rendering import rays, renderer, samplers, scene, sdf


class TestSdf:
    def test_box_sdf_closed_form(self):
        half = jnp.asarray([1.0, 2.0, 3.0])
        # center: -min(half) (plus epsilon smoothing inside relu norm)
        d = sdf.box_sdf(jnp.zeros(3), half)
        assert float(d) == pytest.approx(-1.0, abs=2e-3)
        # on a face
        d = sdf.box_sdf(jnp.asarray([1.0, 0.0, 0.0]), half)
        assert float(d) == pytest.approx(0.0, abs=2e-3)
        # outside along x
        d = sdf.box_sdf(jnp.asarray([3.0, 0.0, 0.0]), half)
        assert float(d) == pytest.approx(2.0, abs=2e-3)
        # outside at a corner
        d = sdf.box_sdf(jnp.asarray([2.0, 3.0, 4.0]), half)
        assert float(d) == pytest.approx(np.sqrt(3.0), abs=2e-3)

    def test_box_sdf_eikonal_away_from_edges(self):
        half = jnp.asarray([1.0, 1.0, 1.0])
        grad = jax.grad(lambda p: sdf.box_sdf(p, half))
        for p in [[2.0, 0.1, 0.2], [0.0, -3.0, 0.3], [5.0, 5.0, 5.0]]:
            g = grad(jnp.asarray(p))
            assert float(jnp.linalg.norm(g)) == pytest.approx(1.0, abs=2e-3)

    def test_masked_softmin_union_ignores_padding(self):
        # two valid instances + one padded with tiny distance
        distances = jnp.asarray([1.0, 2.0, -100.0])[:, None]
        valid = jnp.asarray([True, True, False])
        union, weights = sdf.masked_softmin_union(distances, valid, 0.1)
        assert float(weights[2, 0]) == 0.0
        assert float(union[0]) == pytest.approx(1.0, abs=2e-3)

    def test_masked_hard_union(self):
        distances = jnp.asarray([3.0, 1.5, -100.0])[:, None]
        valid = jnp.asarray([True, True, False])
        union, weights = sdf.masked_hard_union(distances, valid)
        assert float(union[0]) == pytest.approx(1.5)
        np.testing.assert_allclose(np.asarray(weights[:, 0]), [0.0, 1.0, 0.0])

    def test_into_instance_frame(self):
        from vsrd_tpu.ops import geometry

        loc = jnp.asarray([[1.0, 0.0, 0.0]])
        rot = geometry.rotation_matrix_y(jnp.asarray([0.5]))
        p = jnp.asarray([2.0, 0.0, 0.0])
        local = sdf.into_instance_frame(p[None], loc, rot)[0, 0]
        expected = jnp.asarray([1.0, 0.0, 0.0]) @ rot[0]
        np.testing.assert_allclose(np.asarray(local), np.asarray(expected), atol=1e-6)


class TestSamplers:
    def test_quadrature_deterministic_midpoints(self):
        bins = jnp.linspace(0.0, 10.0, 11)[None]
        samples = samplers.quadrature_sampler(None, bins, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(samples[0]), np.arange(10) + 0.5, atol=1e-6
        )

    def test_quadrature_within_bins(self):
        bins = jnp.linspace(0.0, 10.0, 11)[None]
        samples = samplers.quadrature_sampler(jax.random.PRNGKey(0), bins)
        s = np.asarray(samples[0])
        assert ((s >= np.arange(10)) & (s <= np.arange(10) + 1)).all()

    def test_inverse_transform_uniform_weights(self):
        bins = jnp.linspace(0.0, 1.0, 11)[None]
        weights = jnp.ones((1, 10))
        samples = samplers.inverse_transform_sampler(
            None, bins, weights, 100, deterministic=True
        )
        s = np.asarray(samples[0])
        assert s.min() >= 0.0 and s.max() <= 1.0
        # deterministic uniform grid through a uniform CDF is near-linear
        np.testing.assert_allclose(s, np.linspace(0, 1, 100), atol=0.02)

    def test_inverse_transform_concentrates_on_heavy_bins(self):
        bins = jnp.linspace(0.0, 1.0, 11)[None]
        weights = jnp.zeros((1, 10)).at[0, 5].set(1.0)
        samples = samplers.inverse_transform_sampler(
            jax.random.PRNGKey(1), bins, weights, 50
        )
        s = np.asarray(samples[0])
        assert (s >= 0.5 - 1e-4).all() and (s <= 0.6 + 1e-4).all()


def _single_box_scene(n_pad=3):
    locations = jnp.zeros((n_pad, 3)).at[0].set(jnp.asarray([0.0, 0.0, 5.0]))
    rotations = jnp.broadcast_to(jnp.eye(3), (n_pad, 3, 3))
    half = jnp.ones((n_pad, 3))
    valid = jnp.zeros(n_pad, bool).at[0].set(True)
    return scene.SceneParams(locations, rotations, half, valid)


class TestRenderer:
    def test_exclusive_cumprod(self):
        x = jnp.asarray([[0.5, 0.5, 0.5]])
        out = renderer.exclusive_cumprod(x, axis=-1)
        np.testing.assert_allclose(np.asarray(out[0]), [1.0, 0.5, 0.25])

    def test_single_box_silhouette(self):
        sc = _single_box_scene()
        field = scene.soft_scene_field(sc, temperature=0.1)
        origins = jnp.zeros((2, 3))
        directions = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
        out = jax.jit(lambda: renderer.hierarchical_render(
            field,
            origins,
            directions,
            distance_range=(0.0, 20.0),
            num_samples=64,
            sdf_std_deviation=0.1,
            cosine_ratio=1.0,
            deterministic=True,
        ))()
        probs = np.asarray(out.features)
        # ray 0 pierces the box -> instance 0 probability ~ 1
        assert probs[0, 0] > 0.9
        # ray 1 misses everything -> ~0
        assert probs[1].max() < 0.05
        # weights are a sub-probability distribution
        w = np.asarray(out.weights)
        assert (w >= 0).all() and w.sum(-1).max() <= 1.0 + 1e-4

    def test_render_gradients_eikonal_near_unit(self):
        sc = _single_box_scene()
        field = scene.soft_scene_field(sc, temperature=0.1)
        origins = jnp.zeros((1, 3))
        directions = jnp.asarray([[0.0, 0.0, 1.0]])
        out = jax.jit(lambda: renderer.render_rays(
            field,
            origins,
            directions,
            distance_range=(3.0, 7.0),
            num_samples=32,
            sdf_std_deviation=0.1,
            deterministic=True,
        ))()
        norms = np.linalg.norm(np.asarray(out.gradients), axis=-1)
        # box SDF away from edges has unit gradient
        assert np.isfinite(norms).all()
        assert np.median(np.abs(norms - 1.0)) < 0.1

    @pytest.mark.slow
    def test_render_differentiable_wrt_scene(self):
        def loss_fn(loc_z):
            sc = _single_box_scene()
            sc = sc._replace(locations=sc.locations.at[0, 2].set(loc_z))
            field = scene.soft_scene_field(sc, temperature=0.1)
            out = renderer.hierarchical_render(
                field,
                jnp.zeros((1, 3)),
                jnp.asarray([[0.0, 0.0, 1.0]]),
                distance_range=(0.0, 20.0),
                num_samples=32,
                sdf_std_deviation=0.1,
                deterministic=True,
            )
            return jnp.sum(out.features[:, 0])

        g = jax.grad(loss_fn)(5.0)
        assert np.isfinite(float(g))

    def test_sphere_tracing_unit_sphere(self):
        def sphere(p):
            return jnp.linalg.norm(p, axis=-1, keepdims=True) - 1.0

        positions, converged = renderer.sphere_tracing(
            sphere,
            ray_positions=jnp.asarray([[0.0, 0.0, -5.0], [0.0, 3.0, -5.0]]),
            ray_directions=jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]]),
            num_iterations=100,
            convergence_criteria=1e-4,
        )
        assert bool(converged[0, 0])
        np.testing.assert_allclose(
            np.asarray(positions[0]), [0.0, 0.0, -1.0], atol=1e-3
        )
        assert not bool(converged[1, 0])

    def test_surface_normal_sphere(self):
        def sphere(p):
            return jnp.linalg.norm(p, axis=-1, keepdims=True) - 1.0

        pts = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        normals = renderer.surface_normal(sphere, pts)
        np.testing.assert_allclose(np.asarray(normals), np.asarray(pts), atol=1e-4)


class TestRays:
    def test_ray_casting_center_pixel(self):
        K = jnp.asarray([[100.0, 0.0, 32.0], [0.0, 100.0, 24.0], [0.0, 0.0, 1.0]])
        E = jnp.eye(4)
        cam, dirs = rays.ray_casting((48, 64), K, E)
        np.testing.assert_allclose(np.asarray(cam), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dirs[24, 32]), [0, 0, 1], atol=1e-6)
        norms = np.linalg.norm(np.asarray(dirs), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_ray_points_project_back(self):
        K = jnp.asarray([[100.0, 0.0, 32.0], [0.0, 100.0, 24.0], [0.0, 0.0, 1.0]])
        from vsrd_tpu.ops import geometry

        E = geometry.expand_to_4x4(geometry.rotation_matrix_y(jnp.asarray(0.3)))
        E = E.at[:3, 3].set(jnp.asarray([1.0, 2.0, 3.0]))
        cam, dirs = rays.ray_casting((48, 64), K, E)
        # walk 7 units along the ray of pixel (10, 20), project back
        p = cam + dirs[10, 20] * 7.0
        pix = np.asarray(
            geometry.projection(geometry.homogeneous(p), K, E)
        )
        np.testing.assert_allclose(pix[:2] / pix[2], [20.0, 10.0], atol=1e-3)


class TestBoxParameters:
    def test_decode_encode_roundtrip(self):
        key = jax.random.PRNGKey(0)
        params = box_parameters.init_box_parameters(key, 1, 4)
        params = jax.tree.map(
            lambda x: x + jax.random.normal(key, x.shape) * 0.5, params
        )
        out = box_parameters.decode_boxes(params)
        loc, dim, rot = box_parameters.encode_box_3d(out["boxes_3d"])
        np.testing.assert_allclose(
            np.asarray(loc), np.asarray(out["locations"]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(dim), np.asarray(out["dimensions"]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(rot), np.asarray(out["orientations"]), atol=1e-4
        )

    def test_initial_boxes_at_sigmoid_midpoint(self):
        key = jax.random.PRNGKey(1)
        params = box_parameters.init_box_parameters(key, 1, 2)
        out = box_parameters.decode_boxes(params)
        np.testing.assert_allclose(
            np.asarray(out["locations"][0, 0]), [0.0, 0.675, 50.0], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["dimensions"][0, 0]), [0.875, 0.875, 2.0], atol=1e-5
        )


class TestOccupancyRendering:
    def test_occupancy_grid_lookup(self):
        from vsrd_tpu.rendering import occupancy as occ

        grid = occ.OccupancyGrid(
            occupancy=jnp.zeros((8, 8, 8), bool).at[4, 4, 4].set(True),
            origin=jnp.asarray([-4.0, -4.0, -4.0]),
            extent=jnp.asarray([8.0, 8.0, 8.0]),
        )
        # cell [4,4,4] covers [0,1)^3
        assert bool(grid.lookup(jnp.asarray([0.5, 0.5, 0.5])))
        assert not bool(grid.lookup(jnp.asarray([2.5, 0.5, 0.5])))
        assert not bool(grid.lookup(jnp.asarray([100.0, 0.0, 0.0])))

    def test_update_from_sdf_and_render(self):
        from vsrd_tpu.rendering import occupancy as occ

        sc = _single_box_scene()
        field = scene.soft_scene_field(sc, temperature=0.1)

        grid = occ.OccupancyGrid(
            occupancy=jnp.zeros((16, 16, 16), bool),
            origin=jnp.asarray([-8.0, -8.0, -3.0]),
            extent=jnp.asarray([16.0, 16.0, 16.0]),
        )
        grid = jax.jit(lambda g: occ.update_occupancy_grid(
            lambda p: field(p)[0], g, threshold=1.5
        ))(grid)
        assert int(grid.occupancy.sum()) > 0

        out = jax.jit(lambda g: occ.occupancy_volumetric_rendering(
            field,
            g,
            ray_positions=jnp.zeros((2, 3)),
            ray_directions=jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]),
            marching_step_size=0.25,
            num_samples=48,
            sdf_std_deviation=0.1,
            stratified=False,
        ))(grid)
        probs = np.asarray(out.features)
        assert probs[0, 0] > 0.8   # hits the box
        assert probs[1].max() < 0.1  # misses
