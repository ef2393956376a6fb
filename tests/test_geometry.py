import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsrd_tpu.ops import geometry


def test_rotation_matrices_orthonormal():
    angles = jnp.linspace(-3.0, 3.0, 7)
    for fn in (geometry.rotation_matrix_x, geometry.rotation_matrix_y, geometry.rotation_matrix_z):
        mats = fn(angles)
        eye = jnp.eye(3)
        prod = mats @ jnp.swapaxes(mats, -2, -1)
        np.testing.assert_allclose(prod, jnp.broadcast_to(eye, prod.shape), atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(np.asarray(mats)), 1.0, atol=1e-6)


def test_axis_angle_matches_named_axes():
    angle = jnp.asarray(0.7)
    np.testing.assert_allclose(
        geometry.rotation_matrix(jnp.asarray([1.0, 0.0, 0.0]), angle),
        geometry.rotation_matrix_x(angle),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        geometry.rotation_matrix(jnp.asarray([0.0, 1.0, 0.0]), angle),
        geometry.rotation_matrix_y(angle),
        atol=1e-6,
    )


def test_skew_symmetric_cross_product():
    rng = np.random.default_rng(0)
    a = rng.normal(size=3).astype(np.float32)
    b = rng.normal(size=3).astype(np.float32)
    skew = geometry.skew_symmetric_matrix(jnp.asarray(a))
    np.testing.assert_allclose(skew @ b, np.cross(a, b), atol=1e-6)


def test_expand_to_4x4():
    rot = geometry.rotation_matrix_z(jnp.asarray(0.3))
    mat = geometry.expand_to_4x4(rot)
    assert mat.shape == (4, 4)
    np.testing.assert_allclose(mat[:3, :3], rot)
    np.testing.assert_allclose(mat[3], [0, 0, 0, 1])


def test_clip_lines_to_front():
    # one line fully in front, one crossing, one fully behind
    lines = jnp.asarray(
        [
            [[0.0, 0.0, 1.0], [1.0, 0.0, 2.0]],
            [[0.0, 0.0, -1.0], [0.0, 0.0, 3.0]],
            [[0.0, 0.0, -2.0], [0.0, 0.0, -1.0]],
        ]
    )
    clipped, masks = geometry.clip_lines_to_front(lines)
    np.testing.assert_array_equal(np.asarray(masks), [True, True, False])
    # the crossing line's behind endpoint is pulled to z ~ 0
    depths = np.asarray(clipped[1, :, 2])
    assert depths.max() == pytest.approx(3.0)
    assert depths.min() == pytest.approx(0.0, abs=1e-5)


def test_project_box_3d_front_box_equals_corner_projection():
    rng = np.random.default_rng(1)
    corners = rng.normal(size=(8, 3)).astype(np.float32)
    corners[:, 2] += 10.0  # fully in front
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)

    box2d = geometry.project_box_3d(jnp.asarray(corners), jnp.asarray(K))
    pix = corners @ K.T
    pix = pix[:, :2] / pix[:, 2:]
    np.testing.assert_allclose(box2d[0], pix.min(0), rtol=1e-5)
    np.testing.assert_allclose(box2d[1], pix.max(0), rtol=1e-5)


def test_project_box_3d_behind_camera_is_zero():
    corners = np.ones((8, 3), np.float32)
    corners[:, 2] = -5.0
    K = np.eye(3, dtype=np.float32)
    box2d = geometry.project_box_3d(jnp.asarray(corners), jnp.asarray(K))
    np.testing.assert_array_equal(np.asarray(box2d), 0.0)


def test_project_box_3d_vmap():
    rng = np.random.default_rng(2)
    corners = rng.normal(size=(4, 8, 3)).astype(np.float32)
    corners[..., 2] += 10.0
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    out = jax.vmap(lambda c: geometry.project_box_3d(c, jnp.asarray(K)))(
        jnp.asarray(corners)
    )
    assert out.shape == (4, 2, 2)


def test_clip_boxes_to_image():
    # torchvision.ops.clip_boxes_to_image semantics: x clamped to [0, W],
    # y clamped to [0, H]
    rng = np.random.default_rng(3)
    boxes = rng.uniform(-100, 900, size=(16, 4)).astype(np.float32)
    ref = boxes.copy()
    ref[:, 0::2] = np.clip(ref[:, 0::2], 0, 704)
    ref[:, 1::2] = np.clip(ref[:, 1::2], 0, 376)
    ours = geometry.clip_boxes_to_image(
        jnp.asarray(boxes).reshape(16, 2, 2), (376, 704)
    ).reshape(16, 4)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_projection_backprojection_roundtrip():
    K = jnp.asarray([[400.0, 0, 100], [0, 400.0, 80], [0, 0, 1]])
    E = geometry.expand_to_4x4(geometry.rotation_matrix_y(jnp.asarray(0.2)))
    E = E.at[:3, 3].set(jnp.asarray([0.5, -0.2, 1.0]))
    depth = jnp.full((1, 8, 8), 5.0)
    world = geometry.backprojection(depth, K, E)
    pix = geometry.projection(world, K, E)
    xy = pix[..., :2] / pix[..., 2:]
    gy, gx = jnp.meshgrid(jnp.arange(8.0), jnp.arange(8.0), indexing="ij")
    np.testing.assert_allclose(xy[0, ..., 0], gx, atol=1e-3)
    np.testing.assert_allclose(xy[0, ..., 1], gy, atol=1e-3)


def test_rectification_identity_for_level_camera():
    E = jnp.eye(4)
    rect = geometry.rectification_from_extrinsic(E)
    np.testing.assert_allclose(rect, jnp.eye(3), atol=1e-6)

    tilted = geometry.expand_to_4x4(geometry.rotation_matrix_x(jnp.asarray(0.1)))
    rect = geometry.rectification_from_extrinsic(tilted)
    # rectification should undo the tilt: R_rect ~ Rx(+-0.1)
    angle = np.arccos(np.clip((np.trace(np.asarray(rect)) - 1) / 2, -1, 1))
    assert angle == pytest.approx(0.1, abs=1e-5)
