import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsrd_tpu.ops import iou2d, iou3d


def _random_boxes(rng, n):
    xy = rng.uniform(0, 100, size=(n, 2))
    wh = rng.uniform(1, 50, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)


def _np_pairwise_iou(a, b, eps=0.0):
    """Independent numpy golden for pairwise IoU (torchvision semantics)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter + eps)


def _np_pairwise_diou(a, b, eps=1e-7):
    iou = _np_pairwise_iou(a, b, eps)
    lt = np.minimum(a[:, None, :2], b[None, :, :2])
    rb = np.maximum(a[:, None, 2:], b[None, :, 2:])
    diag = np.sum((rb - lt) ** 2, axis=-1) + eps
    ca = (a[:, :2] + a[:, 2:]) / 2
    cb = (b[:, :2] + b[:, 2:]) / 2
    dist = np.sum((ca[:, None] - cb[None]) ** 2, axis=-1)
    return iou - dist / diag


class TestIoU2D:
    def test_box_iou_matches_numpy_golden(self):
        rng = np.random.default_rng(0)
        a, b = _random_boxes(rng, 12), _random_boxes(rng, 7)
        ours = iou2d.box_iou(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(
            np.asarray(ours), _np_pairwise_iou(a, b), atol=1e-5
        )

    def test_distance_box_iou_matches_numpy_golden(self):
        rng = np.random.default_rng(1)
        a, b = _random_boxes(rng, 9), _random_boxes(rng, 9)
        ours = iou2d.distance_box_iou(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(
            np.asarray(ours), _np_pairwise_diou(a, b), atol=1e-5
        )

    def test_distance_box_iou_loss_elementwise(self):
        rng = np.random.default_rng(2)
        a, b = _random_boxes(rng, 20), _random_boxes(rng, 20)
        ours = np.asarray(iou2d.distance_box_iou_loss(jnp.asarray(a), jnp.asarray(b)))
        golden = 1.0 - np.diag(_np_pairwise_diou(a, b))
        np.testing.assert_allclose(ours, golden, atol=1e-5)
        # identical boxes -> loss 0
        zero = iou2d.distance_box_iou_loss(jnp.asarray(a), jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(zero), 0.0, atol=1e-5)

    def test_smooth_l1_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(3)
        x = rng.normal(size=(32,)).astype(np.float32) * 3
        y = rng.normal(size=(32,)).astype(np.float32)
        ref = torch.nn.functional.smooth_l1_loss(
            torch.from_numpy(x), torch.from_numpy(y), reduction="none"
        )
        ours = iou2d.smooth_l1(jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


def _make_box_corners(cx, cy, cz, w, l, h, yaw):
    """8 corners, z up, KITTI-360 evaluation order: 0-3 top, 4-7 bottom."""
    base = np.array(
        [
            [-1, +1, +1],
            [+1, +1, +1],
            [+1, -1, +1],
            [-1, -1, +1],
            [-1, +1, -1],
            [+1, +1, -1],
            [+1, -1, -1],
            [-1, -1, -1],
        ],
        np.float32,
    ) * np.array([w / 2, l / 2, h / 2], np.float32)
    rot = np.array(
        [
            [np.cos(yaw), -np.sin(yaw), 0],
            [np.sin(yaw), np.cos(yaw), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    return base @ rot.T + np.array([cx, cy, cz], np.float32)


class TestIoU3D:
    def test_identical_boxes(self):
        c = _make_box_corners(1.0, 2.0, 0.5, 2.0, 4.0, 1.5, 0.3)
        iou_3d, iou_bev = iou3d.box_3d_iou(jnp.asarray(c), jnp.asarray(c))
        assert float(iou_3d) == pytest.approx(1.0, abs=2e-3)
        assert float(iou_bev) == pytest.approx(1.0, abs=2e-3)

    def test_disjoint_boxes(self):
        a = _make_box_corners(0, 0, 0, 2, 2, 2, 0.0)
        b = _make_box_corners(10, 0, 0, 2, 2, 2, 0.0)
        iou_3d, iou_bev = iou3d.box_3d_iou(jnp.asarray(a), jnp.asarray(b))
        assert float(iou_3d) == pytest.approx(0.0, abs=1e-6)
        assert float(iou_bev) == pytest.approx(0.0, abs=1e-6)

    def test_axis_aligned_half_overlap(self):
        a = _make_box_corners(0, 0, 0, 2, 2, 2, 0.0)
        b = _make_box_corners(1, 0, 0, 2, 2, 2, 0.0)
        iou_3d, iou_bev = iou3d.box_3d_iou(jnp.asarray(a), jnp.asarray(b))
        # overlap volume 1*2*2=4, union 8+8-4=12
        assert float(iou_3d) == pytest.approx(4 / 12, abs=1e-4)
        assert float(iou_bev) == pytest.approx(2 / 6, abs=1e-4)

    def test_rotated_square_45deg(self):
        a = _make_box_corners(0, 0, 0, 2, 2, 2, 0.0)
        b = _make_box_corners(0, 0, 0, 2, 2, 2, np.pi / 4)
        _, iou_bev = iou3d.box_3d_iou(jnp.asarray(a), jnp.asarray(b))
        # square vs 45-degree rotated square: octagon intersection
        inter = 8 * (np.sqrt(2) - 1)
        expected = inter / (4 + 4 - inter)
        assert float(iou_bev) == pytest.approx(expected, abs=1e-3)

    def test_monte_carlo_random_boxes(self):
        rng = np.random.default_rng(7)
        for _ in range(5):
            p1 = rng.uniform(-1, 1, 3)
            p2 = rng.uniform(-1, 1, 3)
            d1 = rng.uniform(1, 3, 3)
            d2 = rng.uniform(1, 3, 3)
            y1, y2 = rng.uniform(0, np.pi, 2)
            a = _make_box_corners(*p1, *d1, y1)
            b = _make_box_corners(*p2, *d2, y2)
            iou_3d, _ = iou3d.box_3d_iou(jnp.asarray(a), jnp.asarray(b))

            # Monte Carlo estimate of the intersection volume
            lo = np.minimum(a.min(0), b.min(0))
            hi = np.maximum(a.max(0), b.max(0))
            pts = rng.uniform(lo, hi, size=(200_000, 3)).astype(np.float32)

            def inside(c, pts):
                ctr = c.mean(0)
                # box axes from edges (evaluation order)
                ax = c[1] - c[0]
                ay = c[3] - c[0]
                az = c[4] - c[0]
                rel = pts - ctr
                ok = np.ones(len(pts), bool)
                for axis in (ax, ay, az):
                    half = np.linalg.norm(axis) / 2
                    proj = rel @ (axis / np.linalg.norm(axis))
                    ok &= np.abs(proj) <= half + 1e-6
                return ok

            hits = inside(a, pts) & inside(b, pts)
            vol_box = np.prod(hi - lo)
            inter_mc = hits.mean() * vol_box
            v1, v2 = np.prod(d1), np.prod(d2)
            iou_mc = inter_mc / (v1 + v2 - inter_mc)
            assert float(iou_3d) == pytest.approx(iou_mc, abs=0.02)

    def test_vmapped_batch(self):
        a = np.stack([_make_box_corners(0, 0, 0, 2, 2, 2, 0.0)] * 3)
        b = np.stack(
            [
                _make_box_corners(0, 0, 0, 2, 2, 2, 0.0),
                _make_box_corners(1, 0, 0, 2, 2, 2, 0.0),
                _make_box_corners(9, 0, 0, 2, 2, 2, 0.0),
            ]
        )
        iou_3d, iou_bev = jax.jit(jax.vmap(iou3d.box_3d_iou))(
            jnp.asarray(a), jnp.asarray(b)
        )
        np.testing.assert_allclose(
            np.asarray(iou_3d), [1.0, 4 / 12, 0.0], atol=1e-4
        )
