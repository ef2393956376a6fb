import json
import os

import numpy as np
import pytest

from vsrd_tpu.data import rle
from vsrd_tpu.data import transforms as tf
from vsrd_tpu.utils import saver
from vsrd_tpu.configuration.configurator import Configurator
from vsrd_tpu.configuration.registry import instantiate, register_defaults


class TestRLE:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            mask = (rng.random((37, 53)) > 0.7).astype(np.uint8)
            encoded = rle.encode(mask)
            decoded = rle.decode(encoded)
            np.testing.assert_array_equal(decoded, mask)

    def test_roundtrip_edge_cases(self):
        for mask in [
            np.zeros((5, 7), np.uint8),
            np.ones((5, 7), np.uint8),
            np.eye(6, dtype=np.uint8),
        ]:
            np.testing.assert_array_equal(rle.decode(rle.encode(mask)), mask)

    def test_uncompressed_counts_list(self):
        # column-major: 2x2 mask with left column set
        mask = np.array([[1, 0], [1, 0]], np.uint8)
        counts = rle.encode_counts(mask)
        assert counts == [0, 2, 2]
        np.testing.assert_array_equal(
            rle.decode({"size": [2, 2], "counts": counts}), mask
        )

    def test_area(self):
        mask = (np.arange(100).reshape(10, 10) % 3 == 0).astype(np.uint8)
        assert rle.area(rle.encode(mask)) == int(mask.sum())

    def test_compressed_string_is_ascii(self):
        mask = np.tri(20, 20).astype(np.uint8)
        encoded = rle.encode(mask)
        assert isinstance(encoded["counts"], str)
        assert all(32 <= ord(c) < 127 for c in encoded["counts"])


def _sample(n=3, h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    masks = np.zeros((n, h, w), np.float32)
    for i in range(n):
        y, x = rng.integers(4, h - 12), rng.integers(4, w - 16)
        masks[i, y : y + 8, x : x + 12] = 1.0
    return {
        "image": rng.random((h, w, 3)).astype(np.float32),
        "masks": masks,
        "labels": np.zeros(n, np.int64),
        "boxes_3d": rng.normal(size=(n, 8, 3)).astype(np.float32),
        "instance_ids": np.arange(n),
        "intrinsic_matrix": np.array(
            [[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32
        ),
        "extrinsic_matrix": np.eye(4, dtype=np.float32),
    }


class TestTransforms:
    def test_resizer_scales_intrinsics(self):
        sample = _sample()
        out = tf.Resizer((64, 96))(sample)
        assert out["image"].shape == (64, 96, 3)
        assert out["masks"].shape == (3, 64, 96)
        np.testing.assert_allclose(
            out["intrinsic_matrix"][0, 0],
            sample["intrinsic_matrix"][0, 0] * 2,
            rtol=1e-5,
        )

    def test_mask_area_filter(self):
        sample = _sample()
        sample["masks"][1] = 0.0
        out = tf.MaskAreaFilter(min_mask_area=10)(sample)
        assert len(out["masks"]) == 2
        assert len(out["instance_ids"]) == 2

    def test_box_generator(self):
        sample = _sample()
        out = tf.BoxGenerator()(sample)
        boxes = out["boxes_2d"]
        assert boxes.shape == (3, 2, 2)
        for mask, box in zip(sample["masks"], boxes):
            ys, xs = np.nonzero(mask)
            np.testing.assert_array_equal(box[0], [xs.min(), ys.min()])
            np.testing.assert_array_equal(box[1], [xs.max(), ys.max()])

    def test_soft_rasterizer_properties(self):
        sample = _sample(n=1)
        out = tf.SoftRasterizer()(sample)
        soft = out["soft_masks"][0]
        hard = out["hard_masks"][0]
        assert soft.shape == hard.shape
        # well inside the rectangle -> close to 1; far outside -> close to 0
        ys, xs = np.nonzero(hard)
        cy, cx = int(ys.mean()), int(xs.mean())
        # temperature 10 => sigmoid(d/10); small rect center is ~3.5 px in
        assert soft[cy, cx] > 0.55
        assert soft[0, 0] < 0.3

    def test_mask_refiner_fills_holes(self):
        sample = _sample(n=1)
        mask = sample["masks"][0]
        ys, xs = np.nonzero(mask)
        holey = mask.copy()
        holey[int(ys.mean()), int(xs.mean())] = 0.0
        sample["masks"] = holey[None]
        out = tf.MaskRefiner()(sample)
        assert out["masks"][0][int(ys.mean()), int(xs.mean())] == 1.0

    def test_horizontal_flip_intrinsics(self):
        sample = _sample()
        flipper = tf.RandomHorizontalFlipper(probability=1.0)
        out = flipper(sample)
        np.testing.assert_array_equal(out["image"], sample["image"][:, ::-1])
        # projecting the flipped K onto a known point mirrors x
        k = out["intrinsic_matrix"]
        assert k[0, 0] < 0

    def test_photometric_transforms_preserve_range(self):
        sample = _sample()
        for transform in [
            tf.FractalBrownianMotion(0.2, (4, 4), 0.5, 2, 2,
                                     rng=np.random.default_rng(0)),
            tf.FastFractalBrownianMotion(0.2, (4, 4), 0.5, 2, 2,
                                         downscale_factor=2,
                                         rng=np.random.default_rng(0)),
            tf.RandomConvolution([3, 5], rng=np.random.default_rng(0)),
        ]:
            out = transform(sample)
            assert out["image"].shape == sample["image"].shape
            assert out["image"].min() >= 0.0 and out["image"].max() <= 1.0


class TestAdversarialMasks:
    """Real-data mask pathologies the synthetic e2e can't produce
    (reference behaviors: geometric_transforms.py:320-360 MaskRefiner,
    :233-317 SoftRasterizer, kitti_360_dataset.py:177-188 filters)."""

    def test_mask_refiner_multi_blob_keeps_largest(self):
        sample = _sample(n=1)
        masks = np.zeros_like(sample["masks"])
        masks[0, 4:14, 6:20] = 1.0      # large blob (140 px)
        masks[0, 24:27, 40:44] = 1.0    # small disjoint blob (12 px)
        sample["masks"] = masks
        out = tf.MaskRefiner()(sample)
        assert out["masks"][0][8, 10] == 1.0
        # refiner keeps only the largest external contour
        assert out["masks"][0][25, 41] == 0.0

    def test_soft_rasterizer_degenerate_contours(self):
        # single pixel (1-vertex contour), 2-pixel line (2-vertex), and
        # empty mask: all must fall back without NaN/crash
        sample = _sample(n=3)
        masks = np.zeros_like(sample["masks"])
        masks[0, 10, 10] = 1.0
        masks[1, 5, 20:22] = 1.0
        # masks[2] stays empty
        sample["masks"] = masks
        out = tf.SoftRasterizer()(sample)
        assert np.isfinite(out["soft_masks"]).all()
        # <3-vertex polygons fall back to the hard mask unchanged
        np.testing.assert_array_equal(out["soft_masks"][0], masks[0])
        np.testing.assert_array_equal(out["soft_masks"][2], masks[2])

    def test_mask_refiner_degenerate_contours_no_crash(self):
        sample = _sample(n=2)
        masks = np.zeros_like(sample["masks"])
        masks[0, 10, 10] = 1.0          # 1-px
        masks[1, 5, 20:22] = 1.0        # 2-px line
        sample["masks"] = masks
        out = tf.MaskRefiner()(sample)
        assert out["masks"].shape == masks.shape
        assert np.isfinite(out["masks"]).all()

    def test_polygon_distance_map_two_vertices(self):
        poly = np.array([[5.0, 5.0], [20.0, 5.0]], np.float32)
        dist = tf.polygon_distance_map(poly, (16, 32))
        assert np.isfinite(dist).all()
        assert dist[5, 12] < 0.5        # on the segment
        np.testing.assert_allclose(dist[15, 12], 10.0, atol=0.1)

    def test_full_chain_drops_all_instances(self):
        # every instance fails the area filter -> all downstream
        # transforms must handle empty instance arrays
        from vsrd_tpu.data.kitti360 import default_transforms

        sample = _sample(n=2)
        sample["masks"][:] = 0.0
        sample["masks"][0, 3, 3] = 1.0  # below target_min_mask_area
        for transform in default_transforms(
            image_size=sample["image"].shape[:2], target=True
        ):
            sample = transform(sample)
        assert len(sample["masks"]) == 0
        assert len(sample["boxes_2d"]) == 0
        assert sample["soft_masks"].shape[0] == 0

    def test_full_chain_holed_and_ragged_mask(self):
        # hole + ragged boundary + secondary blob: the production chain
        # must emit a filled, finite soft mask
        from vsrd_tpu.data.kitti360 import default_transforms

        sample = _sample(n=1)
        h, w = sample["image"].shape[:2]
        masks = np.zeros((1, h, w), np.float32)
        masks[0, 6:26, 8:40] = 1.0
        masks[0, 12:16, 14:20] = 0.0    # hole
        masks[0, 6, 8:40:2] = 0.0       # ragged top edge
        masks[0, 28:30, 42:45] = 1.0    # small secondary blob
        sample["masks"] = masks
        for transform in default_transforms(
            image_size=(h, w), target=True
        ):
            sample = transform(sample)
        assert sample["soft_masks"].shape[0] == 1
        soft = sample["soft_masks"][0]
        assert np.isfinite(soft).all()
        assert soft[14, 16] > 0.5       # hole filled by the refiner


class TestAlignToTarget:
    def test_instance_enter_leave_mid_group(self):
        # target sees ids {0, 1, 2}; source view 1 misses id 1 (left the
        # view) and adds id 5 (entered); source view 2 sees none
        from vsrd_tpu.data.kitti360 import align_to_target

        target = _sample(n=3)
        target["instance_ids"] = np.array([0, 1, 2])
        target["soft_masks"] = target["masks"].copy()
        target["boxes_2d"] = np.tile(
            np.array([[[1.0, 2.0], [3.0, 4.0]]], np.float32), (3, 1, 1)
        )

        src = _sample(n=2, seed=1)
        src["instance_ids"] = np.array([5, 2])
        src["soft_masks"] = src["masks"].copy()
        src["boxes_2d"] = np.stack(
            [np.full((2, 2), 9.0, np.float32),
             np.full((2, 2), 7.0, np.float32)]
        )

        empty = _sample(n=0, seed=2)
        empty["instance_ids"] = np.array([], np.int64)
        empty["soft_masks"] = np.zeros((0, *empty["image"].shape[:2]),
                                       np.float32)
        empty["boxes_2d"] = np.zeros((0, 2, 2), np.float32)
        empty["masks"] = np.zeros((0, *empty["image"].shape[:2]), np.float32)

        kwargs = align_to_target({0: target, -1: src, 1: empty},
                                 max_instances=4)
        # view order is sorted relative indices: [-1, 0, 1]
        np.testing.assert_array_equal(
            kwargs["visible"],
            [[False, False, True, False],
             [True, True, True, False],
             [False, False, False, False]],
        )
        assert kwargs["valid"].tolist() == [True, True, True, False]
        # id 2 is source index 1 in view -1: its box is the 7s
        np.testing.assert_array_equal(
            kwargs["gt_boxes_2d"][0, 2], np.full((2, 2), 7.0)
        )
        # invisible instances have zero-filled masks and boxes
        assert kwargs["soft_masks"][0][1].sum() == 0.0
        np.testing.assert_array_equal(
            kwargs["gt_boxes_2d"][0, 0], np.zeros((2, 2))
        )
        # target view aligned to itself
        np.testing.assert_array_equal(
            kwargs["gt_boxes_2d"][1, 0], target["boxes_2d"][0]
        )
        assert np.isnan(kwargs["gt_boxes_3d"][3]).all()


class TestSaver:
    def test_roundtrip(self, tmp_path):
        tree = {
            "step": np.asarray(42),
            "models": {"detector": {"locations": np.random.rand(3, 3)}},
            "list": [np.arange(4), np.ones(2)],
            "tup": (np.zeros(3),),
        }
        path = str(tmp_path / "ckpt.npz")
        saver.save_checkpoint(path, tree)
        loaded = saver.load_checkpoint(path)
        assert int(loaded["step"]) == 42
        np.testing.assert_array_equal(
            loaded["models"]["detector"]["locations"],
            tree["models"]["detector"]["locations"],
        )
        assert isinstance(loaded["tup"], tuple)
        np.testing.assert_array_equal(loaded["list"][0], np.arange(4))

    def test_saver_class(self, tmp_path):
        s = saver.Saver(str(tmp_path))
        s.save("step_10", step=np.asarray(10), metrics={"iou": np.asarray(0.5)})
        assert s.exists("step_10")
        loaded = s.load("step_10")
        assert float(loaded["metrics"]["iou"]) == 0.5

    def test_write_is_atomic(self, tmp_path):
        """save_checkpoint writes via tmp + os.replace (mid-frame resume
        reads the latest step_*.npz on restart, so a preemption
        mid-write must never leave a truncated checkpoint)."""
        path = str(tmp_path / "ckpt.npz")
        saver.save_checkpoint(path, {"x": np.arange(3)})
        assert os.listdir(str(tmp_path)) == ["ckpt.npz"]  # no .tmp left
        # overwrite keeps the old file valid until replaced
        saver.save_checkpoint(path, {"x": np.arange(5)})
        np.testing.assert_array_equal(
            saver.load_checkpoint(path)["x"], np.arange(5)
        )

    def test_driver_resume_skips_corrupt_checkpoint(self, tmp_path):
        """_resume_state falls back to the newest READABLE checkpoint."""
        import importlib.util
        import logging

        # spec-load the driver: inserting scripts/ into sys.path would
        # shadow the stdlib `profile` module with scripts/profile.py
        spec = importlib.util.spec_from_file_location(
            "vsrd_driver_main",
            os.path.join(os.path.dirname(__file__), "..", "scripts", "main.py"),
        )
        driver_main = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(driver_main)
        from vsrd_tpu.pipeline import optimize as opt

        s = saver.Saver(str(tmp_path))
        good = {
            "step": np.asarray(4),
            "models": {"detector": {"w": np.ones(2)},
                       "hyper_distance_field": {"h": np.ones(3)}},
            "opt_state": {"count": np.asarray(5)},
        }
        s.save("step_4", **good)
        with open(s.path("step_9.npz"), "wb") as f:
            f.write(b"truncated")  # simulated damage

        class Job:
            saver = s
            image_filename = "frame"

        cfg = opt.OptimizationConfig(num_steps=20)
        state = driver_main._resume_state(
            Job(), cfg, logging.getLogger("test")
        )
        assert state is not None
        params, opt_state, start = state
        assert start == 5
        np.testing.assert_array_equal(params["boxes"]["w"], np.ones(2))
        assert int(opt_state["count"]) == 5


class TestConfigurator:
    def test_hierarchical_load(self, tmp_path):
        root = tmp_path / "configs"
        leaf = root / "drive_0"
        leaf.mkdir(parents=True)
        (root / "config.json").write_text(
            json.dumps({"a": 1, "nested": {"x": 1, "y": 2}})
        )
        (leaf / "config.json").write_text(
            json.dumps({"b": 2, "nested": {"y": 3}})
        )
        config = Configurator.load(str(leaf / "config.json"))
        assert config == {"a": 1, "b": 2, "nested": {"x": 1, "y": 3}}

    def test_gather_scatter_roundtrip(self, tmp_path):
        root = tmp_path / "configs"
        for name, extra in [("a", 1), ("b", 2)]:
            child = root / name
            child.mkdir(parents=True)
            (child / "config.json").write_text(
                json.dumps({"shared": {"k": 9}, "own": extra})
            )
        Configurator.gather(str(root))
        parent = json.loads((root / "config.json").read_text())
        assert parent == {"shared": {"k": 9}}
        child_a = json.loads((root / "a" / "config.json").read_text())
        assert child_a == {"own": 1}
        # loading a child still sees the shared key
        config = Configurator.load(str(root / "a" / "config.json"))
        assert config["shared"]["k"] == 9 and config["own"] == 1
        Configurator.scatter(str(root))
        assert not (root / "config.json").exists()
        child_a = json.loads((root / "a" / "config.json").read_text())
        assert child_a == {"shared": {"k": 9}, "own": 1}


class TestConfigureCLI:
    """The gather/scatter refactoring CLI with snapshot-restore
    (reference vsrd/configuration/configure.py:8-43)."""

    def _tree(self, tmp_path):
        root = tmp_path / "configs"
        for name, extra in [("a", 1), ("b", 2)]:
            child = root / name
            child.mkdir(parents=True)
            (child / "config.json").write_text(
                json.dumps({"shared": {"k": 9}, "own": extra})
            )
        return root

    def test_gather_via_cli(self, tmp_path):
        from vsrd_tpu.configuration import configure

        root = self._tree(tmp_path)
        assert configure.run(str(root), gather=True)
        parent = json.loads((root / "config.json").read_text())
        assert parent == {"shared": {"k": 9}}

    def test_failure_restores_tree(self, tmp_path, monkeypatch):
        from vsrd_tpu.configuration import configure

        root = self._tree(tmp_path)
        before = (root / "a" / "config.json").read_text()

        def boom(*args, **kwargs):
            raise RuntimeError("synthetic failure")

        monkeypatch.setattr(Configurator, "gather", boom)
        assert not configure.run(str(root), gather=True)
        assert (root / "a" / "config.json").read_text() == before
        assert not (root / "config.json").exists()


class TestRegistry:
    def test_instantiate_transform_chain(self):
        register_defaults()
        chain = instantiate(
            [
                {"function": "vsrd.transforms.Resizer",
                 "kwargs": {"image_size": [64, 96]}},
                {"function": "vsrd.transforms.MaskAreaFilter",
                 "kwargs": {"min_mask_area": 1}},
            ]
        )
        assert isinstance(chain[0], tf.Resizer)
        out = chain[0](_sample())
        assert out["image"].shape == (64, 96, 3)

    def test_eval_rejected(self):
        with pytest.raises(ValueError):
            instantiate("eval:__import__('os')")

    def test_ref_lookup(self):
        context = {"models": {"detector": 7}}
        assert instantiate("ref:models.detector", context) == 7


class TestNative:
    def test_rle_native_matches_numpy(self):
        from vsrd_tpu.data import native

        if native.load() is None:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(0)
        mask = (rng.random((57, 91)) > 0.6).astype(np.uint8)
        counts = native.rle_encode_native(mask)
        # independent numpy encoding
        flat = mask.astype(bool).flatten(order="F")
        changes = np.nonzero(flat[1:] != flat[:-1])[0] + 1
        runs = np.diff(np.concatenate([[0], changes, [flat.size]])).tolist()
        if flat[0]:
            runs = [0, *runs]
        assert counts == [int(c) for c in runs]
        np.testing.assert_array_equal(
            native.rle_decode_native(counts, mask.shape), mask
        )

    def test_polygon_distance_native_matches_numpy(self):
        from vsrd_tpu.data import native

        if native.load() is None:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(1)
        poly = rng.uniform(5, 40, (9, 2)).astype(np.float32)
        fast = native.polygon_distance_map_native(poly, (48, 64))
        ys, xs = np.mgrid[0:48, 0:64]
        pts = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
        sides = np.roll(poly, -1, 0) - poly
        rel = pts[:, None, :] - poly[None]
        ratio = np.clip(
            (rel * sides[None]).sum(-1)
            / ((sides * sides).sum(-1) + 1e-6)[None],
            0, 1,
        )
        nrm = rel - sides[None] * ratio[..., None]
        ref = np.linalg.norm(nrm, axis=-1).min(-1).reshape(48, 64)
        np.testing.assert_allclose(fast, ref, atol=1e-4)
