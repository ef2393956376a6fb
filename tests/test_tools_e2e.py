"""End-to-end data lifecycle: synthetic KITTI-360 tree -> frame sampling ->
dataset loading -> (short) optimization -> pseudo-label JSON ->
KITTI txt. Validates the output contracts of every tool against the
reference schemas (SURVEY.md section 3.4)."""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from vsrd_tpu.data import rle
from vsrd_tpu.data.kitti360 import KITTI360Dataset, align_to_target
from vsrd_tpu.pipeline import frame as frame_mod
from vsrd_tpu.pipeline import optimize as opt
from vsrd_tpu.utils.saver import Saver

try:
    import cv2
except ImportError:
    cv2 = None

SEQUENCE = "2013_05_28_drive_0000_sync"
H, W = 48, 64


def _make_synthetic_kitti360(root, num_frames=6, num_instances=2):
    """Synthetic drive: camera moving along +z, two static boxes ahead."""
    rng = np.random.default_rng(0)
    k = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    image_dir = os.path.join(root, "data_2d_raw", SEQUENCE, "image_00", "data_rect")
    os.makedirs(image_dir, exist_ok=True)

    centers = np.array([[-1.5, 0.5, 9.0], [1.8, 0.5, 12.0]], np.float64)
    half = np.array([0.9, 0.8, 2.2])
    corners_unit = np.array(
        [
            [-1, -1, +1], [+1, -1, +1], [+1, -1, -1], [-1, -1, -1],
            [-1, +1, +1], [+1, +1, +1], [+1, +1, -1], [-1, +1, -1],
        ],
        np.float64,
    )

    for frame_index in range(num_frames):
        cam_z = frame_index * 0.5
        extrinsic = np.eye(4)
        extrinsic[2, 3] = -cam_z  # world -> camera

        annotation = {
            "intrinsic_matrix": k.tolist(),
            "extrinsic_matrix": extrinsic.tolist(),
            "masks": {"car": {}},
            "boxes_3d": {"car": {}},
        }

        image = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        for instance, center in enumerate(centers):
            instance_id = str(26000 + instance)
            corners_world = corners_unit * half + center
            cam_corners = corners_world - np.array([0.0, 0.0, cam_z])

            # analytic mask: project corners, fill the convex hull
            pix = cam_corners @ k.T
            pix = pix[:, :2] / pix[:, 2:]
            mask = np.zeros((H, W), np.uint8)
            hull = cv2.convexHull(pix.astype(np.int32))
            cv2.fillConvexPoly(mask, hull, 1)
            if mask.sum() < 8:
                continue
            annotation["masks"]["car"][instance_id] = rle.encode(mask)
            annotation["boxes_3d"]["car"][instance_id] = cam_corners.tolist()

        image_filename = os.path.join(image_dir, f"{frame_index:010}.png")
        cv2.imwrite(image_filename, image)
        annotation_filename = image_filename.replace(
            "data_2d_raw", "annotations"
        ).replace(".png", ".json")
        os.makedirs(os.path.dirname(annotation_filename), exist_ok=True)
        with open(annotation_filename, "w") as file:
            json.dump(annotation, file)

    return root


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti360"))
    return _make_synthetic_kitti360(root)


def _run_tool(name, *args):
    tool = os.path.join(
        os.path.dirname(__file__), "..", "tools", "kitti_360", name
    )
    # PALLAS_AXON_POOL_IPS="" bypasses the TPU plugin sitecustomize,
    # which otherwise overrides JAX_PLATFORMS and attaches the tool
    # subprocess to the (possibly busy) tunneled chip
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    result = subprocess.run(
        [sys.executable, tool, *args],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    return result


def test_sample_annotations_tool(kitti_root):
    _run_tool(
        "sample_annotations.py",
        "--root_dirname", kitti_root,
        "--num_source_frames", "2",
        "--min_mask_area", "8",
        "--min_box_size", "2",
        "--num_workers", "1",
    )
    split = os.path.join(kitti_root, "filenames", "R50-N2-M8-B2", SEQUENCE)
    sampled = os.path.join(split, "sampled_image_filenames.txt")
    grouped = os.path.join(split, "grouped_image_filenames.txt")
    assert os.path.exists(sampled) and os.path.exists(grouped)
    lines = open(sampled).read().strip().splitlines()
    assert len(lines) >= 1
    ids, target, rels = lines[0].split(" ")
    assert os.path.exists(target)
    assert len(rels.split(",")) >= 2


@pytest.mark.slow
def test_dataset_and_optimization_and_predictions(kitti_root):
    split = os.path.join(kitti_root, "filenames", "R50-N2-M8-B2", SEQUENCE)
    sampled = os.path.join(split, "sampled_image_filenames.txt")
    if not os.path.exists(sampled):
        test_sample_annotations_tool(kitti_root)

    from vsrd_tpu.data.transforms import (
        BoxGenerator, BoxSizeFilter, MaskAreaFilter, MaskRefiner,
        Resizer, SoftRasterizer,
    )

    chain = [
        Resizer((H, W)),
        MaskAreaFilter(1),
        MaskRefiner(),
        MaskAreaFilter(8),
        BoxGenerator(),
        BoxSizeFilter(2),
        SoftRasterizer(),
    ]
    dataset = KITTI360Dataset(
        filenames=[sampled],
        num_source_frames=2,
        num_workers=1,
        target_transforms=chain,
        source_transforms=chain,
    )
    assert len(dataset) >= 1
    samples = dataset[0]
    assert 0 in samples
    target = samples[0]
    assert len(target["instance_ids"]) == 2
    # rectified target extrinsics ~ identity
    np.testing.assert_allclose(
        target["extrinsic_matrix"], np.eye(4), atol=1e-5
    )

    kwargs = align_to_target(samples, max_instances=3)
    frame = frame_mod.build_frame_data(None, **kwargs)
    assert frame.valid.sum() == 2

    cfg = opt.OptimizationConfig(
        num_steps=20, warmup_steps=10, num_rays=64, num_samples=8,
        checkpoint_interval=20,
    )
    params, scalars = opt.optimize_frame(frame, jax.random.PRNGKey(0), cfg)
    assert np.isfinite(scalars["loss"]).all()

    # write the checkpoint where make_predictions expects it
    target_filename = target["filename"]
    image_dirname = os.path.splitext(
        os.path.relpath(target_filename, kitti_root)
    )[0]
    ckpt_dirname = os.path.join(kitti_root, "ckpts", "vsrd")
    saver = Saver(os.path.join(ckpt_dirname, SEQUENCE, image_dirname))
    saver.save(
        "step_19",
        step=np.asarray(19),
        models={
            "detector": jax.device_get(params["boxes"]),
            "hyper_distance_field": jax.device_get(params["hyper"]),
        },
        metrics={"iou_3d": np.asarray(float(scalars["iou_3d"][-1]))},
        valid=np.asarray(frame.valid),
    )

    _run_tool(
        "make_predictions.py",
        "--root_dirname", kitti_root,
        "--ckpt_dirname", ckpt_dirname,
        "--ckpt_filename", "step_19.npz",
        "--split_dirname", "R50-N2-M8-B2",
        "--num_workers", "1",
    )
    prediction_files = glob.glob(
        os.path.join(kitti_root, "predictions", "vsrd", SEQUENCE, "**", "*.json"),
        recursive=True,
    )
    assert prediction_files, "no prediction JSONs written"
    with open(prediction_files[0]) as file:
        prediction = json.load(file)
    # drop-in-compatible schema (reference make_predictions.py:164-174)
    assert set(prediction) == {"boxes_3d", "boxes_2d", "confidences"}
    n = len(prediction["boxes_3d"]["car"])
    assert np.asarray(prediction["boxes_3d"]["car"]).shape == (n, 8, 3)
    assert np.asarray(prediction["boxes_2d"]["car"]).shape == (n, 2, 2)
    assert len(prediction["confidences"]["car"]) == n

    _run_tool(
        "convert_predictions.py",
        "--root_dirname", kitti_root,
        "--ckpt_dirname", ckpt_dirname,
        "--num_workers", "1",
    )
    label_files = glob.glob(
        os.path.join(kitti_root, "labels", "vsrd", "**", "*.txt"),
        recursive=True,
    )
    assert label_files, "no KITTI label txts written"
    line = open(label_files[0]).read().strip().splitlines()[0].split(" ")
    # type trunc occ alpha bbox(4) dims(3) loc(3) ry score = 16 fields
    assert len(line) == 16
    assert line[0] == "Car"
    floats = list(map(float, line[1:]))
    assert all(np.isfinite(floats))


@pytest.mark.slow
def test_train_detector_on_pseudo_labels(tmp_path):
    """scripts/train_detector.py: pseudo-label JSONs + images -> a few
    DETR3D DP training steps -> checkpoint (the downstream leg of the
    reference workflow, README.md:122-186, closed inside the framework)."""
    root = str(tmp_path / "kitti")
    _make_synthetic_kitti360(root)
    # hand-written pseudo-labels for each frame (camera-space corners +
    # pixel 2D boxes), mirroring make_predictions.py's output schema
    ann_dir = os.path.join(root, "annotations", SEQUENCE, "image_00", "data_rect")
    pred_dir = os.path.join(
        root, "predictions", "vsrd", SEQUENCE, "image_00", "data_rect"
    )
    os.makedirs(pred_dir, exist_ok=True)
    for ann_path in sorted(glob.glob(os.path.join(ann_dir, "*.json"))):
        with open(ann_path) as f:
            ann = json.load(f)
        k = np.asarray(ann["intrinsic_matrix"])
        boxes_3d, boxes_2d, confs = [], [], []
        for corners in ann["boxes_3d"]["car"].values():
            corners = np.asarray(corners)
            pix = corners @ k.T
            pix = pix[:, :2] / pix[:, 2:]
            boxes_3d.append(corners.tolist())
            boxes_2d.append(
                [[*pix.min(axis=0)], [*pix.max(axis=0)]]
            )
            confs.append(0.9)
        with open(os.path.join(pred_dir, os.path.basename(ann_path)), "w") as f:
            json.dump(
                {"boxes_3d": {"car": boxes_3d},
                 "boxes_2d": {"car": boxes_2d},
                 "confidences": {"car": confs}},
                f,
            )

    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "train_detector.py"
    )
    out_dir = str(tmp_path / "detr_ckpt")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    result = subprocess.run(
        [sys.executable, script,
         "--root_dirname", root, "--ckpt_dirname", "ckpts/vsrd",
         "--out_dirname", out_dir, "--num_steps", "3",
         "--batch_size", "2", "--height", "48", "--width", "64",
         "--max_boxes", "4", "--num_queries", "8", "--hidden_dim", "32",
         "--num_encoder_layers", "1", "--num_decoder_layers", "1",
         "--num_heads", "4", "--log_intervals", "1"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert "loss=" in result.stdout
    losses = [
        float(part.split("=")[1])
        for line in result.stdout.splitlines()
        for part in line.split()
        if part.startswith("loss=")
    ]
    assert losses and all(np.isfinite(losses))
    assert os.path.exists(os.path.join(out_dir, "step_2.npz"))


def test_train_detector_load_example_clips_boxes(tmp_path):
    """Pseudo-label 2D boxes extending past the image (front-clipped
    projections of truncated cars) are clipped to the image before
    normalization — the sigmoid 2D head's targets must live in [0,1]."""
    import importlib.util

    # spec-load the CLI module: inserting scripts/ into sys.path would
    # shadow the stdlib `profile` module with scripts/profile.py
    spec = importlib.util.spec_from_file_location(
        "vsrd_train_detector",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "train_detector.py"),
    )
    td = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(td)
    from PIL import Image

    img = tmp_path / "0000000000.png"
    Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(img)
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({
        "intrinsic_matrix": [[50.0, 0, 30], [0, 50.0, 20], [0, 0, 1]],
    }))
    pred = tmp_path / "pred.json"
    pred.write_text(json.dumps({
        "boxes_3d": {"car": [np.random.default_rng(0).normal(
            size=(8, 3)).tolist()]},
        "boxes_2d": {"car": [[[-15.0, -4.0], [75.0, 44.0]]]},
        "confidences": {"car": [0.9]},
    }))
    example = td.load_example(
        (str(img), str(pred), str(ann)), (20, 30), 4, ["car"], 0.5
    )
    assert example["images"].shape == (20, 30, 3)
    assert example["valid"].tolist() == [True, False, False, False]
    np.testing.assert_allclose(
        example["boxes_2d"][0], [0.0, 0.0, 1.0, 1.0], atol=1e-6
    )
    # K rescaled to the training resolution
    np.testing.assert_allclose(example["intrinsics"][0, 0], 50.0 * 30 / 60)
    # below-threshold predictions are dropped
    low = json.loads(pred.read_text())
    low["confidences"]["car"] = [0.1]
    pred.write_text(json.dumps(low))
    example = td.load_example(
        (str(img), str(pred), str(ann)), (20, 30), 4, ["car"], 0.5
    )
    assert example["valid"].sum() == 0


@pytest.mark.slow
def test_full_lifecycle_feeds_detector_with_kitti_eval(tmp_path):
    """The complete pseudo-label lifecycle, every stage the framework's
    own: sample_annotations -> scripts/main.py --train (per-frame VSRD
    optimization) -> make_predictions (group-averaged confidences) ->
    train_detector on THOSE JSONs with the KITTI AP|R40 eval enabled.
    The round-4 detector tests scored directly synthesized boxes; here
    the training targets come out of the real optimization + prediction
    tools (reference workflow README.md:40-186 end to end)."""
    root = str(tmp_path / "kitti")
    _make_synthetic_kitti360(root)
    _run_tool(
        "sample_annotations.py",
        "--root_dirname", root,
        "--num_source_frames", "2",
        "--min_mask_area", "8",
        "--min_box_size", "2",
        "--num_workers", "1",
    )
    sampled = os.path.join(
        root, "filenames", "R50-N2-M8-B2", SEQUENCE,
        "sampled_image_filenames.txt",
    )
    assert os.path.exists(sampled)

    config = {
        "filenames": [sampled],
        "num_source_frames": 2,
        "optimization": {"num_steps": 20, "warmup_steps": 10},
        "volume_rendering": {"num_rays": 64, "num_fine_samples": 8},
        "logging": {
            "ckpt_intervals": 20, "scalar_intervals": 10,
            "image_intervals": 10000,
        },
    }
    # per-drive config tree (the reference convention: config.json under
    # configs/<name>/<sequence>/, so ckpts land at ckpts/<name>/<seq>/...
    # where make_predictions expects them, reference main.py:126-134 +
    # make_predictions.py:55)
    config_dir = os.path.join(root, "configs", "vsrd_lc", SEQUENCE)
    os.makedirs(config_dir)
    config_path = os.path.join(config_dir, "config.json")
    with open(config_path, "w") as f:
        json.dump(config, f)
    driver = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "main.py"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    result = subprocess.run(
        [sys.executable, driver, "--config", config_path, "--train"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]

    ckpt_dirname = os.path.join(root, "ckpts", "vsrd_lc")
    _run_tool(
        "make_predictions.py",
        "--root_dirname", root,
        "--ckpt_dirname", ckpt_dirname,
        "--ckpt_filename", "step_19.npz",
        "--split_dirname", "R50-N2-M8-B2",
        "--num_workers", "1",
    )
    n_preds = len(glob.glob(
        os.path.join(root, "predictions", "vsrd_lc", "**", "*.json"),
        recursive=True,
    ))
    assert n_preds >= 1

    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "train_detector.py"
    )
    out_dir = str(tmp_path / "detr_ckpt")
    result = subprocess.run(
        [sys.executable, script,
         "--root_dirname", root, "--ckpt_dirname", "ckpts/vsrd_lc",
         "--out_dirname", out_dir, "--num_steps", "4",
         "--batch_size", "2", "--height", "48", "--width", "64",
         "--max_boxes", "4", "--num_queries", "8", "--hidden_dim", "32",
         "--num_encoder_layers", "1", "--num_decoder_layers", "1",
         "--num_heads", "4", "--log_intervals", "1",
         "--eval_intervals", "4", "--holdout_fraction", "0",
         "--confidence_threshold", "0.0"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    # the KITTI-convention eval ran and reported R40 + difficulty bins
    eval_lines = [
        line for line in result.stdout.splitlines()
        if line.startswith("eval step")
    ]
    assert eval_lines, result.stdout[-2000:]
    for key in ("ap_r40_0.25", "ap_r40_0.5_easy", "ap_r40_0.5_moderate",
                "ap_r40_0.5_hard"):
        assert key in eval_lines[-1] or f"{key}=nan" in eval_lines[-1], (
            key, eval_lines[-1]
        )
    assert os.path.exists(os.path.join(out_dir, "step_3.npz"))
