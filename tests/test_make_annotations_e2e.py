"""Raw KITTI-360 lifecycle: synthetic RAW tree (perspective.txt,
cam0_to_world.txt, 3D bbox XML in annotation corner order, 16-bit
instance PNGs) -> make_annotations -> sample_annotations -> dataset ->
short optimization -> make_predictions -> convert_predictions ->
visualize_annotations / visualize_predictions -> select_model.

This covers the riskiest parsing in the repo — the raw-format
make_annotations path (reference tools/kitti_360/
make_annotations.py:18-164), including the annotation->evaluation
corner reorder [0, 2, 7, 5, 1, 3, 6, 4] (reference :74), pose
inversion (:46-48), and stereo-baseline shift for image_01 (:28-34).
"""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from vsrd_tpu.data import rle

cv2 = pytest.importorskip("cv2")

SEQUENCE = "2013_05_28_drive_0000_sync"
H, W = 48, 64
FX = 60.0
BASELINE_X = -0.6  # meters, image_01 offset
EVAL_ORDER = [0, 2, 7, 5, 1, 3, 6, 4]

K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1]])
CENTERS = np.array([[-1.5, 0.5, 9.0], [1.8, 0.5, 12.0]], np.float64)
HALF = np.array([0.9, 0.8, 2.2])
# canonical (evaluation-order) unit corners, matching
# box_parameters.UNIT_BOX_CORNERS
EVAL_UNIT = np.array(
    [
        [-1, -1, +1], [+1, -1, +1], [+1, -1, -1], [-1, -1, -1],
        [-1, +1, +1], [+1, +1, +1], [+1, +1, -1], [-1, +1, -1],
    ],
    np.float64,
)
NUM_FRAMES = 6


def _world_eval_corners(center):
    return EVAL_UNIT * HALF + center


def _make_raw_tree(root):
    """Emit the raw KITTI-360 artifacts make_annotations consumes."""
    calib_dir = os.path.join(root, "calibration")
    os.makedirs(calib_dir, exist_ok=True)
    p00 = np.hstack([K, np.zeros((3, 1))])
    p01 = np.hstack([K, np.array([[BASELINE_X * FX], [0.0], [0.0]])])
    with open(os.path.join(calib_dir, "perspective.txt"), "w") as file:
        file.write("P_rect_00: " + " ".join(map(str, p00.reshape(-1))) + "\n")
        file.write("R_rect_01: " + " ".join(map(str, np.eye(3).reshape(-1))) + "\n")
        file.write("P_rect_01: " + " ".join(map(str, p01.reshape(-1))) + "\n")

    pose_dir = os.path.join(root, "data_poses", SEQUENCE)
    os.makedirs(pose_dir, exist_ok=True)
    with open(os.path.join(pose_dir, "cam0_to_world.txt"), "w") as file:
        for frame_index in range(NUM_FRAMES):
            cam_to_world = np.eye(4)
            cam_to_world[2, 3] = frame_index * 0.5
            file.write(
                f"{frame_index} " + " ".join(map(str, cam_to_world.reshape(-1))) + "\n"
            )

    # 3D bbox XML: vertices in ANNOTATION order in the OBJECT frame, a
    # transform to world, static timestamp -1 (the fallback path)
    import xml.etree.ElementTree as ET

    root_el = ET.Element("opencv_storage")
    for instance, center in enumerate(CENTERS):
        obj = ET.SubElement(root_el, f"object_{instance}")
        ET.SubElement(obj, "semanticId").text = "13"  # kittiId for car
        ET.SubElement(obj, "instanceId").text = str(instance)
        ET.SubElement(obj, "timestamp").text = "-1"
        transform = np.eye(4)
        transform[:3, 3] = center
        tr = ET.SubElement(obj, "transform")
        ET.SubElement(tr, "data").text = " ".join(map(str, transform.reshape(-1)))
        # invert the reorder: annotation_vertices[EVAL_ORDER] == eval corners
        ann = np.empty((8, 3))
        ann[EVAL_ORDER] = EVAL_UNIT * HALF
        vx = ET.SubElement(obj, "vertices")
        ET.SubElement(vx, "data").text = " ".join(map(str, ann.reshape(-1)))
    bbox_dir = os.path.join(root, "data_3d_bboxes", "train")
    os.makedirs(bbox_dir, exist_ok=True)
    ET.ElementTree(root_el).write(os.path.join(bbox_dir, f"{SEQUENCE}.xml"))

    image_dir = os.path.join(root, "data_2d_raw", SEQUENCE, "image_00", "data_rect")
    instance_dir = os.path.join(
        root, "data_2d_semantics", "train", SEQUENCE, "image_00", "instance"
    )
    os.makedirs(image_dir, exist_ok=True)
    os.makedirs(instance_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for frame_index in range(NUM_FRAMES):
        cam_z = frame_index * 0.5
        image = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        instance_map = np.zeros((H, W), np.uint16)
        for instance, center in enumerate(CENTERS):
            cam = _world_eval_corners(center) - np.array([0.0, 0.0, cam_z])
            pix = cam @ K.T
            pix = pix[:, :2] / pix[:, 2:]
            hull = cv2.convexHull(pix.astype(np.int32))
            cv2.fillConvexPoly(instance_map, hull, 26 * 1000 + instance)
        cv2.imwrite(os.path.join(image_dir, f"{frame_index:010}.png"), image)
        cv2.imwrite(
            os.path.join(instance_dir, f"{frame_index:010}.png"), instance_map
        )
    return root


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    return _make_raw_tree(str(tmp_path_factory.mktemp("kitti360raw")))


def _run_tool(path_parts, *args):
    tool = os.path.join(os.path.dirname(__file__), "..", "tools", *path_parts)
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


@pytest.fixture(scope="module")
def annotations(raw_root):
    _run_tool(
        ("kitti_360", "make_annotations.py"),
        "--root_dirname", raw_root,
        "--num_workers", "1",
    )
    files = sorted(
        glob.glob(
            os.path.join(raw_root, "annotations", SEQUENCE, "**", "*.json"),
            recursive=True,
        )
    )
    assert len(files) == NUM_FRAMES
    return files


def test_annotation_intrinsics_and_pose(annotations, raw_root):
    with open(annotations[2]) as file:  # frame 2, cam_z = 1.0
        annotation = json.load(file)
    np.testing.assert_allclose(annotation["intrinsic_matrix"], K, atol=1e-9)
    expected = np.eye(4)
    expected[2, 3] = -1.0  # inv(cam0_to_world)
    np.testing.assert_allclose(
        annotation["extrinsic_matrix"], expected, atol=1e-9
    )


def test_annotation_masks_roundtrip(annotations):
    with open(annotations[0]) as file:
        annotation = json.load(file)
    masks = annotation["masks"]["car"]
    assert set(masks) == {"26000", "26001"}
    for instance_id, encoded in masks.items():
        mask = rle.decode(encoded)
        assert mask.shape == (H, W)
        assert mask.sum() >= 8


def test_annotation_corner_reorder(annotations):
    """The riskiest conversion: XML annotation-order vertices + object
    transform must come out as evaluation-order camera-space corners
    (reference make_annotations.py:74,129-130)."""
    with open(annotations[3]) as file:  # frame 3, cam_z = 1.5
        annotation = json.load(file)
    for instance, center in enumerate(CENTERS):
        got = np.asarray(annotation["boxes_3d"]["car"][str(26000 + instance)])
        expected = _world_eval_corners(center) - np.array([0.0, 0.0, 1.5])
        np.testing.assert_allclose(got, expected, atol=1e-9)


@pytest.mark.slow
def test_full_lifecycle_from_raw(annotations, raw_root):
    """make_annotations output feeds the whole pseudo-label pipeline."""
    import jax

    from vsrd_tpu.data.kitti360 import KITTI360Dataset, align_to_target
    from vsrd_tpu.data.transforms import (
        BoxGenerator, BoxSizeFilter, MaskAreaFilter, MaskRefiner,
        Resizer, SoftRasterizer,
    )
    from vsrd_tpu.pipeline import frame as frame_mod
    from vsrd_tpu.pipeline import optimize as opt
    from vsrd_tpu.utils.saver import Saver

    _run_tool(
        ("kitti_360", "sample_annotations.py"),
        "--root_dirname", raw_root,
        "--num_source_frames", "2",
        "--min_mask_area", "8",
        "--min_box_size", "2",
        "--num_workers", "1",
    )
    sampled = os.path.join(
        raw_root, "filenames", "R50-N2-M8-B2", SEQUENCE,
        "sampled_image_filenames.txt",
    )
    assert os.path.exists(sampled)

    chain = [
        Resizer((H, W)), MaskAreaFilter(1), MaskRefiner(), MaskAreaFilter(8),
        BoxGenerator(), BoxSizeFilter(2), SoftRasterizer(),
    ]
    dataset = KITTI360Dataset(
        filenames=[sampled], num_source_frames=2, num_workers=1,
        target_transforms=chain, source_transforms=chain,
    )
    assert len(dataset) >= 1
    samples = dataset[0]
    target = samples[0]
    assert len(target["instance_ids"]) == 2

    kwargs = align_to_target(samples, max_instances=3)
    frame = frame_mod.build_frame_data(None, **kwargs)
    cfg = opt.OptimizationConfig(
        num_steps=10, warmup_steps=5, num_rays=32, num_samples=8,
        checkpoint_interval=10,
    )
    params, scalars = opt.optimize_frame(frame, jax.random.PRNGKey(0), cfg)
    assert np.isfinite(scalars["loss"]).all()

    image_dirname = os.path.splitext(
        os.path.relpath(target["filename"], raw_root)
    )[0]
    ckpt_dirname = os.path.join(raw_root, "ckpts", "vsrd")
    saver = Saver(os.path.join(ckpt_dirname, SEQUENCE, image_dirname))
    saver.save(
        "step_9",
        step=np.asarray(9),
        models={
            "detector": jax.device_get(params["boxes"]),
            "hyper_distance_field": jax.device_get(params["hyper"]),
        },
        metrics={"iou_3d": np.asarray(float(scalars["iou_3d"][-1]))},
        valid=np.asarray(frame.valid),
    )

    _run_tool(
        ("kitti_360", "make_predictions.py"),
        "--root_dirname", raw_root,
        "--ckpt_dirname", ckpt_dirname,
        "--ckpt_filename", "step_9.npz",
        "--split_dirname", "R50-N2-M8-B2",
        "--num_workers", "1",
    )
    predictions = glob.glob(
        os.path.join(raw_root, "predictions", "vsrd", SEQUENCE, "**", "*.json"),
        recursive=True,
    )
    assert predictions

    _run_tool(
        ("kitti_360", "convert_predictions.py"),
        "--root_dirname", raw_root,
        "--ckpt_dirname", ckpt_dirname,
        "--num_workers", "1",
    )
    labels = glob.glob(
        os.path.join(raw_root, "labels", "vsrd", "**", "*.txt"), recursive=True
    )
    assert labels

    # visualizers: must run and write frames (reference README.md:72-79,
    # :168-176 — the visual check IS the data-prep QA story)
    out_annotations = os.path.join(raw_root, "vis_annotations")
    _run_tool(
        ("kitti_360", "visualize_annotations.py"),
        "--root_dirname", raw_root,
        "--out_dirname", out_annotations,
        "--fps", "2",
    )
    assert glob.glob(os.path.join(out_annotations, "**", "*.png"), recursive=True)

    out_predictions = os.path.join(raw_root, "vis_predictions")
    _run_tool(
        ("kitti_360", "visualize_predictions.py"),
        "--root_dirname", raw_root,
        "--ckpt_dirname", ckpt_dirname,
        "--out_dirname", out_predictions,
        "--fps", "2",
    )
    assert glob.glob(os.path.join(out_predictions, "**", "*.png"), recursive=True)

    result = _run_tool(
        ("select_model.py",),
        "--ckpt_dirname", ckpt_dirname,
        "--metric", "iou_3d",
    )
    model_files = glob.glob(
        os.path.join(ckpt_dirname, "**", "model.npz"), recursive=True
    )
    assert model_files, result.stdout[-500:]
