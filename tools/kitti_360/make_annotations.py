"""KITTI-360 raw data -> per-frame annotation JSONs.

Re-design of `/root/reference/tools/kitti_360/make_annotations.py:18-164`
without the pycocotools / kitti360scripts dependencies: parses
`calibration/perspective.txt` intrinsics + stereo baseline,
`data_poses/<seq>/cam0_to_world.txt` poses, the 3D bbox XML (converted to
the KITTI-360 "evaluation" corner order), and the instance PNGs into
per-instance COCO-RLE masks + camera-space boxes. Output schema matches
the reference byte-for-byte in structure:

    {"intrinsic_matrix": 3x3, "extrinsic_matrix": 4x4,
     "masks": {class: {instance_id: RLE}},
     "boxes_3d": {class: {instance_id: 8x3}}}
"""

import argparse
import collections
import functools
import glob
import json
import multiprocessing
import os
import sys
import xml.etree.ElementTree

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from vsrd_tpu.data import rle  # noqa: E402

try:
    import cv2
except ImportError:
    cv2 = None

# KITTI-360 semantic label table (subset; cityscapes-compatible ids).
# kittiId is the id used inside the 3D bbox XML; id*1000+instance is the
# instance-map encoding. Override with --label_map for other classes.
DEFAULT_LABELS = {
    # name: (id, kittiId)
    "building": (11, 11),
    "person": (24, 19),
    "rider": (25, 20),
    "car": (26, 13),
    "truck": (27, 14),
    "bus": (28, 34),
    "caravan": (29, 16),
    "trailer": (30, 15),
    "train": (31, 33),
    "motorcycle": (32, 17),
    "bicycle": (33, 18),
}

# corner reorder: KITTI-360 "annotation" -> "evaluation" format
EVAL_CORNER_ORDER = [0, 2, 7, 5, 1, 3, 6, 4]


def load_labels(label_map_path=None):
    labels = dict(DEFAULT_LABELS)
    if label_map_path:
        with open(label_map_path) as file:
            labels.update({k: tuple(v) for k, v in json.load(file).items()})
    id_to_name = {v[0]: k for k, v in labels.items()}
    kitti_to_id = {v[1]: v[0] for k, v in labels.items()}
    return id_to_name, kitti_to_id


def make_annotations(sequence, root_dirname, label_map=None):
    id_to_name, kitti_to_id = load_labels(label_map)

    # intrinsics + stereo baseline (reference make_annotations.py:23-34)
    intrinsic_filename = os.path.join(root_dirname, "calibration", "perspective.txt")
    intrinsic_matrix = None
    translation_matrix = np.eye(4)
    with open(intrinsic_filename) as file:
        for line in file:
            name, *values = line.split()
            if name == "P_rect_01:":
                projection = np.array(list(map(float, values))).reshape(3, 4)
                intrinsic_matrix = projection[:, :3]
                baseline = projection[:, 3] / np.diag(intrinsic_matrix)
                translation_matrix[:3, 3] = baseline
                break
    assert intrinsic_matrix is not None, "P_rect_01 not found"

    # camera poses -> world->camera extrinsics
    extrinsic_filename = os.path.join(
        root_dirname, "data_poses", sequence, "cam0_to_world.txt"
    )
    extrinsic_matrices = {}
    with open(extrinsic_filename) as file:
        for line in file:
            frame_index, *values = line.split()
            cam_to_world = np.array(list(map(float, values))).reshape(4, 4)
            extrinsic_matrices[int(frame_index)] = np.linalg.inv(cam_to_world)

    # 3D bounding boxes (world-frame 8 corners in evaluation order)
    box_filename = os.path.join(
        root_dirname, "data_3d_bboxes", "train", f"{sequence}.xml"
    )
    world_boxes = collections.defaultdict(dict)
    if os.path.exists(box_filename):
        tree = xml.etree.ElementTree.parse(box_filename)
        for child in tree.getroot():
            kitti_semantic_id = int(child.find("semanticId").text)
            class_instance_id = int(child.find("instanceId").text)
            semantic_id = kitti_to_id.get(kitti_semantic_id)
            if semantic_id is None:
                continue
            instance_id = semantic_id * 1000 + class_instance_id

            transform = np.array(
                list(map(float, child.find("transform").find("data").text.split()))
            ).reshape(4, 4)
            vertices = np.array(
                list(map(float, child.find("vertices").find("data").text.split()))
            ).reshape(-1, 3)[:8]
            vertices = vertices[EVAL_CORNER_ORDER]
            vertices_h = np.pad(vertices, ((0, 0), (0, 1)), constant_values=1.0)
            world_box = vertices_h @ transform.T

            frame_index = int(child.find("timestamp").text)
            world_boxes[frame_index][instance_id] = world_box

    image_filenames = sorted(
        glob.glob(
            os.path.join(root_dirname, "data_2d_raw", sequence, "**", "*.png"),
            recursive=True,
        )
    )

    for image_filename in image_filenames:
        frame_index = int(os.path.splitext(os.path.basename(image_filename))[0])
        instance_filename = image_filename.replace(
            "data_2d_raw", "data_2d_semantics/train"
        ).replace("data_rect", "instance")
        if frame_index not in extrinsic_matrices:
            continue
        if not os.path.exists(instance_filename):
            continue

        extrinsic_matrix = extrinsic_matrices[frame_index]
        if "image_01" in image_filename:
            extrinsic_matrix = translation_matrix @ extrinsic_matrix

        annotation = {
            "intrinsic_matrix": intrinsic_matrix.tolist(),
            "extrinsic_matrix": extrinsic_matrix.tolist(),
            "masks": collections.defaultdict(dict),
            "boxes_3d": collections.defaultdict(dict),
        }

        instance_map = cv2.imread(instance_filename, cv2.IMREAD_ANYDEPTH)
        for instance_id in np.unique(instance_map).tolist():
            semantic_id = instance_id // 1000
            class_name = id_to_name.get(semantic_id)
            if class_name is None:
                continue
            mask = (instance_map == instance_id).astype(np.uint8)
            annotation["masks"][class_name][str(instance_id)] = rle.encode(mask)
            annotation["boxes_3d"].setdefault(class_name, {})

            box = world_boxes.get(frame_index, {}).get(
                instance_id, world_boxes.get(-1, {}).get(instance_id)
            )
            if box is None:
                continue
            cam_box = box @ extrinsic_matrix.T
            cam_box = cam_box[:, :3] / cam_box[:, 3:]
            annotation["boxes_3d"][class_name][str(instance_id)] = cam_box.tolist()

        annotation_filename = image_filename.replace(
            "data_2d_raw", "annotations"
        ).replace(".png", ".json")
        os.makedirs(os.path.dirname(annotation_filename), exist_ok=True)
        with open(annotation_filename, "w") as file:
            json.dump(
                {
                    "intrinsic_matrix": annotation["intrinsic_matrix"],
                    "extrinsic_matrix": annotation["extrinsic_matrix"],
                    "masks": {k: dict(v) for k, v in annotation["masks"].items()},
                    "boxes_3d": {k: dict(v) for k, v in annotation["boxes_3d"].items()},
                },
                file,
                indent=4,
            )


def main(args):
    sequences = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(args.root_dirname, "data_2d_raw", "*"))
    )
    worker = functools.partial(
        make_annotations, root_dirname=args.root_dirname, label_map=args.label_map
    )
    if args.num_workers > 1:
        with multiprocessing.Pool(args.num_workers) as pool:
            for index, _ in enumerate(pool.imap_unordered(worker, sequences)):
                print(f"[{index + 1}/{len(sequences)}] done")
    else:
        for index, sequence in enumerate(sequences):
            worker(sequence)
            print(f"[{index + 1}/{len(sequences)}] {sequence} done")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="vsrd_tpu: Annotation Maker for KITTI-360"
    )
    parser.add_argument("--root_dirname", type=str, default="datasets/KITTI-360")
    parser.add_argument("--num_workers", type=int, default=9)
    parser.add_argument("--label_map", type=str, default=None,
                        help="JSON {name: [id, kittiId]} overriding defaults")
    main(parser.parse_args())
