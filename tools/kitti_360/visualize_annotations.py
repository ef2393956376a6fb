"""Render per-sequence annotation visualizations (PNGs + mp4).

Re-design of `/root/reference/tools/kitti_360/visualize_annotations.py`:
masks alpha-blended + 3D wireframes drawn with this framework's drawers.
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from vsrd_tpu.data import rle  # noqa: E402
from vsrd_tpu.visualization import drawers  # noqa: E402

try:
    import cv2
except ImportError:
    cv2 = None


def visualize_sequence(sequence, root_dirname, out_dirname, class_names, fps):
    image_filenames = sorted(
        glob.glob(
            os.path.join(
                root_dirname, "data_2d_raw", sequence, "image_00", "data_rect", "*.png"
            )
        )
    )
    writer = None
    for image_filename in image_filenames:
        annotation_filename = image_filename.replace(
            "data_2d_raw", "annotations"
        ).replace(".png", ".json")
        if not os.path.exists(annotation_filename):
            continue
        image = cv2.imread(image_filename)[..., ::-1].astype(np.float32) / 255.0
        with open(annotation_filename) as file:
            annotation = json.load(file)

        masks, boxes_3d = [], []
        for class_name, class_masks in annotation["masks"].items():
            if class_name not in class_names:
                continue
            class_boxes = annotation.get("boxes_3d", {}).get(class_name, {})
            for instance_id, mask_rle in class_masks.items():
                masks.append(rle.decode(mask_rle).astype(np.float32))
                if instance_id in class_boxes:
                    boxes_3d.append(np.asarray(class_boxes[instance_id]))

        if masks:
            image = drawers.draw_masks(image, np.stack(masks))
        if boxes_3d:
            image = drawers.draw_boxes_3d(
                image,
                np.stack(boxes_3d),
                np.asarray(annotation["intrinsic_matrix"]),
                line_indices=drawers.LINE_INDICES + [[0, 5], [1, 4]],
            )

        frame = (np.clip(image, 0, 1) * 255).astype(np.uint8)[..., ::-1]
        out_png = os.path.join(
            out_dirname, sequence,
            os.path.basename(image_filename),
        )
        os.makedirs(os.path.dirname(out_png), exist_ok=True)
        cv2.imwrite(out_png, frame)

        if writer is None:
            h, w = frame.shape[:2]
            writer = cv2.VideoWriter(
                os.path.join(out_dirname, f"{sequence}.mp4"),
                cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h),
            )
        writer.write(frame)
    if writer is not None:
        writer.release()


def main(args):
    sequences = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(args.root_dirname, "data_2d_raw", "*"))
    )
    for sequence in sequences:
        visualize_sequence(
            sequence, args.root_dirname, args.out_dirname, args.class_names, args.fps
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="vsrd_tpu: Annotation Visualizer for KITTI-360"
    )
    parser.add_argument("--root_dirname", type=str, default="datasets/KITTI-360")
    parser.add_argument("--out_dirname", type=str, default="visualizations/annotations")
    parser.add_argument("--class_names", type=str, nargs="+", default=["car"])
    parser.add_argument("--fps", type=int, default=10)
    main(parser.parse_args())
