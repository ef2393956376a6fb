"""Render pseudo-label prediction visualizations, colored by confidence.

Re-design of `/root/reference/tools/kitti_360/visualize_predictions.py`:
wireframes tinted with a jet-style colormap over confidence.
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from vsrd_tpu.visualization import drawers  # noqa: E402

try:
    import cv2
except ImportError:
    cv2 = None


def jet_color(value):
    value = float(np.clip(value, 0.0, 1.0))
    lut = np.zeros((1, 1), np.uint8)
    lut[0, 0] = int(value * 255)
    color = cv2.applyColorMap(lut, cv2.COLORMAP_JET)[0, 0]
    return tuple(int(c) for c in color[::-1])


def visualize_sequence(sequence, root_dirname, ckpt_dirname, out_dirname, fps):
    prediction_dirname = os.path.join("predictions", os.path.basename(ckpt_dirname))
    prediction_filenames = sorted(
        glob.glob(
            os.path.join(
                root_dirname, prediction_dirname, sequence,
                "image_00", "data_rect", "*.json",
            )
        )
    )
    writer = None
    for prediction_filename in prediction_filenames:
        image_filename = prediction_filename.replace(
            prediction_dirname, "data_2d_raw"
        ).replace(".json", ".png")
        annotation_filename = prediction_filename.replace(
            prediction_dirname, "annotations"
        )
        if not os.path.exists(image_filename):
            continue
        with open(prediction_filename) as file:
            prediction = json.load(file)
        with open(annotation_filename) as file:
            annotation = json.load(file)

        image = cv2.imread(image_filename)[..., ::-1].astype(np.float32) / 255.0
        intrinsic = np.asarray(annotation["intrinsic_matrix"])

        for class_name, boxes in prediction["boxes_3d"].items():
            confidences = prediction["confidences"].get(class_name, [])
            for box, confidence in zip(boxes, confidences):
                image = drawers.draw_boxes_3d(
                    image,
                    np.asarray(box)[None],
                    intrinsic,
                    color=jet_color(confidence),
                )

        frame = (np.clip(image, 0, 1) * 255).astype(np.uint8)[..., ::-1]
        out_png = os.path.join(
            out_dirname, sequence, os.path.basename(image_filename)
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
            sequence, args.root_dirname, args.ckpt_dirname, args.out_dirname, args.fps
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="vsrd_tpu: Prediction Visualizer for KITTI-360"
    )
    parser.add_argument("--root_dirname", type=str, default="datasets/KITTI-360")
    parser.add_argument("--ckpt_dirname", type=str, default="ckpts/kitti_360/vsrd")
    parser.add_argument("--out_dirname", type=str, default="visualizations/predictions")
    parser.add_argument("--fps", type=int, default=10)
    main(parser.parse_args())
