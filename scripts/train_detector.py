"""Train a DETR3D detector on VSRD pseudo-labels.

The reference's published workflow trains an external detector on the
emitted pseudo-labels (`/root/reference/README.md:122-186` — MonoFlex
etc., outside the repo) and ships DETR3D/DeformableDETR3D + DDP
wrappers as the in-repo training surface
(`/root/reference/vsrd/models/detectors/detr.py`,
`vsrd/distributed/trainer.py`). This CLI closes that loop inside the
framework: prediction JSONs (tools/kitti_360/make_predictions.py) +
images -> flax DETR3D via the pmean-DP `shard_map` step
(vsrd_tpu/pipeline/detector_training.py), data-sharded over all local
devices.

Usage:
  python scripts/train_detector.py --root_dirname datasets/KITTI-360 \
      --ckpt_dirname ckpts/kitti_360/vsrd --out_dirname ckpts/detr3d \
      --num_steps 10000 --batch_size 8
"""

import argparse
import glob
import json
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vsrd_tpu.models import detr3d  # noqa: E402
from vsrd_tpu.pipeline import detector_eval  # noqa: E402
from vsrd_tpu.pipeline import detector_training as dt  # noqa: E402
from vsrd_tpu.utils.saver import Saver  # noqa: E402

from PIL import Image  # noqa: E402


def build_index(root_dirname, ckpt_name):
    """(image, prediction, annotation) path triples for every frame that
    has a pseudo-label JSON (layout mirrors visualize_predictions.py)."""
    prediction_dirname = os.path.join("predictions", ckpt_name)
    triples = []
    for prediction_filename in sorted(
        glob.glob(
            os.path.join(
                root_dirname, prediction_dirname, "*", "image_00",
                "data_rect", "*.json",
            )
        )
    ):
        image_filename = prediction_filename.replace(
            prediction_dirname, "data_2d_raw"
        ).replace(".json", ".png")
        annotation_filename = prediction_filename.replace(
            prediction_dirname, "annotations"
        )
        if os.path.exists(image_filename) and os.path.exists(
            annotation_filename
        ):
            triples.append(
                (image_filename, prediction_filename, annotation_filename)
            )
    return triples


def load_example(paths, image_size, max_boxes, class_names,
                 confidence_threshold):
    """One training example: resized image (NHWC [0,1]), rescaled K,
    per-class labels + normalized-xyxy 2D boxes + camera-space 3D
    corners, padded to ``max_boxes`` with a validity mask."""
    image_filename, prediction_filename, annotation_filename = paths
    pil = Image.open(image_filename).convert("RGB")
    src_w, src_h = pil.size
    h, w = image_size
    image = (
        np.asarray(pil.resize((w, h), Image.BILINEAR)).astype(np.float32)
        / 255.0
    )

    with open(annotation_filename) as file:
        annotation = json.load(file)
    intrinsic = np.asarray(annotation["intrinsic_matrix"], np.float32)
    intrinsic = np.diag([w / src_w, h / src_h, 1.0]).astype(
        np.float32
    ) @ intrinsic

    with open(prediction_filename) as file:
        prediction = json.load(file)

    labels = np.zeros((max_boxes,), np.int32)
    boxes_2d = np.zeros((max_boxes, 4), np.float32)
    boxes_3d = np.zeros((max_boxes, 8, 3), np.float32)
    heights_px = np.zeros((max_boxes,), np.float32)
    valid = np.zeros((max_boxes,), bool)
    index = 0
    for class_index, class_name in enumerate(class_names):
        b2 = prediction["boxes_2d"].get(class_name, [])
        b3 = prediction["boxes_3d"].get(class_name, [])
        conf = prediction["confidences"].get(
            class_name, [1.0] * len(b3)
        )
        if not (len(b2) == len(b3) == len(conf)):
            raise ValueError(
                f"{prediction_filename}: ragged prediction entry for "
                f"{class_name!r}: {len(b2)} boxes_2d, {len(b3)} boxes_3d, "
                f"{len(conf)} confidences"
            )
        # highest-confidence first, so the max_boxes cap drops the
        # weakest detections instead of whatever came last in the file
        order = np.argsort(np.asarray(conf, np.float32))[::-1]
        for i in order:
            box2, box3, c = b2[i], b3[i], conf[i]
            if index >= max_boxes or c < confidence_threshold:
                continue
            box2 = np.asarray(box2, np.float32).reshape(-1)  # [x1 y1 x2 y2]
            # make_predictions saves raw front-clipped projections, so
            # truncated cars extend past the image; the sigmoid-bounded
            # 2D head lives in [0, 1] — clip the target to the image
            box2 = np.clip(
                box2, 0.0, np.asarray([src_w, src_h, src_w, src_h], np.float32)
            )
            boxes_2d[index] = box2 / np.asarray(
                [src_w, src_h, src_w, src_h], np.float32
            )
            boxes_3d[index] = np.asarray(box3, np.float32)
            # pixel height at the ORIGINAL resolution — the quantity the
            # KITTI devkit difficulty bins threshold on (40 px / 25 px)
            heights_px[index] = box2[3] - box2[1]
            labels[index] = class_index
            valid[index] = True
            index += 1
    return {
        "images": image.astype(np.float32),
        "intrinsics": intrinsic,
        "labels": labels,
        "boxes_2d": boxes_2d,
        "boxes_3d": boxes_3d,
        "gt_heights_px": heights_px,
        "orig_sizes": np.asarray([src_h, src_w], np.float32),
        "valid": valid,
    }


def make_batch(triples, rng, args, cache):
    """Random batch; decoded examples are memoized (the pseudo-labeled
    frame set is finite and small at training resolution, and repeated
    PIL decode + resize per step would stall the device otherwise)."""
    picks = [triples[rng.randrange(len(triples))] for _ in range(args.batch_size)]
    examples = []
    for p in picks:
        if p not in cache:
            cache[p] = load_example(
                p, (args.height, args.width), args.max_boxes,
                args.class_names, args.confidence_threshold,
            )
        examples.append(cache[p])
    return {
        key: jnp.asarray(np.stack([e[key] for e in examples]))
        for key in examples[0]
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dirname", required=True)
    parser.add_argument("--ckpt_dirname", required=True,
                        help="VSRD checkpoint dir whose basename names the "
                             "predictions/ subtree (as make_predictions)")
    parser.add_argument("--out_dirname", default="ckpts/detr3d")
    parser.add_argument("--class_names", nargs="+", default=["car"])
    parser.add_argument("--num_steps", type=int, default=10000)
    parser.add_argument("--batch_size", type=int, default=8,
                        help="global batch; must divide by local devices")
    parser.add_argument("--height", type=int, default=192)
    parser.add_argument("--width", type=int, default=704)
    parser.add_argument("--max_boxes", type=int, default=16)
    parser.add_argument("--confidence_threshold", type=float, default=0.3)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--num_queries", type=int, default=50)
    parser.add_argument("--hidden_dim", type=int, default=128)
    parser.add_argument("--num_encoder_layers", type=int, default=2)
    parser.add_argument("--num_decoder_layers", type=int, default=2)
    parser.add_argument("--num_heads", type=int, default=8)
    parser.add_argument("--deformable", action="store_true")
    parser.add_argument("--log_intervals", type=int, default=50)
    parser.add_argument("--ckpt_intervals", type=int, default=1000)
    parser.add_argument("--eval_intervals", type=int, default=1000,
                        help="AP/matched-IoU eval cadence (0 disables)")
    parser.add_argument("--holdout_fraction", type=float, default=0.1,
                        help="fraction of frames held out for eval "
                             "(0: evaluate on the training frames)")
    parser.add_argument("--eval_frames", type=int, default=64,
                        help="max frames per eval pass")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    triples = build_index(
        args.root_dirname, os.path.basename(args.ckpt_dirname)
    )
    if not triples:
        raise SystemExit(
            f"no prediction JSONs under {args.root_dirname}/predictions/"
            f"{os.path.basename(args.ckpt_dirname)} — run "
            "tools/kitti_360/make_predictions.py first"
        )
    print(f"{len(triples)} pseudo-labeled frames", flush=True)

    # deterministic holdout split for the eval signal
    split_rng = random.Random(args.seed + 1)
    shuffled = list(triples)
    split_rng.shuffle(shuffled)
    n_hold = int(len(shuffled) * args.holdout_fraction)
    eval_triples = shuffled[:n_hold] or shuffled
    triples = shuffled[n_hold:] or shuffled
    if args.eval_intervals:
        print(
            f"train {len(triples)} / eval {len(eval_triples)} frames "
            f"({'holdout' if n_hold else 'train set'})",
            flush=True,
        )

    devices = jax.local_devices()
    # largest dp size that divides the global batch (a 2-frame batch on
    # an 8-device host simply uses 2 devices)
    dp = max(
        d for d in range(1, len(devices) + 1) if args.batch_size % d == 0
    )
    mesh = dt.make_dp_mesh(devices[:dp])
    print(f"dp mesh over {dp}/{len(devices)} devices", flush=True)

    model_cls = detr3d.DeformableDETR3D if args.deformable else detr3d.DETR3D
    model = model_cls(
        num_classes=len(args.class_names),
        num_queries=args.num_queries,
        hidden_dim=args.hidden_dim,
        num_encoder_layers=args.num_encoder_layers,
        num_decoder_layers=args.num_decoder_layers,
        num_heads=args.num_heads,
    )
    params, tx, opt_state = dt.create_train_state(
        jax.random.PRNGKey(args.seed), model,
        (args.height, args.width), args.learning_rate,
    )
    step_fn = dt.make_dp_train_step(
        model, tx, mesh, num_classes=len(args.class_names)
    )

    saver = Saver(args.out_dirname)
    rng = random.Random(args.seed)
    cache = {}

    def run_eval(step):
        """AP@{0.25,0.5} + matched 3D IoU / corner L1 on the eval split
        (vsrd_tpu.pipeline.detector_eval)."""
        picks = eval_triples[: args.eval_frames]
        batches = []
        for start in range(0, len(picks), args.batch_size):
            group = picks[start:start + args.batch_size]
            if len(group) < args.batch_size:
                break  # keep shapes static for the jitted apply
            examples = []
            for p in group:
                if p not in cache:
                    cache[p] = load_example(
                        p, (args.height, args.width), args.max_boxes,
                        args.class_names, args.confidence_threshold,
                    )
                examples.append(cache[p])
            batches.append({
                key: jnp.asarray(np.stack([e[key] for e in examples]))
                for key in examples[0]
            })
        if not batches:  # fewer eval frames than a batch: use one ragged
            examples = [
                cache.setdefault(p, load_example(
                    p, (args.height, args.width), args.max_boxes,
                    args.class_names, args.confidence_threshold,
                ))
                for p in picks
            ]
            batches = [{
                key: jnp.asarray(np.stack([e[key] for e in examples]))
                for key in examples[0]
            }]
        metrics = detector_eval.evaluate_model(
            model, params, batches, num_classes=len(args.class_names)
        )
        parts = " ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in sorted(metrics.items())
        )
        print(f"eval step {step + 1}: {parts}", flush=True)
        return metrics

    for step in range(args.num_steps):
        batch = dt.shard_batch(make_batch(triples, rng, args, cache), mesh)
        params, opt_state, loss, aux = step_fn(params, opt_state, batch)
        if (step + 1) % args.log_intervals == 0 or step == 0:
            parts = " ".join(
                f"{k}={float(v):.4f}" for k, v in sorted(aux.items())
                if np.ndim(v) == 0
            )
            print(
                f"step {step + 1}/{args.num_steps} "
                f"loss={float(loss):.4f} {parts}",
                flush=True,
            )
        if args.eval_intervals and (
            (step + 1) % args.eval_intervals == 0
            or step + 1 == args.num_steps
        ):
            run_eval(step)
        if (step + 1) % args.ckpt_intervals == 0 or step + 1 == args.num_steps:
            saver.save(
                f"step_{step}",
                step=np.asarray(step),
                models={"detector": jax.device_get(params)},
                config=vars(args) | {"model": model_cls.__name__},
            )
    print(f"saved {saver.path(f'step_{args.num_steps - 1}.npz')}", flush=True)


if __name__ == "__main__":
    main()
