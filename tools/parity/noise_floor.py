"""Multi-seed noise-floor analysis for the converged-parity contract.

BASELINE.md's contract — "3D box IoU within 1e-2 of PyTorch reference" —
cannot be judged from one run: the per-frame optimization is 1500+ steps
of Adam on a non-convex landscape, so the reference's *own* converged
GT-IoU moves run-to-run with the ray schedule and init seed. This tool
quantifies that self-noise and compares the cross-framework gap to it:

  for each scene (>=2), run the torch reference N>=3 times with
  different (init, ray schedule) seeds, and vsrd_tpu likewise with the
  IDENTICAL seeds/schedules; report
    (a) each side's self-spread in Hungarian-matched mean GT-IoU,
    (b) the cross-framework gap of the converged means,
  and the verdict: contract holds at the noise floor iff (b) <= (a).

Runs are stored one-JSON-per-run under nf_runs/ so the torch side (slow,
CPU) and the vsrd_tpu side (fast, TPU) can execute as separate
processes; `--summarize` folds whatever runs exist into NOISE_FLOOR.md.

Usage:
  JAX_PLATFORMS=cpu python tools/parity/noise_floor.py --side torch
  python tools/parity/noise_floor.py --side ours
  python tools/parity/noise_floor.py --summarize

Reference workload being matched: /root/reference/scripts/main.py:323-865
with configs/.../config.json:166-238 (reduced recipe; torch-CPU cost).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(_HERE)))
sys.path.insert(0, _HERE)

import numpy as np

RUNS_DIR = os.path.join(_HERE, "nf_runs")


def make_cfg(args):
    from vsrd_tpu.pipeline import optimize as opt

    if getattr(args, "production", False):
        # production kernel settings (bench.py defaults): bf16-multiply
        # MXU matmuls, fast trig, K=1 directional coarse pass — for
        # quantifying the quality delta of the fast path against the
        # same strict-mode torch anchors (use with --tag).
        return opt.OptimizationConfig(
            num_steps=args.steps,
            warmup_steps=args.warmup,
            num_rays=args.rays,
            num_samples=args.samples,
            deterministic=True,
            metric_interval=args.steps,
            checkpoint_interval=args.steps,
            pallas_box_coarse=getattr(args, "box_coarse", False),
        )
    return opt.OptimizationConfig(
        num_steps=args.steps,
        warmup_steps=args.warmup,
        num_rays=args.rays,
        num_samples=args.samples,
        deterministic=True,
        pallas_matmul_precision="highest",
        field_dtype=None,
        metric_interval=args.steps,
        checkpoint_interval=args.steps,
    )


def trial_inputs(args, scene_seed, trial):
    """Scene + per-trial schedule/init, identical for both sides."""
    import jax
    import run_parity as rp
    from vsrd_tpu.pipeline import optimize as opt

    frame, scene = rp.build_scene(
        args.views, (args.height, args.width), args.instances,
        seed=scene_seed,
    )
    schedule = rp.ray_schedule(
        scene, args.steps, args.rays, seed=1234 + 1000 * trial
    )
    init = jax.device_get(
        opt.init_params(jax.random.PRNGKey(1 + trial), args.instances,
                        make_cfg(args))
    )
    return frame, scene, schedule, init


def run_path(scene_seed, trial, side, tag=""):
    suffix = f"_{tag}" if tag else ""
    return os.path.join(
        RUNS_DIR, f"s{scene_seed}_t{trial}_{side}{suffix}.json"
    )


def save_run(path, boxes, scene, args, elapsed):
    import run_parity as rp

    gt = scene["gt_boxes_3d"][: args.instances]
    gt_iou, _ = rp.matched_iou_3d(boxes, gt)
    payload = {
        "boxes": np.asarray(boxes).tolist(),
        "matched_gt_iou": gt_iou.tolist(),
        "mean_gt_iou": float(gt_iou.mean()),
        "elapsed_s": elapsed,
        "recipe": {
            "steps": args.steps, "warmup": args.warmup, "rays": args.rays,
            "samples": args.samples, "views": args.views,
            "instances": args.instances,
        },
    }
    os.makedirs(RUNS_DIR, exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f)
    return payload


def run_torch_side(args):
    import refload
    import torch_driver

    ref = refload.load_reference()
    refload.make_samplers_deterministic(ref)
    cfg = make_cfg(args)
    for scene_seed in args.scenes:
        for trial in range(args.trials):
            path = run_path(scene_seed, trial, "torch", args.tag)
            if os.path.exists(path):
                print(f"skip existing {path}", flush=True)
                continue
            _, scene, schedule, init = trial_inputs(args, scene_seed, trial)
            t0 = time.time()
            side = torch_driver.TorchReferenceOptimization(
                ref, scene, init, cfg
            )
            _, boxes = side.run(schedule)
            payload = save_run(path, boxes, scene, args, time.time() - t0)
            print(
                f"torch s{scene_seed} t{trial}: mean_gt_iou="
                f"{payload['mean_gt_iou']:.4f} ({payload['elapsed_s']:.0f}s)",
                flush=True,
            )


def run_ours_side(args):
    import run_parity as rp

    cfg = make_cfg(args)
    for scene_seed in args.scenes:
        for trial in range(args.trials):
            path = run_path(scene_seed, trial, "ours", args.tag)
            if os.path.exists(path):
                print(f"skip existing {path}", flush=True)
                continue
            frame, scene, schedule, init = trial_inputs(
                args, scene_seed, trial
            )
            t0 = time.time()
            _, boxes = rp.run_ours(frame, init, schedule, cfg)
            payload = save_run(path, boxes, scene, args, time.time() - t0)
            print(
                f"ours s{scene_seed} t{trial}: mean_gt_iou="
                f"{payload['mean_gt_iou']:.4f} ({payload['elapsed_s']:.0f}s)",
                flush=True,
            )


def summarize(args):
    import run_parity as rp

    report = {"scenes": {}, "recipe": None}
    for scene_seed in args.scenes:
        rows = {"torch": [], "ours": [], "cross_iou": []}
        for trial in range(args.trials):
            sides = {}
            for side in ("torch", "ours"):
                path = run_path(scene_seed, trial, side, args.tag)
                if not os.path.exists(path) and side == "torch" and args.tag:
                    # recipe-variant tags (e.g. --production) reuse the
                    # strict-mode torch anchors: the torch side has no
                    # kernel-precision variants
                    path = run_path(scene_seed, trial, side, "")
                if not os.path.exists(path):
                    continue
                with open(path) as f:
                    sides[side] = json.load(f)
                rows[side].append(sides[side]["mean_gt_iou"])
                report["recipe"] = sides[side]["recipe"]
            if len(sides) == 2:
                cross, _ = rp.matched_iou_3d(
                    np.asarray(sides["ours"]["boxes"]),
                    np.asarray(sides["torch"]["boxes"]),
                )
                rows["cross_iou"].append(float(cross.mean()))
        if not rows["torch"] or not rows["ours"]:
            report["scenes"][str(scene_seed)] = {"incomplete": rows}
            continue
        t, o = np.asarray(rows["torch"]), np.asarray(rows["ours"])
        entry = {
            "torch_mean_gt_iou_per_trial": t.tolist(),
            "ours_mean_gt_iou_per_trial": o.tolist(),
            "torch_self_spread": float(t.max() - t.min()),
            "torch_self_std": float(t.std()),
            "ours_self_spread": float(o.max() - o.min()),
            "cross_gap_of_means": float(abs(o.mean() - t.mean())),
            "cross_iou_same_trial": rows["cross_iou"],
            "contract_at_noise_floor": bool(
                abs(o.mean() - t.mean()) <= max(t.max() - t.min(), 1e-2)
            ),
        }
        report["scenes"][str(scene_seed)] = entry
    print(json.dumps(report, indent=2))
    out = os.path.join(_HERE, f"NOISE_FLOOR{'_' + args.tag if args.tag else ''}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    return report


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--side", choices=["torch", "ours"])
    parser.add_argument("--summarize", action="store_true")
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--warmup", type=int, default=500)
    parser.add_argument("--rays", type=int, default=512)
    parser.add_argument("--samples", type=int, default=24)
    parser.add_argument("--views", type=int, default=6)
    parser.add_argument("--instances", type=int, default=3)
    parser.add_argument("--trials", type=int, default=3)
    parser.add_argument("--height", type=int, default=96)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--tag", default="", help="suffix for run files (recipe variants)")
    parser.add_argument("--production", action="store_true",
                        help="ours side at production kernel settings "
                             "(default precision + dir coarse) instead of "
                             "strict parity mode")
    parser.add_argument("--box-coarse", action="store_true",
                        help="with --production: enable the box-only "
                             "coarse pass (cfg.pallas_box_coarse) — the "
                             "A/B arm for flipping its default")
    parser.add_argument(
        "--scenes", type=lambda s: [int(x) for x in s.split(",")],
        default=[0, 7],
    )
    args = parser.parse_args()

    if args.summarize:
        summarize(args)
    elif args.side == "torch":
        run_torch_side(args)
    elif args.side == "ours":
        run_ours_side(args)
    else:
        raise SystemExit("pass --side torch|ours or --summarize")


if __name__ == "__main__":
    main()
