"""End-to-end parity: vsrd_tpu vs the PyTorch reference, same scene,
same init, same ray schedule, deterministic samplers on both sides.

Usage: python tools/parity/run_parity.py [--steps 300] [--rays 128]
       [--samples 16] [--out PARITY.md]

The reference side drives /root/reference's own modules
(tools/parity/torch_driver.py); the vsrd_tpu side runs the real
pipeline (pipeline/optimize.py) with the ray schedule injected and
cfg.deterministic=True. Reports per-step loss deltas and the 3D IoU
between the two final box sets (the BASELINE.md 1e-2 contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_scene(num_views=4, image_size=(96, 128), num_instances=3, seed=0):
    """Shared scene: a vsrd_tpu synthetic frame + its numpy mirror for
    the torch driver (identical numbers on both sides, including the
    bf16 rounding of the stored soft masks)."""
    import jax
    from vsrd_tpu.pipeline import frame as fm

    frame = fm.synthetic_frame(
        jax.random.PRNGKey(seed),
        num_views=num_views,
        image_size=image_size,
        num_instances=num_instances,
        max_instances=num_instances,
    )
    v = frame.num_views
    h, w = frame.image_size
    n = frame.max_instances
    masks_flat = np.asarray(frame.soft_masks_flat, np.float32)  # [(VHW), N]
    scene = {
        "intrinsics": np.asarray(frame.intrinsics),
        "extrinsics": np.asarray(frame.extrinsics),
        "soft_masks": masks_flat.reshape(v, h, w, n),
        "gt_boxes_2d": np.asarray(frame.gt_boxes_2d),
        "visible": np.asarray(frame.visible),
        "gt_boxes_3d": np.asarray(frame.gt_boxes_3d),
        "image_size": (h, w),
        "target_index": int(frame.target_index),
    }
    return frame, scene


def ray_schedule(scene, num_steps, num_rays, seed=1234):
    """Multinomial-without-replacement schedule over the max-instance
    soft-mask map (reference main.py:620-627), precomputed in numpy so
    both sides render identical rays."""
    weights = scene["soft_masks"].max(-1).reshape(-1)  # [V*H*W]
    logw = np.where(weights > 0, np.log(np.maximum(weights, 1e-30)), -np.inf)
    rng = np.random.default_rng(seed)
    schedule = np.empty((num_steps, num_rays), np.int32)
    for s in range(num_steps):
        g = rng.gumbel(size=logw.shape).astype(np.float64)
        keys = logw + g
        # top-k by key descending via argpartition (identical result to
        # the full argsort: gumbel keys are continuous, ties measure-0);
        # a full 9M-element argsort costs ~1 s/step at bench-scene scale
        cand = np.argpartition(-keys, num_rays - 1)[:num_rays]
        schedule[s] = cand[np.argsort(-keys[cand], kind="stable")]
    return schedule


def run_ours(frame, init, schedule, cfg):
    import jax
    import jax.numpy as jnp
    from vsrd_tpu.pipeline import optimize as opt

    @partial(jax.jit, static_argnames=("cfg", "num_steps"))
    def run(params, opt_state, frame, schedule, cfg, num_steps):
        tx = opt.make_optimizer(cfg, params)

        def body(carry, inp):
            params, opt_state = carry
            step, rays = inp
            params, opt_state, scalars = opt.train_step(
                params, opt_state, frame, step, jax.random.PRNGKey(0), cfg,
                tx, ray_indices=rays,
            )
            return (params, opt_state), scalars

        (params, opt_state), scalars = jax.lax.scan(
            body, (params, opt_state),
            (jnp.arange(num_steps), schedule),
        )
        return params, scalars

    from vsrd_tpu.models import box_parameters

    params = jax.tree.map(jnp.asarray, init)
    tx = opt.make_optimizer(cfg, params)
    opt_state = tx.init(params)
    params, scalars = run(
        params, opt_state, frame, jnp.asarray(schedule), cfg, schedule.shape[0]
    )
    decoded = box_parameters.decode_boxes(jax.device_get(params)["boxes"])
    boxes = np.asarray(decoded["boxes_3d"])
    return jax.device_get(scalars), boxes


def iou_3d_pairs(boxes_a, boxes_b):
    """Per-instance 3D IoU between two [N, 8, 3] camera-space box sets
    (rotated to z-up as in the KITTI-360 evaluation)."""
    import jax.numpy as jnp
    from vsrd_tpu.ops import geometry, iou3d

    rot = np.asarray(geometry.rotation_matrix_x(jnp.asarray(-np.pi / 2.0)))
    a = boxes_a @ rot.T
    b = boxes_b @ rot.T
    out = []
    for i in range(a.shape[0]):
        i3, _ = iou3d.box_3d_iou(jnp.asarray(a[i]), jnp.asarray(b[i]))
        out.append(float(i3))
    return np.asarray(out)


def matched_iou_3d(boxes_a, boxes_b):
    """Hungarian-matched per-instance 3D IoU between two box sets.

    The per-frame optimization's instance labels are a gauge freedom:
    all boxes start identical (reference box_parameters.py:34-49 zero
    init + one shared random embedding), so the step-0 matching cost has
    tied rows and scipy vs the on-device solver may break the tie with
    different permutations; each label then specializes to its matched
    GT. The reference's own metrics Hungarian-match before comparing
    (main.py:877-924), and so does this."""
    import scipy.optimize

    n = boxes_a.shape[0]
    cost = np.zeros((n, n))
    for j in range(n):
        cost[:, j] = -iou_3d_pairs(boxes_a, np.broadcast_to(boxes_b[j], boxes_a.shape))
    rows, cols = scipy.optimize.linear_sum_assignment(cost)
    return -cost[rows, cols], cols


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--warmup", type=int, default=100)
    parser.add_argument("--rays", type=int, default=128)
    parser.add_argument("--samples", type=int, default=16)
    parser.add_argument("--views", type=int, default=4)
    parser.add_argument("--instances", type=int, default=3)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    import jax
    from vsrd_tpu.pipeline import optimize as opt

    import refload
    import torch_driver

    cfg = opt.OptimizationConfig(
        num_steps=args.steps,
        warmup_steps=args.warmup,
        num_rays=args.rays,
        num_samples=args.samples,
        deterministic=True,
        pallas_matmul_precision="highest",
        field_dtype=None,
        metric_interval=50,
        checkpoint_interval=args.steps,
    )

    frame, scene = build_scene(args.views, (96, 128), args.instances)
    schedule = ray_schedule(scene, args.steps, args.rays)
    init = jax.device_get(
        opt.init_params(jax.random.PRNGKey(1), args.instances, cfg)
    )

    print("running torch reference ...", flush=True)
    ref = refload.load_reference()
    refload.make_samplers_deterministic(ref)
    torch_side = torch_driver.TorchReferenceOptimization(ref, scene, init, cfg)
    torch_hist, torch_boxes = torch_side.run(schedule)

    print("running vsrd_tpu ...", flush=True)
    ours_hist, our_boxes = run_ours(frame, init, schedule, cfg)

    report = {"steps": args.steps, "per_loss": {}}
    for name in ("loss", "iou_projection_loss", "l1_projection_loss",
                 "silhouette_loss", "eikonal_loss"):
        a = np.asarray(ours_hist[name])
        b = np.asarray(torch_hist.get(name, np.zeros_like(a)))
        report["per_loss"][name] = {
            "step0_ours": float(a[0]),
            "step0_torch": float(b[0]),
            "max_abs_diff": float(np.max(np.abs(a - b))),
            "max_rel_diff": float(
                np.max(np.abs(a - b) / (np.abs(b) + 1e-6))
            ),
            "final_ours": float(a[-1]),
            "final_torch": float(b[-1]),
        }

    cross, _ = matched_iou_3d(our_boxes, torch_boxes)
    gt = scene["gt_boxes_3d"][: args.instances]
    ours_vs_gt, _ = matched_iou_3d(our_boxes, gt)
    torch_vs_gt, _ = matched_iou_3d(torch_boxes, gt)
    report["final_boxes"] = {
        "matched_iou3d_ours_vs_torch": cross.tolist(),
        "matched_iou3d_ours_vs_gt": ours_vs_gt.tolist(),
        "matched_iou3d_torch_vs_gt": torch_vs_gt.tolist(),
        # the BASELINE.md contract: pseudo-label quality (IoU vs GT)
        # within 1e-2 of the PyTorch reference, instance-matched
        "mean_gt_iou_gap": float(
            abs(np.mean(ours_vs_gt) - np.mean(torch_vs_gt))
        ),
        "min_cross_iou": float(cross.min()),
    }
    print(json.dumps(report, indent=2))

    if args.out:
        with open(args.out, "w") as f:
            f.write("# End-to-end parity: vsrd_tpu vs PyTorch reference\n\n")
            f.write(
                f"Deterministic run, {args.steps} steps ({args.warmup} "
                f"warmup), {args.rays} rays, {args.samples} samples, "
                f"{args.views} views, {args.instances} instances; shared "
                "init + ray schedule.\n\n```json\n"
            )
            f.write(json.dumps(report, indent=2))
            f.write("\n```\n")


if __name__ == "__main__":
    main()
