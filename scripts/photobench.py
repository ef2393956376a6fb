"""Photometric-ON benchmark: full recipe with the surface branch live.

Every shipped reference config sets photometric_loss weight to 0.0
(reference configs/.../config.json:124), so the branch never ran at
production scale; this captures its true TPU cost (sphere tracing
100 rays x bounded iterations + patch homography warps per step,
reference scripts/main.py:689-853 + renderers.py:21-73) by timing the
bench workload twice — weight 0.0 vs weight 1.0 — and reporting both
and the delta. Writes PHOTOBENCH.json at the repo root.

Run: python scripts/photobench.py [--steps 600]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_recipe(frame, cfg, steps):
    from vsrd_tpu.pipeline import optimize as opt

    chunk = min(500, steps)
    params = opt.init_params(jax.random.PRNGKey(1), frame.max_instances, cfg)
    tx = opt.make_optimizer(cfg, params)
    opt_state = tx.init(params)
    warm = opt.optimize_chunk(
        params, opt_state, frame, jax.random.PRNGKey(1), jnp.asarray(0),
        cfg, min(chunk, steps),
    )
    jax.block_until_ready(warm[0])
    t0 = time.perf_counter()
    params, scalars = opt.optimize_frame(frame, jax.random.PRNGKey(1), cfg)
    elapsed = time.perf_counter() - t0
    return elapsed, scalars


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=600)
    parser.add_argument("--views", type=int, default=17)
    parser.add_argument("--height", type=int, default=376)
    parser.add_argument("--width", type=int, default=1408)
    parser.add_argument("--instances", type=int, default=8)
    args = parser.parse_args()

    from vsrd_tpu.pipeline import frame as fm, optimize as opt

    frame = fm.synthetic_frame(
        jax.random.PRNGKey(0),
        num_views=args.views,
        image_size=(args.height, args.width),
        num_instances=args.instances,
        max_instances=args.instances,
        with_images=True,
    )
    jax.block_until_ready(frame.soft_masks_flat)

    results = {}
    for weight in (0.0, 1.0):
        cfg = opt.OptimizationConfig(
            num_steps=args.steps,
            warmup_steps=args.steps // 3,
            num_rays=1000,
            num_samples=100,
            checkpoint_interval=min(500, args.steps),
            photometric_weight=weight,
        )
        elapsed, scalars = time_recipe(frame, cfg, args.steps)
        s_per_frame = elapsed * (3000 / args.steps)
        key = f"w{weight:g}"
        results[key] = {
            "elapsed_s": round(elapsed, 3),
            "s_per_frame_3000": round(s_per_frame, 3),
            "final_loss": float(np.asarray(scalars["loss"])[-1]),
            "final_iou_3d": float(np.asarray(scalars["iou_3d"])[-1]),
            "photometric_loss_last": float(
                np.asarray(scalars.get("photometric_loss", [0.0]))[-1]
            ),
        }
        print(key, results[key], flush=True)

    delta = (
        results["w1"]["s_per_frame_3000"] - results["w0"]["s_per_frame_3000"]
    )
    report = {
        "workload": vars(args),
        "recipe_note": "full bench workload; photometric branch adds "
        "sphere tracing (100 rays, bounded while_loop) + 11x11 patch "
        "homography warps per step",
        "results": results,
        "photometric_overhead_s_per_frame": round(delta, 3),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PHOTOBENCH.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"photobench": report["results"],
                      "overhead_s_per_frame": round(delta, 3)}))


if __name__ == "__main__":
    main()
