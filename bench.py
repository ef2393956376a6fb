"""Headline benchmark: seconds per auto-labeled frame on one TPU chip.

Runs the full reference recipe on a synthetic frame at the real
workload scale (17 views at 376x1408, 3000 Adam steps, 1000 rays/step,
100 coarse + 100 fine samples, box+RDF joint optimization — reference
configs/kitti_360/vsrd/*/config.json:166-238) and prints ONE JSON line.

Baseline: ~15 min (900 s) per frame on 1x V100 (reference README.md:128).
``vs_baseline`` is the speedup factor (900 / ours), so higher is better.
"""

import argparse
import json
import time

import jax
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--views", type=int, default=17)
    parser.add_argument("--height", type=int, default=376)
    parser.add_argument("--width", type=int, default=1408)
    parser.add_argument("--instances", type=int, default=8)
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--quick", action="store_true",
                        help="1/10 scale for smoke testing")
    args = parser.parse_args()

    from vsrd_tpu.pipeline import frame as fm, optimize as opt

    if args.quick:
        args.steps = 300

    chunk = min(500, args.steps)
    cfg = opt.OptimizationConfig(
        num_steps=args.steps,
        warmup_steps=args.steps // 3,
        num_rays=1000,
        num_samples=100,
        checkpoint_interval=chunk,
    )

    frame = fm.synthetic_frame(
        jax.random.PRNGKey(0),
        num_views=args.views,
        image_size=(args.height, args.width),
        num_instances=args.instances,
        max_instances=args.instances,
    )
    jax.block_until_ready(frame.soft_masks_flat)

    # warm-up: compile the chunk with the *identical* cfg (cfg is part of
    # the jit static key); one call compiles both phase branches of the
    # in-scan cond
    import jax.numpy as jnp

    params = opt.init_params(jax.random.PRNGKey(1), frame.max_instances, cfg)
    tx = opt.make_optimizer(cfg, params)
    opt_state = tx.init(params)
    warm = opt.optimize_chunk(
        params, opt_state, frame, jax.random.PRNGKey(1), jnp.asarray(0), cfg,
        min(chunk, args.steps),
    )
    jax.block_until_ready(warm[0])

    t0 = time.perf_counter()
    params, scalars = opt.optimize_frame(frame, jax.random.PRNGKey(1), cfg)
    elapsed = time.perf_counter() - t0

    sec_per_frame = elapsed * (3000 / args.steps)  # normalize to full recipe
    baseline = 900.0
    # rays/sec: coarse (S-1) + fine (2S-1) field evaluations per ray
    rays_per_step = cfg.num_rays
    rays_per_sec = rays_per_step * args.steps / elapsed

    result = {
        "metric": "sec_per_auto_labeled_frame",
        "value": round(sec_per_frame, 3),
        "unit": "s/frame (3000-step recipe, 1 chip)",
        "vs_baseline": round(baseline / sec_per_frame, 2),
        "detail": {
            "elapsed_s": round(elapsed, 3),
            "steps": args.steps,
            "rays_per_sec": round(rays_per_sec, 1),
            "final_loss": float(np.asarray(scalars["loss"])[-1]),
            "final_iou_3d": float(np.asarray(scalars["iou_3d"])[-1]),
            "views": args.views,
            "instances": args.instances,
            "image": [args.height, args.width],
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
