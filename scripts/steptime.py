"""Micro-benchmark: per-step time of each phase at the full recipe.

Usage: python scripts/steptime.py [--rays 1000] [--samples 100]
Times a 100-step post-warmup chunk and a 100-step warmup chunk
separately (compile excluded) and prints ms/step for each.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def time_chunk(opt, params, opt_state, frame, cfg, start, n, key):
    out = opt.optimize_chunk(
        params, opt_state, frame, key, jnp.asarray(start), cfg, n
    )
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    out = opt.optimize_chunk(
        params, opt_state, frame, key, jnp.asarray(start), cfg, n
    )
    jax.block_until_ready(out[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--views", type=int, default=17)
    parser.add_argument("--instances", type=int, default=8)
    parser.add_argument("--rays", type=int, default=1000)
    parser.add_argument("--samples", type=int, default=100)
    parser.add_argument("--chunk", type=int, default=100)
    parser.add_argument("--fwd-tile", type=int, default=None)
    parser.add_argument("--bwd-tile", type=int, default=None)
    parser.add_argument("--post-only", action="store_true")
    parser.add_argument("--box-coarse", action="store_true",
                        help="pallas_box_coarse=True (box-only coarse pass)")
    parser.add_argument("--layout", default="compact",
                        choices=("compact", "kitti"),
                        help="instance placement: compact (z 8-16) or "
                        "kitti (z 5-80, realistic spread)")
    skip_group = parser.add_mutually_exclusive_group()
    skip_group.add_argument("--group-skip", action="store_true",
                            help="enable pallas_group_skip (default off; see "
                            "OptimizationConfig.pallas_group_skip)")
    skip_group.add_argument("--no-group-skip", action="store_true",
                            help="force-disable pallas_group_skip")
    parser.add_argument("--frames", type=int, default=1,
                        help=">1: co-optimize F stacked frames")
    args = parser.parse_args()

    from vsrd_tpu.pipeline import frame as fm, optimize as opt
    from vsrd_tpu.pipeline import sharded as sh

    overrides = {}
    if args.fwd_tile:
        overrides["pallas_tile"] = args.fwd_tile
    if args.bwd_tile:
        overrides["pallas_bwd_tile"] = args.bwd_tile
    if args.box_coarse:
        overrides["pallas_box_coarse"] = True
    if args.group_skip:
        overrides["pallas_group_skip"] = True
    if args.no_group_skip:
        overrides["pallas_group_skip"] = False
    cfg = opt.OptimizationConfig(
        num_steps=3000,
        warmup_steps=1000,
        num_rays=args.rays,
        num_samples=args.samples,
        checkpoint_interval=args.chunk,
        **overrides,
    )
    frames = [
        fm.synthetic_frame(
            jax.random.PRNGKey(i),
            num_views=args.views,
            image_size=(376, 1408),
            num_instances=args.instances,
            max_instances=args.instances,
            layout=args.layout,
        )
        for i in range(args.frames)
    ]
    if args.frames > 1:
        frame = sh.stack_frames(frames)
        params = opt.init_params_batched(
            jax.random.PRNGKey(1), args.frames, args.instances, cfg
        )
    else:
        frame = frames[0]
        params = opt.init_params(jax.random.PRNGKey(1), args.instances, cfg)
    jax.block_until_ready(frame.soft_masks_flat)

    tx = opt.make_optimizer(cfg, params)
    opt_state = tx.init(params)

    warm_ms = float("nan")
    if not args.post_only:
        warm_ms = time_chunk(
            opt, params, opt_state, frame, cfg, 0, args.chunk,
            jax.random.PRNGKey(2),
        )
    post_ms = time_chunk(
        opt, params, opt_state, frame, cfg, 2000, args.chunk,
        jax.random.PRNGKey(2),
    )
    est = (1000 * warm_ms + 2000 * post_ms) / 1e3
    per_frame = est / args.frames
    print(
        f"frames={args.frames}  warmup {warm_ms:.2f} ms/step  "
        f"post-warmup {post_ms:.2f} ms/step  batch-estimate {est:.1f} s  "
        f"per-frame {per_frame:.1f} s"
    )


if __name__ == "__main__":
    main()
