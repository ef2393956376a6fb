"""Photometric-ON benchmark: steady-state step cost with the surface
branch live.

Every shipped reference config sets photometric_loss weight to 0.0
(reference configs/.../config.json:124), so the branch never ran at
production scale; this captures its true TPU cost (sphere tracing
100 rays x bounded iterations + 11x11 patch homography warps per step,
reference scripts/main.py:689-853 + renderers.py:21-73).

Methodology (same as scripts/steptime.py): time one pre-compiled
post-warmup chunk per weight arm (photometric engages only in the RDF
phase) plus one warmup chunk (identical across arms), extrapolate to the
full 3000-step recipe (1000 warmup + 2000 RDF). Compile time is
excluded; the timed graphs are the production driver's own
`optimize_chunk`. Loss-value parity for the photometric/SSIM math is
covered separately by tests/test_losses.py's reference-golden cases;
the branch's gradients by tests/test_photometric_pipeline.py.

Writes PHOTOBENCH.json at the repo root.

Run: python scripts/photobench.py
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


def time_chunk(opt, params, opt_state, frame, cfg, start, n, key):
    """(ms/step, scalars) of an `optimize_chunk`, compile excluded."""
    out = opt.optimize_chunk(
        params, opt_state, frame, key, jnp.asarray(start), cfg, n
    )
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    out = opt.optimize_chunk(
        params, opt_state, frame, key, jnp.asarray(start), cfg, n
    )
    jax.block_until_ready(out[0])
    ms = (time.perf_counter() - t0) / n * 1e3
    return ms, out[2]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--views", type=int, default=17)
    parser.add_argument("--height", type=int, default=376)
    parser.add_argument("--width", type=int, default=1408)
    parser.add_argument("--instances", type=int, default=8)
    parser.add_argument("--chunk", type=int, default=100)
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
    warm_ms = None
    for weight in (0.0, 1.0):
        cfg = opt.OptimizationConfig(
            num_steps=3000,
            warmup_steps=1000,
            num_rays=1000,
            num_samples=100,
            checkpoint_interval=args.chunk,
            photometric_weight=weight,
        )
        params = opt.init_params(
            jax.random.PRNGKey(1), args.instances, cfg
        )
        tx = opt.make_optimizer(cfg, params)
        opt_state = tx.init(params)
        if warm_ms is None:
            # warmup phase has no photometric branch (RDF-gated):
            # time it once, reuse for both arms
            warm_ms, _ = time_chunk(
                opt, params, opt_state, frame, cfg, 0, args.chunk,
                jax.random.PRNGKey(2),
            )
        post_ms, scalars = time_chunk(
            opt, params, opt_state, frame, cfg, 2000, args.chunk,
            jax.random.PRNGKey(2),
        )
        s_frame = (1000 * warm_ms + 2000 * post_ms) / 1e3
        key = f"w{weight:g}"
        results[key] = {
            "warmup_ms_per_step": round(warm_ms, 3),
            "post_ms_per_step": round(post_ms, 3),
            "s_per_frame_3000": round(s_frame, 3),
            "photometric_loss_last": float(
                np.asarray(
                    scalars.get("photometric_loss", jnp.zeros(1))
                )[-1]
            ),
        }
        print(key, results[key], flush=True)

    delta = (
        results["w1"]["s_per_frame_3000"] - results["w0"]["s_per_frame_3000"]
    )
    report = {
        "workload": vars(args),
        "recipe_note": "full bench workload (17 views 376x1408, 1000 "
        "rays, 100+100 samples); photometric branch adds sphere tracing "
        "(100 rays, bounded while_loop) + 11x11 patch homography warps "
        "per RDF step; per-step times are steady-state (compile "
        "excluded), timed on the production optimize_chunk",
        "results": results,
        "photometric_overhead_ms_per_step": round(
            results["w1"]["post_ms_per_step"]
            - results["w0"]["post_ms_per_step"], 3,
        ),
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
