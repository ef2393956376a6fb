"""On-device step profiler: trace one optimize_chunk and aggregate the
xplane by HLO op.

Wraps the NOTES.md "How to profile" recipe into a tool: runs a compiled
100-step chunk of either phase at the full recipe, captures a device
trace, and prints per-step ms by op (and by op category) — the numbers
quoted in NOTES.md's step profiles.

Usage:
  python scripts/profile.py                  # post-warmup phase
  python scripts/profile.py --phase warmup
  python scripts/profile.py --instances 16 --top 30
"""

import argparse
import collections
import glob
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# async DMA starts overlap compute (span without occupying it) and the
# jit_* / bare-number lines are harness framing, not device work
_SKIP = ("%copy-start", "jit_")


def aggregate(trace_dir, steps):
    os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python"
    )
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit(
            f"no .xplane.pb under {trace_dir} — the profiler produced no "
            "device trace (non-TPU backend, or the trace failed)"
        )
    path = paths[0]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    by_op = collections.Counter()
    by_cat = collections.Counter()
    for plane in xs.planes:
        if "/device:TPU" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                if name.startswith(_SKIP) or name.isdigit():
                    continue
                by_op[name] += ev.duration_ps
                cat = re.match(r"%([a-z_\-]+)", name)
                by_cat[cat.group(1) if cat else name] += ev.duration_ps
    # the scan/cond shells (%while.N / %conditional.N wrapping the whole
    # step) nest all real work — drop any such event within 15% of the
    # largest one so leaves don't double count; inner whiles (e.g. the
    # matcher's solver loop) are far smaller and survive
    total_ps = max(by_op.values(), default=1)
    leaves = {
        k: v for k, v in by_op.items()
        if not (k.startswith(("%while", "%conditional")) and v > 0.85 * total_ps)
    }
    return leaves, by_cat, steps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--phase", choices=["warmup", "post"], default="post")
    parser.add_argument("--views", type=int, default=17)
    parser.add_argument("--instances", type=int, default=8)
    parser.add_argument("--rays", type=int, default=1000)
    parser.add_argument("--samples", type=int, default=100)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--top", type=int, default=20)
    parser.add_argument("--trace-dir", default="/tmp/vsrd_tpu_trace")
    args = parser.parse_args()

    from vsrd_tpu.pipeline import frame as fm, optimize as opt

    cfg = opt.OptimizationConfig(
        num_steps=3000, warmup_steps=1000, num_rays=args.rays,
        num_samples=args.samples, checkpoint_interval=args.steps,
    )
    frame = fm.synthetic_frame(
        jax.random.PRNGKey(0), num_views=args.views,
        image_size=(376, 1408), num_instances=args.instances,
        max_instances=args.instances,
    )
    jax.block_until_ready(frame.soft_masks_flat)
    params = opt.init_params(jax.random.PRNGKey(1), args.instances, cfg)
    tx = opt.make_optimizer(cfg, params)
    opt_state = tx.init(params)
    start = jnp.asarray(0 if args.phase == "warmup" else 2000)

    def run():
        out = opt.optimize_chunk(
            params, opt_state, frame, jax.random.PRNGKey(2), start, cfg,
            args.steps,
        )
        jax.block_until_ready(out[0])

    run()  # compile
    t0 = time.perf_counter()
    run()
    wall = (time.perf_counter() - t0) / args.steps * 1e3
    print(f"{args.phase} chunk: {wall:.3f} ms/step wall")

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    jax.profiler.start_trace(args.trace_dir)
    run()
    jax.profiler.stop_trace()

    by_op, by_cat, steps = aggregate(args.trace_dir, args.steps)
    print("\nper-op (leaf, ms/step):")
    for name, ps in sorted(by_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {ps/1e9/steps:8.4f}  {name[:90]}")
    print("\nby category (ms/step, includes wrapper nesting):")
    for name, ps in by_cat.most_common(args.top):
        print(f"  {ps/1e9/steps:8.4f}  {name}")


if __name__ == "__main__":
    main()
