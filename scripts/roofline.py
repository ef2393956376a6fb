"""Roofline analysis of the fused field kernel (fine forward pass).

Counts the kernel-body work EXACTLY by walking the jaxpr of the same
per-tile math the Pallas kernel executes (`scene_eval_stacked_t`: the
shipped reverse-sweep spatial gradient by default, or the K=3
basis-tangent variant with --k3),
classifying each primitive as MXU (dot_general dense FLOPs),
transcendental VPU (exp/sin/cos/rsqrt/...), or plain VPU element ops;
then compares the measured kernel time against the per-unit bounds to
answer "which unit binds, and how close to its bound are we?".

Hardware model (TPU v5e, one chip; public spec):
  MXU peak (bf16 inputs, f32 accum): 197 TFLOP/s
  derived TensorCore clock: 197e12 / (4 MXUs * 128*128 * 2) = 1.5 GHz
  VPU lanes: 8x128 per VPU * 4 ALU slots  -> 6.3e12 elem-ops/s
  transcendental weight: ~3 VPU slots each (multi-pass approximations)
  HBM: 819 GB/s

Output: a `roofline` section merged into KERNELBENCH.json.

Run: python scripts/roofline.py [--instances 8 --points 200000]
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

MXU_PEAK = 197e12            # bf16 FLOP/s
VPU_PEAK = 6.3e12            # elementwise ops/s (8x128 x 4 slots x 1.5 GHz)
TRANSCENDENTAL_WEIGHT = 3.0  # VPU slots per exp/sin/rsqrt/... element
HBM_BW = 819e9               # bytes/s

TRANSCENDENTALS = {
    "exp", "log", "log1p", "expm1", "sin", "cos", "tan", "tanh",
    "logistic", "erf", "erfc", "rsqrt", "sqrt", "pow", "atan2",
    "cbrt", "exp2",
}
# primitives that do no vector work
FREE = {
    "broadcast_in_dim", "reshape", "convert_element_type", "squeeze",
    "transpose", "slice", "concatenate", "copy", "stop_gradient",
    "iota", "constant",
}


def count_ops(jaxpr):
    """Walk a (closed) jaxpr recursively: returns dict with
    mxu_flops (dense 2MKN), velems, telems."""
    totals = {"mxu_flops": 0, "velems": 0, "telems": 0}

    def visit(jpr):
        for eqn in jpr.eqns:
            name = eqn.primitive.name
            # recurse into sub-jaxprs (pjit, custom_jvp, scan, cond...)
            for param in eqn.params.values():
                sub = getattr(param, "jaxpr", None)
                if sub is not None:
                    visit(sub if hasattr(sub, "eqns") else sub.jaxpr)
                elif isinstance(param, (list, tuple)):
                    for p in param:
                        sub = getattr(p, "jaxpr", None)
                        if sub is not None:
                            visit(sub if hasattr(sub, "eqns") else sub.jaxpr)
            if name == "dot_general":
                dims = eqn.params["dimension_numbers"]
                lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
                (lc, rc), (lb, rb) = dims
                m = int(np.prod([d for i, d in enumerate(lhs.shape)
                                 if i not in set(lc) | set(lb)]))
                k = int(np.prod([lhs.shape[i] for i in lc]))
                n_ = int(np.prod([d for i, d in enumerate(rhs.shape)
                                  if i not in set(rc) | set(rb)]))
                b = int(np.prod([lhs.shape[i] for i in lb])) if lb else 1
                totals["mxu_flops"] += 2 * b * m * k * n_
            elif name in FREE:
                continue
            else:
                elems = sum(
                    int(np.prod(v.aval.shape)) for v in eqn.outvars
                    if hasattr(v.aval, "shape")
                )
                if name in TRANSCENDENTALS:
                    totals["telems"] += elems
                else:
                    totals["velems"] += elems

    visit(jaxpr.jaxpr if hasattr(jaxpr, "jaxpr") else jaxpr)
    return totals


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--points", type=int, default=200_000)
    parser.add_argument("--instances", type=int, default=8)
    parser.add_argument("--tile", type=int, default=1024)
    parser.add_argument("--reps", type=int, default=20)
    parser.add_argument("--k3", action="store_true",
                        help="analyze the K=3 basis-tangent fine forward "
                             "instead of the shipped reverse-sweep path")
    args = parser.parse_args()

    from vsrd_tpu.rendering import fused_field as ff, pallas_field as pf

    n = args.instances
    rng = np.random.default_rng(0)
    statics = ff.FieldStatics(
        num_instances=n, use_rdf=True, field_dtype=None,
        matmul_precision="default", rev_grad=not args.k3,
    )
    w = jnp.asarray(rng.normal(size=(n, 1617)).astype(np.float32) * 0.3)
    mats = ff.build_interleaved_layers(w)
    loc = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 10)
    rot = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
    half = jnp.asarray(rng.uniform(0.5, 2.0, size=(n, 3)).astype(np.float32))
    valid = jnp.ones((n, 1), jnp.float32)

    # --- exact per-tile op counts from the kernel-body jaxpr ---
    t = args.tile
    pos_t = jnp.zeros((3, t), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda p, l, r, h, m: ff.scene_eval_stacked_t(
            p, l, r, h, valid, m, 0.5, statics
        )
    )(pos_t, loc, rot, half, mats)
    per_tile = count_ops(jaxpr)
    print(f"per-tile op counts: {per_tile}", flush=True)
    tiles = (args.points + t - 1) // t
    mxu_flops = per_tile["mxu_flops"] * tiles
    velems = per_tile["velems"] * tiles
    telems = per_tile["telems"] * tiles

    # --- measured kernel time (isolated fine forward, K=3) ---
    pos = jnp.asarray(
        rng.normal(size=(args.points, 3)).astype(np.float32) * 20
    )
    bwd_tile = 512

    @jax.jit
    def fwd(loc, half, mats):
        return pf.fused_field_with_grad(
            statics, (t, bwd_tile), pos, loc, rot, half,
            valid.reshape(-1), mats, 0.5,
        )

    print("compiling + first run...", flush=True)
    out = fwd(loc, half, mats)
    jax.block_until_ready(out)
    print("first run done; timing...", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fwd(loc, half, mats)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / args.reps * 1e3

    # --- bounds ---
    mxu_s = mxu_flops / MXU_PEAK
    vpu_ops = velems + TRANSCENDENTAL_WEIGHT * telems
    vpu_s = vpu_ops / VPU_PEAK
    # HBM: positions in + (u, w[N], grad3) out, f32; weights are tiny
    hbm_bytes = args.points * 4 * (3 + 1 + n + 3)
    hbm_s = hbm_bytes / HBM_BW
    measured_s = ms / 1e3

    binding = max(
        ("MXU", mxu_s), ("VPU", vpu_s), ("HBM", hbm_s), key=lambda kv: kv[1]
    )
    report = {
        "workload": {
            "points": args.points, "instances": n, "tile": t,
            "spatial_grad": "k3-tangents" if args.k3 else "reverse-sweep",
        },
        "counts": {
            "mxu_dense_flops": mxu_flops,
            "vpu_elem_ops": velems,
            "vpu_transcendental_elems": telems,
        },
        "assumptions": {
            "mxu_peak_flops": MXU_PEAK,
            "vpu_peak_elem_ops": VPU_PEAK,
            "transcendental_weight": TRANSCENDENTAL_WEIGHT,
            "hbm_bytes_per_s": HBM_BW,
        },
        "bounds_ms": {
            "mxu": mxu_s * 1e3,
            "vpu": vpu_s * 1e3,
            "hbm": hbm_s * 1e3,
        },
        "measured_ms": ms,
        "binding_unit": binding[0],
        "mxu_utilization": mxu_s / measured_s,
        "vpu_utilization": vpu_s / measured_s,
        "fraction_of_binding_bound": binding[1] / measured_s,
    }
    print(json.dumps(report, indent=2))

    kb_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "KERNELBENCH.json")
    data = {}
    if os.path.exists(kb_path):
        with open(kb_path) as f:
            data = json.load(f)
    key = f"N{n}_k3" if args.k3 else f"N{n}"
    data.setdefault("roofline", {})[key] = report
    with open(kb_path, "w") as f:
        json.dump(data, f, indent=2)
    print(f"merged into {kb_path}")


if __name__ == "__main__":
    main()
