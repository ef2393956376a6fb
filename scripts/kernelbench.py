"""Micro-benchmark of the fused field kernel: fwd and fwd+bwd in
isolation at the real workload's point counts (fine pass: 1000 rays x
200 samples = 200k points; coarse: 100k)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--points", type=int, default=200_000)
    parser.add_argument("--instances", type=int, default=8)
    parser.add_argument("--fwd-tile", type=int, default=1024)
    parser.add_argument("--bwd-tile", type=int, default=512)
    parser.add_argument("--no-rdf", action="store_true")
    parser.add_argument("--k3", action="store_true",
                        help="use the K=3 basis-tangent fine forward "
                             "instead of the shipped reverse-sweep path")
    args = parser.parse_args()

    from vsrd_tpu.models import hyper_field
    from vsrd_tpu.rendering import fused_field as ff, pallas_field as pf

    n = args.instances
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(args.points, 3)).astype(np.float32) * 20)
    loc = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 10)
    rot = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
    half = jnp.asarray(rng.uniform(0.5, 2.0, size=(n, 3)).astype(np.float32))
    valid = jnp.ones((n,), jnp.float32)
    use_rdf = not args.no_rdf
    statics = ff.FieldStatics(
        num_instances=n, use_rdf=use_rdf, field_dtype=None,
        matmul_precision="default", rev_grad=not args.k3,
    )
    w = jnp.asarray(rng.normal(size=(n, 1617)).astype(np.float32) * 0.3)
    mats = ff.build_interleaved_layers(w) if use_rdf else ()
    tile = (args.fwd_tile, args.bwd_tile)

    @jax.jit
    def fwd(loc, half, mats):
        u, wts, g = pf.fused_field_with_grad(
            statics, tile, pos, loc, rot, half, valid, mats, 0.5
        )
        return u, wts, g

    @jax.jit
    def fwdbwd(loc, half, mats):
        def loss(loc, half, mats):
            u, wts, g = pf.fused_field_with_grad(
                statics, tile, pos, loc, rot, half, valid, mats, 0.5
            )
            return jnp.sum(u) + jnp.sum(wts) + jnp.sum(jnp.square(g))

        return jax.grad(loss, argnums=(0, 1, 2))(loc, half, mats)

    f_ms = timeit(fwd, loc, half, mats)
    fb_ms = timeit(fwdbwd, loc, half, mats)
    variant = "k3" if args.k3 else "rev"
    print(
        f"P={args.points} N={n} rdf={use_rdf} tiles={tile} fwd={variant}: "
        f"fwd {f_ms:.2f} ms  fwd+bwd {fb_ms:.2f} ms  bwd {fb_ms - f_ms:.2f} ms"
    )


if __name__ == "__main__":
    main()
