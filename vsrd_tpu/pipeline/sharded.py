"""Multi-chip training step: dp (frames) x sp (rays) over a device mesh.

TPU-native replacement for the reference's distributed runtime
(`/root/reference/vsrd/distributed/`): the reference shards *frames*
across ranks with no gradient communication (README.md:128). Here that
frame axis maps onto a ``dp`` mesh axis, and — beyond reference parity —
the per-frame ray batch is sharded over an ``sp`` axis with a `psum`
on the silhouette/eikonal reductions, so a single frame can ride
multiple chips' ICI when its ray workload grows. Everything is one
`shard_map` under `jit`; XLA inserts the collectives.

The loss itself is `optimize.compute_loss(sp_axis="sp")` — the SAME
implementation as the single-chip pipeline (matching, projection,
rendering, BCE, annealing), with only the ray slice and the psum
reductions parameterized. There is deliberately no second loss copy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import optimize as opt_mod
from .frame import FrameData


def make_mesh(devices=None, dp: int | None = None, sp: int | None = None) -> Mesh:
    """Build a 2D (dp, sp) mesh over the given devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and sp is None:
        sp = 1
        dp = n
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    assert dp * sp == n, f"mesh {dp}x{sp} != {n} devices"
    return Mesh(np.asarray(devices).reshape(dp, sp), ("dp", "sp"))


def make_sharded_train_step(mesh: Mesh, cfg: opt_mod.OptimizationConfig,
                            with_ray_schedule: bool = False):
    """Build a jitted dp x sp training step over stacked frames.

    Input pytrees carry a leading frame axis sharded over 'dp'; rays are
    sharded over 'sp' inside. Returns ``step_fn(params_b, opt_b,
    frames_b, step, key) -> (params_b, opt_b, scalars_b)``.

    ``with_ray_schedule=True`` appends a ``ray_indices [F, R]`` argument
    (dp-sharded, sp-sliced inside compute_loss) that bypasses the Gumbel
    ray draw — used by the deterministic sp-equivalence test
    (tests/test_pipeline.py) and parity experiments.
    """

    def shard_body(params_b, opt_b, frames_b, step, key, ray_indices=None):
        tx = opt_mod.make_optimizer(cfg, params_b)

        # train_step handles the local frame batch natively (one Pallas
        # kernel with a frame grid axis — `vmap` of the kernel builds a
        # module the TPU compile service rejects). Stochastic draws are
        # shaped [local_F, ...] under a rank-folded key, so they stay
        # independent across frames and dp ranks.
        dp_rank = jax.lax.axis_index("dp")
        step_key = jax.random.fold_in(jax.random.fold_in(key, dp_rank), step)
        return opt_mod.train_step(
            params_b, opt_b, frames_b, step, step_key, cfg, tx,
            ray_indices=ray_indices, sp_axis="sp",
        )

    from jax import shard_map

    frame_specs = P("dp")
    scalar_specs = (P(), P())
    ray_specs = (frame_specs,) if with_ray_schedule else ()
    sharded = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(frame_specs, frame_specs, frame_specs, *scalar_specs,
                  *ray_specs),
        out_specs=(frame_specs, frame_specs, frame_specs),
        check_vma=False,
    )
    return jax.jit(sharded)


def init_sharded_state(key, num_frames, max_instances, cfg, mesh: Mesh):
    """Stacked per-frame params/opt-state, placed sharded over 'dp'.

    The opt state is vmap-initialized so EVERY leaf (including the Adam
    step count) carries the frame axis — a uniform P('dp') spec then
    covers the whole pytree in the shard_map; the optimizer's bias
    correction broadcasts the per-frame count against batched leaves.
    """
    keys = jax.random.split(key, num_frames)
    params_b = jax.vmap(lambda k: opt_mod.init_params(k, max_instances, cfg))(keys)
    tx = opt_mod.make_optimizer(cfg, jax.tree.map(lambda x: x[0], params_b))
    opt_b = jax.vmap(tx.init)(params_b)
    sharding = NamedSharding(mesh, P("dp"))
    params_b = jax.device_put(params_b, sharding)
    opt_b = jax.device_put(opt_b, sharding)
    return params_b, opt_b


def stack_frames(frames: list[FrameData]) -> FrameData:
    """Stack equally-shaped FrameData along a new leading frame axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
