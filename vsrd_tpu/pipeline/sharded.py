"""Multi-chip training step: dp (frames) x sp (rays) over a device mesh.

TPU-native replacement for the reference's distributed runtime
(`/root/reference/vsrd/distributed/`): the reference shards *frames*
across ranks with no gradient communication (README.md:128). Here that
frame axis maps onto a ``dp`` mesh axis, and — beyond reference parity —
the per-frame ray batch is sharded over an ``sp`` axis with a `psum`
on the silhouette/eikonal reductions, so a single frame can ride
multiple chips' ICI when its ray workload grows. Everything is one
`shard_map` under `jit`; XLA inserts the collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import box_parameters, hyper_field
from ..ops import iou2d, matching, sampling
from ..rendering import pallas_field, renderer, scene
from . import optimize as opt_mod
from .frame import FrameData, ray_directions_at


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


def _ray_sharded_loss(params, frame: FrameData, step, key, cfg, use_rdf: bool):
    """compute_loss with the ray batch split over the 'sp' mesh axis.

    Matching/projection terms are computed replicated (they are tiny);
    the renderer runs on a per-device slice of the sampled rays and the
    silhouette/eikonal reductions are `psum`-ed back. Must run inside a
    shard_map with an 'sp' axis whose size divides cfg.num_rays.
    """
    n = frame.max_instances
    sp_size = jax.lax.axis_size("sp")
    sp_rank = jax.lax.axis_index("sp")
    local_rays = cfg.num_rays // sp_size

    decoded = box_parameters.decode_boxes(params["boxes"])
    corners_world = decoded["boxes_3d"]
    cam_corners, pd_boxes_2d = opt_mod._project_boxes_all_views(corners_world, frame)

    pd_flat = pd_boxes_2d[frame.target_index].reshape(n, 4)
    gt_flat = frame.gt_boxes_2d[frame.target_index].reshape(n, 4)
    cost = -iou2d.distance_box_iou(pd_flat, gt_flat)
    row_to_col = matching.masked_linear_sum_assignment(
        jax.lax.stop_gradient(cost), frame.valid, frame.valid
    )

    gt_matched = jnp.take(frame.gt_boxes_2d, row_to_col, axis=1)
    vis_matched = jnp.take(frame.visible, row_to_col, axis=1)
    pair_mask = vis_matched & frame.valid[None, :]
    pd_xyxy = pd_boxes_2d.reshape(-1, n, 4)
    gt_xyxy = gt_matched.reshape(-1, n, 4)
    iou_loss = opt_mod._masked_mean(
        iou2d.distance_box_iou_loss(pd_xyxy, gt_xyxy), pair_mask
    )
    l1 = iou2d.smooth_l1(pd_xyxy, gt_xyxy)
    l1_loss = opt_mod._masked_mean(
        l1, pair_mask[..., None] & jnp.ones_like(l1, bool)
    )

    progress = step.astype(jnp.float32) / cfg.num_steps
    temperature = opt_mod.cosine_annealing(
        progress, cfg.max_sdf_union_temperature, cfg.min_sdf_union_temperature
    )
    std = opt_mod.cosine_annealing(
        progress, cfg.max_sdf_std_deviation, cfg.min_sdf_std_deviation
    )

    field_weights = None
    if use_rdf:
        field_weights = hyper_field.hypernetwork_apply(
            params["hyper"], decoded["embeddings"]
        )

    use_pallas = cfg.use_pallas and pallas_field.pallas_supported()
    field = None
    field_with_grad = None
    if use_pallas:
        from ..rendering import fused_field

        n8 = (n + 7) // 8 * 8
        statics = fused_field.FieldStatics(
            num_instances=n8,
            num_frequencies=cfg.num_frequencies,
            position_scale=cfg.position_scale,
            out_channels_list=tuple(cfg.field_channels),
            use_rdf=use_rdf,
            field_dtype=None,
            matmul_precision=cfg.pallas_matmul_precision,
        )
        pad = n8 - n

        def pad_rows(x, fill=0.0):
            if pad == 0:
                return x
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=fill)

        locations_p = pad_rows(decoded["locations"])
        rotations_p = (
            decoded["orientations"]
            if pad == 0
            else jnp.concatenate(
                [decoded["orientations"],
                 jnp.broadcast_to(jnp.eye(3), (pad, 3, 3))], axis=0,
            )
        )
        dimensions_p = pad_rows(decoded["dimensions"], fill=1.0)
        valid_f = pad_rows(frame.valid.astype(jnp.float32))
        layers = (
            fused_field.build_interleaved_layers(
                pad_rows(field_weights),
                in_channels=3 * cfg.num_frequencies * 2,
                out_channels_list=cfg.field_channels,
            )
            if use_rdf
            else ()
        )

        def field_with_grad(positions):
            shape = positions.shape[:-1]
            u, w, g = pallas_field.fused_field_with_grad(
                statics, cfg.pallas_tile, positions.reshape(-1, 3),
                locations_p, rotations_p, dimensions_p, valid_f, layers,
                temperature,
            )
            return (
                u.reshape(shape),
                w[:, :n].reshape(*shape, n),
                g.reshape(*shape, 3),
            )

    else:
        packed_weights = None
        if use_rdf:
            packed_weights = tuple(
                hyper_field.pack_block_diagonal(
                    field_weights,
                    in_channels=3 * cfg.num_frequencies * 2,
                    out_channels_list=cfg.field_channels,
                )
            )
        scene_params = scene.SceneParams(
            locations=decoded["locations"],
            rotations=decoded["orientations"],
            half_dimensions=decoded["dimensions"],
            valid=frame.valid,
            packed_weights=packed_weights,
            field_dtype=jnp.dtype(cfg.field_dtype) if cfg.field_dtype else None,
        )
        field = scene.soft_scene_field(
            scene_params, temperature, cfg.position_scale,
            cfg.num_frequencies, cfg.field_channels,
        )

    # replicated sampling (same key on every sp member), local slice render
    key_rays, key_render = jax.random.split(key)
    cand_idx = sampling.multinomial_logits(
        key_rays, frame.candidate_weights, cfg.num_rays
    )
    ray_idx = frame.candidate_indices[cand_idx]
    local_idx = jax.lax.dynamic_slice_in_dim(
        ray_idx, sp_rank * local_rays, local_rays
    )
    origins, directions = ray_directions_at(frame, local_idx)

    out = renderer.hierarchical_render(
        field, origins, directions, cfg.distance_range, cfg.num_samples,
        std, progress, key=jax.random.fold_in(key_render, sp_rank),
        field_with_grad=field_with_grad,
    )
    targets = frame.soft_masks_flat[local_idx].astype(out.features.dtype)
    targets = jnp.take(targets, row_to_col, axis=-1)
    bce = opt_mod._binary_cross_entropy(out.features, targets)
    bce_mask = jnp.broadcast_to(frame.valid[None, :], bce.shape).astype(bce.dtype)

    bce_sum = jax.lax.psum(jnp.sum(bce * bce_mask), "sp")
    bce_cnt = jax.lax.psum(jnp.sum(bce_mask), "sp")
    silhouette_loss = bce_sum / jnp.clip(bce_cnt, min=1e-12)

    if use_rdf:
        sq = jnp.square(jnp.linalg.norm(out.gradients, axis=-1) - 1.0)
        eik = jax.lax.psum(jnp.sum(sq), "sp") / jax.lax.psum(
            jnp.asarray(sq.size, jnp.float32), "sp"
        )
    else:
        eik = jnp.zeros(())

    total = (
        cfg.iou_projection_weight * iou_loss
        + cfg.l1_projection_weight * l1_loss
        + cfg.silhouette_weight * silhouette_loss
        + cfg.eikonal_weight * eik
    )
    aux = {
        "losses": {
            "iou_projection_loss": iou_loss,
            "l1_projection_loss": l1_loss,
            "silhouette_loss": silhouette_loss,
            "eikonal_loss": eik,
        },
        "row_to_col": row_to_col,
        "cam_corners_target": cam_corners[frame.target_index],
    }
    return total, aux


def make_sharded_train_step(mesh: Mesh, cfg: opt_mod.OptimizationConfig):
    """Build a jitted dp x sp training step over stacked frames.

    Input pytrees carry a leading frame axis sharded over 'dp'; rays are
    sharded over 'sp' inside. Returns ``step_fn(params_b, opt_b,
    frames_b, step, key) -> (params_b, opt_b, scalars_b)``.
    """

    def per_frame_step(params, opt_state, frame, step, key, tx):
        def warm(p):
            return jax.value_and_grad(
                lambda q: _ray_sharded_loss(q, frame, step, key, cfg, False),
                has_aux=True,
            )(p)

        def post(p):
            return jax.value_and_grad(
                lambda q: _ray_sharded_loss(q, frame, step, key, cfg, True),
                has_aux=True,
            )(p)

        (loss, aux), grads = jax.lax.cond(step >= cfg.warmup_steps, post, warm, params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = opt_mod.compute_metrics(
            frame, aux["cam_corners_target"], aux["row_to_col"]
        )
        scalars = {"loss": loss, **aux["losses"], **metrics}
        return params, opt_state, scalars

    def shard_body(params_b, opt_b, frames_b, step, key):
        tx = make_optimizer_like(cfg, params_b)

        def one(params, opt_state, frame, frame_id):
            frame_key = jax.random.fold_in(key, frame_id)
            step_key = jax.random.fold_in(frame_key, step)
            return per_frame_step(params, opt_state, frame, step, step_key, tx)

        dp_rank = jax.lax.axis_index("dp")
        local_n = jax.tree.leaves(params_b)[0].shape[0]
        frame_ids = dp_rank * local_n + jnp.arange(local_n)
        return jax.vmap(one)(params_b, opt_b, frames_b, frame_ids)

    from jax.experimental.shard_map import shard_map

    frame_specs = P("dp")
    sharded = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(frame_specs, frame_specs, frame_specs, P(), P()),
        out_specs=(frame_specs, frame_specs, frame_specs),
        check_rep=False,
    )
    return jax.jit(sharded)


def make_optimizer_like(cfg, params_example):
    """Per-frame optimizer built from unbatched leaves (vmap-safe)."""
    return opt_mod.make_optimizer(cfg, params_example)


def init_sharded_state(key, num_frames, max_instances, cfg, mesh: Mesh):
    """Stacked per-frame params/opt-state, placed sharded over 'dp'."""
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
