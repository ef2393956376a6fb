"""Per-frame optimization: the fully-jitted 3000-step Adam loop.

TPU-native re-design of the reference training loop
(`/root/reference/scripts/main.py:323-865`): the whole per-frame
optimization is one `lax.scan` under `jit` —

* Hungarian matching runs on-device every step (ops/matching.py) instead
  of a scipy host sync (main.py:374-386);
* ray selection is Gumbel top-k over the precomputed soft-mask
  distribution (main.py:620-627);
* the warmup/post-warmup phase switch (main.py:525-618) is a
  `lax.cond` on the step index, so each phase compiles its own branch
  and the hypernetwork is only evaluated after warmup;
* annealing schedules are pure functions of the step carried through
  the scan (main.py:420-431);
* metrics (3D/BEV IoU vs GT) are computed on-device with the jittable
  polygon clip (ops/iou3d.py) and returned as scan outputs, so logging
  never syncs the device inside the loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import box_parameters, hyper_field
from ..ops import geometry, iou2d, iou3d, matching, sampling
from ..rendering import fused_field, pallas_field, renderer, scene
from .frame import FrameData, ray_directions_at


@dataclasses.dataclass(frozen=True)
class OptimizationConfig:
    """Static hyperparameters (defaults mirror
    `/root/reference/configs/kitti_360/vsrd/*/config.json:115-238`)."""

    num_steps: int = 3000
    warmup_steps: int = 1000
    # volume rendering
    num_rays: int = 1000
    num_samples: int = 100          # coarse = fine = 100
    distance_range: tuple[float, float] = (0.0, 100.0)
    max_sdf_union_temperature: float = 1.0
    min_sdf_union_temperature: float = 0.1
    max_sdf_std_deviation: float = 1.0
    min_sdf_std_deviation: float = 0.1
    # loss weights (config.json:121-127)
    iou_projection_weight: float = 0.1
    l1_projection_weight: float = 1.0
    silhouette_weight: float = 1.0
    eikonal_weight: float = 0.01
    photometric_weight: float = 0.0
    # surface rendering (photometric branch; config.json:216-224)
    surface_num_rays: int = 100
    surface_num_iterations: int = 1000
    surface_convergence_criteria: float = 0.01
    surface_bounding_radius: float = 100.0
    surface_patch_size: tuple[int, int] = (11, 11)
    # optimizer (config.json:166-214)
    box_lr: float = 0.01
    embedding_lr: float = 1e-3
    hypernetwork_lr: float = 1e-4
    lr_decay: float = 0.01 ** (1.0 / 3000.0)
    # model (config.json:128-160)
    num_features: int = 256
    num_frequencies: int = 8
    field_channels: tuple[int, ...] = (16, 16, 16, 16)
    hyper_channels: tuple[int, ...] = (256, 256, 256, 256)
    # numerics
    checkpoint_interval: int = 500
    metric_interval: int = 50
    remat_fields: bool = False
    field_dtype: str | None = "bfloat16"  # RDF MLP compute dtype (None = f32)
    use_pallas: bool = True               # fused field kernel on TPU
    pallas_tile: int = 1024               # points per kernel grid step
    pallas_bwd_tile: int = 2048           # backward (fused reverse) tile
    # warmup box-only kernels are elementwise-tiny: a large tile
    # amortizes the grid-step latency that dominates them
    pallas_box_tile: int = 8192
    # 'default': one-pass bf16-multiply/f32-accumulate MXU matmuls in the
    # kernel (~4 mm SDF error, 4x faster); 'highest': exact f32
    pallas_matmul_precision: str = "default"
    # Coarse pass via a single directional tangent (K=1) instead of the
    # full spatial gradient (K=3): the gradient-stopped coarse render
    # consumes only NeuS section cosines, which equal the directional
    # derivative along the unit ray when |grad sdf| = 1 (the eikonal
    # regime). Approximation only affects *where* fine samples land;
    # auto-disabled in strict-parity mode (matmul precision 'highest').
    pallas_dir_coarse: bool = True
    # Coarse pass on the box SDF union only (no RDF MLP): the residual
    # is a non-negative sigmoid added to the box SDF, so the true
    # surface always lies inside the box isosurface — box-only coarse
    # weights cover it, and the fine pass (which re-evaluates the full
    # field at the merged coarse+importance samples) corrects the
    # placement. Same gating as pallas_dir_coarse. Default ON per the
    # round-4 A/B: paired per-trial GT-IoU deltas vs the full-RDF coarse
    # arm are within seed noise on both scenes (NOISE_FLOOR_boxcoarse
    # .json, tools/parity/PARITY.md) and it saves 0.9 ms/step at 8
    # instances (8.33 -> 7.46) and 3.3 ms at 32 (34.4 -> 31.0).
    pallas_box_coarse: bool = True
    # Fine-forward spatial gradient via ONE reverse sweep w.r.t. the
    # query position instead of 3 forward basis tangents (grad_x u =
    # sum_i w_i (1 + (u - d_i)/tau) grad_x d_i; per group: primal
    # forward + position-only transpose). Exact same math — only the
    # AD direction changes — but drops the per-layer LN-JVP triple
    # chains and the 4T-wide stacked matmuls. Auto-disabled in
    # strict-parity mode so 'highest' keeps the historical
    # forward-tangent rounding bit-for-bit.
    pallas_rev_grad: bool = True
    # Per-tile instance-group skipping for scenes with > 8 instances:
    # instances are azimuth-sorted into spatially coherent groups of 8,
    # rays azimuth-sorted so kernel tiles are direction-coherent, and
    # each kernel grid step only evaluates groups whose lower-bound
    # distance comes within `margin + 12 * temperature` meters of the
    # union distance's upper bound for some point of the tile
    # (fused_field.group_tile_mask — a RELATIVE gap criterion, since
    # softmin weights are exp(-(d_g - u)/tau); the nearest group is
    # always kept). Dropped terms are O(e^-12) in the softmin weights /
    # NeuS alphas / eikonal gradients.
    #
    # Default OFF: measured on TPU v5e with the realistic KITTI-spread
    # bench layout (z in [5, 80]), the sound relative criterion keeps
    # ~100% of (group, tile) pairs — ray tiles span the full sample
    # depth range, and at far samples the softmin genuinely mixes
    # groups — so the cond + two-pass-backward overhead only costs:
    # 16-instance step 15.10 -> 19.77 ms, and the 4-group backward
    # blows up Mosaic compile time (>10 min). The earlier ABSOLUTE
    # keep criterion (distance-to-tile < threshold) did skip, but
    # corrupts eikonal gradients up to 2x at samples where two distant
    # groups tie (see tests/test_group_skip.py tied-points case).
    # Kept as an option for genuinely clustered scenes; correctness is
    # locked by tests/test_group_skip.py either way.
    pallas_group_skip: bool = False
    # parity/debug mode: midpoint quadrature + linspace importance
    # samples instead of stratified jitter (matches the reference
    # samplers' own deterministic modes, samplers.py:5-8,17-19)
    deterministic: bool = False

    @property
    def position_scale(self) -> float:
        return max(self.distance_range)


def cosine_annealing(progress, maximum, minimum):
    """(cos(pi x) + 1)/2 * (a - b) + b (reference main.py:420)."""
    return (jnp.cos(jnp.pi * progress) + 1.0) / 2.0 * (maximum - minimum) + minimum


def init_params(key: jax.Array, max_instances: int, cfg: OptimizationConfig):
    """Per-frame learnable pytree: box parameters + hypernetwork."""
    k_box, k_hyper = jax.random.split(key)
    boxes = box_parameters.init_box_parameters(
        k_box, 1, max_instances, cfg.num_features
    )
    boxes = {k: v[0] for k, v in boxes.items()}  # drop batch dim (B=1)
    hyper = hyper_field.init_hyper_field(
        k_hyper,
        in_channels=3 * cfg.num_frequencies * 2,
        out_channels_list=cfg.field_channels,
        hyper_in_channels=cfg.num_features,
        hyper_out_channels_list=cfg.hyper_channels,
    )
    return {"boxes": boxes, "hyper": hyper}


def make_optimizer(cfg: OptimizationConfig, params_example) -> optax.GradientTransformation:
    """Adam with per-group LRs and exponential decay.

    Mirrors the reference param groups (config.json:177-202): box
    location/dimension/orientation at ``box_lr``, embeddings at
    ``embedding_lr``, hypernetwork at ``hypernetwork_lr``; torch
    ExponentialLR(gamma) applied every step.

    torch.optim.Adam skips parameters whose grad is None, so in the
    reference the embeddings/hypernetwork (first used after warmup,
    main.py:525-527) start their Adam step count at the first
    post-warmup step. Mirrored here with a per-group bias-correction
    offset of ``warmup_steps`` — without it the first post-warmup
    update of those groups is ~2x smaller and the trajectories diverge
    from the reference immediately.
    """

    def lr_of(path):
        names = [getattr(p, "key", getattr(p, "idx", "")) for p in path]
        if names[0] == "hyper":
            return cfg.hypernetwork_lr
        if names[1] == "embeddings":
            return cfg.embedding_lr
        return cfg.box_lr

    def count_offset_of(path):
        names = [getattr(p, "key", getattr(p, "idx", "")) for p in path]
        if names[0] == "hyper" or names[1] == "embeddings":
            return float(cfg.warmup_steps)
        return 0.0

    lr_tree = jax.tree_util.tree_map_with_path(
        lambda path, leaf: lr_of(path), params_example
    )
    offset_tree = jax.tree_util.tree_map_with_path(
        lambda path, leaf: count_offset_of(path), params_example
    )
    b1, b2, eps = 0.9, 0.999, 1e-8

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return {
            "mu": zeros,
            "nu": jax.tree.map(jnp.zeros_like, params),
            "count": jnp.zeros((), jnp.int32),
        }

    def update_fn(updates, state, params=None):
        del params
        count = state["count"]
        mu = jax.tree.map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state["mu"], updates
        )
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g),
            state["nu"],
            updates,
        )

        def direction(m, v, lr, offset):
            # count may be a lockstep scalar OR carry a leading frame
            # axis (vmap-initialized sharded state); right-pad it so it
            # broadcasts against [F, ...]-shaped leaves either way
            c = count.astype(jnp.float32).reshape(
                count.shape + (1,) * (m.ndim - count.ndim)
            )
            decay = cfg.lr_decay ** c
            t = jnp.maximum(c + 1.0 - offset, 1.0)
            m_hat = m / (1.0 - b1**t)
            v_hat = v / (1.0 - b2**t)
            return -lr * decay * m_hat / (jnp.sqrt(v_hat) + eps)

        updates = jax.tree.map(direction, mu, nu, lr_tree, offset_tree)
        return updates, {"mu": mu, "nu": nu, "count": count + 1}

    return optax.GradientTransformation(init_fn, update_fn)


def _project_boxes_all_views(corners_world, frame: FrameData):
    """World corners [N, 8, 3] -> clipped 2D boxes [V, N, 2, 2] in every
    view (reference main.py:339-367)."""
    cam = geometry.transform_points(
        frame.extrinsics[:, None], corners_world[None]
    )  # [V, N, 8, 3]
    boxes_2d = jax.vmap(
        lambda corners_v, k: jax.vmap(
            lambda c: geometry.project_box_3d(c, k)
        )(corners_v)
    )(cam, frame.intrinsics)
    boxes_2d = geometry.clip_boxes_to_image(boxes_2d, frame.image_size)
    return cam, boxes_2d


def _masked_mean(values, mask, epsilon=1e-12, axis_name=None, axis=None):
    """Mean over masked entries; with ``axis_name`` the numerator and
    denominator are psum-ed over that mesh axis (ray-sharded mode).
    ``axis`` restricts the reduction (e.g. ``(-2, -1)`` keeps a leading
    frame axis); default reduces everything."""
    mask = jnp.broadcast_to(mask, values.shape).astype(values.dtype)
    num = jnp.sum(values * mask, axis=axis)
    den = jnp.sum(mask, axis=axis)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.clip(den, min=epsilon)


def _binary_cross_entropy(probs, targets, epsilon=1e-6):
    probs = jnp.clip(probs, epsilon, 1.0 - epsilon)
    return -(targets * jnp.log(probs) + (1.0 - targets) * jnp.log1p(-probs))


def compute_loss(
    params: dict,
    frame: FrameData,
    step: jax.Array,
    key: jax.Array,
    cfg: OptimizationConfig,
    use_rdf: bool,
    ray_indices: jax.Array | None = None,
    sp_axis: str | None = None,
):
    """One forward pass: projection + silhouette (+ eikonal) losses.

    ``use_rdf`` selects the post-warmup phase (residual field + eikonal,
    reference main.py:525-618,679-687) — a static flag so each phase
    compiles only what it needs. ``ray_indices [R]`` optionally overrides
    the per-step multinomial ray selection with a precomputed schedule
    (flat (view, y, x) pixel indices) — used by the parity harness so the
    torch reference and this pipeline render identical rays.

    ``sp_axis`` enables ray sharding inside a `shard_map`: the (same-key,
    replicated) ray draw is sliced per axis member, the renderer runs on
    the local slice, and the silhouette/eikonal reductions are psum-ed —
    ONE loss implementation serves both the single-chip and the dp x sp
    sharded pipelines.

    Batched mode: when ``frame`` carries a leading frame axis (stacked
    co-optimized frames, params with matching leading axis), the
    per-frame blocks run under `vmap` and the field evaluation runs as
    ONE Pallas kernel with a frame grid axis — the returned ``total``
    is then a per-frame vector ``[F]`` (sum it for the gradient; each
    frame's params only receive gradients from its own loss).
    """
    batched = frame.valid.ndim == 2
    n = frame.max_instances

    def _frame_projection(boxes_params, frame):
        decoded = box_parameters.decode_boxes(boxes_params)
        corners_world = decoded["boxes_3d"]  # [N, 8, 3]

        cam_corners, pd_boxes_2d = _project_boxes_all_views(
            corners_world, frame
        )

        # -------------- bipartite matching (target view) --------------
        pd_flat = pd_boxes_2d[frame.target_index].reshape(n, 4)
        gt_flat = frame.gt_boxes_2d[frame.target_index].reshape(n, 4)
        cost = -iou2d.distance_box_iou(pd_flat, gt_flat)
        row_to_col = matching.masked_linear_sum_assignment(
            jax.lax.stop_gradient(cost), frame.valid, frame.valid
        )

        # -------------- projection losses over all views --------------
        gt_matched = jnp.take(frame.gt_boxes_2d, row_to_col, axis=1)
        vis_matched = jnp.take(frame.visible, row_to_col, axis=1)
        pair_mask = vis_matched & frame.valid[None, :]

        pd_xyxy = pd_boxes_2d.reshape(-1, n, 4)
        gt_xyxy = gt_matched.reshape(-1, n, 4)
        iou_loss = _masked_mean(
            iou2d.distance_box_iou_loss(pd_xyxy, gt_xyxy), pair_mask
        )
        l1 = iou2d.smooth_l1(pd_xyxy, gt_xyxy)
        l1_loss = _masked_mean(
            l1, pair_mask[..., None] & jnp.ones_like(l1, bool)
        )
        return (
            decoded,
            cam_corners[frame.target_index],
            row_to_col,
            iou_loss,
            l1_loss,
        )

    proj_fn = jax.vmap(_frame_projection) if batched else _frame_projection
    decoded, cam_corners_target, row_to_col, iou_loss, l1_loss = proj_fn(
        params["boxes"], frame
    )

    # ---------------- annealing ----------------
    progress = step.astype(jnp.float32) / cfg.num_steps
    temperature = cosine_annealing(
        progress, cfg.max_sdf_union_temperature, cfg.min_sdf_union_temperature
    )
    std = cosine_annealing(
        progress, cfg.max_sdf_std_deviation, cfg.min_sdf_std_deviation
    )
    cosine_ratio = progress

    # ---------------- scene field ----------------
    field_weights = None
    if use_rdf:
        apply_fn = (
            jax.vmap(hyper_field.hypernetwork_apply) if batched
            else hyper_field.hypernetwork_apply
        )
        field_weights = apply_fn(params["hyper"], decoded["embeddings"])

    use_pallas = cfg.use_pallas and pallas_field.pallas_supported()
    # Single source of truth for whether group skipping engages (kernel
    # statics AND the ray azimuth-sort below must agree; a drifted
    # re-derivation would silently desync tile skipping from ray order).
    group_skip = use_pallas and cfg.pallas_group_skip and (n + 7) // 8 * 8 > 8
    field = None
    field_with_grad = None
    if use_pallas:
        # Mosaic layouts want the instance-slab row count to be a sublane
        # multiple; pad the scene to N8 = ceil(N/8)*8 (padded slots are
        # invalid and their outputs are sliced away).
        n8 = (n + 7) // 8 * 8
        statics = fused_field.FieldStatics(
            num_instances=n8,
            num_frequencies=cfg.num_frequencies,
            position_scale=cfg.position_scale,
            out_channels_list=tuple(cfg.field_channels),
            use_rdf=use_rdf,
            # in-kernel compute stays f32: all activations live in VMEM
            # (bf16 saves nothing) and Mosaic lacks bf16 compare ops
            field_dtype=None,
            matmul_precision=cfg.pallas_matmul_precision,
            group_skip=group_skip,
            rev_grad=(
                cfg.pallas_rev_grad
                and cfg.pallas_matmul_precision != "highest"
            ),
        )
        pad = n8 - n

        def pad_rows(x, fill=0.0):
            if pad == 0:
                return x
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=fill)

        def _scene_inputs(decoded_f, valid_bool, field_weights_f):
            locations = decoded_f["locations"]
            orientations = decoded_f["orientations"]
            dimensions = decoded_f["dimensions"]
            if group_skip:
                # azimuth-sort instances so each group of 8 is spatially
                # coherent (group skipping fires per group; interleaved
                # groups would never skip). Invalid slots sort last.
                # The permutation is a gather, so parameter gradients
                # scatter back through it; kernel weight outputs are
                # unpermuted in field_with_grad below.
                azimuth = jnp.arctan2(locations[:, 0], locations[:, 2])
                perm = jnp.argsort(jnp.where(valid_bool, azimuth, 1e9))
                inv_perm = jnp.argsort(perm)
                locations = jnp.take(locations, perm, axis=0)
                orientations = jnp.take(orientations, perm, axis=0)
                dimensions = jnp.take(dimensions, perm, axis=0)
                valid_bool = jnp.take(valid_bool, perm, axis=0)
                if use_rdf:
                    field_weights_f = jnp.take(field_weights_f, perm, axis=0)
            else:
                inv_perm = jnp.arange(n)
            locations_p = pad_rows(locations)
            rotations_p = (
                orientations
                if pad == 0
                else jnp.concatenate(
                    [
                        orientations,
                        jnp.broadcast_to(jnp.eye(3), (pad, 3, 3)),
                    ],
                    axis=0,
                )
            )
            dimensions_p = pad_rows(dimensions, fill=1.0)
            valid_f = pad_rows(valid_bool.astype(jnp.float32))
            layers = (
                fused_field.build_interleaved_layers(
                    pad_rows(field_weights_f),
                    in_channels=3 * cfg.num_frequencies * 2,
                    out_channels_list=cfg.field_channels,
                )
                if use_rdf
                else ()
            )
            return (locations_p, rotations_p, dimensions_p, valid_f, layers,
                    inv_perm)

        inputs_fn = (
            jax.vmap(_scene_inputs, in_axes=(0, 0, 0 if use_rdf else None))
            if batched
            else _scene_inputs
        )
        (locations_p, rotations_p, dimensions_p, valid_f, layers,
         inv_perm) = inputs_fn(decoded, frame.valid, field_weights)

        def _unpermute_weights(w):
            # [..., :n] kernel weight columns follow the permuted
            # instance order; map them back for downstream consumers
            if not group_skip:
                return w
            if batched:
                return jnp.take_along_axis(w, inv_perm[:, None, :], axis=-1)
            return jnp.take(w, inv_perm, axis=-1)

        if use_rdf:
            # The reverse kernel's recompute residuals are per-group slabs
            # ([C, tile]-sized chains per instance group), so its VMEM
            # footprint scales with groups x tile: 1 group x 2048 fits the
            # 100 MB scoped budget with headroom, 3 x 2048 overflows it by
            # ~10%. Cap groups x tile at 5120 (empirical, v5e) and keep
            # the tile a 256 multiple.
            num_groups = n8 // fused_field.group_size_of(n8)
            bwd_cap = max(256, (5120 // num_groups) // 256 * 256)
            tile = (cfg.pallas_tile, min(cfg.pallas_bwd_tile, bwd_cap))
        else:
            tile = (cfg.pallas_box_tile, cfg.pallas_box_tile)

        def field_with_grad(positions):
            shape = positions.shape[:-1]     # (F, R, S) or (R, S)
            lead = shape[:1] if batched else ()
            u, w, g = pallas_field.fused_field_with_grad(
                statics,
                tile,
                positions.reshape(*lead, -1, 3),
                locations_p,
                rotations_p,
                dimensions_p,
                valid_f,
                layers,
                temperature,
            )
            return (
                u.reshape(shape),
                _unpermute_weights(w[..., :n]).reshape(*shape, n),
                g.reshape(*shape, 3),
            )

        # note: substituting the XLA manual evaluator for the coarse pass
        # was tried and is slower inside the full step graph (fusion
        # regressions); the kernel serves both passes
        field_with_grad_coarse = None

        field_with_dirgrad_coarse = None
        if cfg.pallas_dir_coarse and cfg.pallas_matmul_precision != "highest":
            box_coarse = cfg.pallas_box_coarse and use_rdf
            coarse_statics = (
                statics._replace(use_rdf=False) if box_coarse else statics
            )
            coarse_layers = () if box_coarse else layers
            coarse_tile = cfg.pallas_box_tile if box_coarse else tile[0]

            def field_with_dirgrad_coarse(positions, directions):
                shape = positions.shape[:-1]
                lead = shape[:1] if batched else ()
                # The dir kernel has no VJP on purpose (forward-only);
                # stop the param tangents at its boundary — the whole
                # coarse pass is gradient-stopped downstream anyway.
                sg = jax.lax.stop_gradient
                u, w, ud = pallas_field.fused_field_dir_forward(
                    coarse_statics,
                    coarse_tile,
                    sg(positions).reshape(*lead, -1, 3),
                    sg(directions).reshape(*lead, -1, 3),
                    sg(locations_p),
                    sg(rotations_p),
                    sg(dimensions_p),
                    sg(valid_f),
                    jax.tree.map(sg, coarse_layers),
                    sg(temperature),
                )
                return (
                    u.reshape(shape),
                    _unpermute_weights(w[..., :n]).reshape(*shape, n),
                    ud.reshape(shape),
                )

    else:
        field_with_grad_coarse = None
        field_with_dirgrad_coarse = None

        def _packed(fw):
            return tuple(
                hyper_field.pack_block_diagonal(
                    fw,
                    in_channels=3 * cfg.num_frequencies * 2,
                    out_channels_list=cfg.field_channels,
                )
            )

        field_dtype = jnp.dtype(cfg.field_dtype) if cfg.field_dtype else None

        def _make_field(loc, rot, half, val, packed):
            scene_params = scene.SceneParams(
                locations=loc,
                rotations=rot,
                half_dimensions=half,
                valid=val,
                packed_weights=packed,
                field_dtype=field_dtype,
            )
            return scene.soft_scene_field(
                scene_params,
                temperature,
                cfg.position_scale,
                cfg.num_frequencies,
                cfg.field_channels,
            )

        if batched:
            packed_b = (
                jax.vmap(_packed)(field_weights) if use_rdf else None
            )

            def field(positions):   # [F, ..., 3]
                def one(loc, rot, half, val, packed, pos):
                    return _make_field(loc, rot, half, val, packed)(pos)

                return jax.vmap(
                    one,
                    in_axes=(0, 0, 0, 0, 0 if use_rdf else None, 0),
                )(
                    decoded["locations"],
                    decoded["orientations"],
                    decoded["dimensions"],
                    frame.valid,
                    packed_b,
                    positions,
                )

        else:
            packed_weights = _packed(field_weights) if use_rdf else None
            field = _make_field(
                decoded["locations"],
                decoded["orientations"],
                decoded["dimensions"],
                frame.valid,
                packed_weights,
            )

    # ---------------- silhouette rendering ----------------
    key_rays, key_render = jax.random.split(key)
    if ray_indices is None:
        cand_idx = sampling.multinomial_logits(
            key_rays, frame.candidate_weights, cfg.num_rays, sorted_logits=True
        )
        ray_idx = jnp.take_along_axis(
            frame.candidate_indices, cand_idx, axis=-1
        )
    else:
        ray_idx = ray_indices
    if sp_axis is not None:
        local_rays = ray_idx.shape[-1] // jax.lax.axis_size(sp_axis)
        ray_idx = jax.lax.dynamic_slice_in_dim(
            ray_idx,
            jax.lax.axis_index(sp_axis) * local_rays,
            local_rays,
            axis=-1,
        )
        key_render = jax.random.fold_in(key_render, jax.lax.axis_index(sp_axis))
    rays_fn = jax.vmap(ray_directions_at) if batched else ray_directions_at
    origins, directions = rays_fn(frame, ray_idx)

    if group_skip:
        # azimuth-sort the sampled rays so kernel point tiles are
        # direction-coherent — group skipping (see pallas_group_skip)
        # fires per tile, and randomly ordered rays would see every
        # instance group in every tile. Ray order is otherwise
        # irrelevant: targets are gathered by ray_idx and all ray
        # reductions are means. (Changes the per-ray stochastic sample
        # pairing, i.e. a different RNG realization, not the statistics.)
        ray_azimuth = jnp.arctan2(directions[..., 0], directions[..., 2])
        ray_order = jnp.argsort(ray_azimuth, axis=-1)
        ray_idx = jnp.take_along_axis(ray_idx, ray_order, axis=-1)
        origins = jnp.take_along_axis(origins, ray_order[..., None], axis=-2)
        directions = jnp.take_along_axis(
            directions, ray_order[..., None], axis=-2
        )

    out = renderer.hierarchical_render(
        field,
        origins,
        directions,
        cfg.distance_range,
        cfg.num_samples,
        std,
        cosine_ratio,
        key=key_render,
        deterministic=cfg.deterministic,
        field_with_grad=field_with_grad,
        field_with_grad_coarse=field_with_grad_coarse,
        field_with_dirgrad_coarse=field_with_dirgrad_coarse,
    )
    rendered = out.features  # [.., R, N] per-ray instance probabilities

    if batched:
        targets = jax.vmap(lambda sm, ri: sm[ri])(
            frame.soft_masks_flat, ray_idx
        ).astype(rendered.dtype)                                 # [F, R, N]
        targets = jnp.take_along_axis(
            targets, row_to_col[:, None, :], axis=-1
        )
    else:
        targets = frame.soft_masks_flat[ray_idx].astype(rendered.dtype)
        targets = jnp.take(targets, row_to_col, axis=-1)
    bce = _binary_cross_entropy(rendered, targets)
    # reduce over (rays, instances) only — a leading frame axis survives
    silhouette_loss = _masked_mean(
        bce,
        frame.valid[..., None, :],
        axis_name=sp_axis,
        axis=(-2, -1),
    )

    losses = {
        "iou_projection_loss": iou_loss,
        "l1_projection_loss": l1_loss,
        "silhouette_loss": silhouette_loss,
    }

    zeros = jnp.zeros(frame.valid.shape[:-1])
    if use_rdf:
        grad_norms = jnp.linalg.norm(out.gradients, axis=-1)
        sq = jnp.square(grad_norms - 1.0)
        losses["eikonal_loss"] = _masked_mean(
            sq, jnp.ones_like(sq, bool), axis_name=sp_axis, axis=(-2, -1)
        )
    else:
        losses["eikonal_loss"] = zeros

    use_photometric = (
        cfg.photometric_weight > 0.0
        and use_rdf
        and frame.gray_images is not None
    )
    if use_photometric:
        from . import photometric as photometric_mod

        def photo_one(decoded_f, valid_f, field_weights_f, frame_f, key_f):
            # Per-frame body: builds the hard (argmin) field closure from
            # this frame's decoded params and sphere-traces its surfels.
            # Everything inside (while_loop tracer, homography warps,
            # masked means) is a pure jit-safe function, so the batched
            # path is just `vmap` of this over the stacked frame axis.
            packed_ref = (
                tuple(
                    hyper_field.pack_block_diagonal(
                        field_weights_f,
                        in_channels=3 * cfg.num_frequencies * 2,
                        out_channels_list=cfg.field_channels,
                    )
                )
                if use_rdf
                else None
            )
            hard_scene_params = scene.SceneParams(
                locations=decoded_f["locations"],
                rotations=decoded_f["orientations"],
                half_dimensions=decoded_f["dimensions"],
                valid=valid_f,
                packed_weights=packed_ref,
            )
            hard_field = scene.hard_scene_field(
                hard_scene_params,
                cfg.position_scale,
                cfg.num_frequencies,
                cfg.field_channels,
            )
            loss, _ = photometric_mod.photometric_loss(
                frame_f,
                hard_field,
                key_f,
                num_rays=cfg.surface_num_rays,
                num_iterations=cfg.surface_num_iterations,
                convergence_criteria=cfg.surface_convergence_criteria,
                bounding_radius=cfg.surface_bounding_radius,
                patch_size=cfg.surface_patch_size,
            )
            return loss

        key_render, key_surface = jax.random.split(key_render)
        if batched:
            num_frames = frame.valid.shape[0]
            keys_surface = jax.random.split(key_surface, num_frames)
            losses["photometric_loss"] = jax.vmap(photo_one)(
                decoded, frame.valid, field_weights, frame, keys_surface
            )
        else:
            losses["photometric_loss"] = photo_one(
                decoded, frame.valid, field_weights, frame, key_surface
            )
    else:
        losses["photometric_loss"] = zeros

    if sp_axis is not None:
        # The photometric branch draws per-rank surface rays (rank-folded
        # key), so its per-rank value is NOT sp-replicated; pmean makes
        # the reported value well-defined (a variance-reduced average)
        # and its gradient consistent with train_step's grad pmean. The
        # projection terms are computed identically on every sp rank and
        # the silhouette/eikonal masked means psum their numerators, so
        # both are already replicated values.
        losses["photometric_loss"] = jax.lax.pmean(
            losses["photometric_loss"], sp_axis
        )

    total = (
        cfg.iou_projection_weight * losses["iou_projection_loss"]
        + cfg.l1_projection_weight * losses["l1_projection_loss"]
        + cfg.silhouette_weight * losses["silhouette_loss"]
        + cfg.eikonal_weight * losses["eikonal_loss"]
        + cfg.photometric_weight * losses["photometric_loss"]
    )

    aux = {
        "losses": losses,
        "total": total,
        "row_to_col": row_to_col,
        "cam_corners_target": cam_corners_target,
        "temperature": temperature,
        "sdf_std_deviation": std,
    }
    return total, aux


def compute_metrics(frame: FrameData, cam_corners_target, row_to_col):
    """On-device 3D/BEV IoU + accuracies vs KITTI-360 GT
    (reference main.py:877-924)."""
    rect = frame.rectification
    pd = cam_corners_target @ rect.T                        # [N, 8, 3]
    gt = jnp.take(frame.gt_boxes_3d, row_to_col, axis=0) @ rect.T

    rot = geometry.rotation_matrix_x(jnp.asarray(-jnp.pi / 2.0))
    pd = pd @ rot.T
    gt_rotated = gt @ rot.T

    finite = jnp.all(jnp.isfinite(gt.reshape(gt.shape[0], -1)), axis=-1)
    mask = finite & frame.valid
    gt_safe = jnp.where(mask[:, None, None], gt_rotated, 1.0)

    iou_3d, iou_bev = jax.vmap(iou3d.box_3d_iou)(pd, gt_safe)
    iou_3d = jnp.where(mask, iou_3d, 0.0)
    iou_bev = jnp.where(mask, iou_bev, 0.0)

    return {
        "iou_3d": _masked_mean(iou_3d, mask),
        "iou_bev": _masked_mean(iou_bev, mask),
        "accuracy_3d_25": _masked_mean((iou_3d > 0.25).astype(jnp.float32), mask),
        "accuracy_bev_25": _masked_mean((iou_bev > 0.25).astype(jnp.float32), mask),
        "accuracy_3d_50": _masked_mean((iou_3d > 0.50).astype(jnp.float32), mask),
        "accuracy_bev_50": _masked_mean((iou_bev > 0.50).astype(jnp.float32), mask),
        "num_matched": jnp.sum(mask.astype(jnp.float32)),
    }


def train_step(params, opt_state, frame, step, key, cfg, tx, ray_indices=None,
               sp_axis=None):
    """One optimization step with the warmup phase switch.

    Works on a single frame or on stacked frames (leading frame axis on
    ``frame``/``params``/``opt_state``): per-frame losses are summed for
    the gradient (frames are independent, so each frame's params receive
    exactly their own-frame gradient) and scalars keep the frame axis.
    """
    batched = frame.valid.ndim == 2

    def phase(use_rdf):
        def loss_fn(p):
            total, aux = compute_loss(
                p, frame, step, key, cfg, use_rdf,
                ray_indices=ray_indices, sp_axis=sp_axis,
            )
            return jnp.sum(total), aux

        return jax.value_and_grad(loss_fn, has_aux=True)

    def warm(p):
        return phase(False)(p)

    def post(p):
        return phase(True)(p)

    (_, aux), grads = jax.lax.cond(step >= cfg.warmup_steps, post, warm, params)

    if sp_axis is not None:
        # Per-rank reverse AD through the sp collectives yields, for the
        # ray-local (silhouette/eikonal) terms, S x the local ray shard's
        # contribution (psum transposes to psum: the replicated cotangent
        # comes back multiplied by the axis size), while the
        # sp-replicated projection terms yield the full gradient on every
        # rank. pmean over sp therefore reconstructs the exact
        # single-chip gradient for BOTH: (1/S) * sum_r (S * local_r) =
        # true ray sum, and the mean of identical replicated grads is
        # itself. It also makes every rank's optimizer update identical,
        # as the caller's out-specs assume (they drop the sp axis
        # unchecked). Verified against the single-chip gradient in
        # tests/test_pipeline.py::test_sharded_step_matches_single_chip.
        grads = jax.lax.pmean(grads, sp_axis)

    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    # metrics only at the logging cadence (reference main.py:872: every
    # scalar_intervals steps) — the polygon clips are ~1 ms/step otherwise
    def with_metrics(args):
        corners, row_to_col = args
        fn = (
            jax.vmap(lambda f, c, r: compute_metrics(f, c, r))
            if batched
            else compute_metrics
        )
        return fn(frame, corners, row_to_col)

    def without_metrics(args):
        z = jnp.zeros(frame.valid.shape[:-1])
        return {
            "iou_3d": z,
            "iou_bev": z,
            "accuracy_3d_25": z,
            "accuracy_bev_25": z,
            "accuracy_3d_50": z,
            "accuracy_bev_50": z,
            "num_matched": z,
        }

    metrics = jax.lax.cond(
        (step + 1) % cfg.metric_interval == 0,
        with_metrics,
        without_metrics,
        (aux["cam_corners_target"], aux["row_to_col"]),
    )
    lead = frame.valid.shape[:-1]  # (F,) when batched, () otherwise
    scalars = {
        "loss": aux["total"],
        **{k: v for k, v in aux["losses"].items()},
        **metrics,
        "temperature": jnp.broadcast_to(aux["temperature"], lead),
        "sdf_std_deviation": jnp.broadcast_to(aux["sdf_std_deviation"], lead),
    }
    return params, opt_state, scalars


@partial(jax.jit, static_argnames=("cfg", "num_steps"))
def optimize_chunk(params, opt_state, frame, key, start_step, cfg, num_steps):
    """Scan ``num_steps`` optimization steps starting at ``start_step``.

    The host loop calls this once per checkpoint interval (500 steps),
    mirroring the reference ckpt cadence (main.py:1109-1121) without
    breaking jit inside the chunk.
    """
    tx = make_optimizer(cfg, params)

    def body(carry, offset):
        params, opt_state = carry
        step = start_step + offset
        step_key = jax.random.fold_in(key, step)
        params, opt_state, scalars = train_step(
            params, opt_state, frame, step, step_key, cfg, tx
        )
        return (params, opt_state), scalars

    (params, opt_state), scalars = jax.lax.scan(
        body, (params, opt_state), jnp.arange(num_steps)
    )
    return params, opt_state, scalars


def optimize_frame(
    frame: FrameData,
    key: jax.Array,
    cfg: OptimizationConfig = OptimizationConfig(),
    callback=None,
    init_state=None,
):
    """Full per-frame optimization with chunked checkpointing.

    ``callback(step, params, scalars_chunk, opt_state)`` is invoked
    after every checkpoint interval (host side). Returns final params
    and stacked per-step scalars.

    ``init_state = (params, opt_state, start_step)`` resumes a
    partially-optimized frame mid-run (preemption tolerance beyond the
    reference's whole-frame skip, main.py:130-136): per-step keys are
    ``fold_in(key_run, step)``, so resuming with the SAME ``key`` at
    step ``k`` continues the exact RNG stream and reproduces the
    uninterrupted trajectory bit-for-bit.
    """
    key_init, key_run = jax.random.split(key)
    if init_state is None:
        params = init_params(key_init, frame.max_instances, cfg)
        tx = make_optimizer(cfg, params)
        opt_state = tx.init(params)
        step = 0
    else:
        params, opt_state, step = init_state
        params = jax.tree.map(jnp.asarray, params)
        opt_state = jax.tree.map(jnp.asarray, opt_state)

    chunk = cfg.checkpoint_interval
    all_scalars = []
    while step < cfg.num_steps:
        size = min(chunk, cfg.num_steps - step)
        params, opt_state, scalars = optimize_chunk(
            params, opt_state, frame, key_run, jnp.asarray(step), cfg, size
        )
        all_scalars.append(jax.device_get(scalars))
        step += size
        if callback is not None:
            callback(step, params, all_scalars[-1], opt_state)

    stacked = jax.tree.map(lambda *xs: np.concatenate(xs), *all_scalars)
    return params, stacked


def init_params_batched(key: jax.Array, num_frames: int, max_instances: int,
                        cfg: OptimizationConfig):
    """Independent per-frame params stacked along a leading frame axis."""
    keys = jax.random.split(key, num_frames)
    return jax.vmap(lambda k: init_params(k, max_instances, cfg))(keys)


def optimize_frames_batched(
    frames: FrameData,
    key: jax.Array,
    cfg: OptimizationConfig = OptimizationConfig(),
    callback=None,
):
    """Co-optimize ``F`` stacked frames on one chip.

    The frames are independent (the reference shards frames across GPUs,
    README.md:128); batching them through ONE jitted scan + ONE Pallas
    kernel with a frame grid axis amortizes the per-step glue (sampling,
    matching, optimizer) across frames — per-frame wall clock drops well
    below the single-frame path. ``frames`` is a stacked FrameData
    (``sharded.stack_frames``); scalars come back with shape
    ``[steps, F]``.

    Equivalence note: in deterministic mode with identical fixed ray
    schedules the batched path matches per-frame runs to float tolerance
    (tests/test_batched.py asserts rtol<=2e-4; batched matmuls round
    differently at the ~1e-7 level, which can flip an inverse-CDF bin in
    the hierarchical resampling and move isolated fine samples).
    Stochastic runs intentionally differ from per-frame runs: the
    batched path draws [F, ...]-shaped noise from one shared key while
    per-frame runs use per-frame keys.
    """
    num_frames = frames.valid.shape[0]
    key_init, key_run = jax.random.split(key)
    params = init_params_batched(
        key_init, num_frames, frames.max_instances, cfg
    )
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    chunk = cfg.checkpoint_interval
    all_scalars = []
    step = 0
    while step < cfg.num_steps:
        size = min(chunk, cfg.num_steps - step)
        params, opt_state, scalars = optimize_chunk(
            params, opt_state, frames, key_run, jnp.asarray(step), cfg, size
        )
        all_scalars.append(jax.device_get(scalars))
        step += size
        if callback is not None:
            callback(step, params, all_scalars[-1], opt_state)

    stacked = jax.tree.map(lambda *xs: np.concatenate(xs), *all_scalars)
    return params, stacked
