"""Faithful torch-side per-frame optimization, driven by the reference's
own modules, for end-to-end parity checks against vsrd_tpu.

This re-expresses the reference training loop's in-script closures
(/root/reference/scripts/main.py:323-865) in condensed form, calling the
reference library (BoxParameters3D, HyperDistanceField,
SinusoidalEncoder, sdfs, hierarchical_volumetric_rendering,
project_box_3d) imported read-only via refload. Where main.py uses
torchvision (clip_boxes_to_image, distance_box_iou[_loss]) the standard
formulas are implemented here in torch, since torchvision is not
installed in this environment.

Differences from main.py, all required for a deterministic comparison:
* ray indices come from a precomputed schedule instead of
  torch.multinomial (main.py:620-627) — the vsrd_tpu run consumes the
  identical schedule;
* the reference's own samplers run in their deterministic modes
  (refload.make_samplers_deterministic);
* batch size fixed at 1, instances unpadded.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

LINE_INDICES = [  # main.py:26-30
    [0, 1], [1, 2], [2, 3], [3, 0],
    [4, 5], [5, 6], [6, 7], [7, 4],
    [0, 4], [1, 5], [2, 6], [3, 7],
]


def clip_boxes_to_image(boxes, size):
    """torchvision.ops.clip_boxes_to_image: boxes [..., 4] (x1 y1 x2 y2)
    clamped to [0, W] x [0, H]."""
    h, w = size
    x = boxes[..., 0::2].clamp(min=0.0, max=float(w))
    y = boxes[..., 1::2].clamp(min=0.0, max=float(h))
    return torch.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], dim=-1)


def _box_iou_union(boxes1, boxes2, eps):
    area1 = (boxes1[..., 2] - boxes1[..., 0]) * (boxes1[..., 3] - boxes1[..., 1])
    area2 = (boxes2[..., 2] - boxes2[..., 0]) * (boxes2[..., 3] - boxes2[..., 1])
    lt = torch.max(boxes1[..., :2], boxes2[..., :2])
    rb = torch.min(boxes1[..., 2:], boxes2[..., 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / (union + eps)


def _diou(boxes1, boxes2, eps=1e-7):
    """torchvision distance-IoU, elementwise over broadcast boxes."""
    iou = _box_iou_union(boxes1, boxes2, eps)
    lt = torch.min(boxes1[..., :2], boxes2[..., :2])
    rb = torch.max(boxes1[..., 2:], boxes2[..., 2:])
    whi = (rb - lt).clamp(min=0)
    diag = whi[..., 0] ** 2 + whi[..., 1] ** 2 + eps
    c1 = (boxes1[..., :2] + boxes1[..., 2:]) / 2
    c2 = (boxes2[..., :2] + boxes2[..., 2:]) / 2
    dist = ((c1 - c2) ** 2).sum(-1)
    return iou - dist / diag


def distance_box_iou(boxes1, boxes2, eps=1e-7):
    """Pairwise [N, M] distance-IoU (torchvision.ops.distance_box_iou)."""
    return _diou(boxes1[:, None, :], boxes2[None, :, :], eps)


def distance_box_iou_loss(boxes1, boxes2, eps=1e-7):
    """Elementwise 1 - dIoU (torchvision.ops.distance_box_iou_loss)."""
    return 1.0 - _diou(boxes1, boxes2, eps)


class TorchReferenceOptimization:
    """Reference per-frame optimization on one synthetic scene."""

    def __init__(self, ref, scene, init, cfg):
        """``ref``: refload.load_reference() namespace; ``scene``: numpy
        dict (intrinsics [V,3,3], extrinsics [V,4,4], soft_masks
        [V,H,W,N], gt_boxes_2d [V,N,2,2], visible [V,N], image_size,
        target_index); ``init``: vsrd_tpu init_params pytree as numpy;
        ``cfg``: vsrd_tpu OptimizationConfig (shared hyperparameters)."""
        self.ref = ref
        self.cfg = cfg
        t = lambda x: torch.from_numpy(np.asarray(x, np.float32))

        self.intrinsics = t(scene["intrinsics"])            # [V, 3, 3]
        self.extrinsics = t(scene["extrinsics"])            # [V, 4, 4]
        self.soft_masks = t(scene["soft_masks"])            # [V, H, W, N]
        self.gt_boxes_2d = t(scene["gt_boxes_2d"]).flatten(-2, -1)  # [V,N,4]
        self.visible = torch.from_numpy(np.asarray(scene["visible"], bool))
        self.image_size = tuple(scene["image_size"])
        self.target_index = int(scene["target_index"])
        self.num_views = self.intrinsics.shape[0]
        self.num_instances = self.soft_masks.shape[-1]

        # precomputed rays, flattened (view, y, x) — main.py:267-316
        cam_pos, ray_dirs = ref.rendering_utils.ray_casting(
            image_size=self.image_size,
            intrinsic_matrices=self.intrinsics,
            extrinsic_matrices=self.extrinsics,
        )
        self.ray_directions = ray_dirs.reshape(-1, 3)       # [V*H*W, 3]
        self.ray_positions = (
            cam_pos[:, None, None, :].expand_as(ray_dirs).reshape(-1, 3)
        )
        self.masks_flat = self.soft_masks.reshape(-1, self.num_instances)

        # models (config.json:129-160) with parameters from the shared init
        n = self.num_instances
        det = ref.box_parameters.BoxParameters3D(1, n, num_features=cfg.num_features)
        boxes = init["boxes"]
        with torch.no_grad():
            det.locations.copy_(t(boxes["locations"][:n])[None])
            det.dimensions.copy_(t(boxes["dimensions"][:n])[None])
            det.orientations.copy_(t(boxes["orientations"][:n])[None])
            det.embeddings.copy_(t(boxes["embeddings"][:n])[None])
        self.detector = det

        hdf = ref.hyper_distance_field.HyperDistanceField(
            in_channels=3 * cfg.num_frequencies * 2,
            out_channels_list=list(cfg.field_channels),
            hyper_in_channels=cfg.num_features,
            hyper_out_channels_list=list(cfg.hyper_channels),
        )
        with torch.no_grad():
            for index, layer in enumerate(init["hyper"]["layers"]):
                block = hdf.hypernetwork[index]
                linear = block[0]
                linear.weight_v.copy_(t(layer["v"]))
                linear.weight_g.copy_(t(layer["g"])[:, None])
                linear.bias.copy_(t(layer["b"]))
                if "ln_scale" in layer:
                    block[1].weight.copy_(t(layer["ln_scale"]))
                    block[1].bias.copy_(t(layer["ln_bias"]))
        self.hyper_distance_field = hdf

        self.positional_encoder = ref.sinusoidal_encoder.SinusoidalEncoder(
            cfg.num_frequencies
        )

        # optimizer param groups + ExponentialLR (config.json:177-214)
        self.optimizer = torch.optim.Adam(
            [
                {"params": [det.locations], "lr": cfg.box_lr},
                {"params": [det.dimensions], "lr": cfg.box_lr},
                {"params": [det.orientations], "lr": cfg.box_lr},
                {"params": [det.embeddings], "lr": cfg.embedding_lr},
                {"params": hdf.parameters(), "lr": cfg.hypernetwork_lr},
            ],
            lr=cfg.box_lr,
        )
        self.scheduler = torch.optim.lr_scheduler.ExponentialLR(
            self.optimizer, gamma=cfg.lr_decay
        )

    # ------------------------------------------------------------------
    def _soft_union_field(self, world, step):
        """The closure stack of main.py:433-618 for batch item 0."""
        ref, cfg = self.ref, self.cfg
        sdfs = ref.sdfs
        n = self.num_instances
        use_rdf = step >= cfg.warmup_steps
        if use_rdf:
            field_weights = self.hyper_distance_field(world["embeddings"][0])

        def residual_distance_field(weights):  # main.py:433-449
            def wrapper(positions):
                x, y, z = torch.unbind(positions, dim=-1)
                p = torch.stack([torch.abs(x), y, z], dim=-1)
                p = p / max(cfg.distance_range)
                p = self.positional_encoder(p)
                d = self.hyper_distance_field.distance_field(weights, p)
                return torch.sigmoid(d - 1.0)

            return wrapper

        def instance_field(distance_field, label):  # main.py:460-475
            def wrapper(positions):
                d = distance_field(positions)
                onehot = nn.functional.one_hot(
                    torch.tensor(label), n
                ).to(d.dtype)
                return d, onehot.expand(*d.shape[:-1], -1)

            return wrapper

        fields = []
        for i in range(n):
            dim = world["dimensions"][0, i]
            box_field = sdfs.box(dim)
            if use_rdf:  # residual_composition, main.py:451-458
                res = residual_distance_field(field_weights[i])
                base = box_field

                def composed(positions, base=base, res=res):
                    return base(positions) + res(positions)

                inner = composed
            else:
                inner = box_field
            fields.append(
                sdfs.translation(
                    sdfs.rotation(
                        instance_field(inner, i),
                        world["orientations"][0, i],
                    ),
                    world["locations"][0, i],
                )
            )

        temperature = self._temperature(step)

        def soft_union(positions):  # main.py:477-492
            ds, feats = zip(*[f(positions) for f in fields])
            distances = torch.stack(ds, dim=0)
            features = torch.stack(feats, dim=0)
            weights = nn.functional.softmin(distances / temperature, dim=0)
            return (
                torch.sum(distances * weights, dim=0),
                torch.sum(features * weights, dim=0),
            )

        return soft_union

    def _anneal(self, step, maximum, minimum):  # main.py:420-431
        x = step / self.cfg.num_steps
        return float((np.cos(np.pi * x) + 1.0) / 2.0 * (maximum - minimum) + minimum)

    def _temperature(self, step):
        return self._anneal(
            step,
            self.cfg.max_sdf_union_temperature,
            self.cfg.min_sdf_union_temperature,
        )

    # ------------------------------------------------------------------
    def step(self, step, ray_indices):
        """One optimization step; returns the per-loss scalars."""
        import scipy.optimize

        ref, cfg = self.ref, self.cfg
        self.optimizer.zero_grad()
        world = self.detector()  # main.py:332

        # multi-view projection (main.py:339-367)
        world_hom = nn.functional.pad(world["boxes_3d"], (0, 1), value=1.0)
        all_boxes_2d = []
        for v in range(self.num_views):
            cam = torch.einsum("mn,...n->...m", self.extrinsics[v], world_hom[0])
            cam = cam[..., :-1] / cam[..., -1:]
            boxes_2d = torch.stack(
                [
                    ref.geometric_operations.project_box_3d(
                        box_3d=cam[i],
                        line_indices=LINE_INDICES,
                        intrinsic_matrix=self.intrinsics[v],
                    )
                    for i in range(self.num_instances)
                ],
                dim=0,
            )
            boxes_2d = clip_boxes_to_image(
                boxes_2d.flatten(-2, -1), self.image_size
            )
            all_boxes_2d.append(boxes_2d)

        # bipartite matching on the target view (main.py:374-386)
        target = self.target_index
        cost = -distance_box_iou(all_boxes_2d[target], self.gt_boxes_2d[target])
        pd_idx, gt_idx = scipy.optimize.linear_sum_assignment(
            cost.detach().numpy()
        )

        # projection losses (main.py:391-415)
        iou_terms, l1_terms = [], []
        for v in range(self.num_views):
            vis = self.visible[v][gt_idx]
            pd = all_boxes_2d[v][pd_idx[vis.numpy()]]
            gt = self.gt_boxes_2d[v][gt_idx[vis.numpy()]]
            iou_terms.append(distance_box_iou_loss(pd, gt))
            l1_terms.append(
                nn.functional.smooth_l1_loss(pd, gt, reduction="none")
            )
        iou_projection_loss = torch.mean(torch.cat(iou_terms, dim=0))
        l1_projection_loss = torch.mean(torch.cat(l1_terms, dim=0))

        # rendering (main.py:511-523, 620-671)
        field = self._soft_union_field(world, step)
        rays = torch.from_numpy(np.asarray(ray_indices, np.int64))
        ray_positions = self.ray_positions[rays]
        ray_directions = self.ray_directions[rays]

        std = self._anneal(
            step, cfg.max_sdf_std_deviation, cfg.min_sdf_std_deviation
        )
        cosine_ratio = step / cfg.num_steps

        with torch.no_grad():  # hierarchical_wrapper, main.py:511-523
            *_, sampled_distances, sampled_weights = (
                ref.renderers.hierarchical_volumetric_rendering(
                    distance_field=field,
                    ray_positions=ray_positions,
                    ray_directions=ray_directions,
                    distance_range=list(cfg.distance_range),
                    num_samples=cfg.num_samples,
                    sdf_std_deviation=std,
                    cosine_ratio=cosine_ratio,
                )
            )
        labels, gradients, _, _ = ref.renderers.hierarchical_volumetric_rendering(
            distance_field=field,
            ray_positions=ray_positions,
            ray_directions=ray_directions,
            distance_range=list(cfg.distance_range),
            num_samples=cfg.num_samples,
            sdf_std_deviation=std,
            cosine_ratio=cosine_ratio,
            sampled_distances=sampled_distances,
            sampled_weights=sampled_weights,
        )

        # silhouette loss (main.py:653-671)
        targets = self.masks_flat[rays][:, gt_idx]
        silhouette_loss = torch.mean(
            nn.functional.binary_cross_entropy(
                input=labels[..., pd_idx].clamp(1e-6, 1.0 - 1e-6),
                target=targets,
                reduction="none",
            )
        )

        losses = {
            "iou_projection_loss": iou_projection_loss,
            "l1_projection_loss": l1_projection_loss,
            "silhouette_loss": silhouette_loss,
        }
        if step >= cfg.warmup_steps:  # main.py:679-687
            losses["eikonal_loss"] = nn.functional.mse_loss(
                torch.norm(gradients, dim=-1),
                torch.ones(gradients.shape[:-1]),
            )

        weights = {
            "iou_projection_loss": cfg.iou_projection_weight,
            "l1_projection_loss": cfg.l1_projection_weight,
            "silhouette_loss": cfg.silhouette_weight,
            "eikonal_loss": cfg.eikonal_weight,
        }
        total = sum(loss * weights[name] for name, loss in losses.items())

        total.backward()
        self.optimizer.step()
        self.scheduler.step()

        out = {k: float(v.detach()) for k, v in losses.items()}
        out["loss"] = float(total.detach())
        return out

    # ------------------------------------------------------------------
    def run(self, ray_schedule):
        """``ray_schedule [num_steps, R]`` -> (per-step scalars, final
        decoded world boxes [N, 8, 3])."""
        history = []
        for step_index in range(ray_schedule.shape[0]):
            history.append(self.step(step_index, ray_schedule[step_index]))
        with torch.no_grad():
            world = self.detector()
        boxes = world["boxes_3d"][0].numpy()
        stacked = {
            k: np.asarray([h.get(k, 0.0) for h in history], np.float32)
            for k in history[-1]
        }
        return stacked, boxes
