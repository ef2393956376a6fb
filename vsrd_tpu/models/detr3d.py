"""DETR-style 3D detectors (flax) for downstream training on
pseudo-labels.

TPU-native re-design of `/root/reference/vsrd/models/detectors/detr.py`
and `deformable_detr.py`: instead of wrapping HuggingFace torch modules,
a self-contained flax encoder-decoder with the reference's replaced
heads — class logits, normalized 2D boxes, 8-parameter 3D boxes decoded
by pixel+depth unprojection (detr.py:265-280), and confidences — plus a
jittable Hungarian matcher (ops/matching.py) and a `pmean`-based data
parallel training step standing in for the reference's DDP/all_reduce
surface (detr.py:47-49, vsrd/distributed/parallel.py).

Deliberate deviation from the reference, documented for parity review:
the reference builds on an ImageNet/COCO-PRETRAINED HuggingFace
DetrForObjectDetection / DeformableDetrForObjectDetection backbone
(detr.py:38-44); no pretrained checkpoints exist in this environment,
so the backbone here is a small from-scratch CNN. Everything around it
keeps the reference's structure: per-decoder-layer auxiliary losses
applied by the SAME prediction heads (detr.py:213-229 semantics),
focal-cost matching for the deformable variant
(deformable_detr.py:101-127), reference-point-relative location offsets
(deformable_detr.py:409-412), and per-subsystem parameter groups
(deformable_detr.py:209-305) as flax path-prefix masks for
`optax.multi_transform`.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import iou2d, matching
from .box_parameters import decode_box_3d
from ..ops.geometry import rotation_matrix_y_from_cos_sin


def positional_encoding_2d(height, width, channels, temperature=10000.0):
    """Standard DETR sine positional encoding ``[H, W, C]``."""
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    half = channels // 2
    dim_t = temperature ** (
        2 * (jnp.arange(half, dtype=jnp.float32) // 2) / half
    )
    pos_x = xs[..., None] / dim_t
    pos_y = ys[..., None] / dim_t
    pos_x = jnp.concatenate(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    )
    pos_y = jnp.concatenate(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    )
    pos_y = jnp.broadcast_to(pos_y, (height, width, half))
    pos_x = jnp.broadcast_to(pos_x, (height, width, half))
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class ConvBackbone(nn.Module):
    """Small strided CNN backbone (stride 16). Stands in for the
    reference's pretrained ResNet50-DETR backbone (see module docstring)."""

    channels: Sequence[int] = (64, 128, 256, 256)

    @nn.compact
    def __call__(self, images):
        x = images
        for ch in self.channels:
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME")(x)
            x = nn.GroupNorm(num_groups=math.gcd(32, ch))(x)
            x = nn.relu(x)
        return x


class TransformerLayer(nn.Module):
    hidden_dim: int
    num_heads: int = 8
    mlp_dim: int = 1024

    @nn.compact
    def __call__(self, queries, keys_values=None):
        kv = queries if keys_values is None else keys_values
        attended = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.hidden_dim
        )(nn.LayerNorm()(queries), nn.LayerNorm()(kv))
        x = queries + attended
        y = nn.Dense(self.mlp_dim)(nn.LayerNorm()(x))
        y = nn.gelu(y)
        y = nn.Dense(self.hidden_dim)(y)
        return x + y


class PredictionHeads(nn.Module):
    """The reference's replaced heads (detr.py:51-75), applied to EVERY
    decoder layer's queries so aux losses share head parameters
    (detr.py:213-229)."""

    num_classes: int

    @nn.compact
    def __call__(self, queries, intrinsic_matrices, image_size,
                 reference_uv=None):
        logits = nn.Dense(self.num_classes + 1, name="classification_head")(
            queries
        )
        boxes_2d = jax.nn.sigmoid(
            nn.Dense(4, name="box_2d_regression_head")(queries)
        )  # cxcywh, normalized
        confidences = jax.nn.sigmoid(
            nn.Dense(1, name="confidence_prediction_head")(queries)
        )[..., 0]

        # 3D head: normalized pixel (u, v), depth, half-dims, yaw(cos,sin)
        raw = nn.Dense(8, name="box_3d_regression_head")(queries)
        if reference_uv is None:
            uv = jax.nn.sigmoid(raw[..., :2])
        else:
            # reference-point-relative offsets: the head predicts a
            # pre-sigmoid delta from the query's learned reference point
            # (reference deformable_detr.py:409-412)
            uv = jax.nn.sigmoid(
                raw[..., :2] + jax.scipy.special.logit(
                    jnp.clip(reference_uv, 1e-4, 1.0 - 1e-4)
                )
            )
        depth = jax.nn.softplus(raw[..., 2:3]) + 1.0
        dims = jax.nn.softplus(raw[..., 3:6]) + 0.3
        cos_sin = raw[..., 6:8]
        cos_sin = cos_sin / jnp.clip(
            jnp.linalg.norm(cos_sin, axis=-1, keepdims=True), min=1e-6
        )

        height_img, width_img = image_size
        pixels = jnp.stack(
            [
                uv[..., 0] * width_img,
                uv[..., 1] * height_img,
                jnp.ones_like(uv[..., 0]),
            ],
            axis=-1,
        )
        inv_k = jnp.linalg.inv(intrinsic_matrices)             # [B, 3, 3]
        rays = jnp.einsum("bij,bqj->bqi", inv_k, pixels)
        locations = rays * depth
        rotations = rotation_matrix_y_from_cos_sin(
            cos_sin[..., 0], cos_sin[..., 1]
        )
        boxes_3d = decode_box_3d(locations, dims, rotations)

        return {
            "logits": logits,
            "boxes_2d": boxes_2d,
            "boxes_3d": boxes_3d,
            "locations": locations,
            "dimensions": dims,
            "confidences": confidences,
        }


class DETR3D(nn.Module):
    """Feed-forward 3D detector.

    Outputs per query: class logits (+1 no-object), 2D boxes in
    normalized cxcywh, 3D boxes as 8 corners in camera space (decoded
    from predicted pixel location + depth + dims + yaw, mirroring the
    reference's unprojection head, detr.py:265-280), confidences.
    With ``aux_outputs=True`` the result carries ``aux_outputs``: the
    same heads applied to every intermediate decoder layer
    (detr.py:213-229 aux-loss semantics).
    """

    num_classes: int = 1
    num_queries: int = 50
    hidden_dim: int = 256
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    num_heads: int = 8

    def decoder_layer(self, index, queries, tokens):
        queries = TransformerLayer(
            self.hidden_dim, self.num_heads, name=f"decoder_self_{index}"
        )(queries)
        return TransformerLayer(
            self.hidden_dim, self.num_heads, name=f"decoder_cross_{index}"
        )(queries, tokens)

    @nn.compact
    def __call__(self, images, intrinsic_matrices, aux_outputs=False):
        # images NHWC in [0, 1]
        features = ConvBackbone(name="backbone")(images)
        b, h, w, _ = features.shape
        tokens = nn.Dense(self.hidden_dim, name="input_projection")(features)
        tokens = tokens + positional_encoding_2d(h, w, self.hidden_dim)
        tokens = tokens.reshape(b, h * w, self.hidden_dim)

        for index in range(self.num_encoder_layers):
            tokens = TransformerLayer(
                self.hidden_dim, self.num_heads, name=f"encoder_{index}"
            )(tokens)

        queries = self.param(
            "query_embeddings",
            nn.initializers.normal(0.02),
            (self.num_queries, self.hidden_dim),
        )
        queries = jnp.broadcast_to(
            queries, (b, self.num_queries, self.hidden_dim)
        )
        heads = PredictionHeads(self.num_classes, name="heads")
        image_size = images.shape[1:3]
        intermediate = []
        for index in range(self.num_decoder_layers):
            queries = self.decoder_layer(index, queries, tokens)
            intermediate.append(queries)

        outputs = heads(intermediate[-1], intrinsic_matrices, image_size)
        if aux_outputs:
            outputs["aux_outputs"] = [
                heads(layer_queries, intrinsic_matrices, image_size)
                for layer_queries in intermediate[:-1]
            ]
        return outputs


class DeformableDETR3D(nn.Module):
    """Deformable-attention variant (reference deformable_detr.py):
    decoder cross-attention samples sparse locations from the feature
    map, per-query learned reference points anchor the 3D location head
    (deformable_detr.py:409-412), and matching uses the focal class
    cost (deformable_detr.py:101-127; pass ``focal_matching=True`` to
    `detr_loss`)."""

    num_classes: int = 1
    num_queries: int = 50
    hidden_dim: int = 256
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    num_heads: int = 8
    num_samples: int = 8

    @nn.compact
    def __call__(self, images, intrinsic_matrices, aux_outputs=False):
        from ..modules.attention import MultiHeadDeformableAttention

        features = ConvBackbone(name="backbone")(images)
        b, h, w, _ = features.shape
        feature_maps = nn.Dense(self.hidden_dim, name="input_projection")(
            features
        )
        feature_maps = feature_maps + positional_encoding_2d(
            h, w, self.hidden_dim
        )
        tokens = feature_maps.reshape(b, h * w, self.hidden_dim)
        for index in range(self.num_encoder_layers):
            tokens = TransformerLayer(
                self.hidden_dim, self.num_heads, name=f"encoder_{index}"
            )(tokens)
        encoded_maps = tokens.reshape(b, h, w, self.hidden_dim)

        queries = self.param(
            "query_embeddings",
            nn.initializers.normal(0.02),
            (self.num_queries, self.hidden_dim),
        )
        queries = jnp.broadcast_to(
            queries, (b, self.num_queries, self.hidden_dim)
        )
        # per-query learned reference points in [0, 1]^2
        reference_logits = self.param(
            "reference_points",
            nn.initializers.normal(1.0),
            (self.num_queries, 2),
        )
        reference_uv = jax.nn.sigmoid(reference_logits)[None]
        reference_uv = jnp.broadcast_to(reference_uv, (b, self.num_queries, 2))

        heads = PredictionHeads(self.num_classes, name="heads")
        image_size = images.shape[1:3]
        intermediate = []
        for index in range(self.num_decoder_layers):
            queries = TransformerLayer(
                self.hidden_dim, self.num_heads, name=f"decoder_self_{index}"
            )(queries)
            sampled = MultiHeadDeformableAttention(
                out_channels=self.hidden_dim,
                num_samples=self.num_samples,
                num_heads=self.num_heads,
                name=f"decoder_deformable_{index}",
            )(queries, encoded_maps, encoded_maps)
            queries = queries + sampled
            intermediate.append(queries)

        outputs = heads(
            intermediate[-1], intrinsic_matrices, image_size,
            reference_uv=reference_uv,
        )
        outputs["reference_points"] = reference_uv
        if aux_outputs:
            outputs["aux_outputs"] = [
                heads(
                    layer_queries, intrinsic_matrices, image_size,
                    reference_uv=reference_uv,
                )
                for layer_queries in intermediate[:-1]
            ]
        return outputs


# ---------------------------------------------------------------------------
# per-subsystem parameter groups (reference deformable_detr.py:209-305)
# ---------------------------------------------------------------------------

PARAMETER_GROUPS = (
    "backbone",
    "heads",
    "reference_points",
    "sampling_offsets",
    "transformer",
)


def parameter_group_of(path) -> str:
    """Map a flax param path (tuple of names) to its subsystem group.

    Mirrors the reference's parameter iterators
    (deformable_detr.py:209-305): backbone / the four prediction heads
    (grouped under 'heads') / reference points / deformable sampling
    offsets / everything else as 'transformer'.
    """
    names = [str(getattr(p, "key", p)) for p in path]
    for name in names:
        if name == "backbone":
            return "backbone"
        if name == "heads":
            return "heads"
        if name == "reference_points":
            return "reference_points"
        if "sampling_offsets" in name:
            return "sampling_offsets"
    return "transformer"


def parameter_group_labels(params):
    """Pytree of group names aligned with ``params`` — feed to
    `optax.multi_transform` for per-subsystem learning rates (the
    reference assigns lower LRs to backbone / sampling_offsets /
    reference_points, deformable_detr README practice)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: parameter_group_of(path), params
    )


def make_param_group_optimizer(learning_rates: dict, default_lr: float = 1e-4):
    """optax.multi_transform Adam with per-subsystem LRs.

    ``learning_rates`` maps group names (PARAMETER_GROUPS) to LRs;
    missing groups use ``default_lr``.
    """
    import optax

    transforms = {
        group: optax.adam(learning_rates.get(group, default_lr))
        for group in PARAMETER_GROUPS
    }
    return optax.multi_transform(transforms, parameter_group_labels)


def cxcywh_to_xyxy(boxes):
    cx, cy, w, h = jnp.moveaxis(boxes, -1, 0)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def _single_level_loss(
    outputs, gt_labels, gt_boxes_2d, gt_boxes_3d, gt_valid,
    num_classes, focal_matching, axis_name,
):
    logits = outputs["logits"]                  # [B, Q, C+1]
    pd_boxes = cxcywh_to_xyxy(outputs["boxes_2d"])  # [B, Q, 4]
    pd_boxes_3d = outputs["boxes_3d"]           # [B, Q, 8, 3]
    b, q = logits.shape[:2]
    n = gt_labels.shape[1]

    probs = jax.nn.softmax(logits, axis=-1)

    def match_one(prob, pd_box, gt_label, gt_box, valid):
        if focal_matching:
            # focal class cost (reference deformable_detr.py:101-127):
            # pos_cost - neg_cost with alpha=0.25, gamma=2
            alpha, gamma = 0.25, 2.0
            p = prob[:, gt_label]                               # [Q, N]
            pos = alpha * ((1.0 - p) ** gamma) * (-jnp.log(p + 1e-8))
            neg = (1.0 - alpha) * (p**gamma) * (-jnp.log(1.0 - p + 1e-8))
            class_cost = pos - neg
        else:
            class_cost = -prob[:, gt_label]                     # [Q, N]
        box_cost = jnp.mean(
            jnp.abs(pd_box[:, None] - gt_box[None]), axis=-1
        )
        iou_cost = -iou2d.box_iou(pd_box, gt_box)
        cost = class_cost + 5.0 * box_cost + 2.0 * iou_cost
        # rectangular: pad GT columns up to Q
        padded = jnp.full((q, q), matching.PAD_COST)
        padded = padded.at[:, :n].set(
            jnp.where(valid[None, :], cost, matching.PAD_COST)
        )
        row_to_col = matching.linear_sum_assignment(padded)     # [Q]
        matched = row_to_col < n
        matched &= jnp.where(
            row_to_col < n, valid[jnp.clip(row_to_col, 0, n - 1)], False
        )
        return row_to_col, matched

    row_to_col, matched = jax.vmap(match_one)(
        probs, pd_boxes, gt_labels, gt_boxes_2d, gt_valid
    )                                                           # [B, Q]

    safe_col = jnp.clip(row_to_col, 0, n - 1)
    tgt_labels = jnp.take_along_axis(gt_labels, safe_col, axis=1)
    tgt_labels = jnp.where(matched, tgt_labels, num_classes)    # no-object
    class_losses = -jnp.take_along_axis(
        jax.nn.log_softmax(logits, axis=-1), tgt_labels[..., None], axis=-1
    )[..., 0]
    class_loss = jnp.mean(class_losses)

    num_boxes = jnp.sum(matched.astype(jnp.float32))
    if axis_name is not None:
        num_boxes = jax.lax.pmean(num_boxes, axis_name)
    num_boxes = jnp.clip(num_boxes, min=1.0)

    tgt_boxes = jnp.take_along_axis(
        gt_boxes_2d, safe_col[..., None], axis=1
    )
    l1 = jnp.sum(
        jnp.abs(pd_boxes - tgt_boxes) * matched[..., None], axis=-1
    )
    box_loss = jnp.sum(l1) / num_boxes
    giou = iou2d.elementwise_box_iou(pd_boxes, tgt_boxes)
    iou_loss = jnp.sum((1.0 - giou) * matched) / num_boxes

    tgt_boxes_3d = jnp.take_along_axis(
        gt_boxes_3d, safe_col[..., None, None], axis=1
    )
    l1_3d = jnp.mean(
        jnp.abs(pd_boxes_3d - tgt_boxes_3d), axis=(-2, -1)
    )
    box3d_loss = jnp.sum(l1_3d * matched) / num_boxes
    return {
        "class_loss": class_loss,
        "box_loss": box_loss,
        "iou_loss": iou_loss,
        "box3d_loss": box3d_loss,
        "num_boxes": num_boxes,
    }


def detr_loss(
    outputs: dict,
    gt_labels,        # [B, N] int (class index; padded entries arbitrary)
    gt_boxes_2d,      # [B, N, 4] normalized xyxy
    gt_boxes_3d,      # [B, N, 8, 3]
    gt_valid,         # [B, N] bool
    num_classes: int = 1,
    class_weight: float = 1.0,
    box_weight: float = 5.0,
    iou_weight: float = 2.0,
    box3d_weight: float = 1.0,
    focal_matching: bool = False,
    axis_name: str | None = None,
):
    """Hungarian-matched DETR losses with cross-device box-count
    normalization (the reference's all_reduce at detr.py:47-49 becomes a
    `pmean` over ``axis_name`` when provided).

    When ``outputs`` carries ``aux_outputs`` (per-decoder-layer head
    outputs), each intermediate layer is independently matched and its
    losses added, mirroring the reference's auxiliary decoding losses
    (detr.py:213-229); the returned aux dict exposes per-layer scalars
    as ``aux{i}_<name>``.
    """

    def weighted(terms):
        return (
            class_weight * terms["class_loss"]
            + box_weight * terms["box_loss"]
            + iou_weight * terms["iou_loss"]
            + box3d_weight * terms["box3d_loss"]
        )

    terms = _single_level_loss(
        outputs, gt_labels, gt_boxes_2d, gt_boxes_3d, gt_valid,
        num_classes, focal_matching, axis_name,
    )
    total = weighted(terms)
    scalars = dict(terms)
    for index, aux in enumerate(outputs.get("aux_outputs", [])):
        aux_terms = _single_level_loss(
            aux, gt_labels, gt_boxes_2d, gt_boxes_3d, gt_valid,
            num_classes, focal_matching, axis_name,
        )
        total = total + weighted(aux_terms)
        scalars.update(
            {f"aux{index}_{k}": v for k, v in aux_terms.items()}
        )
    return total, scalars
