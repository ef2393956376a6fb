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
"""

from __future__ import annotations

import dataclasses
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
    """Small strided CNN backbone (stride 16)."""

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


class DETR3D(nn.Module):
    """Feed-forward 3D detector.

    Outputs per query: class logits (+1 no-object), 2D boxes in
    normalized cxcywh, 3D boxes as 8 corners in camera space (decoded
    from predicted pixel location + depth + dims + yaw, mirroring the
    reference's unprojection head, detr.py:265-280), confidences.
    """

    num_classes: int = 1
    num_queries: int = 50
    hidden_dim: int = 256
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    num_heads: int = 8

    @nn.compact
    def __call__(self, images, intrinsic_matrices):
        # images NHWC in [0, 1]
        features = ConvBackbone()(images)
        b, h, w, _ = features.shape
        tokens = nn.Dense(self.hidden_dim)(features)
        tokens = tokens + positional_encoding_2d(h, w, self.hidden_dim)
        tokens = tokens.reshape(b, h * w, self.hidden_dim)

        for _ in range(self.num_encoder_layers):
            tokens = TransformerLayer(self.hidden_dim, self.num_heads)(tokens)

        queries = self.param(
            "query_embeddings",
            nn.initializers.normal(0.02),
            (self.num_queries, self.hidden_dim),
        )
        queries = jnp.broadcast_to(
            queries, (b, self.num_queries, self.hidden_dim)
        )
        for _ in range(self.num_decoder_layers):
            queries = TransformerLayer(self.hidden_dim, self.num_heads)(queries)
            queries = TransformerLayer(self.hidden_dim, self.num_heads)(
                queries, tokens
            )

        logits = nn.Dense(self.num_classes + 1)(queries)
        boxes_2d = jax.nn.sigmoid(nn.Dense(4)(queries))  # cxcywh, normalized
        confidences = jax.nn.sigmoid(nn.Dense(1)(queries))[..., 0]

        # 3D head: normalized pixel (u, v), depth, half-dims, yaw(cos,sin)
        raw = nn.Dense(8)(queries)
        uv = jax.nn.sigmoid(raw[..., :2])
        depth = jax.nn.softplus(raw[..., 2:3]) + 1.0
        dims = jax.nn.softplus(raw[..., 3:6]) + 0.3
        cos_sin = raw[..., 6:8]
        cos_sin = cos_sin / jnp.clip(
            jnp.linalg.norm(cos_sin, axis=-1, keepdims=True), min=1e-6
        )

        height_img, width_img = images.shape[1:3]
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


class DeformableDETR3D(DETR3D):
    """Deformable-attention variant (reference deformable_detr.py):
    decoder cross-attention samples sparse locations from the feature map
    instead of attending globally."""

    num_samples: int = 8

    @nn.compact
    def __call__(self, images, intrinsic_matrices):
        from ..modules.attention import MultiHeadDeformableAttention

        features = ConvBackbone()(images)
        b, h, w, _ = features.shape
        feature_maps = nn.Dense(self.hidden_dim)(features)
        feature_maps = feature_maps + positional_encoding_2d(
            h, w, self.hidden_dim
        )
        tokens = feature_maps.reshape(b, h * w, self.hidden_dim)
        for _ in range(self.num_encoder_layers):
            tokens = TransformerLayer(self.hidden_dim, self.num_heads)(tokens)
        encoded_maps = tokens.reshape(b, h, w, self.hidden_dim)

        queries = self.param(
            "query_embeddings",
            nn.initializers.normal(0.02),
            (self.num_queries, self.hidden_dim),
        )
        queries = jnp.broadcast_to(
            queries, (b, self.num_queries, self.hidden_dim)
        )
        for _ in range(self.num_decoder_layers):
            queries = TransformerLayer(self.hidden_dim, self.num_heads)(queries)
            sampled = MultiHeadDeformableAttention(
                out_channels=self.hidden_dim,
                num_samples=self.num_samples,
                num_heads=self.num_heads,
            )(queries, encoded_maps, encoded_maps)
            queries = queries + sampled

        logits = nn.Dense(self.num_classes + 1)(queries)
        boxes_2d = jax.nn.sigmoid(nn.Dense(4)(queries))
        confidences = jax.nn.sigmoid(nn.Dense(1)(queries))[..., 0]
        raw = nn.Dense(8)(queries)
        uv = jax.nn.sigmoid(raw[..., :2])
        depth = jax.nn.softplus(raw[..., 2:3]) + 1.0
        dims = jax.nn.softplus(raw[..., 3:6]) + 0.3
        cos_sin = raw[..., 6:8]
        cos_sin = cos_sin / jnp.clip(
            jnp.linalg.norm(cos_sin, axis=-1, keepdims=True), min=1e-6
        )
        height_img, width_img = images.shape[1:3]
        pixels = jnp.stack(
            [
                uv[..., 0] * width_img,
                uv[..., 1] * height_img,
                jnp.ones_like(uv[..., 0]),
            ],
            axis=-1,
        )
        inv_k = jnp.linalg.inv(intrinsic_matrices)
        locations = jnp.einsum("bij,bqj->bqi", inv_k, pixels) * depth
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


def cxcywh_to_xyxy(boxes):
    cx, cy, w, h = jnp.moveaxis(boxes, -1, 0)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


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
    axis_name: str | None = None,
):
    """Hungarian-matched DETR losses with cross-device box-count
    normalization (the reference's all_reduce at detr.py:47-49 becomes a
    `pmean` over ``axis_name`` when provided)."""
    logits = outputs["logits"]                  # [B, Q, C+1]
    pd_boxes = cxcywh_to_xyxy(outputs["boxes_2d"])  # [B, Q, 4]
    pd_boxes_3d = outputs["boxes_3d"]           # [B, Q, 8, 3]
    b, q = logits.shape[:2]
    n = gt_labels.shape[1]

    probs = jax.nn.softmax(logits, axis=-1)

    def match_one(prob, pd_box, gt_label, gt_box, valid):
        class_cost = -prob[:, gt_label]                         # [Q, N]
        box_cost = jnp.mean(
            jnp.abs(pd_box[:, None] - gt_box[None]), axis=-1
        )
        iou_cost = -iou2d.box_iou(pd_box, gt_box)
        cost = class_cost + 5.0 * box_cost + 2.0 * iou_cost
        row_valid = jnp.ones(q, bool)
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

    total = (
        class_weight * class_loss
        + box_weight * box_loss
        + iou_weight * iou_loss
        + box3d_weight * box3d_loss
    )
    return total, {
        "class_loss": class_loss,
        "box_loss": box_loss,
        "iou_loss": iou_loss,
        "box3d_loss": box3d_loss,
        "num_boxes": num_boxes,
    }
