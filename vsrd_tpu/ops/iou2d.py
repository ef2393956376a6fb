"""2D box IoU family (IoU / distance-IoU / DIoU loss / smooth L1).

jax re-implementations of the torchvision ops used on the reference hot
path (`/root/reference/scripts/main.py:374-415`):
`torchvision.ops.box_iou`, `distance_box_iou`, `distance_box_iou_loss`
and `torch.nn.functional.smooth_l1_loss`. Boxes are ``(x0, y0, x1, y1)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes):
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def _pairwise_inter_union(boxes1, boxes2):
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, min=0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter, union


def box_iou(boxes1, boxes2, epsilon: float = 0.0):
    """Pairwise IoU ``[..., N, 4] x [..., M, 4] -> [..., N, M]``."""
    inter, union = _pairwise_inter_union(boxes1, boxes2)
    return inter / (union + epsilon)


def distance_box_iou(boxes1, boxes2, epsilon: float = 1e-7):
    """Pairwise DIoU (torchvision.ops.distance_box_iou)."""
    inter, union = _pairwise_inter_union(boxes1, boxes2)
    iou = inter / (union + epsilon)

    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    diag = jnp.sum(jnp.square(rb - lt), axis=-1) + epsilon

    c1 = (boxes1[..., :2] + boxes1[..., 2:]) / 2.0
    c2 = (boxes2[..., :2] + boxes2[..., 2:]) / 2.0
    dist = jnp.sum(
        jnp.square(c1[..., :, None, :] - c2[..., None, :, :]), axis=-1
    )
    return iou - dist / diag


def elementwise_box_iou(boxes1, boxes2, epsilon: float = 1e-7):
    """Elementwise IoU over matching leading shapes ``[..., 4]``."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, min=0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / (union + epsilon)


def distance_box_iou_loss(boxes1, boxes2, epsilon: float = 1e-7):
    """Elementwise DIoU loss (torchvision.ops.distance_box_iou_loss)."""
    iou = elementwise_box_iou(boxes1, boxes2, epsilon)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    diag = jnp.sum(jnp.square(rb - lt), axis=-1) + epsilon
    c1 = (boxes1[..., :2] + boxes1[..., 2:]) / 2.0
    c2 = (boxes2[..., :2] + boxes2[..., 2:]) / 2.0
    dist = jnp.sum(jnp.square(c1 - c2), axis=-1)
    return 1.0 - (iou - dist / diag)


def smooth_l1(inputs, targets, beta: float = 1.0):
    """torch.nn.functional.smooth_l1_loss with reduction='none'."""
    diff = jnp.abs(inputs - targets)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
