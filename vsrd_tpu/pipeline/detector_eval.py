"""Detection-quality evaluation for the trained DETR3D leg.

The reference delegates detector training/eval to external repos
(reference README.md:122-186 points at MonoFlex-style trainers); this
module gives the in-framework leg a quantitative accuracy signal:
AP at 3D-IoU thresholds (the KITTI-style metric family), mean matched
3D IoU, and matched box corner L1 — computed from DETR3D outputs
against (pseudo-)ground-truth corner boxes.

Host-side accumulation + one jitted pairwise-IoU kernel: evaluation
runs at checkpoint cadence, not in the train step, so clarity wins over
fusing it into the graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry, iou3d


@functools.partial(jax.jit, static_argnames=())
def _pairwise_iou_3d(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """[Qa, 8, 3] x [Qb, 8, 3] camera-frame corner boxes -> [Qa, Qb] 3D
    IoU. Rotates to the z-up frame iou3d.box_3d_iou expects (same
    Rx(-pi/2) as pipeline.optimize.compute_metrics)."""
    rot = geometry.rotation_matrix_x(jnp.asarray(-jnp.pi / 2.0))
    boxes_a = boxes_a @ rot.T
    boxes_b = boxes_b @ rot.T
    return jax.vmap(
        lambda a: jax.vmap(lambda b: iou3d.box_3d_iou(a, b)[0])(boxes_b)
    )(boxes_a)


def extract_detections(outputs, score_threshold=0.0):
    """DETR3D head outputs -> per-image (boxes_3d, scores, labels).

    Score = P(class c) from the (C+1)-way softmax (background dropped),
    matching the reference's convert_predictions confidence usage.
    Returns numpy lists over the batch.
    """
    probs = jax.nn.softmax(np.asarray(outputs["logits"]), axis=-1)[..., :-1]
    scores = np.asarray(probs.max(axis=-1))
    labels = np.asarray(probs.argmax(axis=-1))
    boxes = np.asarray(outputs["boxes_3d"])
    dets = []
    for b in range(scores.shape[0]):
        keep = scores[b] >= score_threshold
        dets.append((boxes[b][keep], scores[b][keep], labels[b][keep]))
    return dets


def average_precision(scores, tp, num_gt):
    """Continuous-interpolation AP (area under the precision envelope),
    the standard COCO/KITTI-style estimator."""
    if num_gt == 0:
        return float("nan")
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-np.asarray(scores), kind="stable")
    tp = np.asarray(tp, np.float64)[order]
    fp = 1.0 - tp
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(fp)
    recall = cum_tp / num_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-12)
    # precision envelope (monotone non-increasing from the right)
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    # integrate over recall steps
    recall = np.concatenate([[0.0], recall])
    precision = np.concatenate([[precision[0] if len(precision) else 0.0],
                                precision])
    return float(np.sum((recall[1:] - recall[:-1]) * precision[1:]))


class DetectionEvaluator:
    """Accumulates per-image detections/GT; reports AP@{thresholds},
    mean matched 3D IoU, and matched corner L1 (meters).

    Greedy confidence-ordered matching per image per class (each GT box
    matched at most once), the standard AP protocol.
    """

    def __init__(self, iou_thresholds=(0.25, 0.5), num_classes=1):
        self.iou_thresholds = tuple(iou_thresholds)
        self.num_classes = num_classes
        # per (class, threshold): list of (score, tp) over all images
        self._records = {
            (c, t): []
            for c in range(num_classes)
            for t in self.iou_thresholds
        }
        self._num_gt = {c: 0 for c in range(num_classes)}
        self._matched_ious = []
        self._matched_l1 = []

    def add_image(self, det_boxes, det_scores, det_labels,
                  gt_boxes, gt_labels):
        """det_boxes [Q,8,3], det_scores [Q], det_labels [Q];
        gt_boxes [N,8,3], gt_labels [N] (pass only VALID gt rows)."""
        det_boxes = np.asarray(det_boxes, np.float32)
        gt_boxes = np.asarray(gt_boxes, np.float32)
        for c in range(self.num_classes):
            d_idx = np.nonzero(np.asarray(det_labels) == c)[0]
            g_idx = np.nonzero(np.asarray(gt_labels) == c)[0]
            self._num_gt[c] += len(g_idx)
            if len(d_idx) == 0:
                continue
            order = d_idx[np.argsort(-np.asarray(det_scores)[d_idx],
                                     kind="stable")]
            if len(g_idx) == 0:
                for t in self.iou_thresholds:
                    self._records[(c, t)].extend(
                        (float(det_scores[i]), 0.0) for i in order
                    )
                continue
            iou = np.asarray(
                _pairwise_iou_3d(
                    jnp.asarray(det_boxes[order]), jnp.asarray(gt_boxes[g_idx])
                )
            )  # [D, G]
            for t in self.iou_thresholds:
                taken = np.zeros(len(g_idx), bool)
                for di, i in enumerate(order):
                    gi = int(np.argmax(np.where(taken, -1.0, iou[di])))
                    hit = (not taken[gi]) and iou[di, gi] >= t
                    if hit:
                        taken[gi] = True
                    self._records[(c, t)].append(
                        (float(det_scores[i]), 1.0 if hit else 0.0)
                    )
            # matched-quality stats at the loosest threshold
            t0 = min(self.iou_thresholds)
            taken = np.zeros(len(g_idx), bool)
            for di, i in enumerate(order):
                gi = int(np.argmax(np.where(taken, -1.0, iou[di])))
                if not taken[gi] and iou[di, gi] >= t0:
                    taken[gi] = True
                    self._matched_ious.append(float(iou[di, gi]))
                    self._matched_l1.append(
                        float(
                            np.abs(
                                det_boxes[i] - gt_boxes[g_idx[gi]]
                            ).mean()
                        )
                    )

    def summarize(self) -> dict:
        out = {}
        for t in self.iou_thresholds:
            aps = [
                average_precision(
                    [s for s, _ in self._records[(c, t)]],
                    [tp for _, tp in self._records[(c, t)]],
                    self._num_gt[c],
                )
                for c in range(self.num_classes)
                if self._num_gt[c] > 0
            ]
            out[f"ap_{t:g}"] = float(np.mean(aps)) if aps else float("nan")
        out["mean_matched_iou_3d"] = (
            float(np.mean(self._matched_ious)) if self._matched_ious
            else 0.0
        )
        out["matched_corner_l1_m"] = (
            float(np.mean(self._matched_l1)) if self._matched_l1
            else float("nan")
        )
        out["num_gt"] = int(sum(self._num_gt.values()))
        out["recall_loosest"] = (
            len(self._matched_ious) / max(sum(self._num_gt.values()), 1)
        )
        return out


def evaluate_model(model, params, batches, num_classes=1,
                   iou_thresholds=(0.25, 0.5), score_threshold=0.05):
    """Run the model over ``batches`` (iterable of train-format batches)
    and return the metric summary dict."""
    apply = jax.jit(
        lambda p, img, k: model.apply(p, img, k)
    )
    ev = DetectionEvaluator(iou_thresholds, num_classes)
    for batch in batches:
        outputs = apply(params, batch["images"], batch["intrinsics"])
        dets = extract_detections(outputs, score_threshold)
        valid = np.asarray(batch["valid"])
        gt3 = np.asarray(batch["boxes_3d"])
        gtl = np.asarray(batch["labels"])
        for b, (boxes, scores, labels) in enumerate(dets):
            keep = valid[b]
            ev.add_image(boxes, scores, labels, gt3[b][keep], gtl[b][keep])
    return ev.summarize()
