"""Detector accuracy signal (pipeline/detector_eval.py).

Fast tier: AP estimator + evaluator protocol unit tests.
Slow tier: DETR3D overfits a small synthetic pseudo-labeled set to
high matched 3D IoU / near-zero corner L1 / AP@0.25 = 1 — the
quantitative bound beyond "loss decreases" (reference detector contract:
/root/reference/vsrd/models/detectors/detr.py:213-280).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsrd_tpu.models import box_parameters, detr3d
from vsrd_tpu.pipeline import detector_eval, detector_training as dt
from vsrd_tpu.pipeline import frame as fm


def _box(center, half=(0.9, 0.8, 2.2), yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    rot = jnp.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], jnp.float32)
    return np.asarray(
        box_parameters.decode_box_3d(
            jnp.asarray(center, jnp.float32), jnp.asarray(half, jnp.float32),
            rot,
        )
    )


def test_average_precision_hand_cases():
    # perfect ranking: 2 TPs then an FP -> AP 1.0
    assert detector_eval.average_precision(
        [0.9, 0.8, 0.1], [1, 1, 0], 2
    ) == pytest.approx(1.0)
    # FP ranked first halves early precision
    ap = detector_eval.average_precision([0.9, 0.8], [0, 1], 1)
    assert ap == pytest.approx(0.5)
    # no detections
    assert detector_eval.average_precision([], [], 3) == 0.0
    # no gt -> NaN (class skipped upstream)
    assert np.isnan(detector_eval.average_precision([0.5], [0], 0))


def test_evaluator_perfect_and_missed():
    gt = np.stack([_box([0, 0, 10]), _box([4, 0, 14], yaw=0.3)])
    ev = detector_eval.DetectionEvaluator(iou_thresholds=(0.25, 0.5))
    # exact detections + one low-confidence far FP
    dets = np.concatenate([gt, _box([40, 0, 40])[None]])
    ev.add_image(dets, [0.9, 0.8, 0.1], [0, 0, 0], gt, [0, 0])
    out = ev.summarize()
    assert out["ap_0.25"] == pytest.approx(1.0)
    assert out["ap_0.5"] == pytest.approx(1.0)
    assert out["mean_matched_iou_3d"] == pytest.approx(1.0, abs=1e-5)
    assert out["matched_corner_l1_m"] == pytest.approx(0.0, abs=1e-5)

    # one gt entirely missed: recall caps AP
    ev2 = detector_eval.DetectionEvaluator(iou_thresholds=(0.5,))
    ev2.add_image(gt[:1], [0.9], [0], gt, [0, 0])
    out2 = ev2.summarize()
    assert out2["ap_0.5"] == pytest.approx(0.5)
    assert out2["recall_loosest"] == pytest.approx(0.5)


def test_average_precision_r40_hand_cases():
    # perfect ranking -> 1.0 (all 40 recall points see precision 1)
    assert detector_eval.average_precision_r40(
        [0.9, 0.8], [1, 1], 2
    ) == pytest.approx(1.0)
    # FP first, then the TP: envelope precision at every reachable
    # recall point is 0.5 -> AP|R40 = 0.5
    assert detector_eval.average_precision_r40(
        [0.9, 0.8], [0, 1], 1
    ) == pytest.approx(0.5)
    # recall saturates at 0.5 (1 of 2 gt found, perfect precision):
    # the 20 recall points <= 0.5 see precision 1, the rest 0
    assert detector_eval.average_precision_r40(
        [0.9], [1], 2
    ) == pytest.approx(0.5)
    assert detector_eval.average_precision_r40([], [], 3) == 0.0
    assert np.isnan(detector_eval.average_precision_r40([0.5], [0], 0))


def test_kitti_difficulty_regimes():
    """Devkit ignore semantics: GT below a regime's height/occlusion/
    truncation cut is ignored (not FN; matches to it absorbed), and
    detections shorter than min_height are ignored rather than FP."""
    tall = _box([0, 0, 10])        # easy-eligible (50 px)
    short = _box([4, 0, 30])       # 30 px: moderate/hard only
    gt = np.stack([tall, short])
    ev = detector_eval.DetectionEvaluator(iou_thresholds=(0.5,))
    # perfect detections for both + one tiny far FP (20 px < 25)
    dets = np.concatenate([gt, _box([40, 0, 60])[None]])
    ev.add_image(
        dets, [0.9, 0.8, 0.7], [0, 0, 0], gt, [0, 0],
        gt_heights_px=[50.0, 30.0],
        det_heights_px=[50.0, 30.0, 20.0],
    )
    out = ev.summarize()
    # easy: only the tall GT counts; the short-GT match is absorbed
    # (not an FP) and the tiny det is ignored -> perfect AP
    assert out["ap_r40_0.5_easy"] == pytest.approx(1.0)
    # moderate/hard: both GT count, tiny det ignored -> perfect AP
    assert out["ap_r40_0.5_moderate"] == pytest.approx(1.0)
    assert out["ap_r40_0.5_hard"] == pytest.approx(1.0)
    # "all" has no ignores: the far tiny det is a trailing FP
    recs = ev._records[(0, 0.5, "all")]
    assert sorted(tp for _, tp in recs) == [0.0, 1.0, 1.0]
    assert out["ap_r40_0.5"] == pytest.approx(1.0)  # FP after full recall

    # occlusion/truncation cuts: occluded GT leaves easy, stays moderate
    ev2 = detector_eval.DetectionEvaluator(iou_thresholds=(0.5,))
    ev2.add_image(
        gt[:1], [0.9], [0], gt[:1], [0],
        gt_heights_px=[50.0], gt_truncations=[0.2], gt_occlusions=[1],
        det_heights_px=[50.0],
    )
    out2 = ev2.summarize()
    assert np.isnan(out2["ap_r40_0.5_easy"])       # zero easy GT
    assert out2["ap_r40_0.5_moderate"] == pytest.approx(1.0)
    assert out2["ap_r40_0.5_hard"] == pytest.approx(1.0)


def test_difficulty_keys_absent_without_metadata():
    gt = _box([0, 0, 10])[None]
    ev = detector_eval.DetectionEvaluator(iou_thresholds=(0.25,))
    ev.add_image(gt, [0.9], [0], gt, [0])
    out = ev.summarize()
    assert "ap_r40_0.25" in out
    assert not any(k.endswith("easy") for k in out)


def test_evaluator_double_match_forbidden():
    """Two detections on the same gt: second is an FP (greedy protocol)."""
    gt = _box([0, 0, 10])[None]
    ev = detector_eval.DetectionEvaluator(iou_thresholds=(0.25,))
    near = _box([0.05, 0, 10.05])
    ev.add_image(
        np.stack([gt[0], near]), [0.9, 0.85], [0, 0], gt, [0]
    )
    out = ev.summarize()
    recs = ev._records[(0, 0.25, "all")]
    assert [tp for _, tp in sorted(recs, reverse=True)] == [1.0, 0.0]
    assert out["ap_0.25"] == pytest.approx(1.0)  # FP after full recall


def _overfit_batch(num_frames=4, image_size=(48, 64), max_boxes=4):
    """Synthetic single-view frames as a constant detector batch."""
    h, w = image_size
    images, intrinsics, labels, b2, b3, valid = [], [], [], [], [], []
    for i in range(num_frames):
        fr = fm.synthetic_frame(
            jax.random.PRNGKey(10 + i), num_views=1, image_size=image_size,
            num_instances=2, max_instances=max_boxes, with_images=True,
        )
        gray = np.asarray(fr.gray_images[0])  # [H, W]
        images.append(np.repeat(gray[..., None], 3, axis=-1))
        intrinsics.append(np.asarray(fr.intrinsics[0]))
        gt2 = np.asarray(fr.gt_boxes_2d[0])  # [N, 2, 2] pixel min/max
        xyxy = gt2.reshape(max_boxes, 4) / np.asarray([w, h, w, h])
        b2.append(np.clip(xyxy, 0, 1).astype(np.float32))
        gt3 = np.nan_to_num(np.asarray(fr.gt_boxes_3d), nan=0.0)
        b3.append(gt3.astype(np.float32))
        labels.append(np.zeros(max_boxes, np.int32))
        valid.append(np.asarray(fr.valid))
    return {
        "images": jnp.asarray(np.stack(images)),
        "intrinsics": jnp.asarray(np.stack(intrinsics)),
        "labels": jnp.asarray(np.stack(labels)),
        "boxes_2d": jnp.asarray(np.stack(b2)),
        "boxes_3d": jnp.asarray(np.stack(b3)),
        "valid": jnp.asarray(np.stack(valid)),
    }


@pytest.mark.slow
def test_detr3d_overfits_to_high_matched_iou():
    batch = _overfit_batch()
    model = detr3d.DETR3D(
        num_classes=1, num_queries=8, hidden_dim=64,
        num_encoder_layers=1, num_decoder_layers=2, num_heads=4,
    )
    h, w = batch["images"].shape[1:3]
    params, tx, opt_state = dt.create_train_state(
        jax.random.PRNGKey(0), model, (h, w), learning_rate=3e-4
    )
    mesh = dt.make_dp_mesh(jax.devices()[:4])
    step_fn = dt.make_dp_train_step(model, tx, mesh)
    sharded = dt.shard_batch(batch, mesh)

    first = None
    for step in range(1500):
        params, opt_state, loss, aux = step_fn(params, opt_state, sharded)
        if first is None:
            first = float(loss)
    last = float(loss)
    assert last < first * 0.2, (first, last)

    metrics = detector_eval.evaluate_model(model, params, [batch])
    # overfit bound: every gt box recovered at 0.25 IoU with tight
    # corners (batch is the training set — this is a capacity/gradient
    # sanity bound, not generalization)
    assert metrics["ap_0.25"] > 0.99, metrics
    assert metrics["mean_matched_iou_3d"] > 0.5, metrics
    assert metrics["matched_corner_l1_m"] < 0.35, metrics
