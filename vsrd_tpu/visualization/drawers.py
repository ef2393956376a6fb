"""Drawing helpers (cv2-backed, numpy in/out).

Re-design of `/root/reference/vsrd/visualization/drawers.py:10-184`:
plain numpy HWC float images in [0, 1], no tensor bridging.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

LINE_INDICES = [
    [0, 1], [1, 2], [2, 3], [3, 0],
    [4, 5], [5, 6], [6, 7], [7, 4],
    [0, 4], [1, 5], [2, 6], [3, 7],
]


def _to_uint8(image):
    if image.dtype == np.uint8:
        return image.copy()
    return (np.clip(image, 0.0, 1.0) * 255).astype(np.uint8)


def _from_uint8(image, dtype):
    if dtype == np.uint8:
        return image
    return image.astype(np.float32) / 255.0


def _clip_line_to_front(p1, p2, epsilon=1e-6):
    """Clip a camera-space segment to z > 0; returns None if fully behind."""
    if p1[2] <= 0 and p2[2] <= 0:
        return None
    if p1[2] < p2[2]:
        p1, p2 = p2, p1
    if p2[2] <= 0:
        w = p1[2] / max(p1[2] - p2[2], epsilon)
        p2 = p1 + (p2 - p1) * min(w, 1.0)
    return p1, p2


def draw_boxes_3d(image, boxes_3d, intrinsic_matrix, line_indices=None,
                  color=(255, 255, 255), thickness=2, **kwargs):
    """Draw camera-space 8-corner wireframes with front clipping."""
    canvas = _to_uint8(image)
    line_indices = line_indices or LINE_INDICES
    boxes_3d = np.asarray(boxes_3d, np.float64).reshape(-1, 8, 3)
    k = np.asarray(intrinsic_matrix, np.float64)
    for box in boxes_3d:
        if not np.all(np.isfinite(box)):
            continue
        for i, j in line_indices:
            clipped = _clip_line_to_front(box[i].copy(), box[j].copy())
            if clipped is None:
                continue
            p1, p2 = clipped
            a = k @ p1
            b = k @ p2
            a = (a[:2] / max(a[2], 1e-6)).astype(int)
            b = (b[:2] / max(b[2], 1e-6)).astype(int)
            cv2.line(canvas, tuple(a), tuple(b), color, thickness, **kwargs)
    return _from_uint8(canvas, np.asarray(image).dtype)


def draw_boxes_bev(image, boxes_3d, x_range=(-50.0, 50.0),
                   z_range=(0.0, 100.0), color=(0, 0, 255), thickness=2,
                   draw_grid=True, **kwargs):
    """Bird's-eye-view footprints (x/z plane) on a square canvas."""
    canvas = _to_uint8(image)
    h, w = canvas.shape[:2]
    if draw_grid:
        for gx in range(0, w, w // 10):
            cv2.line(canvas, (gx, 0), (gx, h - 1), (200, 200, 200), 1)
        for gz in range(0, h, h // 10):
            cv2.line(canvas, (0, gz), (w - 1, gz), (200, 200, 200), 1)

    def to_pixel(point):
        px = (point[0] - x_range[0]) / (x_range[1] - x_range[0]) * (w - 1)
        pz = (1.0 - (point[2] - z_range[0]) / (z_range[1] - z_range[0])) * (h - 1)
        return int(px), int(pz)

    boxes_3d = np.asarray(boxes_3d, np.float64).reshape(-1, 8, 3)
    for box in boxes_3d:
        if not np.all(np.isfinite(box)):
            continue
        footprint = box[:4]  # top face corners share the BEV footprint
        points = [to_pixel(p) for p in footprint]
        for a, b in zip(points, points[1:] + points[:1]):
            cv2.line(canvas, a, b, color, thickness, **kwargs)
    return _from_uint8(canvas, np.asarray(image).dtype)


def draw_boxes_2d(image, boxes_2d, color=(0, 255, 0), thickness=2, **kwargs):
    canvas = _to_uint8(image)
    for box in np.asarray(boxes_2d).reshape(-1, 2, 2):
        p0 = tuple(np.asarray(box[0], int))
        p1 = tuple(np.asarray(box[1], int))
        cv2.rectangle(canvas, p0, p1, color, thickness, **kwargs)
    return _from_uint8(canvas, np.asarray(image).dtype)


def draw_points_2d(image, points_2d, color=(255, 0, 0), radius=2,
                   thickness=-1, **kwargs):
    canvas = _to_uint8(image)
    for point in np.asarray(points_2d).reshape(-1, 2):
        cv2.circle(canvas, tuple(point.astype(int)), radius, color,
                   thickness, **kwargs)
    return _from_uint8(canvas, np.asarray(image).dtype)


def draw_masks(image, masks, alpha=0.5, seed=0):
    """Alpha-blend per-instance masks with distinct colors."""
    image = np.asarray(image, np.float32)
    if image.dtype == np.uint8:
        image = image.astype(np.float32) / 255.0
    rng = np.random.default_rng(seed)
    out = image.copy()
    for mask in np.asarray(masks):
        color = rng.random(3) * 0.8 + 0.2
        blend = mask[..., None] > 0.5
        out = np.where(blend, out * (1 - alpha) + color * alpha, out)
    return out
