"""Reference-grade TensorBoard diagnostic image panels.

Mirrors the reference's per-``image_intervals`` dumps
(`/root/reference/scripts/main.py:955-1107`):

* ``gt/{k}``    — per view: image + GT instance masks + GT 3D wireframes
  + sampled-ray pixels (red dots);
* ``pd/0``      — target view: image + predicted masks (volumetric
  probabilities x sphere-traced surface mask) + predicted wireframes;
* ``bev/0``     — white canvas with GT footprints (red) vs predicted
  (blue), rectified.

Host-side numpy/cv2 over two jitted full-image renders
(pipeline/render_image.py); called from the driver at checkpoint
boundaries, far off the hot path.
"""

from __future__ import annotations

import jax
import numpy as np

from ..models import box_parameters
from ..pipeline import render_image
from ..pipeline.frame import FrameData
from . import drawers

WIREFRAME_LINES = drawers.LINE_INDICES + [[0, 5], [1, 4]]  # main.py:979


def _base_image(frame: FrameData, view: int) -> np.ndarray:
    h, w = frame.image_size
    if frame.gray_images is not None:
        gray = np.asarray(frame.gray_images[view], np.float32)
        return np.repeat(gray[..., None], 3, axis=-1)
    return np.zeros((h, w, 3), np.float32)


def _view_masks(frame: FrameData, view: int) -> np.ndarray:
    h, w = frame.image_size
    n = frame.max_instances
    flat = np.asarray(frame.soft_masks_flat, np.float32)
    return flat.reshape(frame.num_views, h, w, n)[view].transpose(2, 0, 1)


def diagnostic_panels(
    params,
    frame: FrameData,
    step: int,
    cfg,
    key=None,
    surface_mask: bool = True,
):
    """Returns ``{name: [H, W, 3] float image}`` for TensorBoard.

    ``gt/{index}`` for every view, ``pd/target`` + ``bev/target`` for the
    target view. ``key`` draws a fresh ray sample for the dot overlay
    (the reference draws the step's own sample, main.py:965-971; the
    jitted scan does not surface it, so an identically-distributed
    sample is drawn here). ``surface_mask=False`` skips the sphere-traced
    mask (pd masks become purely volumetric) for cheap test runs.
    """
    from ..ops import sampling

    h, w = frame.image_size
    n = frame.max_instances
    valid = np.asarray(frame.valid)
    target = int(frame.target_index)
    panels = {}

    # sampled-ray dots, one draw shared by all views
    if key is None:
        key = jax.random.PRNGKey(int(step))
    cand = sampling.multinomial_logits(
        key, frame.candidate_weights, cfg.num_rays, sorted_logits=True
    )
    ray_idx = np.asarray(frame.candidate_indices)[np.asarray(cand)]
    views = ray_idx // (h * w)
    ys = (ray_idx % (h * w)) // w
    xs = ray_idx % w

    gt_world = np.asarray(frame.gt_boxes_3d)  # [N, 8, 3] target-camera frame
    finite = np.isfinite(gt_world.reshape(n, -1)).all(-1) & valid
    extrinsics = np.asarray(frame.extrinsics)
    intrinsics = np.asarray(frame.intrinsics)

    for view in range(frame.num_views):
        image = _base_image(frame, view)
        image = drawers.draw_masks(image, _view_masks(frame, view)[valid])
        if finite.any():
            hom = np.concatenate(
                [gt_world[finite], np.ones((finite.sum(), 8, 1))], axis=-1
            )
            cam = np.einsum("mn,ikn->ikm", extrinsics[view], hom)[..., :3]
            image = drawers.draw_boxes_3d(
                image, cam, intrinsics[view],
                line_indices=WIREFRAME_LINES, color=(255, 255, 255),
            )
        sel = views == view
        if sel.any():
            image = drawers.draw_points_2d(
                image,
                np.stack([xs[sel], ys[sel]], axis=-1),
                color=(255, 0, 0),
                radius=2,
            )
        name = f"gt/{view - target:d}"
        panels[name] = image

    # predicted masks + wireframes on the target view (main.py:1011-1075)
    decoded = jax.device_get(box_parameters.decode_boxes(params["boxes"]))
    pd_world = np.asarray(decoded["boxes_3d"])
    probs = np.asarray(
        render_image.render_instance_probabilities(
            params, frame, int(step), cfg, view=target
        )
    )  # [H, W, N]
    pd_masks = probs.transpose(2, 0, 1)
    if surface_mask:
        surf = np.asarray(
            render_image.render_surface_mask(
                params, frame, int(step), cfg, view=target
            )
        )
        pd_masks = pd_masks * surf[None]
    image = _base_image(frame, target)
    image = drawers.draw_masks(image, pd_masks[valid])
    hom = np.concatenate([pd_world[valid], np.ones((valid.sum(), 8, 1))], -1)
    cam = np.einsum("mn,ikn->ikm", extrinsics[target], hom)[..., :3]
    image = drawers.draw_boxes_3d(
        image, cam, intrinsics[target],
        line_indices=WIREFRAME_LINES, color=(255, 255, 255),
    )
    panels["pd/0"] = image

    # BEV: GT red vs predicted blue on a white canvas (main.py:1069-1103)
    rect = np.asarray(frame.rectification)
    canvas = np.ones((1000, 1000, 3), np.float32)
    if finite.any():
        canvas = drawers.draw_boxes_bev(
            canvas, gt_world[finite] @ rect.T, color=(255, 0, 0)
        )
    canvas = drawers.draw_boxes_bev(
        canvas, pd_world[valid] @ rect.T, color=(0, 0, 255)
    )
    panels["bev/0"] = canvas
    return panels


def write_panels(writer, panels: dict, step: int) -> None:
    """Log panels to a SummaryWriter as CHW images (main.py:1107)."""
    for name, image in panels.items():
        writer.add_image(
            f"images/{name}",
            np.clip(image, 0.0, 1.0).transpose(2, 0, 1),
            step,
        )
