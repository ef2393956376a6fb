"""Depth-based view warping and splatting.

jax re-design of the warping half of
`/root/reference/vsrd/operations/geometric_operations.py:147-321`:
backward warping gathers with bilinear grid_sample; forward warping
scatters with bilinear `scatter-add` splatting (the reference's
grid_splatting). Feature maps are NCHW to match the geometry helpers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import backprojection, projection
from .grid_sample import grid_sample


def _linear_map(values, in_min, in_max, out_min, out_max):
    return (values - in_min) / (in_max - in_min) * (out_max - out_min) + out_min


def backward_warping(
    source_feature_maps,      # [B, C, H, W]
    target_depth_maps,        # [B, 1, H, W]
    source_intrinsic_matrices,
    target_intrinsic_matrices,
    source_extrinsic_matrices=None,
    target_extrinsic_matrices=None,
    epsilon=1e-6,
):
    """Sample source features at target pixels' reprojections
    (reference geometric_operations.py:147-177)."""
    coords = backprojection(
        target_depth_maps[:, 0], target_intrinsic_matrices,
        target_extrinsic_matrices,
    )                                                      # [B, H, W, 4]
    pix = projection(
        coords, source_intrinsic_matrices[:, None, None],
        source_extrinsic_matrices[:, None, None]
        if source_extrinsic_matrices is not None else None,
    )                                                      # [B, H, W, 3]
    w = source_feature_maps.shape[-1]
    h = source_feature_maps.shape[-2]
    x = _linear_map(pix[..., 0] / (pix[..., 2] + epsilon), 0, w - 1, -1.0, 1.0)
    y = _linear_map(pix[..., 1] / (pix[..., 2] + epsilon), 0, h - 1, -1.0, 1.0)
    grid = jnp.stack([x, y], axis=-1)
    return jax.vmap(lambda f, g: grid_sample(f, g, align_corners=True))(
        source_feature_maps, grid
    )


def grid_splatting(
    inputs,        # [B, C, H, W]
    coords,        # [B, H, W, 2] target pixel coords (x, y)
    image_size=None,
    epsilon=1e-6,
):
    """Bilinear scatter-splat of features to target coordinates with
    weight normalization (reference geometric_operations.py:213-321)."""
    b, c, h, w = inputs.shape
    out_h, out_w = image_size or (h, w)

    def splat_one(features, coord):
        x = coord[..., 0].reshape(-1)
        y = coord[..., 1].reshape(-1)
        feat = features.reshape(c, -1)                      # [C, P]

        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        out = jnp.zeros((c, out_h * out_w))
        weight = jnp.zeros((out_h * out_w,))
        for dy in (0, 1):
            for dx in (0, 1):
                xi = x0 + dx
                yi = y0 + dy
                wgt = (1.0 - jnp.abs(xi - x)) * (1.0 - jnp.abs(yi - y))
                inside = (xi >= 0) & (xi < out_w) & (yi >= 0) & (yi < out_h)
                wgt = jnp.where(inside, wgt, 0.0)
                idx = (
                    jnp.clip(yi, 0, out_h - 1) * out_w
                    + jnp.clip(xi, 0, out_w - 1)
                ).astype(jnp.int32)
                out = out.at[:, idx].add(feat * wgt[None])
                weight = weight.at[idx].add(wgt)
        out = out / jnp.clip(weight, min=epsilon)[None]
        return out.reshape(c, out_h, out_w)

    return jax.vmap(splat_one)(inputs, coords)


def forward_warping(
    source_feature_maps,
    source_depth_maps,
    source_intrinsic_matrices,
    target_intrinsic_matrices,
    source_extrinsic_matrices=None,
    target_extrinsic_matrices=None,
    epsilon=1e-6,
):
    """Splat source features to their target reprojections
    (reference geometric_operations.py:180-210)."""
    coords = backprojection(
        source_depth_maps[:, 0], source_intrinsic_matrices,
        source_extrinsic_matrices,
    )
    pix = projection(
        coords, target_intrinsic_matrices[:, None, None],
        target_extrinsic_matrices[:, None, None]
        if target_extrinsic_matrices is not None else None,
    )
    xy = pix[..., :2] / (pix[..., 2:] + epsilon)
    return grid_splatting(source_feature_maps, xy)


def correlation(target_features, source_features, normalize=False,
                keepdims=False):
    """Mean channel correlation cost (reference :324-329; NCHW)."""
    if normalize:
        target_features = target_features / jnp.clip(
            jnp.linalg.norm(target_features, axis=1, keepdims=True), min=1e-12
        )
        source_features = source_features / jnp.clip(
            jnp.linalg.norm(source_features, axis=1, keepdims=True), min=1e-12
        )
    return jnp.mean(target_features * source_features, axis=1, keepdims=keepdims)


def groupwise_correlation(target_features, source_features, num_groups,
                          normalize=False, keepdims=False):
    """Group-wise correlation cost volume (reference :332-340)."""
    b, c = target_features.shape[:2]
    shape = (b, num_groups, c // num_groups, *target_features.shape[2:])
    t = target_features.reshape(shape)
    s = source_features.reshape(shape)
    if normalize:
        t = t / jnp.clip(jnp.linalg.norm(t, axis=2, keepdims=True), min=1e-12)
        s = s / jnp.clip(jnp.linalg.norm(s, axis=2, keepdims=True), min=1e-12)
    return jnp.mean(t * s, axis=2, keepdims=keepdims)
