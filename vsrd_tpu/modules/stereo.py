"""Plane-sweep stereo cost volumes + spatial propagation.

jax re-design of `/root/reference/vsrd/modules/plane_sweep_stereo.py` and
`spatial_propagation.py` (NCHW feature maps, matching ops/warping.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.warping import backward_warping, correlation


@dataclass
class PlaneSweepStereo:
    """Multi-view cost volumes over fronto-parallel depth hypotheses
    (reference plane_sweep_stereo.py:7-66).

    ``depth_to_disparity`` / ``disparity_to_depth`` define the hypothesis
    spacing (e.g. inverse-depth); ``cost_function(warped, target)``
    returns per-pixel costs (default: feature correlation).
    """

    depth_range: tuple
    num_hypotheses: int
    depth_to_disparity: Callable = lambda depth: 1.0 / depth
    disparity_to_depth: Callable = lambda disparity: 1.0 / disparity
    cost_function: Callable = correlation

    def __call__(self, target, *sources, depth_range=None):
        """``target``/``sources`` are dicts with ``feature_maps [B, C, H, W]``,
        ``intrinsic_matrices [B, 3, 3]``, ``extrinsic_matrices [B, 4, 4]``,
        optional ``scale`` (feature pyramid level)."""
        lo, hi = depth_range or self.depth_range
        disparities = jnp.sort(
            jnp.asarray([self.depth_to_disparity(lo), self.depth_to_disparity(hi)])
        )
        hypotheses = jnp.linspace(disparities[0], disparities[1],
                                  self.num_hypotheses)
        depths = self.disparity_to_depth(hypotheses)

        target_maps = target["feature_maps"]
        b, _, h, w = target_maps.shape

        def scaled_k(inputs):
            scale = 0.5 ** inputs.get("scale", 0)
            diag = jnp.asarray(
                [[scale, 0, 0], [0, scale, 0], [0, 0, 1.0]],
                target_maps.dtype,
            )
            return diag[None] @ inputs["intrinsic_matrices"]

        def cost_for(source):
            def per_depth(depth):
                depth_maps = jnp.full((b, 1, h, w), depth, target_maps.dtype)
                warped = backward_warping(
                    source["feature_maps"],
                    depth_maps,
                    scaled_k(source),
                    scaled_k(target),
                    source.get("extrinsic_matrices"),
                    target.get("extrinsic_matrices"),
                )
                return self.cost_function(warped, target_maps)

            return jax.vmap(per_depth)(depths)                # [D, B, H, W]

        volumes = jnp.stack([cost_for(s) for s in sources])   # [S, D, B, H, W]
        return jnp.mean(volumes, axis=0).transpose(1, 0, 2, 3)  # [B, D, H, W]


@dataclass
class SpatialPropagation2d:
    """Anisotropic diffusion with learned affinity kernels
    (reference spatial_propagation.py:7-48; NCHW).

    ``kernels [B, C, KH, KW, H, W]``: per-pixel neighbor affinities; the
    center weight is replaced by 1 - sum(neighbors) after L1
    normalization.
    """

    kernel_size: int
    num_steps: int = 10
    epsilon: float = 1e-6

    def __call__(self, inputs, kernels):
        k = self.kernel_size
        pad = (k - 1) // 2
        b, c, kh, kw, h, w = kernels.shape

        center_y = (kh - 1) // 2
        center_x = (kw - 1) // 2
        mask = jnp.ones((kh, kw)).at[center_y, center_x].set(0.0)
        neighbors = kernels * mask[None, None, :, :, None, None]
        norm = jnp.sum(jnp.abs(neighbors), axis=(2, 3), keepdims=True)
        neighbors = neighbors / (norm + self.epsilon)
        centers = 1.0 - jnp.sum(neighbors, axis=(2, 3))       # [B, C, H, W]

        def step(_, outputs):
            patches = jax.lax.conv_general_dilated_patches(
                outputs.reshape(b * c, 1, h, w),
                filter_shape=(kh, kw),
                window_strides=(1, 1),
                padding=[(pad, pad), (pad, pad)],
            ).reshape(b, c, kh, kw, h, w)
            diffused = jnp.sum(patches * neighbors, axis=(2, 3))
            return centers * inputs + diffused

        return jax.lax.fori_loop(0, self.num_steps, step, inputs)
