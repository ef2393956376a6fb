"""Multi-view photometric consistency loss (sphere-traced surfels +
plane-induced homography patch warping + cross-view correlation).

TPU-native re-design of the reference photometric branch
(`/root/reference/scripts/main.py:689-853`): surfels are sphere-traced
on the hard (argmin) SDF union, each converged surfel induces a plane
homography from the target view into every source view, 11x11 grayscale
patches are bilinearly warped, and the loss is (1 - mean of each view's
top-4 cross-view patch correlations) / 2. The reference's
data-dependent `if torch.any(convergence)` / boolean indexing become
convergence-masked means (jit-safe).

Off by default (photometric weight is 0.0 in every shipped reference
config, configs/.../config.json:124) — compiled only when enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import sampling
from ..ops.grid_sample import grid_sample
from ..rendering import renderer, scene
from .frame import FrameData, ray_directions_at


def _linear_map(values, in_min, in_max, out_min, out_max):
    return (values - in_min) / (in_max - in_min) * (out_max - out_min) + out_min


def masked_corrcoef(patches, epsilon=1e-12):
    """Row-wise correlation matrix of ``[V, D]`` -> ``[V, V]``."""
    centered = patches - jnp.mean(patches, axis=-1, keepdims=True)
    cov = centered @ centered.T / (patches.shape[-1] - 1)
    var = jnp.diagonal(cov)
    denom = jnp.sqrt(var[:, None] * var[None, :] + epsilon)
    return cov / denom


def photometric_loss(
    frame: FrameData,
    hard_field,
    key: jax.Array,
    num_rays: int = 100,
    num_iterations: int = 1000,
    convergence_criteria: float = 0.01,
    bounding_radius: float = 100.0,
    patch_size: tuple[int, int] = (11, 11),
    top_k: int = 4,
):
    """Scalar photometric loss. Requires ``frame.gray_images``."""
    assert frame.gray_images is not None, "photometric loss needs images"
    height, width = frame.image_size
    pixels_per_view = height * width
    tgt = frame.target_index

    # ---- sample target-view rays from hard (binarized) masks ----
    target_soft = jax.lax.dynamic_slice_in_dim(
        frame.sampling_weights, tgt * pixels_per_view, pixels_per_view
    )
    hard_weights = (target_soft > 0.5).astype(jnp.float32)
    local_idx = sampling.multinomial_no_replacement(key, hard_weights, num_rays)
    ray_idx = tgt * pixels_per_view + local_idx
    origins, directions = ray_directions_at(frame, ray_idx)

    # ---- sphere trace the hard union ----
    def sdf_fn(positions):
        return scene.batched_sdf(hard_field, positions)

    positions, converged = renderer.sphere_tracing(
        sdf_fn,
        origins,
        directions,
        num_iterations=num_iterations,
        convergence_criteria=convergence_criteria,
        bounding_radius=bounding_radius,
        initialization=False,
        differentiable=True,
    )
    normals = renderer.surface_normal(sdf_fn, jax.lax.stop_gradient(positions))
    converged = converged[..., 0]                              # [R]

    # ---- 11x11 patch pixel grid around each target pixel ----
    ph, pw = patch_size
    gy, gx = jnp.meshgrid(
        jnp.arange(ph, dtype=jnp.float32) - ph // 2,
        jnp.arange(pw, dtype=jnp.float32) - pw // 2,
        indexing="ij",
    )
    px = (local_idx % width).astype(jnp.float32)
    py = (local_idx // width).astype(jnp.float32)
    coords = jnp.stack(
        [px[:, None, None] + gx[None], py[:, None, None] + gy[None]],
        axis=-1,
    )                                                           # [R, ph, pw, 2]
    coords_h = jnp.concatenate(
        [coords, jnp.ones((*coords.shape[:-1], 1))], axis=-1
    )                                                           # [R, ph, pw, 3]

    # ---- plane-induced homographies into every view ----
    k_t = frame.intrinsics[tgt]
    e_t = frame.extrinsics[tgt]
    r_t = e_t[:3, :3]
    t_t = e_t[:3, 3:]
    inv_k_t = jnp.linalg.inv(k_t)

    n_vec = normals                                             # [R, 3]
    p_vec = positions                                           # [R, 3]
    n_dot_p = jnp.sum(n_vec * p_vec, axis=-1)                   # [R]

    def per_view(k_s, e_s, gray):
        r_s = e_s[:3, :3]
        t_s = e_s[:3, 3:]
        # H = Ks (Rs Rt^T - Rs(Rs^T ts - Rt^T tt) n^T / -(n^T p)) Kt^-1
        # (reference main.py:797-809)
        base = r_s @ r_t.T
        offset = r_s @ (r_s.T @ t_s - r_t.T @ t_t)              # [3, 1]
        outer = offset[None] * n_vec[:, None, :]                # [R, 3, 3]
        mats = base[None] - outer / (-n_dot_p)[:, None, None]
        homographies = jnp.einsum(
            "ij,rjk,kl->ril", k_s, mats, inv_k_t
        )                                                       # [R, 3, 3]

        source = jnp.einsum("rij,rhwj->rhwi", homographies, coords_h)
        source_xy = source[..., :2] / (source[..., 2:] + 1e-6)
        normalized = jnp.stack(
            [
                _linear_map(source_xy[..., 0], 0.0, width - 1.0, -1.0, 1.0),
                _linear_map(source_xy[..., 1], 0.0, height - 1.0, -1.0, 1.0),
            ],
            axis=-1,
        )
        patches = grid_sample(gray[None], normalized, align_corners=False)
        return patches[0]                                       # [R, ph, pw]

    patches = jax.vmap(per_view)(
        frame.intrinsics, frame.extrinsics, frame.gray_images
    )                                                           # [V, R, ph, pw]
    patches = patches.reshape(patches.shape[0], patches.shape[1], -1)

    # ---- cross-view correlation, top-k per view ----
    k = min(top_k, patches.shape[0])

    def per_surfel(view_patches):                               # [V, D]
        corr = masked_corrcoef(view_patches)
        top, _ = jax.lax.top_k(corr, k)                         # [V, k]
        return top

    tops = jax.vmap(per_surfel, in_axes=1)(patches)             # [R, V, k]
    finite = jnp.isfinite(tops)
    mask = converged[:, None, None] & finite
    safe = jnp.where(mask, tops, 0.0)
    mean = jnp.sum(safe) / jnp.clip(jnp.sum(mask), min=1)
    loss = (1.0 - mean) / 2.0
    any_converged = jnp.any(converged)
    return jnp.where(any_converged, loss, 0.0), converged
