"""Pose-consistency and epipolar losses.

jax re-design of `/root/reference/vsrd/losses/geometric_losses.py`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.geometry import homogeneous
from .utils import reduced


@reduced
def rotation_consistency_loss(
    source_extrinsic_matrices, target_extrinsic_matrices, epsilon=1e-6
):
    cycle = target_extrinsic_matrices @ source_extrinsic_matrices
    eye = jnp.eye(3, dtype=cycle.dtype)

    def consistency(rot):
        return jnp.mean(jnp.square(rot - eye), axis=(-2, -1))

    return consistency(cycle[..., :3, :3]) / (
        consistency(source_extrinsic_matrices[..., :3, :3])
        + consistency(target_extrinsic_matrices[..., :3, :3])
        + epsilon
    )


@reduced
def translation_consistency_loss(
    source_extrinsic_matrices, target_extrinsic_matrices, epsilon=1e-6
):
    cycle = target_extrinsic_matrices @ source_extrinsic_matrices

    def consistency(t):
        return jnp.mean(jnp.square(t), axis=-1)

    return consistency(cycle[..., :3, 3]) / (
        consistency(source_extrinsic_matrices[..., :3, 3])
        + consistency(target_extrinsic_matrices[..., :3, 3])
        + epsilon
    )


@reduced
def sampson_epipolar_distance(keypoints_1, keypoints_2, fundamental_matrices):
    kp1 = homogeneous(keypoints_1)
    kp2 = homogeneous(keypoints_2)

    lines_2 = kp1 @ jnp.swapaxes(fundamental_matrices, -2, -1)
    lines_1 = kp2 @ fundamental_matrices

    algebraic = jnp.sum(kp2 * lines_2, axis=-1) ** 2.0
    grad_2 = jnp.sum(lines_2[..., :2] ** 2.0, axis=-1)
    grad_1 = jnp.sum(lines_1[..., :2] ** 2.0, axis=-1)
    return algebraic / (grad_2 + grad_1)
