"""Scene field assembly: padded multi-instance box + residual SDF unions.

This is the TPU-native replacement for the per-instance Python closure
stacks built in the reference's hot loop (`/root/reference/scripts/
main.py:433-618`): instead of `N` nested closures combined by a Python
`soft_union`, one pure *batched* function evaluates all instances for a
whole point cloud at once — the instance axis is the batch axis of the
field MLP's GEMMs, the union is a masked softmin reduction, and the
instance one-hot features of the reference's `instance_field` collapse
to the union weights themselves.

Field contract used by the renderer: ``field(positions [..., 3]) ->
(sdf [...], features [..., F])`` — fully batched over leading dims.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import encoders, hyper_field
from . import sdf as sdf_ops


class SceneParams(NamedTuple):
    """Decoded, padded per-instance scene parameters.

    ``field_weights`` is None during warmup (box-only SDF, reference
    scripts/main.py:580-618) and ``[N, W]`` afterwards.
    """

    locations: jax.Array        # [N, 3]
    rotations: jax.Array        # [N, 3, 3]
    half_dimensions: jax.Array  # [N, 3]
    valid: jax.Array            # [N] bool
    field_weights: jax.Array | None = None
    packed_weights: tuple | None = None  # block-diagonal layer matrices
    field_dtype: jnp.dtype | None = None  # compute dtype for the RDF MLP


def instance_distances(
    scene: SceneParams,
    positions: jax.Array,
    position_scale: float = 100.0,
    num_frequencies: int = 8,
    out_channels_list=(16, 16, 16, 16),
) -> jax.Array:
    """Per-instance signed distances: ``positions [..., 3] -> [..., N]``.

    Composition per instance (reference scripts/main.py:530-565):
    translate -> rotate -> box SDF (+ sigmoid-squashed residual MLP on the
    x-mirrored, rescaled, sinusoidally-encoded local position).
    """
    rel = positions[..., None, :] - scene.locations            # [..., N, 3]
    local = jnp.einsum("...ni,nij->...nj", rel, scene.rotations)
    distances = sdf_ops.box_sdf(local, scene.half_dimensions)  # [..., N]

    if scene.field_weights is not None or scene.packed_weights is not None:
        sym = jnp.concatenate(
            [jnp.abs(local[..., :1]), local[..., 1:]], axis=-1
        )
        enc = encoders.sinusoidal_encode(sym / position_scale, num_frequencies)
        if scene.field_dtype is not None:
            # Reduced-precision RDF path: the residual is sigmoid-squashed
            # into (0, 1), so bf16 activation error (~1e-3) is far below
            # the SDF scales that drive the optimization; traffic on the
            # [P, N, 48] tensors halves.
            enc = enc.astype(scene.field_dtype)
        if scene.packed_weights is not None:
            packed = scene.packed_weights
            if scene.field_dtype is not None:
                packed = tuple(m.astype(scene.field_dtype) for m in packed)
            raw = hyper_field.field_apply_packed(
                packed,
                enc,
                num_instances=distances.shape[-1],
                out_channels_list=out_channels_list,
            )[..., 0].astype(distances.dtype)
        else:
            raw = hyper_field.field_apply_instances(
                scene.field_weights,
                enc,
                in_channels=enc.shape[-1],
                out_channels_list=out_channels_list,
            )[..., 0]
        distances = distances + sdf_ops.residual_squash(raw)

    return distances


def soft_scene_field(
    scene: SceneParams,
    temperature,
    position_scale: float = 100.0,
    num_frequencies: int = 8,
    out_channels_list=(16, 16, 16, 16),
):
    """Batched field for the volumetric renderer.

    Returns ``field(positions [..., 3]) -> (sdf [...], weights [..., N])``.
    The softmin weights double as the instance one-hot features blended
    by the union (reference scripts/main.py:460-492).
    """

    def field(positions):
        distances = instance_distances(
            scene, positions, position_scale, num_frequencies, out_channels_list
        )
        distances = jnp.moveaxis(distances, -1, 0)  # [N, ...]
        union, weights = sdf_ops.masked_softmin_union(
            distances, scene.valid, temperature
        )
        return union, jnp.moveaxis(weights, 0, -1)

    return field


def hard_scene_field(
    scene: SceneParams,
    position_scale: float = 100.0,
    num_frequencies: int = 8,
    out_channels_list=(16, 16, 16, 16),
):
    """Argmin-union field (surface rendering; reference main.py:691-736)."""

    def field(positions):
        distances = instance_distances(
            scene, positions, position_scale, num_frequencies, out_channels_list
        )
        distances = jnp.moveaxis(distances, -1, 0)
        union, weights = sdf_ops.masked_hard_union(distances, scene.valid)
        return union, jnp.moveaxis(weights, 0, -1)

    return field


def batched_sdf(field, positions: jax.Array) -> jax.Array:
    """SDF-only adapter for sphere tracing: ``[..., 3] -> [..., 1]``."""
    return field(positions)[0][..., None]
