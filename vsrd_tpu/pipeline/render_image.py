"""Full-image rendering for logging/visual checks.

Re-design of the reference's per-500-step TensorBoard image dumps
(`/root/reference/scripts/main.py:1011-1041`): render per-pixel instance
probabilities (volumetric) and sphere-traced convergence masks for one
view, chunked over pixel rows with `lax.map` to bound memory. Off the
hot path — called at checkpoint boundaries from the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models import box_parameters, hyper_field
from ..rendering import renderer, scene
from .frame import FrameData, ray_directions_at
from .optimize import OptimizationConfig, cosine_annealing


def _scene_field(params, frame, step, cfg):
    # step is a static Python int here (host-side logging cadence)
    decoded = box_parameters.decode_boxes(params["boxes"])
    progress = jnp.asarray(step, jnp.float32) / cfg.num_steps
    temperature = cosine_annealing(
        progress, cfg.max_sdf_union_temperature, cfg.min_sdf_union_temperature
    )
    std = cosine_annealing(
        progress, cfg.max_sdf_std_deviation, cfg.min_sdf_std_deviation
    )
    packed = None
    if step >= cfg.warmup_steps:
        weights = hyper_field.hypernetwork_apply(
            params["hyper"], decoded["embeddings"]
        )
        packed = tuple(
            hyper_field.pack_block_diagonal(
                weights,
                in_channels=3 * cfg.num_frequencies * 2,
                out_channels_list=cfg.field_channels,
            )
        )
    scene_params = scene.SceneParams(
        locations=decoded["locations"],
        rotations=decoded["orientations"],
        half_dimensions=decoded["dimensions"],
        valid=frame.valid,
        packed_weights=packed,
    )
    soft = scene.soft_scene_field(
        scene_params, temperature, cfg.position_scale,
        cfg.num_frequencies, cfg.field_channels,
    )
    return soft, std, progress


@partial(jax.jit, static_argnames=("cfg", "view", "row_chunk", "step"))
def render_instance_probabilities(
    params, frame: FrameData, step, cfg: OptimizationConfig,
    view: int = 0, row_chunk: int = 8,
):
    """Volumetric per-pixel instance probability map ``[H, W, N]``."""
    height, width = frame.image_size
    field, std, progress = _scene_field(params, frame, step, cfg)
    base = view * height * width

    def render_rows(row0):
        idx = base + row0 * width + jnp.arange(row_chunk * width)
        origins, directions = ray_directions_at(frame, idx)
        out = renderer.hierarchical_render(
            field, origins, directions, cfg.distance_range,
            cfg.num_samples, std, progress, deterministic=True,
        )
        return out.features

    rows = jax.lax.map(render_rows, jnp.arange(0, height, row_chunk))
    return rows.reshape(height, width, -1)


@partial(jax.jit, static_argnames=("cfg", "view", "step"))
def render_surface_mask(
    params, frame: FrameData, step, cfg: OptimizationConfig, view: int = 0,
):
    """Sphere-traced convergence mask ``[H, W]`` for one view."""
    height, width = frame.image_size
    field, _, _ = _scene_field(params, frame, step, cfg)
    base = view * height * width
    idx = base + jnp.arange(height * width)
    origins, directions = ray_directions_at(frame, idx)
    _, converged = renderer.sphere_tracing(
        lambda p: scene.batched_sdf(field, p),
        origins,
        directions,
        num_iterations=cfg.surface_num_iterations,
        convergence_criteria=cfg.surface_convergence_criteria,
        bounding_radius=cfg.surface_bounding_radius,
        initialization=False,
    )
    return converged[..., 0].reshape(height, width)
