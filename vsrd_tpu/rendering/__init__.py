from . import rays, renderer, samplers, scene, sdf
from .rays import ray_casting
from .renderer import (
    hierarchical_render,
    render_rays,
    sphere_tracing,
    surface_normal,
    phong_shading,
    shadow_rendering,
)
from .scene import SceneParams, soft_scene_field, hard_scene_field
