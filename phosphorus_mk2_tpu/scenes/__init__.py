"""Built-in procedural test scenes (BASELINE.json configs 1-3)."""

from phosphorus_mk2_tpu.scenes.builders import (
    cornell_box,
    make_param_surface,
    make_quad,
    make_torus,
    make_uv_sphere,
    sphere_in_box,
    multi_bsdf_scene,
    terrain_scene,
    textured_terrain_scene,
)

__all__ = [
    "cornell_box",
    "make_param_surface",
    "make_quad",
    "make_torus",
    "make_uv_sphere",
    "sphere_in_box",
    "multi_bsdf_scene",
    "terrain_scene",
    "textured_terrain_scene",
]
