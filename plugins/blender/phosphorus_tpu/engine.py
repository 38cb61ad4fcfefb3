"""RenderEngine: progressive wavefront rendering into Blender.

Counterpart of the reference's session/render path (reference
plugins/blender/session.cpp:211: determine passes Combined/Normal, build
tiles + sink + sampler + frame state, start/join devices) — here the
Renderer session streams whole progressive passes into the RenderResult
(update_result per pass), supporting Combined + Normal passes like the
reference (session.cpp:135-155).
"""
from __future__ import annotations

import numpy as np

import bpy


class PhosphorusRenderEngine(bpy.types.RenderEngine):
    bl_idname = "PHOSPHORUS_TPU"
    bl_label = "Phosphorus TPU"
    bl_use_preview = False

    def render(self, depsgraph):
        from phosphorus_tpu.exporter import export_scene

        from phosphorus_mk2_tpu.core.options import Options
        from phosphorus_mk2_tpu.renderer import Renderer

        bl_scene = depsgraph.scene
        settings = bl_scene.phosphorus_tpu

        scene = export_scene(depsgraph, bl_scene)
        w, h = scene.camera.width, scene.camera.height

        options = Options(
            samples_per_pixel=settings.samples_per_pixel,
            paths_per_sample=settings.paths_per_sample,
            path_depth=settings.max_depth,
            samples_per_pass=settings.samples_per_pass,
            use_bvh=settings.use_bvh,
        )
        renderer = Renderer(scene, options)

        self.add_pass("Normal", 3, "XYZ")
        result = self.begin_result(0, 0, w, h)
        layer = result.layers[0]

        for film, done in renderer.passes():
            if self.test_break():
                break
            combined = np.ones((h, w, 4), np.float32)
            combined[..., :3] = film["color"]
            combined[..., 3] = film["alpha"]
            # y-flip into Blender's bottom-up convention
            # (reference sink.cpp:95-118 does the same flip)
            layer.passes["Combined"].rect = (
                combined[::-1].reshape(-1, 4).tolist()
            )
            if "Normal" in layer.passes:
                layer.passes["Normal"].rect = (
                    film["normal"][::-1].reshape(-1, 3).tolist()
                )
            self.update_result(result)
            self.update_progress(done / options.samples_per_pixel)

        self.end_result(result)
