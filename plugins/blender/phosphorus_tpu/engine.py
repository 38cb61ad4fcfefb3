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

        if getattr(settings, "normal_pass", False):
            self.add_pass("Normal", 3, "XYZ")
        result = self.begin_result(0, 0, w, h)
        layer = result.layers[0]

        # multi-view: render EVERY RenderResult view, like the reference
        # session loop (reference plugins/blender/session.cpp:223-227).
        # Per-view eye matrices come from the RenderEngine multiview API.
        views = [v.name for v in getattr(result, "views", None) or []] or [None]
        n_views = len(views)
        for vi, view_name in enumerate(views):
            view_renderer = renderer
            if view_name and hasattr(self, "camera_model_matrix"):
                if hasattr(self, "active_view_set"):
                    self.active_view_set(view_name)
                mw = np.array(
                    self.camera_model_matrix(bl_scene.camera), np.float32
                )
                import copy

                scene_v = copy.copy(scene)
                scene_v.camera = copy.copy(scene.camera)
                to_world = np.eye(4, dtype=np.float32)
                to_world[0, :3] = mw[:3, 0]
                to_world[1, :3] = mw[:3, 1]
                to_world[2, :3] = mw[:3, 2]
                to_world[3, :3] = mw[:3, 3]
                scene_v.camera.to_world = to_world
                view_renderer = Renderer(scene_v, options)

            # test_break polls inside the render loop too (between
            # wavefront chunks), not just between passes — a 4K pass can
            # be minutes with remote TPU compiles
            for film, done in view_renderer.passes(cancel=self.test_break):
                if self.test_break():
                    break
                combined = np.ones((h, w, 4), np.float32)
                combined[..., :3] = film["color"]
                combined[..., 3] = film["alpha"]
                # y-flip into Blender's bottom-up convention
                # (reference sink.cpp:95-118 does the same flip)
                _set_rect(
                    _find_pass(layer, "Combined", view_name),
                    combined[::-1].reshape(-1, 4),
                )
                npass = _find_pass(layer, "Normal", view_name)
                if npass is not None:
                    _set_rect(npass, film["normal"][::-1].reshape(-1, 3))
                self.update_result(result)
                self.update_progress(
                    (vi + done / options.samples_per_pixel) / n_views
                )
            if self.test_break():
                break

        self.end_result(result)


def _find_pass(layer, name: str, view_name):
    """RenderPass for (name, view): multiview results key passes by
    (name, view); single-view falls back to the plain mapping. Returns
    None when the pass wasn't registered (e.g. Normal off)."""
    if view_name and hasattr(layer.passes, "find_by_name"):
        return layer.passes.find_by_name(name, view_name)
    try:
        return layer.passes[name]
    except (KeyError, IndexError, TypeError):
        return None


def _set_rect(render_pass, arr: np.ndarray) -> None:
    """Write pixels into a RenderPass without O(pixels) Python list
    churn: foreach_set takes the flat float buffer directly (bpy 2.83+);
    the tolist() assignment remains as the fallback."""
    if render_pass is None:
        return
    flat = np.ascontiguousarray(arr, np.float32)
    try:
        render_pass.rect.foreach_set(flat.reshape(-1))
    except (AttributeError, TypeError):
        render_pass.rect = flat.tolist()
