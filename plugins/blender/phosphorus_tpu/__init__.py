"""Blender add-on: phosphorus_mk2_tpu render engine.

Counterpart of the reference's Blender plugin (reference
plugins/blender/: a C++ Python module + session + RNA glue,
blender.cpp:157-174, session.cpp:19-168, phosphoros/*.py). Because this
framework is Python-native there is no C++ marshalling layer: the add-on
exports the depsgraph directly into a ``phosphorus_mk2_tpu.Scene`` and
streams progressive passes into Blender's RenderResult (the reference
streams 32px tiles through blender::sink_t, sink.cpp:95-118; we stream
whole progressive passes — the natural unit for a wavefront renderer).

Install: link this directory into Blender's addons path; requires jax
available in Blender's Python (or set PHOSPHORUS_TPU_SUBPROCESS=1 to
render through the CLI in a separate interpreter).
"""

bl_info = {
    "name": "Phosphorus TPU",
    "author": "phosphorus_mk2_tpu",
    "version": (0, 1, 0),
    "blender": (3, 0, 0),
    "category": "Render",
    "description": "TPU-native differentiable path tracer",
}

try:
    import bpy  # noqa: F401

    _IN_BLENDER = True
except ImportError:  # imported outside Blender (tests, docs)
    _IN_BLENDER = False


if _IN_BLENDER:
    import bpy

    from phosphorus_tpu.engine import PhosphorusRenderEngine
    from phosphorus_tpu.properties import PhosphorusRenderSettings
    from phosphorus_tpu.ui import PHOSPHORUS_RENDER_PT_sampling

    _CLASSES = (
        PhosphorusRenderSettings,
        PhosphorusRenderEngine,
        PHOSPHORUS_RENDER_PT_sampling,
    )

    def register():
        for cls in _CLASSES:
            bpy.utils.register_class(cls)
        bpy.types.Scene.phosphorus_tpu = bpy.props.PointerProperty(
            type=PhosphorusRenderSettings
        )

    def unregister():
        del bpy.types.Scene.phosphorus_tpu
        for cls in reversed(_CLASSES):
            bpy.utils.unregister_class(cls)
