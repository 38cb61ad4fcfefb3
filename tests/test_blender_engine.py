"""RenderEngine multi-view loop with a stubbed bpy.

The reference session renders EVERY RenderResult view
(reference plugins/blender/session.cpp:223-227); round-2 verdict: our
engine rendered exactly one. This drives PhosphorusRenderEngine.render
through a two-view (stereo) result and asserts both views get distinct
per-eye images through the real Renderer/export stack.
"""
import sys
import types
from types import SimpleNamespace as NS

import numpy as np

bpy_stub = types.ModuleType("bpy")
bpy_stub.types = NS(RenderEngine=object, PropertyGroup=object, Panel=object,
                    Scene=NS())
_prop = lambda **kw: None
bpy_stub.props = NS(IntProperty=_prop, BoolProperty=_prop,
                    FloatProperty=_prop, PointerProperty=_prop,
                    StringProperty=_prop, EnumProperty=_prop)
bpy_stub.utils = NS(register_class=lambda c: None,
                    unregister_class=lambda c: None)
sys.modules.setdefault("bpy", bpy_stub)
sys.path.insert(0, "plugins/blender")

from phosphorus_tpu.engine import PhosphorusRenderEngine  # noqa: E402

from tests.test_blender_exporter import _mat, _node, _obj  # noqa: E402


def _quad_mesh():
    """Camera-facing quad at z=0 (the exporter-test cube's faces are
    edge-on from the +z camera)."""
    vs = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    verts = [NS(co=tuple(v), normal=(0.0, 0.0, 1.0)) for v in vs]
    tris = [
        NS(vertices=(0, 1, 2), material_index=0, use_smooth=False),
        NS(vertices=(0, 2, 3), material_index=0, use_smooth=False),
    ]
    return NS(vertices=verts, loop_triangles=tris,
              calc_loop_triangles=lambda: None,
              calc_normals_split=lambda: None)


class _Rect:
    def __init__(self):
        self.data = None

    def foreach_set(self, flat):
        self.data = np.array(flat, np.float32)


class _Passes:
    def __init__(self, names, views):
        self._store = {
            (n, v): NS(rect=_Rect()) for n in names for v in views
        }
        self._views = views

    def find_by_name(self, name, view):
        return self._store.get((name, view))

    def __getitem__(self, name):  # single-view fallback
        return self._store[(name, self._views[0])]

    def __contains__(self, name):
        return any(k[0] == name for k in self._store)


class _Engine(PhosphorusRenderEngine):
    def __init__(self, views):
        self._views = views
        self.layer = NS(passes=_Passes(["Combined"], views))
        self.result = NS(
            views=[NS(name=v) for v in views], layers=[self.layer]
        )
        self.active_views = []

    def begin_result(self, *a, **k):
        return self.result

    def end_result(self, result):
        pass

    def update_result(self, result):
        pass

    def update_progress(self, p):
        assert 0.0 <= p <= 1.0 + 1e-6

    def test_break(self):
        return False

    def add_pass(self, *a):
        pass

    def active_view_set(self, name):
        self.active_views.append(name)

    def camera_model_matrix(self, camera):
        # full per-eye world matrix, like Blender's API returns
        m = np.array(camera.matrix_world, np.float32, copy=True)
        if self.active_views and self.active_views[-1] == "right":
            m[0, 3] += 0.35  # stereo eye offset (column translation)
        return m


def _depsgraph():
    diffuse = _mat(
        "d", _node("ShaderNodeBsdfDiffuse", Color=(0.7, 0.7, 0.7, 1),
                   Roughness=0.0)
    )
    inst = NS(object=_obj("quad", _quad_mesh(), diffuse),
              matrix_world=np.eye(4, dtype=np.float32))
    bg = _node("ShaderNodeBackground", Color=(0.6, 0.7, 0.9, 1.0), Strength=1.5)
    world = NS(use_nodes=True, node_tree=NS(nodes=[bg]), color=(0, 0, 0))
    eye = np.eye(4, dtype=np.float32)
    eye[3, 2] = 4.0  # camera pulled back (row-vector convention in stubs)
    cam = NS(
        data=NS(lens=35.0, sensor_width=36.0, dof=NS(use_dof=False)),
        matrix_world=eye.T,
    )
    render = NS(resolution_x=16, resolution_y=12, resolution_percentage=100)
    settings = NS(samples_per_pixel=2, paths_per_sample=1, max_depth=2,
                  samples_per_pass=2, use_bvh=False, normal_pass=False)
    scene = NS(world=world, camera=cam, render=render,
               phosphorus_tpu=settings)
    return NS(scene=scene, object_instances=[inst])


def test_two_view_render_produces_distinct_eyes():
    eng = _Engine(["left", "right"])
    eng.render(_depsgraph())
    left = eng.layer.passes.find_by_name("Combined", "left").rect.data
    right = eng.layer.passes.find_by_name("Combined", "right").rect.data
    assert left is not None and right is not None
    assert np.isfinite(left).all() and np.isfinite(right).all()
    assert left.max() > 0 and right.max() > 0
    # per-eye camera offset must shift the image
    assert not np.allclose(left, right)
    assert eng.active_views == ["left", "right"]


def test_single_view_render_still_works():
    eng = _Engine(["left"])
    eng.result.views = []  # no multiview configured
    eng.render(_depsgraph())
    combined = eng.layer.passes["Combined"].rect.data
    assert combined is not None and combined.max() > 0
