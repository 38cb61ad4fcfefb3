"""Blender exporter tests with a stubbed bpy object model.

No bpy in this environment, but plugins/blender/phosphorus_tpu/exporter
is duck-typed over the depsgraph API (the reference's importer walks the
same structures natively, reference plugins/blender/import.hpp:582) — a
SimpleNamespace object model exercises the whole export path: mesh
baking, material node mapping (incl. the Glass expansion and the
Principled approximation), world light and camera DoF.
"""
import sys
from types import SimpleNamespace as NS

import numpy as np
import pytest

sys.path.insert(0, "plugins/blender")

from phosphorus_tpu.exporter import convert_material, export_scene  # noqa: E402

from phosphorus_mk2_tpu.core.material import (  # noqa: E402
    DIFFUSE,
    MICROFACET,
    MICROFACET_REFRACT,
    REFLECTION,
    REFRACTION,
)


class Sockets:
    def __init__(self, **kv):
        self._kv = {k.replace("_", " "): NS(default_value=v, links=[]) for k, v in kv.items()}

    def get(self, name):
        return self._kv.get(name)


def _node(idname, **inputs):
    return NS(bl_idname=idname, inputs=Sockets(**inputs), is_active_output=False)


def _mat(name, node):
    out_sock = NS(links=[NS(from_node=node)], default_value=None)
    out = NS(
        bl_idname="ShaderNodeOutputMaterial",
        is_active_output=True,
        inputs=NS(get=lambda n, s=out_sock: s if n == "Surface" else None),
    )
    tree = NS(nodes=[node, out])
    return NS(name=name, use_nodes=True, node_tree=tree, diffuse_color=(1, 1, 1, 1))


def _cube_mesh():
    vs = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], np.float32
    )
    verts = [NS(co=tuple(v), normal=tuple(v / np.linalg.norm(v))) for v in vs]
    tris = [
        NS(vertices=(0, 1, 2), material_index=0, use_smooth=False),
        NS(vertices=(1, 3, 2), material_index=0, use_smooth=False),
        NS(vertices=(4, 6, 5), material_index=0, use_smooth=False),
        NS(vertices=(5, 6, 7), material_index=0, use_smooth=False),
    ]
    return NS(
        vertices=verts,
        loop_triangles=tris,
        calc_loop_triangles=lambda: None,
        calc_normals_split=lambda: None,
    )


def _obj(name, mesh, mat):
    return NS(
        type="MESH",
        name=name,
        to_mesh=lambda: mesh,
        to_mesh_clear=lambda: None,
        material_slots=[NS(material=mat)],
    )


def _bl_scene():
    eye = np.eye(4, dtype=np.float32)
    bg = _node("ShaderNodeBackground", Color=(0.2, 0.3, 0.4, 1.0), Strength=2.0)
    world = NS(use_nodes=True, node_tree=NS(nodes=[bg]), color=(0, 0, 0))
    cam_data = NS(
        lens=50.0,
        sensor_width=36.0,
        dof=NS(use_dof=True, aperture_fstop=2.8, focus_object=None, focus_distance=3.0),
    )
    cam_obj = NS(data=cam_data, matrix_world=eye)
    render = NS(resolution_x=64, resolution_y=48, resolution_percentage=100)
    return NS(world=world, camera=cam_obj, render=render)


def test_export_end_to_end():
    emit = _mat("lamp", _node("ShaderNodeEmission", Color=(1, 1, 1, 1), Strength=5.0))
    mesh = _cube_mesh()
    inst = NS(object=_obj("cube", mesh, emit), matrix_world=np.eye(4, dtype=np.float32))
    depsgraph = NS(object_instances=[inst])

    scene = export_scene(depsgraph, _bl_scene())
    assert len(scene.meshes) == 1
    assert scene.meshes[0].vertices.shape == (8, 3)
    assert scene.camera.width == 64 and scene.camera.height == 48
    # DoF: aperture radius = lens / (2 * fstop * 1000)
    np.testing.assert_allclose(
        scene.camera.aperture_radius, 50.0 / (2 * 2.8 * 1000.0), rtol=1e-6
    )
    assert scene.camera.focal_distance == 3.0
    # world became the environment material
    assert scene.environment is not None

    data = scene.build()  # emissive cube registers an area light + env
    assert data.num_lights == 2


def test_node_mapping():
    m = convert_material(
        _mat("d", _node("ShaderNodeBsdfDiffuse", Color=(0.5, 0.25, 0.1, 1), Roughness=0.0))
    )
    assert m.lobes[0].type == DIFFUSE
    np.testing.assert_allclose(m.lobes[0].weight, (0.5, 0.25, 0.1))

    m = convert_material(
        _mat("g", _node("ShaderNodeBsdfGlossy", Color=(1, 1, 1, 1), Roughness=0.4))
    )
    assert m.lobes[0].type == MICROFACET

    m = convert_material(
        _mat("r", _node("ShaderNodeBsdfRefraction", Color=(1, 1, 1, 1), IOR=1.45, Roughness=0.0))
    )
    assert m.lobes[0].type == REFRACTION

    # Glass expands to reflection + refraction with fresnel mix params
    # (the reference shader.hpp:306-361 expansion)
    m = convert_material(
        _mat("gl", _node("ShaderNodeBsdfGlass", Color=(1, 1, 1, 1), IOR=1.5, Roughness=0.0))
    )
    types = sorted(lobe.type for lobe in m.lobes)
    assert types == sorted([REFLECTION, REFRACTION]) or types == sorted(
        [MICROFACET, MICROFACET_REFRACT]
    )
    assert len(m.lobes) == 2

    # Principled: emission branch wins when emissive
    m = convert_material(
        _mat(
            "p",
            _node(
                "ShaderNodeBsdfPrincipled",
                **{
                    "Base Color": (0.8, 0.8, 0.8, 1),
                    "Roughness": 0.5,
                    "Metallic": 0.0,
                    "Emission Color": (1, 0, 0, 1),
                    "Emission Strength": 3.0,
                },
            ),
        )
    )
    assert m.is_emitter

    # unknown node -> grey diffuse fallback
    m = convert_material(_mat("u", _node("ShaderNodeWeirdFuture")))
    assert m.lobes[0].type == DIFFUSE


def test_non_node_material():
    bl = NS(name="plain", use_nodes=False, node_tree=None, diffuse_color=(0.3, 0.6, 0.9, 1.0))
    m = convert_material(bl)
    assert m.lobes[0].type == DIFFUSE
    np.testing.assert_allclose(m.lobes[0].weight, (0.3, 0.6, 0.9))
