"""Depsgraph -> phosphorus_mk2_tpu.Scene exporter.

Counterpart of the reference's Blender importer (reference
plugins/blender/import.hpp:582: world-space-baked meshes, per-material
face sets, node-tree -> shader compilation, world -> infinite light,
camera incl. DoF) and its shader-node compiler
(plugins/blender/blender/shader.hpp:85: per-node-type mapping with the
Glass node expanded to reflection+refraction).

Node mapping (Blender node idname -> Material constructor):
  BSDF_DIFFUSE  -> Material.diffuse(color, roughness)
  BSDF_GLOSSY   -> Material.glossy(color, roughness)
  BSDF_REFRACTION -> Material.refraction(color, ior, roughness)
  BSDF_GLASS    -> Material.glass(color, ior, roughness)
  BSDF_SHEEN / VELVET -> Material.sheen(color, roughness)
  BSDF_TRANSPARENT -> Material.transparent(color)
  EMISSION      -> Material.emitter(color, strength)
  BSDF_PRINCIPLED -> approximated: diffuse + glossy mix by specular
"""
from __future__ import annotations

import numpy as np


def export_scene(depsgraph, bl_scene):
    """Build a phosphorus Scene from an evaluated depsgraph."""
    from phosphorus_mk2_tpu.core.camera import Camera
    from phosphorus_mk2_tpu.core.material import Material
    from phosphorus_mk2_tpu.core.mesh import Mesh
    from phosphorus_mk2_tpu.core.scene import Scene

    scene = Scene()
    default_mat = scene.add_material(Material.diffuse((0.8, 0.8, 0.8), name="__default"))
    mat_ids: dict[str, int] = {}

    def material_id(bl_mat):
        if bl_mat is None:
            return default_mat
        if bl_mat.name in mat_ids:
            return mat_ids[bl_mat.name]
        mat = convert_material(bl_mat)
        mid = scene.add_material(mat)
        mat_ids[bl_mat.name] = mid
        return mid

    for inst in depsgraph.object_instances:
        obj = inst.object
        if obj.type != "MESH":
            continue
        mesh = obj.to_mesh()
        mesh.calc_loop_triangles()
        try:
            mesh.calc_normals_split()
        except AttributeError:
            pass  # 4.1+: split normals always available
        mw = np.array(inst.matrix_world, np.float32)

        verts = np.array([v.co[:] for v in mesh.vertices], np.float32)
        verts = verts @ mw[:3, :3].T + mw[:3, 3]
        vnorm = np.array([v.normal[:] for v in mesh.vertices], np.float32)
        nrm_m = np.linalg.inv(mw[:3, :3]).T
        vnorm = vnorm @ nrm_m.T
        tris = np.array(
            [lt.vertices[:] for lt in mesh.loop_triangles], np.int32
        )
        tri_mat = np.array(
            [
                material_id(
                    obj.material_slots[lt.material_index].material
                    if lt.material_index < len(obj.material_slots)
                    else None
                )
                for lt in mesh.loop_triangles
            ],
            np.int32,
        )
        smooth = np.array(
            [lt.use_smooth for lt in mesh.loop_triangles], bool
        )
        scene.add_mesh(
            Mesh(
                vertices=verts,
                faces=tris,
                normals=vnorm,
                material=tri_mat,
                smooth=smooth,
                name=obj.name,
            )
        )
        obj.to_mesh_clear()

    # world -> infinite light (reference import.hpp:508-522)
    world = bl_scene.world
    if world is not None:
        color, strength = _world_emission(world)
        if strength > 0.0:
            scene.set_environment(
                Material.background(color, power=strength, name="__world")
            )

    # camera (reference import.hpp:528-580, incl. DoF)
    cam_obj = bl_scene.camera
    if cam_obj is not None:
        cam = cam_obj.data
        mw = np.array(cam_obj.matrix_world, np.float32)
        to_world = np.eye(4, dtype=np.float32)
        # Blender camera: -Z forward, Y up (matches our convention)
        to_world[0, :3] = mw[:3, 0]
        to_world[1, :3] = mw[:3, 1]
        to_world[2, :3] = mw[:3, 2]
        to_world[3, :3] = mw[:3, 3]
        scale = bl_scene.render.resolution_percentage / 100.0
        camera = Camera(
            to_world=to_world,
            focal_length=cam.lens,
            sensor_width=cam.sensor_width,
            width=int(bl_scene.render.resolution_x * scale),
            height=int(bl_scene.render.resolution_y * scale),
        )
        if cam.dof and cam.dof.use_dof:
            fstop = cam.dof.aperture_fstop
            camera.aperture_radius = cam.lens / (2.0 * fstop * 1000.0)
            if cam.dof.focus_object is not None:
                fo = np.array(cam.dof.focus_object.matrix_world, np.float32)[:3, 3]
                camera.focal_distance = float(np.linalg.norm(fo - to_world[3, :3]))
            else:
                camera.focal_distance = cam.dof.focus_distance
        scene.camera = camera

    return scene


def convert_material(bl_mat):
    """Map a Blender material node tree to a lobe Material."""
    from phosphorus_mk2_tpu.core.material import Material

    name = bl_mat.name
    if not bl_mat.use_nodes or bl_mat.node_tree is None:
        c = tuple(bl_mat.diffuse_color[:3])
        return Material.diffuse(c, name=name)

    node = _surface_node(bl_mat.node_tree)
    if node is None:
        return Material.diffuse((0.8, 0.8, 0.8), name=name)
    return _convert_node(node, name)


def _surface_node(tree):
    for n in tree.nodes:
        if n.bl_idname == "ShaderNodeOutputMaterial" and n.is_active_output:
            inp = n.inputs.get("Surface")
            if inp and inp.links:
                return inp.links[0].from_node
    return None


def _in(node, name, default):
    s = node.inputs.get(name)
    if s is None:
        return default
    v = s.default_value
    try:
        return tuple(v[:3])
    except TypeError:
        return float(v)


def _convert_node(node, name):
    from phosphorus_mk2_tpu.core.material import Material

    t = node.bl_idname
    if t == "ShaderNodeBsdfDiffuse":
        return Material.diffuse(
            _in(node, "Color", (0.8, 0.8, 0.8)),
            roughness=_in(node, "Roughness", 0.0),
            name=name,
        )
    if t in ("ShaderNodeBsdfGlossy", "ShaderNodeBsdfAnisotropic"):
        return Material.glossy(
            _in(node, "Color", (1.0, 1.0, 1.0)),
            roughness=_in(node, "Roughness", 0.2),
            name=name,
        )
    if t == "ShaderNodeBsdfRefraction":
        return Material.refraction(
            _in(node, "Color", (1.0, 1.0, 1.0)),
            ior=_in(node, "IOR", 1.45),
            roughness=_in(node, "Roughness", 0.0),
            name=name,
        )
    if t == "ShaderNodeBsdfGlass":
        # the reference expands Glass to glossy+refraction+fresnel mix
        # (plugins/blender/blender/shader.hpp:306-361)
        return Material.glass(
            _in(node, "Color", (1.0, 1.0, 1.0)),
            ior=_in(node, "IOR", 1.45),
            roughness=_in(node, "Roughness", 0.0),
            name=name,
        )
    if t in ("ShaderNodeBsdfVelvet", "ShaderNodeBsdfSheen"):
        return Material.sheen(
            _in(node, "Color", (1.0, 1.0, 1.0)),
            roughness=_in(node, "Sigma", 0.5) or _in(node, "Roughness", 0.5),
            name=name,
        )
    if t == "ShaderNodeBsdfTransparent":
        return Material.transparent(_in(node, "Color", (1.0, 1.0, 1.0)), name=name)
    if t == "ShaderNodeEmission":
        return Material.emitter(
            _in(node, "Color", (1.0, 1.0, 1.0)),
            power=_in(node, "Strength", 1.0),
            name=name,
        )
    if t == "ShaderNodeBsdfPrincipled":
        from phosphorus_mk2_tpu.core.material import Material as M

        base = _in(node, "Base Color", (0.8, 0.8, 0.8))
        rough = _in(node, "Roughness", 0.5)
        metallic = _in(node, "Metallic", 0.0)
        emis = _in(node, "Emission Color", (0.0, 0.0, 0.0))
        emis_s = _in(node, "Emission Strength", 0.0)
        if emis_s and any(e > 0 for e in emis):
            return M.emitter(emis, power=emis_s, name=name)
        if metallic > 0.5:
            return M.glossy(base, roughness=rough, name=name)
        diffuse = M.diffuse(base, name=name)
        gloss = M.glossy((1.0, 1.0, 1.0), roughness=max(rough, 0.05))
        diffuse.lobes[0].weight = tuple(c * (1 - 0.2) for c in base)
        gl = gloss.lobes[0]
        gl.weight = (0.2, 0.2, 0.2)
        diffuse.lobes.append(gl)
        return diffuse
    # unknown -> grey diffuse
    return Material.diffuse((0.8, 0.8, 0.8), name=name)


def _world_emission(world):
    if world.use_nodes and world.node_tree:
        for n in world.node_tree.nodes:
            if n.bl_idname == "ShaderNodeBackground":
                return _in(n, "Color", (0.05, 0.05, 0.05)), _in(n, "Strength", 1.0)
    c = tuple(world.color[:3])
    return c, 1.0
