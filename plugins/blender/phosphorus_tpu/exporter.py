"""Depsgraph -> phosphorus_mk2_tpu.Scene exporter.

Counterpart of the reference's Blender importer (reference
plugins/blender/import.hpp:582: world-space-baked meshes, per-material
face sets, node-tree -> shader compilation, world -> infinite light,
camera incl. DoF) and its shader-node compiler
(plugins/blender/blender/shader.cpp:104-134: the graph is walked through
links — Mix/Add shaders, image textures via texture.hpp:67-119, normal
maps — and compiled per node type, with the Glass node expanded to
reflection+refraction+fresnel).

Leaf node mapping (Blender node idname -> Material constructor):
  BSDF_DIFFUSE  -> Material.diffuse(color, roughness)
  BSDF_GLOSSY   -> Material.glossy(color, roughness)
  BSDF_REFRACTION -> Material.refraction(color, ior, roughness)
  BSDF_GLASS    -> Material.glass(color, ior, roughness)
  BSDF_SHEEN / VELVET -> Material.sheen(color, roughness)
  BSDF_TRANSPARENT -> Material.transparent(color)
  EMISSION      -> Material.emitter(color, strength)
  BSDF_PRINCIPLED -> approximated: diffuse + glossy mix by specular

Graph structure compiled (not just the node plugged into the output):
  MixShader      -> both branches, lobe weights scaled (1-fac)/fac;
                    a Fresnel node driving Fac becomes per-hit F/(1-F)
                    lobe weighting (the lobe fresnel modes)
  AddShader      -> lobe union, emission sum
  TexImage/TexChecker/TexNoise on a Color input -> scene texture
                    multiplying that lobe (or the emission)
  NormalMap(TexImage) on a Normal input -> material normal map

Meshes export Blender's loop data when present: split normals and the
active UV layer become per-corner (face-varying) Mesh attributes, so
hard edges and uv seams survive — the reference's per-face-vertex
attribute path (plugins/blender/import.hpp:115-134, src/mesh.hpp:20).
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
    tex_cache: dict[str, int] = {}  # blender image name -> scene texture id

    def material_id(bl_mat):
        if bl_mat is None:
            return default_mat
        if bl_mat.name in mat_ids:
            return mat_ids[bl_mat.name]
        mat = convert_material(bl_mat, scene=scene, tex_cache=tex_cache)
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

        # loop (corner) attributes: split normals + active uv layer.
        # Blender's loop normals already bake flat faces and autosmooth
        # angles, so exporting them per-corner is the honest path (the
        # round-1 exporter collapsed them to v.normal and shaded
        # hard-edged smooth assets wrong).
        corner_normals = _loop_normals(mesh)
        if corner_normals is not None:
            corner_normals = corner_normals @ nrm_m.T
            norm = np.linalg.norm(corner_normals, axis=-1, keepdims=True)
            corner_normals = corner_normals / np.maximum(norm, 1e-20)
        corner_uvs = _loop_uvs(mesh)

        scene.add_mesh(
            Mesh(
                vertices=verts,
                faces=tris,
                normals=vnorm,
                material=tri_mat,
                # corner normals encode flat faces themselves
                smooth=True if corner_normals is not None else smooth,
                name=obj.name,
                corner_normals=corner_normals,
                corner_uvs=corner_uvs,
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


def _loop_normals(mesh):
    """(F, 3, 3) per-corner normals from Blender loop data, or None when
    the stub/mesh exposes no loops (object-space; caller transforms)."""
    loops = getattr(mesh, "loops", None)
    if loops is None:
        return None
    try:
        out = np.array(
            [
                [tuple(loops[li].normal[:]) for li in lt.loops]
                for lt in mesh.loop_triangles
            ],
            np.float32,
        )
    except (AttributeError, TypeError):
        return None
    return out if out.size else None


def _loop_uvs(mesh):
    """(F, 3, 2) per-corner uvs from the active uv layer, or None."""
    layers = getattr(mesh, "uv_layers", None)
    active = getattr(layers, "active", None) if layers is not None else None
    data = getattr(active, "data", None) if active is not None else None
    if data is None:
        return None
    try:
        out = np.array(
            [
                [tuple(data[li].uv[:2]) for li in lt.loops]
                for lt in mesh.loop_triangles
            ],
            np.float32,
        )
    except (AttributeError, TypeError):
        return None
    return out if out.size else None


def convert_material(bl_mat, scene=None, tex_cache=None):
    """Compile a Blender material node graph to a lobe Material.

    Follows links like the reference compiler
    (plugins/blender/blender/shader.cpp:104-134): Mix/Add shader chains,
    image/procedural textures on color inputs, normal-map nodes. scene
    (optional) receives the textures; without it texture nodes degrade
    to their non-textured colors."""
    from phosphorus_mk2_tpu.core.material import Material

    name = bl_mat.name
    if not bl_mat.use_nodes or bl_mat.node_tree is None:
        c = tuple(bl_mat.diffuse_color[:3])
        return Material.diffuse(c, name=name)

    node = _surface_node(bl_mat.node_tree)
    if node is None:
        return Material.diffuse((0.8, 0.8, 0.8), name=name)
    ctx = _GraphCtx(scene, tex_cache if tex_cache is not None else {})
    mat = _compile_shader(node, ctx, depth=0)
    mat.name = name
    if not mat.lobes and not mat.is_emitter:
        return Material.diffuse((0.8, 0.8, 0.8), name=name)
    return mat


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


def _linked(node, name):
    """from_node of the link driving input `name`, or None."""
    s = node.inputs.get(name)
    if s is not None and getattr(s, "links", None):
        return s.links[0].from_node
    return None


class _GraphCtx:
    """Texture registration during a graph walk (scene may be None)."""

    def __init__(self, scene, cache):
        self.scene = scene
        self.cache = cache

    def texture_id(self, node) -> int:
        """Scene texture id for a texture-type node, or -1."""
        if self.scene is None or node is None:
            return -1
        from phosphorus_mk2_tpu.core.texture import Texture, checkerboard

        t = node.bl_idname
        if t in ("ShaderNodeTexImage", "ShaderNodeTexEnvironment"):
            img = getattr(node, "image", None)
            if img is None:
                return -1
            key = "img:" + getattr(img, "name", str(id(img)))
            if key in self.cache:
                return self.cache[key]
            w, h = int(img.size[0]), int(img.size[1])
            ch = int(getattr(img, "channels", 4))
            px = np.asarray(img.pixels[:], np.float32).reshape(h, w, ch)
            # Blender stores rows bottom-up; Texture expects top-left origin
            tex = Texture(image=px[::-1, :, :3], name=key)
            tid = self.scene.add_texture(tex)
            self.cache[key] = tid
            return tid
        if t == "ShaderNodeTexChecker":
            key = f"checker:{id(node)}"
            if key not in self.cache:
                a = _in(node, "Color1", (1.0, 1.0, 1.0))
                b = _in(node, "Color2", (0.0, 0.0, 0.0))
                n = max(2, int(_in(node, "Scale", 5.0)))
                self.cache[key] = self.scene.add_texture(
                    checkerboard(n=n, a=a, b=b)
                )
            return self.cache[key]
        if t == "ShaderNodeTexNoise":
            key = f"noise:{id(node)}"
            if key not in self.cache:
                self.cache[key] = self.scene.add_texture(
                    Texture.musgrave(scale=float(_in(node, "Scale", 5.0)))
                )
            return self.cache[key]
        return -1


def _color_tex(node, sock, default, ctx):
    """(rgb, texture_id) for a color input that may be link-driven by a
    texture node (reference texture.hpp:67-119 builds the OSL texture
    subgraph; here the texture multiplies the lobe weight)."""
    src = _linked(node, sock)
    if src is not None:
        tid = ctx.texture_id(src)
        if tid >= 0:
            return (1.0, 1.0, 1.0), tid
    return _in(node, sock, default), -1


def _normal_tex(node, ctx) -> int:
    """Texture id behind a NormalMap node on the Normal input, or -1."""
    nm = _linked(node, "Normal")
    if nm is not None and nm.bl_idname == "ShaderNodeNormalMap":
        return ctx.texture_id(_linked(nm, "Color"))
    return -1


def _scaled(mat, fac: float):
    """Material with lobe weights and emission scaled by fac."""
    import dataclasses

    from phosphorus_mk2_tpu.core.material import Lobe

    lobes = [
        Lobe(
            lobe.type,
            tuple(w * fac for w in lobe.weight),
            lobe.params,
            lobe.texture,
        )
        for lobe in mat.lobes
    ]
    return dataclasses.replace(
        mat, lobes=lobes, emission=tuple(e * fac for e in mat.emission)
    )


def _merged(a, b, name=""):
    """Lobe union + emission sum; textures/normal maps propagate."""
    from phosphorus_mk2_tpu.core.material import Material

    return Material(
        name=name,
        lobes=list(a.lobes) + list(b.lobes),
        emission=tuple(x + y for x, y in zip(a.emission, b.emission)),
        emission_texture=(
            a.emission_texture if a.emission_texture >= 0 else b.emission_texture
        ),
        normal_texture=(
            a.normal_texture if a.normal_texture >= 0 else b.normal_texture
        ),
    )


def _shader_inputs(node):
    """The (up to two) shader-socket links of a Mix/Add node, in order.
    Blender names both sockets "Shader", so walk the socket list."""
    out = []
    sockets = getattr(node.inputs, "sockets", None)
    if sockets is None:
        # bpy: node.inputs is index-/name-addressable and iterable
        try:
            sockets = list(node.inputs)
        except TypeError:
            return out
    for s in sockets:
        if getattr(s, "name", "") == "Shader" and getattr(s, "links", None):
            out.append(s.links[0].from_node)
    return out


def _compile_shader(node, ctx, depth: int) -> "Material":
    """Recursive shader-graph compile (reference shader.cpp:104-134)."""
    from phosphorus_mk2_tpu.core.material import (
        FRESNEL_F,
        FRESNEL_ONE_MINUS_F,
        Lobe,
        Material,
        _with_fresnel,
    )

    if node is None or depth > 16:
        return Material(lobes=[])
    t = node.bl_idname

    if t == "ShaderNodeMixShader":
        branches = _shader_inputs(node)
        a = _compile_shader(branches[0] if branches else None, ctx, depth + 1)
        b = _compile_shader(
            branches[1] if len(branches) > 1 else None, ctx, depth + 1
        )
        fres = _linked(node, "Fac")
        if fres is not None and fres.bl_idname == "ShaderNodeFresnel":
            # per-hit dielectric mix: shader1 weighted (1-F), shader2 F —
            # the reference's fresnel+mix subgraph (shader.hpp:306-361)
            ior = float(_in(fres, "IOR", 1.45))

            def _mode(m, mode):
                m.lobes = [
                    Lobe(
                        lo.type,
                        lo.weight,
                        (
                            _with_fresnel(lo, mode, ior)
                            if lo.padded_params()[4] == 0.0
                            else lo.params
                        ),
                        lo.texture,
                    )
                    for lo in m.lobes
                ]
                return m

            return _merged(
                _mode(a, FRESNEL_ONE_MINUS_F), _mode(b, FRESNEL_F)
            )
        fac = _in(node, "Fac", 0.5)
        fac = float(fac if not isinstance(fac, tuple) else fac[0])
        return _merged(_scaled(a, 1.0 - fac), _scaled(b, fac))

    if t == "ShaderNodeAddShader":
        branches = _shader_inputs(node)
        a = _compile_shader(branches[0] if branches else None, ctx, depth + 1)
        b = _compile_shader(
            branches[1] if len(branches) > 1 else None, ctx, depth + 1
        )
        return _merged(a, b)

    return _convert_node(node, "", ctx)


def _convert_node(node, name, ctx=None):
    from phosphorus_mk2_tpu.core.material import Material

    if ctx is None:
        ctx = _GraphCtx(None, {})
    t = node.bl_idname

    if t == "ShaderNodeBsdfDiffuse":
        color, tid = _color_tex(node, "Color", (0.8, 0.8, 0.8), ctx)
        m = Material.diffuse(
            color, roughness=_in(node, "Roughness", 0.0), name=name
        )
        m.lobes[0].texture = tid
        m.normal_texture = _normal_tex(node, ctx)
        return m
    if t in ("ShaderNodeBsdfGlossy", "ShaderNodeBsdfAnisotropic"):
        color, tid = _color_tex(node, "Color", (1.0, 1.0, 1.0), ctx)
        m = Material.glossy(
            color, roughness=_in(node, "Roughness", 0.2), name=name
        )
        m.lobes[0].texture = tid
        m.normal_texture = _normal_tex(node, ctx)
        return m
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
        color, tid = _color_tex(node, "Color", (1.0, 1.0, 1.0), ctx)
        m = Material.emitter(
            color, power=_in(node, "Strength", 1.0), name=name
        )
        m.emission_texture = tid
        return m
    if t == "ShaderNodeBsdfPrincipled":
        # weighted lobe blend (round-2 verdict: the binary metallic>0.5
        # switch + fixed 0.2 gloss split was coarse). Decomposition:
        #   metal      = metallic                x base-tinted GGX
        #   glass pair = (1-metallic)*transmission x fresnel reflect+refract
        #   dielectric = (1-metallic)*(1-transmission) x
        #                [ base diffuse (1-F) + white GGX coat (F, scaled
        #                  by Specular level: 0.5 = physical F0) ]
        # mirrors Cycles' principled layering with this framework's
        # one-sample lobe mixture + per-hit fresnel modes.
        from phosphorus_mk2_tpu.core.material import (
            DIFFUSE, FRESNEL_F, FRESNEL_ONE_MINUS_F, MICROFACET,
            MICROFACET_REFRACT, Lobe, Material as M, roughness_to_alpha,
        )

        base, tid = _color_tex(node, "Base Color", (0.8, 0.8, 0.8), ctx)
        rough = _in(node, "Roughness", 0.5)
        metallic = _in(node, "Metallic", 0.0)
        if isinstance(metallic, tuple):
            metallic = metallic[0]
        ior = _in(node, "IOR", 1.45)
        spec = _in(node, "Specular IOR Level", _in(node, "Specular", 0.5))
        if isinstance(spec, tuple):
            spec = spec[0]
        trans = _in(node, "Transmission Weight", _in(node, "Transmission", 0.0))
        if isinstance(trans, tuple):
            trans = trans[0]
        emis = _in(node, "Emission Color", (0.0, 0.0, 0.0))
        emis_s = _in(node, "Emission Strength", 0.0)
        ntex = _normal_tex(node, ctx)
        if emis_s and any(e > 0 for e in emis):
            return M.emitter(emis, power=emis_s, name=name)

        alpha = roughness_to_alpha(rough * rough)
        lobes = []
        if metallic > 0.0:
            metal = Lobe(
                MICROFACET,
                tuple(c * metallic for c in base),
                (alpha, alpha, 0.0),
            )
            metal.texture = tid
            lobes.append(metal)
        glass_w = (1.0 - metallic) * trans
        if glass_w > 0.0:
            lobes.append(Lobe(
                MICROFACET, (glass_w,) * 3,
                (alpha, alpha, 0.0, 0.0, FRESNEL_F, ior),
            ))
            lobes.append(Lobe(
                MICROFACET_REFRACT,
                tuple(c * glass_w for c in base),
                (alpha, alpha, ior, 0.0, FRESNEL_ONE_MINUS_F, ior),
            ))
        opaque = (1.0 - metallic) * (1.0 - trans)
        if opaque > 0.0:
            diff = Lobe(
                DIFFUSE,
                tuple(c * opaque for c in base),
                (0.0, 0.0, 0.0, 0.0, FRESNEL_ONE_MINUS_F, ior),
            )
            diff.texture = tid
            lobes.append(diff)
            coat = opaque * (spec / 0.5)  # 0.5 = physical F0 for this ior
            if coat > 0.0:
                lobes.append(Lobe(
                    MICROFACET, (coat,) * 3,
                    (alpha, alpha, 0.0, 0.0, FRESNEL_F, ior),
                ))
        m = M(name=name, lobes=lobes or [Lobe(DIFFUSE, base)])
        m.normal_texture = ntex
        return m
    # unknown -> grey diffuse
    return Material.diffuse((0.8, 0.8, 0.8), name=name)


def _world_emission(world):
    if world.use_nodes and world.node_tree:
        for n in world.node_tree.nodes:
            if n.bl_idname == "ShaderNodeBackground":
                return _in(n, "Color", (0.05, 0.05, 0.05)), _in(n, "Strength", 1.0)
    c = tuple(world.color[:3])
    return c, 1.0
