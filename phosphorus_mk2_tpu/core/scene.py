"""Scene container and device scene data.

Host side, ``Scene`` mirrors the reference's ``scene_t``
(reference src/scene.cpp:9-128): it owns meshes, materials and lights,
auto-creates area lights from emissive face sets during preprocess
(reference src/mesh.cpp:108-116) and flattens all meshes into one global
triangle soup (reference src/scene.cpp:58).

``Scene.build()`` produces a ``SceneData`` pytree of jnp arrays — the
device-resident, fully differentiable scene representation that the
integrator consumes. On multi-chip meshes SceneData is replicated per
device (the reference shares scene+BVH read-only across threads,
SURVEY.md section 2.5).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.core.camera import Camera
from phosphorus_mk2_tpu.core.material import Material, pack_materials
from phosphorus_mk2_tpu.core.mesh import Mesh

LIGHT_POINT = 0
LIGHT_AREA = 1
LIGHT_INFINITE = 2


def _pytree_dataclass(cls):
    import jax

    fields = [f.name for f in dataclasses.fields(cls)]
    data = [f for f in fields if f not in cls.STATIC_FIELDS]
    jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=list(cls.STATIC_FIELDS))
    return cls


@dataclasses.dataclass
class SceneData:
    """Device scene: triangle soup + materials + lights (+ optional BVH).

    All array leaves are jnp and differentiable where meaningful
    (vertices, normals, lobe weights/params, emission). Static metadata
    lives in STATIC_FIELDS so jit treats it as compile-time constants.
    """

    # geometry (global soup)
    vertices: jnp.ndarray        # (V, 3) f32
    faces: jnp.ndarray           # (F, 3) i32
    normals: jnp.ndarray         # (V, 3) f32 (zeros if none)
    uvs: jnp.ndarray             # (V, 2) f32 (zeros if none)
    smooth: jnp.ndarray          # (F,) bool
    tri_mat: jnp.ndarray         # (F,) i32
    tri_mesh: jnp.ndarray        # (F,) i32
    # materials (lobe arrays, see core/material.py)
    lobe_type: jnp.ndarray       # (M, L) i32
    lobe_weight: jnp.ndarray     # (M, L, 3) f32
    lobe_param: jnp.ndarray      # (M, L, P) f32
    lobe_flags: jnp.ndarray      # (M, L) i32
    n_lobes: jnp.ndarray         # (M,) i32
    emission: jnp.ndarray        # (M, 3) f32
    # lights
    light_type: jnp.ndarray      # (NL,) i32
    light_mat: jnp.ndarray       # (NL,) i32
    light_offset: jnp.ndarray    # (NL,) i32 into light_tris
    light_count: jnp.ndarray     # (NL,) i32
    light_area: jnp.ndarray      # (NL,) f32 (total area of area light)
    light_tris: jnp.ndarray      # (LT,) i32 global triangle ids
    # textures (atlas, see core/texture.py)
    tex_atlas: jnp.ndarray = None   # (AH, AW, 3) f32
    tex_info: jnp.ndarray = None    # (K, 4) i32 (y0, x0, h, w)
    lobe_tex: jnp.ndarray = None    # (M, L) i32, -1 = untextured
    emission_tex: jnp.ndarray = None  # (M,) i32
    normal_tex: jnp.ndarray = None    # (M,) i32 tangent-space normal maps
    tangents: jnp.ndarray = None      # (V, 3) f32 (zeros if none)
    tex_proc: jnp.ndarray = None      # (K,) i32 procedural type per texture
    tex_proc_params: jnp.ndarray = None  # (K, 4) f32
    # NEE area pdf per triangle: 1/(num_lights * light_total_area) for
    # triangles on an area light, 0 elsewhere. Used only by the MIS
    # integrator path (no reference counterpart; the reference has no MIS)
    tri_light_pdf: jnp.ndarray = None  # (F,) f32
    # acceleration structure (None = brute force oracle)
    bvh: dict | None = None
    # static metadata
    num_lights: int = 0
    env_mat: int = -1            # material id of the environment, or -1
    has_normals: bool = False
    has_uvs: bool = False
    # which lobe types any material uses — static, so the dense BSDF
    # dispatch compiles away the absent types entirely (an all-diffuse
    # scene never evaluates GGX/sheen code)
    lobe_types_present: tuple = ()
    # max lobes on any one material — static; single-lobe scenes skip
    # the one-sample-mixture machinery entirely
    max_lobes_used: int = 0
    # static: untextured scenes compile away all atlas sampling
    has_textures: bool = False
    # static: scenes without fresnel-mixed lobes skip the per-hit fresnel
    has_fresnel: bool = False
    # static: normal mapping only compiled in when used
    has_normal_maps: bool = False
    # static: procedural (noise) textures only compiled in when used
    has_procedural: bool = False

    STATIC_FIELDS = (
        "num_lights",
        "env_mat",
        "has_normals",
        "has_uvs",
        "lobe_types_present",
        "max_lobes_used",
        "has_textures",
        "has_fresnel",
        "has_normal_maps",
        "has_procedural",
    )

    @property
    def num_tris(self) -> int:
        return self.faces.shape[0]


_pytree_dataclass(SceneData)


class Scene:
    """Host-side scene under construction."""

    def __init__(self):
        self.meshes: list[Mesh] = []
        self.materials: list[Material] = []
        self._material_ids: dict[str, int] = {}
        self.textures: list = []
        self.camera: Camera = Camera()
        self.environment: int | None = None  # material id
        self.texture_dtype: str = "f32"  # "f16" halves atlas HBM +
        # per-sample gather bytes (filtering upcasts; see pack_textures)

    def add_texture(self, texture) -> int:
        from phosphorus_mk2_tpu.core.texture import Texture

        if not isinstance(texture, Texture):
            texture = Texture(texture)
        self.textures.append(texture)
        return len(self.textures) - 1

    # --- construction -------------------------------------------------

    def add_material(self, material: Material) -> int:
        mid = len(self.materials)
        self.materials.append(material)
        if material.name:
            self._material_ids[material.name] = mid
        return mid

    def material_id(self, name: str) -> int:
        return self._material_ids[name]

    def material(self, ref) -> Material:
        if isinstance(ref, str):
            return self.materials[self._material_ids[ref]]
        return self.materials[ref]

    def add_mesh(self, mesh: Mesh) -> int:
        self.meshes.append(mesh)
        return len(self.meshes) - 1

    def set_environment(self, material) -> None:
        """Attach an infinite light driven by a background material
        (reference codec world.environment, src/codecs/scene.cpp:33-38)."""
        if isinstance(material, Material):
            material = self.add_material(material)
        elif isinstance(material, str):
            material = self._material_ids[material]
        self.environment = material

    def _resolve_face_materials(self, mesh: Mesh) -> np.ndarray:
        mat = mesh.material
        if mat is None:
            raise ValueError(f"mesh {mesh.name!r} has no material")
        if isinstance(mat, str):
            mat = self._material_ids[mat]
        if isinstance(mat, (int, np.integer)):
            return np.full((mesh.num_faces,), int(mat), np.int32)
        return np.ascontiguousarray(mat, np.int32)

    # --- preprocess / build -------------------------------------------

    def build(self) -> SceneData:
        """Flatten to the device representation, creating area lights
        from emissive face sets (reference src/mesh.cpp:108-116)."""
        if not self.meshes:
            raise ValueError("scene has no meshes")

        needs_tangents = any(m.normal_texture >= 0 for m in self.materials)
        verts, faces, normals, uvs, smooth = [], [], [], [], []
        tangents = []
        tri_mat, tri_mesh = [], []
        v_off = 0
        for mi, mesh in enumerate(self.meshes):
            # fold per-face-vertex (corner) attributes into split
            # vertices — the device scene is always per-vertex
            # (reference per-vertex vs per-face-vertex modes,
            # src/mesh.hpp:20-26)
            mesh = mesh.resolve_corners()
            if needs_tangents and mesh.tangents is None and mesh.uvs is not None:
                # auto tangents for normal-mapped scenes (the reference
                # generates MikkTSpace tangents only when a material asks
                # for geom:tangent, plugins/blender/import.hpp:115-134)
                mesh.tangents = mesh.compute_tangents()
            verts.append(mesh.vertices)
            faces.append(mesh.faces + v_off)
            n = mesh.normals
            if n is None:
                n = mesh.compute_vertex_normals()
            normals.append(n)
            tangents.append(
                mesh.tangents
                if mesh.tangents is not None
                else np.zeros((mesh.vertices.shape[0], 3), np.float32)
            )
            uvs.append(
                mesh.uvs
                if mesh.uvs is not None
                else np.zeros((mesh.vertices.shape[0], 2), np.float32)
            )
            s = mesh.smooth
            if isinstance(s, (bool, np.bool_)):
                s = np.full((mesh.num_faces,), bool(s))
            smooth.append(np.asarray(s, bool))
            tri_mat.append(self._resolve_face_materials(mesh))
            tri_mesh.append(np.full((mesh.num_faces,), mi, np.int32))
            v_off += mesh.vertices.shape[0]

        vertices = np.concatenate(verts)
        faces_arr = np.concatenate(faces)
        tri_mat_arr = np.concatenate(tri_mat)
        tri_mesh_arr = np.concatenate(tri_mesh)

        # area lights from emissive face sets. tri_light_pdf (the NEE
        # area pdf used by MIS weighting of BSDF-sampled light hits) is
        # assigned here, inside the loop where sel/area are in scope —
        # NEE picks a light uniformly (pdf / num_lights, divided below)
        # and a point with area pdf 1/total_area (core/lights.py)
        light_rows = []
        light_tris: list[np.ndarray] = []
        tri_areas = _tri_areas(vertices, faces_arr)
        tri_light_pdf = np.zeros((faces_arr.shape[0],), np.float32)
        for mid, mat in enumerate(self.materials):
            if not mat.is_emitter or (self.environment == mid):
                continue
            sel = np.nonzero(tri_mat_arr == mid)[0]
            if sel.size == 0:
                continue
            area = float(tri_areas[sel].sum())
            light_rows.append(
                (LIGHT_AREA, mid, sum(t.size for t in light_tris), sel.size, area)
            )
            light_tris.append(sel.astype(np.int32))
            if area > 0.0:
                tri_light_pdf[sel] = 1.0 / area
        if self.environment is not None:
            light_rows.append(
                (LIGHT_INFINITE, self.environment, 0, 0, 0.0)
            )

        num_lights = len(light_rows)
        if num_lights == 0:
            # keep arrays non-empty for jit; the integrator guards on
            # num_lights (the reference silently renders black without
            # lights, session.cpp:212-216)
            light_rows.append((LIGHT_POINT, 0, 0, 0, 0.0))
        if not light_tris:
            light_tris.append(np.zeros((1,), np.int32))

        # finish the per-triangle NEE pdf: divide by the uniform light
        # pick probability now that num_lights is known
        if num_lights > 0:
            tri_light_pdf /= num_lights

        lt = np.array([r[0] for r in light_rows], np.int32)
        lm = np.array([r[1] for r in light_rows], np.int32)
        lo = np.array([r[2] for r in light_rows], np.int32)
        lc = np.array([r[3] for r in light_rows], np.int32)
        la = np.array([r[4] for r in light_rows], np.float32)

        mats = pack_materials(self.materials)

        from phosphorus_mk2_tpu.core.texture import pack_textures

        atlas = pack_textures(self.textures, dtype=self.texture_dtype)

        return SceneData(
            vertices=jnp.asarray(vertices),
            faces=jnp.asarray(faces_arr),
            normals=jnp.asarray(np.concatenate(normals)),
            uvs=jnp.asarray(np.concatenate(uvs)),
            smooth=jnp.asarray(np.concatenate(smooth)),
            tri_mat=jnp.asarray(tri_mat_arr),
            tri_mesh=jnp.asarray(tri_mesh_arr),
            lobe_type=jnp.asarray(mats["lobe_type"]),
            lobe_weight=jnp.asarray(mats["lobe_weight"]),
            lobe_param=jnp.asarray(mats["lobe_param"]),
            lobe_flags=jnp.asarray(mats["lobe_flags"]),
            n_lobes=jnp.asarray(mats["n_lobes"]),
            emission=jnp.asarray(mats["emission"]),
            light_type=jnp.asarray(lt),
            light_mat=jnp.asarray(lm),
            light_offset=jnp.asarray(lo),
            light_count=jnp.asarray(lc),
            light_area=jnp.asarray(la),
            light_tris=jnp.asarray(np.concatenate(light_tris)),
            tri_light_pdf=jnp.asarray(tri_light_pdf),
            tex_atlas=jnp.asarray(atlas["atlas"]),
            tex_info=jnp.asarray(atlas["info"]),
            lobe_tex=jnp.asarray(mats["lobe_tex"]),
            emission_tex=jnp.asarray(mats["emission_tex"]),
            normal_tex=jnp.asarray(mats["normal_tex"]),
            tangents=jnp.asarray(np.concatenate(tangents)),
            tex_proc=jnp.asarray(atlas["proc"]),
            tex_proc_params=jnp.asarray(atlas["proc_params"]),
            bvh=None,
            num_lights=num_lights,
            env_mat=-1 if self.environment is None else int(self.environment),
            has_normals=any(m.normals is not None for m in self.meshes),
            has_uvs=any(m.uvs is not None for m in self.meshes),
            lobe_types_present=tuple(
                sorted({lobe.type for m in self.materials for lobe in m.lobes})
            ),
            max_lobes_used=max(
                (len(m.lobes) for m in self.materials), default=0
            ),
            has_textures=len(self.textures) > 0,
            has_normal_maps=any(
                m.normal_texture >= 0 for m in self.materials
            ),
            has_procedural=any(
                getattr(t, "procedural", 0) != 0 for t in self.textures
            ),
            has_fresnel=any(
                len(lobe.params) > 4 and lobe.params[4] != 0.0
                for m in self.materials
                for lobe in m.lobes
            ),
        )


def _tri_areas(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    a = vertices[faces[:, 0]]
    b = vertices[faces[:, 1]]
    c = vertices[faces[:, 2]]
    return 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)
