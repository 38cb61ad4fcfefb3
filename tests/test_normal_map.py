"""Normal mapping: tangent computation and shading-normal perturbation."""
import numpy as np

from phosphorus_mk2_tpu.core.camera import Camera
from phosphorus_mk2_tpu.core.material import Material
from phosphorus_mk2_tpu.core.mesh import Mesh
from phosphorus_mk2_tpu.core.options import Options
from phosphorus_mk2_tpu.core.scene import Scene
from phosphorus_mk2_tpu.core.texture import Texture
from phosphorus_mk2_tpu.integrator.path import render_aovs


def quad_scene(normal_img):
    scene = Scene()
    tid = scene.add_texture(Texture(normal_img))
    mat = Material.diffuse((0.8, 0.8, 0.8), name="m")
    mat.normal_texture = tid
    mid = scene.add_material(mat)
    scene.set_environment(Material.background((1, 1, 1), name="sky"))
    verts = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    mesh = Mesh(
        vertices=verts,
        faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        uvs=uvs,
        material=mid,
        smooth=False,
    )
    mesh.tangents = mesh.compute_tangents()
    scene.meshes.append(mesh)
    scene.camera = Camera.look_at((0, 0, 2.5), (0, 0, 0), width=16, height=16)
    return scene


def test_tangents_follow_uv_gradient():
    verts = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    mesh = Mesh(
        vertices=verts,
        faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        uvs=uvs,
        material=0,
    )
    t = mesh.compute_tangents()
    # u increases along +x -> tangent ~ +x
    np.testing.assert_allclose(t, np.tile([[1, 0, 0]], (4, 1)), atol=1e-5)


def test_flat_normal_map_is_identity():
    flat = np.full((4, 4, 3), [0.5, 0.5, 1.0], np.float32)  # (0,0,1) in ts
    scene = quad_scene(flat)
    data = scene.build()
    assert data.has_normal_maps
    out = render_aovs(
        scene.build(), scene.camera, spp=1, max_depth=1,
        options=Options(use_bvh=False, samples_per_pass=1),
    )
    nrm = np.asarray(out["normal"])
    # quad faces +z; flat map must leave the normal at +z
    center = nrm[8, 8]
    np.testing.assert_allclose(center, [0, 0, 1], atol=2e-2)


def test_tilted_normal_map_changes_normal():
    tilted = np.full((4, 4, 3), [1.0, 0.5, 0.5], np.float32)  # +x tilt
    scene = quad_scene(tilted)
    out = render_aovs(
        scene.build(), scene.camera, spp=1, max_depth=1,
        options=Options(use_bvh=False, samples_per_pass=1),
    )
    nrm = np.asarray(out["normal"])[8, 8]
    assert nrm[0] > 0.4  # tilted toward +x (tangent direction)
    assert abs(nrm[2]) < 0.9


def test_tangents_mikktspace_properties():
    """MikkTSpace-compatible tangent semantics (round-3 verdict item 4;
    reference plugins/blender/import.hpp:115-134): orthogonal to the
    shading normal, unit length, angle-weighted (a sliver triangle in
    the fan cannot dominate the average), degenerate-uv faces excluded.
    """
    import numpy as np

    from phosphorus_mk2_tpu.core.mesh import Mesh

    # a fan of two faces around vertex 0: one regular, one sliver with
    # a CONFLICTING uv direction; angle weighting keeps the regular
    # face's direction dominant
    verts = np.array([
        [0, 0, 0], [1, 0, 0], [0, 1, 0],          # regular right tri
        [1.0, -0.02, 0],                           # sliver apex
    ], np.float32)
    faces = np.array([[0, 1, 2], [0, 3, 1]], np.int32)
    uvs = np.array([[0, 0], [1, 0], [0, 1], [0.0, -1.0]], np.float32)
    # face 1's uv mapping points dP/du along -y-ish; its corner angle
    # at vertex 0 is tiny (~0.02 rad vs pi/2 for face 0)
    m = Mesh(vertices=verts, faces=faces, uvs=uvs, material=0, smooth=False)
    t = m.compute_tangents()
    n = m.compute_vertex_normals()
    # unit + orthogonal everywhere
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)
    assert np.abs((t * n).sum(-1)).max() < 1e-5
    # vertex 0: the regular face's +x tangent must dominate the sliver
    assert t[0, 0] > 0.95, t[0]

    # degenerate uv face contributes nothing (tangent comes out of the
    # OTHER face only, not NaN)
    verts2 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces2 = np.array([[0, 1, 2], [0, 1, 3]], np.int32)
    uvs2 = np.array([[0, 0], [1, 0], [0, 1], [0, 0]], np.float32)
    # face 1 has uv area 0 (corners 0,1,3 -> (0,0),(1,0),(0,0))
    m2 = Mesh(vertices=verts2, faces=faces2, uvs=uvs2, material=0, smooth=False)
    t2 = m2.compute_tangents()
    assert np.isfinite(t2).all()
    assert np.linalg.norm(t2[2]) > 0.99  # face-0-only vertex still set
