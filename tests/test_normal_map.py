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
