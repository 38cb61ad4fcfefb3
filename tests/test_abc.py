"""Ogawa/Alembic stack: container round-trip, archive round-trip,
importer semantics (xform baking, face sets, face-varying attributes).

Reference counterpart: src/codecs/scene/alembic.hpp — which consumes the
Alembic SDK; here the whole stack is pure Python (io/ogawa.py, io/abc.py,
io/alembic.py) since no binding exists in this environment, so the
round-trip IS the validation (see the FIDELITY NOTE in io/abc.py).
"""
import numpy as np
import pytest

from phosphorus_mk2_tpu.core.material import Material
from phosphorus_mk2_tpu.core.mesh import Mesh
from phosphorus_mk2_tpu.core.scene import Scene
from phosphorus_mk2_tpu.io.alembic import import_alembic, write_alembic
from phosphorus_mk2_tpu.io.ogawa import (
    EMPTY_DATA,
    EMPTY_GROUP,
    OgawaReader,
    OgawaWriter,
)


def test_ogawa_container_roundtrip(tmp_path):
    w = OgawaWriter()
    d1 = w.write_data(b"hello")
    d2 = w.write_data(b"")
    inner = w.write_group([d1, EMPTY_GROUP, d2])
    d3 = w.write_data(bytes(range(256)))
    root = w.write_group([inner, d3, EMPTY_DATA])
    path = str(tmp_path / "t.ogawa")
    w.save(path, root)

    r = OgawaReader.open(path)
    kids = r.group(r.root)
    assert len(kids) == 3
    ik = r.group(kids[0])
    assert r.data(ik[0]) == b"hello"
    assert r.group(ik[1]) == []
    assert r.data(ik[2]) == b""
    assert r.data(kids[1]) == bytes(range(256))
    assert r.data(kids[2]) == b""


def _quad_grid(nx=3, nz=2, y=0.0):
    """A (nx x nz) quad sheet — non-triangle faces exercise fan
    triangulation."""
    xs, zs = np.meshgrid(np.arange(nx + 1), np.arange(nz + 1), indexing="ij")
    verts = np.stack(
        [xs.ravel(), np.full(xs.size, y), zs.ravel()], -1
    ).astype(np.float32)
    quads = []
    for i in range(nx):
        for j in range(nz):
            a = i * (nz + 1) + j
            quads.append([a, a + 1, a + nz + 2, a + nz + 1])
    counts = np.full((len(quads),), 4, np.int32)
    indices = np.asarray(quads, np.int32).reshape(-1)
    return verts, counts, indices


def test_archive_mesh_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.random((8, 3)).astype(np.float32)
    f = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6], [6, 7, 0]], np.int32)
    n = rng.random((8, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    uv = rng.random((8, 2)).astype(np.float32)
    mat = np.array([0, 0, 1, 1], np.int32)
    mesh = Mesh(vertices=v, faces=f, material=mat, normals=n, uvs=uv, name="m")

    xf = np.eye(4)
    xf[3, :3] = (1.0, 2.0, 3.0)  # translation row (row-vector convention)

    path = str(tmp_path / "roundtrip.abc")
    write_alembic(path, [(mesh, xf)])

    scene = Scene()
    scene.add_material(Material.diffuse(name="mat0"))
    scene.add_material(Material.diffuse(name="mat1"))
    import_alembic(path, scene)

    assert len(scene.meshes) == 1
    got = scene.meshes[0]
    np.testing.assert_allclose(got.vertices, v + np.array([1, 2, 3], np.float32),
                               rtol=1e-6)
    np.testing.assert_array_equal(got.faces, f)
    np.testing.assert_allclose(got.normals, n, rtol=1e-6)
    np.testing.assert_allclose(got.uvs, uv, rtol=1e-6)
    # face sets bound by name: mat0 -> id 0, mat1 -> id 1
    np.testing.assert_array_equal(np.asarray(got.material), mat)


def test_archive_quads_and_camera(tmp_path):
    verts, counts, indices = _quad_grid()
    # write a raw polymesh via the writer primitives to exercise
    # non-triangle faceCounts
    from phosphorus_mk2_tpu.io.abc import AbcWriter, POD_INT32
    from phosphorus_mk2_tpu.io.alembic import POLYMESH_SCHEMA

    w = AbcWriter()
    mo = w.object(w.top, "sheet", POLYMESH_SCHEMA, f"{POLYMESH_SCHEMA}:.geom")
    geom = w.compound(".geom")
    geom["children"] = [
        w.array("P", verts, extent=3),
        w.array(".faceIndices", indices, extent=1, pod=POD_INT32),
        w.array(".faceCounts", counts, extent=1, pod=POD_INT32),
    ]
    mo["props"] = [geom]
    path = str(tmp_path / "quads.abc")
    w.save(path)

    scene = Scene()
    scene.add_material(Material.diffuse(name="sheet"))
    import_alembic(path, scene)
    got = scene.meshes[0]
    assert got.faces.shape == (2 * len(counts), 3)  # each quad -> 2 tris
    np.testing.assert_allclose(got.vertices, verts)

    # camera round-trip
    from phosphorus_mk2_tpu.core.camera import Camera

    cam = Camera()
    cam.focal_length = 50.0
    cam.sensor_width = 36.0
    path2 = str(tmp_path / "cam.abc")
    m = Mesh(vertices=verts, faces=np.array([[0, 1, 2]], np.int32),
             material="sheet", name="m")
    write_alembic(path2, [m], camera=cam)
    scene2 = Scene()
    scene2.add_material(Material.diffuse(name="sheet"))
    import_alembic(path2, scene2)
    assert abs(scene2.camera.focal_length - 50.0) < 1e-6
    assert abs(scene2.camera.sensor_width - 36.0) < 1e-5
    expect_fov = 2.0 * np.arctan2(18.0, 50.0)
    assert abs(scene2.camera.fov - expect_fov) < 1e-6


def test_face_varying_attributes_roundtrip(tmp_path):
    """Corner (per-face-vertex) normals/uvs survive the archive and are
    split into per-vertex data at Scene.build — the hard-edge case the
    round-1 per-vertex-only mesh could not represent."""
    # two triangles sharing an edge, flat corner normals per face
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 1]], np.float32
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    n0 = np.array([0, 0, 1], np.float32)
    n1 = np.array([-0.5**0.5, 0, 0.5**0.5], np.float32)
    cn = np.stack([np.tile(n0, (3, 1)), np.tile(n1, (3, 1))]).reshape(2, 3, 3)
    cuv = np.arange(12, dtype=np.float32).reshape(2, 3, 2) / 12.0
    mesh = Mesh(vertices=v, faces=f, material="m", corner_normals=cn,
                corner_uvs=cuv, name="m")

    path = str(tmp_path / "fvr.abc")
    write_alembic(path, [mesh])
    scene = Scene()
    scene.add_material(Material.diffuse(name="m"))
    import_alembic(path, scene)
    got = scene.meshes[0]
    assert got.corner_normals is not None and got.corner_uvs is not None
    np.testing.assert_allclose(got.corner_normals, cn, rtol=1e-6)
    np.testing.assert_allclose(got.corner_uvs, cuv, rtol=1e-6)

    # resolve: shared-edge vertices split (different corner normals)
    r = got.resolve_corners()
    assert r.vertices.shape[0] == 6  # 2 faces x 3 distinct corners each
    # interpolation data preserved exactly at each corner
    for fi in range(2):
        for k in range(3):
            vid = r.faces[fi, k]
            np.testing.assert_allclose(r.normals[vid], cn[fi, k], rtol=1e-6)
            np.testing.assert_allclose(r.uvs[vid], cuv[fi, k], rtol=1e-6)


def test_corner_normals_render_faceted():
    """A hard-edged box with flat corner normals renders faceted (normal
    AOV constant per face, discontinuous across the edge) while the same
    geometry with smooth per-vertex normals does not."""
    import jax

    from phosphorus_mk2_tpu.core.camera import Camera, camera_to_params
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass

    # a walls-free scene: just the tent facing the camera, so every hit
    # normal belongs to the tent. Tent = 2-face ridge with flat corner
    # normals per face.
    v = np.array(
        [[-1, -0.2, -0.5], [0, 0.4, -0.5], [1, -0.2, -0.5],
         [-1, -0.2, 0.5], [0, 0.4, 0.5], [1, -0.2, 0.5]], np.float32
    )
    f = np.array([[0, 1, 4], [0, 4, 3], [1, 2, 5], [1, 5, 4]], np.int32)
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    fn /= np.linalg.norm(fn, axis=-1, keepdims=True)
    cn = np.repeat(fn[:, None, :], 3, axis=1)

    camera = Camera.look_at(
        position=(0.0, 2.5, 0.0), target=(0.0, 0.0, 0.0),
        up=(0.0, 0.0, -1.0), width=16, height=16,
    )
    cam = camera_to_params(camera)

    def normals_of(**mesh_kw):
        scene = Scene()
        mid = scene.add_material(Material.diffuse(name="m"))
        scene.add_mesh(Mesh(vertices=v, faces=f, material=mid,
                            smooth=True, name="tent", **mesh_kw))
        scene.camera = camera
        data = scene.build()
        tracer = make_tracer(data, use_bvh=False)
        out = render_pass(
            data, cam, jax.random.key(0), 0, 1,
            width=16, height=16, max_depth=1, tracer=tracer,
        )
        return np.asarray(out["normal"]).reshape(16, 16, 3)

    n_flat = normals_of(corner_normals=cn)
    n_smooth = normals_of()
    hit = np.linalg.norm(n_flat, axis=-1) > 0.5
    assert hit.sum() > 8
    # faceted: every hit normal equals one of the 2 distinct face normals
    uniq = np.unique(np.round(n_flat[hit], 4), axis=0)
    assert uniq.shape[0] <= 2, uniq
    # smooth: interpolation produces a spread of normals
    uniq_s = np.unique(np.round(n_smooth[hit], 4), axis=0)
    assert uniq_s.shape[0] > 2
