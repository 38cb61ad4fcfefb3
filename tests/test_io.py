"""I/O tests: EXR round-trip, OBJ loading, YAML scene import."""
import os
import textwrap

import numpy as np

from phosphorus_mk2_tpu.core.material import (
    DIFFUSE,
    MICROFACET,
    OREN_NAYAR,
    REFLECTION,
)
from phosphorus_mk2_tpu.io.exr import read_exr, write_exr, write_film
from phosphorus_mk2_tpu.io.obj import load_obj
from phosphorus_mk2_tpu.io.yaml_scene import compile_material, import_scene


def test_exr_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    channels = {
        "R": rng.random((7, 5)).astype(np.float32),
        "G": rng.random((7, 5)).astype(np.float32),
        "B": rng.random((7, 5)).astype(np.float32),
        "normal.X": rng.random((7, 5)).astype(np.float32),
    }
    path = str(tmp_path / "t.exr")
    write_exr(path, channels)
    back = read_exr(path)
    for k, v in channels.items():
        np.testing.assert_array_equal(back[k], v)


def test_exr_round_trip_compressed_half(tmp_path):
    """ZIPS/ZIP compression and HALF channels (the reference sink's
    OIIO output classes, src/film/file.cpp:27-45): float stays
    bit-exact under compression; half matches f16 quantization."""
    rng = np.random.default_rng(3)
    # 40 rows exercises multiple 16-scanline ZIP blocks + a short tail
    channels = {
        "R": (rng.random((40, 9)) * 8).astype(np.float32),
        "G": rng.standard_normal((40, 9)).astype(np.float32),
    }
    for comp in ("zips", "zip"):
        for pt in ("float", "half"):
            path = str(tmp_path / f"t_{comp}_{pt}.exr")
            write_exr(path, channels, compression=comp, pixel_type=pt)
            back = read_exr(path)
            for k, v in channels.items():
                want = (v if pt == "float"
                        else v.astype(np.float16).astype(np.float32))
                np.testing.assert_array_equal(back[k], want)


def test_exr_zip_compresses_smooth_data(tmp_path):
    """Render-like (smooth) data must actually shrink under zip."""
    import os

    y = np.linspace(0, 1, 64, dtype=np.float32)
    img = {"R": np.tile(y[:, None], (1, 64))}
    p0 = str(tmp_path / "a.exr")
    p1 = str(tmp_path / "b.exr")
    write_exr(p0, img, compression="none", pixel_type="float")
    write_exr(p1, img, compression="zip", pixel_type="float")
    assert os.path.getsize(p1) < os.path.getsize(p0) * 0.5


def test_exr_readable_by_imageio(tmp_path):
    """Cross-check our EXR bytes with an independent reader if available."""
    import imageio.v3 as iio

    color = np.random.default_rng(1).random((6, 4, 3)).astype(np.float32)
    path = str(tmp_path / "film.exr")
    write_film(path, {"color": color, "alpha": np.ones((6, 4), np.float32)})
    try:
        img = iio.imread(path)
    except Exception:
        return  # no freeimage plugin in this env; round-trip test covers us
    np.testing.assert_allclose(img[..., :3], color, atol=2e-3)  # half channels


def test_obj_loader(tmp_path):
    obj = textwrap.dedent(
        """
        # quad + tri, with normals
        v 0 0 0
        v 1 0 0
        v 1 1 0
        v 0 1 0
        v 2 0 0
        vn 0 0 1
        usemtl white
        f 1//1 2//1 3//1 4//1
        f 1//1 2//1 5//1
        """
    )
    path = tmp_path / "m.obj"
    path.write_text(obj)
    meshes = load_obj(str(path))
    assert len(meshes) == 1
    m = meshes[0]
    assert m.faces.shape == (3, 3)  # quad fan-triangulated + tri
    assert m.material == "white"
    assert m.normals is not None


def test_compile_material_nodes():
    spec = {
        "shaders": [
            {
                "name": "diffuse_bsdf_node",
                "layer": "d",
                "parameters": [
                    {"name": "Cs", "type": "rgb", "value": [0.5, 0.25, 0.125]},
                ],
            },
            {"name": "material_node", "layer": "root"},
        ],
        "connect": [
            {"from": {"layer": "d", "slot": "Cout"}, "to": {"layer": "root", "slot": "Cs"}}
        ],
    }
    mat = compile_material("m", spec)
    assert len(mat.lobes) == 1
    assert mat.lobes[0].type == DIFFUSE
    np.testing.assert_allclose(mat.lobes[0].weight, (0.5, 0.25, 0.125))

    # glossy with roughness -> microfacet; sharp -> mirror
    spec2 = {
        "shaders": [
            {
                "name": "glossy_bsdf_node",
                "layer": "g",
                "parameters": [{"name": "roughness", "type": "float", "value": 0.3}],
            }
        ]
    }
    assert compile_material("g", spec2).lobes[0].type == MICROFACET
    spec3 = {
        "shaders": [
            {
                "name": "glossy_bsdf_node",
                "layer": "g",
                "parameters": [
                    {"name": "distribution", "type": "string", "value": "sharp"}
                ],
            }
        ]
    }
    assert compile_material("g", spec3).lobes[0].type == REFLECTION

    # mix of two closures scales weights
    spec4 = {
        "shaders": [
            {"name": "diffuse_bsdf_node", "layer": "a"},
            {
                "name": "diffuse_bsdf_node",
                "layer": "b",
                "parameters": [{"name": "roughness", "type": "float", "value": 20.0}],
            },
            {
                "name": "mix_closure_node",
                "layer": "mix",
                "parameters": [{"name": "fac", "type": "float", "value": 0.25}],
            },
        ],
        "connect": [
            {"from": {"layer": "a", "slot": "Cout"}, "to": {"layer": "mix", "slot": "A"}},
            {"from": {"layer": "b", "slot": "Cout"}, "to": {"layer": "mix", "slot": "B"}},
        ],
    }
    mat4 = compile_material("mix", spec4)
    assert [lobe.type for lobe in mat4.lobes] == [DIFFUSE, OREN_NAYAR]
    np.testing.assert_allclose(mat4.lobes[0].weight, (0.75, 0.75, 0.75))
    np.testing.assert_allclose(mat4.lobes[1].weight, (0.25, 0.25, 0.25))


SCENE_YAML = """
materials:
  white:
    shaders:
      - name: diffuse_bsdf_node
        layer: d
        type: surface
        parameters:
          - {name: Cs, type: rgb, value: [0.7, 0.7, 0.7]}
  lamp:
    shaders:
      - name: diffuse_emitter_node
        layer: e
        type: surface
        parameters:
          - {name: power, type: float, value: 10.0}
  sky:
    shaders:
      - name: background_node
        layer: b
        type: surface
        parameters:
          - {name: Cs, type: rgb, value: [0.2, 0.3, 0.5]}
data:
  - path: tri.obj
camera:
  position: [0, 0, 3]
  at: [0, 0, 0]
  up: [0, 1, 0]
  width: 16
  height: 16
world:
  environment: sky
"""

TRI_OBJ = """
v -1 -1 0
v 1 -1 0
v 0 1 0
usemtl white
f 1 2 3
"""


def test_import_yaml_scene(tmp_path):
    (tmp_path / "scene.yaml").write_text(SCENE_YAML)
    (tmp_path / "tri.obj").write_text(TRI_OBJ)
    scene = import_scene(str(tmp_path / "scene.yaml"))
    assert len(scene.materials) == 3
    assert len(scene.meshes) == 1
    assert scene.environment is not None
    assert scene.camera.width == 16
    data = scene.build()
    assert data.num_lights == 1  # infinite only (lamp unused by geometry)
    assert data.env_mat == scene.material_id("sky")


def test_cli_end_to_end(tmp_path):
    (tmp_path / "scene.yaml").write_text(SCENE_YAML)
    (tmp_path / "tri.obj").write_text(TRI_OBJ)
    out = str(tmp_path / "out.exr")
    png = str(tmp_path / "out.png")
    from phosphorus_mk2_tpu.cli import main

    rc = main(
        [
            str(tmp_path / "scene.yaml"),
            "-o", out, "--png", png,
            "-s", "2", "-d", "2", "--spp-per-pass", "2", "--no-bvh", "-v",
        ]
    )
    assert rc == 0
    assert os.path.exists(out)
    assert os.path.exists(png)
    img = read_exr(out)
    assert np.isfinite(img["R"]).all()
    # background pixels show the sky color
    assert abs(float(img["B"][0, 0]) - 0.5) < 1e-4


def test_npz_scene_data(tmp_path):
    """npz mesh bundles load through the YAML data: list."""
    verts = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    np.savez(
        tmp_path / "mesh.npz",
        n_meshes=1,
        vertices=verts,
        faces=faces,
        material="white",
        smooth=False,
    )
    (tmp_path / "scene.yaml").write_text(SCENE_YAML.replace("tri.obj", "mesh.npz"))
    scene = import_scene(str(tmp_path / "scene.yaml"))
    assert len(scene.meshes) == 1
    np.testing.assert_array_equal(scene.meshes[0].vertices, verts)


def test_cli_builtin_scene(tmp_path):
    from phosphorus_mk2_tpu.cli import main

    out = str(tmp_path / "b.exr")
    rc = main(
        ["builtin:sphere_in_box", "-o", out, "-s", "1", "-d", "1",
         "--width", "16", "--height", "16", "--no-bvh"]
    )
    assert rc == 0 and os.path.exists(out)


def test_alembic_missing_file_error():
    # .abc import is native (io/ogawa.py) — no binding gate anymore; a
    # missing archive surfaces as the OS error, not an ImportError
    import pytest

    from phosphorus_mk2_tpu.core.scene import Scene
    from phosphorus_mk2_tpu.io.alembic import import_alembic

    with pytest.raises(FileNotFoundError):
        import_alembic("/nonexistent.abc", Scene())


def test_color_ramp_node():
    # reference src/shaders/color_ramp.h rgb_ramp_lut semantics
    spec = {
        "shaders": [
            {
                "name": "color_ramp_node",
                "layer": "ramp",
                "parameters": [
                    {"name": "ramp", "type": "rgb[]",
                     "value": [[0, 0, 0], [1, 0, 0], [1, 1, 1]]},
                    {"name": "at", "type": "float", "value": 0.25},
                ],
            },
            {"name": "diffuse_bsdf_node", "layer": "d"},
        ],
        "connect": [
            {"from": {"layer": "ramp", "slot": "Cout"},
             "to": {"layer": "d", "slot": "Cs"}}
        ],
    }
    mat = compile_material("r", spec)
    # at=0.25 over 3 entries: f=0.5 -> lerp(lut[0], lut[1], 0.5)
    np.testing.assert_allclose(mat.lobes[0].weight, (0.5, 0.0, 0.0))

    # interpolate=0 -> nearest-below entry
    spec["shaders"][0]["parameters"].append(
        {"name": "interpolate", "type": "int", "value": 0}
    )
    mat2 = compile_material("r2", spec)
    np.testing.assert_allclose(mat2.lobes[0].weight, (0.0, 0.0, 0.0))

    # out-of-range clamps (the reference extrapolate path is dead code)
    spec["shaders"][0]["parameters"] = [
        {"name": "ramp", "type": "rgb[]",
         "value": [[0, 0, 0], [1, 0, 0], [1, 1, 1]]},
        {"name": "at", "type": "float", "value": 2.0},
    ]
    mat3 = compile_material("r3", spec)
    np.testing.assert_allclose(mat3.lobes[0].weight, (1.0, 1.0, 1.0))


def test_ply_loader_ascii_and_binary(tmp_path):
    """PLY (ascii + both binary endiannesses) loads the same mesh; polygon
    faces fan-triangulate like the OBJ loader."""
    import numpy as np

    from phosphorus_mk2_tpu.io.ply import load_ply

    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0.5, 0.5, 1]],
        np.float32,
    )
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (5, 1))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5]], np.float32)
    polys = [[0, 1, 2, 3], [0, 1, 4]]  # quad + tri -> 3 tris

    ascii_ply = tmp_path / "m.ply"
    with open(ascii_ply, "w") as f:
        f.write("ply\nformat ascii 1.0\ncomment test\n")
        f.write("element vertex 5\n")
        for p in ("x", "y", "z", "nx", "ny", "nz", "s", "t"):
            f.write(f"property float {p}\n")
        f.write("element face 2\n")
        f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        for i in range(5):
            row = list(verts[i]) + list(normals[i]) + list(uvs[i])
            f.write(" ".join(str(float(x)) for x in row) + "\n")
        for poly in polys:
            f.write(f"{len(poly)} " + " ".join(map(str, poly)) + "\n")
    (m,) = load_ply(str(ascii_ply))
    assert m.faces.shape == (3, 3)
    np.testing.assert_allclose(m.vertices, verts)
    np.testing.assert_allclose(m.normals, normals)
    np.testing.assert_allclose(m.uvs, uvs)
    np.testing.assert_array_equal(
        m.faces, [[0, 1, 2], [0, 2, 3], [0, 1, 4]]
    )

    for tag, bo in (("binary_little_endian", "<"), ("binary_big_endian", ">")):
        bin_ply = tmp_path / f"m_{tag}.ply"
        with open(bin_ply, "wb") as f:
            hdr = (
                f"ply\nformat {tag} 1.0\nelement vertex 5\n"
                + "".join(
                    f"property float {p}\n"
                    for p in ("x", "y", "z", "nx", "ny", "nz", "s", "t")
                )
                + "element face 2\nproperty list uchar int vertex_indices\n"
                + "end_header\n"
            )
            f.write(hdr.encode())
            rows = np.concatenate([verts, normals, uvs], axis=1).astype(bo + "f4")
            f.write(rows.tobytes())
            for poly in polys:
                f.write(np.uint8(len(poly)).tobytes())
                f.write(np.asarray(poly, bo + "i4").tobytes())
        (mb,) = load_ply(str(bin_ply))
        np.testing.assert_allclose(mb.vertices, m.vertices, err_msg=tag)
        np.testing.assert_array_equal(mb.faces, m.faces, err_msg=tag)
        np.testing.assert_allclose(mb.uvs, m.uvs, err_msg=tag)


def test_ply_renders_through_yaml_dispatch(tmp_path):
    """A .ply data file renders through the scene pipeline end-to-end."""
    import numpy as np

    from phosphorus_mk2_tpu.core.scene import Scene
    from phosphorus_mk2_tpu.io.yaml_scene import import_scene_data

    ply = tmp_path / "tri.ply"
    with open(ply, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\nproperty list uchar int vertex_indices\n"
            "end_header\n"
            "-1 -1 -2\n1 -1 -2\n0 1 -2\n3 0 1 2\n"
        )
    scene = Scene()
    import_scene_data(str(ply), scene)
    assert len(scene.meshes) == 1
    assert scene.meshes[0].faces.shape == (1, 3)


def test_custom_shader_node_escape_hatch():
    """Open schema: registered Python nodes extend the node vocabulary
    the way the reference's OSL searchpath does (material.cpp:117-181).
    A custom node bakes a jnp uv-function into a scene texture feeding
    a diffuse BSDF; a second returns a custom closure directly."""
    import jax.numpy as jnp

    from phosphorus_mk2_tpu.core.material import DIFFUSE, Lobe
    from phosphorus_mk2_tpu.io.yaml_scene import (
        _CUSTOM_NODES,
        register_shader_node,
    )

    added = {}

    def fake_loader(img):
        added["img"] = np.asarray(img)
        return 7

    @register_shader_node("stripes_texture_node")
    def stripes(p, ctx):
        freq = float(p.get("frequency", 4.0))

        def f(uv):
            s = 0.5 + 0.5 * jnp.sin(uv[:, :1] * 2 * jnp.pi * freq)
            return jnp.concatenate([s, s * 0.2, 1.0 - s], axis=1)

        return ctx.texture_ref(ctx.bake(f, res=16))

    @register_shader_node("half_mirror_node")
    def half_mirror(p, ctx):
        return ctx.closure(
            [Lobe(DIFFUSE, (0.4, 0.4, 0.4), (), -1)], emission=(0, 0, 0)
        )

    try:
        spec = {
            "shaders": [
                {"name": "stripes_texture_node", "layer": "t",
                 "parameters": [
                     {"name": "frequency", "type": "float", "value": 8.0}]},
                {"name": "diffuse_bsdf_node", "layer": "d"},
                {"name": "material_node", "layer": "root"},
            ],
            "connect": [
                {"from": {"layer": "t", "slot": "Cout"},
                 "to": {"layer": "d", "slot": "Cs"}},
                {"from": {"layer": "d", "slot": "Cout"},
                 "to": {"layer": "root", "slot": "Cs"}},
            ],
        }
        mat = compile_material("m", spec, fake_loader)
        assert mat.lobes[0].type == DIFFUSE
        assert mat.lobes[0].texture == 7          # baked texture attached
        assert added["img"].shape == (16, 16, 3)  # bake really evaluated
        assert added["img"].min() >= 0 and added["img"].max() <= 1.0

        spec2 = {
            "shaders": [
                {"name": "half_mirror_node", "layer": "c"},
                {"name": "material_node", "layer": "root"},
            ],
            "connect": [
                {"from": {"layer": "c", "slot": "Cout"},
                 "to": {"layer": "root", "slot": "Cs"}},
            ],
        }
        mat2 = compile_material("m2", spec2)
        assert len(mat2.lobes) == 1
        np.testing.assert_allclose(mat2.lobes[0].weight, (0.4, 0.4, 0.4))
    finally:
        _CUSTOM_NODES.pop("stripes_texture_node", None)
        _CUSTOM_NODES.pop("half_mirror_node", None)


def test_unknown_node_error_mentions_registry():
    import pytest

    with pytest.raises(ValueError, match="register_shader_node"):
        compile_material(
            "m",
            {"shaders": [{"name": "no_such_node", "layer": "x"},
                         {"name": "material_node", "layer": "root"}],
             "connect": [{"from": {"layer": "x", "slot": "Cout"},
                          "to": {"layer": "root", "slot": "Cs"}}]},
        )
