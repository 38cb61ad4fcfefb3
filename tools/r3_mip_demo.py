"""Mip-filtering aliasing comparison (VERDICT round-2 item 5).

Renders a floor of fine checkerboard receding to the horizon — the
classic minification-aliasing scene — with the mip chain on vs off
(level-0 slice), and writes a side-by-side PNG. CPU-forced.

    python tools/r3_mip_demo.py   # -> examples/renders/mip_compare.png
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from phosphorus_mk2_tpu.core.camera import Camera  # noqa: E402
from phosphorus_mk2_tpu.core.material import Material  # noqa: E402
from phosphorus_mk2_tpu.core.mesh import Mesh  # noqa: E402
from phosphorus_mk2_tpu.core.options import Options  # noqa: E402
from phosphorus_mk2_tpu.core.scene import Scene  # noqa: E402
from phosphorus_mk2_tpu.core.texture import checkerboard  # noqa: E402
from phosphorus_mk2_tpu.integrator.path import render_aovs  # noqa: E402

RES = 256
SPP = 16


def build():
    scene = Scene()
    checker = scene.add_texture(
        checkerboard(n=64, size=256, a=(0.9, 0.9, 0.9), b=(0.1, 0.1, 0.1))
    )
    mat = Material.diffuse((1.0, 1.0, 1.0), name="floor")
    mat.lobes[0].texture = checker
    mid = scene.add_material(mat)
    scene.set_environment(Material.background((0.9, 0.95, 1.0), name="sky"))
    S = 200.0
    verts = np.array(
        [[-S, 0, -S], [S, 0, -S], [S, 0, S], [-S, 0, S]], np.float32
    )
    uvs = np.array([[0, 0], [S, 0], [S, S], [0, S]], np.float32)  # tile
    scene.add_mesh(
        Mesh(vertices=verts, faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
             uvs=uvs, material=mid, smooth=False, name="floor")
    )
    scene.camera = Camera.look_at(
        (0.0, 1.0, 8.0), (0.0, 0.6, 0.0), width=RES, height=RES
    )
    return scene


def main():
    scene = build()
    data = scene.build()
    opts = Options(use_bvh=False, samples_per_pass=SPP)
    img_f = np.asarray(
        render_aovs(data, scene.camera, spp=SPP, max_depth=2, options=opts)["color"]
    )
    data0 = dataclasses.replace(data, tex_info=data.tex_info[:, :1])
    img_u = np.asarray(
        render_aovs(data0, scene.camera, spp=SPP, max_depth=2, options=opts)["color"]
    )

    def g(im):
        return float(np.abs(np.diff(im, axis=0)).sum()
                     + np.abs(np.diff(im, axis=1)).sum())

    print(f"gradient energy: unfiltered {g(img_u):.1f} "
          f"filtered {g(img_f):.1f} ({g(img_f)/g(img_u):.2f}x)")

    side = np.concatenate([img_u, np.ones((RES, 4, 3)), img_f], axis=1)
    out = (np.clip(side, 0, 1) ** (1 / 2.2) * 255).astype(np.uint8)
    from PIL import Image

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "examples", "renders", "mip_compare.png")
    Image.fromarray(out).save(path)
    print("wrote", path, "(left: unfiltered level-0, right: mip-filtered)")


if __name__ == "__main__":
    main()
