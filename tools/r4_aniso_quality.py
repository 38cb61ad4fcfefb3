"""CPU probe: grazing-stripe error vs taps (round-3 verdict item 6).

Same rig as tests/test_texture.py::test_aniso_render_beats_isotropic_at
_grazing (emission-textured ground plane, grazing camera, analytic 8x8
subpixel bilinear reference), swept over aniso_taps. Pairs with the
tpu_r4j cost probe: taps=4 measured 2.05x the trilinear render cost
(over the 1.4x budget), taps=2 predicted ~1.35x — this reports what
aspect-2 anisotropy buys in error.

    python tools/r4_aniso_quality.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from phosphorus_mk2_tpu.core.camera import (  # noqa: E402
    Camera, camera_to_params, generate_rays,
)
from phosphorus_mk2_tpu.core.material import Material  # noqa: E402
from phosphorus_mk2_tpu.core.mesh import Mesh  # noqa: E402
from phosphorus_mk2_tpu.core.options import Options  # noqa: E402
from phosphorus_mk2_tpu.core.scene import Scene  # noqa: E402
from phosphorus_mk2_tpu.core.texture import Texture  # noqa: E402
from phosphorus_mk2_tpu.integrator.path import render_aovs  # noqa: E402


def main():
    res = 48
    scene = Scene()
    size = 128
    img = np.zeros((size, size, 3), np.float32)
    x = np.arange(size)
    img[:, (x // 8) % 2 == 0] = 1.0
    stripe = scene.add_texture(Texture(img))
    mat = Material.emitter((1.0, 1.0, 1.0), power=float(np.pi), name="ground")
    mat.emission_texture = stripe
    mid = scene.add_material(mat)
    ext, ext_uv = 40.0, 20.0
    verts = np.array(
        [[-ext, 0, -ext], [ext, 0, -ext], [ext, 0, ext], [-ext, 0, ext]],
        np.float32,
    )
    uvs = np.array(
        [[0, 0], [ext_uv, 0], [ext_uv, ext_uv], [0, ext_uv]], np.float32
    )
    scene.add_mesh(Mesh(
        vertices=verts, faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        uvs=uvs, material=mid, smooth=False,
    ))
    scene.camera = Camera.look_at(
        (0.0, 0.4, 6.0), (0.0, 0.0, -10.0), width=res, height=res
    )
    data = scene.build()

    # analytic reference (see the test for the derivation)
    K = 8
    cam = camera_to_params(scene.camera)
    ys, xs = np.mgrid[0:res, 0:res]
    px = jnp.asarray(np.repeat(xs.ravel(), K * K).astype(np.int32))
    py = jnp.asarray(np.repeat(ys.ravel(), K * K).astype(np.int32))
    sub = (np.mgrid[0:K, 0:K].reshape(2, -1).T + 0.5) / K
    uvj = jnp.asarray(np.tile(sub, (res * res, 1)).astype(np.float32))
    p, d = generate_rays(cam, px, py, uvj, jnp.full_like(uvj, 0.5))
    p, d = np.asarray(p), np.asarray(d)
    t = -p[:, 1] / d[:, 1]
    hitp = p + d * t[:, None]
    valid = (t > 0) & (np.abs(hitp[:, 0]) <= ext) & (np.abs(hitp[:, 2]) <= ext)
    uu = (hitp[:, 0] + ext) / (2 * ext) * ext_uv
    vv = (hitp[:, 2] + ext) / (2 * ext) * ext_uv
    fu = (uu % 1.0) * size - 0.5
    fv = (1.0 - (vv % 1.0)) * size - 0.5
    i0 = np.floor(fu).astype(int)
    j0 = np.floor(fv).astype(int)
    tx, ty = fu - i0, fv - j0

    def at(i, j):
        return img[(j % size), (i % size), 0]

    val = (at(i0, j0) * (1 - tx) * (1 - ty) + at(i0 + 1, j0) * tx * (1 - ty)
           + at(i0, j0 + 1) * (1 - tx) * ty + at(i0 + 1, j0 + 1) * tx * ty)
    val = np.where(valid, val, 0.0)
    ref = val.reshape(res * res, K * K).mean(1).reshape(res, res)
    lo = res // 2

    for taps in (0, 2, 4, 8):
        opts = Options(use_bvh=False, samples_per_pass=4, aniso_taps=taps,
                       seed=3)
        out = np.asarray(render_aovs(
            data, scene.camera, spp=4, max_depth=1, options=opts)["color"])
        err = float(np.abs(out[lo:, :, 0] - ref[lo:]).mean())
        print(json.dumps({"taps": taps, "err": round(err, 4)}), flush=True)


if __name__ == "__main__":
    main()
