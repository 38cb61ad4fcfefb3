"""Round-3 TPU batch I: mip-filtering cost on the textured bench.

Same textured Cornell as round-2 batch B (22.4 -> 35.5 Mrays/s with the
single stacked bilinear gather). Measures the trilinear-mip path
(8-texel stacked gather + level math) vs the level-0 slice (round-2
behavior) — VERDICT item 5 wants <= 1.3x cost.

    python tools/tpu_r3i_tex.py 2>&1 | tee /tmp/tpu_r3i.log
"""
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from phosphorus_mk2_tpu.core.camera import camera_to_params
from phosphorus_mk2_tpu.core.texture import Texture
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
from phosphorus_mk2_tpu.scenes import cornell_box

W = H = 256
SPP = 16
DEPTH = 4


def timed(f, reps=3):
    out = jax.block_until_ready(f())
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(f())
        best = min(best, time.time() - t0)
    return best, out


def main():
    print(f"devices: {jax.devices()}", flush=True)
    scene = cornell_box(width=W, height=H)
    rng_np = np.random.default_rng(0)
    img = rng_np.random((256, 256, 3), dtype=np.float32)
    tid = scene.add_texture(Texture(image=img))
    for m in scene.materials:
        if m.lobes:
            m.lobes[0].texture = tid
    data = scene.build()
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    rays = W * H * SPP * DEPTH * 2

    variants = {
        "mip_trilinear": data,
        "level0_bilinear": dataclasses.replace(
            data, tex_info=data.tex_info[:, :1]
        ),
    }
    for name, d in variants.items():
        fn = jax.jit(functools.partial(
            render_pass, width=W, height=H, max_depth=DEPTH,
            tracer=tracer, depth_unroll=DEPTH, sample_unroll=4),
            static_argnames=("n_samples",))
        b, out = timed(lambda: fn(d, cam, jax.random.key(0), 0, SPP))
        mean = float(np.asarray(out["color"]).mean()) / SPP
        print(json.dumps({
            "variant": name, "ms": round(b * 1e3, 1),
            "mrays": round(rays / b / 1e6, 2), "mean": round(mean, 5),
        }), flush=True)


if __name__ == "__main__":
    main()
