"""Round-4 TPU batch J: anisotropic-filter cost on the textured bench.

Same textured Cornell as tpu_r3i_tex.py (trilinear mip cost 1.25x
unfiltered, round-3). The round-3 verdict (item 6) asks for aniso cost
<= 1.4x of unfiltered in the perf log; the quality side is already
measured (grazing stripe rig: err 0.062 iso -> 0.037 @4 taps -> 0.030
@8, ARCHITECTURE.md). This measures taps=0 (trilinear) vs 4 vs 8.

    python tools/tpu_r4j_aniso_cost.py 2>&1 | tee /tmp/tpu_r4j.log
"""
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

    for taps in (0, 4, 8):
        fn = jax.jit(functools.partial(
            render_pass, width=W, height=H, max_depth=DEPTH,
            tracer=tracer, depth_unroll=DEPTH, sample_unroll=4,
            aniso_taps=taps),
            static_argnames=("n_samples",))
        b, out = timed(lambda: fn(data, cam, jax.random.key(0), 0, SPP))
        mean = float(np.asarray(out["color"]).mean()) / SPP
        print(json.dumps({
            "aniso_taps": taps, "ms": round(b * 1e3, 1),
            "mrays": round(rays / b / 1e6, 2), "mean": round(mean, 5),
        }), flush=True)


if __name__ == "__main__":
    main()
