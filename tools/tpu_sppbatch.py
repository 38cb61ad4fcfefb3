"""TPU probe: does batching spp into the wavefront speed up the bench?

Cornell 256^2, spp 16, depth 4, brute tracer (the bench.py config).
spp_batch tiles the pixel axis so each scan step traces sb*65k rays —
the 65k-ray wavefront may under-fill the chip.

Run standalone on the real chip (single-client!):
    python tools/tpu_sppbatch.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import numpy as np

from phosphorus_mk2_tpu.core.camera import camera_to_params
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
from phosphorus_mk2_tpu.scenes import cornell_box

W = H = 256
SPP = 16
DEPTH = 4


def main():
    print("devices:", jax.devices())
    scene = cornell_box(width=W, height=H)
    data = scene.build()
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    key = jax.random.key(0)

    results = {}
    for sb in (1, 4, 16):
        fn = jax.jit(
            functools.partial(
                render_pass,
                width=W,
                height=H,
                max_depth=DEPTH,
                tracer=tracer,
                spp_batch=sb,
            ),
            static_argnames=("n_samples",),
        )
        t0 = time.time()
        out = fn(data, cam, key, 0, SPP)
        jax.block_until_ready(out)
        print(f"sb={sb} compile+run {time.time()-t0:.1f}s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            out = fn(data, cam, key, SPP, SPP)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        rays = W * H * SPP * DEPTH * 2
        results[sb] = rays / best
        print(
            f"sb={sb}: {best*1e3:.1f} ms -> {rays/best/1e6:.1f} Mrays/s",
            flush=True,
        )
        mean = float(np.asarray(out["color"]).mean()) / SPP
        print(f"   mean {mean:.6f}")

    print(json.dumps({str(k): round(v / 1e6, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
