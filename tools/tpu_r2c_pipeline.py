"""Round-2 TPU batch C: pipelined NEE (merged shadow+closest trace).

  1. bench config, pipeline_shadow on vs off (A/B)
  2. fwd+bwd with pipeline
  3. sample_unroll sweep now that bounce bodies are cheaper
  4. bench.py end-to-end (the driver's view)

    python tools/tpu_r2c_pipeline.py 2>&1 | tee /tmp/tpu_r2c.log
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from phosphorus_mk2_tpu.core.camera import camera_to_params
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
from phosphorus_mk2_tpu.scenes import cornell_box

W = H = 256
SPP = 16
DEPTH = 4


def bench_config(tag, scene, **kw):
    data = scene.build()
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    fn = jax.jit(
        functools.partial(
            render_pass, width=W, height=H, max_depth=DEPTH, tracer=tracer, **kw
        ),
        static_argnames=("n_samples",),
    )
    key = jax.random.key(0)
    t0 = time.time()
    out = fn(data, cam, key, 0, SPP)
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = fn(data, cam, key, SPP, SPP)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    rays = W * H * SPP * DEPTH * 2
    print(
        f"[{tag}] {rays / best / 1e6:8.2f} Mrays/s  "
        f"({best * 1e3:.1f} ms run, {t_compile:.1f} s compile) "
        f"mean={float(np.asarray(out['color']).mean()) / SPP:.4f}",
        flush=True,
    )
    return rays / best


def main():
    print(f"devices: {jax.devices()}", flush=True)
    bench_config(
        "pipe-on", cornell_box(width=W, height=H),
        depth_unroll=DEPTH, sample_unroll=4,
    )
    bench_config(
        "pipe-off", cornell_box(width=W, height=H),
        depth_unroll=DEPTH, sample_unroll=4, pipeline_shadow=False,
    )
    for su in (8, 16):
        bench_config(
            f"pipe-on su={su}", cornell_box(width=W, height=H),
            depth_unroll=DEPTH, sample_unroll=su,
        )
    # NOTE: bench.py must run as its own process AFTER this one exits —
    # the TPU is single-client and a subprocess would deadlock.


if __name__ == "__main__":
    main()
