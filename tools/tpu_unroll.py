"""TPU probe: scan-iteration overhead & unroll wins on the bench config.

The stage split showed a ~0.78 ms floor per scan iteration / kernel on
the axon platform — if that holds, unrolling the sample/depth scans
(fewer, fatter iterations) should dominate any FLOP-level optimization.

    python tools/tpu_unroll.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from phosphorus_mk2_tpu.core.camera import camera_to_params
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
from phosphorus_mk2_tpu.scenes import cornell_box

W = H = 256
SPP = 16
DEPTH = 4


def bench(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    print("devices:", jax.devices())

    # 1. null-scan K scaling: is the floor per iteration?
    for k in (32, 128):
        f = jax.jit(
            functools.partial(
                lambda K: jax.lax.scan(
                    lambda c, _: (c * 1.000001 + 1.0, None),
                    jnp.float32(0),
                    None,
                    length=K,
                )[0],
                k,
            )
        )
        dt = bench(f)
        print(f"null scan K={k}: {dt*1e3:.2f} ms total, {dt/k*1e3:.3f} ms/iter",
              flush=True)

    scene = cornell_box(width=W, height=H)
    data = scene.build()
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    key = jax.random.key(0)
    rays = W * H * SPP * DEPTH * 2

    for du, su, tag in (
        (1, 1, "baseline"),
        (4, 1, "depth unrolled"),
        (1, 4, "samples unrolled x4"),
        (4, 4, "both (4,4)"),
        (4, 16, "full unroll"),
    ):
        fn = jax.jit(
            functools.partial(
                render_pass,
                width=W,
                height=H,
                max_depth=DEPTH,
                tracer=tracer,
                depth_unroll=du,
                sample_unroll=su,
            ),
            static_argnames=("n_samples",),
        )
        t0 = time.time()
        out = fn(data, cam, key, 0, SPP)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        dt = bench(fn, data, cam, key, SPP, SPP)
        print(
            f"{tag:24s} (du={du},su={su}): {dt*1e3:7.1f} ms "
            f"-> {rays/dt/1e6:6.1f} Mrays/s   (compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
