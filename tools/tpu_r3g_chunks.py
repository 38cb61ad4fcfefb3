"""Round-3 TPU batch G: chunk-size sweep + fallback batch + renders.

    python tools/tpu_r3g_chunks.py 2>&1 | tee /tmp/tpu_r3g.log
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

import bmw_asset
from phosphorus_mk2_tpu.accel import cluster_traverse as ct
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass

N = 1 << 17
ABC = "/tmp/bmw_class.abc"


def timed(f, *a, reps=3):
    out = jax.block_until_ready(f(*a))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(f(*a))
        best = min(best, time.time() - t0)
    return best, out


def J(**kw):
    print(json.dumps(kw), flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    scene = bmw_asset.load_scene(ABC, 512, 512)
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % 512, (ids // 512) % 512
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)

    for tune in ({"front_k": 32, "chunk": 2048},
                 {"front_k": 32, "chunk": 1024},
                 {"front_k": 32, "chunk": 4096, "fb_cc": 256},
                 {"front_k": 32, "chunk": 2048, "fb_cc": 256}):
        fn = jax.jit(lambda p, d, tune=tune:
                     ct.intersect_clusters(data, p, d, **tune))
        try:
            b, out = timed(fn, p, d)
            J(trace=str(tune), ms=round(b * 1e3, 1),
              hits=int(np.asarray(out["hit"]).sum()))
        except Exception as e:
            J(trace=str(tune), error=repr(e)[:200])

    # C=64 clusters variant (halved rows; CPU overlap sweep justifies)
    try:
        data64 = attach_bvh(scene.build(), cluster_tris=64)
        fn = jax.jit(lambda p, d: ct.intersect_clusters(
            data64, p, d, front_k=48, chunk=4096))
        b, out = timed(fn, p, d)
        J(trace="C64_fk48_chunk4096", ms=round(b * 1e3, 1),
          hits=int(np.asarray(out["hit"]).sum()))
    except Exception as e:
        J(trace="C64", error=repr(e)[:200])

    RES, SPP, DEPTH = 512, 4, 4
    rays = RES * RES * SPP * DEPTH * 2
    for name, tune in [
        ("render_fk32_ch4096", {"front_k": 32, "chunk": 4096}),
        ("render_fk32_ch2048_fb256",
         {"front_k": 32, "chunk": 2048, "fb_cc": 256}),
    ]:
        tracer = make_tracer(data, use_bvh=True, tracer_tune=tune)
        fn = jax.jit(functools.partial(
            render_pass, width=RES, height=RES, max_depth=DEPTH,
            tracer=tracer, depth_unroll=1),
            static_argnames=("n_samples",))
        try:
            b, out = timed(lambda: fn(data, cam, jax.random.key(0), 0, SPP))
            mean = float(np.asarray(out["color"]).mean()) / SPP
            J(render=name, ms=round(b * 1e3, 1),
              mrays=round(rays / b / 1e6, 3), mean=round(mean, 5))
        except Exception as e:
            J(render=name, error=repr(e)[:250])


if __name__ == "__main__":
    main()
