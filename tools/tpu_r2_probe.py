"""Round-2 TPU probe batch: re-measure the numbers the round-2 plan
hangs on, in ONE session (the chip is single-client; compiles may be
remote/slow — batch everything).

  1. current bench configuration (re-baseline after round-1 commits)
  2. per-kernel launch floor (null scan body) — is 0.78 ms still true?
  3. fwd+bwd throughput through render_pass (bench will report this)
  4. spp_batch re-sweep with the current pipeline (round-1 said slower)
  5. textured-cornell throughput (per-lane gather poison check)

    python tools/tpu_r2_probe.py 2>&1 | tee /tmp/tpu_r2_probe.log
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
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
            render_pass,
            width=W,
            height=H,
            max_depth=DEPTH,
            tracer=tracer,
            **kw,
        ),
        static_argnames=("n_samples",),
    )
    key = jax.random.key(0)
    t0 = time.time()
    out = fn(data, cam, key, 0, SPP)
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        out = fn(data, cam, key, SPP, SPP)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    rays = W * H * SPP * DEPTH * 2
    print(
        f"[{tag}] {rays / best / 1e6:8.2f} Mrays/s  "
        f"({best * 1e3:.1f} ms run, {t_compile:.1f} s compile)",
        flush=True,
    )
    return rays / best


def launch_floor():
    """Null scan body cost per iteration."""
    K = 64

    def body(c, _):
        return c + 1.0, None

    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=K)[0])
    r = f(jnp.float32(0))
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f(jnp.float32(0)))
        best = min(best, time.time() - t0)
    print(f"[launch-floor] null scan: {best / K * 1e3:.3f} ms/iter", flush=True)

    # and: one trivial standalone kernel dispatch (jit'd add)
    g = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    jax.block_until_ready(g(x))
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(g(x))
        best = min(best, time.time() - t0)
    print(f"[launch-floor] single jit dispatch: {best * 1e3:.3f} ms", flush=True)


def fwd_bwd():
    scene = cornell_box(width=W, height=H)
    data = scene.build()
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)

    params = {
        "emission": data.emission,
        "lobe_weight": data.lobe_weight,
        "vertices": data.vertices,
    }

    def loss(params, data):
        import dataclasses

        d2 = dataclasses.replace(data, **params)
        out = render_pass(
            d2,
            cam,
            jax.random.key(0),
            0,
            SPP,
            width=W,
            height=H,
            max_depth=DEPTH,
            tracer=tracer,
            depth_unroll=DEPTH,
            sample_unroll=4,
        )
        return out["color"].sum()

    g = jax.jit(jax.grad(loss))
    t0 = time.time()
    r = g(params, data)
    jax.block_until_ready(r)
    t_compile = time.time() - t0
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(g(params, data))
        best = min(best, time.time() - t0)
    rays = W * H * SPP * DEPTH * 2
    print(
        f"[fwd+bwd] {rays / best / 1e6:8.2f} Mrays/s  "
        f"({best * 1e3:.1f} ms, compile {t_compile:.1f} s)",
        flush=True,
    )


def textured():
    from phosphorus_mk2_tpu.core.texture import Texture

    scene = cornell_box(width=W, height=H)
    rng_np = np.random.default_rng(0)
    img = rng_np.random((256, 256, 3), dtype=np.float32)
    tid = scene.add_texture(Texture(image=img))
    # texture the floor material's first lobe
    for m in scene.materials:
        if m.lobes:
            m.lobes[0].texture = tid
    bench_config("textured", scene, depth_unroll=DEPTH, sample_unroll=4)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    launch_floor()
    scene = cornell_box(width=W, height=H)
    bench_config("bench-r1-config", scene, depth_unroll=DEPTH, sample_unroll=4)
    bench_config("no-unroll", cornell_box(width=W, height=H))
    for sb in (4, 16):
        bench_config(
            f"spp_batch={sb}",
            cornell_box(width=W, height=H),
            depth_unroll=DEPTH,
            spp_batch=sb,
        )
    fwd_bwd()
    textured()


if __name__ == "__main__":
    main()
