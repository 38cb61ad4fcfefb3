"""Round-2 TPU batch E: backward-pass tuning + CLI parity + regressions.

  1. fwd+bwd with remat on/off (baseline 27.1 Mrays/s off)
  2. CLI end-to-end throughput (VERDICT #2: within ~10% of bench config)
  3. textured bench with the single-gather hit rows (was 35.5)
  4. 1M-tri terrain closest-hit trace (regression check vs 113-117 ms)

    python tools/tpu_r2e.py 2>&1 | tee /tmp/tpu_r2e.log
"""
import dataclasses
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
RAYS = W * H * SPP * DEPTH * 2


def fwd_bwd(tag, **kw):
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
        d2 = dataclasses.replace(data, **params)
        out = render_pass(
            d2, cam, jax.random.key(0), 0, SPP,
            width=W, height=H, max_depth=DEPTH, tracer=tracer,
            depth_unroll=DEPTH, sample_unroll=4, **kw,
        )
        return out["color"].sum()

    g = jax.jit(jax.grad(loss))
    t0 = time.time()
    jax.block_until_ready(g(params, data))
    t_c = time.time() - t0
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(g(params, data))
        best = min(best, time.time() - t0)
    print(f"[fwd+bwd {tag}] {RAYS / best / 1e6:8.2f} Mrays/s "
          f"({best * 1e3:.1f} ms, compile {t_c:.1f} s)", flush=True)


def cli_throughput():
    """End-to-end CLI render on the chip (production path)."""
    import tempfile

    from phosphorus_mk2_tpu import cli

    out = os.path.join(tempfile.mkdtemp(), "cli.exr")
    t0 = time.time()
    rc = cli.main([
        "builtin:cornell_box", "-o", out, "-s", str(SPP), "-d", str(DEPTH),
        "--width", str(W), "--height", str(H), "--no-bvh",
    ])
    dt = time.time() - t0
    print(f"[cli e2e] rc={rc} {dt:.1f} s incl compile "
          f"({RAYS / dt / 1e6:.2f} Mrays/s incl compile)", flush=True)
    # second run reuses the jit cache -> the steady-state number
    t0 = time.time()
    rc = cli.main([
        "builtin:cornell_box", "-o", out, "-s", str(SPP), "-d", str(DEPTH),
        "--width", str(W), "--height", str(H), "--no-bvh",
    ])
    dt = time.time() - t0
    print(f"[cli e2e warm] rc={rc} {dt:.1f} s ({RAYS / dt / 1e6:.2f} Mrays/s)",
          flush=True)


def textured():
    from phosphorus_mk2_tpu.core.texture import Texture

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
    fn = jax.jit(
        functools.partial(
            render_pass, width=W, height=H, max_depth=DEPTH, tracer=tracer,
            depth_unroll=DEPTH, sample_unroll=4,
        ),
        static_argnames=("n_samples",),
    )
    key = jax.random.key(0)
    t0 = time.time()
    jax.block_until_ready(fn(data, cam, key, 0, SPP))
    t_c = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fn(data, cam, key, SPP, SPP))
        best = min(best, time.time() - t0)
    print(f"[textured] {RAYS / best / 1e6:8.2f} Mrays/s ({best*1e3:.1f} ms, "
          f"compile {t_c:.1f} s)", flush=True)


def terrain_trace():
    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.accel.cluster_traverse import intersect_clusters
    from phosphorus_mk2_tpu.accel.native_bvh import build_bvh_native
    from phosphorus_mk2_tpu.scenes import terrain_scene

    scene = terrain_scene(grid=710, width=256, height=256)
    data = scene.build()
    print(f"[terrain] {data.faces.shape[0]} tris", flush=True)
    bvh = build_bvh_native(np.asarray(data.vertices), np.asarray(data.faces))
    data = attach_bvh(data, bvh)
    cam = camera_to_params(scene.camera)
    from phosphorus_mk2_tpu.core.camera import generate_rays
    import jax.numpy as jnp

    n = 65536
    ids = jnp.arange(n, dtype=jnp.int32)
    px, py = ids % 256, ids // 256
    u = jnp.full((n, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)
    f = jax.jit(lambda p, d: intersect_clusters(data, p, d))
    jax.block_until_ready(f(p, d))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f(p, d))
        best = min(best, time.time() - t0)
    print(f"[terrain] 1M-tri closest trace {best*1e3:.1f} ms / 65k rays",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    fwd_bwd("remat=off")
    fwd_bwd("remat=on", remat=True)
    cli_throughput()
    textured()
    terrain_trace()


if __name__ == "__main__":
    main()
