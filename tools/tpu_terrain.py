"""1M-triangle terrain trace + render benchmark on TPU (hierarchical
cluster tracer — the BMW-scale configuration)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print(jax.devices(), flush=True)
    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.accel.cluster_traverse import intersect_clusters
    from phosphorus_mk2_tpu.accel.native_bvh import build_bvh_native
    from phosphorus_mk2_tpu.core.camera import camera_to_params
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
    from phosphorus_mk2_tpu.scenes import terrain_scene

    t0 = time.time()
    scene = terrain_scene(grid=707, width=256, height=256)
    data = scene.build()
    print(f"scene: {data.faces.shape[0]} tris ({time.time()-t0:.1f}s)", flush=True)
    t0 = time.time()
    bvh = build_bvh_native(np.asarray(data.vertices), np.asarray(data.faces))
    data = attach_bvh(data, bvh)
    K = data.bvh["cluster_bmin"].shape[0]
    print(f"bvh: {bvh['node_child'].shape[0]} nodes, K={K} clusters, "
          f"K2={data.bvh['sc_bmin'].shape[0]} ({time.time()-t0:.1f}s)", flush=True)

    N = 65536
    key = jax.random.key(0)
    ij = jnp.stack(
        jnp.meshgrid(jnp.linspace(-0.5, 0.5, 256), jnp.linspace(-0.5, 0.5, 256)), -1
    ).reshape(-1, 2)
    p = jnp.tile(jnp.array([[0.0, 1.2, 4.5]]), (N, 1))
    d = jnp.concatenate([ij, jnp.full((N, 1), -1.0)], axis=1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    f = jax.jit(lambda p, d: intersect_clusters(data, p, d))
    out = f(p, d)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = f(p, d)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 5
    print(f"trace 1M tris: {dt*1e3:.1f} ms | {N/dt/1e6:.2f} Mray/s | "
          f"hit frac {float(out['hit'].mean()):.2f}", flush=True)

    # one full render sample (trace+NEE-less env lighting+shading)
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=True)
    import functools

    fr = jax.jit(
        functools.partial(
            render_pass, width=256, height=256, max_depth=3, tracer=tracer
        ),
        static_argnames=("n_samples",),
    )
    out = fr(data, cam, key, 0, 2)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fr(data, cam, key, 2, 2)
    jax.block_until_ready(out)
    dt = time.time() - t0
    rays = 256 * 256 * 2 * 3 * 2
    print(f"render 2spp depth3: {dt*1e3:.1f} ms | {rays/dt/1e6:.2f} Mray/s nominal",
          flush=True)
    img = np.asarray(out["color"]) / 2
    from phosphorus_mk2_tpu.io.exr import write_png

    write_png(os.path.join(os.path.dirname(__file__), "..", "examples",
                           "renders", "terrain_preview.png"), img.reshape(256, 256, 3))
    print("mean", img.mean(), flush=True)


if __name__ == "__main__":
    main()
