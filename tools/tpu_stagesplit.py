"""TPU probe: per-stage time split of one integrator bounce.

Cornell 256^2 (the bench config): times each pipeline stage at the 65k
wavefront in its own scan-of-K jit (amortizes dispatch; fusion differs
from the real pipeline, so treat as a rough split).

    python tools/tpu_stagesplit.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.accel.intersect import reintersect
from phosphorus_mk2_tpu.bsdf.bsdf import (
    bsdf_f,
    bsdf_sample,
    emission_at,
    gather_lobes,
)
from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays
from phosphorus_mk2_tpu.core.lights import sample_lights
from phosphorus_mk2_tpu.core.shading import shading_parameters
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
from phosphorus_mk2_tpu.math import rng
from phosphorus_mk2_tpu.scenes import cornell_box

W = H = 256
N = W * H
K = 32  # scan iterations per timing


def timed(name, fn, *args):
    def body(c, _):
        out = fn(*args)
        leaves = [
            x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "dtype") and hasattr(x, "shape")
        ]
        bump = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        return c + bump.astype(jnp.float32), None

    f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), None, length=K)[0])
    r = f()
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f())
        best = min(best, time.time() - t0)
    print(f"{name:32s} {best/K*1e3:8.3f} ms/iter", flush=True)
    return best / K


def main():
    print("devices:", jax.devices())
    scene = cornell_box(width=W, height=H)
    data = scene.build()
    cam = camera_to_params(scene.camera)
    closest, occluded = make_tracer(data, use_bvh=False)

    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % W, ids // W
    seed32 = jnp.uint32(7)
    pix = (py.astype(jnp.uint32) << jnp.uint32(16)) | px.astype(jnp.uint32)
    u = rng.pixel_uniforms4(seed32, pix, 0, 0, 0)
    p0, d0 = generate_rays(cam, px, py, u[:, 0:2], u[:, 2:4])
    p0, d0 = jax.block_until_ready((p0, d0))

    hits = closest(data, p0, d0)
    tri = jax.block_until_ready(hits["tri"])
    _, uu, vv = reintersect(data, tri, p0, d0)
    sp = shading_parameters(data, tri, uu, vv)
    hp, hn = jax.block_until_ready((sp["p"], sp["n"]))
    mat = jax.block_until_ready(data.tri_mat[jnp.maximum(tri, 0)])
    lobes = jax.tree_util.tree_map(
        lambda x: jax.block_until_ready(x) if hasattr(x, "block_until_ready") else x,
        gather_lobes(data, mat),
    )

    total = 0.0
    rtt = timed("null (RTT floor)", lambda: jnp.float32(1.0))
    total -= rtt * 11  # subtract the dispatch floor from the 11 stages
    total += timed("rng x3", lambda: rng.pixel_uniforms4(seed32, pix, 0, 1, 1), )
    total += timed("camera raygen", generate_rays, cam, px, py, u[:, 0:2], u[:, 2:4])
    total += timed("closest (brute MT)", closest, data, p0, d0)
    total += timed("occluded (brute MT)", occluded, data, hp, d0, jnp.full((N,), 1.5))
    total += timed("reintersect", reintersect, data, tri, p0, d0)
    total += timed("shading_parameters", shading_parameters, data, tri, uu, vv)
    total += timed("emission_at", emission_at, data, mat, sp["st"])
    total += timed("gather_lobes", gather_lobes, data, mat)
    total += timed("sample_lights", sample_lights, data, u[:, 0], u[:, 1], u[:, 2])
    total += timed("bsdf_f", bsdf_f, lobes, hn, d0, -d0)
    total += timed("bsdf_sample", bsdf_sample, lobes, hn, -d0, u[:, 0:2])
    print(f"{'sum of stages':32s} {total*1e3:8.3f} ms")

    # whole pipeline for comparison: per (bounce*2traces) unit
    tracer = (closest, occluded)
    fn = jax.jit(
        functools.partial(
            render_pass, width=W, height=H, max_depth=4, tracer=tracer
        ),
        static_argnames=("n_samples",),
    )
    out = fn(data, cam, jax.random.key(0), 0, 16)
    jax.block_until_ready(out)
    t0 = time.time()
    jax.block_until_ready(fn(data, cam, jax.random.key(0), 16, 16))
    dt = time.time() - t0
    print(f"full render_pass 16spp: {dt*1e3:.1f} ms "
          f"({dt/16/4*1e3:.2f} ms per bounce-iter)")


if __name__ == "__main__":
    main()
