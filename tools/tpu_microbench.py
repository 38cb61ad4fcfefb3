"""Per-stage TPU micro-benchmarks — find where render time goes.

Run on the real chip (no platform override). Times each pipeline stage
in its own small jit so the numbers decompose the full render:
  raygen+rng | trace (brute MT) | occlusion | shading+bsdf | full sample
Prints one line per stage: name, ms/call, work-rate.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays
from phosphorus_mk2_tpu.bsdf.bsdf import bsdf_f, bsdf_sample, gather_lobes
from phosphorus_mk2_tpu.accel.intersect import intersect_brute, occluded_brute
from phosphorus_mk2_tpu.integrator import path as pathmod
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass, trace_sample
from phosphorus_mk2_tpu.scenes import cornell_box

W = H = 256
N = W * H
REPS = 8


def timed(name, fn, *args, work=None, unit="")-> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    rate = f" | {work / dt / 1e6:.2f} M{unit}/s" if work else ""
    print(f"{name:24s} {dt * 1e3:9.2f} ms{rate}", flush=True)
    return dt


def main():
    print(jax.devices(), flush=True)
    scene = cornell_box(width=W, height=H)
    data = scene.build()
    cam = camera_to_params(scene.camera)
    key = jax.random.key(0)
    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % W, ids // W

    # 1. per-pixel RNG (PCG4D: 4 uniforms per call)
    from phosphorus_mk2_tpu.math import rng as rngmod

    pix = (py.astype(jnp.uint32) << jnp.uint32(16)) | px.astype(jnp.uint32)
    f_rng = jax.jit(
        lambda s: rngmod.pixel_uniforms4(s, pix, 0, 0, 0)
    )
    timed("rng pcg4d x4", f_rng, jnp.uint32(1), work=N * 4, unit="samp")

    # 2. camera raygen
    u2 = f_rng(jnp.uint32(1))[:, :2]
    f_cam = jax.jit(lambda u: generate_rays(cam, px, py, u, u))
    timed("camera raygen", f_cam, u2, work=N, unit="ray")

    p0, d0 = f_cam(u2)

    # 3. closest-hit brute MT
    f_tr = jax.jit(lambda p, d: intersect_brute(data, p, d))
    timed("trace closest (brute)", f_tr, p0, d0, work=N, unit="ray")

    hits = f_tr(p0, d0)

    # 4. occlusion any-hit
    tmax = jnp.full((N,), 1.5)
    f_oc = jax.jit(lambda p, d: occluded_brute(data, p, d, tmax))
    timed("trace shadow (brute)", f_oc, p0, d0, work=N, unit="ray")

    # 5. bsdf sample + eval
    mat = data.tri_mat[jnp.maximum(hits["tri"], 0)]
    n = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (N, 1))
    f_bs = jax.jit(
        lambda m, u: bsdf_sample(gather_lobes(data, m), n, -d0, u)
    )
    timed("bsdf sample", f_bs, mat, u2, work=N, unit="samp")
    f_bf = jax.jit(lambda m: bsdf_f(gather_lobes(data, m), n, -d0, d0))
    timed("bsdf eval", f_bf, mat, work=N, unit="samp")

    # 6. one full sample (all stages, 4 bounces)
    tracer = make_tracer(data, use_bvh=False)
    f_full = jax.jit(
        lambda k: trace_sample(
            data, cam, px, py, 0, k, max_depth=4, tracer=tracer
        )
    )
    dt = timed("full sample depth4", f_full, key, work=N * 4 * 2, unit="ray")

    # 7. block-traversal variant for comparison
    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh

    data_bvh = attach_bvh(data)
    tracer_b = make_tracer(data_bvh, use_bvh=True)
    f_bt = jax.jit(lambda p, d: tracer_b[0](data_bvh, p, d))
    timed("trace closest (block)", f_bt, p0, d0, work=N, unit="ray")


if __name__ == "__main__":
    main()
