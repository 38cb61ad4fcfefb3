"""Decompose full-pipeline cost on TPU via static variants.

NEE cost = (full) - (lightless scene: NEE compiles out statically);
per-bounce cost from depth 1 vs 4.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools
import time

import jax
import jax.numpy as jnp

from phosphorus_mk2_tpu.core.camera import camera_to_params
from phosphorus_mk2_tpu.core.material import Material
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
from phosphorus_mk2_tpu.scenes import cornell_box

W = H = 256
SPP = 4


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(4):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 4
    print(f"{name:32s} {dt * 1e3:9.2f} ms ({dt * 1e3 / SPP:.2f} ms/sample)", flush=True)


def build_fn(data, cam, depth):
    tracer = make_tracer(data, use_bvh=False)
    return jax.jit(
        functools.partial(
            render_pass, width=W, height=H, max_depth=depth, tracer=tracer
        ),
        static_argnames=("n_samples",),
    )


def main():
    print(jax.devices(), flush=True)
    key = jax.random.key(0)

    scene = cornell_box(width=W, height=H)
    data = scene.build()
    cam = camera_to_params(scene.camera)

    # lightless variant: kill the lamp's emission -> no area lights ->
    # num_lights == 0 -> the NEE block is statically compiled out
    dark = cornell_box(width=W, height=H)
    dark.materials[3].emission = (0.0, 0.0, 0.0)
    data_dark = dark.build()
    assert data_dark.num_lights == 0

    f_full4 = build_fn(data, cam, 4)
    f_dark4 = build_fn(data_dark, cam, 4)
    f_full1 = build_fn(data, cam, 1)

    timed("full depth4 (NEE on)", f_full4, data, cam, key, 0, SPP)
    timed("no-NEE depth4", f_dark4, data_dark, cam, key, 0, SPP)
    timed("full depth1", f_full1, data, cam, key, 0, SPP)


if __name__ == "__main__":
    main()
