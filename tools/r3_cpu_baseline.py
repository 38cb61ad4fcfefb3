"""Round-3: measured host-CPU baseline on the 887k-tri BMW-class scene.

The Cornell bench line already divides by a measured host-CPU run of the
same integrator (bench.py); the BMW line had no baseline at all — and
the reference's AVX2 stream-BVH tracer is strongest exactly at this
scale. This runs the SAME wavefront integrator + cluster tracer on the
host CPU (XLA CPU backend) over the same Ogawa-imported archive and
reports rays/s, giving bench.py's `bmw_vs_baseline` a measured
denominator. CPU-forced: safe to run alongside TPU jobs.

    python tools/r3_cpu_baseline.py 2>&1 | tee /tmp/r3_cpu_baseline.log
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bmw_asset  # noqa: E402

from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh  # noqa: E402
from phosphorus_mk2_tpu.core.camera import camera_to_params  # noqa: E402
from phosphorus_mk2_tpu.integrator.path import (  # noqa: E402
    make_tracer, render_pass,
)

ABC = "/tmp/bmw_class.abc"
RES, SPP, DEPTH = 128, 2, 4  # small frame: the CPU needs minutes/frame


def main():
    assert jax.devices()[0].platform == "cpu"
    if not os.path.exists(ABC):
        bmw_asset.write_asset(ABC, scale=1.0)
    scene = bmw_asset.load_scene(ABC, RES, RES)
    t0 = time.time()
    data = attach_bvh(scene.build())
    print(f"attach {time.time()-t0:.1f} s", flush=True)
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=True)
    fn = jax.jit(
        functools.partial(render_pass, width=RES, height=RES,
                          max_depth=DEPTH, tracer=tracer, depth_unroll=1),
        static_argnames=("n_samples",),
    )
    key = jax.random.key(0)
    t0 = time.time()
    out = jax.block_until_ready(fn(data, cam, key, 0, SPP))
    print(f"compile+first pass {time.time()-t0:.1f} s", flush=True)
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        out = jax.block_until_ready(fn(data, cam, key, 0, SPP))
        best = min(best, time.time() - t0)
    rays = RES * RES * SPP * DEPTH * 2
    mean = float(np.asarray(out["color"]).mean()) / SPP
    print(json.dumps({
        "metric": "bmw_cpu_fwd_rays_per_sec",
        "value": round(rays / best, 1),
        "res": RES, "spp": SPP, "depth": DEPTH,
        "tris": int(data.faces.shape[0]),
        "seconds_per_pass": round(best, 2),
        "mean": round(mean, 5),
        "host_cpus": os.cpu_count(),
    }), flush=True)


if __name__ == "__main__":
    main()
