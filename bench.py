"""Benchmark: forward path-tracing throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: wavefront rays traced per second on the Cornell-box scene
(BASELINE.json config 2 geometry) — rays = W*H*spp*max_depth*2
(closest + shadow per bounce; the dense wavefront really issues all of
them). The reference publishes no numbers (BASELINE.md), so vs_baseline
is measured against a fixed reference throughput constant recorded in
this file (BASELINE_RAYS_PER_SEC) — an AVX2 estimate for the reference
renderer on the same scene; update when a measured number exists.
"""
from __future__ import annotations

import json
import sys
import time


# Placeholder until the C++ reference can be built and timed on matched
# hardware: a 16-thread AVX2 CPU tracer of this class typically sustains
# ~20-40 Mrays/s on a Cornell-box scene; we take the midpoint.
BASELINE_RAYS_PER_SEC = 30e6

WIDTH = HEIGHT = 256
SPP = 16
MAX_DEPTH = 4


def main() -> int:
    import jax
    import numpy as np

    from phosphorus_mk2_tpu.core.camera import camera_to_params
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
    from phosphorus_mk2_tpu.scenes import cornell_box

    scene = cornell_box(width=WIDTH, height=HEIGHT)
    data = scene.build()
    cam = camera_to_params(scene.camera)
    # XLA brute tracer: in-pipeline fusion beats the isolated Pallas
    # kernel win (measured: pallas 10.4 Mray/s vs xla 13.7 in-pipeline,
    # though pallas wins 1.6x standalone — the pallas_call is a fusion
    # barrier). Pallas stays available via use_pallas=True.
    tracer = make_tracer(data, use_bvh=False)
    key = jax.random.key(0)

    import functools

    # depth/sample unroll: the axon platform has a large per-scan-
    # iteration overhead; unrolling measured 15.0 -> 18.0 Mrays/s
    # (tools/tpu_unroll.py)
    fn = jax.jit(
        functools.partial(
            render_pass,
            width=WIDTH,
            height=HEIGHT,
            max_depth=MAX_DEPTH,
            tracer=tracer,
            depth_unroll=MAX_DEPTH,
            sample_unroll=4,
        ),
        static_argnames=("n_samples",),
    )

    # warmup / compile — MUST use the same static n_samples as the timed
    # call or the timed region includes a (remote) recompile
    out = fn(data, cam, key, 0, SPP)
    jax.block_until_ready(out)

    t0 = time.time()
    out = fn(data, cam, key, SPP, SPP)
    jax.block_until_ready(out)
    dt = time.time() - t0

    rays = WIDTH * HEIGHT * SPP * MAX_DEPTH * 2
    rays_per_sec = rays / dt

    mean = float(np.asarray(out["color"]).mean()) / SPP
    ok = np.isfinite(mean) and mean > 0.0

    print(
        json.dumps(
            {
                "metric": "cornell_fwd_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
