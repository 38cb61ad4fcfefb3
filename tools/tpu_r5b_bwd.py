"""Round-5 probe B: decompose the BMW fwd+bwd step by gradient path,
and re-sweep max_wavefront (VERDICT r4 next #1 and #5).

Round-4 state: BMW fwd 1.17 Mrays/s, fwd+bwd 0.87 (bench.bmw_fwd_bwd:
N=1<<16, spp 2, depth 3, grads wrt emission+lobe_weight+vertices).
Round-5 probe A showed raw scatter-adds are CHEAP (0.07-0.17 ms at
every BMW shape — the r4 "33 ms transpose" does not reproduce), so the
~230 ms backward overhead must be the shading-chain transposes +
residual traffic. Gradient scoping (integrator.path trainable=) severs
whole chains; this probe measures what each chain costs on the real
pipeline.

Experiments (each in its OWN subprocess — the axon client cannot
compile a second pallas-bearing program after one has run):
  fwd           forward-only, bench shapes
  bwd_full      grads em+lw+verts, trainable=None   (r4 baseline)
  bwd_all3      same params, trainable=(em,lw,verts) (severs normals
                + lobe_param only — measures scoping overhead)
  bwd_emlw      params em+lw, trainable=(em,lw)      (no vertex grads)
  bwd_em        params em, trainable=(em,)           (emission only)
  maxwf_N       closest-hit trace at wavefront N (1<<17 was capped by
                a pre-diet OOM; the round-4 front table is leaner)

Usage: python tools/tpu_r5b_bwd.py            # driver, runs all
       python tools/tpu_r5b_bwd.py <exp>      # one experiment
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
if REPO not in sys.path:
    sys.path.insert(0, REPO)  # script lives in tools/; package at repo root

N, SPP_B, DEPTH_B, RES = 1 << 16, 2, 3, 512


def timed(fn, *args, reps=2):
    import jax

    out = jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best, out


def load_bmw():
    import jax.numpy as jnp

    sys.path.insert(0, HERE)
    import bmw_asset

    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.core.camera import camera_to_params

    abc = "/tmp/bmw_class.abc"
    if not os.path.exists(abc):
        bmw_asset.write_asset(abc, scale=1.0)
    scene = bmw_asset.load_scene(abc, RES, RES)
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    return data, cam


def run_bwd(param_fields, trainable, sorted_dispatch=False):
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from phosphorus_mk2_tpu.integrator.path import (
        make_tracer,
        render_pass_pixels,
    )

    data, cam = load_bmw()
    tracer = make_tracer(data, use_bvh=True)
    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % RES, (ids // RES) % RES
    key = jax.random.key(0)
    params = {f: getattr(data, f) for f in param_fields}

    def loss(params, data, key):
        d2 = dc.replace(data, **params)
        out = render_pass_pixels(
            d2, cam, key, 0, SPP_B, px, py, max_depth=DEPTH_B,
            tracer=tracer, sorted_dispatch=sorted_dispatch,
            trainable=trainable,
        )
        return out["color"].sum()

    grad = jax.jit(jax.grad(loss))
    rays = N * SPP_B * DEPTH_B * 2
    t, g = timed(lambda: grad(params, data, key))
    finite = all(bool(np.isfinite(np.asarray(v)).all()) for v in g.values())
    nz = {k: float(np.abs(np.asarray(v)).max()) for k, v in g.items()}
    return {"ms": round(t * 1e3, 1), "mrays": round(rays / t / 1e6, 3),
            "finite": finite, "grad_absmax": nz}


def main_exp(exp):
    import jax
    import jax.numpy as jnp

    if exp == "fwd":
        from phosphorus_mk2_tpu.integrator.path import (
            make_tracer,
            render_pass_pixels,
        )

        data, cam = load_bmw()
        tracer = make_tracer(data, use_bvh=True)
        ids = jnp.arange(N, dtype=jnp.int32)
        px, py = ids % RES, (ids // RES) % RES
        key = jax.random.key(0)
        fn = jax.jit(lambda d, k: render_pass_pixels(
            d, cam, k, 0, SPP_B, px, py, max_depth=DEPTH_B,
            tracer=tracer, sorted_dispatch=False)["color"].sum())
        rays = N * SPP_B * DEPTH_B * 2
        t, _ = timed(lambda: fn(data, key))
        out = {"ms": round(t * 1e3, 1), "mrays": round(rays / t / 1e6, 3)}
    elif exp == "bwd_full":
        out = run_bwd(("emission", "lobe_weight", "vertices"), None)
    elif exp == "bwd_all3":
        out = run_bwd(("emission", "lobe_weight", "vertices"),
                      ("emission", "lobe_weight", "vertices"))
    elif exp == "bwd_emlw":
        out = run_bwd(("emission", "lobe_weight"),
                      ("emission", "lobe_weight"))
    elif exp == "bwd_em":
        out = run_bwd(("emission",), ("emission",))
    elif exp == "bwd_emlw_sorted":
        # the BMW asset has 5 lobe types: the round-5 sorted-dispatch
        # reverse rule engages (>2 types, N*L >= 4096)
        out = run_bwd(("emission", "lobe_weight"),
                      ("emission", "lobe_weight"), sorted_dispatch=True)
    elif exp == "bwd_full_sorted":
        out = run_bwd(("emission", "lobe_weight", "vertices"), None,
                      sorted_dispatch=True)
    elif exp.startswith("maxwf_"):
        n = int(exp.split("_")[1])
        from phosphorus_mk2_tpu.accel import cluster_traverse as ct
        from phosphorus_mk2_tpu.core.camera import generate_rays

        data, cam = load_bmw()
        ids = jnp.arange(n, dtype=jnp.int32)
        u = jnp.full((n, 2), 0.5)
        p, d = generate_rays(cam, ids % RES, (ids // RES) % RES, u, u)
        trace = jax.jit(lambda p, d: ct.intersect_clusters(data, p, d))
        t, o = timed(lambda: trace(p, d))
        out = {"ms": round(t * 1e3, 1), "mrays": round(n / t / 1e6, 3),
               "ns_per_ray": round(t / n * 1e9, 1),
               "hits": int(o["hit"].sum())}
    else:
        raise SystemExit(f"unknown exp {exp}")
    print("RESULT " + json.dumps({"exp": exp, **out}), flush=True)


def driver():
    exps = ["fwd", "bwd_full", "bwd_all3", "bwd_emlw", "bwd_em",
            "maxwf_262144", "maxwf_524288"]
    for exp in exps:
        t0 = time.time()
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), exp],
            timeout=3600, capture_output=True, text=True, cwd=REPO,
        )
        took = round(time.time() - t0, 1)
        lines = [ln for ln in res.stdout.splitlines()
                 if ln.startswith("RESULT ")]
        if lines:
            print(lines[-1][len("RESULT "):], f"(wall {took}s)", flush=True)
        else:
            print(json.dumps({"exp": exp, "error":
                              (res.stderr or "no output")[-400:],
                              "wall_s": took}), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        main_exp(sys.argv[1])
    else:
        driver()
