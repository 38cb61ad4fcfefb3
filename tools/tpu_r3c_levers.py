"""Round-3 TPU batch C: the gather-traffic levers.

Measures on the 887k-tri asset (131k rays):
  1. gather granularity: same bytes, different row sizes — is the wave
     gather bandwidth-bound (bytes) or descriptor-bound (row count)?
  2. single (N,) element gather (the winner-id map cost)
  3. trace with rows_bf16 / sc_topk=pallas / expand_batch=16 / combos
  4. render-level best combo

    python tools/tpu_r3c_levers.py 2>&1 | tee /tmp/tpu_r3c.log
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

    # ---- 1. gather granularity microbench -----------------------------
    key = jax.random.key(0)
    total_rows = 1 << 20  # 1M row fetches, like one BMW trace wave loop
    for width_f32, note in ((1280, "5KB rows (C=128, 10 comp)"),
                            (1152, "4.5KB rows (C=128, 9 comp)"),
                            (640, "2.5KB rows (C=64)"),
                            (2560, "10KB rows (C=256)")):
        K = (9136 * 1280) // width_f32  # same table bytes
        tbl = jax.random.normal(key, (K, width_f32), jnp.float32)
        nfetch = total_rows * 1280 // width_f32  # same gathered bytes
        idx = jax.random.randint(key, (nfetch,), 0, K)
        f = jax.jit(lambda t, i: t[i].sum(axis=0))
        b, _ = timed(f, tbl, idx)
        gb = nfetch * width_f32 * 4 / 1e9
        J(gather=note, rows=nfetch, ms=round(b * 1e3, 1),
          gbps=round(gb / b, 1), mrows_per_s=round(nfetch / b / 1e6, 1))
    # bf16 rows, same row count as C=128
    tbl16 = jax.random.normal(key, (9136, 1152), jnp.float32).astype(jnp.bfloat16)
    idx = jax.random.randint(key, (total_rows,), 0, 9136)
    f = jax.jit(lambda t, i: t[i].astype(jnp.float32).sum(axis=0))
    b, _ = timed(f, tbl16, idx)
    J(gather="2.25KB bf16 rows (C=128, 9 comp)", rows=total_rows,
      ms=round(b * 1e3, 1),
      gbps=round(total_rows * 1152 * 2 / 1e9 / b, 1),
      mrows_per_s=round(total_rows / b / 1e6, 1))

    # single (N,) element gather (winner-id map)
    flat = jax.random.normal(key, (9136 * 128,), jnp.float32)
    eidx = jax.random.randint(key, (N,), 0, flat.shape[0])
    f = jax.jit(lambda t, i: t[i])
    b, _ = timed(f, flat, eidx)
    J(gather="single (131k,) element gather", ms=round(b * 1e3, 2))

    # ---- 2. trace levers ----------------------------------------------
    scene = bmw_asset.load_scene(ABC, 512, 512)
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % 512, (ids // 512) % 512
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)

    combos = [
        {},  # new baseline (9-comp rows, winner-id map)
        {"rows_bf16": True},
        {"sc_topk": "pallas"},
        {"expand_batch": 16},
        {"front_k": 32, "rows_bf16": True, "sc_topk": "pallas",
         "expand_batch": 16},
        {"front_k": 32, "rows_bf16": True, "expand_batch": 16},
    ]
    for tune in combos:
        fn = jax.jit(lambda p, d, tune=tune:
                     ct.intersect_clusters(data, p, d, **tune))
        try:
            b, out = timed(fn, p, d)
        except Exception as e:
            J(trace=str(tune), error=repr(e)[:200])
            continue
        J(trace=str(tune), ms=round(b * 1e3, 1),
          mrays=round(N / b / 1e6, 2),
          hits=int(np.asarray(out["hit"]).sum()))

    # ---- 3. render with the best trace combo + spp_batch ---------------
    RES, SPP, DEPTH = 512, 4, 4
    rays = RES * RES * SPP * DEPTH * 2
    for name, tune, kw in [
        ("render_bf16_pallas_fk32_eb16",
         {"front_k": 32, "rows_bf16": True, "sc_topk": "pallas",
          "expand_batch": 16}, {}),
        ("render_bf16_pallas_fk32_eb16_sppb2",
         {"front_k": 32, "rows_bf16": True, "sc_topk": "pallas",
          "expand_batch": 16}, {"spp_batch": 2}),
    ]:
        tracer = make_tracer(data, use_bvh=True, tracer_tune=tune)
        fn = jax.jit(functools.partial(
            render_pass, width=RES, height=RES, max_depth=DEPTH,
            tracer=tracer, depth_unroll=1, **kw),
            static_argnames=("n_samples",))
        try:
            b, out = timed(lambda: fn(data, cam, jax.random.key(0), 0, SPP))
        except Exception as e:
            J(render=name, error=repr(e)[:200])
            continue
        mean = float(np.asarray(out["color"]).mean()) / SPP
        J(render=name, ms=round(b * 1e3, 1),
          mrays=round(rays / b / 1e6, 3), mean=round(mean, 5))


if __name__ == "__main__":
    main()
