"""Round-3 TPU batch A: attack the BMW-scale front table + wave loop.

Measures, on the 887k-tri Ogawa-imported BMW-class asset (131k rays):
  - flat vs treelet vs nested-treelet cluster layouts (wave-loop lever:
    tight subtree bounds cut per-ray overlap 12.6 -> 8.5, r3_overlap.py)
  - 2-level vs 3-level front table (the (N,K2) sc slab+top_k was 60 ms
    of the 258 ms trace in round 2)
  - sc selection primitive: lax.top_k vs packed sort vs min-extraction
  - front_k=32, slab_bf16 interactions
  - coherent (camera) AND incoherent (bounce-like) ray sets per config
    (same jit, new inputs — no extra compile)

    python tools/tpu_r3_front.py 2>&1 | tee /tmp/tpu_r3a.log
"""
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
from phosphorus_mk2_tpu.accel.intersect import T_MAX
from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays

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


def main():
    print(f"devices: {jax.devices()}", flush=True)
    if not os.path.exists(ABC):
        bmw_asset.write_asset(ABC, scale=1.0)
    scene = bmw_asset.load_scene(ABC, 512, 512)
    base = scene.build()
    cam = camera_to_params(scene.camera)
    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % 512, (ids // 512) % 512
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)
    t_lim = jnp.full((N,), T_MAX)

    datas = {}
    for mode in ("flat", "treelet", "treelet_nested"):
        t0 = time.time()
        datas[mode] = attach_bvh(base, cluster_mode=mode)
        bvh = datas[mode].bvh
        print(json.dumps({
            "attach": mode, "s": round(time.time() - t0, 2),
            "K": int(bvh["cluster_bmin"].shape[0]),
            "K2": int(bvh["sc_bmin"].shape[0]),
            "K3": int(bvh["ssc_bmin"].shape[0]),
        }), flush=True)

    # incoherent (bounce-like) ray set: hit points of the camera trace
    # + hemisphere-random directions — same shapes, so each config's jit
    # is reused without a second compile
    base_trace = jax.jit(lambda p, d: ct.intersect_clusters(datas["flat"], p, d))
    bflat, out0 = timed(base_trace, p, d)
    hitp = p + out0["t"][:, None] * d * 0.999
    key = jax.random.key(1)
    d2 = jax.random.normal(key, (N, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    p2 = jnp.where(out0["hit"][:, None], hitp, p)

    configs = [
        ("flat", {}),
        ("treelet", {}),
        ("treelet", {"front_levels": 3}),
        ("treelet", {"sc_topk": "extract"}),
        ("treelet", {"sc_topk": "sort"}),
        ("treelet", {"front_levels": 3, "front_k": 32}),
        ("treelet", {"front_levels": 3, "slab_bf16": True}),
        ("treelet_nested", {}),
        ("treelet_nested", {"front_levels": 3}),
    ]
    results = []
    for mode, tune in configs:
        data = datas[mode]
        fn = jax.jit(lambda p, d, data=data, tune=tune:
                     ct.intersect_clusters(data, p, d, **tune))
        try:
            b_coh, out = timed(fn, p, d)
            b_inc, _ = timed(fn, p2, d2)
        except Exception as e:  # keep the batch going
            print(json.dumps({"mode": mode, "tune": tune,
                              "error": repr(e)[:200]}), flush=True)
            continue
        hits = int(np.asarray(out["hit"]).sum())
        line = {
            "mode": mode, "tune": tune,
            "coh_ms": round(b_coh * 1e3, 1),
            "inc_ms": round(b_inc * 1e3, 1),
            "mrays_coh": round(N / b_coh / 1e6, 2),
            "hits": hits,
        }
        results.append(line)
        print(json.dumps(line), flush=True)

    # stage split for the two headline configs
    for mode, tune in (("flat", {}), ("treelet", {"front_levels": 3})):
        bvh = datas[mode].bvh
        K = bvh["cluster_bmin"].shape[0]
        kk = min(tune.get("front_k", 0) or ct.MAX_FRONT, K)
        ft = jax.jit(lambda p, d, bvh=bvh, kk=kk, tune=tune:
                     ct._front_table_hierarchical(
                         p, d, bvh, t_lim, kk,
                         levels=tune.get("front_levels", 2),
                         sc_topk=tune.get("sc_topk", "topk")))
        bft, (ttbl, ctbl, hor) = timed(ft, p, d)
        ov = np.asarray((ttbl < T_MAX).sum(axis=1))
        print(json.dumps({
            "front_only": mode, "tune": tune, "ms": round(bft * 1e3, 1),
            "overlap_mean": round(float(ov.mean()), 2),
            "overlap_p99": int(np.percentile(ov, 99)),
            "full_frac": round(float((ov >= kk).mean()), 4),
        }), flush=True)

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
