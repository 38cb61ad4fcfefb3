"""Round-2 TPU batch H: where do the 887k-tri trace's 258 ms go?

Splits the cluster trace into stages and times each on the BMW-class
asset: front table alone, wave loop (fallback disabled), full trace,
plus needy-ray counts (fallback pressure) and overlap distribution.

    python tools/tpu_r2h_stagesplit.py 2>&1 | tee /tmp/tpu_r2h.log
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

import bmw_asset
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.accel import cluster_traverse as ct
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
    data = attach_bvh(scene.build())
    bvh = data.bvh
    K = bvh["cluster_bmin"].shape[0]
    cam = camera_to_params(scene.camera)
    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % 512, (ids // 512) % 512
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)
    kk = min(ct.MAX_FRONT, K)
    t_lim = jnp.full((N,), T_MAX)

    # 1) front table alone
    ft = jax.jit(lambda p, d: ct._front_table_hierarchical(p, d, bvh, t_lim, kk))
    best, (ttbl, ctbl, hor) = timed(ft, p, d)
    print(f"[front table        ] {best*1e3:8.1f} ms", flush=True)
    ft16 = jax.jit(lambda p, d: ct._front_table_hierarchical(
        p, d, bvh, t_lim, kk, expand_batch=16))
    b16, _ = timed(ft16, p, d)
    print(f"[front table exp16  ] {b16*1e3:8.1f} ms", flush=True)

    # overlap stats + fallback pressure
    ov = np.asarray((ttbl < T_MAX).sum(axis=1))
    print(f"[overlap] mean={ov.mean():.2f} p50={np.percentile(ov,50):.0f} "
          f"p90={np.percentile(ov,90):.0f} p99={np.percentile(ov,99):.0f} "
          f"max={ov.max()} full={np.mean(ov>=kk)*100:.2f}%", flush=True)

    # 2) full trace (fallback included) — reference point
    full = jax.jit(lambda p, d: ct.intersect_clusters(data, p, d))
    bfull, out = timed(full, p, d)
    print(f"[full trace         ] {bfull*1e3:8.1f} ms", flush=True)

    # needy = rays whose horizon is nearer than their best hit
    kth = np.asarray(jnp.minimum(ttbl[:, -1], hor))
    t_best = np.asarray(out["t"])
    needy = kth < t_best
    print(f"[needy] {needy.sum()} rays ({needy.mean()*100:.3f}%)", flush=True)

    # 3) wave loop only: fallback disabled via monkeypatched cond
    real_cond = jax.lax.cond

    def no_fallback_cond(pred, tf, ff, arg):
        return ff(arg)

    jax.lax.cond = no_fallback_cond
    try:
        nofb = jax.jit(lambda p, d: ct.intersect_clusters(data, p, d))
        bnofb, _ = timed(nofb, p, d)
    finally:
        jax.lax.cond = real_cond
    print(f"[trace, no fallback ] {bnofb*1e3:8.1f} ms  "
          f"(fallback share {max(0.0, bfull-bnofb)*1e3:.1f} ms)", flush=True)

    # 4) sort/argsort cost of the packed table at this shape
    cand = jnp.zeros((N, 256), jnp.uint32)
    srt = jax.jit(lambda x: jnp.sort(x, axis=1)[:, :kk])
    bs, _ = timed(srt, cand)
    print(f"[row sort (N,256)   ] {bs*1e3:8.1f} ms", flush=True)
    ags = jax.jit(lambda x: jnp.argsort(-x))
    bag, _ = timed(ags, jnp.zeros((N,), jnp.int32))
    print(f"[ray argsort (N,)   ] {bag*1e3:8.1f} ms", flush=True)

    # 5) sc slab + top_k alone (the pre-expansion stage)
    def scstage(p, d):
        sc_hit, sc_tn = ct._slab_all(p, d, bvh["sc_bmin"], bvh["sc_bmax"])
        jj = min(ct.SC_FRONT, sc_tn.shape[1])
        sc_m = jnp.where(sc_hit & (sc_tn < t_lim[:, None]), sc_tn, T_MAX)
        return jax.lax.top_k(-sc_m, jj)
    bsc, _ = timed(jax.jit(scstage), p, d)
    print(f"[sc slab + top_k    ] {bsc*1e3:8.1f} ms  (K2={bvh['sc_bmin'].shape[0]})",
          flush=True)


if __name__ == "__main__":
    main()
