"""Round-4 TPU batch C: wave-loop decomposition at BMW scale.

r4a measured recompact=8 winning (184.8 -> 167.4 ms) but chunk 8192
LOSING even with a tight dynamic prefix — which contradicts a pure
per-iteration-launch-floor model (fewer, bigger iterations should win
if launches dominate). Discriminate the two cost models before
investing in a redesign:

  model L (launch floor): wave-loop time ~ 0.4 ms x chunk-iterations
    (~242 at chunk 4096) -> collapse iterations (fat all-columns
    chunks over overlap-sorted rays) for a ~3x win.
  model B (byte-bound): time ~ total gathered bytes / 125 GB/s ->
    only liveness reduction (recompact) helps; chunk size is neutral
    until quantization waste bites.

Experiments:
  1. SYNTHETIC: fori_loop of T iterations x (CH, 9, C) row-gathers
     from the real cluster-row table at CONSTANT T*CH — if time scales
     with T it's launches; if flat it's bytes.
  2. front-table-only jit (the non-wave part of the trace).
  3. full-trace grid: chunk x recompact refinements around the r4a
     winner.
  4. host-side liveness model from the front table + final t: static
     overlap, dynamic-live estimate, expected iterations + bytes.

    python tools/tpu_r4c_waveloop.py 2>&1 | tee /tmp/tpu_r4c.log
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


def J(**kw):
    print(json.dumps(kw), flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    if not os.path.exists(ABC):
        bmw_asset.write_asset(ABC, scale=1.0)
    scene = bmw_asset.load_scene(ABC, 512, 512)
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % 512, (ids // 512) % 512
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)

    rows_tbl = ct._cluster_rows(data, bf16=False)
    K, _, C = rows_tbl.shape
    row_bytes = 9 * C * 4
    J(tables=dict(K=K, C=C, row_kb=round(row_bytes / 1024, 2)))

    # --- 1. synthetic launch-vs-bytes discriminator -------------------
    TOTAL = 242 * 4096  # ~ the real chunk-iteration workload at 4096
    rng = np.random.default_rng(0)
    for T, CH in ((242, 4096), (121, 8192), (61, 16384), (31, 32768),
                  (484, 2048)):
        CH = TOTAL // T
        idx = jnp.asarray(rng.integers(0, K, size=(T, CH)), jnp.int32)

        def body(i, acc, idx=idx):
            r = rows_tbl[jax.lax.dynamic_index_in_dim(idx, i, keepdims=False)]
            return acc + r.sum()

        fn = jax.jit(lambda idx, T=T: jax.lax.fori_loop(
            0, T, lambda i, a: body(i, a), jnp.float32(0.0)))
        b, _ = timed(fn, idx)
        gb = TOTAL * row_bytes / 1e9
        J(synthetic=dict(iters=T, chunk=CH), ms=round(b * 1e3, 1),
          ms_per_iter=round(b * 1e3 / T, 3),
          gbps=round(gb / b, 1))

    # --- 2. front-table-only ------------------------------------------
    kk = 32

    def front_only(p, d):
        pp, dd = jax.lax.stop_gradient(p), jax.lax.stop_gradient(d)
        tl = jnp.full((N,), ct.T_MAX)
        ttbl, ctbl, hor = ct._front_table_hierarchical(
            pp, dd, data.bvh, tl, kk, expand_batch=1,
            slab_bf16=False, levels=2, sc_topk="extract")
        return ttbl, ctbl, hor

    fo = jax.jit(front_only)
    b, (ttbl, ctbl, hor) = timed(fo, p, d)
    J(front_only_ms=round(b * 1e3, 1))

    # --- 3. full-trace refinements around the r4a winner --------------
    base = None
    t_final = None
    for tune in ({"front_k": 32, "recompact": 8},
                 {"front_k": 32, "recompact": 16},
                 {"front_k": 32, "recompact": 8, "chunk": 2048},
                 {"front_k": 32, "recompact": 6, "chunk": 2048},
                 ):
        fn = jax.jit(lambda p, d, tune=tune:
                     ct.intersect_clusters(data, p, d, **tune))
        try:
            b, out = timed(fn, p, d)
            hits = int(np.asarray(out["hit"]).sum())
            tri_sum = int(np.asarray(out["tri"]).sum())
            if base is None:
                base = (hits, tri_sum)
                t_final = np.asarray(out["t"])
            J(trace=str(tune), ms=round(b * 1e3, 1),
              mrays=round(N / b / 1e6, 2), hits=hits,
              winners_match=(hits, tri_sum) == base)
        except Exception as e:  # noqa: BLE001 - log-and-continue probe
            J(trace=str(tune), error=repr(e)[:200])

    # --- 4. host-side liveness model ----------------------------------
    tt = np.asarray(ttbl)
    tmax = float(ct.T_MAX)  # np arithmetic only (jnp scalar poisons json)
    static_ov = (tt < tmax).sum(axis=1)
    # column executed-live superset estimate: tn_w < final best t
    dyn_live = (tt < np.minimum(t_final[:, None], tmax)).sum(axis=1)
    for name, ov in (("static", static_ov), ("dynamic_est", dyn_live)):
        hist = np.percentile(ov, [50, 90, 99])
        total = int(ov.sum())
        # chunk-iterations of the CURRENT wave loop at chunk CH:
        # sum over waves of ceil(alive_w / CH), alive_w = #rays with ov > w
        for CH in (2048, 4096, 8192):
            alive_w = (ov[None, :] > np.arange(kk)[:, None]).sum(axis=1)
            iters = int(np.ceil(alive_w / CH).sum())
            J(model=name, mean=round(float(ov.mean()), 2),
              p50_90_99=[float(x) for x in hist], total_raywaves=total,
              chunk=CH, chunk_iters=iters,
              bytes_gb=round(alive_w.sum() * row_bytes / 1e9, 2))


if __name__ == "__main__":
    main()
