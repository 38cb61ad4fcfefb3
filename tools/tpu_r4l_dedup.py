"""Round-4 TPU batch L: decide the block-dedup wave-loop design.

r4_dedup_probe (CPU, real BMW front table): chunks of 2048 overlap-
sorted rays reference ~14k cluster rows but only ~1.8k DISTINCT —
7.8x byte headroom IF loading each distinct row once is cheaper than
the redundant gather stream. Whether it is depends on unknowns this
batch measures directly:

  A. gather bandwidth vs SOURCE size and index duplication: if the
     93 GB/s stream is a cache-miss effect, gathering from a small
     (or chunk-locally-deduplicated) table runs faster and a two-stage
     XLA dedup (unique -> compact buffer -> re-gather) pays; if it's
     the gather engine itself, re-gathering moves the same bytes at
     the same rate and only MXU routing can help.
  B. one-hot MXU routing: time (CH, D) x (D, 1152) matmuls (f32 and
     bf16) vs the equivalent row gather — the routing-cost side of the
     dedup ledger at candidate working-set sizes D.
  E. wave-loop overhead decomposition: the loop runs ~2x above its
     pure gather-byte floor (88 ms vs ~44 ms at 93 GB/s). Time the
     exact make_chunk body (gather + MT + state update) vs gather+sum
     at identical shapes to see if the gap is MT/materialization or
     state movement.

  C (subprocesses): pallas_full in-trace at BMW shapes — r4i died with
     truncated remote-compile 500s then poisoned the process; r4k
     showed isolated compiles succeed. Baseline and pallas variants
     each get a FRESH process; winners compared by checksum.

    python tools/tpu_r4l_dedup.py 2>&1 | tee /tmp/tpu_r4l.log
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))
ABC = "/tmp/bmw_class.abc"


def timed(f, *a, reps=3):
    import jax
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
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bmw_asset
    from phosphorus_mk2_tpu.accel import cluster_traverse as ct
    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays

    print(f"devices: {jax.devices()}", flush=True)
    if not os.path.exists(ABC):
        bmw_asset.write_asset(ABC, scale=1.0)
    scene = bmw_asset.load_scene(ABC, 512, 512)
    data = attach_bvh(scene.build())
    rows_tbl = ct._cluster_rows(data, bf16=False)
    K, _, C = rows_tbl.shape
    W = 9 * C
    row_bytes = W * 4
    flat_tbl = rows_tbl.reshape(K, W)
    J(tables=dict(K=K, C=C, row_kb=round(row_bytes / 1024, 2)))

    rng = np.random.default_rng(0)
    T, CH = 484, 2048
    TOTAL = T * CH
    gb = TOTAL * row_bytes / 1e9

    # --- A. source-size / duplication dependence ----------------------
    def loop_gather(idx, tbl):
        def body(i, acc):
            r = tbl[jax.lax.dynamic_index_in_dim(idx, i, keepdims=False)]
            return acc + r.sum()
        return jax.lax.fori_loop(0, T, body, jnp.float32(0.0))

    variants = {
        "ctl_random_K": rng.integers(0, K, size=(T, CH)),
        # per-chunk working set of 256 distinct rows (the dedup target)
        "local256": (rng.integers(0, 256, size=(T, CH))
                     + rng.integers(0, K - 256, size=(T, 1))),
        "local32": (rng.integers(0, 32, size=(T, CH))
                    + rng.integers(0, K - 32, size=(T, 1))),
        "sorted_chunk": np.sort(rng.integers(0, K, size=(T, CH)), axis=1),
        "all_same": np.zeros((T, CH), np.int64),
    }
    for name, idx in variants.items():
        fn = jax.jit(lambda idx, tbl: loop_gather(idx, tbl))
        b, _ = timed(fn, jnp.asarray(idx, jnp.int32), rows_tbl)
        J(expA=name, ms=round(b * 1e3, 1), gbps=round(gb / b, 1))
    for Ksmall in (256, 2048):
        idx = jnp.asarray(rng.integers(0, Ksmall, size=(T, CH)), jnp.int32)
        small = rows_tbl[:Ksmall]
        fn = jax.jit(lambda idx, tbl: loop_gather(idx, tbl))
        b, _ = timed(fn, idx, small)
        J(expA=f"table{Ksmall}", ms=round(b * 1e3, 1), gbps=round(gb / b, 1))

    # --- B. one-hot MXU routing ---------------------------------------
    for D in (256, 1024, 2048):
        idx = jnp.asarray(rng.integers(0, D, size=(T, CH)), jnp.int32)
        tbl = flat_tbl[:D]
        for dt in (jnp.float32, jnp.bfloat16):
            def route(idx, tbl, dt=dt, D=D):
                tb = tbl.astype(dt)
                def body(i, acc):
                    ii = jax.lax.dynamic_index_in_dim(idx, i, keepdims=False)
                    oh = (ii[:, None] == jnp.arange(D)[None, :]).astype(dt)
                    y = jax.lax.dot(oh, tb,
                                    precision=jax.lax.Precision.DEFAULT)
                    return acc + y.astype(jnp.float32).sum()
                return jax.lax.fori_loop(0, T, body, jnp.float32(0.0))
            fn = jax.jit(route)
            b, _ = timed(fn, idx, tbl)
            tflop = TOTAL * D * W * 2 / 1e12
            J(expB=f"onehot_D{D}_{dt.__name__}", ms=round(b * 1e3, 1),
              ms_per_iter=round(b * 1e3 / T, 3),
              tflops=round(tflop / b, 1),
              equiv_gbps=round(gb / b, 1))

    # --- E. wave-body overhead decomposition --------------------------
    # exact make_chunk-shaped body: gather (CH,1,9,C) + MT + min-update,
    # random rays/live state, vs the pure gather+sum control above
    p = jnp.asarray(rng.random((CH, 3)), jnp.float32)
    d_ = jnp.asarray(rng.standard_normal((CH, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, K, size=(T, CH)), jnp.int32)

    def mt_loop(idx, p, d_):
        best0 = (jnp.full((CH,), ct.T_MAX), jnp.full((CH,), -1, jnp.int32),
                 jnp.zeros((CH,), jnp.int32), jnp.zeros((CH,)),
                 jnp.zeros((CH,)))
        live = jnp.ones((CH, 1, C), bool)

        def body(i, best):
            c = jax.lax.dynamic_index_in_dim(idx, i, keepdims=False)[:, None]
            rows = rows_tbl[c[:, 0]][:, None]  # (CH, 1, 9, C)
            return ct._mt_rows(p, d_, rows, best, live, cand_cids=c)
        return jax.lax.fori_loop(0, T, body, best0)

    fn = jax.jit(mt_loop)
    b, _ = timed(fn, idx, p, d_)
    J(expE="gather_mt_minupdate", ms=round(b * 1e3, 1),
      gbps=round(gb / b, 1))

    # + the state slicing/update of the real loop (dynamic_slice in,
    # dynamic_update_slice out on an (N,) state, as run_waves does)
    NFULL = 1 << 17
    state_full = (jnp.full((NFULL,), ct.T_MAX),
                  jnp.full((NFULL,), -1, jnp.int32),
                  jnp.zeros((NFULL,), jnp.int32), jnp.zeros((NFULL,)),
                  jnp.zeros((NFULL,)))
    pfull = jnp.asarray(rng.random((NFULL, 3)), jnp.float32)
    dfull = jnp.asarray(rng.standard_normal((NFULL, 3)), jnp.float32)

    def full_loop(idx, pfull, dfull, state):
        live1 = jnp.ones((CH, 1, C), bool)

        def body(i, best):
            start = (i * 997 * CH) % (NFULL - CH)
            def sl(x):
                return jax.lax.dynamic_slice_in_dim(x, start, CH)
            c = jax.lax.dynamic_index_in_dim(idx, i, keepdims=False)[:, None]
            rows = rows_tbl[c[:, 0]][:, None]
            cur = tuple(sl(x) for x in best)
            pp = jnp.stack([sl(pfull[:, 0]), sl(pfull[:, 1]),
                            sl(pfull[:, 2])], 1)
            dd = jnp.stack([sl(dfull[:, 0]), sl(dfull[:, 1]),
                            sl(dfull[:, 2])], 1)
            new = ct._mt_rows(pp, dd, rows, cur, live1, cand_cids=c)
            return tuple(
                jax.lax.dynamic_update_slice_in_dim(f, nv, start, 0)
                for f, nv in zip(best, new))
        return jax.lax.fori_loop(0, T, body, state)

    fn = jax.jit(full_loop)
    b, _ = timed(fn, idx, pfull, dfull, state_full)
    J(expE="full_wave_body", ms=round(b * 1e3, 1), gbps=round(gb / b, 1))

    # --- G. backward-pass transpose: scatter-add vs sort+segment_sum --
    # the vjp of every attribute row-gather is a scatter-add into the
    # (V, 3) vertex/attr arrays (r2 diagnosis: backward is scatter-add-
    # bound). Candidate replacement: sort contributions by target id,
    # segment_sum. Measured head-to-head at BMW-grad shapes
    # (M hit-contributions -> V=887k rows).
    V = 887604
    for M in (1 << 17, 3 << 17):
        gid = jnp.asarray(rng.integers(0, V, size=(M,)), jnp.int32)
        vals = jnp.asarray(rng.random((M, 3)), jnp.float32)

        def scat(gid, vals):
            return jnp.zeros((V, 3)).at[gid].add(vals)

        def segsum(gid, vals):
            # multi-operand lax.sort carries the values with the key —
            # no (M, 3) narrow-row gather (per-lane gathers are the
            # measured poison)
            sid, v0, v1, v2 = jax.lax.sort(
                (gid, vals[:, 0], vals[:, 1], vals[:, 2]), num_keys=1
            )
            sv = jnp.stack([v0, v1, v2], axis=1)
            return jax.ops.segment_sum(
                sv, sid, num_segments=V, indices_are_sorted=True
            )

        for name, f in (("scatter_add", scat), ("sort_segsum", segsum)):
            fn = jax.jit(f)
            b, _ = timed(fn, gid, vals)
            J(expG=f"{name}_M{M}", ms=round(b * 1e3, 2))

    # --- H. shadow (any-hit) trace tuning: the render pays one closest
    # + one any-hit trace per bounce, both through the SAME front-table
    # config. Any-hit needs no front-to-back completeness — a shallow
    # front (early-out on first hit, exact fallback for the rest) may
    # halve the shadow half. Realistic shadow rays: camera hits ->
    # toward the lamp panel, tmax = distance.
    N = 1 << 17
    cam = camera_to_params(scene.camera)
    ids2 = jnp.arange(N, dtype=jnp.int32)
    px, py = ids2 % 512, (ids2 // 512) % 512
    u = jnp.full((N, 2), 0.5)
    pc, dc = generate_rays(cam, px, py, u, u)
    hit = jax.jit(lambda: ct.intersect_clusters(data, pc, dc))()
    hp = pc + dc * jnp.where(hit["hit"], hit["t"], 1.0)[:, None]
    lamp = jnp.asarray([0.0, 4.2, 0.0])
    dl = lamp[None, :] - hp
    dist = jnp.sqrt((dl * dl).sum(-1))
    dln = dl / dist[:, None]
    tmax = jnp.where(hit["hit"], dist - 1e-3, 0.0)  # dead lanes disabled
    base_occ = None
    for tune in ({"front_k": 32, "recompact": 8},
                 {"front_k": 8, "recompact": 0},
                 {"front_k": 16, "recompact": 8},
                 {"front_k": 8, "recompact": 0, "sc_front": 8},
                 {"front_k": 16, "recompact": 8, "wave_dedup": "onehot"}):
        fn = jax.jit(lambda p_, d_, t_, tune=tune:
                     ct.occluded_clusters(data, p_, d_, t_, **tune))
        try:
            b, occ = timed(fn, hp, dln, tmax)
            s = int(np.asarray(occ).sum())
            if base_occ is None:
                base_occ = s
            J(expH=str(tune), ms=round(b * 1e3, 1), occluded=s,
              match=s == base_occ)
        except Exception as e:  # noqa: BLE001 - log-and-continue probe
            J(expH=str(tune), error=repr(e)[:160])


CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
sys.path.insert(0, {here!r})
import jax, jax.numpy as jnp
import numpy as np
import bmw_asset
from phosphorus_mk2_tpu.accel import cluster_traverse as ct
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays

N = 1 << 17
scene = bmw_asset.load_scene("/tmp/bmw_class.abc", 512, 512)
data = attach_bvh(scene.build())
cam = camera_to_params(scene.camera)
ids = jnp.arange(N, dtype=jnp.int32)
px, py = ids % 512, (ids // 512) % 512
u = jnp.full((N, 2), 0.5)
p, d = generate_rays(cam, px, py, u, u)
tune = {tune}
fn = jax.jit(lambda p, d: ct.intersect_clusters(data, p, d, **tune))
out = jax.block_until_ready(fn(p, d))
best = 1e9
for _ in range(3):
    t0 = time.time(); out = jax.block_until_ready(fn(p, d))
    best = min(best, time.time() - t0)
print(json.dumps(dict(expC={tune}, ms=round(best*1e3, 1),
    mrays=round(N/best/1e6, 2),
    hits=int(np.asarray(out["hit"]).sum()),
    tri_sum=int(np.asarray(out["tri"]).sum()))), flush=True)
"""


def expC():
    for tune in ('{"front_k": 32, "recompact": 8}',
                 '{"front_k": 32, "recompact": 8, "wave_dedup": "gather"}',
                 '{"front_k": 32, "recompact": 8, "wave_dedup": "onehot",'
                 ' "dedup_d": 512}',
                 '{"front_k": 32, "recompact": 8, "wave_dedup": "onehot",'
                 ' "dedup_d": 1024}',
                 '{"front_k": 32, "recompact": 8, "sc_topk": "pallas_full"}'):
        code = CHILD.format(repo=os.path.dirname(HERE), here=HERE, tune=tune)
        print(f"=== expC {tune} ===", flush=True)
        subprocess.run([sys.executable, "-c", code], timeout=2400)


if __name__ == "__main__":
    if "--c-only" in sys.argv:
        expC()
    else:
        main()
        expC()
