"""Gather-wave cluster tracer — the scalable TPU traversal.

Design history (measured on TPU v5e; tools/tpu_bigscene.py,
tools/tpu_probe.py): per-node stack machines die on TPU (tiny
data-dependent iterations), dense brute force is O(N*T), and
sort+schedule wavefront variants drowned in per-step latency. The probe
that settled the design: **row-gathers are fast on TPU** — (65536,)
indices into a (K, 1280) table run at effective cache bandwidth
(~0.06 ms; embedding lookups are TPU bread and butter). Per-LANE gathers
are catastrophic; per-ROW gathers are free.

So the tracer is three dense primitives per wave, no sorting at all:

1. build once: a dense (N, K) cluster slab table (tnear per
   ray x cluster), K = triangles / CLUSTER_TRIS, clusters = contiguous
   runs of BVH-leaf-ordered triangles (spatially coherent by SAH
   construction);
2. each wave, every live ray picks its nearest pending cluster with
   tnear < best_t (front-to-back, exact early termination) — a masked
   argmin over (N, K);
3. one row-gather pulls each ray's chosen cluster triangles
   (N, 10*C floats) and a dense (N, C) Moller-Trumbore min-update
   finishes the wave.

Wave count is bounded by the max cluster overlap per ray (~4-16);
closest-hit pruning and any-hit early-out cut it further. Correctness
oracle: intersect_brute (tests/test_bvh.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from phosphorus_mk2_tpu.accel.intersect import T_MAX


def _cluster_rows(scene):
    """(K, 10, C) triangle component rows; gathered per ray each wave.
    (Recomputed per call from the attach-time tables — a pure stack that
    XLA folds/CSEs; no mutation of the scene pytree under trace.)"""
    bvh = scene.bvh
    a, e0, e1 = bvh["cluster_a"], bvh["cluster_e0"], bvh["cluster_e1"]
    ids = bvh["cluster_id"].astype(jnp.float32)
    return jnp.stack(
        [
            a[..., 0], a[..., 1], a[..., 2],
            e0[..., 0], e0[..., 1], e0[..., 2],
            e1[..., 0], e1[..., 1], e1[..., 2],
            ids,
        ],
        axis=1,
    )  # (K, 10, C)


def _slab_all(p, d, bmin, bmax):
    """(N, K) cluster slab test. Returns (hit, tnear >= 0)."""
    bmin = bmin.astype(jnp.float32)  # bf16 tables upcast after the load
    bmax = bmax.astype(jnp.float32)
    inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)
    t0 = (bmin[None] - p[:, None]) * inv[:, None]
    t1 = (bmax[None] - p[:, None]) * inv[:, None]
    tn = jnp.minimum(t0, t1).max(axis=-1)
    tf = jnp.maximum(t0, t1).min(axis=-1)
    hit = (tn <= tf) & (tf >= 0.0)
    return hit, jnp.maximum(tn, 0.0)


def _mt_rows(p, d, rows, best, live):
    """Dense per-ray MT against each ray's own cluster row.

    p, d: (N, 3); rows: (N, 10, C); best: (t, tri, u, v) each (N,).
    live: (N,) ray mask, or (N, C) per-candidate mask (wave batching) —
    dead rays/candidates keep their records.
    """
    px, py, pz = p[:, 0:1], p[:, 1:2], p[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    ax, ay, az = rows[:, 0], rows[:, 1], rows[:, 2]
    e0x, e0y, e0z = rows[:, 3], rows[:, 4], rows[:, 5]
    e1x, e1y, e1z = rows[:, 6], rows[:, 7], rows[:, 8]
    ids = rows[:, 9]

    pvx = dy * e1z - dz * e1y
    pvy = dz * e1x - dx * e1z
    pvz = dx * e1y - dy * e1x
    det = e0x * pvx + e0y * pvy + e0z * pvz
    near0 = jnp.abs(det) < 1e-8
    ood = 1.0 / jnp.where(near0, 1.0, det)
    tx = px - ax
    ty = py - ay
    tz = pz - az
    u = (tx * pvx + ty * pvy + tz * pvz) * ood
    qvx = ty * e0z - tz * e0y
    qvy = tz * e0x - tx * e0z
    qvz = tx * e0y - ty * e0x
    v = (dx * qvx + dy * qvy + dz * qvz) * ood
    t = (e1x * qvx + e1y * qvy + e1z * qvz) * ood

    best_t, best_tri, best_u, best_v = best
    ok = (
        ~near0
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= 0.0)
        & (t < best_t[:, None])
        & (live[:, None] if live.ndim == 1 else live)
    )
    t_m = jnp.where(ok, t, T_MAX)
    j = jnp.argmin(t_m, axis=1)
    nrows = jnp.arange(t_m.shape[0])
    better = ok[nrows, j]
    return (
        jnp.where(better, t_m[nrows, j], best_t),
        jnp.where(better, ids[nrows, j].astype(jnp.int32), best_tri),
        jnp.where(better, u[nrows, j], best_u),
        jnp.where(better, v[nrows, j], best_v),
    )


MAX_FRONT = 64  # per-ray front-to-back cluster table depth (top-k);
                # rays overlapping more clusters finish in the exact
                # fallback pass
DENSE_K = 2048  # above this many clusters the (N, K) slab table would
                # blow HBM; the front table is built hierarchically via
                # superclusters instead
SC_FRONT = 16   # supercluster table depth in hierarchical mode (p99 sc
                # overlap is ~8; the exact fallback covers overflow)


def _table(bvh, name, slab_bf16):
    """Bounds table, preferring the outward-rounded bf16 copy when the
    slab_bf16 tunable is on (conservative: boxes only grow)."""
    if slab_bf16 and name + "_bf16" in bvh:
        return bvh[name + "_bf16"]
    return bvh[name]


def _front_table_dense(pp, dd, bvh, t_limit, kk, slab_bf16=False):
    """Dense (N, K) slab + top-k front table. Returns (ttbl, ctbl)."""
    hit_tbl, tn_tbl = _slab_all(
        pp, dd,
        _table(bvh, "cluster_bmin", slab_bf16),
        _table(bvh, "cluster_bmax", slab_bf16),
    )
    pending0 = hit_tbl & (tn_tbl < t_limit[:, None])
    tn_m0 = jnp.where(pending0, tn_tbl, T_MAX)
    neg_top, ctbl = jax.lax.top_k(-tn_m0, kk)
    return -neg_top, ctbl, jnp.float32(T_MAX)  # sc horizon: fully covered


def _front_table_hierarchical(pp, dd, bvh, t_limit, kk, expand_batch=1,
                              slab_bf16=False):
    """Supercluster-culled front table for big scenes: (N, K2) slab over
    supercluster bounds -> per-ray top-J superclusters -> expand each
    ray's superclusters (member-bounds row-gather, 16-wide slab) and
    merge into a running top-kk cluster table. All memory O(N * kk).

    Returns (ttbl, ctbl, sc_horizon (N,)) — sc_horizon is the J-th
    supercluster entry distance: clusters beyond it are NOT in the
    table, so rays whose best hit is farther need the exact fallback.
    """
    from phosphorus_mk2_tpu.accel.bvh_builder import SUPER_CLUSTERS as SC

    sc_hit, sc_tn = _slab_all(
        pp, dd,
        _table(bvh, "sc_bmin", slab_bf16),
        _table(bvh, "sc_bmax", slab_bf16),
    )
    K2 = sc_tn.shape[1]
    jj = min(SC_FRONT, K2)
    sc_m = jnp.where(sc_hit & (sc_tn < t_limit[:, None]), sc_tn, T_MAX)
    sc_neg, sctbl = jax.lax.top_k(-sc_m, jj)  # (N, jj)
    sc_ttbl = -sc_neg
    sc_horizon = sc_ttbl[:, -1]

    mbmin = _table(bvh, "sc_member_bmin", slab_bf16)  # (K2, SC, 3)
    mbmax = _table(bvh, "sc_member_bmax", slab_bf16)
    n = pp.shape[0]
    inv = 1.0 / jnp.where(dd == 0.0, 1e-30, dd)

    # collect ALL candidate member clusters first (scan, (N, jj*SC)),
    # then a SINGLE top-k — a per-iteration top-k merge measures 30x
    # slower on TPU (tools/tpu_terrain2.py: 1.16 s of a 1.21 s trace).
    # expand_batch superclusters expand per scan step (>= jj collapses
    # the scan to ONE member-bounds row-gather — a launch-count lever;
    # batching was NEUTRAL at round-1 shapes, re-probed per scene class).
    B = max(1, min(expand_batch, jj))
    G = -(-jj // B)
    pad = G * B - jj
    sct = jnp.pad(sctbl, ((0, 0), (0, pad)))
    live_col = jnp.pad(sc_ttbl < T_MAX, ((0, 0), (0, pad)))

    def expand(_, g):
        sc_b = jax.lax.dynamic_slice(sct, (0, g * B), (n, B))      # (N, B)
        live = jax.lax.dynamic_slice(live_col, (0, g * B), (n, B))
        bmin = mbmin[jnp.where(live, sc_b, 0)].astype(jnp.float32)  # (N, B, SC, 3)
        bmax = mbmax[jnp.where(live, sc_b, 0)].astype(jnp.float32)
        t0 = (bmin - pp[:, None, None]) * inv[:, None, None]
        t1 = (bmax - pp[:, None, None]) * inv[:, None, None]
        tn = jnp.minimum(t0, t1).max(axis=-1)   # (N, B, SC)
        tf = jnp.maximum(t0, t1).min(axis=-1)
        hit = (
            (tn <= tf) & (tf >= 0.0) & live[:, :, None]
            & (tn < t_limit[:, None, None])
        )
        tn = jnp.where(hit, jnp.maximum(tn, 0.0), T_MAX)
        return None, tn.reshape(n, B * SC)

    _, cand_t = jax.lax.scan(expand, None, jnp.arange(G))
    cand_t = jnp.moveaxis(cand_t, 0, 1).reshape(n, G * B * SC)
    jj_cols = G * B  # selected-supercluster columns incl. padding

    # key-packing sort: the candidate COLUMN index (j*SC + m < jj*SC,
    # 8 bits at the default jj=SC=16 — independent of the cluster count
    # K) rides in the low mantissa bits of the (nonnegative) tnear, so
    # ONE row-sort yields both tables with zero per-element gathers (a
    # (N,kk) fancy-index gather here measured ~100x the sort cost on
    # TPU). The global cluster id is reconstructed after the sort with
    # jj broadcast-selects over the per-ray supercluster table
    # (cid = sctbl[:, col//SC]*SC + col%SC) — gather-free, and no
    # 32767-cluster ceiling like the old id-in-key scheme. Mantissa
    # truncation only lowers tn — conservative for the horizon test.
    ncand = jj_cols * SC
    nbits = max(1, (ncand - 1).bit_length())
    key_mask = jnp.uint32(0xFFFFFFFF ^ ((1 << nbits) - 1))
    bits = jax.lax.bitcast_convert_type(cand_t, jnp.uint32)
    col = jnp.arange(ncand, dtype=jnp.uint32)[None, :]
    packed = (bits & key_mask) | col
    packed = jnp.sort(packed, axis=1)[:, :kk]
    key_bits = packed & key_mask
    tmax_key = (
        jax.lax.bitcast_convert_type(jnp.float32(T_MAX), jnp.uint32)
        & key_mask
    )
    col_s = (packed & jnp.uint32((1 << nbits) - 1)).astype(jnp.int32)
    j_idx = col_s // SC
    sc_sel = jnp.zeros_like(col_s)
    for j in range(jj_cols):  # static <= ~2*jj: dense selects, no gather
        sc_sel = jnp.where(j_idx == j, sct[:, j : j + 1], sc_sel)
    ctbl = sc_sel * SC + col_s % SC
    ttbl = jnp.where(
        key_bits >= tmax_key,
        T_MAX,
        jax.lax.bitcast_convert_type(key_bits, jnp.float32),
    )
    return ttbl, ctbl, sc_horizon


def _trace(scene, p, d, t_limit, any_hit,
           dense_waves=0, chunk=8192, dense_chunk=16384, expand_batch=1,
           slab_bf16=False):
    """Core trace. Tunables (defaults = round-1 measured config):

    dense_waves: process the first W0 front-table columns for ALL rays
      in one fat masked gather per chunk (launch-count lever on this
      launch-bound platform: at mean overlap ~2.6, columns 0..3 are
      mostly live so the masked over-gather is small, while the
      per-wave while-loop shrinks to the straggler tail only).
    chunk / dense_chunk: ray-chunk sizes for the straggler loop / the
      dense phase (bigger chunk = fewer launches, more HBM per gather).
    expand_batch: superclusters expanded per front-table step; >= jj
      collapses the jj-step scan into ONE member-bounds row-gather.
    slab_bf16: slab tests read the outward-rounded bf16 bounds tables
      (half the gather bytes; conservative — boxes only grow, the MT
      stage stays f32-exact).
    """
    bvh = scene.bvh
    rows_tbl = _cluster_rows(scene)
    K = rows_tbl.shape[0]
    n = p.shape[0]

    pp = jax.lax.stop_gradient(p)
    dd = jax.lax.stop_gradient(d)
    # the traversal is primal-only (ids/visibility; the differentiable
    # path re-evaluates hits via reintersect) — sever t_limit too, or a
    # tangent-carrying shadow tmax (e.g. from the consolidated light-tri
    # rows, whose emission columns are trainable) drags the dynamic
    # fori/while loops into the backward graph, which has no reverse rule
    t_limit = jax.lax.stop_gradient(t_limit)

    kk = min(MAX_FRONT, K)
    hierarchical = K > DENSE_K and "sc_bmin" in bvh
    if hierarchical:
        ttbl, ctbl, sc_horizon = _front_table_hierarchical(
            pp, dd, bvh, t_limit, kk, expand_batch=expand_batch,
            slab_bf16=slab_bf16,
        )
    else:
        ttbl, ctbl, sc_horizon = _front_table_dense(
            pp, dd, bvh, t_limit, kk, slab_bf16=slab_bf16
        )
    kth_tn = jnp.minimum(ttbl[:, -1], sc_horizon)  # per-ray covered horizon

    # --- straggler compaction: overlap counts are known up front, so
    # sort rays by descending work; wave w only touches the prefix of
    # rays with > w overlapped clusters, processed in fixed chunks with
    # a dynamic trip count. Dead lanes never reach the MT kernel.
    overlap = (ttbl < T_MAX).sum(axis=1)  # (N,)
    order = jnp.argsort(-overlap)
    inv = jnp.argsort(order)
    sp_p = pp[order]
    sp_d = dd[order]
    s_ctbl = ctbl[order]
    s_ttbl = ttbl[order]
    s_limit = t_limit[order]
    # rays alive at wave w (sorted prefix length), (kk,)
    alive_at = (overlap[None, :] > jnp.arange(kk)[:, None]).sum(axis=1)

    CH = min(chunk, n)
    n_chunks_cap = (n + CH - 1) // CH
    # waves per while-iteration in the straggler loop. Measured on the
    # 1M-tri terrain: WW=4 across ALL waves is SLOWER (137 vs 117 ms) —
    # deep in the tail liveness is sparse and the 4x masked extra
    # row-gather work beats the iteration savings. The dense_waves
    # phase batches only the HEAD columns, where liveness is high.
    WW = 1

    state0 = (
        s_limit,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
    )

    def make_chunk(w_eff, ww, ch, p_src, d_src):
        def chunk_fn(ci, best):
            sbt, sbtri, sbu, sbv = best
            start = jnp.minimum(ci * ch, n - ch)

            def sl(x):
                return jax.lax.dynamic_slice_in_dim(x, start, ch)

            def sl2(x):
                return jax.lax.dynamic_slice(x, (start, w_eff), (ch, ww))

            c = sl2(s_ctbl)          # (ch, ww)
            tn_c = sl2(s_ttbl)       # (ch, ww)
            cur = (sl(sbt), sl(sbtri), sl(sbu), sl(sbv))
            live = (tn_c < cur[0][:, None]) & (tn_c < T_MAX)
            if any_hit:
                live = live & (cur[1] < 0)[:, None]
            rows = rows_tbl[jnp.where(live, c, 0)]  # (ch, ww, 10, C)
            C = rows.shape[-1]
            rows = rows.transpose(0, 2, 1, 3).reshape(ch, 10, ww * C)
            live_el = jnp.broadcast_to(
                live[:, :, None], (ch, ww, C)
            ).reshape(ch, ww * C)
            new = _mt_rows(
                jnp.stack([sl(p_src[:, 0]), sl(p_src[:, 1]), sl(p_src[:, 2])], 1),
                jnp.stack([sl(d_src[:, 0]), sl(d_src[:, 1]), sl(d_src[:, 2])], 1),
                rows,
                cur,
                live_el,
            )
            return tuple(
                jax.lax.dynamic_update_slice_in_dim(full, nv, start, 0)
                for full, nv in zip(best, new)
            )

        return chunk_fn

    # --- dense head phase: columns [0, W0) for every ray, fat chunks
    W0 = min(dense_waves, kk) if dense_waves else 0
    if W0 > 0:
        CHD = min(dense_chunk, n)
        dense_fn = make_chunk(0, W0, CHD, sp_p, sp_d)
        state0 = jax.lax.fori_loop(0, (n + CHD - 1) // CHD, dense_fn, state0)

    def wave_cond(carry):
        w, go = carry[0], carry[1]
        return go & (w < kk)

    def wave_body(carry):
        w, _, best = carry
        a_w = jax.lax.dynamic_index_in_dim(alive_at, w, keepdims=False)

        w_eff = jnp.minimum(w, kk - WW)  # clamp: re-tested columns are
        # duplicates the min-reduction ignores
        chunk_fn = make_chunk(w_eff, WW, CH, sp_p, sp_d)

        n_ch = jnp.minimum((a_w + CH - 1) // CH, n_chunks_cap)
        best = jax.lax.fori_loop(0, n_ch, chunk_fn, best)
        w = w + WW
        go = w < kk
        go = go & (jax.lax.dynamic_index_in_dim(
            alive_at, jnp.minimum(w, kk - 1), keepdims=False
        ) > 0)
        return w, go, best

    go0 = (
        (ttbl[:, W0] < T_MAX).any() if W0 < kk else jnp.asarray(False)
    )
    _, _, state = jax.lax.while_loop(
        wave_cond, wave_body, (jnp.int32(W0), go0, state0)
    )
    best_t = state[0][inv]
    best_tri = state[1][inv]
    best_u = state[2][inv]
    best_v = state[3][inv]

    # --- exact fallback for rays whose front table did not cover their
    # hit range (table overflow or supercluster horizon): brute-force
    # every cluster for the needy rays only, via the same sorted
    # prefix-chunk compaction. Rare, exact, scene-size-linear.
    needy = kth_tn < best_t
    if any_hit:
        needy = needy & (best_tri < 0)

    def fallback(args):
        best_t, best_tri, best_u, best_v = args
        order2 = jnp.argsort(~needy)  # needy rays first
        inv2 = jnp.argsort(order2)
        f_p = pp[order2]
        f_d = dd[order2]
        fb = (best_t[order2], best_tri[order2], best_u[order2], best_v[order2])
        a_n = needy.sum()
        # batch CC clusters per fori iteration: a one-cluster body is the
        # tiny-loop poison (measured: 3 needy rays over K=9905 clusters
        # cost 2.2 s at CC=1 vs ~0.1 s batched — the loop trip count is
        # what kills, not the math)
        CH2 = min(256, n)
        C = rows_tbl.shape[2]
        CC = min(64, K)

        def ray_chunk(ci, fb):
            start = jnp.minimum(ci * CH2, n - CH2)

            def sl(x):
                return jax.lax.dynamic_slice_in_dim(x, start, CH2)

            cur = tuple(sl(x) for x in fb)
            rp = jnp.stack([sl(f_p[:, 0]), sl(f_p[:, 1]), sl(f_p[:, 2])], 1)
            rd = jnp.stack([sl(f_d[:, 0]), sl(f_d[:, 1]), sl(f_d[:, 2])], 1)
            live = jnp.ones((CH2,), bool)

            def cl(k, cur):
                cstart = jnp.minimum(k * CC, K - CC)  # overlap-safe clamp
                rows = jax.lax.dynamic_slice_in_dim(rows_tbl, cstart, CC)
                rows = rows.transpose(1, 0, 2).reshape(10, CC * C)
                rows = jnp.broadcast_to(rows[None], (CH2, 10, CC * C))
                return _mt_rows(rp, rd, rows, cur, live)

            cur = jax.lax.fori_loop(0, (K + CC - 1) // CC, cl, cur)
            return tuple(
                jax.lax.dynamic_update_slice_in_dim(full, nv, start, 0)
                for full, nv in zip(fb, cur)
            )

        n_rc = jnp.minimum((a_n + CH2 - 1) // CH2, (n + CH2 - 1) // CH2)
        fb = jax.lax.fori_loop(0, n_rc, ray_chunk, fb)
        return tuple(x[inv2] for x in fb)

    best_t, best_tri, best_u, best_v = jax.lax.cond(
        needy.any(),
        fallback,
        lambda args: args,
        (best_t, best_tri, best_u, best_v),
    )
    return best_t, best_tri, best_u, best_v


def intersect_clusters(scene, p, d, tmax=None, **tune):
    """Closest-hit via the gather-wave cluster tracer.

    tune: dense_waves / chunk / dense_chunk / expand_batch (see _trace).
    """
    n = p.shape[0]
    t0 = jnp.full((n,), T_MAX) if tmax is None else tmax
    t, tri, u, v = _trace(scene, p, d, t0, False, **tune)
    return {"t": t, "tri": tri, "u": u, "v": v, "hit": tri >= 0}


def occluded_clusters(scene, p, d, tmax, **tune):
    """Any-hit via the gather-wave cluster tracer (tmax <= 0 disables)."""
    disabled = tmax <= 0.0
    t0 = jnp.where(disabled, 1e-6, tmax)
    _, tri, _, _ = _trace(scene, p, d, t0, True, **tune)
    return (tri >= 0) & ~disabled
