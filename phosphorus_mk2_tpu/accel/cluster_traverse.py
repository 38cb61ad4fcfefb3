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


def _cluster_rows(scene, bf16: bool = False):
    """(K, 9, C) triangle component rows (a|e0|e1); gathered per ray
    each wave. (Recomputed per call from the attach-time tables — a pure
    stack that XLA folds/CSEs; no mutation of the scene pytree under
    trace.)

    The winner is tracked as (cluster, lane) and mapped to a triangle id
    once per trace, so no ids row rides in every wave gather (the wave
    loop is gather-BANDWIDTH bound at BMW scale: 132 ms for the 5.2 GB
    dense-8 microbench, tools/tpu_r3b_split.py — every byte in the row
    costs). bf16=True halves the gather bytes again; the MT runs on
    bf16-quantized geometry, which can flip the winner between surfaces
    closer than ~0.4% and miss rays within that band of a silhouette —
    acceptable for shadow (any-hit) traces, a measured tunable for
    closest-hit.
    """
    bvh = scene.bvh
    a, e0, e1 = bvh["cluster_a"], bvh["cluster_e0"], bvh["cluster_e1"]
    rows = jnp.stack(
        [
            a[..., 0], a[..., 1], a[..., 2],
            e0[..., 0], e0[..., 1], e0[..., 2],
            e1[..., 0], e1[..., 1], e1[..., 2],
        ],
        axis=1,
    )  # (K, 9, C)
    return rows.astype(jnp.bfloat16) if bf16 else rows


def _slab_all(p, d, bmin, bmax):
    """(N, K) cluster slab test. Returns (hit, tnear >= 0).

    Accumulates tn/tf per AXIS over (N, K) arrays instead of reducing a
    broadcast (N, K, 3) tensor: the 3-axis form materializes ~2 GB of
    t0/t1 intermediates at BMW shapes (the measured 29.6 ms of the
    "slab" stage, tools/tpu_r3b_split.py, is HBM churn, not compute).
    """
    bmin = bmin.astype(jnp.float32)  # bf16 tables upcast after the load
    bmax = bmax.astype(jnp.float32)
    inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)
    tn = None
    tf = None
    for a in range(3):
        t0 = (bmin[None, :, a] - p[:, None, a]) * inv[:, None, a]
        t1 = (bmax[None, :, a] - p[:, None, a]) * inv[:, None, a]
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        tn = lo if tn is None else jnp.maximum(tn, lo)
        tf = hi if tf is None else jnp.minimum(tf, hi)
    hit = (tn <= tf) & (tf >= 0.0)
    return hit, jnp.maximum(tn, 0.0)


def _mt_rows(p, d, rows, best, live, cand_cids=None, cand_base=None):
    """Dense per-ray MT against each ray's own cluster row(s).

    p, d: (N, 3); rows: (N, W, 9, C) f32 component rows (a|e0|e1) — the
    GATHERED layout, never transposed: a physical (N, W, 9, C) ->
    (N, 9, W*C) relayout measured as the dominant wave-loop cost at BMW
    scale (tools/tpu_r3b_split.py dense8 132 ms vs ~35 ms of gather
    traffic at the measured 125 GB/s). Component slices are strided
    views XLA fuses into the elementwise MT chain.
    best: (t, cid, lane) each (N,) — the winner is a (cluster, lane)
    pair, mapped to a triangle id once per trace; u/v are re-derived
    from the winner by the public wrappers when asked for.
    live: (N,) ray mask, or (N, W, C) per-candidate mask — dead
    rays/candidates keep their records.
    The winner's cluster id comes from exactly one of:
      cand_cids: (N, W) int32 table — candidate block jc selected
        gather-free with W static broadcast-selects;
      cand_base: (N,) int32 — candidates are the contiguous clusters
        cand_base + jc (the exact-fallback sweep): pure arithmetic.
    """
    n, W, _, C = rows.shape
    px, py, pz = p[:, 0:1, None], p[:, 1:2, None], p[:, 2:3, None]
    dx, dy, dz = d[:, 0:1, None], d[:, 1:2, None], d[:, 2:3, None]
    # NOTE winner extraction below is REDUCTION-based (min + masked-iota
    # min + broadcast-selects): the previous arr[rows, argmin] form did
    # five per-LANE fancy-index gathers per wave — the measured TPU
    # poison (ARCHITECTURE.md layout rules; r4l expE: the wave body ran
    # at 50 GB/s vs 145 GB/s for its gather stream alone). u/v are not
    # tracked at all: the only consumers re-derive them from the winner
    # (intersect_clusters re-evaluates once per trace; the integrator
    # reintersects differentiably anyway), and dropping them removes
    # two more extractions plus two (N,) carries from every state move.
    ax, ay, az = rows[:, :, 0], rows[:, :, 1], rows[:, :, 2]    # (N, W, C)
    e0x, e0y, e0z = rows[:, :, 3], rows[:, :, 4], rows[:, :, 5]
    e1x, e1y, e1z = rows[:, :, 6], rows[:, :, 7], rows[:, :, 8]

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

    best_t, best_cid, best_lane = best
    ok = (
        ~near0
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= 0.0)
        & (t < best_t[:, None, None])
        & (live[:, None, None] if live.ndim == 1 else live)
    )
    t_m = jnp.where(ok, t, T_MAX).reshape(n, W * C)
    t_new = t_m.min(axis=1)
    better = t_new < best_t  # t_m already gated on t < best_t
    # first flat index attaining the min (argmin tie semantics), via a
    # masked-iota min-reduce instead of argmin + fancy-index extraction
    col = jnp.arange(W * C, dtype=jnp.int32)[None, :]
    j = jnp.where(t_m == t_new[:, None], col, jnp.int32(1 << 30)).min(axis=1)
    j = jnp.where(better, j, 0)

    jc = j // C
    lane_new = j % C
    if cand_cids is not None:
        cid_new = jnp.zeros_like(j)
        for k in range(W):  # static selects, no gather
            cid_new = jnp.where(jc == k, cand_cids[:, k], cid_new)
    else:
        cid_new = cand_base + jc
    return (
        jnp.where(better, t_new, best_t),
        jnp.where(better, cid_new, best_cid),
        jnp.where(better, lane_new, best_lane),
    )


MAX_FRONT = 32  # per-ray front-to-back cluster table depth (top-k);
                # rays overlapping more clusters finish in the exact
                # fallback pass. 48 vs 64 measured ~equal at BMW scale
                # (tools/tpu_r3h_axis.py); 32 + recompact measured BEST
                # in round 4 (tools/tpu_r4c_waveloop.py: 167.7 vs 185.8
                # ms at the old defaults); front_k overrides per trace
from phosphorus_mk2_tpu.accel.bvh_builder import (  # noqa: E402
    DENSE_CLUSTERS as DENSE_K,  # above this many clusters the (N, K)
    # slab table would blow HBM; the front table is built hierarchically
    # via superclusters instead (builder lays big scenes out nested)
)
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


def _key_consts(nvals):
    """Packed-key constants for embedding an id in [0, nvals) into the
    low mantissa bits of a nonnegative f32 tnear key. Returns
    (key_mask, tmax_key, nbits)."""
    nbits = max(1, (nvals - 1).bit_length())
    key_mask = jnp.uint32(0xFFFFFFFF ^ ((1 << nbits) - 1))
    tmax_key = (
        jax.lax.bitcast_convert_type(jnp.float32(T_MAX), jnp.uint32)
        & key_mask
    )
    return key_mask, tmax_key, nbits


def _pack_cols(cand_t, ncols):
    """Pack the column index into the low mantissa bits of nonnegative
    tnear keys (bit order = float order for nonneg f32). Truncation only
    lowers tn — conservative for horizon tests. Returns (packed uint32,
    key_mask, tmax_key, nbits)."""
    key_mask, tmax_key, nbits = _key_consts(ncols)
    bits = jax.lax.bitcast_convert_type(cand_t, jnp.uint32)
    col = jnp.arange(ncols, dtype=jnp.uint32)[None, :]
    packed = (bits & key_mask) | col
    return packed, key_mask, tmax_key, nbits


def _unpack_keys(packed, key_mask, tmax_key, nbits):
    """Split sorted packed keys back into (tnear (…), col (…))."""
    key_bits = packed & key_mask
    col = (packed & jnp.uint32((1 << nbits) - 1)).astype(jnp.int32)
    t = jnp.where(
        key_bits >= tmax_key,
        T_MAX,
        jax.lax.bitcast_convert_type(key_bits, jnp.float32),
    )
    return t, col


def _select_topk(cand_t, k, mode="sort"):
    """Per-ray k nearest candidate columns of cand_t (N, M), front-to-
    back. Returns (t (N,k), col (N,k)) with zero per-element gathers.

    mode "sort": ONE packed row-sort (a (N,k) fancy-index gather here
    measured ~100x the sort cost on TPU — pack payloads into keys).
    mode "extract": k rounds of min-reduce + mask — O(k*M) compares but
    no sort network; wins when M is wide and k is small (the top_k over
    (N, K2) superclusters was 60 ms of the 258 ms BMW trace).
    """
    M = cand_t.shape[1]
    packed, key_mask, tmax_key, nbits = _pack_cols(cand_t, M)
    if mode == "extract":
        outs = []
        for _ in range(k):
            m = packed.min(axis=1)
            outs.append(m)
            packed = jnp.where(
                packed == m[:, None], jnp.uint32(0xFFFFFFFF), packed
            )
        sel = jnp.stack(outs, axis=1)  # (N, k) ascending
    else:
        sel = jnp.sort(packed, axis=1)[:, :k]
    return _unpack_keys(sel, key_mask, tmax_key, nbits)


def _expand_members(pp, dd, mbmin, mbmax, ptbl, p_ttbl, t_limit,
                    expand_batch=1):
    """Row-gather the member bounds of each ray's selected parents and
    slab-test them: ptbl (N, jj) parent ids (validity = p_ttbl < T_MAX),
    mbmin/mbmax (P, SC, 3). Returns cand_t (N, jj*SC) member tnear.

    Collect ALL candidates first (scan), then ONE selection — a
    per-iteration top-k merge measures 30x slower on TPU
    (tools/tpu_terrain2.py: 1.16 s of a 1.21 s trace). expand_batch
    parents expand per scan step (>= jj collapses the scan to ONE
    member-bounds row-gather — a launch-count lever; batching was
    NEUTRAL at round-1 shapes, re-probed per scene class).
    """
    n = pp.shape[0]
    jj = ptbl.shape[1]
    SC = mbmin.shape[1]
    inv = 1.0 / jnp.where(dd == 0.0, 1e-30, dd)

    # ONE merged-bounds gather per step instead of separate bmin/bmax
    # gathers: same bytes, half the row fetches (gathers measured
    # byte-bound but each gather op carries fixed overhead in the scan)
    mb6 = jnp.concatenate(
        [mbmin.astype(jnp.float32), mbmax.astype(jnp.float32)], axis=-1
    )  # (P, SC, 6) — scene-derived, hoisted out of the trace by XLA

    B = max(1, min(expand_batch, jj))
    G = -(-jj // B)
    pad = G * B - jj
    sct = jnp.pad(ptbl, ((0, 0), (0, pad)))
    live_col = jnp.pad(p_ttbl < T_MAX, ((0, 0), (0, pad)))

    def expand(_, g):
        sc_b = jax.lax.dynamic_slice(sct, (0, g * B), (n, B))      # (N, B)
        live = jax.lax.dynamic_slice(live_col, (0, g * B), (n, B))
        rows6 = mb6[jnp.where(live, sc_b, 0)]  # (N, B, SC, 6)
        tn = None  # per-axis accumulation: see _slab_all (no (…, 3)
        tf = None  # broadcast intermediates in HBM)
        for a in range(3):
            t0 = (rows6[..., a] - pp[:, None, None, a]) * inv[:, None, None, a]
            t1 = (rows6[..., 3 + a] - pp[:, None, None, a]) * inv[:, None, None, a]
            lo = jnp.minimum(t0, t1)
            hi = jnp.maximum(t0, t1)
            tn = lo if tn is None else jnp.maximum(tn, lo)
            tf = hi if tf is None else jnp.minimum(tf, hi)
        hit = (
            (tn <= tf) & (tf >= 0.0) & live[:, :, None]
            & (tn < t_limit[:, None, None])
        )
        tn = jnp.where(hit, jnp.maximum(tn, 0.0), T_MAX)
        return None, tn.reshape(n, B * SC)

    if G == 1:  # no scan: a single fused gather+slab
        _, cand_t = expand(None, jnp.int32(0))
        return cand_t, sct
    _, cand_t = jax.lax.scan(expand, None, jnp.arange(G))
    cand_t = jnp.moveaxis(cand_t, 0, 1).reshape(n, G * B * SC)
    return cand_t, sct


def _reconstruct_ids(ptbl, col, SC):
    """Global member id from a selected candidate column: parent id from
    the per-ray (padded) parent table via static broadcast-selects
    (gather-free, no 32767-id ceiling), member = col % SC."""
    j_idx = col // SC
    sel = jnp.zeros_like(col)
    for j in range(ptbl.shape[1]):  # static <= ~2*jj: selects, no gather
        sel = jnp.where(j_idx == j, ptbl[:, j : j + 1], sel)
    return sel * SC + col % SC


def _front_table_hierarchical(pp, dd, bvh, t_limit, kk, expand_batch=1,
                              slab_bf16=False, levels=2, sc_topk="topk",
                              sc_front=0):
    """Supercluster-culled front table for big scenes: slab the coarsest
    level -> per-ray top-J -> expand each ray's selections (member-
    bounds row-gather, 16-wide slab) -> next level, ending in a top-kk
    cluster table. All memory O(N * width), never O(N * K).

    levels=2: (N, K2) supercluster slab seeds the table (round-2 path).
    levels=3: (N, K3) super-supercluster slab seeds it — the K2-wide
    slab+top_k was the measured bottleneck at BMW scale (60 ms of
    258 ms, ARCHITECTURE.md); K3 = K2/16 makes the seed negligible and
    every later stage is O(N * 128) regardless of scene size.

    Returns (ttbl, ctbl, horizon (N,)) — horizon is the nearest
    not-covered entry distance across all levels: clusters beyond it
    are NOT in the table, so rays whose best hit is farther need the
    exact fallback.
    """
    from phosphorus_mk2_tpu.accel.bvh_builder import SUPER_CLUSTERS as SC

    sc_front = sc_front or SC_FRONT
    if sc_topk == "auto":
        # fused Pallas front on real TPU 2-level traces (BMW trace
        # 139.4 -> see tools/tpu_r4o_frontv2.py); the XLA extract form
        # everywhere else (CPU/interpret runs the kernel 100x slower,
        # and the 3-level path has no fused kernel)
        sc_topk = (
            "pallas_full"
            if jax.default_backend() == "tpu"
            and not (levels >= 3 and "ssc_bmin" in bvh)
            else "extract"
        )
    if levels >= 3 and "ssc_bmin" in bvh:
        s3_hit, s3_tn = _slab_all(
            pp, dd,
            _table(bvh, "ssc_bmin", slab_bf16),
            _table(bvh, "ssc_bmax", slab_bf16),
        )
        K3 = s3_tn.shape[1]
        j3 = min(sc_front, K3)
        s3_m = jnp.where(s3_hit & (s3_tn < t_limit[:, None]), s3_tn, T_MAX)
        s3_ttbl, s3_tbl = _select_topk(s3_m, j3, mode="extract")
        horizon = s3_ttbl[:, -1]

        sc_cand, s3_pad = _expand_members(
            pp, dd,
            _table(bvh, "ssc_member_bmin", slab_bf16),
            _table(bvh, "ssc_member_bmax", slab_bf16),
            s3_tbl, s3_ttbl, t_limit, expand_batch=sc_front,
        )
        jj = min(sc_front, sc_cand.shape[1])
        sc_ttbl, sc_col = _select_topk(sc_cand, jj, mode=sc_topk)
        sctbl = _reconstruct_ids(s3_pad, sc_col, SC)
        horizon = jnp.minimum(horizon, sc_ttbl[:, -1])
    else:
        K2 = bvh["sc_bmin"].shape[0]
        jj = min(sc_front, K2)
        if sc_topk == "pallas_full":
            # whole front table in ONE kernel: slab + extract + member
            # expand (one-hot MXU matmul over the VMEM-resident member
            # table) + final top-kk — zero (N, K2)-class HBM round
            # trips (accel/pallas_front.front_all_pallas). Bit-parity
            # caveat: parent keys truncate to bit_length(K2p-1) mantissa
            # bits (K2 padded to 128) vs the XLA path's bit_length(K2-1)
            # — identical unless padding crosses a power of two.
            from phosphorus_mk2_tpu.accel.pallas_front import (
                front_all_pallas,
            )

            bounds6 = jnp.concatenate(
                [bvh["sc_bmin"], bvh["sc_bmax"]], axis=1
            )
            ttbl, col, pt, pid = front_all_pallas(
                bounds6, bvh["sc_member_bmin"], bvh["sc_member_bmax"],
                pp, dd, t_limit, jj=jj, kk=kk,
                interpret=jax.default_backend() != "tpu",
            )
            ctbl = _reconstruct_ids(pid, col, SC)
            return ttbl, ctbl, pt[:, -1]
        if sc_topk == "pallas":
            # fused slab+extract kernel: one launch, bounds in VMEM, no
            # (N, K2) HBM round-trips (accel/pallas_front.py)
            from phosphorus_mk2_tpu.accel.pallas_front import (
                slab_extract_pallas,
            )

            bounds6 = jnp.concatenate(
                [bvh["sc_bmin"], bvh["sc_bmax"]], axis=1
            )
            sc_ttbl, sctbl = slab_extract_pallas(
                bounds6, pp, dd, t_limit, jj=jj,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            sc_hit, sc_tn = _slab_all(
                pp, dd,
                _table(bvh, "sc_bmin", slab_bf16),
                _table(bvh, "sc_bmax", slab_bf16),
            )
            sc_m = jnp.where(
                sc_hit & (sc_tn < t_limit[:, None]), sc_tn, T_MAX
            )
            if sc_topk == "topk":
                sc_neg, sctbl = jax.lax.top_k(-sc_m, jj)  # (N, jj)
                sc_ttbl = -sc_neg
            else:
                sc_ttbl, sctbl = _select_topk(sc_m, jj, mode=sc_topk)
        horizon = sc_ttbl[:, -1]

    cand_t, sc_pad = _expand_members(
        pp, dd,
        _table(bvh, "sc_member_bmin", slab_bf16),
        _table(bvh, "sc_member_bmax", slab_bf16),
        sctbl, sc_ttbl, t_limit, expand_batch=expand_batch,
    )
    ttbl, col = _select_topk(cand_t, kk, mode="sort")
    ctbl = _reconstruct_ids(sc_pad, col, SC)
    return ttbl, ctbl, horizon


def _dedup_rows(rows_tbl, c1, live1, route, d_max):
    """Per-(chunk, wave) cluster-row dedup: fetch each DISTINCT cluster
    row of the chunk once, then route rows to rays. Overlap-sorted
    chunks share clusters heavily (r4_dedup_probe: ~3.7-7.8x reference/
    distinct redundancy on the real BMW front table), so the redundant
    per-ray gather stream — the wave loop's byte floor — shrinks by the
    dedup factor IF the routing step is cheaper than the saved fetches.

    c1, live1: (ch,). route:
      "gather": rank-gather from the (ch,)-row compact buffer — wins
        only if gather bandwidth improves with source locality
        (tools/tpu_r4l_dedup.py expA measures exactly that);
      "onehot": (ch, d_max) f32 one-hot MXU matmul routing — EXACT
        selection (one 1.0 term per output; compact-buffer NaN padding
        sanitized to 0, rejected downstream by the MT det test); falls
        back to the direct gather when a chunk's distinct count
        overflows d_max (lax.cond: only one branch executes).
    Returns (ch, 9, C) rows.

    Dedup mechanics are the packed-key idiom: ray slot rides in the low
    bits of the cluster-id sort key, so group ranks (cumsum of
    first-of-group flags) scatter straight back to ray order — no
    (ch, ch) equality matrix, no per-lane gathers.
    """
    K = rows_tbl.shape[0]
    ch = c1.shape[0]
    sbits = max(1, (ch - 1).bit_length())
    if K >= 1 << (31 - sbits):  # key would overflow int32: no dedup
        return rows_tbl[jnp.where(live1, c1, 0)]
    ids = jnp.where(live1, c1, K)  # dead lanes sort last, past every id
    key = (ids << sbits) | jnp.arange(ch, dtype=jnp.int32)
    skey = jnp.sort(key)
    sid = skey >> sbits
    slot = skey & jnp.int32((1 << sbits) - 1)
    prev = jnp.concatenate([jnp.full((1,), -1, sid.dtype), sid[:-1]])
    uniq = (sid != prev) & (sid < K)
    # cumsum of first-of-group flags = the group ordinal for EVERY
    # element of the group (later members add 0)
    rank = jnp.cumsum(uniq.astype(jnp.int32)) - 1
    rk_ray = jnp.zeros((ch,), jnp.int32).at[slot].set(rank)

    d_eff = ch if route == "gather" else min(d_max, ch)
    uniq_buf = jnp.full((d_eff,), K, jnp.int32).at[
        jnp.where(uniq, rank, d_eff)
    ].set(sid, mode="drop")
    if route == "gather":
        crow = rows_tbl[jnp.minimum(uniq_buf, K - 1)]
        return crow[rk_ray]

    def routed(_):
        crow = rows_tbl[jnp.minimum(uniq_buf, K - 1)]  # (d_eff, 9, C)
        flat = jnp.nan_to_num(
            crow.reshape(d_eff, -1), nan=0.0, posinf=0.0, neginf=0.0
        )
        oh = (
            (rk_ray[:, None] == jnp.arange(d_eff, dtype=jnp.int32)[None, :])
            & live1[:, None]
        ).astype(jnp.float32)
        # Precision.HIGHEST is REQUIRED: TPU f32 dot at DEFAULT precision
        # truncates operands to bf16, quantizing the routed geometry —
        # the rows_bf16 failure mode (measured +79% false occlusions,
        # tools/tpu_r4l_dedup.py expH). HIGHEST (bf16x3+) reconstructs
        # the exact f32 product; with one 1.0 term per output the
        # selection is then bit-exact. CPU dots are exact either way,
        # so only the TPU run can catch a regression here.
        return jax.lax.dot(
            oh, flat, precision=jax.lax.Precision.HIGHEST
        ).reshape((ch,) + rows_tbl.shape[1:])

    def direct(_):
        return rows_tbl[jnp.where(live1, c1, 0)]

    n_uniq = uniq.sum()
    return jax.lax.cond(n_uniq <= d_eff, routed, direct, None)


def _trace(scene, p, d, t_limit, any_hit,
           dense_waves=0, chunk=2048, dense_chunk=16384, expand_batch=1,
           slab_bf16=False, front_levels=0, sc_topk="auto", front_k=0,
           rows_bf16=False, fb_cc=64, recompact=8, dense_k=0, sc_front=0,
           wave_dedup="off", dedup_d=512):
    """Core trace. Tunables (defaults = measured config):

    dense_waves: process the first W0 front-table columns for ALL rays
      in one fat masked gather per chunk (launch-count lever on this
      launch-bound platform: at mean overlap ~2.6, columns 0..3 are
      mostly live so the masked over-gather is small, while the
      per-wave while-loop shrinks to the straggler tail only).
    chunk / dense_chunk: ray-chunk sizes for the straggler loop / the
      dense phase. Default 2048 (with recompact 8) measured best at BMW
      scale in round 4 (167.7 ms full trace, tools/tpu_r4c_waveloop.py;
      the r4 synthetic probe showed the gather loop is BYTE-bound at
      ~93 GB/s down to ~0.1 ms/iteration, so small chunks cost nothing
      and waste less masked prefix work; >=16k chunks degrade gather
      bandwidth to ~72 GB/s).
    expand_batch: superclusters expanded per front-table step; >= jj
      collapses the jj-step scan into ONE member-bounds row-gather.
    slab_bf16: slab tests read the outward-rounded bf16 bounds tables
      (half the gather bytes; conservative — boxes only grow, the MT
      stage stays f32-exact).
    front_levels: hierarchy depth for the front table — 0 auto (3 when
      the ssc tables exist and K2 is wide enough to matter, else 2),
      or explicit 2/3 for A/B measurement.
    sc_topk: supercluster selection primitive. "auto" (default):
      "pallas_full" — the whole 2-level front in ONE kernel — on a real
      TPU backend (v2 kernel, tools/tpu_r4o_frontv2.py), "extract"
      otherwise (CPU/interpret, and the levels=3 path where the fused
      kernel does not apply). Explicit: "extract" = k min-reduce rounds
      (best XLA form at BMW scale, 225.7 vs 238.5 ms full trace,
      tools/tpu_r3_front.py); "topk" = lax.top_k; "sort" = packed
      row-sort; "pallas" = fused slab+extract only; "pallas_full".
    front_k: override MAX_FRONT (per-ray cluster-table depth).
    rows_bf16: bf16 triangle rows — half the wave-loop gather bytes
      (the measured bottleneck); selection-only precision (see
      _cluster_rows). Exact-safe OFF by default for closest-hit.
    recompact: re-compact the straggler loop every `recompact` waves —
      drop the columns the early-out already terminated (tn >= best_t),
      left-pack the survivors per ray (packed-key row sort), and
      re-sort rays by REMAINING work, so the per-wave prefix tracks
      dynamic liveness instead of the static overlap histogram. 0 = off;
      default 8 (measured: 184.8 -> 167.4 ms BMW trace, tpu_r4a/r4c).
      Winners identical up to exact-t ties: the repack re-orders MT
      evaluations by (truncated tn, cluster id), so two triangles in
      different clusters at EXACTLY the same t can resolve to the other
      id vs the recompact=0 order (strict t < best reduction).
      Compile-size note: the Python loop unrolls ~(kk - W0)/recompact
      rounds (each a row sort + fat concat-gather + while_loop); on the
      remote-compile platform keep recompact >= ~kk/8 — recompact=1 at
      kk=48 emits ~47 copies and a pathological compile.
    sc_front: override SC_FRONT (supercluster front width jj) — the
      expand stage costs O(N * jj * SC) gather bytes and the extract
      stage O(jj) min-rounds over (N, K2); 8 halves both vs the
      default 16, with the exact fallback covering overflow.
    dense_k: override the DENSE_K hierarchy threshold (cluster count
      above which the supercluster front table engages). Lets small
      test scenes exercise the hierarchical BMW-scale path declaratively
      (the multichip dryrun) instead of mutating the module global.
    wave_dedup: "off" | "gather" | "onehot" — per-(chunk, wave)
      cluster-row dedup in the straggler loop (see _dedup_rows). The
      round-4 byte-headroom attack: overlap-sorted chunks reference
      each cluster ~3.7-7.8x (r4_dedup_probe).
    dedup_d: compact-buffer depth for wave_dedup="onehot" (chunks whose
      distinct-cluster count overflows fall back to the direct gather).
    (wave_pallas — REMOVED in round 5: the fused per-ray-DMA wave
    kernel was capped at ~250 ns/row in-kernel — Mosaic forbids
    sub-8-sublane DMA landings, so per-ray rows land one-per-tile and
    the MT consume is sublane-strided, structurally — vs ~98 ns/row
    for the XLA gather+MT body in-trace. Per-SEGMENT fusion could only
    amortize the ~0.1-0.2 ms XLA<->Pallas boundary, 0.025 ms/column at
    recompact=8, against a body 2.5x slower per row: arithmetically
    unwinnable, so the kernel was pruned rather than accreted.
    History: accel/pallas_wave.py @ commit d639293 (round-4 close);
    measurements tools/tpu_r4q_dma.py, tpu_r4r_wavepallas.py.)
    """
    bvh = scene.bvh
    rows_tbl = _cluster_rows(scene, bf16=rows_bf16)
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

    kk = min(front_k or MAX_FRONT, K)
    hierarchical = K > (dense_k or DENSE_K) and "sc_bmin" in bvh
    if hierarchical:
        if front_levels == 0:  # auto (pending round-3 TPU measurement)
            front_levels = 2
        ttbl, ctbl, sc_horizon = _front_table_hierarchical(
            pp, dd, bvh, t_limit, kk, expand_batch=expand_batch,
            slab_bf16=slab_bf16, levels=front_levels, sc_topk=sc_topk,
            sc_front=sc_front,
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
        jnp.full((n,), -1, jnp.int32),   # winning cluster id (-1 = miss)
        jnp.zeros((n,), jnp.int32),      # winning lane within the cluster
    )

    def make_chunk(w_eff, ww, ch, p_src, d_src, tbl_t, tbl_c):
        def chunk_fn(ci, best):
            start = jnp.minimum(ci * ch, n - ch)

            def sl(x):
                return jax.lax.dynamic_slice_in_dim(x, start, ch)

            def sl2(x):
                return jax.lax.dynamic_slice(x, (start, w_eff), (ch, ww))

            c = sl2(tbl_c)           # (ch, ww)
            tn_c = sl2(tbl_t)        # (ch, ww)
            cur = tuple(sl(x) for x in best)
            live = (tn_c < cur[0][:, None]) & (tn_c < T_MAX)
            if any_hit:
                live = live & (cur[1] < 0)[:, None]
            if wave_dedup != "off" and ww == 1:
                rows = _dedup_rows(
                    rows_tbl, c[:, 0], live[:, 0], wave_dedup, dedup_d
                )[:, None]  # (ch, 1, 9, C)
            else:
                rows = rows_tbl[jnp.where(live, c, 0)]  # (ch, ww, 9, C)
            C = rows.shape[-1]
            live_el = jnp.broadcast_to(live[:, :, None], (ch, ww, C))
            new = _mt_rows(
                jnp.stack([sl(p_src[:, 0]), sl(p_src[:, 1]), sl(p_src[:, 2])], 1),
                jnp.stack([sl(d_src[:, 0]), sl(d_src[:, 1]), sl(d_src[:, 2])], 1),
                rows,
                cur,
                live_el,
                cand_cids=c,
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
        dense_fn = make_chunk(0, W0, CHD, sp_p, sp_d, s_ttbl, s_ctbl)
        state0 = jax.lax.fori_loop(0, (n + CHD - 1) // CHD, dense_fn, state0)

    def run_waves(tbl_t, tbl_c, p_src, d_src, alive_seg, state, w0, ncols):
        """Straggler while-loop over columns [w0, ncols) of tbl_*."""
        if w0 >= ncols:
            return state

        def wave_cond(carry):
            w, go = carry[0], carry[1]
            return go & (w < ncols)

        def wave_body(carry):
            w, _, best = carry
            a_w = jax.lax.dynamic_index_in_dim(alive_seg, w, keepdims=False)

            w_eff = jnp.minimum(w, tbl_t.shape[1] - WW)  # clamp:
            # re-tested columns are duplicates the min-reduction ignores
            chunk_fn = make_chunk(w_eff, WW, CH, p_src, d_src, tbl_t, tbl_c)

            n_ch = jnp.minimum((a_w + CH - 1) // CH, n_chunks_cap)
            best = jax.lax.fori_loop(0, n_ch, chunk_fn, best)
            w = w + WW
            go = w < ncols
            go = go & (jax.lax.dynamic_index_in_dim(
                alive_seg, jnp.minimum(w, ncols - 1), keepdims=False
            ) > 0)
            return w, go, best

        go0 = alive_seg[w0] > 0
        _, _, state = jax.lax.while_loop(
            wave_cond, wave_body, (jnp.int32(w0), go0, state)
        )
        return state

    if recompact and 0 < recompact < kk - W0:
        # --- mid-traversal re-compaction: the static overlap sort keeps
        # a ray in the wave prefix until its LAST front-table column,
        # but the early-out (tn >= best_t) usually kills its tail much
        # sooner. Every `recompact` waves, drop the dead columns,
        # left-pack the survivors (packed-key row sort, cluster id in
        # the tn mantissa — no per-lane gathers), and re-sort rays by
        # remaining work; all per-ray state moves in ONE fat row gather
        # (int columns float-encoded, the make_scene_tables idiom).
        if n >= 1 << 24:
            # ray index / cluster id round-trip through f32 in the fat
            # state row below — exact only below 2^24 (auto-chunking
            # keeps wavefronts at 1<<17; guard direct callers)
            raise ValueError(
                f"recompact requires wavefront < 2^24 rays (got {n}); "
                "chunk the wavefront or pass recompact=0"
            )
        seg = min(W0 + recompact, kk)
        state = run_waves(s_ttbl, s_ctbl, sp_p, sp_d, alive_at, state0,
                          W0, seg)
        tbl_t, tbl_c, rp, rd = s_ttbl, s_ctbl, sp_p, sp_d
        ord_f = order.astype(jnp.float32)  # composed ray permutation
        width, done_cols = kk, seg
        key_mask, tmax_key, nbits = _key_consts(K)
        while width - done_cols > 0:
            M = width - done_cols
            rem_t = tbl_t[:, done_cols:]
            rem_c = tbl_c[:, done_cols:]
            live = (rem_t < state[0][:, None]) & (rem_t < T_MAX)
            if any_hit:
                live = live & (state[1] < 0)[:, None]
            # id-in-mantissa truncation only LOWERS tn (keys clamped
            # nonneg) — permissive for the live gate; MT stays exact
            bits = jax.lax.bitcast_convert_type(
                jnp.maximum(rem_t, 0.0), jnp.uint32
            )
            packed = jnp.where(
                live, (bits & key_mask) | rem_c.astype(jnp.uint32),
                jnp.uint32(0xFFFFFFFF),
            )
            packed = jnp.sort(packed, axis=1)  # left-pack front-to-back
            new_t, new_c = _unpack_keys(packed, key_mask, tmax_key, nbits)
            over2 = live.sum(axis=1)
            alive_seg = (over2[:, None] > jnp.arange(M)[None, :]).sum(axis=0)
            order2 = jnp.argsort(-over2)
            big = jnp.concatenate([
                new_t, new_c.astype(jnp.float32), rp, rd,
                state[0][:, None], state[1].astype(jnp.float32)[:, None],
                state[2].astype(jnp.float32)[:, None], ord_f[:, None],
            ], axis=1)[order2]
            o = 2 * M
            tbl_t, tbl_c = big[:, :M], big[:, M:o].astype(jnp.int32)
            rp, rd = big[:, o:o + 3], big[:, o + 3:o + 6]
            state = (
                big[:, o + 6], big[:, o + 7].astype(jnp.int32),
                big[:, o + 8].astype(jnp.int32),
            )
            ord_f = big[:, o + 9]
            run_len = min(recompact, M)
            state = run_waves(tbl_t, tbl_c, rp, rd, alive_seg, state,
                              0, run_len)
            width, done_cols = M, run_len
        best = tuple(x[jnp.argsort(ord_f.astype(jnp.int32))] for x in state)
    else:
        state = run_waves(s_ttbl, s_ctbl, sp_p, sp_d, alive_at, state0,
                          W0, kk)
        best = tuple(x[inv] for x in state)

    # --- exact fallback for rays whose front table did not cover their
    # hit range (table overflow or supercluster horizon): brute-force
    # every cluster for the needy rays only, via the same sorted
    # prefix-chunk compaction. Rare, exact, scene-size-linear.
    needy = kth_tn < best[0]
    if any_hit:
        needy = needy & (best[1] < 0)

    def fallback(best):
        order2 = jnp.argsort(~needy)  # needy rays first
        inv2 = jnp.argsort(order2)
        f_p = pp[order2]
        f_d = dd[order2]
        fb = tuple(x[order2] for x in best)
        a_n = needy.sum()
        # batch CC clusters per fori iteration: a one-cluster body is the
        # tiny-loop poison (measured: 3 needy rays over K=9905 clusters
        # cost 2.2 s at CC=1 vs ~0.1 s batched — the loop trip count is
        # what kills, not the math)
        CH2 = min(256, n)
        C = rows_tbl.shape[2]
        CC = min(fb_cc, K)

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
                rows = jnp.broadcast_to(rows[None], (CH2, CC, 9, C))
                base = jnp.full((CH2,), 1, jnp.int32) * cstart
                return _mt_rows(rp, rd, rows, cur, live, cand_base=base)

            cur = jax.lax.fori_loop(0, (K + CC - 1) // CC, cl, cur)
            return tuple(
                jax.lax.dynamic_update_slice_in_dim(full, nv, start, 0)
                for full, nv in zip(fb, cur)
            )

        n_rc = jnp.minimum((a_n + CH2 - 1) // CH2, (n + CH2 - 1) // CH2)
        fb = jax.lax.fori_loop(0, n_rc, ray_chunk, fb)
        return tuple(x[inv2] for x in fb)

    best = jax.lax.cond(needy.any(), fallback, lambda b: b, best)
    return best  # (t, cid, lane)


def _winner_tri(scene, cid, lane):
    """Map (cluster, lane) winners to triangle ids once per trace: one
    (N, C) ROW gather + a one-hot lane select. (A flat per-element
    gather measured 26.8 ms at 131k rays — tools/tpu_r3c_levers.py —
    per-LANE gathers stay catastrophic; row gathers are cheap.)"""
    ids = scene.bvh["cluster_id"]  # (K, C)
    rows = ids[jnp.maximum(cid, 0)]  # (N, C)
    onehot = lane[:, None] == jnp.arange(ids.shape[1], dtype=lane.dtype)[None]
    tri = jnp.where(onehot, rows, 0).sum(axis=1)
    return jnp.where(cid >= 0, tri, -1)


def intersect_clusters(scene, p, d, tmax=None, **tune):
    """Closest-hit via the gather-wave cluster tracer.

    tune: dense_waves / chunk / dense_chunk / expand_batch /
    front_levels / sc_topk / front_k / rows_bf16 / recompact / dense_k /
    sc_front / wave_dedup / dedup_d (see _trace).
    """
    n = p.shape[0]
    t0 = jnp.full((n,), T_MAX) if tmax is None else tmax
    t, cid, lane = _trace(scene, p, d, t0, False, **tune)
    tri = _winner_tri(scene, cid, lane)
    # u/v re-derived from the winner triangle (same MT arithmetic on
    # the same f32 vertices). The wave loop stopped carrying them —
    # no in-loop consumer exists, and the integrator reintersects
    # differentiably anyway, so inside a render jit this whole block
    # is dead-code-eliminated (u/v unused).
    from phosphorus_mk2_tpu.accel.intersect import mt_intersect

    f = scene.faces[jnp.maximum(tri, 0)]
    a = scene.vertices[f[..., 0]]
    b = scene.vertices[f[..., 1]]
    c = scene.vertices[f[..., 2]]
    _, u, v, _ = mt_intersect(
        jax.lax.stop_gradient(p), jax.lax.stop_gradient(d), a, b, c
    )
    miss = tri < 0
    u = jnp.where(miss, 0.0, u)
    v = jnp.where(miss, 0.0, v)
    return {"t": t, "tri": tri, "u": u, "v": v, "hit": tri >= 0}


def occluded_clusters(scene, p, d, tmax, **tune):
    """Any-hit via the gather-wave cluster tracer (tmax <= 0 disables).
    No id mapping needed — occlusion is a boolean.

    Under rows_bf16 the intersection t carries ~0.2-0.5% relative error
    from quantized geometry — larger than the absolute RAY_EPSILON the
    caller already subtracted — so a shadow ray would re-find its OWN
    light source just inside tmax and systematically kill NEE
    (measured: -18% image mean), and the ray ORIGIN sits inside its own
    quantized surface (the caller's offset() lift is absolute and
    smaller than the quantization shift), so every NEE ray self-occludes.
    Both margins must scale with the ray extent: lift the origin and
    shrink tmax by a relative fraction covering the error. EXPERIMENTAL:
    the margins trade shadow-contact accuracy for bandwidth; default off.
    """
    disabled = tmax <= 0.0
    if tune.get("rows_bf16"):
        lift = 0.005 * jnp.maximum(tmax, 0.0)
        p = p + d * lift[:, None]
        tmax = tmax * 0.99 - lift
        disabled = disabled | (tmax <= 0.0)
    t0 = jnp.where(disabled, 1e-6, tmax)
    _, cid, _ = _trace(scene, p, d, t0, True, **tune)
    return (cid >= 0) & ~disabled
