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
    live: (N,) mask — dead rays keep their records.
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
        & live[:, None]
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


def _trace(scene, p, d, t_limit, any_hit):
    bvh = scene.bvh
    rows_tbl = _cluster_rows(scene)
    K = rows_tbl.shape[0]
    n = p.shape[0]

    pp = jax.lax.stop_gradient(p)
    dd = jax.lax.stop_gradient(d)
    hit_tbl, tn_tbl = _slab_all(pp, dd, bvh["cluster_bmin"], bvh["cluster_bmax"])
    pending0 = hit_tbl & (tn_tbl < t_limit[:, None])

    nrows = jnp.arange(n)
    karange = jnp.arange(K)[None, :]

    def cond(carry):
        return carry[0]

    def body(carry):
        _, pending, best_t, best_tri, best_u, best_v = carry

        active = pending & (tn_tbl < best_t[:, None])
        if any_hit:
            active = active & (best_tri < 0)[:, None]
        tn_m = jnp.where(active, tn_tbl, T_MAX)
        c = jnp.argmin(tn_m, axis=1)           # (N,) nearest pending cluster
        live = active[nrows, c]

        rows = rows_tbl[jnp.where(live, c, 0)]  # (N, 10, C) row-gather
        best = _mt_rows(
            pp, dd, rows, (best_t, best_tri, best_u, best_v), live
        )
        best_t, best_tri, best_u, best_v = best

        pending = pending & ~((karange == c[:, None]) & live[:, None])

        more = pending & (tn_tbl < best_t[:, None])
        if any_hit:
            more = more & (best_tri < 0)[:, None]
        return more.any(), pending, best_t, best_tri, best_u, best_v

    carry0 = (
        pending0.any(),
        pending0,
        t_limit,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
    )
    _, _, t, tri, u, v = jax.lax.while_loop(cond, body, carry0)
    return t, tri, u, v


def intersect_clusters(scene, p, d, tmax=None):
    """Closest-hit via the gather-wave cluster tracer."""
    n = p.shape[0]
    t0 = jnp.full((n,), T_MAX) if tmax is None else tmax
    t, tri, u, v = _trace(scene, p, d, t0, False)
    return {"t": t, "tri": tri, "u": u, "v": v, "hit": tri >= 0}


def occluded_clusters(scene, p, d, tmax):
    """Any-hit via the gather-wave cluster tracer (tmax <= 0 disables)."""
    disabled = tmax <= 0.0
    t0 = jnp.where(disabled, 1e-6, tmax)
    _, tri, _, _ = _trace(scene, p, d, t0, True)
    return (tri >= 0) & ~disabled
