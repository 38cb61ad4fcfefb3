"""Moller-Trumbore ray-triangle intersection.

Counterpart of the reference's packed-leaf intersectors (reference
src/accel/triangle.hpp:25-290). Two roles:

* ``intersect_brute``: the correctness oracle — every ray against every
  triangle, the TPU analogue of the reference's debug ``linear_mbvh_kernel_t``
  (reference src/kernels/cpu/linear_bvh_kernel.hpp:8-15). Runs as a
  lax.scan over triangle chunks so memory stays bounded; each chunk is a
  dense (rays x chunk) VPU computation.
* ``reintersect``: differentiable re-evaluation of a known (ray, triangle)
  pair — the primal traversal is non-differentiable (it only yields ids),
  and gradients w.r.t. vertex positions flow through this recomputation
  (SURVEY.md section 7 "differentiability pass").

Barycentric convention matches the reference (triangle.hpp:84-100):
u weights vertex b, v weights vertex c, hit P = (1-u-v)a + u*b + v*c.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from phosphorus_mk2_tpu.math.vec import cross, dot

DET_EPS = 1e-8
T_MAX = jnp.float32(3.4e38)


def _gather_tri_verts(scene, tri: jnp.ndarray):
    """(..., 3, 3) vertices for triangle ids (...,)."""
    f = scene.faces[tri]
    a = scene.vertices[f[..., 0]]
    b = scene.vertices[f[..., 1]]
    c = scene.vertices[f[..., 2]]
    return a, b, c


def mt_intersect(p, d, a, b, c):
    """Batched MT test. All args broadcastable to (..., 3).

    Returns (t, u, v, valid): valid requires |det| >= eps, 0<=u<=1,
    v>=0, u+v<=1, t>=0 (reference triangle.hpp:84-116 semantics).
    """
    e0 = b - a
    e1 = c - a
    pvec = cross(d, e1)
    det = dot(e0, pvec)
    near_zero = jnp.abs(det) < DET_EPS
    ood = 1.0 / jnp.where(near_zero, 1.0, det)
    tvec = p - a
    u = dot(tvec, pvec) * ood
    qvec = cross(tvec, e0)
    v = dot(d, qvec) * ood
    t = dot(e1, qvec) * ood
    valid = (
        (~near_zero)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= 0.0)
    )
    return t, u, v, valid


def mt_intersect_soa(p, d, a, e0, e1):
    """SoA Moller-Trumbore: rays (N,) components vs triangles (C,)
    components, all intermediates (N, C) with the triangle axis last —
    the layout the TPU's (8, 128) vector tiles want (the same reason the
    reference uses SoA packets, src/math/soa.hpp).

    p, d: tuples of (N, 1) components; a, e0, e1: tuples of (1, C).
    Returns (t, u, v, valid) as (N, C).
    """
    px, py, pz = p
    dx, dy, dz = d
    ax, ay, az = a
    e0x, e0y, e0z = e0
    e1x, e1y, e1z = e1

    # pvec = d x e1
    pvx = dy * e1z - dz * e1y
    pvy = dz * e1x - dx * e1z
    pvz = dx * e1y - dy * e1x
    det = e0x * pvx + e0y * pvy + e0z * pvz
    near_zero = jnp.abs(det) < DET_EPS
    ood = 1.0 / jnp.where(near_zero, 1.0, det)
    # tvec = o - a
    tx = px - ax
    ty = py - ay
    tz = pz - az
    u = (tx * pvx + ty * pvy + tz * pvz) * ood
    # qvec = tvec x e0
    qvx = ty * e0z - tz * e0y
    qvy = tz * e0x - tx * e0z
    qvz = tx * e0y - ty * e0x
    v = (dx * qvx + dy * qvy + dz * qvz) * ood
    t = (e1x * qvx + e1y * qvy + e1z * qvz) * ood
    valid = (
        (~near_zero)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= 0.0)
    )
    return t, u, v, valid


def _soa_rays(p, d):
    return (
        (p[:, 0:1], p[:, 1:2], p[:, 2:3]),
        (d[:, 0:1], d[:, 1:2], d[:, 2:3]),
    )


def _soa_tris(verts, f):
    a = verts[f[:, 0]]
    b = verts[f[:, 1]]
    c = verts[f[:, 2]]
    e0 = b - a
    e1 = c - a

    def comp(x):
        return (x[None, :, 0], x[None, :, 1], x[None, :, 2])

    return comp(a), comp(e0), comp(e1)


def intersect_brute(scene, p, d, tmax=None, chunk: int | None = None):
    """Closest-hit over the whole triangle soup (oracle tracer).

    p, d: (N, 3). tmax: (N,) or None.
    Returns dict: t (N,), tri (N,) int32 (-1 on miss), u, v (N,), hit (N,).
    """
    n = p.shape[0]
    num_tris = scene.faces.shape[0]
    if chunk is None:
        # pad-waste matters for small scenes: round up to a VPU-lane
        # multiple instead of a fixed 512
        chunk = min(512, max(128, ((num_tris + 127) // 128) * 128))
    pad = (-num_tris) % chunk
    faces = jnp.pad(scene.faces, ((0, pad), (0, 0)))
    tri_ids = jnp.arange(num_tris + pad, dtype=jnp.int32)
    tri_valid = tri_ids < num_tris
    faces = faces.reshape(-1, chunk, 3)
    tri_ids = tri_ids.reshape(-1, chunk)
    tri_valid = tri_valid.reshape(-1, chunk)

    # packed-key closest tracking: the winning lane index lives in the
    # cleared low mantissa bits of t, so the whole chunk reduces with ONE
    # fused min — no argmin, no row gathers, no extra (N, C) buffers
    # (uint order == float order for t >= 0). The relative t
    # quantization (2^-15 at 512-wide chunks) only affects tie-breaks
    # between near-coplanar hits;
    # the returned t/u/v are recomputed exactly for the winner (the same
    # recomputation trick as the differentiable reintersect()).
    lane_bits = max(1, (chunk - 1).bit_length())  # 512-chunk -> 9 bits (2^-15 rel)
    assert chunk <= (1 << lane_bits)
    lane_mask = jnp.uint32((1 << lane_bits) - 1)
    miss_key = jnp.uint32(0x7F800000)  # +inf cleared: above any finite t

    t0 = T_MAX if tmax is None else tmax
    key0 = (
        jnp.minimum(
            jnp.full((n,), t0, jnp.float32).view(jnp.uint32)
            if tmax is None
            else jnp.asarray(tmax, jnp.float32).view(jnp.uint32),
            miss_key,
        )
        & ~lane_mask
    ) | lane_mask  # worst lane: any strictly-closer cleared-t wins
    init = (key0, jnp.full((n,), -1, jnp.int32))

    verts = scene.vertices
    rp, rd = _soa_rays(p, d)
    lanes = jnp.arange(chunk, dtype=jnp.uint32)[None, :]

    def body(carry, chunk_data):
        best_key, best_tri = carry
        f, ids, ok = chunk_data
        a, e0, e1 = _soa_tris(verts, f)
        t, u, v, valid = mt_intersect_soa(rp, rd, a, e0, e1)  # (N, C)
        if tmax is not None:
            # strict bound: without this, a hit with exact t up to
            # ~2^-15 relative beyond tmax could slip past the
            # mantissa-cleared key comparison against key0's
            # saturated lane bits
            valid = valid & (t < tmax[:, None])
        keys = jnp.where(
            valid & ok[None, :],
            (t.view(jnp.uint32) & ~lane_mask) | lanes,
            miss_key,
        )
        kmin = keys.min(axis=1)  # (N,) — the only reduction
        better = (kmin < best_key) & (kmin < miss_key)
        best_key = jnp.where(better, kmin, best_key)
        base = ids[0]  # chunk is contiguous: global id = base + lane
        best_tri = jnp.where(
            better, base + (kmin & lane_mask).astype(jnp.int32), best_tri
        )
        return (best_key, best_tri), None

    if faces.shape[0] == 1:  # single chunk: skip the loop machinery
        (_, tri), _ = body(init, (faces[0], tri_ids[0], tri_valid[0]))
    else:
        (_, tri), _ = jax.lax.scan(body, init, (faces, tri_ids, tri_valid))
    hit = tri >= 0
    a, b, c = _gather_tri_verts(scene, jnp.maximum(tri, 0))
    t, u, v, _ = mt_intersect(p, d, a, b, c)
    t = jnp.where(hit, t, T_MAX)
    u = jnp.where(hit, u, 0.0)
    v = jnp.where(hit, v, 0.0)
    return {"t": t, "tri": tri, "u": u, "v": v, "hit": hit}


def occluded_brute(scene, p, d, tmax, chunk: int | None = None):
    """Any-hit test for shadow rays (t in [0, tmax)) — no closest-hit
    bookkeeping, just an OR-reduce per chunk."""
    n = p.shape[0]
    num_tris = scene.faces.shape[0]
    if chunk is None:
        chunk = min(512, max(128, ((num_tris + 127) // 128) * 128))
    pad = (-num_tris) % chunk
    faces = jnp.pad(scene.faces, ((0, pad), (0, 0)))
    tri_valid = (jnp.arange(num_tris + pad) < num_tris).reshape(-1, chunk)
    faces = faces.reshape(-1, chunk, 3)
    verts = scene.vertices

    rp, rd = _soa_rays(p, d)

    def body(hit_any, chunk_data):
        f, ok = chunk_data
        a, e0, e1 = _soa_tris(verts, f)
        t, _, _, valid = mt_intersect_soa(rp, rd, a, e0, e1)
        valid = valid & ok[None, :] & (t < tmax[:, None])
        return hit_any | valid.any(axis=1), None

    if faces.shape[0] == 1:  # single chunk: skip the loop machinery
        hit, _ = body(jnp.zeros((n,), bool), (faces[0], tri_valid[0]))
    else:
        hit, _ = jax.lax.scan(body, jnp.zeros((n,), bool), (faces, tri_valid))
    return hit


def reintersect(scene, tri, p, d, attr=None, row=None):
    """Differentiable (t, u, v) for known triangle ids.

    Gradients flow to scene.vertices through the gathered triangle
    vertices; comparisons/ids from the primal traversal are constants.
    attr: optional core.shading.triangle_attribute_table row matrix —
    reuses its one row-gather instead of four (faces + 3 vertex gathers).
    row: pre-gathered rows (N, >=9) — zero gathers here.
    """
    if row is not None:
        a, b, c = row[..., 0:3], row[..., 3:6], row[..., 6:9]
    elif attr is not None:
        arow = attr[jnp.maximum(tri, 0)]
        a, b, c = arow[..., 0:3], arow[..., 3:6], arow[..., 6:9]
    else:
        a, b, c = _gather_tri_verts(scene, jnp.maximum(tri, 0))
    t, u, v, _ = mt_intersect(p, d, a, b, c)
    return t, u, v
