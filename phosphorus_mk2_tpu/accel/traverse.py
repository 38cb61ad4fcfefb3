"""BVH traversal in pure JAX (vmapped per-ray, masked lockstep).

Counterpart of the reference's MBVH-RS stream traversal (reference
src/kernels/cpu/stream_bvh_kernel.cpp:18-148): an explicit task stack
over 8-wide nodes, AABB packet tests, Moller-Trumbore leaf tests, shadow
rays early-out on any hit.

TPU-first reformulation: each ray runs a fixed-shape stack machine under
``lax.while_loop``; ``vmap`` lifts the wavefront into dense lockstep — a
node visit becomes (N, 8) slab tests and (N, 8) masked leaf tests on the
VPU. The traversal is primal-only (ids/barycentrics out, see
accel/intersect.reintersect for the differentiable path); vertices are
stop-gradiented here.

The gather-wave cluster tracer (accel/cluster_traverse.py) is the
performance path; this implementation is a correctness oracle for
traversal semantics (the reference's "linear kernel" idiom, SURVEY.md
§4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from phosphorus_mk2_tpu.accel.bvh_builder import MAX_LEAF
from phosphorus_mk2_tpu.accel.intersect import T_MAX
from phosphorus_mk2_tpu.math.vec import cross, dot

STACK_DEPTH = 96


def _tri_data(scene):
    verts = jax.lax.stop_gradient(scene.vertices)
    f = scene.faces
    a = verts[f[:, 0]]
    e0 = verts[f[:, 1]] - a
    e1 = verts[f[:, 2]] - a
    return a, e0, e1


def _slab_test(p, inv_d, bmin, bmax, best_t):
    """1 ray vs 8 boxes (reference simd::intersect<8>, math/simd/aabb.hpp:26).

    p, inv_d: (3,); bmin/bmax: (8, 3). Returns (hit (8,), tnear (8,))."""
    t0 = (bmin - p) * inv_d
    t1 = (bmax - p) * inv_d
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    hit = (tmin <= tmax) & (tmax >= 0.0) & (tmin < best_t)
    return hit, tmin


def _leaf_intersect(a, e0, e1, leaf_tris, off, cnt, p, d, best):
    """Masked MT over one leaf slot (up to MAX_LEAF tris)."""
    best_t, best_tri, best_u, best_v = best
    idx = leaf_tris[off + jnp.arange(MAX_LEAF)]  # (8,)
    valid = jnp.arange(MAX_LEAF) < cnt
    av, e0v, e1v = a[idx], e0[idx], e1[idx]  # (8, 3)
    pvec = cross(d[None, :], e1v)
    det = dot(e0v, pvec)
    near0 = jnp.abs(det) < 1e-8
    ood = 1.0 / jnp.where(near0, 1.0, det)
    tvec = p[None, :] - av
    u = dot(tvec, pvec) * ood
    qvec = cross(tvec, e0v)
    v = dot(d[None, :], qvec) * ood
    t = dot(e1v, qvec) * ood
    ok = (
        valid
        & ~near0
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= 0.0)
        & (t < best_t)
    )
    t_m = jnp.where(ok, t, T_MAX)
    j = jnp.argmin(t_m)
    better = ok[j]
    return (
        jnp.where(better, t_m[j], best_t),
        jnp.where(better, idx[j], best_tri),
        jnp.where(better, u[j], best_u),
        jnp.where(better, v[j], best_v),
    )


def _traverse_one(bvh, a, e0, e1, p, d, t0, any_hit: bool):
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-30, d)
    leaf_tris = bvh["leaf_tris"]

    def cond(carry):
        sp, stack, best_t, best_tri, best_u, best_v = carry
        live = sp > 0
        if any_hit:
            live = live & (best_tri < 0)
        return live

    def body(carry):
        sp, stack, best_t, best_tri, best_u, best_v = carry
        node = stack[sp - 1]
        sp = sp - 1

        hit, tnear = _slab_test(p, inv_d, bvh["node_bmin"][node], bvh["node_bmax"][node], best_t)
        child = bvh["node_child"][node]   # (8,)
        count = bvh["node_count"][node]   # (8,)
        valid_slot = child >= 0
        hit = hit & valid_slot
        is_leaf = hit & (count > 0)
        is_inner = hit & (count == 0)

        # leaves: masked MT per slot (static unroll over the 8 slots)
        best = (best_t, best_tri, best_u, best_v)
        for k in range(8):
            newbest = _leaf_intersect(
                a, e0, e1, leaf_tris, child[k], count[k], p, d, best
            )
            best = jax.tree_util.tree_map(
                lambda nb, ob: jnp.where(is_leaf[k], nb, ob), newbest, best
            )
        best_t, best_tri, best_u, best_v = best

        # push inner children, far-first by tnear so the near child pops
        # first (front-to-back ordering, reference
        # stream_bvh_kernel.cpp:99-118)
        order = jnp.argsort(jnp.where(is_inner, tnear, -T_MAX))
        for kk in range(8):
            k = order[kk]
            do = is_inner[k]
            stack = jnp.where(
                do, stack.at[sp].set(child[k]), stack
            )
            sp = sp + do.astype(sp.dtype)
        return sp, stack, best_t, best_tri, best_u, best_v

    stack0 = jnp.zeros((STACK_DEPTH,), jnp.int32)
    carry0 = (jnp.int32(1), stack0, t0, jnp.int32(-1), jnp.float32(0.0), jnp.float32(0.0))
    sp, stack, t, tri, u, v = jax.lax.while_loop(cond, body, carry0)
    return t, tri, u, v


def intersect_bvh(scene, p, d, tmax=None):
    """Closest-hit via BVH. Same contract as intersect_brute.

    Per-ray-stack jnp oracle (vmapped while loops); the TPU performance
    path is accel/cluster_traverse.py. Traversal is primal-only: inputs
    severed so its while loops never enter a backward graph."""
    p, d = jax.lax.stop_gradient((p, d))
    a, e0, e1 = _tri_data(scene)
    n = p.shape[0]
    t0 = jnp.full((n,), T_MAX) if tmax is None else jax.lax.stop_gradient(tmax)
    t, tri, u, v = jax.vmap(
        lambda pp, dd, tt: _traverse_one(scene.bvh, a, e0, e1, pp, dd, tt, False)
    )(p, d, t0)
    return {"t": t, "tri": tri, "u": u, "v": v, "hit": tri >= 0}


def occluded_bvh(scene, p, d, tmax):
    """Any-hit shadow query (early-out, reference
    stream_bvh_kernel.cpp:61). Primal-only, inputs severed."""
    p, d, tmax = jax.lax.stop_gradient((p, d, tmax))
    a, e0, e1 = _tri_data(scene)
    _, tri, _, _ = jax.vmap(
        lambda pp, dd, tt: _traverse_one(scene.bvh, a, e0, e1, pp, dd, tt, True)
    )(p, d, tmax)
    return tri >= 0
