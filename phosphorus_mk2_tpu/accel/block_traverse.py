"""Block-shared-stack BVH traversal — the TPU-native traversal design.

The reference's MBVH-RS kernel streams a whole ray batch through the tree
node-by-node: each visited node carries the list of rays that reached it
(reference src/kernels/cpu/detail/stream.hpp:16, stream_bvh_kernel.cpp:43-120).
That idea is exactly what a TPU wants, inverted into SIMT-free form:

* a BLOCK of rays (lane axis, e.g. 256) traverses with ONE shared stack;
* the stack holds scalar node ids, so every node fetch is a
  scalar-indexed dynamic-slice (cheap on TPU) — never a per-lane gather
  (catastrophic on TPU: XLA emulates gathers with serialized loops);
* a node's 8 child boxes are tested against all rays densely (B, 8) on
  the VPU; a child is pushed if ANY live ray hits it;
* leaves run dense masked Moller-Trumbore (B, 8) over their <= 8
  triangles, again via scalar-offset slices into the leaf arrays.

Divergence cost: a block visits the union of its rays' node sets — cheap
for coherent camera/shadow wavefronts, degrading for deep-bounce
incoherent rays (same trade the reference makes with its per-node ray
lanes). The per-ray vmapped traversal in accel/traverse.py remains the
oracle; this is the performance path (and the basis for the Pallas
variant).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from phosphorus_mk2_tpu.accel.bvh_builder import MAX_LEAF
from phosphorus_mk2_tpu.accel.intersect import T_MAX
from phosphorus_mk2_tpu.math.vec import cross, dot

BLOCK = 256
STACK_DEPTH = 192


def _tri_data(scene):
    verts = jax.lax.stop_gradient(scene.vertices)
    f = scene.faces
    a = verts[f[:, 0]]
    e0 = verts[f[:, 1]] - a
    e1 = verts[f[:, 2]] - a
    return a, e0, e1


def _leaf_tri_tables(scene):
    """Leaf-ordered triangle tables: row g holds the g-th leaf group's
    MAX_LEAF triangles (pre-gathered host-side at BVH attach time so the
    kernel only does scalar-row dynamic slices)."""
    bvh = scene.bvh
    if "leaf_a" in bvh:
        return bvh["leaf_a"], bvh["leaf_e0"], bvh["leaf_e1"], bvh["leaf_id"]
    # fallback: build on the fly (jit-time constant folding if scene is
    # a compile-time constant; otherwise one-time gather)
    a, e0, e1 = _tri_data(scene)
    ids = bvh["leaf_tris"]
    pad = (-ids.shape[0]) % MAX_LEAF
    ids = jnp.pad(ids, (0, pad))
    ids2 = ids.reshape(-1, MAX_LEAF)
    return a[ids2], e0[ids2], e1[ids2], ids2


def _block_traverse(bvh, leaf_a, leaf_e0, leaf_e1, leaf_id, p, d, t0, any_hit):
    """Traverse one block. p, d: (B, 3); t0: (B,)."""
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-30, d)

    node_bmin = bvh["node_bmin"]
    node_bmax = bvh["node_bmax"]
    node_child = bvh["node_child"]
    node_count = bvh["node_count"]

    def cond(carry):
        sp = carry[0]
        live = sp > 0
        if any_hit:
            live = live & jnp.any(carry[3] < 0)  # some ray still unhit
        return live

    def body(carry):
        sp, stack, best_t, best_tri, best_u, best_v = carry
        node = stack[sp - 1]
        sp = sp - 1

        bmin = jax.lax.dynamic_index_in_dim(node_bmin, node, keepdims=False)  # (8,3)
        bmax = jax.lax.dynamic_index_in_dim(node_bmax, node, keepdims=False)
        child = jax.lax.dynamic_index_in_dim(node_child, node, keepdims=False)  # (8,)
        count = jax.lax.dynamic_index_in_dim(node_count, node, keepdims=False)

        # (B, 8) slab tests
        tn = jnp.minimum(
            (bmin[None] - p[:, None]) * inv_d[:, None],
            (bmax[None] - p[:, None]) * inv_d[:, None],
        ).max(axis=-1)
        tf = jnp.maximum(
            (bmin[None] - p[:, None]) * inv_d[:, None],
            (bmax[None] - p[:, None]) * inv_d[:, None],
        ).min(axis=-1)
        ray_live = best_tri < 0 if any_hit else jnp.ones(p.shape[:1], bool)
        hit = (tn <= tf) & (tf >= 0.0) & (tn < best_t[:, None]) & ray_live[:, None]
        slot_hit = hit.any(axis=0) & (child >= 0)  # (8,) any ray reaches child

        is_leaf = slot_hit & (count > 0)
        is_inner = slot_hit & (count == 0)

        # --- leaves: dense masked MT over pre-gathered leaf rows -------
        def leaf_step(k, best):
            best_t, best_tri, best_u, best_v = best
            group = child[k] // MAX_LEAF
            av = jax.lax.dynamic_index_in_dim(leaf_a, group, keepdims=False)   # (8,3)
            e0v = jax.lax.dynamic_index_in_dim(leaf_e0, group, keepdims=False)
            e1v = jax.lax.dynamic_index_in_dim(leaf_e1, group, keepdims=False)
            ids = jax.lax.dynamic_index_in_dim(leaf_id, group, keepdims=False)  # (8,)
            valid = (jnp.arange(MAX_LEAF) < count[k]) & is_leaf[k]

            pvec = cross(d[:, None, :], e1v[None])           # (B, 8, 3)
            det = dot(e0v[None], pvec)                        # (B, 8)
            near0 = jnp.abs(det) < 1e-8
            ood = 1.0 / jnp.where(near0, 1.0, det)
            tvec = p[:, None, :] - av[None]
            u = dot(tvec, pvec) * ood
            qvec = cross(tvec, e0v[None])
            v = dot(d[:, None, :], qvec) * ood
            t = dot(e1v[None], qvec) * ood
            ok = (
                valid[None]
                & ~near0
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t >= 0.0)
                & (t < best_t[:, None])
            )
            t_m = jnp.where(ok, t, T_MAX)
            j = jnp.argmin(t_m, axis=1)                       # (B,)
            rows = jnp.arange(p.shape[0])
            better = ok[rows, j]
            return (
                jnp.where(better, t_m[rows, j], best_t),
                jnp.where(better, ids[j], best_tri),
                jnp.where(better, u[rows, j], best_u),
                jnp.where(better, v[rows, j], best_v),
            )

        best = (best_t, best_tri, best_u, best_v)
        for k in range(8):
            new = leaf_step(k, best)
            best = jax.tree_util.tree_map(
                lambda nb, ob: jnp.where(is_leaf[k], nb, ob), new, best
            )
        best_t, best_tri, best_u, best_v = best

        # --- push inner children far-first (block-consensus ordering by
        # the minimum entry distance over the rays that hit the child) --
        tmin_per_child = jnp.where(hit, tn, T_MAX).min(axis=0)  # (8,)
        order = jnp.argsort(jnp.where(is_inner, tmin_per_child, -T_MAX))
        for kk in range(8):
            k = order[kk]
            do = is_inner[k]
            stack = jnp.where(do, stack.at[sp].set(child[k]), stack)
            sp = sp + do.astype(sp.dtype)
        return sp, stack, best_t, best_tri, best_u, best_v

    b = p.shape[0]
    carry0 = (
        jnp.int32(1),
        jnp.zeros((STACK_DEPTH,), jnp.int32),
        t0,
        jnp.full((b,), -1, jnp.int32),
        jnp.zeros((b,)),
        jnp.zeros((b,)),
    )
    _, _, t, tri, u, v = jax.lax.while_loop(cond, body, carry0)
    return t, tri, u, v


def intersect_blocks(scene, p, d, tmax=None, block: int = BLOCK):
    """Closest-hit over the wavefront in shared-stack blocks."""
    leaf_a, leaf_e0, leaf_e1, leaf_id = _leaf_tri_tables(scene)
    n = p.shape[0]
    pad = (-n) % block
    pp = jnp.pad(p, ((0, pad), (0, 0)))
    dd = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    t0 = jnp.full((n + pad,), T_MAX) if tmax is None else jnp.pad(tmax, (0, pad))

    pp = pp.reshape(-1, block, 3)
    dd = dd.reshape(-1, block, 3)
    t0 = t0.reshape(-1, block)

    t, tri, u, v = jax.vmap(
        lambda bp, bd, bt: _block_traverse(
            scene.bvh, leaf_a, leaf_e0, leaf_e1, leaf_id, bp, bd, bt, False
        )
    )(pp, dd, t0)
    t = t.reshape(-1)[:n]
    tri = tri.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    return {"t": t, "tri": tri, "u": u, "v": v, "hit": tri >= 0}


def occluded_blocks(scene, p, d, tmax, block: int = BLOCK):
    """Any-hit over the wavefront in shared-stack blocks (rays with
    tmax <= 0 are treated as unoccluded)."""
    disabled = tmax <= 0.0
    res_tmax = jnp.where(disabled, 1e-6, tmax)
    leaf_a, leaf_e0, leaf_e1, leaf_id = _leaf_tri_tables(scene)
    n = p.shape[0]
    pad = (-n) % block
    pp = jnp.pad(p, ((0, pad), (0, 0)))
    dd = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    t0 = jnp.pad(res_tmax, (0, pad))
    pp = pp.reshape(-1, block, 3)
    dd = dd.reshape(-1, block, 3)
    t0 = t0.reshape(-1, block)
    _, tri, _, _ = jax.vmap(
        lambda bp, bd, bt: _block_traverse(
            scene.bvh, leaf_a, leaf_e0, leaf_e1, leaf_id, bp, bd, bt, True
        )
    )(pp, dd, t0)
    hit = (tri.reshape(-1)[:n]) >= 0
    return hit & ~disabled
