"""Block-shared-stack BVH traversal — the TPU-native traversal design.

The reference's MBVH-RS kernel streams a whole ray batch through the tree
node-by-node: each visited node carries the list of rays that reached it
(reference src/kernels/cpu/detail/stream.hpp:16, stream_bvh_kernel.cpp:43-120).
That idea is exactly what a TPU wants, inverted into SIMT-free form:

* a BLOCK of rays (lane axis) traverses with ONE shared stack;
* the stack holds scalar node ids, so every node fetch is a
  scalar-indexed dynamic-slice (cheap on TPU) — never a per-lane gather
  (catastrophic on TPU: XLA emulates gathers with serialized loops);
* all per-iteration math is laid out (8, B): the 8 child/triangle slots
  on the sublane axis, the B rays on the 128-wide lane axis — the same
  reason the reference stores SoA packets (src/math/soa.hpp);
* a node's 8 child boxes are slab-tested against all rays densely; a
  child is pushed if ANY live ray hits it;
* leaves run dense masked Moller-Trumbore (8 tris x B rays) via
  scalar-offset rows of pre-gathered leaf tables (bvh_builder.attach_bvh).

Divergence cost: a block visits the union of its rays' node sets — cheap
for coherent camera/shadow wavefronts, degrading for deep-bounce
incoherent rays (same trade the reference makes with its per-node ray
lanes); integrator-side ray sorting (accel/sort.py) restores coherence.
The per-ray vmapped traversal in accel/traverse.py remains the oracle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from phosphorus_mk2_tpu.accel.bvh_builder import MAX_LEAF
from phosphorus_mk2_tpu.accel.intersect import T_MAX

BLOCK = 256
STACK_DEPTH = 192


def _leaf_tri_tables(scene):
    """Leaf-ordered triangle component tables, shaped (G, 8) per
    component (pre-gathered host-side at BVH attach time)."""
    bvh = scene.bvh
    a, e0, e1 = bvh["leaf_a"], bvh["leaf_e0"], bvh["leaf_e1"]

    def comps(x):
        return x[..., 0], x[..., 1], x[..., 2]

    return comps(a), comps(e0), comps(e1), bvh["leaf_id"]


def _block_traverse(bvh, leaf_a, leaf_e0, leaf_e1, leaf_id, p, d, t0, any_hit):
    """Traverse one block. p, d: (B, 3); t0: (B,)."""
    inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)
    # ray components as (1, B) rows
    px, py, pz = p[:, 0][None], p[:, 1][None], p[:, 2][None]
    ix, iy, iz = inv[:, 0][None], inv[:, 1][None], inv[:, 2][None]
    dx, dy, dz = d[:, 0][None], d[:, 1][None], d[:, 2][None]

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

        # (8, B) slab tests, component form
        t0x = (bmin[:, 0:1] - px) * ix
        t1x = (bmax[:, 0:1] - px) * ix
        t0y = (bmin[:, 1:2] - py) * iy
        t1y = (bmax[:, 1:2] - py) * iy
        t0z = (bmin[:, 2:3] - pz) * iz
        t1z = (bmax[:, 2:3] - pz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        ray_live = best_tri < 0 if any_hit else jnp.ones(best_t.shape, bool)
        hit = (tn <= tf) & (tf >= 0.0) & (tn < best_t[None]) & ray_live[None]
        slot_hit = hit.any(axis=1) & (child >= 0)  # (8,)

        is_leaf = slot_hit & (count > 0)
        is_inner = slot_hit & (count == 0)

        # --- leaves: (8 tris x B rays) masked MT per hit slot ----------
        def leaf_step(k, best):
            best_t, best_tri, best_u, best_v = best
            group = child[k] // MAX_LEAF
            ax = jax.lax.dynamic_index_in_dim(leaf_a[0], group)[:, :, None]
            ay = jax.lax.dynamic_index_in_dim(leaf_a[1], group)[:, :, None]
            az = jax.lax.dynamic_index_in_dim(leaf_a[2], group)[:, :, None]
            e0x = jax.lax.dynamic_index_in_dim(leaf_e0[0], group)[:, :, None]
            e0y = jax.lax.dynamic_index_in_dim(leaf_e0[1], group)[:, :, None]
            e0z = jax.lax.dynamic_index_in_dim(leaf_e0[2], group)[:, :, None]
            e1x = jax.lax.dynamic_index_in_dim(leaf_e1[0], group)[:, :, None]
            e1y = jax.lax.dynamic_index_in_dim(leaf_e1[1], group)[:, :, None]
            e1z = jax.lax.dynamic_index_in_dim(leaf_e1[2], group)[:, :, None]
            # squeeze the leading 1-dim from dynamic_index keepdims
            ax, ay, az = ax[0], ay[0], az[0]          # (8, 1)
            e0x, e0y, e0z = e0x[0], e0y[0], e0z[0]
            e1x, e1y, e1z = e1x[0], e1y[0], e1z[0]
            ids = jax.lax.dynamic_index_in_dim(leaf_id, group, keepdims=False)  # (8,)
            valid = ((jnp.arange(MAX_LEAF) < count[k]) & is_leaf[k])[:, None]

            # MT in (8, B)
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
            ok = (
                valid
                & ~near0
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t >= 0.0)
                & (t < best_t[None])
            )
            t_m = jnp.where(ok, t, T_MAX)
            j = jnp.argmin(t_m, axis=0)                      # (B,)
            cols = jnp.arange(t_m.shape[1])
            better = ok[j, cols]
            return (
                jnp.where(better, t_m[j, cols], best_t),
                jnp.where(better, ids[j], best_tri),
                jnp.where(better, u[j, cols], best_u),
                jnp.where(better, v[j, cols], best_v),
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
        tmin_per_child = jnp.where(hit, tn, T_MAX).min(axis=1)  # (8,)
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


def _run_blocks(scene, p, d, t0, any_hit, block):
    # primal-only traversal (ids/visibility; the differentiable path is
    # reintersect) — sever inputs so the while loop never needs a
    # reverse rule even under tangent-carrying tmax
    p, d, t0 = jax.lax.stop_gradient((p, d, t0))
    leaf_a, leaf_e0, leaf_e1, leaf_id = _leaf_tri_tables(scene)
    n = p.shape[0]
    pad = (-n) % block
    pp = jnp.pad(p, ((0, pad), (0, 0)))
    dd = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    tt = jnp.pad(t0, (0, pad))
    pp = pp.reshape(-1, block, 3)
    dd = dd.reshape(-1, block, 3)
    tt = tt.reshape(-1, block)
    t, tri, u, v = jax.vmap(
        lambda bp, bd, bt: _block_traverse(
            scene.bvh, leaf_a, leaf_e0, leaf_e1, leaf_id, bp, bd, bt, any_hit
        )
    )(pp, dd, tt)
    return (
        t.reshape(-1)[:n],
        tri.reshape(-1)[:n],
        u.reshape(-1)[:n],
        v.reshape(-1)[:n],
    )


def intersect_blocks(scene, p, d, tmax=None, block: int = BLOCK):
    """Closest-hit over the wavefront in shared-stack blocks."""
    n = p.shape[0]
    t0 = jnp.full((n,), T_MAX) if tmax is None else tmax
    t, tri, u, v = _run_blocks(scene, p, d, t0, False, block)
    return {"t": t, "tri": tri, "u": u, "v": v, "hit": tri >= 0}


def occluded_blocks(scene, p, d, tmax, block: int = BLOCK):
    """Any-hit over the wavefront in shared-stack blocks (rays with
    tmax <= 0 are treated as unoccluded)."""
    disabled = tmax <= 0.0
    t0 = jnp.where(disabled, 1e-6, tmax)
    _, tri, _, _ = _run_blocks(scene, p, d, t0, True, block)
    return (tri >= 0) & ~disabled
