"""Binned-SAH 8-wide BVH builder (host side).

Counterpart of the reference's builder (reference
src/accel/bvh/binned_sah_builder.hpp: 12 SAH bins over 3 axes, leaves of
up to 8 triangles, 8-way nodes formed by repeatedly splitting the child
with the most primitives — :229-241) producing the flattened SoA node
arrays the TPU traversal consumes (the reference's mbvh::node_t<8> SoA
bounds layout, src/accel/bvh/node.hpp:12-23, becomes plain (n, 8, 3)
jnp arrays in HBM).

Differences from the reference (documented):
  * a leaf is emitted only when a subtree has <= MAX_LEAF prims; the
    reference's SAH-cost leaf test can emit larger leaves split across
    multiple packed records (bvh.cpp:68-75). Bounded leaves keep the
    traversal's inner loop static, which XLA/Pallas require.
  * degenerate splits (all centroids equal) fall back to a median split
    instead of a giant leaf.

This is the correctness builder in numpy; the C++ builder in native/
(same output format) is the production path for multi-million-triangle
scenes.
"""
from __future__ import annotations

import numpy as np

NUM_BINS = 12       # reference binned_sah_builder.hpp:17
MAX_LEAF = 8        # reference binned_sah_builder.hpp:18
WIDTH = 8           # 8-wide nodes, reference node.hpp:12
SENTINEL = -1
CLUSTER_TRIS = 128  # triangle-cluster granularity for the sorted
                    # cluster tracer (accel/cluster_traverse.py)
SUPER_CLUSTERS = 16  # clusters per supercluster (hierarchical culling)


class _BuildCtx:
    def __init__(self, bmin, bmax, centroid):
        self.bmin = bmin
        self.bmax = bmax
        self.centroid = centroid
        self.node_bmin = []
        self.node_bmax = []
        self.node_child = []
        self.node_count = []
        self.leaf_tris = []


def _bounds_of(ctx, idx):
    return ctx.bmin[idx].min(axis=0), ctx.bmax[idx].max(axis=0)


def _sah_split(ctx, idx):
    """Best binned-SAH split over 3 axes. Returns (axis, threshold,
    left_idx, right_idx) or None when degenerate."""
    cent = ctx.centroid[idx]
    cmin = cent.min(axis=0)
    cmax = cent.max(axis=0)
    ext = cmax - cmin
    best = None  # (cost, axis, bin)
    for axis in range(3):
        if ext[axis] <= 0.0:
            continue
        scale = NUM_BINS * (1.0 - 1e-6) / ext[axis]
        bins = np.minimum(
            ((cent[:, axis] - cmin[axis]) * scale).astype(np.int32), NUM_BINS - 1
        )
        counts = np.bincount(bins, minlength=NUM_BINS)
        # per-bin bounds
        bin_min = np.full((NUM_BINS, 3), np.inf)
        bin_max = np.full((NUM_BINS, 3), -np.inf)
        for b in range(NUM_BINS):
            sel = bins == b
            if counts[b]:
                bin_min[b] = ctx.bmin[idx][sel].min(axis=0)
                bin_max[b] = ctx.bmax[idx][sel].max(axis=0)
        # sweep: cost(i) = SA(left<=i)*n_left + SA(right>i)*n_right
        lmin = np.minimum.accumulate(bin_min, axis=0)
        lmax = np.maximum.accumulate(bin_max, axis=0)
        rmin = np.minimum.accumulate(bin_min[::-1], axis=0)[::-1]
        rmax = np.maximum.accumulate(bin_max[::-1], axis=0)[::-1]
        lcnt = np.cumsum(counts)
        rcnt = lcnt[-1] - lcnt

        def area(mn, mx):
            d = np.maximum(mx - mn, 0.0)
            return 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0])

        for b in range(NUM_BINS - 1):
            if lcnt[b] == 0 or rcnt[b] == 0:
                continue
            cost = area(lmin, lmax)[b] * lcnt[b] + area(rmin[1:], rmax[1:])[b] * rcnt[b]
            if best is None or cost < best[0]:
                best = (cost, axis, b, bins)
    if best is None:
        return None
    _, axis, b, bins = best
    left = idx[bins <= b]
    right = idx[bins > b]
    if left.size == 0 or right.size == 0:
        return None
    return left, right


def _split_or_median(ctx, idx):
    s = _sah_split(ctx, idx)
    if s is not None:
        return s
    # degenerate: median split on the largest-extent axis (by index order)
    half = idx.size // 2
    return idx[:half], idx[half:]


def _build_node(ctx, idx) -> int:
    """Emit one 8-wide node for `idx`; returns node id."""
    # children start as a binary split, then the largest child keeps
    # splitting until we have WIDTH children or only leaves remain
    # (reference binned_sah_builder.hpp:224-241)
    children = [idx]
    while len(children) < WIDTH:
        sizes = [c.size for c in children]
        largest = int(np.argmax(sizes))
        if sizes[largest] <= MAX_LEAF:
            break
        l, r = _split_or_median(ctx, children[largest])
        children[largest : largest + 1] = [l, r]

    node_id = len(ctx.node_child)
    ctx.node_bmin.append(np.zeros((WIDTH, 3), np.float32))
    ctx.node_bmax.append(np.zeros((WIDTH, 3), np.float32))
    ctx.node_child.append(np.full((WIDTH,), SENTINEL, np.int32))
    ctx.node_count.append(np.zeros((WIDTH,), np.int32))

    for k, child in enumerate(children):
        mn, mx = _bounds_of(ctx, child)
        ctx.node_bmin[node_id][k] = mn
        ctx.node_bmax[node_id][k] = mx
        if child.size <= MAX_LEAF:
            ctx.node_child[node_id][k] = len(ctx.leaf_tris)
            ctx.node_count[node_id][k] = child.size
            # each leaf record is padded to MAX_LEAF entries so offsets are
            # group-aligned (block traversal indexes leaf groups by
            # offset // MAX_LEAF)
            ctx.leaf_tris.extend(child.tolist())
            ctx.leaf_tris.extend([0] * (MAX_LEAF - child.size))
        else:
            cid = _build_node(ctx, child)
            ctx.node_child[node_id][k] = cid
            ctx.node_count[node_id][k] = 0
    return node_id


def build_bvh(vertices: np.ndarray, faces: np.ndarray) -> dict:
    """Build the flattened 8-wide BVH. Returns numpy arrays:
      node_bmin/node_bmax: (n_nodes, 8, 3) f32
      node_child: (n_nodes, 8) i32 — inner: child node id; leaf: offset
                  into leaf_tris; empty slot: -1
      node_count: (n_nodes, 8) i32 — 0 for inner/empty, else leaf size
      leaf_tris:  (LT,) i32 triangle ids (padded to MAX_LEAF multiple)
    """
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces, np.int32)
    tri = vertices[faces]  # (T, 3, 3)
    bmin = tri.min(axis=1)
    bmax = tri.max(axis=1)
    centroid = 0.5 * (bmin + bmax)

    ctx = _BuildCtx(bmin, bmax, centroid)
    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100000))
    try:
        _build_node(ctx, np.arange(faces.shape[0]))
    finally:
        sys.setrecursionlimit(old_limit)

    leaf = np.asarray(ctx.leaf_tris, np.int32)
    if leaf.size == 0:
        leaf = np.zeros((MAX_LEAF,), np.int32)
    return {
        "node_bmin": np.stack(ctx.node_bmin),
        "node_bmax": np.stack(ctx.node_bmax),
        "node_child": np.stack(ctx.node_child),
        "node_count": np.stack(ctx.node_count),
        "leaf_tris": leaf,
    }


def attach_bvh(scene_data, bvh: dict | None = None):
    """Return SceneData with BVH arrays attached (jnp-converted), plus
    pre-gathered leaf triangle tables (leaf-group rows of v0/e0/e1) so
    block traversal never gathers per lane.

    NOTE: the leaf tables snapshot vertex positions — like the BVH
    itself they go stale if vertices are optimized; rebuild per step for
    geometry inverse rendering (gradients flow through the
    differentiable re-intersection, not through these tables).
    """
    import dataclasses

    import jax.numpy as jnp

    verts = np.asarray(scene_data.vertices)
    faces = np.asarray(scene_data.faces)
    if bvh is None:
        from phosphorus_mk2_tpu.accel.native_bvh import build_bvh_native

        bvh = build_bvh_native(verts, faces)
        if bvh is None:
            bvh = build_bvh(verts, faces)
    dev = {k: jnp.asarray(v) for k, v in bvh.items()}

    ids2 = np.asarray(bvh["leaf_tris"]).reshape(-1, MAX_LEAF)
    f = faces[ids2]  # (G, 8, 3)
    a = verts[f[..., 0]]
    dev["leaf_a"] = jnp.asarray(a)
    dev["leaf_e0"] = jnp.asarray(verts[f[..., 1]] - a)
    dev["leaf_e1"] = jnp.asarray(verts[f[..., 2]] - a)
    dev["leaf_id"] = jnp.asarray(ids2)

    # ---- cluster tables for the sorted cluster tracer ----------------
    # leaf-slot validity from the node tables (padded slots repeat tri 0
    # and must not contribute to cluster bounds or intersections)
    valid = np.zeros(ids2.shape, bool)
    nc = np.asarray(bvh["node_count"])
    cc = np.asarray(bvh["node_child"])
    leaf_mask = nc > 0
    groups = cc[leaf_mask] // MAX_LEAF
    counts = nc[leaf_mask]
    for g, cnt in zip(groups, counts):
        valid[g, :cnt] = True

    C = CLUSTER_TRIS
    total = ids2.size
    K = max(1, -(-total // C))
    pad = K * C - total
    flat_ids = np.concatenate([ids2.reshape(-1), np.zeros((pad,), np.int32)])
    flat_valid = np.concatenate([valid.reshape(-1), np.zeros((pad,), bool)])
    cl_ids = flat_ids.reshape(K, C)
    cl_valid = flat_valid.reshape(K, C)

    fc = faces[cl_ids]  # (K, C, 3)
    ca = verts[fc[..., 0]]
    ce0 = verts[fc[..., 1]] - ca
    ce1 = verts[fc[..., 2]] - ca
    # degenerate out invalid slots (det = 0 -> always miss)
    ce0 = np.where(cl_valid[..., None], ce0, 0.0)
    ce1 = np.where(cl_valid[..., None], ce1, 0.0)

    tri_pts = verts[fc]  # (K, C, 3, 3)
    big = np.float32(3.4e38)
    masked_pts = np.where(cl_valid[..., None, None], tri_pts, np.float32(np.nan))
    with np.errstate(invalid="ignore"):
        bmin = np.nanmin(masked_pts.reshape(K, -1, 3), axis=1)
        bmax = np.nanmax(masked_pts.reshape(K, -1, 3), axis=1)
    empty = ~cl_valid.any(axis=1)
    bmin = np.where(empty[:, None], big, bmin).astype(np.float32)
    bmax = np.where(empty[:, None], -big, bmax).astype(np.float32)

    dev["cluster_a"] = jnp.asarray(ca.astype(np.float32))
    dev["cluster_e0"] = jnp.asarray(ce0.astype(np.float32))
    dev["cluster_e1"] = jnp.asarray(ce1.astype(np.float32))
    dev["cluster_id"] = jnp.asarray(cl_ids)
    dev["cluster_bmin"] = jnp.asarray(bmin)
    dev["cluster_bmax"] = jnp.asarray(bmax)

    # ---- supercluster level (hierarchical front-table for big scenes):
    # groups of SUPER_CLUSTERS clusters; member bounds packed as rows so
    # the tracer row-gathers one supercluster's members per wave
    SC = SUPER_CLUSTERS
    K2 = -(-K // SC)
    pad2 = K2 * SC - K
    big = np.float32(3.4e38)
    mb_min = np.concatenate([bmin, np.full((pad2, 3), big, np.float32)])
    mb_max = np.concatenate([bmax, np.full((pad2, 3), -big, np.float32)])
    dev["sc_member_bmin"] = jnp.asarray(mb_min.reshape(K2, SC, 3))
    dev["sc_member_bmax"] = jnp.asarray(mb_max.reshape(K2, SC, 3))
    dev["sc_bmin"] = jnp.asarray(mb_min.reshape(K2, SC, 3).min(axis=1))
    dev["sc_bmax"] = jnp.asarray(mb_max.reshape(K2, SC, 3).max(axis=1))

    # bf16 copies of every bounds table, rounded OUTWARD (min down, max
    # up) so boxes only grow: slab tnear only drops and hits only get
    # added — conservative for the front table, its horizon test and
    # live-pruning, while halving slab-table gather bytes (the tracer's
    # slab_bf16 tunable; final Moller-Trumbore stays f32-exact).
    for name in ("cluster_bmin", "cluster_bmax", "sc_member_bmin",
                 "sc_member_bmax", "sc_bmin", "sc_bmax"):
        arr = np.asarray(dev[name])
        up = name.endswith("bmax")
        dev[name + "_bf16"] = jnp.asarray(
            _bf16_outward(arr, up=up)
        ).astype(jnp.bfloat16)
    return dataclasses.replace(scene_data, bvh=dev)


def _bf16_outward(x: np.ndarray, up: bool) -> np.ndarray:
    """Round f32 values to the nearest bf16 toward +inf (up) or -inf
    (down). Returned as f32 holding exactly-bf16-representable values.
    Sentinels are clipped inside bf16 finite range first (no infs in
    the slab math)."""
    x = np.ascontiguousarray(
        np.clip(x.astype(np.float32), -3.38e38, 3.38e38)
    )
    bits = x.view(np.uint32)
    t = bits & np.uint32(0xFFFF0000)  # truncate mantissa: round-to-zero
    tv = t.view(np.float32)
    # positive: trunc rounds down; negative: trunc rounds up (toward 0).
    # Nudge one bf16 ulp (add 0x10000 to the bit pattern: away from 0)
    # where truncation went the wrong way for the requested direction.
    need = (tv < x) if up else (tv > x)
    t = np.where(need, t + np.uint32(0x10000), t)
    return t.view(np.float32)
