"""Pallas TPU kernel: dense Moller-Trumbore over ray tiles.

The XLA path (accel/intersect.py) relies on fusion to keep the MT
intermediate chain in registers; this Pallas kernel makes that explicit:
a tile of rays stays resident in VMEM while the kernel loops over
triangle chunks, so HBM traffic is exactly one read of the triangle
tables per ray-tile plus one write of the hit records. Grid = ray tiles;
per-iteration math is identical to mt_intersect_soa (the correctness
oracle, tested in tests/test_pallas.py via interpret mode).

Used for small scenes / cluster leaf batches; the traversal-level
scheduling stays in XLA (accel/cluster_traverse.py) where sorts and
scans are already optimal.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 256
TRI_TILE = 512
T_MAX = 3.4e38


def _mt_kernel(tri_ref, p_ref, d_ref, t_ref, tri_id_ref, u_ref, v_ref, *, n_tri_chunks):
    """One ray tile vs all triangles.

    tri_ref: (10, n_chunks * TRI_TILE) f32 component rows
             [ax ay az e0x e0y e0z e1x e1y e1z id_as_float] — component
             axis first so chunk slices land on the 128-lane axis
    p_ref, d_ref: (RAY_TILE, 3); outputs (RAY_TILE,... as (RAY_TILE, 1)).
    """
    px = p_ref[:, 0:1]
    py = p_ref[:, 1:2]
    pz = p_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz = d_ref[:, 2:3]

    def chunk(ci, carry):
        best_t, best_tri, best_u, best_v = carry
        base = ci * TRI_TILE
        rows = tri_ref[:, pl.ds(base, TRI_TILE)]  # (10, TRI_TILE)
        ax = rows[0:1, :]
        ay = rows[1:2, :]
        az = rows[2:3, :]
        e0x = rows[3:4, :]
        e0y = rows[4:5, :]
        e0z = rows[5:6, :]
        e1x = rows[6:7, :]
        e1y = rows[7:8, :]
        e1z = rows[8:9, :]
        ids = rows[9:10, :]

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
            (~near0)
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t >= 0.0)
            & (t < best_t)
            & (ids >= 0.0)
        )
        # reduction-based argmin extraction (Mosaic has no
        # take_along_axis/gather lowering inside kernels): min-t, then a
        # unique one-hot via the lowest matching column index
        t_m = jnp.where(ok, t, T_MAX)
        t_new = jnp.min(t_m, axis=1, keepdims=True)       # (R, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 1)
        sel = (t_m == t_new) & ok
        jsel = jnp.min(jnp.where(sel, col, jnp.int32(2**30)), axis=1, keepdims=True)
        pick = (col == jsel) & sel                        # unique one-hot
        pickf = pick.astype(jnp.float32)
        better = t_new < best_t
        best_tri = jnp.where(
            better, jnp.sum(ids * pickf, axis=1, keepdims=True), best_tri
        )
        best_u = jnp.where(
            better, jnp.sum(u * pickf, axis=1, keepdims=True), best_u
        )
        best_v = jnp.where(
            better, jnp.sum(v * pickf, axis=1, keepdims=True), best_v
        )
        best_t = jnp.where(better, t_new, best_t)
        return best_t, best_tri, best_u, best_v

    init = (
        jnp.full((RAY_TILE, 1), T_MAX, jnp.float32),
        jnp.full((RAY_TILE, 1), -1.0, jnp.float32),
        jnp.zeros((RAY_TILE, 1), jnp.float32),
        jnp.zeros((RAY_TILE, 1), jnp.float32),
    )
    best_t, best_tri, best_u, best_v = jax.lax.fori_loop(
        0, n_tri_chunks, chunk, init
    )
    t_ref[:, :] = best_t
    tri_id_ref[:, :] = best_tri
    u_ref[:, :] = best_u
    v_ref[:, :] = best_v


def _tri_rows(scene):
    """(10, ceil(T/TRI_TILE)*TRI_TILE) packed triangle component rows."""
    verts = jax.lax.stop_gradient(scene.vertices)
    f = scene.faces
    a = verts[f[:, 0]]
    e0 = verts[f[:, 1]] - a
    e1 = verts[f[:, 2]] - a
    ids = jnp.arange(f.shape[0], dtype=jnp.float32)[:, None]
    rows = jnp.concatenate([a, e0, e1, ids], axis=1)  # (T, 10)
    pad = (-rows.shape[0]) % TRI_TILE
    filler = jnp.zeros((pad, 10), jnp.float32).at[:, 9].set(-1.0)
    return jnp.concatenate([rows, filler], axis=0).T


def intersect_pallas_brute(scene, p, d, tmax=None, interpret: bool = False):
    """Closest-hit via the Pallas dense MT kernel. Same contract as
    intersect_brute. tmax handled by post-masking (the kernel computes
    unbounded closest hits)."""
    rows = _tri_rows(scene)
    n_chunks = rows.shape[1] // TRI_TILE

    n = p.shape[0]
    pad = (-n) % RAY_TILE
    pp = jnp.pad(p, ((0, pad), (0, 0)))
    dd = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    n_tiles = pp.shape[0] // RAY_TILE

    kernel = functools.partial(_mt_kernel, n_tri_chunks=n_chunks)
    out_shape = [
        jax.ShapeDtypeStruct((pp.shape[0], 1), jnp.float32) for _ in range(4)
    ]
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            # full triangle table resident in VMEM (small scenes / leaf
            # batches; ~40 B/tri so 100k tris ~ 4 MB still fits)
            pl.BlockSpec(
                (10, rows.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
    )
    t, tri_f, u, v = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(rows, pp, dd)

    t = t[:n, 0]
    tri = tri_f[:n, 0].astype(jnp.int32)
    u = u[:n, 0]
    v = v[:n, 0]
    if tmax is not None:
        miss = t >= tmax
        tri = jnp.where(miss, -1, tri)
    return {"t": t, "tri": tri, "u": u, "v": v, "hit": tri >= 0}


def _anyhit_kernel(tri_ref, p_ref, d_ref, tmax_ref, occ_ref, *, n_tri_chunks):
    """Any-hit over one ray tile: no closest tracking, no argmin
    extraction — just an OR-reduce of valid hits with t < tmax, with a
    tile-level early-out once every ray in the tile is occluded (the
    point of shadow rays, reference stream_bvh_kernel.cpp:61)."""
    px = p_ref[:, 0:1]
    py = p_ref[:, 1:2]
    pz = p_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz = d_ref[:, 2:3]
    tmax = tmax_ref[:, 0:1]

    def cond(carry):
        ci, occ = carry
        return (ci < n_tri_chunks) & ~jnp.all(occ)

    def body(carry):
        ci, occ = carry
        base = ci * TRI_TILE
        rows = tri_ref[:, pl.ds(base, TRI_TILE)]  # (10, TRI_TILE)
        ax = rows[0:1, :]
        ay = rows[1:2, :]
        az = rows[2:3, :]
        e0x = rows[3:4, :]
        e0y = rows[4:5, :]
        e0z = rows[5:6, :]
        e1x = rows[6:7, :]
        e1y = rows[7:8, :]
        e1z = rows[8:9, :]
        ids = rows[9:10, :]

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
            (~near0)
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t >= 0.0)
            & (t < tmax)
            & (ids >= 0.0)
        )
        return ci + 1, occ | jnp.any(ok, axis=1, keepdims=True)

    _, occ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((RAY_TILE, 1), bool))
    )
    occ_ref[:, :] = occ.astype(jnp.int32)


def occluded_pallas_brute(scene, p, d, tmax, interpret: bool = False):
    """Shadow-ray any-hit via a dedicated Pallas kernel (NOT the
    closest-hit kernel + mask): skips the per-chunk argmin extraction
    and early-outs whole ray tiles once fully occluded."""
    rows = _tri_rows(scene)
    n_chunks = rows.shape[1] // TRI_TILE

    n = p.shape[0]
    pad = (-n) % RAY_TILE
    pp = jnp.pad(p, ((0, pad), (0, 0)))
    dd = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    # padded rays get tmax=0: never occluded, never extend the loop
    tm = jnp.pad(jnp.asarray(tmax, jnp.float32)[:, None], ((0, pad), (0, 0)))
    n_tiles = pp.shape[0] // RAY_TILE

    kernel = functools.partial(_anyhit_kernel, n_tri_chunks=n_chunks)
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (10, rows.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    occ = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((pp.shape[0], 1), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rows, pp, dd, tm)
    return (occ[:n, 0] > 0) & (jnp.asarray(tmax) > 0.0)
