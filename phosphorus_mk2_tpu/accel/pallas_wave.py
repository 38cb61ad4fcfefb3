"""Pallas TPU kernel: fused per-ray cluster-row DMA + Moller-Trumbore
+ min-update for one wave column of a ray chunk.

The XLA wave body (gather rows -> MT -> min-update) measures ~190 us
per 2048-ray chunk-wave at BMW scale and runs at ~50 GB/s effective —
~3x its gather stream's bytes in materialized intermediates
(tools/tpu_r4l_dedup.py expE). This kernel keeps everything in VMEM:
each ray's 4.6 KB cluster row is DMA'd HBM->VMEM directly (measured
27 ns/row serial, 18 ns start-ahead — FASTER than the XLA gather
engine's per-row cost; tools/tpu_r4q_dma.py), the MT chain and the
winner min-update never touch HBM, and the only HBM writes are the
(CH,) best records.

Mosaic rules this kernel is built around (r4q):
  * DMA ends use scalar LEADING-dim indexing on 3D buffers — a
    pl.ds slice of 1 on a tiled dim is illegal;
  * no vector.load at dynamic sublane offsets;
  * DMA start/wait inside lax.fori_loop is fine (the row index reads
    from the scalar-prefetch SMEM ref).

Semantics identical to cluster_traverse._mt_rows with ww=1 (the
straggler loop's shape): dead lanes fetch row 0 and are masked by
`live`; the winner is the first (lowest-lane) minimum; `better`
requires t < best_t (strict). Oracle-tested in interpret mode
(tests/test_pallas_wave.py) and through the tracer tune matrix.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_MAX = 3.4e38
_TMAXF = 3.4e38
TILE = 256  # rays MT'd per DMA barrier; scratch = TILE x 4.6 KB ~ 1.2 MB


def _kernel(ids_sref, rows_ref, live_ref, idv_ref, p_ref, d_ref,
            bt_ref, bc_ref, bl_ref, out_t_ref, out_c_ref, out_l_ref,
            scratch, sems, *, ch, C):
    """ids_sref: (ch,) int32 scalar-prefetch (SMEM) — DMA row indices,
    pre-masked to 0 on dead lanes. rows_ref: (K, 1, 9*C) f32 in HBM.
    live/idv/p/d/bt/bc/bl: (ch, ...) VMEM blocks (idv = ids again, as
    a VECTOR for the cid update). Outputs (ch, 1). scratch:
    (TILE, 1, 9*C) VMEM; sems: (TILE,) DMA semaphores."""
    tiles = ch // TILE

    def mk(i, slot):
        return pltpu.make_async_copy(
            rows_ref.at[ids_sref[i]], scratch.at[slot], sems.at[slot]
        )

    NB = 16  # DMA start-ahead window. Starting all TILE copies then
    # waiting measured 245 ns/row (oversubscribed DMA queue); r4q's
    # rolling <=8-deep window ran at 18-27 ns/row. Destination slots
    # are distinct per row, so the window only bounds in-flight count.
    for t in range(tiles):  # static: all slices below are constant
        base = t * TILE
        for j in range(NB):  # static prologue
            mk(base + j, j).start()

        def roll(j, c, base=base):
            mk(base + j, j).wait()

            @pl.when(j + NB < TILE)
            def _():
                mk(base + j + NB, j + NB).start()

            return c

        jax.lax.fori_loop(0, TILE, roll, 0)

        rows = scratch[:, 0, :]                      # (TILE, 9C)
        ax = rows[:, 0 * C : 1 * C]
        ay = rows[:, 1 * C : 2 * C]
        az = rows[:, 2 * C : 3 * C]
        e0x = rows[:, 3 * C : 4 * C]
        e0y = rows[:, 4 * C : 5 * C]
        e0z = rows[:, 5 * C : 6 * C]
        e1x = rows[:, 6 * C : 7 * C]
        e1y = rows[:, 7 * C : 8 * C]
        e1z = rows[:, 8 * C : 9 * C]

        px = p_ref[base : base + TILE, 0:1]
        py = p_ref[base : base + TILE, 1:2]
        pz = p_ref[base : base + TILE, 2:3]
        dx = d_ref[base : base + TILE, 0:1]
        dy = d_ref[base : base + TILE, 1:2]
        dz = d_ref[base : base + TILE, 2:3]

        # identical chain order to cluster_traverse._mt_rows
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
        tt = (e1x * qvx + e1y * qvy + e1z * qvz) * ood

        bt = bt_ref[base : base + TILE, 0:1]
        live = live_ref[base : base + TILE, 0:1] > 0
        ok = (
            (~near0)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (tt >= 0.0) & (tt < bt) & live
        )
        t_m = jnp.where(ok, tt, jnp.float32(_TMAXF))
        t_new = jnp.min(t_m, axis=1, keepdims=True)  # (TILE, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 1)
        lane = jnp.min(
            jnp.where(t_m == t_new, col, jnp.int32(1 << 30)),
            axis=1, keepdims=True,
        )
        better = t_new < bt
        out_t_ref[base : base + TILE, :] = jnp.where(better, t_new, bt)
        out_c_ref[base : base + TILE, :] = jnp.where(
            better, idv_ref[base : base + TILE, 0:1],
            bc_ref[base : base + TILE, 0:1],
        )
        out_l_ref[base : base + TILE, :] = jnp.where(
            better, lane, bl_ref[base : base + TILE, 0:1]
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def wave_mt_pallas(rows3, ids, live, p, d, best_t, best_cid, best_lane,
                   interpret: bool = False):
    """One wave column for a chunk: returns updated (t, cid, lane).

    rows3: (K, 1, 9*C) f32 cluster component rows (the (K, 9, C) table
    reshaped — comp-major W index, matching the kernel's slicing).
    ids: (ch,) int32 cluster per ray (pre-masked: dead lanes -> 0).
    live: (ch,) bool; p, d: (ch, 3); best_*: (ch,).
    ch must be a multiple of TILE (the straggler loop's chunk sizes
    are; callers pad otherwise).
    """
    n0 = ids.shape[0]
    pad = (-n0) % TILE
    if pad:  # dead-lane padding up to the DMA tile size
        ids = jnp.pad(ids, (0, pad))
        live = jnp.pad(live, (0, pad))
        p = jnp.pad(p, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        best_t = jnp.pad(best_t, (0, pad))
        best_cid = jnp.pad(best_cid, (0, pad), constant_values=-1)
        best_lane = jnp.pad(best_lane, (0, pad))
    ch = n0 + pad
    W = rows3.shape[2]
    C = W // 9

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # rows stay in HBM
            pl.BlockSpec((ch, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, 3), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, 3), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ch, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE, 1, W), jnp.float32),
            pltpu.SemaphoreType.DMA((TILE,)),
        ],
    )
    t, cid, lane = pl.pallas_call(
        functools.partial(_kernel, ch=ch, C=C),
        out_shape=(
            jax.ShapeDtypeStruct((ch, 1), jnp.float32),
            jax.ShapeDtypeStruct((ch, 1), jnp.int32),
            jax.ShapeDtypeStruct((ch, 1), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        ids, rows3,
        live.astype(jnp.int32)[:, None],
        ids[:, None],
        p, d,
        best_t[:, None], best_cid[:, None], best_lane[:, None],
    )
    return t[:n0, 0], cid[:n0, 0], lane[:n0, 0]
