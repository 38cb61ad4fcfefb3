"""Pallas TPU kernel: fused slab test + top-k extraction for the
hierarchical front table's seed stage.

The XLA form of this stage — an (N, K2) supercluster slab test followed
by k min-extraction rounds — costs ~38 ms of the 220 ms BMW-scale trace
(tools/tpu_r3b_split.py: slab 29.6 ms, +select 8.1 ms): every round
re-streams the (N, K2) table through HBM and the slab materializes
(N, K2, 3) broadcast intermediates. Here the whole stage runs in one
kernel: the bounds table lives in VMEM (K2 x 6 floats — a few hundred
KB even at 1M triangles), a ray block computes its (B, K2) tnear matrix
in registers/VMEM, and the k extraction rounds never touch HBM. One
launch, one (N, k) output write.

Selection semantics are identical to cluster_traverse._select_topk
(mode="extract"): the candidate column index rides in the low mantissa
bits of the nonnegative tnear so ties and ids come out exactly like the
XLA path (oracle-tested in tests/test_pallas_front.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_MAX = jnp.float32(3.4e38)
_TMAXF = 3.4e38  # python float: jnp scalars would be captured consts in-kernel
RAY_BLOCK = 256  # ~4 live (B, K2p) f32 temps must fit VMEM with
                 # double buffering; 512 overflowed on wide scenes
                 # (surfaces as a runtime InvalidArgument from the
                 # remote compile service)


def _kernel(bounds_ref, p_ref, d_ref, tlim_ref, out_ref, *, jj, nbits):
    """bounds_ref: (8, K2p) f32 rows [bmin xyz | bmax xyz | pad pad];
    p/d: (B, 3); tlim: (B, 1); out: (B, jj) f32 (packed keys bitcast to
    float — nonneg float order == uint order, so fmin extracts)."""
    K2p = bounds_ref.shape[1]
    B = p_ref.shape[0]

    tn = jnp.full((B, K2p), -_TMAXF, jnp.float32)
    tf = jnp.full((B, K2p), _TMAXF, jnp.float32)
    for a in range(3):
        bmin = bounds_ref[a : a + 1, :]        # (1, K2p)
        bmax = bounds_ref[a + 3 : a + 4, :]
        pa = p_ref[:, a : a + 1]               # (B, 1)
        da = d_ref[:, a : a + 1]
        inv = 1.0 / jnp.where(da == 0.0, 1e-30, da)
        t0 = (bmin - pa) * inv
        t1 = (bmax - pa) * inv
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))

    tnc = jnp.maximum(tn, 0.0)  # clamp BEFORE the t_limit test: the XLA
    # path (_slab_all) compares the clamped tnear
    pending = (tn <= tf) & (tf >= 0.0) & (tnc < tlim_ref[:, 0:1])
    key = jnp.where(pending, tnc, jnp.float32(_TMAXF))

    # pack the column index into the low mantissa bits (order-preserving
    # for nonnegative floats); extraction then runs as integer min in
    # the SIGNED int32 domain — keys are nonnegative floats so their bit
    # patterns are nonnegative int32 and int order == float order (a
    # float-domain fmin would flush tn=0 packed keys — denormals — to
    # zero, and Mosaic has no uint32 reductions)
    mask = jnp.int32(-(1 << nbits))  # 0xFFFFFFFF ^ ((1 << nbits) - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, K2p), 1)
    keyi = (jax.lax.bitcast_convert_type(key, jnp.int32) & mask) | col
    dead = jnp.int32(0x7FFFFFFF)  # > any packed key (max exponent 0x7F7F...)

    for r in range(jj):
        m = jnp.min(keyi, axis=1, keepdims=True)  # (B, 1)
        out_ref[:, r : r + 1] = m
        keyi = jnp.where(keyi == m, dead, keyi)


@functools.partial(jax.jit, static_argnames=("jj", "interpret"))
def slab_extract_pallas(bounds6, p, d, t_limit, jj: int = 16,
                        interpret: bool = False):
    """Fused (N, K2) slab + top-jj extraction.

    bounds6: (K2, 6) f32 [bmin|bmax] (NaN rows = padding, never hit).
    Returns (ttbl (N, jj) f32, idtbl (N, jj) int32) front-to-back.
    """
    n = p.shape[0]
    K2 = bounds6.shape[0]
    K2p = -(-K2 // 128) * 128
    nbits = max(1, (K2p - 1).bit_length())

    bt = jnp.full((8, K2p), jnp.nan, jnp.float32)
    bt = bt.at[:6, :K2].set(bounds6.T)

    B = min(RAY_BLOCK, n)
    npad = -(-n // B) * B
    pp = jnp.pad(p, ((0, npad - n), (0, 0)))
    dd = jnp.pad(d, ((0, npad - n), (0, 0)), constant_values=1.0)
    tl = jnp.pad(t_limit, (0, npad - n))[:, None]  # pad tlim=0: no hits

    grid = npad // B
    out = pl.pallas_call(
        functools.partial(_kernel, jj=jj, nbits=nbits),
        out_shape=jax.ShapeDtypeStruct((npad, jj), jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, K2p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, jj), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(bt, pp, dd, tl)

    bits = jax.lax.bitcast_convert_type(out[:n], jnp.uint32)
    key_mask = jnp.uint32(0xFFFFFFFF ^ ((1 << nbits) - 1))
    key_bits = bits & key_mask
    tmax_key = (
        jax.lax.bitcast_convert_type(jnp.float32(T_MAX), jnp.uint32)
        & key_mask
    )
    ids = (bits & jnp.uint32((1 << nbits) - 1)).astype(jnp.int32)
    t = jnp.where(
        key_bits >= tmax_key,
        T_MAX,
        jax.lax.bitcast_convert_type(key_bits, jnp.float32),
    )
    return t, ids


# ---------------------------------------------------------------------------
# full-front fusion: slab + extract + member expand + final select, one kernel


def _kernel_full(bounds_ref, memb_ref, p_ref, d_ref, tlim_ref,
                 out_p_ref, out_c_ref, *, jj, sc, nbits_p, nbits_c):
    """Hierarchical front table for one ray block, VMEM-resident.

    bounds_ref: (8, K2p) supercluster [bmin|bmax|pad] rows (NaN = pad).
    memb_ref: (K2p, SCP) member bounds, axis-major layout
      memb[k, a*sc + s] = bounds axis a of member s of parent k
      (a 0..2 bmin, 3..5 bmax), SANITIZED: empty slots hold +BIGF point
      boxes (a one-hot MXU matmul cannot tolerate NaN rows — 0*NaN=NaN
      — and inverted boxes hit every ray), culled by the tn >= 1e37
      test below so they decode to T_MAX exactly like the XLA path.
    out_p_ref: (B, jj) int32 packed parent keys (tn | parent id).
    out_c_ref: (B, jj*sc) int32 packed candidate keys (tn | column id),
      column = j*sc + s, UNSELECTED — the host sorts and takes the
      top-kk (a cheap (N, jj*sc) row sort; v1 of this kernel ran kk=32
      SEQUENTIAL min-extraction rounds per block and the whole kernel
      measured 58 us/block — dependency-chain latency, not bandwidth).

    v2 structure (tools/tpu_r4n_front.py): extract the jj parents with
    the unavoidable sequential min rounds, but expand ALL jj member
    sets with ONE batched one-hot matmul ((B*jj, K2p) x (K2p, SCP))
    instead of jj small sequential MXU calls — v1's other latency
    chain.
    """
    K2p = bounds_ref.shape[1]
    B = p_ref.shape[0]

    # --- stage 1: supercluster slab (identical to _kernel) -----------
    tn = jnp.full((B, K2p), -_TMAXF, jnp.float32)
    tf = jnp.full((B, K2p), _TMAXF, jnp.float32)
    invs = []
    for a in range(3):
        bmin = bounds_ref[a : a + 1, :]
        bmax = bounds_ref[a + 3 : a + 4, :]
        pa = p_ref[:, a : a + 1]
        da = d_ref[:, a : a + 1]
        inv = 1.0 / jnp.where(da == 0.0, 1e-30, da)
        invs.append(inv)
        t0 = (bmin - pa) * inv
        t1 = (bmax - pa) * inv
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    tnc = jnp.maximum(tn, 0.0)
    pending = (tn <= tf) & (tf >= 0.0) & (tnc < tlim_ref[:, 0:1])
    key = jnp.where(pending, tnc, jnp.float32(_TMAXF))

    import numpy as _np

    mask_p = jnp.int32(-(1 << nbits_p))
    col = jax.lax.broadcasted_iota(jnp.int32, (B, K2p), 1)
    keyi = (jax.lax.bitcast_convert_type(key, jnp.int32) & mask_p) | col
    dead = jnp.int32(0x7FFFFFFF)
    # python-int constant (a jnp scalar would be a captured const)
    tmax_key_p = jnp.int32(
        int(_np.float32(_TMAXF).view(_np.int32)) & -(1 << nbits_p)
    )

    # --- stage 2: extract the jj nearest parents ---------------------
    pcols = []
    pvalids = []
    for j in range(jj):
        m = jnp.min(keyi, axis=1, keepdims=True)  # (B, 1)
        out_p_ref[:, j : j + 1] = m
        keyi = jnp.where(keyi == m, dead, keyi)
        pcols.append(m & jnp.int32((1 << nbits_p) - 1))
        pvalids.append((m & mask_p) < tmax_key_p)

    # --- stage 3: ONE batched one-hot member expansion ---------------
    # j-major row grouping: block j of the (jj*B, K2p) one-hot covers
    # rows [j*B, (j+1)*B) and is built from per-j (B, K2p) compares —
    # axis-0 concatenation and static slices only. (A (B, jj) ->
    # (B*jj, 1) reshape crosses the Mosaic lane/sublane layout
    # boundary and the remote compile rejects it — the first v2 form.)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (B, K2p), 1)
    oh = jnp.concatenate(
        [((iota_k == pcols[j]) & pvalids[j]).astype(jnp.float32)
         for j in range(jj)],
        axis=0,
    )  # (jj*B, K2p)
    rows = jax.lax.dot_general(
        oh, memb_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # Precision.HIGHEST is REQUIRED for geometry routing: the TPU
        # MXU truncates f32 operands to bf16 at DEFAULT precision, so
        # the routed member BOUNDS quantize ~0.4% -> wrong slab tnear
        # keys -> the true nearest cluster can drop out of both the
        # front table AND the horizon (fallback) test -> sparse
        # deterministic wrong-hit pixels (found as black dashes on the
        # round-5 config-4 frame; fixed sites verified clean on chip).
        # Interpret-mode tests CANNOT catch this class — CPU dots are
        # exact at any precision (VALIDATION.md round-4 note, r4l expH:
        # the same hazard measured +79% false occlusions in wave
        # routing). The one-hot operand is exact either way (0/1
        # survive bf16); only the bounds side needed the guarantee.
        precision=jax.lax.Precision.HIGHEST,
    )  # (jj*B, SCP), j-major

    cands = []
    for j in range(jj):
        rj = rows[j * B : (j + 1) * B]
        tn2 = jnp.full((B, sc), -_TMAXF, jnp.float32)
        tf2 = jnp.full((B, sc), _TMAXF, jnp.float32)
        for a in range(3):
            bmin = rj[:, a * sc : (a + 1) * sc]
            bmax = rj[:, (3 + a) * sc : (4 + a) * sc]
            t0 = (bmin - p_ref[:, a : a + 1]) * invs[a]
            t1 = (bmax - p_ref[:, a : a + 1]) * invs[a]
            tn2 = jnp.maximum(tn2, jnp.minimum(t0, t1))
            tf2 = jnp.minimum(tf2, jnp.maximum(t0, t1))
        # _expand_members parity: RAW tn vs t_limit, clamp after; the
        # tn < 1e37 cull maps the sanitized empty-slot point boxes
        # (+BIGF) back to the XLA path's T_MAX
        hit = (
            (tn2 <= tf2) & (tf2 >= 0.0) & pvalids[j]
            & (tn2 < tlim_ref[:, 0:1]) & (tn2 < 1e37)
        )
        cands.append(jnp.where(hit, jnp.maximum(tn2, 0.0),
                               jnp.float32(_TMAXF)))
    cand_t = jnp.concatenate(cands, axis=1)  # (B, jj*sc)

    mask_c = jnp.int32(-(1 << nbits_c))
    ccol = jax.lax.broadcasted_iota(jnp.int32, (B, jj * sc), 1)
    out_c_ref[:, :] = (
        (jax.lax.bitcast_convert_type(cand_t, jnp.int32) & mask_c) | ccol
    )


@functools.partial(jax.jit, static_argnames=("jj", "kk", "interpret",
                                             "ray_block"))
def front_all_pallas(bounds6, memb_bmin, memb_bmax, p, d, t_limit,
                     jj: int = 16, kk: int = 32, interpret: bool = False,
                     ray_block: int = 0):
    """Whole 2-level hierarchical front table in ONE kernel: the
    (N, K2) supercluster slab, top-jj extraction, per-parent member
    expansion (one-hot MXU matmul gathers over the VMEM-resident member
    table — a few hundred KB even at 1M tris) and the final top-kk
    candidate selection never touch HBM. Replaces ~71 ms of HBM-bound
    XLA stages at BMW scale (slab 23.1 + extract 17.5 + expand 30.4 ms,
    tools/tpu_r4e_front.py).

    bounds6: (K2, 6) supercluster [bmin|bmax]; memb_bmin/bmax:
    (K2, SC, 3) member bounds (NaN = padding). Returns
    (ttbl (N, kk) f32, col (N, kk) int32 in [0, jj*SC),
     parent_t (N, jj) f32, parent_id (N, jj) int32) — decode cluster
    ids with cluster_traverse._reconstruct_ids(parent_id, col, SC).
    """
    n = p.shape[0]
    K2, sc = memb_bmin.shape[0], memb_bmin.shape[1]
    K2p = -(-K2 // 128) * 128
    nbits_p = max(1, (K2p - 1).bit_length())
    nbits_c = max(1, (jj * sc - 1).bit_length())
    BIGF = 3.0e38

    bt = jnp.full((8, K2p), jnp.nan, jnp.float32)
    bt = bt.at[:6, :K2].set(bounds6.T)

    # axis-major sanitized member table (see _kernel_full docstring)
    scp = -(-(6 * sc) // 128) * 128
    mb = jnp.full((K2p, scp), BIGF, jnp.float32)
    bmin_s = jnp.where(jnp.isnan(memb_bmin), BIGF, memb_bmin)
    bmax_s = jnp.where(jnp.isnan(memb_bmax), BIGF, memb_bmax)
    for a in range(3):
        mb = mb.at[:K2, a * sc : (a + 1) * sc].set(bmin_s[..., a])
        mb = mb.at[:K2, (3 + a) * sc : (4 + a) * sc].set(bmax_s[..., a])

    if not ray_block:
        # auto-scale the ray block to the 16 MB scoped-VMEM stack: the
        # v1 kernel measured ~23 f32 words per (ray, K2p) element of
        # live ranges (RAY_BLOCK=256 at BMW's K2p=768 allocated 17.03 M
        # and the remote compile died with a truncated HTTP 500 — the
        # r4i in-trace failure, root-caused in tools/tpu_r4l_dedup
        # expC); v2 adds the (B*jj, K2p) batched one-hot (+jj words per
        # element at jj=16) — budget ~40 words.
        # 39-word budget: B=128 at BMW's K2p=768 compiles at ~15.3 M
        # (measured working, 36.7 ms — tools/tpu_r4o_frontv2.py) while
        # B=256 at v1's 23-word profile already overflowed; halve until
        # it fits for wider scenes.
        ray_block = RAY_BLOCK
        while ray_block > 32 and ray_block * K2p * 4 * 39 > 15_500_000:
            ray_block //= 2
    B = min(ray_block, n)
    npad = -(-n // B) * B
    pp = jnp.pad(p, ((0, npad - n), (0, 0)))
    dd = jnp.pad(d, ((0, npad - n), (0, 0)), constant_values=1.0)
    tl = jnp.pad(t_limit, (0, npad - n))[:, None]

    grid = npad // B
    out_p, out_c = pl.pallas_call(
        functools.partial(_kernel_full, jj=jj, sc=sc,
                          nbits_p=nbits_p, nbits_c=nbits_c),
        out_shape=(
            jax.ShapeDtypeStruct((npad, jj), jnp.int32),
            jax.ShapeDtypeStruct((npad, jj * sc), jnp.int32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, K2p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2p, scp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, jj), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, jj * sc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(bt, mb, pp, dd, tl)
    # top-kk candidate selection on the host side of the kernel: ONE
    # (N, jj*sc) int row sort of the packed keys (nonneg int32 order ==
    # key order) — v1 ran kk sequential min rounds inside the kernel
    # and the dependency chain dominated its runtime
    out_c = jnp.sort(out_c, axis=1)[:, :kk]

    def decode(packed, nbits):
        bits = jax.lax.bitcast_convert_type(packed, jnp.uint32)
        key_mask = jnp.uint32(0xFFFFFFFF ^ ((1 << nbits) - 1))
        key_bits = bits & key_mask
        tmax_key = (
            jax.lax.bitcast_convert_type(jnp.float32(T_MAX), jnp.uint32)
            & key_mask
        )
        ids = (bits & jnp.uint32((1 << nbits) - 1)).astype(jnp.int32)
        t = jnp.where(
            key_bits >= tmax_key,
            T_MAX,
            jax.lax.bitcast_convert_type(key_bits, jnp.float32),
        )
        return t, ids

    pt, pid = decode(out_p[:n], nbits_p)
    ct_, col = decode(out_c[:n], nbits_c)
    return ct_, col, pt, pid
