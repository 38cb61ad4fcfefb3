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
