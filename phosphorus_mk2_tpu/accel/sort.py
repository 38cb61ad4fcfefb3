"""Wavefront ray sorting for traversal coherence.

The reference gets coherence for free: its 32x32 tiles ARE coherent ray
packets, and its stream traversal re-sorts rays per node (reference
src/kernels/cpu/detail/stream.hpp). A dense TPU wavefront loses that
after the first bounce; block-shared-stack traversal (block_traverse.py)
pays for incoherence with union-of-nodes visits.

This module restores coherence by sorting the wavefront with a key =
(direction octant, Morton code of the quantized origin): one
``jnp.argsort`` per bounce (XLA sort is fast and static-shaped), rays are
traced in sorted order, results scattered back through the inverse
permutation. This is the TPU analogue of classic GPU wavefront ray
reordering.
"""
from __future__ import annotations

import jax.numpy as jnp

MORTON_BITS = 6  # per axis -> 18-bit morton + 3-bit octant


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread MORTON_BITS bits out with 2 gaps (classic Morton spread)."""
    v = v.astype(jnp.uint32)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def ray_sort_keys(p: jnp.ndarray, d: jnp.ndarray, lo, hi) -> jnp.ndarray:
    """(N,) uint32 coherence keys: octant(3b) | morton18(origin)."""
    octant = (
        (d[:, 0] >= 0).astype(jnp.uint32)
        | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
        | ((d[:, 2] >= 0).astype(jnp.uint32) << 2)
    )
    scale = (1 << MORTON_BITS) - 1
    ext = jnp.maximum(hi - lo, 1e-8)
    q = jnp.clip((p - lo) / ext, 0.0, 1.0) * scale
    q = q.astype(jnp.uint32)
    morton = (
        _expand_bits(q[:, 0])
        | (_expand_bits(q[:, 1]) << 1)
        | (_expand_bits(q[:, 2]) << 2)
    )
    return (octant << jnp.uint32(18)) | morton


def sorted_trace(trace_fn, scene, p, d, *args):
    """Run a tracer on a coherence-sorted wavefront; return results in
    original ray order. ``trace_fn(scene, p, d, *args)`` -> dict or
    array pytree with leading axis N."""
    import jax

    lo = jnp.min(jax.lax.stop_gradient(scene.vertices), axis=0)
    hi = jnp.max(jax.lax.stop_gradient(scene.vertices), axis=0)
    keys = ray_sort_keys(p, d, lo, hi)
    order = jnp.argsort(keys)
    inv = jnp.argsort(order)

    def permute(x, idx):
        return jax.tree_util.tree_map(lambda a: a[idx], x)

    sorted_args = [permute(a, order) for a in (p, d, *args)]
    out = trace_fn(scene, *sorted_args)
    return permute(out, inv)
