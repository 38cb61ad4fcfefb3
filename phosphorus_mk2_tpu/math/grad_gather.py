"""Row gather with a sort+segment-sum transpose.

The vjp of ``table[idx]`` is a scatter-add into the table — the
backward pass's dominant primitive (round-2 diagnosis: BMW-scale
fwd+bwd is scatter-add-bound; the per-bounce attribute-row cotangents
scatter (N, W) rows into the (F, W) table). XLA's TPU scatter
serializes on duplicate indices; the classic alternative is to sort
contributions by target row and segment-sum them, which runs as one
sort + one dense segmented reduction.

``gather_rows(table, idx, transpose="segsum")`` is bit-compatible with
``table[idx]`` in the primal and produces the SAME gradients (addition
reassociated — scatter-add order is unspecified anyway), but lowers the
transpose to:

  1. ``lax.sort`` of (idx, column cotangents...) — multi-operand sort
     carries the values with the key, avoiding the (N, W) narrow-row
     re-gather that a sorted-permutation approach would need (per-lane
     gathers are the measured TPU poison);
  2. ``segment_sum(..., indices_are_sorted=True)``.

Measured head-to-head on TPU in tools/tpu_r4l_dedup.py expG before
being wired anywhere; defaults stay "scatter" until the measurement
says otherwise.

Reference role: the transpose of the deferred-shading accumulation the
reference does with per-thread framebuffer ownership
(src/kernels/cpu/stream_bvh_kernel.cpp accumulate paths) — a TPU
re-design, not a translation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(table, idx, transpose: str = "segsum"):
    """``table[idx]`` with a segment-sum transpose.

    table: (F, W) differentiable rows; idx: (N,) int32 (caller clamps
    to valid range). transpose: "segsum" | "scatter" (the latter is
    plain ``table[idx]`` semantics end to end).
    """
    return table[idx]


def _fwd(table, idx, transpose):
    return table[idx], (idx, table.shape[0])


def _bwd(transpose, res, ct):
    idx, F = res
    if transpose != "segsum":
        W = ct.shape[1]
        g = jnp.zeros((F, W), ct.dtype).at[idx].add(ct)
        return g, None
    cols = [ct[:, j] for j in range(ct.shape[1])]
    sorted_ops = jax.lax.sort((idx,) + tuple(cols), num_keys=1)
    sid = sorted_ops[0]
    sv = jnp.stack(sorted_ops[1:], axis=1)
    g = jax.ops.segment_sum(
        sv, sid, num_segments=F, indices_are_sorted=True
    )
    return g.astype(ct.dtype), None


gather_rows.defvjp(_fwd, _bwd)
