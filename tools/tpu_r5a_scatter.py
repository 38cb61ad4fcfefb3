"""Round-5 probe A: what does the gradient transpose (scatter-add)
actually cost on the axon TPU, and which alternative wins?

The BMW fwd+bwd north star is backward-bound (VERDICT r4 Weak #1): the
vjp of every per-bounce ``table[idx]`` row-gather is a scatter-add into
the (F, W) table, measured ~33 ms per 131k-row transpose in round 4
(sort+segment_sum == scatter, both slow). Decompose before redesigning:

  expA  raw scatter-add cost vs rows N, table rows F, width W
        (is it per-ROW bound or per-BYTE bound? does F matter?)
  expB  batched: ONE scatter of B*N rows vs B scatters of N rows
        (does the verdict's one-accumulated-scatter restructure pay?)
  expC  sort + segment_sum(indices_are_sorted=True)
  expD  sort + cumsum-diff + UNIQUE-index scatter (at most N touched
        rows, unique_indices=True lets XLA drop collision handling)
  expE  one-hot MXU matmul transpose for SMALL tables (materials,
        M<=64): d_table = onehot(idx)^T @ ct
  expF  the composed d_vertices chain: grad through the in-jit
        triangle_attribute_table build + gather (the real BMW shape)
  expG  jnp.zeros.at[idx].add vs lax.scatter_add dimension_numbers
        direct (same thing, sanity)

All synthetic, no pallas, safe to run in one process. Times are
best-of-3 after warmup. Prints one JSON line per measurement.
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best, out


def log(**kw):
    print(json.dumps(kw), flush=True)


def make_idx(rng, n, f, dist="clustered"):
    """dist: "random" (r4 expG's distribution), "clustered" (coherent
    camera-ray hit ids: blocks of nearby tris), "sorted"."""
    if dist == "random":
        return jnp.asarray(rng.integers(0, f, size=(n,)).astype(np.int32))
    base = rng.integers(0, f, size=(max(1, n // 64) + 1,))
    idx = np.repeat(base, 64)[:n]
    jitter = rng.integers(0, 32, size=(n,))
    idx = np.minimum(idx + jitter, f - 1).astype(np.int32)
    if dist == "sorted":
        idx = np.sort(idx)
    return jnp.asarray(idx)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    N = 1 << 16          # BMW bench wavefront
    F = 887_000          # BMW tri count
    W = 25               # attr row width
    idx = make_idx(rng, N, F, "random")
    ct = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32))

    # --- expA: raw scatter-add, sweep N / F / W
    def scat(idx, ct, F):
        return jnp.zeros((F, ct.shape[1]), ct.dtype).at[idx].add(ct)

    for (n_, f_, w_, dist) in [
        (1 << 16, 887_000, 25, "clustered"),
        (1 << 16, 887_000, 25, "random"),
        (1 << 16, 887_000, 25, "sorted"),
        (1 << 17, 887_000, 3, "random"),   # EXACT r4 expG shape
        (1 << 17, 887_000, 3, "clustered"),
        (1 << 17, 887_000, 25, "random"),
        (1 << 18, 887_000, 25, "random"),
        (1 << 16, 887_000, 100, "random"),
        (1 << 16, 8_192, 25, "random"),
        (887_000, 444_000, 9, "random"),  # the d_vertices shape
    ]:
        i_ = make_idx(rng, n_, f_, dist)
        c_ = jnp.asarray(rng.standard_normal((n_, w_)).astype(np.float32))
        f = jax.jit(functools.partial(scat, F=f_))
        t, _ = timed(f, i_, c_)
        log(exp="A_scatter", n=n_, F=f_, W=w_, dist=dist,
            ms=round(t * 1e3, 3),
            gbps=round(n_ * w_ * 4 / t / 1e9, 2),
            ns_per_row=round(t / n_ * 1e9, 1))

    # --- expB: B separate scatters vs one batched scatter of B*N rows
    B = 6  # spp2 x depth3
    idxs = [make_idx(rng, N, F, "random") for _ in range(B)]
    cts = [jnp.asarray(rng.standard_normal((N, W)).astype(np.float32))
           for _ in range(B)]

    def scat_sep(idxs, cts):
        g = jnp.zeros((F, W), jnp.float32)
        for i, c in zip(idxs, cts):
            g = g.at[i].add(c)
        return g

    def scat_one(idxs, cts):
        i = jnp.concatenate(idxs)
        c = jnp.concatenate(cts)
        return jnp.zeros((F, W), jnp.float32).at[i].add(c)

    t, _ = timed(jax.jit(scat_sep), idxs, cts)
    log(exp="B_sep6", ms=round(t * 1e3, 3))
    t, _ = timed(jax.jit(scat_one), idxs, cts)
    log(exp="B_one6", ms=round(t * 1e3, 3))

    # --- expC: sort + segment_sum
    def segsum(idx, ct):
        cols = [ct[:, j] for j in range(ct.shape[1])]
        so = jax.lax.sort((idx,) + tuple(cols), num_keys=1)
        sv = jnp.stack(so[1:], axis=1)
        return jax.ops.segment_sum(sv, so[0], num_segments=F,
                                   indices_are_sorted=True)

    t, _ = timed(jax.jit(segsum), idx, ct)
    log(exp="C_segsum", ms=round(t * 1e3, 3))

    # sort cost alone (is the 26-operand sort the problem?)
    def sort_only(idx, ct):
        cols = [ct[:, j] for j in range(ct.shape[1])]
        so = jax.lax.sort((idx,) + tuple(cols), num_keys=1)
        return so[0], jnp.stack(so[1:], axis=1)

    t, _ = timed(jax.jit(sort_only), idx, ct)
    log(exp="C_sort_only", ms=round(t * 1e3, 3))

    # argsort + row-gather variant (one key sort + ONE row gather)
    def sort_gather(idx, ct):
        order = jnp.argsort(idx)
        return idx[order], ct[order]

    t, _ = timed(jax.jit(sort_gather), idx, ct)
    log(exp="C_argsort_rowgather", ms=round(t * 1e3, 3))

    def segsum2(idx, ct):
        order = jnp.argsort(idx)
        sid = idx[order]
        sv = ct[order]
        return jax.ops.segment_sum(sv, sid, num_segments=F,
                                   indices_are_sorted=True)

    t, _ = timed(jax.jit(segsum2), idx, ct)
    log(exp="C_segsum_rowgather", ms=round(t * 1e3, 3))

    # --- expD: sort + cumsum-diff + unique scatter
    def uniq_scatter(idx, ct):
        order = jnp.argsort(idx)
        sid = idx[order]
        sv = ct[order]
        csum = jnp.cumsum(sv, axis=0)
        is_end = jnp.concatenate([sid[1:] != sid[:-1],
                                  jnp.ones((1,), bool)])
        # segment totals = cumsum at segment end - cumsum at prev end
        ends = csum
        prev = jnp.concatenate([jnp.zeros((1, W)), csum[:-1]], axis=0)
        # prev end per row: use where on is_end positions after shifting
        # simpler: total at end rows = csum[end] - csum[prev_end]
        # build via segment boundaries: scatter only end rows
        seg_start_csum = jnp.where(
            jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])[:, None],
            prev, jnp.zeros_like(prev))
        # propagate each segment's start-csum forward with a max-scan on
        # packed (pos) — cheaper: recompute via gather of cumulative
        # "last end position" — skip the fancy form, use segment_sum of
        # ones to find counts? Keep it simple: totals = csum[end] -
        # csum[start-1]; start-1 positions via cummax of end markers.
        pos = jnp.arange(sid.shape[0])
        start_flag = jnp.concatenate([jnp.ones((1,), bool),
                                      sid[1:] != sid[:-1]])
        start_pos = jnp.where(start_flag, pos, 0)
        start_pos = jax.lax.cummax(start_pos)
        prev_csum = jnp.where((start_pos > 0)[:, None],
                              csum[jnp.maximum(start_pos - 1, 0)], 0.0)
        totals = csum - prev_csum
        tgt = jnp.where(is_end, sid, F)  # drop non-end rows
        return jnp.zeros((F, W), jnp.float32).at[tgt].add(
            jnp.where(is_end[:, None], totals, 0.0), mode="drop",
            unique_indices=True)

    t, out_d = timed(jax.jit(uniq_scatter), idx, ct)
    ref = jax.jit(functools.partial(scat, F=F))(idx, ct)
    err = float(jnp.abs(out_d - ref).max())
    log(exp="D_uniq_scatter", ms=round(t * 1e3, 3), max_err=err)

    # --- expE: one-hot matmul transpose for small tables
    for M in (16, 64, 256):
        mi = jnp.asarray(rng.integers(0, M, size=(N,)).astype(np.int32))
        cw = jnp.asarray(rng.standard_normal((N, 12)).astype(np.float32))

        def onehot_t(mi, cw, M=M):
            oh = (mi[:, None] == jnp.arange(M, dtype=jnp.int32)[None, :])
            return jax.lax.dot(oh.astype(jnp.float32).T, cw)

        def scat_small(mi, cw, M=M):
            return jnp.zeros((M, 12), jnp.float32).at[mi].add(cw)

        t, _ = timed(jax.jit(onehot_t), mi, cw)
        log(exp="E_onehot", M=M, ms=round(t * 1e3, 3))
        t, _ = timed(jax.jit(scat_small), mi, cw)
        log(exp="E_scatter_small", M=M, ms=round(t * 1e3, 3))

    # --- expF: composed d_vertices chain at BMW shape
    V = 444_000
    faces = jnp.asarray(rng.integers(0, V, size=(F, 3)).astype(np.int32))
    verts = jnp.asarray(rng.standard_normal((V, 3)).astype(np.float32))

    def attr_like(verts):
        cols = [verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]]
        return jnp.concatenate(cols, axis=1)  # (F, 9)

    def loss_f(verts, idx, ct9):
        return jnp.sum(attr_like(verts)[idx] * ct9)

    ct9 = jnp.asarray(rng.standard_normal((N, 9)).astype(np.float32))
    gf = jax.jit(jax.grad(loss_f))
    t, _ = timed(gf, verts, idx, ct9)
    log(exp="F_dverts_chain", ms=round(t * 1e3, 3),
        note="grad through table build + gather, BMW shapes")

    # grad of the gather only (table as the leaf)
    tbl = attr_like(verts)

    def loss_g(tbl, idx, ct9):
        return jnp.sum(tbl[idx] * ct9)

    gg = jax.jit(jax.grad(loss_g))
    t, _ = timed(gg, tbl, idx, ct9)
    log(exp="F_dtable_only", ms=round(t * 1e3, 3))

    # B=6 bounce gathers through ONE table build (the real structure)
    def loss_h(verts, idxs, cts9):
        a = attr_like(verts)
        return sum(jnp.sum(a[i] * c) for i, c in zip(idxs, cts9))

    idxs6 = [make_idx(rng, N, F, "random") for _ in range(6)]
    cts9_6 = [jnp.asarray(rng.standard_normal((N, 9)).astype(np.float32))
              for _ in range(6)]
    gh = jax.jit(jax.grad(loss_h))
    t, _ = timed(gh, verts, idxs6, cts9_6)
    log(exp="F_dverts_6bounce", ms=round(t * 1e3, 3))

    log(exp="done")


if __name__ == "__main__":
    main()
