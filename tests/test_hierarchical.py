"""Hierarchical (supercluster) cluster tracer vs the brute oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.accel import cluster_traverse as ct
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.accel.intersect import intersect_brute, occluded_brute
from phosphorus_mk2_tpu.scenes import multi_bsdf_scene, terrain_scene


def test_forced_hierarchical_matches_brute(monkeypatch):
    monkeypatch.setattr(ct, "DENSE_K", 1)  # force supercluster path
    data = attach_bvh(multi_bsdf_scene().build())
    key = jax.random.key(4)
    n = 500
    p = jax.random.uniform(key, (n, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ref = intersect_brute(data, p, d)
    got = ct.intersect_clusters(data, p, d)
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    hit = np.asarray(ref["hit"])
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=1e-5
    )
    tmax = jnp.full((n,), 1.3)
    np.testing.assert_array_equal(
        np.asarray(ct.occluded_clusters(data, p, d, tmax)),
        np.asarray(occluded_brute(data, p, d, tmax)),
    )


def test_terrain_scene_builds():
    s = terrain_scene(grid=48, width=16, height=16)
    data = s.build()
    assert data.faces.shape[0] > 4000
    assert data.num_lights == 1  # sky


def test_terrain_hierarchical_trace():
    s = terrain_scene(grid=96, width=16, height=16)
    data = s.build()
    data = attach_bvh(data)
    # camera-style rays
    n = 200
    key = jax.random.key(5)
    p = jnp.tile(jnp.array([[0.0, 1.2, 4.5]]), (n, 1))
    tgt = jax.random.uniform(key, (n, 3), minval=-2, maxval=2) * jnp.array(
        [1.0, 0.3, 1.0]
    )
    d = tgt - p
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ref = intersect_brute(data, p, d)
    got = ct.intersect_clusters(data, p, d)
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    hit = np.asarray(ref["hit"])
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=1e-4
    )


def test_front_table_beyond_32767_clusters():
    """The packed-column front table has no cluster-count ceiling: the
    sort key carries the candidate column (< jj*SC), not the global
    cluster id, so ids >= 2^15 reconstruct exactly (old scheme's cliff,
    round-1 verdict weak #5). Oracle: independent numpy re-derivation."""
    K2 = 3000  # superclusters -> K = 48000 clusters, past the old cliff
    SC = 16
    rng = np.random.default_rng(0)
    # spatially COMPACT superclusters (like SAH-ordered clusters): each
    # holds 16 boxes near its own center, so top-jj culling is selective
    sc_center = rng.uniform(5, 400, (K2, 1, 3)).astype(np.float32)
    centers = sc_center + rng.uniform(-4, 4, (K2, SC, 3)).astype(np.float32)
    half = rng.uniform(0.5, 2.0, (K2, SC, 1)).astype(np.float32)
    mbmin = centers - half
    mbmax = centers + half
    sc_bmin = mbmin.min(axis=1)
    sc_bmax = mbmax.max(axis=1)
    bvh = {
        "sc_bmin": jnp.asarray(sc_bmin), "sc_bmax": jnp.asarray(sc_bmax),
        "sc_member_bmin": jnp.asarray(mbmin),
        "sc_member_bmax": jnp.asarray(mbmax),
    }
    n = 64
    p = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    # aim each ray at a random box so every ray has live candidates
    tgt = centers[rng.integers(0, K2, n), rng.integers(0, SC, n)]
    d = (tgt - p).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    from phosphorus_mk2_tpu.accel.intersect import T_MAX

    t_lim = jnp.full((n,), T_MAX)
    kk = 64
    ttbl, ctbl, hor = ct._front_table_hierarchical(
        jnp.asarray(p), jnp.asarray(d), bvh, t_lim, kk
    )
    ttbl, ctbl = np.asarray(ttbl), np.asarray(ctbl)

    def slab(p1, d1, bmin, bmax):
        inv = 1.0 / np.where(d1 == 0.0, 1e-30, d1)
        t0 = (bmin - p1) * inv
        t1 = (bmax - p1) * inv
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        return (tn <= tf) & (tf >= 0.0), np.maximum(tn, 0.0).astype(np.float32)

    jj = min(ct.SC_FRONT, K2)
    ncand = jj * SC
    nbits = (ncand - 1).bit_length()
    key_mask = np.uint32(0xFFFFFFFF ^ ((1 << nbits) - 1))
    saw_big_id = False
    for r in range(n):
        h, tn = slab(p[r], d[r], sc_bmin, sc_bmax)
        sc_m = np.where(h, tn, T_MAX)
        sel = np.argsort(sc_m, kind="stable")[:jj]
        cand = np.full(ncand, np.float32(T_MAX))
        cid_of_col = np.zeros(ncand, np.int64)
        for j, sc in enumerate(sel):
            cid_of_col[j * SC:(j + 1) * SC] = sc * SC + np.arange(SC)
            if sc_m[sc] >= T_MAX:
                continue
            h2, tn2 = slab(p[r], d[r], mbmin[sc], mbmax[sc])
            cand[j * SC:(j + 1) * SC] = np.where(h2, tn2, np.float32(T_MAX))
        packed = (cand.view(np.uint32) & key_mask) | np.arange(
            ncand, dtype=np.uint32
        )
        packed = np.sort(packed)[:kk]
        keys = packed & key_mask
        live = keys < (np.float32(T_MAX).view(np.uint32) & key_mask)
        want_t = keys.view(np.float32)
        want_c = cid_of_col[packed & np.uint32((1 << nbits) - 1)]
        np.testing.assert_array_equal(ttbl[r] < T_MAX, live)
        np.testing.assert_array_equal(ttbl[r][live], want_t[live])
        np.testing.assert_array_equal(ctbl[r][live], want_c[live])
        saw_big_id |= bool((want_c[live] > 32767).any())
    assert saw_big_id  # the point of the test


def test_trace_tunables_invariant(monkeypatch):
    """dense_waves / chunk / expand_batch are launch-count levers, not
    semantics: every combination returns the identical candidate-set
    min-reduction (same hits/t as default config and the brute oracle)."""
    monkeypatch.setattr(ct, "DENSE_K", 1)  # force supercluster path
    data = attach_bvh(multi_bsdf_scene().build())
    key = jax.random.key(9)
    n = 300
    p = jax.random.uniform(key, (n, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ref = intersect_brute(data, p, d)
    hit = np.asarray(ref["hit"])
    tmax = jnp.full((n,), 1.1)
    occ_ref = np.asarray(occluded_brute(data, p, d, tmax))
    for tune in (
        {"dense_waves": 4},
        {"dense_waves": 8, "dense_chunk": 128},
        {"expand_batch": 64},          # >= jj: single-shot expansion
        {"expand_batch": 3},           # non-dividing batch: padded scan
        {"dense_waves": 4, "expand_batch": 64, "chunk": 64},
        {"slab_bf16": True},           # grown boxes: extra candidates only
        {"slab_bf16": True, "dense_waves": 4, "expand_batch": 64},
    ):
        got = ct.intersect_clusters(data, p, d, **tune)
        np.testing.assert_array_equal(
            np.asarray(got["hit"]), hit, err_msg=str(tune)
        )
        np.testing.assert_allclose(
            np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit],
            rtol=1e-5, err_msg=str(tune),
        )
        np.testing.assert_array_equal(
            np.asarray(ct.occluded_clusters(data, p, d, tmax, **tune)),
            occ_ref, err_msg=str(tune),
        )


def test_dense_path_slab_bf16():
    """bf16 slab tables on the DENSE (small-K) front table: same hits."""
    data = attach_bvh(multi_bsdf_scene().build())
    key = jax.random.key(11)
    n = 300
    p = jax.random.uniform(key, (n, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ref = intersect_brute(data, p, d)
    got = ct.intersect_clusters(data, p, d, slab_bf16=True)
    hit = np.asarray(ref["hit"])
    np.testing.assert_array_equal(np.asarray(got["hit"]), hit)
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=1e-5
    )
