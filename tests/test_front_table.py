"""Round-3 front-table variants vs the brute oracle.

Covers the treelet cluster layouts (plain + nested hierarchy) and the
new front-table tunables (front_levels=3 over the ssc tables, sc_topk
selection primitives, front_k) — all semantics-free: every combination
must return exactly the brute-force closest hit.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phosphorus_mk2_tpu.accel import cluster_traverse as ct
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.accel.intersect import intersect_brute, occluded_brute
from phosphorus_mk2_tpu.scenes import multi_bsdf_scene, terrain_scene


def _rays(n=400, seed=7):
    key = jax.random.key(seed)
    p = jax.random.uniform(key, (n, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    return p, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def _check(data, tune, n=400):
    p, d = _rays(n)
    ref = intersect_brute(data, p, d)
    got = ct.intersect_clusters(data, p, d, **tune)
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    hit = np.asarray(ref["hit"])
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=1e-5
    )
    tmax = jnp.full((p.shape[0],), 1.3)
    np.testing.assert_array_equal(
        np.asarray(ct.occluded_clusters(data, p, d, tmax, **tune)),
        np.asarray(occluded_brute(data, p, d, tmax)),
    )


@pytest.mark.parametrize("mode", ["flat", "treelet", "treelet_nested"])
def test_cluster_modes_match_brute(monkeypatch, mode):
    monkeypatch.setattr(ct, "DENSE_K", 1)  # force the hierarchical path
    data = attach_bvh(multi_bsdf_scene().build(), cluster_mode=mode)
    _check(data, {})


@pytest.mark.parametrize(
    "tune",
    [
        {"front_levels": 3},
        {"front_levels": 3, "sc_topk": "sort"},
        {"sc_topk": "extract"},
        {"sc_topk": "sort"},
        {"sc_topk": "pallas"},
        {"front_levels": 3, "front_k": 16},
        {"front_k": 16},
    ],
)
def test_front_variants_match_brute(monkeypatch, tune):
    monkeypatch.setattr(ct, "DENSE_K", 1)
    data = attach_bvh(multi_bsdf_scene().build(), cluster_mode="treelet")
    _check(data, tune)


def test_front_variants_terrain(monkeypatch):
    """Bigger scene (real multi-supercluster tables) through level 3."""
    monkeypatch.setattr(ct, "DENSE_K", 1)
    s = terrain_scene(grid=96, width=16, height=16)
    data = attach_bvh(s.build(), cluster_mode="treelet_nested")
    n = 200
    p = jnp.tile(jnp.array([[0.0, 1.2, 4.5]]), (n, 1))
    key = jax.random.key(5)
    tgt = jax.random.uniform(key, (n, 3), minval=-2, maxval=2) * jnp.array(
        [1.0, 0.3, 1.0]
    )
    d = tgt - p
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ref = intersect_brute(data, p, d)
    for tune in ({"front_levels": 3}, {"front_levels": 2}):
        got = ct.intersect_clusters(data, p, d, **tune)
        np.testing.assert_array_equal(
            np.asarray(got["hit"]), np.asarray(ref["hit"])
        )
        hit = np.asarray(ref["hit"])
        np.testing.assert_allclose(
            np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=1e-4
        )


def test_treelet_partition_is_complete():
    """Every valid triangle appears in exactly one treelet cluster."""
    for mode in ("treelet", "treelet_nested"):
        data = attach_bvh(multi_bsdf_scene().build(), cluster_mode=mode)
        ids = np.asarray(data.bvh["cluster_id"])
        e0 = np.asarray(data.bvh["cluster_e0"])
        live = np.abs(e0).sum(axis=-1) > 0  # zeroed = padding slot
        seen = ids[live]
        n_tris = int(np.asarray(data.faces).shape[0])
        # degenerate (zero-area) real triangles also have e0=0; only
        # require coverage of non-degenerate ones and no duplicates
        uniq, cnt = np.unique(seen, return_counts=True)
        assert cnt.max() == 1, "duplicate triangle in clusters"
        verts = np.asarray(data.vertices)
        faces = np.asarray(data.faces)
        area2 = np.linalg.norm(
            np.cross(
                verts[faces[:, 1]] - verts[faces[:, 0]],
                verts[faces[:, 2]] - verts[faces[:, 0]],
            ),
            axis=-1,
        )
        needed = np.arange(n_tris)[area2 > 0]
        assert np.isin(needed, uniq).all(), "triangle missing from clusters"


def test_rows_bf16_near_exact(monkeypatch):
    """bf16 triangle rows halve wave-loop gather bytes at selection-only
    precision: ~all rays agree with the exact tracer; disagreements are
    confined to silhouette/edge rays (bf16 geometry quantization)."""
    monkeypatch.setattr(ct, "DENSE_K", 1)
    data = attach_bvh(multi_bsdf_scene().build(), cluster_mode="treelet")
    p, d = _rays(2000, seed=11)
    ref = ct.intersect_clusters(data, p, d)
    got = ct.intersect_clusters(data, p, d, rows_bf16=True)
    hit_r = np.asarray(ref["hit"])
    hit_g = np.asarray(got["hit"])
    agree = hit_r == hit_g
    assert agree.mean() > 0.99, f"only {agree.mean():.3f} hit agreement"
    both = agree & hit_r
    same_tri = np.asarray(got["tri"])[both] == np.asarray(ref["tri"])[both]
    assert same_tri.mean() > 0.98
    t_g = np.asarray(got["t"])[both][same_tri]
    t_r = np.asarray(ref["t"])[both][same_tri]
    rel = np.abs(t_g - t_r) / np.maximum(np.abs(t_r), 1e-6)
    # grazing hits are t-sensitive under quantized geometry; the
    # integrator re-intersects the winner exactly, so only selection
    # quality matters: bulk within 2%, median essentially exact
    assert (rel < 2e-2).mean() > 0.97
    assert np.median(rel) < 1e-3
    # any-hit: same tolerance
    tmax = jnp.full((p.shape[0],), 1.3)
    occ_r = np.asarray(ct.occluded_clusters(data, p, d, tmax))
    occ_g = np.asarray(ct.occluded_clusters(data, p, d, tmax, rows_bf16=True))
    assert (occ_r == occ_g).mean() > 0.99
