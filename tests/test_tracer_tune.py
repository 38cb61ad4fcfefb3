"""Cluster-tracer launch-count tunables are semantics-free.

Options.tracer_tune exposes dense_waves / chunk / dense_chunk /
expand_batch / slab_bf16 (accel/cluster_traverse._trace) — all pure
scheduling levers. Every combination must return hits/t identical to
the untuned tracer (t exactly: slab_bf16 only widens the outward-
rounded AABB tests, the MT stage stays f32-exact), and occlusion
queries must agree. Also pins the wiring: make_tracer must actually
thread the dict into the cluster tracer.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phosphorus_mk2_tpu.accel import cluster_traverse as ct
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.accel.intersect import intersect_brute
from phosphorus_mk2_tpu.integrator.path import make_tracer
from phosphorus_mk2_tpu.scenes import multi_bsdf_scene

TUNES = [
    {"dense_waves": 2},
    {"dense_waves": 4, "chunk": 1024},
    {"dense_chunk": 2048},
    {"slab_bf16": True},
    {"dense_waves": 2, "expand_batch": 16, "slab_bf16": True},
    {"recompact": 4},
    {"recompact": 1, "chunk": 256},
    {"recompact": 8, "dense_waves": 2},
    # dense_k=1 engages the hierarchical supercluster front table on
    # this small scene (the declarative replacement for the DENSE_K
    # monkey-patch, round-3 verdict item 7)
    {"dense_k": 1},
    {"dense_k": 1, "recompact": 4},
    # wave_dedup routes each chunk's distinct cluster rows to rays
    # (round-4 byte-headroom lever); "onehot" with tiny dedup_d also
    # exercises the overflow -> direct-gather cond branch, and
    # chunk=300 a non-power-of-two slot mask
    {"wave_dedup": "gather"},
    {"wave_dedup": "gather", "chunk": 300, "recompact": 4},
    {"wave_dedup": "onehot"},
    {"wave_dedup": "onehot", "dedup_d": 2},
    {"wave_dedup": "onehot", "dedup_d": 64, "chunk": 128, "recompact": 4},
    {"dense_k": 1, "wave_dedup": "gather"},
    {"dense_k": 1, "wave_dedup": "onehot", "dedup_d": 16},
    # fused wave kernel (interpret mode on CPU); small chunk keeps the
    # interpreted per-row DMA loop affordable
]


@pytest.fixture(scope="module")
def rig():
    data = attach_bvh(multi_bsdf_scene().build())
    key = jax.random.key(9)
    n = 400
    p = jax.random.uniform(key, (n, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    base = ct.intersect_clusters(data, p, d)
    tmax = jnp.full((n,), 1.3)
    base_occ = ct.occluded_clusters(data, p, d, tmax)
    return data, p, d, tmax, base, base_occ


@pytest.mark.parametrize("tune", TUNES, ids=lambda t: "+".join(t))
def test_tune_matches_untuned(rig, tune):
    data, p, d, tmax, base, base_occ = rig
    got = ct.intersect_clusters(data, p, d, **tune)
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(base["hit"]))
    np.testing.assert_array_equal(np.asarray(got["tri"]), np.asarray(base["tri"]))
    hit = np.asarray(base["hit"])
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(base["t"])[hit], rtol=1e-6
    )
    occ = ct.occluded_clusters(data, p, d, tmax, **tune)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(base_occ))


def test_expand_batch_hierarchical_vs_brute(rig, monkeypatch):
    """expand_batch only acts on the supercluster (hierarchical) path;
    force it (DENSE_K=1, like test_hierarchical) and oracle against the
    brute tracer with the scan fully collapsed to one row-gather."""
    data, p, d, tmax, _, _ = rig
    monkeypatch.setattr(ct, "DENSE_K", 1)
    ref = intersect_brute(data, p, d)
    for tune in ({"expand_batch": 16}, {"expand_batch": 3, "slab_bf16": True},
                 {"recompact": 4}, {"recompact": 2, "expand_batch": 16}):
        got = ct.intersect_clusters(data, p, d, **tune)
        np.testing.assert_array_equal(
            np.asarray(got["hit"]), np.asarray(ref["hit"])
        )
        hit = np.asarray(ref["hit"])
        np.testing.assert_allclose(
            np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=1e-5
        )


def test_make_tracer_threads_tune(rig):
    data, p, d, tmax, base, _ = rig
    tune = {"dense_waves": 2, "slab_bf16": True}
    closest, occluded = make_tracer(data, use_bvh=True, tracer_tune=tune)
    assert isinstance(closest, functools.partial)
    assert closest.keywords == tune and occluded.keywords == tune
    got = closest(data, p, d)
    np.testing.assert_array_equal(np.asarray(got["tri"]), np.asarray(base["tri"]))


def test_make_tracer_shadow_override(rig):
    """The "shadow" sub-dict retunes ONLY the any-hit trace; occlusion
    results are identical (fallback covers the shallower front)."""
    data, p, d, tmax, base, base_occ = rig
    tune = {"chunk": 1024, "shadow": {"front_k": 2, "recompact": 0}}
    closest, occluded = make_tracer(data, use_bvh=True, tracer_tune=tune)
    assert closest.keywords == {"chunk": 1024}
    assert occluded.keywords == {"chunk": 1024, "front_k": 2,
                                 "recompact": 0}
    got = closest(data, p, d)
    np.testing.assert_array_equal(
        np.asarray(got["tri"]), np.asarray(base["tri"])
    )
    occ = occluded(data, p, d, tmax)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(base_occ))
