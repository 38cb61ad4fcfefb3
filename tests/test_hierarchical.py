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
