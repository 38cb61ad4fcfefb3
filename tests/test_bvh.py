"""BVH builder + traversal vs the brute-force oracle."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.accel.bvh_builder import MAX_LEAF, attach_bvh, build_bvh
from phosphorus_mk2_tpu.accel.intersect import intersect_brute, occluded_brute
from phosphorus_mk2_tpu.accel.traverse import intersect_bvh, occluded_bvh
from phosphorus_mk2_tpu.scenes import cornell_box, sphere_in_box


def test_bvh_build_invariants():
    scene = sphere_in_box().build()
    bvh = build_bvh(np.asarray(scene.vertices), np.asarray(scene.faces))
    nb, nc = bvh["node_child"], bvh["node_count"]
    n_nodes = nb.shape[0]
    # every triangle appears exactly once in leaf_tris (minus padding)
    T = scene.faces.shape[0]
    leaves = []
    for i in range(n_nodes):
        for k in range(8):
            if nc[i, k] > 0:
                off = nb[i, k]
                leaves.extend(bvh["leaf_tris"][off : off + nc[i, k]].tolist())
    assert sorted(leaves) == list(range(T))
    assert (nc <= MAX_LEAF).all()
    # inner children reference valid nodes
    inner = (nc == 0) & (nb >= 0)
    assert (nb[inner] < n_nodes).all()
    # child bounds contained in the scene bounds
    vmin = np.asarray(scene.vertices).min(axis=0)
    vmax = np.asarray(scene.vertices).max(axis=0)
    valid = nb >= 0
    assert (bvh["node_bmin"][valid] >= vmin - 1e-4).all()
    assert (bvh["node_bmax"][valid] <= vmax + 1e-4).all()


def _random_rays(n, seed=0, spread=0.9):
    key = jax.random.key(seed)
    p = jax.random.uniform(key, (n, 3), minval=-spread, maxval=spread)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return p, d


def test_bvh_matches_brute_force():
    for build in (sphere_in_box, cornell_box):
        data = attach_bvh(build().build())
        # str hash() is salted per process — use a stable seed or the
        # shared-edge tie rate varies run to run
        p, d = _random_rays(256, seed=sum(build.__name__.encode()) % 1000)
        ref = intersect_brute(data, p, d)
        got = intersect_bvh(data, p, d)
        np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
        hit = np.asarray(ref["hit"])
        np.testing.assert_allclose(
            np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=1e-5
        )
        # same triangle (or same t for shared-edge ties)
        same_tri = np.asarray(got["tri"])[hit] == np.asarray(ref["tri"])[hit]
        assert same_tri.mean() > 0.99


def test_block_traversal_matches_brute_force():
    from phosphorus_mk2_tpu.accel.block_traverse import (
        intersect_blocks,
        occluded_blocks,
    )

    for build in (sphere_in_box, cornell_box):
        data = attach_bvh(build().build())
        p, d = _random_rays(300, seed=11)
        ref = intersect_brute(data, p, d)
        got = intersect_blocks(data, p, d, block=128)
        np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
        hit = np.asarray(ref["hit"])
        np.testing.assert_allclose(
            np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=1e-5
        )
        tmax = jnp.full((300,), 1.2)
        refo = occluded_brute(data, p, d, tmax)
        goto = occluded_blocks(data, p, d, tmax, block=128)
        np.testing.assert_array_equal(np.asarray(goto), np.asarray(refo))


def test_occlusion_tmax_zero_disabled():
    from phosphorus_mk2_tpu.accel.block_traverse import occluded_blocks

    data = attach_bvh(sphere_in_box().build())
    p = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (4, 1))
    tmax = jnp.array([2.0, 0.0, -1.0, 2.0])
    occ = np.asarray(occluded_blocks(data, p, d, tmax))
    assert occ[0] and occ[3]
    assert not occ[1] and not occ[2]


def test_bvh_occlusion_matches_brute_force():
    data = attach_bvh(cornell_box().build())
    p, d = _random_rays(256, seed=7)
    tmax = jnp.full((256,), 1.5)
    ref = occluded_brute(data, p, d, tmax)
    got = occluded_bvh(data, p, d, tmax)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bvh_respects_tmax():
    data = attach_bvh(sphere_in_box().build())
    p = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    r1 = intersect_bvh(data, p, d, jnp.array([0.3]))
    assert not bool(r1["hit"][0])


def test_render_with_bvh_matches_brute():
    from phosphorus_mk2_tpu.core.options import Options
    from phosphorus_mk2_tpu.integrator.path import render_aovs

    scene = sphere_in_box(width=24, height=24)
    data = scene.build()
    data_bvh = attach_bvh(data)
    a = render_aovs(
        data, scene.camera, spp=2, max_depth=2, options=Options(use_bvh=False, samples_per_pass=2)
    )["color"]
    b = render_aovs(
        data_bvh, scene.camera, spp=2, max_depth=2, options=Options(use_bvh=True, samples_per_pass=2)
    )["color"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
