"""Ray sorting: correctness of sorted traversal round trip."""
import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.accel.block_traverse import intersect_blocks, occluded_blocks
from phosphorus_mk2_tpu.accel.intersect import intersect_brute, occluded_brute
from phosphorus_mk2_tpu.accel.sort import ray_sort_keys, sorted_trace
from phosphorus_mk2_tpu.scenes import cornell_box


def test_sorted_trace_matches_unsorted():
    data = attach_bvh(cornell_box().build())
    key = jax.random.key(5)
    n = 300
    p = jax.random.uniform(key, (n, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    ref = intersect_brute(data, p, d)
    got = sorted_trace(intersect_blocks, data, p, d, None)
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    hit = np.asarray(ref["hit"])
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=1e-5
    )

    tmax = jnp.full((n,), 1.3)
    refo = occluded_brute(data, p, d, tmax)
    goto = sorted_trace(occluded_blocks, data, p, d, tmax)
    np.testing.assert_array_equal(np.asarray(goto), np.asarray(refo))


def test_sort_keys_group_octants():
    p = jnp.zeros((4, 3))
    d = jnp.array(
        [[1.0, 1.0, 1.0], [-1.0, 1.0, 1.0], [1.0, 1.0, 1.0], [-1.0, -1.0, -1.0]]
    )
    keys = np.asarray(ray_sort_keys(p, d, jnp.zeros(3), jnp.ones(3)))
    assert keys[0] == keys[2]
    assert keys[0] != keys[1] != keys[3]
