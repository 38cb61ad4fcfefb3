"""Native C++ BVH builder vs the numpy oracle builder."""
import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.accel.bvh_builder import MAX_LEAF, attach_bvh
from phosphorus_mk2_tpu.accel.intersect import intersect_brute
from phosphorus_mk2_tpu.accel.native_bvh import available, build_bvh_native
from phosphorus_mk2_tpu.scenes import cornell_box, multi_bsdf_scene


def test_native_builder_available():
    assert available(), "native builder failed to compile"


def test_native_bvh_valid_and_complete():
    scene = multi_bsdf_scene().build()
    v = np.asarray(scene.vertices)
    f = np.asarray(scene.faces)
    bvh = build_bvh_native(v, f)
    assert bvh is not None
    T = f.shape[0]
    leaves = []
    nc, cc = bvh["node_count"], bvh["node_child"]
    for i in range(nc.shape[0]):
        for k in range(8):
            if nc[i, k] > 0:
                off = cc[i, k]
                assert off % MAX_LEAF == 0  # group alignment
                leaves.extend(bvh["leaf_tris"][off : off + nc[i, k]].tolist())
    assert sorted(leaves) == list(range(T))


def test_native_bvh_traversal_matches_brute():
    from phosphorus_mk2_tpu.accel.block_traverse import intersect_blocks

    data = cornell_box().build()
    v = np.asarray(data.vertices)
    f = np.asarray(data.faces)
    bvh = build_bvh_native(v, f)
    data = attach_bvh(data, bvh)

    key = jax.random.key(3)
    p = jax.random.uniform(key, (200, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.fold_in(key, 1), (200, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    ref = intersect_brute(data, p, d)
    got = intersect_blocks(data, p, d, block=128)
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    hit = np.asarray(ref["hit"])
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=1e-5
    )
