"""Fused slab+extract Pallas kernel vs the XLA selection path
(interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.accel import cluster_traverse as ct
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.accel.intersect import T_MAX
from phosphorus_mk2_tpu.accel.pallas_front import slab_extract_pallas
from phosphorus_mk2_tpu.scenes import multi_bsdf_scene


def _xla_reference(bounds6, p, d, t_limit, jj):
    bmin, bmax = bounds6[:, :3], bounds6[:, 3:]
    hit, tn = ct._slab_all(p, d, bmin, bmax)
    m = jnp.where(hit & (tn < t_limit[:, None]), tn, T_MAX)
    # pad columns to the kernel's 128 multiple so packed ids match
    K2 = m.shape[1]
    K2p = -(-K2 // 128) * 128
    m = jnp.pad(m, ((0, 0), (0, K2p - K2)), constant_values=float(T_MAX))
    return ct._select_topk(m, jj, mode="extract")


def test_slab_extract_matches_xla():
    data = attach_bvh(multi_bsdf_scene().build(), cluster_mode="treelet")
    bvh = data.bvh
    bounds6 = jnp.concatenate([bvh["sc_bmin"], bvh["sc_bmax"]], axis=1)

    key = jax.random.key(2)
    n = 700  # non-multiple of the ray block: exercises padding
    p = jax.random.uniform(key, (n, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_limit = jnp.full((n,), T_MAX)

    jj = min(16, bounds6.shape[0])
    t_ref, id_ref = _xla_reference(bounds6, p, d, t_limit, jj)
    t_got, id_got = slab_extract_pallas(bounds6, p, d, t_limit, jj=jj,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(id_got), np.asarray(id_ref))
    np.testing.assert_array_equal(np.asarray(t_got), np.asarray(t_ref))


def test_slab_extract_respects_t_limit():
    data = attach_bvh(multi_bsdf_scene().build(), cluster_mode="treelet")
    bvh = data.bvh
    bounds6 = jnp.concatenate([bvh["sc_bmin"], bvh["sc_bmax"]], axis=1)
    n = 128
    p = jnp.zeros((n, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    jj = min(8, bounds6.shape[0])
    # zero t_limit: nothing pending anywhere
    t, ids = slab_extract_pallas(bounds6, p, d, jnp.zeros((n,)), jj=jj,
                                 interpret=True)
    assert (np.asarray(t) == float(T_MAX)).all()
