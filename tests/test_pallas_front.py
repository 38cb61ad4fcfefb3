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


def test_front_all_matches_xla_hierarchical():
    """Full-front fused kernel (slab + extract + member expand + final
    select) vs the XLA hierarchical path, exact equality of the final
    (ttbl, ctbl, horizon)."""
    from phosphorus_mk2_tpu.accel.pallas_front import front_all_pallas

    data = attach_bvh(multi_bsdf_scene().build(), cluster_mode="treelet")
    bvh = data.bvh
    K = bvh["cluster_bmin"].shape[0]
    kk = min(ct.MAX_FRONT, K)
    jj = min(ct.SC_FRONT, bvh["sc_bmin"].shape[0])

    key = jax.random.key(5)
    n = 700
    p = jax.random.uniform(key, (n, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_limit = jnp.full((n,), T_MAX)

    ttbl_ref, ctbl_ref, hor_ref = ct._front_table_hierarchical(
        p, d, bvh, t_limit, kk, levels=2, sc_topk="extract")
    ttbl_got, ctbl_got, hor_got = ct._front_table_hierarchical(
        p, d, bvh, t_limit, kk, levels=2, sc_topk="pallas_full")

    np.testing.assert_array_equal(np.asarray(ttbl_got), np.asarray(ttbl_ref))
    # cluster ids must agree wherever the entry is live (dead T_MAX
    # entries carry arbitrary ids on both paths)
    live = np.asarray(ttbl_ref) < float(T_MAX)
    np.testing.assert_array_equal(
        np.asarray(ctbl_got)[live], np.asarray(ctbl_ref)[live])
    # horizon: the kernel packs parent keys with bit_length(K2p-1)
    # mantissa-truncation bits (K2 padded to 128) vs the XLA path's
    # bit_length(K2-1) — truncation only LOWERS tn, so the kernel
    # horizon is equal or CONSERVATIVE (lower -> more exact-fallback
    # coverage, never less); assert that invariant plus tightness
    hg, hr = np.asarray(hor_got), np.asarray(hor_ref)
    assert (hg <= hr).all()
    fin = hr < float(T_MAX)
    np.testing.assert_allclose(hg[fin], hr[fin], rtol=1e-3)
    assert (hg[~fin] == hr[~fin]).all()


def test_front_all_full_trace_matches_oracle():
    """End-to-end: the cluster tracer with sc_topk=pallas_full returns
    exactly the untuned tracer's hits (dense_k=1 engages the
    hierarchical path on this small scene)."""
    data = attach_bvh(multi_bsdf_scene().build(), cluster_mode="treelet")
    key = jax.random.key(9)
    n = 400
    p = jax.random.uniform(key, (n, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    base = ct.intersect_clusters(data, p, d, dense_k=1)
    got = ct.intersect_clusters(data, p, d, dense_k=1,
                                sc_topk="pallas_full")
    np.testing.assert_array_equal(np.asarray(got["hit"]),
                                  np.asarray(base["hit"]))
    np.testing.assert_array_equal(np.asarray(got["tri"]),
                                  np.asarray(base["tri"]))
    hit = np.asarray(base["hit"])
    np.testing.assert_allclose(np.asarray(got["t"])[hit],
                               np.asarray(base["t"])[hit], rtol=1e-6)
