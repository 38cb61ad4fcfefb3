"""Fused wave-MT kernel == _mt_rows (ww=1) in interpret mode."""
import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.accel import cluster_traverse as ct
from phosphorus_mk2_tpu.accel.pallas_wave import TILE, wave_mt_pallas


def test_wave_mt_matches_mt_rows():
    rng = np.random.default_rng(11)
    K, C, ch = 20, 8, TILE
    rows_tbl = jnp.asarray(rng.random((K, 9, C)) * 2 - 1, jnp.float32)
    rows3 = rows_tbl.reshape(K, 1, 9 * C)
    c1 = jnp.asarray(rng.integers(0, K, size=(ch,)), jnp.int32)
    live = jnp.asarray(rng.random(ch) > 0.3)
    p = jnp.asarray(rng.random((ch, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((ch, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    best = (
        jnp.asarray(rng.random(ch) * 3, jnp.float32),
        jnp.asarray(rng.integers(-1, K, size=(ch,)), jnp.int32),
        jnp.asarray(rng.integers(0, C, size=(ch,)), jnp.int32),
    )

    ids = jnp.where(live, c1, 0)
    rows = rows_tbl[ids][:, None]  # (ch, 1, 9, C)
    ref = ct._mt_rows(p, d, rows, best, live, cand_cids=c1[:, None])

    got = wave_mt_pallas(rows3, ids, live, p, d, *best, interpret=True)
    # winners exact; t allclose only — the kernel and _mt_rows are
    # separately compiled programs and FMA contraction differs in the
    # dot chains (same reason every traversal oracle compares t with
    # rtol). With this seed no winner sits within an ulp of a flip.
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(got[2]))
    np.testing.assert_allclose(
        np.asarray(ref[0]), np.asarray(got[0]), rtol=1e-5
    )
    # sanity: the wave actually found hits and kept some old records
    assert int((np.asarray(got[1]) != np.asarray(best[1])).sum()) > 0


def test_wave_mt_anyhit_style_mask():
    """any_hit is handled by the caller's live mask (live &= cid < 0);
    the kernel must respect a fully-dead chunk (no updates at all)."""
    rng = np.random.default_rng(12)
    K, C, ch = 6, 4, TILE
    rows_tbl = jnp.asarray(rng.random((K, 9, C)), jnp.float32)
    rows3 = rows_tbl.reshape(K, 1, 9 * C)
    ids = jnp.zeros((ch,), jnp.int32)
    live = jnp.zeros((ch,), bool)
    p = jnp.asarray(rng.random((ch, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((ch, 3)), jnp.float32)
    best = (jnp.full((ch,), 5.0), jnp.full((ch,), -1, jnp.int32),
            jnp.zeros((ch,), jnp.int32))
    t, cid, lane = wave_mt_pallas(rows3, ids, live, p, d, *best,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(t), np.asarray(best[0]))
    np.testing.assert_array_equal(np.asarray(cid), np.asarray(best[1]))
