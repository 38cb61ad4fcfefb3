"""Pallas MT kernel vs the jnp oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phosphorus_mk2_tpu.accel.intersect import intersect_brute
from phosphorus_mk2_tpu.accel.pallas_mt import intersect_pallas_brute
from phosphorus_mk2_tpu.scenes import cornell_box


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_mt_matches_oracle(seed):
    data = cornell_box().build()
    key = jax.random.key(seed)
    n = 300
    p = jax.random.uniform(key, (n, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    ref = intersect_brute(data, p, d)
    got = intersect_pallas_brute(data, p, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    hit = np.asarray(ref["hit"])
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got["tri"])[hit], np.asarray(ref["tri"])[hit]
    )


@pytest.mark.parametrize("seed", [0, 5])
def test_pallas_anyhit_matches_oracle(seed):
    """The dedicated any-hit kernel (no closest tracking, tile early-out)
    agrees with occluded_brute for mixed tmax bounds."""
    from phosphorus_mk2_tpu.accel.intersect import occluded_brute
    from phosphorus_mk2_tpu.accel.pallas_mt import occluded_pallas_brute

    data = cornell_box().build()
    key = jax.random.key(seed)
    n = 300
    p = jax.random.uniform(key, (n, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # spread of bounds: some before the wall, some past it, some zero
    # (the integrator masks invalid shadow rays with tmax=0)
    tmax = jax.random.uniform(
        jax.random.fold_in(key, 2), (n,), minval=0.0, maxval=3.0
    )
    tmax = tmax.at[::7].set(0.0)

    ref = occluded_brute(data, p, d, tmax)
    got = occluded_pallas_brute(data, p, d, tmax, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
