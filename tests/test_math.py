"""Math substrate unit tests: warps, frames, fresnel."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phosphorus_mk2_tpu.math import frame as tsf
from phosphorus_mk2_tpu.math.fresnel import dielectric
from phosphorus_mk2_tpu.math.sampling import (
    cosine_hemisphere,
    remap_index_sample,
    triangle_sample,
    uniform_hemisphere,
)
from phosphorus_mk2_tpu.math.vec import dot, luminance, normalize


def rand_u(n, d=2, seed=0):
    return jax.random.uniform(jax.random.key(seed), (n, d))


def test_cosine_hemisphere_props():
    u = rand_u(4096)
    d, pdf = cosine_hemisphere(u)
    # unit length, y >= 0, pdf = y/pi
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert (d[:, 1] >= 0).all()
    np.testing.assert_allclose(pdf, d[:, 1] / np.pi, atol=1e-6)
    # cosine-weighted: mean y should be 2/3
    assert abs(float(d[:, 1].mean()) - 2.0 / 3.0) < 0.02


def test_uniform_hemisphere_props():
    u = rand_u(2048)
    d, pdf = uniform_hemisphere(u)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert (d[:, 1] >= 0).all()
    # reference quirk: pdf = 1/pi
    np.testing.assert_allclose(pdf, 1.0 / np.pi)


def test_triangle_sample_in_simplex():
    u = rand_u(1024)
    b = triangle_sample(u)
    assert (b >= 0).all()
    assert (b.sum(-1) <= 1.0 + 1e-6).all()


def test_remap_index_sample():
    u = jnp.array([0.0, 0.49, 0.5, 0.99, 0.999999])
    idx, rem = remap_index_sample(u, 2)
    np.testing.assert_array_equal(idx, [0, 0, 1, 1, 1])
    assert (rem >= 0).all() and (rem < 1.0).all()


def test_frame_orthonormal():
    n = normalize(jax.random.normal(jax.random.key(1), (512, 3)))
    f = tsf.make_frame(n)
    a, b, c = f
    for v in (a, b, c):
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(dot(a, b), 0.0, atol=1e-5)
    np.testing.assert_allclose(dot(a, c), 0.0, atol=1e-5)
    np.testing.assert_allclose(dot(b, c), 0.0, atol=1e-5)
    # round trip local<->world
    v = normalize(jax.random.normal(jax.random.key(2), (512, 3)))
    lv = tsf.to_local(f, v)
    wv = tsf.to_world(f, lv)
    np.testing.assert_allclose(wv, v, atol=1e-5)
    # normal maps to +y
    ln = tsf.to_local(f, n)
    np.testing.assert_allclose(ln[:, 1], 1.0, atol=1e-5)


def test_frame_degenerate_normal():
    n = normalize(jnp.array([[1.0, 1.0, 1.0], [0.0, 1.0, 0.0], [0.0, -1.0, 0.0]]))
    a, b, c = tsf.make_frame(n)
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=-1), 1.0, atol=1e-5)


def test_fresnel_matches_scalar_reference():
    # scalar port of reference src/math/fresnel.hpp for cross-check
    def ref(cosi, eta):
        if eta == 0:
            return 1.0
        if cosi < 0.0:
            eta = 1.0 / eta
        c = abs(cosi)
        g = eta * eta - 1.0 + c * c
        if g > 0:
            g = np.sqrt(g)
            A = (g - c) / (g + c)
            B = (c * (g + c) - 1.0) / (c * (g - c) + 1.0)
            return 0.5 * A * A * (1 + B * B)
        return 1.0

    rng = np.random.default_rng(0)
    cosi = rng.uniform(-1, 1, 64).astype(np.float32)
    for eta in [0.0, 0.5, 1.5, 1.0 / 1.5]:
        got = np.asarray(dielectric(jnp.asarray(cosi), eta))
        want = np.array([ref(c, eta) for c in cosi], np.float32)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_luminance():
    np.testing.assert_allclose(
        float(luminance(jnp.array([1.0, 1.0, 1.0]))), 1.0, atol=1e-5
    )
