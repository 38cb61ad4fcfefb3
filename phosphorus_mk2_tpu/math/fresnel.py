"""Dielectric Fresnel (reference src/math/fresnel.hpp:6-29), vectorized."""
from __future__ import annotations

import jax.numpy as jnp

from phosphorus_mk2_tpu.math.vec import safe_sqrt


def dielectric(cosi: jnp.ndarray, eta) -> jnp.ndarray:
    """Fresnel reflectance for a dielectric interface.

    Matches the reference exactly: eta == 0 returns 1; when the cosine is
    negative the relative IOR is inverted; total internal reflection
    returns 1.
    """
    eta = jnp.asarray(eta, dtype=jnp.result_type(cosi, jnp.float32))
    eta_eff = jnp.where(cosi < 0.0, 1.0 / jnp.where(eta == 0.0, 1.0, eta), eta)
    c = jnp.abs(cosi)
    g2 = eta_eff * eta_eff - 1.0 + c * c
    g = safe_sqrt(g2)
    denom_a = jnp.where(g + c == 0.0, 1.0, g + c)
    A = (g - c) / denom_a
    denom_b = c * (g - c) + 1.0
    denom_b = jnp.where(denom_b == 0.0, 1.0, denom_b)
    B = (c * (g + c) - 1.0) / denom_b
    f = 0.5 * A * A * (1.0 + B * B)
    f = jnp.where(g2 > 0.0, f, 1.0)
    return jnp.where(eta == 0.0, 1.0, f)
