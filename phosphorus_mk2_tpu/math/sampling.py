"""Sampling warps, matching the reference's conventions exactly.

Counterpart of reference src/math/sampling.hpp. The reference uses a
**y-up** hemisphere convention, and has two documented quirks that we
replicate for numerical parity (each flagged below):

* ``uniform_hemisphere`` reports pdf = 1/pi (the true uniform-hemisphere
  pdf is 1/(2*pi)); reference src/math/sampling.hpp:8-22 uses
  UNIFORM_DISC_PDF for the hemisphere warp.
* ``concentric_disc`` computes the centered offset ``2*s - 1`` but then
  warps the *raw* sample values (reference src/math/sampling.hpp:40-57
  computes ``offset`` and never uses it) — so only the positive quadrant
  is produced. Used for thin-lens aperture sampling only.

All functions take uniform samples ``u`` with shape ``(..., 2)`` and
broadcast over batch dims.
"""
from __future__ import annotations

import jax.numpy as jnp

UNIFORM_DISC_PDF = 1.0 / jnp.pi
ONE_MINUS_EPS = float(jnp.float32(1.0) - jnp.finfo(jnp.float32).eps)


def uniform_hemisphere(u: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """y-up uniform hemisphere warp (reference src/math/sampling.hpp:11-22).

    Returns (direction (...,3), pdf (...,)). pdf replicates the
    reference's 1/pi value (quirk, see module docstring).
    """
    u1, u2 = u[..., 0], u[..., 1]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1 * u1))
    phi = 2.0 * jnp.pi * u2
    out = jnp.stack([jnp.cos(phi) * r, u1, jnp.sin(phi) * r], axis=-1)
    pdf = jnp.full(u1.shape, UNIFORM_DISC_PDF, dtype=u.dtype)
    return out, pdf


def cosine_hemisphere(u: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """y-up cosine-weighted hemisphere warp
    (reference src/math/sampling.hpp:24-38). pdf = cos(theta)/pi."""
    u1, u2 = u[..., 0], u[..., 1]
    r = jnp.sqrt(u1)
    theta = 2.0 * jnp.pi * u2
    x = r * jnp.cos(theta)
    z = r * jnp.sin(theta)
    y = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    out = jnp.stack([x, y, z], axis=-1)
    return out, y * UNIFORM_DISC_PDF


def concentric_disc(u: jnp.ndarray) -> jnp.ndarray:
    """Concentric disc warp with the reference's quirk of warping the raw
    sample instead of the centered offset (see module docstring;
    reference src/math/sampling.hpp:41-57)."""
    sx, sy = u[..., 0], u[..., 1]
    pi_o_2 = 2.0 / jnp.pi
    pi_o_4 = 4.0 / jnp.pi
    use_x = jnp.abs(sx) > jnp.abs(sy)
    safe_sx = jnp.where(sx == 0.0, 1.0, sx)
    safe_sy = jnp.where(sy == 0.0, 1.0, sy)
    r = jnp.where(use_x, sx, sy)
    theta = jnp.where(use_x, pi_o_4 * (sy / safe_sx), pi_o_2 - pi_o_4 * (sx / safe_sy))
    return r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


def triangle_sample(u: jnp.ndarray) -> jnp.ndarray:
    """Unit-square -> barycentric sqrt warp
    (reference triangle_t::sample, src/mesh.cpp:318-324).

    Returns (..., 2) barycentrics (u, v) with u + v <= 1.
    """
    x = jnp.sqrt(u[..., 0])
    return jnp.stack([1.0 - x, u[..., 1] * x], axis=-1)


def stratified_2d(key, n: int) -> jnp.ndarray:
    """(n*n, 2) stratified jittered samples over the unit square
    (reference sample::stratified_2d, src/math/sampling.hpp:65-78)."""
    import jax

    step = 1.0 / n
    jitter = jax.random.uniform(key, (n * n, 2)) * step
    ij = jnp.stack(
        jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing="ij"), axis=-1
    ).reshape(n * n, 2)
    return ij * step + jitter


def remap_index_sample(u: jnp.ndarray, count) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Split one uniform sample into (index, remapped sample) — the
    reference's idiom for lobe / light-triangle selection
    (reference src/bsdf.cpp:140-147, src/light.cpp:55-61).

    ``count`` may be a scalar or broadcastable array of positive ints.
    """
    count_f = jnp.asarray(count, dtype=u.dtype)
    idx = jnp.minimum(jnp.floor(u * count_f), count_f - 1.0)
    remapped = jnp.minimum(u * count_f - idx, ONE_MINUS_EPS)
    return idx.astype(jnp.int32), remapped
