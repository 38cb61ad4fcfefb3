"""Orthonormal tangent frames and tangent-space (y-up) trigonometry.

TPU-native counterpart of the reference's ``orthogonal_base_t`` /
``invertible_base_t`` (reference src/math/orthogonal_base.hpp) and the
``ts::*`` helpers (reference src/math/vector.hpp:24-72). The reference's
convention is **y-up tangent space**: the shading normal maps to the local
+Y axis. We keep that convention exactly so BSDF math diffs 1:1.

Frames are represented as a tuple of three ``(..., 3)`` world-space basis
vectors ``(a, b, c)`` with ``b == n`` (the normal), matching the member
order of the reference struct. ``to_local`` is the transpose (the frame is
orthonormal).
"""
from __future__ import annotations

import jax.numpy as jnp

from phosphorus_mk2_tpu.math.vec import cross, dot, normalize, safe_sqrt


def make_frame(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build an orthonormal frame from a normal.

    Replicates the reference's branch (reference
    src/math/orthogonal_base.hpp:12): a is derived from component
    differences of n, with a fallback when n.x == n.y == n.z (which would
    produce the zero vector).
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    degenerate = (nx == ny) & (nx == nz)
    ax = nz - ny
    ay = jnp.where(degenerate, nx + nz, nx - nz)
    az = jnp.where(degenerate, -ny - nx, ny - nx)
    a = normalize(jnp.stack([ax, ay, az], axis=-1))
    c = normalize(cross(a, n))
    return a, n, c


def make_frame_with_tangent(
    t: jnp.ndarray, n: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Frame from explicit tangent (reference orthogonal_base_t(tangent, n)).

    NOTE: the reference calls ``invertible_base_t(n, t)`` from
    ``mesh_t::shading_parameters`` (reference src/mesh.cpp:232), i.e. its
    first arg is the *normal* — we mirror the (tangent, normal) signature
    of the underlying constructor; callers must pass arguments in the same
    order the reference effectively uses.
    """
    a = normalize(cross(t, n))
    b = normalize(n)
    return a, b, t


def to_world(frame, v: jnp.ndarray) -> jnp.ndarray:
    a, b, c = frame
    return (
        v[..., 0:1] * a + v[..., 1:2] * b + v[..., 2:3] * c
    )


def to_local(frame, v: jnp.ndarray) -> jnp.ndarray:
    a, b, c = frame
    return jnp.stack([dot(v, a), dot(v, b), dot(v, c)], axis=-1)


# --- tangent-space trig (y-up), reference src/math/vector.hpp:24-72 ---

def ts_in_same_hemisphere(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return (a[..., 1] * b[..., 1]) > 0.0


def cos_theta(v: jnp.ndarray) -> jnp.ndarray:
    return v[..., 1]


def cos2_theta(v: jnp.ndarray) -> jnp.ndarray:
    return v[..., 1] * v[..., 1]


def sin2_theta(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(0.0, 1.0 - cos2_theta(v))


def sin_theta(v: jnp.ndarray) -> jnp.ndarray:
    return safe_sqrt(1.0 - cos2_theta(v))


def tan_theta(v: jnp.ndarray) -> jnp.ndarray:
    return sin_theta(v) / v[..., 1]


def tan2_theta(v: jnp.ndarray) -> jnp.ndarray:
    # Division can produce inf where cos2 == 0 — callers mask it like the
    # reference's isinf checks.
    return sin2_theta(v) / cos2_theta(v)


def cos_phi(v: jnp.ndarray) -> jnp.ndarray:
    s = sin_theta(v)
    return jnp.where(s == 0.0, 1.0, jnp.clip(v[..., 0] / jnp.where(s == 0.0, 1.0, s), -1.0, 1.0))


def sin_phi(v: jnp.ndarray) -> jnp.ndarray:
    s = sin_theta(v)
    return jnp.where(s == 0.0, 0.0, jnp.clip(v[..., 2] / jnp.where(s == 0.0, 1.0, s), -1.0, 1.0))


def cos2_phi(v: jnp.ndarray) -> jnp.ndarray:
    x = cos_phi(v)
    return x * x


def sin2_phi(v: jnp.ndarray) -> jnp.ndarray:
    x = sin_phi(v)
    return x * x
