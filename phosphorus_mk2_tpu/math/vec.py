"""Vector helpers over batched ``(..., 3)`` jnp arrays.

Replaces the reference's 8-wide SIMD vector packets
(reference ``src/math/simd/vector.hpp``) with shape-polymorphic jnp ops.
All functions broadcast over leading batch dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp

# Ray-origin epsilon push, matching the reference's offset()
# (reference src/math/vector.hpp:14-21 and src/math/simd/vector.hpp:224).
RAY_EPSILON = 1e-4


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the last axis, keepdims=False."""
    return jnp.sum(a * b, axis=-1)


def dot_keep(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product, keeping the last axis for broadcasting."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Safe normalize: returns a / |a| with a guard against |a| = 0."""
    n2 = jnp.maximum(dot_keep(a, a), eps)
    return a * jax_rsqrt(n2)


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    import jax.lax as lax

    return lax.rsqrt(x)


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt clamped at 0 with a NaN-free backward pass.

    ``sqrt(maximum(x, 0))`` produces inf/NaN cotangents at x <= 0 even
    when the result is masked by ``where`` downstream (the classic JAX
    double-where pitfall); this variant has gradient 0 there instead.
    """
    y = jnp.sqrt(jnp.where(x > 0.0, x, 1.0))
    return jnp.where(x > 0.0, y, 0.0)


def safe_pow(x: jnp.ndarray, e) -> jnp.ndarray:
    """x**e for x >= 0 with zero gradient at x <= 0 (avoids e*0^(e-1)
    NaNs in the backward pass for fractional exponents)."""
    y = jnp.power(jnp.where(x > 0.0, x, 1.0), e)
    return jnp.where(x > 0.0, y, 0.0)


def offset(p: jnp.ndarray, n: jnp.ndarray, invert=None) -> jnp.ndarray:
    """Push a point off the surface along the normal to avoid self-hits.

    ``invert`` may be a boolean array (True pushes against the normal),
    mirroring the reference's ``offset(p, n, invert)``.
    """
    if invert is None:
        return p + n * RAY_EPSILON
    sign = jnp.where(invert, -RAY_EPSILON, RAY_EPSILON)
    return p + n * sign[..., None]


def in_same_hemisphere(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """World-space hemisphere test (reference src/math/vector.hpp:10)."""
    return dot(a, b) > 0.0


def luminance(c: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luma as used by the reference's Russian roulette
    (reference src/utils/color.hpp:13)."""
    return c[..., 0] * 0.212671 + c[..., 1] * 0.715160 + c[..., 2] * 0.072169


def is_black(c: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    return jnp.all(c <= eps, axis=-1)
