"""Counter-based RNG for the wavefront integrator.

TPU-native replacement for the reference's stateful mt19937 sampler
(reference src/sampling.cpp:44-75): every random number is a pure function
of (seed, pixel, sample index, bounce, purpose), so results are
deterministic, order-independent and identical under any sharding of the
pixel axis — the multi-host determinism requirement of SURVEY.md section 5.

Purposes enumerate every consumption site of randomness in one bounce so
streams never collide.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# PCG4D — the hot-loop generator
# ---------------------------------------------------------------------------
# One threefry sweep per purpose (the first implementation) dominated the
# TPU profile (~4 ms per purpose-sweep at 64k pixels, 8+ sweeps/bounce).
# PCG4D (Jarzynski & Olano, "Hash Functions for GPU Rendering", JCGT 2020
# — public algorithm) yields 4 independent uniforms from ~20 uint32 VPU
# ops, keyed purely on (pixel, sample+seed, bounce, purpose): counter-
# based, order-independent, identical under any wavefront sharding.

_PCG_MUL = jnp.uint32(1664525)
_PCG_ADD = jnp.uint32(1013904223)


def pcg4d(a, b, c, d):
    """4-way PCG hash. Inputs broadcastable uint32 arrays; returns four
    uint32 arrays of the broadcast shape."""
    x = a * _PCG_MUL + _PCG_ADD
    y = b * _PCG_MUL + _PCG_ADD
    z = c * _PCG_MUL + _PCG_ADD
    w = d * _PCG_MUL + _PCG_ADD
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def _to_float(bits):
    """uint32 -> [0, 1) float32 (reference to_float idiom,
    src/sampling.cpp:57-60)."""
    mantissa = (bits & jnp.uint32(0x007FFFFF)) | jnp.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(mantissa, jnp.float32) - 1.0


def pixel_uniforms4(seed, pix, sample, bounce, purpose):
    """Four independent uniforms per pixel from one PCG4D evaluation.

    seed: uint32 scalar; pix: (N,) uint32 pixel hash; sample/bounce may
    be traced scalars. Returns (N, 4) float32 in [0, 1).
    """
    s = jnp.asarray(sample, jnp.uint32) + jnp.asarray(seed, jnp.uint32) * jnp.uint32(
        0x9E3779B9
    )
    b = jnp.asarray(bounce, jnp.uint32) * jnp.uint32(0x85EBCA6B) + jnp.uint32(purpose)
    x, y, z, w = pcg4d(pix, s, b, jnp.uint32(0x6C078965) + jnp.uint32(purpose))
    return jnp.stack(
        [_to_float(x), _to_float(y), _to_float(z), _to_float(w)], axis=-1
    )
