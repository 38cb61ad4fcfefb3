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


class Purpose:
    """Stream identifiers within one (pixel, sample, bounce) cell."""

    FILM = 0          # pixel-film jitter
    LENS = 1          # thin-lens aperture sample
    LIGHT_PICK = 2    # which light
    LIGHT_TRI = 3     # which triangle of an area light (+ remap)
    LIGHT_UV = 4      # barycentric / hemisphere sample on the light
    BSDF_LOBE = 5     # lobe selection (+ remap)
    BSDF_UV = 6       # lobe direction sample
    RR = 7            # Russian roulette


def pixel_keys(seed_key: jax.Array, pixel_ids: jnp.ndarray) -> jax.Array:
    """Fold a flat pixel id array into per-pixel keys. pixel_ids: (N,)."""
    return jax.vmap(lambda p: jax.random.fold_in(seed_key, p))(pixel_ids)


def cell_key(seed_key: jax.Array, sample: jnp.ndarray, bounce, purpose: int) -> jax.Array:
    """Key for a (sample, bounce, purpose) cell; combine with pixel ids via
    uniform(..., shape=(N, ...)) using fold_in per pixel id at call sites
    that need per-pixel streams."""
    k = jax.random.fold_in(seed_key, jnp.asarray(sample, jnp.uint32))
    k = jax.random.fold_in(k, jnp.asarray(bounce, jnp.uint32))
    return jax.random.fold_in(k, jnp.uint32(purpose))


def uniform(
    seed_key: jax.Array,
    n: int,
    sample,
    bounce,
    purpose: int,
    dims: int = 1,
) -> jnp.ndarray:
    """(n,) or (n, dims) uniforms for all pixels of a wavefront at a given
    (sample index, bounce, purpose).

    One threefry call for the whole wavefront: the pixel axis is the array
    axis, so sharding the wavefront shards the RNG work while keeping the
    per-pixel values independent of the sharding layout.
    """
    k = cell_key(seed_key, sample, bounce, purpose)
    shape = (n,) if dims == 1 else (n, dims)
    return jax.random.uniform(k, shape, dtype=jnp.float32)
