"""Hit -> interaction shading parameters.

Counterpart of the reference's deferred shading kernel and mesh shading
parameters (reference src/kernels/cpu/deferred_shading_kernel.hpp:8-73,
src/mesh.cpp:169-258). There is no material bucketing here: the lobe
tables are evaluated dense/masked over the whole wavefront (SURVEY.md
section 5.7 — the TPU answer to material-sorted shading), so a hit only
needs its interpolated shading parameters and material id.

Barycentric convention (reference src/mesh.cpp:176-197): w = 1-u-v
weights vertex a, u weights b, v weights c.
"""
from __future__ import annotations

import jax.numpy as jnp

from phosphorus_mk2_tpu.math.vec import cross, normalize


def shading_parameters(scene, tri: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Interpolated shading normal, geometric position and uv for hits.

    tri: (N,) triangle ids (clamped to valid for gathering; callers mask
    by the hit flag). Returns dict with p (N,3), n (N,3), st (N,2).
    All outputs are differentiable w.r.t. scene.vertices/normals.
    """
    t = jnp.maximum(tri, 0)
    f = scene.faces[t]
    a = scene.vertices[f[..., 0]]
    b = scene.vertices[f[..., 1]]
    c = scene.vertices[f[..., 2]]
    w = 1.0 - u - v

    p = w[..., None] * a + u[..., None] * b + v[..., None] * c

    n_geom = normalize(cross(b - a, c - a))
    n0 = scene.normals[f[..., 0]]
    n1 = scene.normals[f[..., 1]]
    n2 = scene.normals[f[..., 2]]
    n_smooth = normalize(w[..., None] * n0 + u[..., None] * n1 + v[..., None] * n2)
    smooth = scene.smooth[t]
    n = jnp.where(smooth[..., None], n_smooth, n_geom)

    uv0 = scene.uvs[f[..., 0]]
    uv1 = scene.uvs[f[..., 1]]
    uv2 = scene.uvs[f[..., 2]]
    st = w[..., None] * uv0 + u[..., None] * uv1 + v[..., None] * uv2

    return {"p": p, "n": n, "ng": n_geom, "st": st}
