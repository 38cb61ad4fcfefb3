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

    out = {"p": p, "n": n, "ng": n_geom, "st": st}
    if getattr(scene, "has_normal_maps", False):
        t0 = scene.tangents[f[..., 0]]
        t1 = scene.tangents[f[..., 1]]
        t2 = scene.tangents[f[..., 2]]
        out["tangent"] = normalize(
            w[..., None] * t0 + u[..., None] * t1 + v[..., None] * t2
        )
    return out


def apply_normal_map(scene, sp: dict, mat: jnp.ndarray) -> dict:
    """Perturb the shading normal by a tangent-space normal map
    (reference normal_map_node.osl + the geom:tangent attribute path,
    src/material.cpp:67-84). No-op without normal maps (static)."""
    if not getattr(scene, "has_normal_maps", False):
        return sp
    from phosphorus_mk2_tpu.core.texture import sample_texture
    from phosphorus_mk2_tpu.math.vec import cross as _cross

    tid = scene.normal_tex[mat]
    rgb = sample_texture(scene.tex_atlas, scene.tex_info, tid, sp["st"])
    tsn = rgb * 2.0 - 1.0
    n = sp["n"]
    t = sp.get("tangent")
    if t is None:
        return sp
    b = normalize(_cross(n, t))
    n_new = normalize(
        tsn[..., 0:1] * t + tsn[..., 1:2] * b + tsn[..., 2:3] * n
    )
    out = dict(sp)
    out["n"] = jnp.where((tid >= 0)[..., None], n_new, n)
    return out
