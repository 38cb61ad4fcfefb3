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

from phosphorus_mk2_tpu.math.vec import cross, normalize, safe_sqrt


def triangle_attribute_table(scene) -> jnp.ndarray:
    """(F, 25[+9]) per-triangle attribute rows: a b c | n0 n1 n2 |
    uv0 uv1 uv2 | smooth [| t0 t1 t2].

    Built IN-JIT from the indexed mesh arrays (so gradients flow to
    scene.vertices/normals and XLA hoists the build out of the bounce
    scan: ~11 per-attribute wavefront gathers per call collapse into ONE
    wide row-gather per call — on the axon platform every gather is a
    kernel launch, and launches dominate small-wavefront renders; see
    tools/tpu_stagesplit.py). The same trick as the reference's packed
    moeller_trumbore_t leaves (src/accel/triangle.hpp:25: triangles
    pre-swizzled so the hot loop reads contiguous rows).
    """
    f = scene.faces
    cols = [
        scene.vertices[f[:, 0]],
        scene.vertices[f[:, 1]],
        scene.vertices[f[:, 2]],
        scene.normals[f[:, 0]],
        scene.normals[f[:, 1]],
        scene.normals[f[:, 2]],
        scene.uvs[f[:, 0]],
        scene.uvs[f[:, 1]],
        scene.uvs[f[:, 2]],
        scene.smooth[:, None].astype(jnp.float32),
    ]
    if getattr(scene, "has_normal_maps", False):
        cols += [
            scene.tangents[f[:, 0]],
            scene.tangents[f[:, 1]],
            scene.tangents[f[:, 2]],
        ]
    return jnp.concatenate(cols, axis=1)


def shading_parameters(
    scene, tri: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, attr=None, row=None
):
    """Interpolated shading normal, geometric position and uv for hits.

    tri: (N,) triangle ids (clamped to valid for gathering; callers mask
    by the hit flag). attr: optional triangle_attribute_table(scene) —
    pass it in hot loops to turn ~11 gathers into 1. row: optional
    pre-gathered attribute rows (N, >=attr width) — zero gathers here
    (the integrator's consolidated hit row shares one gather across
    reintersect/shading/material lookup).
    Returns dict with p (N,3), n (N,3), st (N,2).
    All outputs are differentiable w.r.t. scene.vertices/normals.
    """
    t = jnp.maximum(tri, 0)
    if row is not None:
        attr = None
    elif attr is not None:
        row = attr[t]  # (N, D) — the one gather
    if row is None:
        f = scene.faces[t]
        a = scene.vertices[f[..., 0]]
        b = scene.vertices[f[..., 1]]
        c = scene.vertices[f[..., 2]]
        n0 = scene.normals[f[..., 0]]
        n1 = scene.normals[f[..., 1]]
        n2 = scene.normals[f[..., 2]]
        uv0 = scene.uvs[f[..., 0]]
        uv1 = scene.uvs[f[..., 1]]
        uv2 = scene.uvs[f[..., 2]]
        smooth = scene.smooth[t]
        tans = (
            (scene.tangents[f[..., 0]], scene.tangents[f[..., 1]], scene.tangents[f[..., 2]])
            if getattr(scene, "has_normal_maps", False)
            else None
        )
    else:
        a, b, c = row[..., 0:3], row[..., 3:6], row[..., 6:9]
        n0, n1, n2 = row[..., 9:12], row[..., 12:15], row[..., 15:18]
        uv0, uv1, uv2 = row[..., 18:20], row[..., 20:22], row[..., 22:24]
        smooth = row[..., 24] != 0.0
        tans = (
            (row[..., 25:28], row[..., 28:31], row[..., 31:34])
            if getattr(scene, "has_normal_maps", False)
            else None
        )
    w = 1.0 - u - v

    p = w[..., None] * a + u[..., None] * b + v[..., None] * c

    n_geom = normalize(cross(b - a, c - a))
    n_smooth = normalize(w[..., None] * n0 + u[..., None] * n1 + v[..., None] * n2)
    n = jnp.where(smooth[..., None], n_smooth, n_geom)

    st = w[..., None] * uv0 + u[..., None] * uv1 + v[..., None] * uv2

    # uv-per-world-unit scale of the hit triangle: sqrt of the uv-area /
    # world-area ratio — converts a world-space ray-cone footprint into a
    # uv-space diameter for mip-level selection (core/texture.py). Dense
    # math over values already gathered; no extra lookups.
    e0w = b - a
    e1w = c - a
    area_w = jnp.linalg.norm(cross(e0w, e1w), axis=-1)
    e0t = uv1 - uv0
    e1t = uv2 - uv0
    area_t = jnp.abs(e0t[..., 0] * e1t[..., 1] - e0t[..., 1] * e1t[..., 0])
    # safe_sqrt: tris with zero UV area (unmapped/seam tris — 12 camera
    # hits on the BMW asset) otherwise poison VERTEX grads with
    # sqrt(0)-backward inf*0 (see math/vec.safe_sqrt)
    uv_scale = safe_sqrt(area_t / jnp.maximum(area_w, 1e-20))

    out = {"p": p, "n": n, "ng": n_geom, "st": st, "uv_scale": uv_scale,
           # triangle edge pairs (world / uv) for the anisotropic
           # footprint's world->uv direction mapping (integrator
           # _footprint); slices of already-loaded values, zero gathers
           "edges": (e0w, e1w, e0t, e1t)}
    if tans is not None:
        t0, t1, t2 = tans
        out["tangent"] = normalize(
            w[..., None] * t0 + u[..., None] * t1 + v[..., None] * t2
        )
    return out


def apply_normal_map(scene, sp: dict, mat: jnp.ndarray, tid=None,
                     footprint=None) -> dict:
    """Perturb the shading normal by a tangent-space normal map
    (reference normal_map_node.osl + the geom:tangent attribute path,
    src/material.cpp:67-84). No-op without normal maps (static).
    tid: optional pre-gathered normal-texture ids (consolidated hit row).
    footprint: optional (N,) uv diameter for mip filtering."""
    if not getattr(scene, "has_normal_maps", False):
        return sp
    from phosphorus_mk2_tpu.core.texture import sample_texture
    from phosphorus_mk2_tpu.math.vec import cross as _cross

    if tid is None:
        tid = scene.normal_tex[mat]
    rgb = sample_texture(scene.tex_atlas, scene.tex_info, tid, sp["st"],
                         footprint=footprint)
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
