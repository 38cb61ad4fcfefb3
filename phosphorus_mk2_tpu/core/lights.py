"""Light sampling for next-event estimation.

Counterpart of the reference light system (reference src/light.cpp) and
sampler light-sample generation (reference src/sampling.cpp:160-180):

* a light is picked uniformly among all lights and the pdf divided by the
  light count (sampling.cpp:133 / :168);
* area lights pick a triangle uniformly — the precomputed area CDF exists
  but is unused in the reference (light.cpp:50-55) and we match the
  uniform pick — then warp to barycentrics by the sqrt warp and report
  pdf = 1/total_area (light.cpp:55-68);
* infinite lights sample a y-up uniform hemisphere at radius 1000 with
  the reference's pdf = 1/pi quirk (light.cpp:106-112).

Deviation (documented): the reference's NEE treats an infinite-light
sample like a surface sample with garbage shading data from mesh 0 and a
1e6 distance-squared pdf factor, making its contribution ~1e-6 of a
typical radiance value (spt.hpp:245-254). We return weight 0 for those
samples instead; environment light still arrives via path misses exactly
like the reference.
"""
from __future__ import annotations

import jax.numpy as jnp

from phosphorus_mk2_tpu.core.scene import LIGHT_AREA, LIGHT_INFINITE
from phosphorus_mk2_tpu.core.shading import shading_parameters
from phosphorus_mk2_tpu.math.sampling import (
    remap_index_sample,
    triangle_sample,
    uniform_hemisphere,
)


def light_meta_table(scene) -> jnp.ndarray:
    """(NL, 5) packed light metadata rows (type, mat, offset, count,
    area-as-int32-bits) — one gather instead of five in the NEE hot loop
    (kernel-launch count dominates small wavefronts on the axon
    platform)."""
    return jnp.stack(
        [
            scene.light_type,
            scene.light_mat,
            scene.light_offset,
            scene.light_count,
            scene.light_area.view(jnp.int32),
        ],
        axis=-1,
    )


def light_tri_table(scene, attr) -> jnp.ndarray:
    """(LT, attr_w + 3 [+1]) consolidated LIGHT-TRIANGLE rows: the attr
    row of each light triangle plus its material's emission (and its
    emission-texture id as float bits when textured). Indexed by
    (light_offset + tri pick) directly, this folds the light_tris
    indirection, the attribute gather and the emission gather of the
    NEE loop into ONE row-gather. Light-triangle counts are tiny even in
    huge scenes, so this is always on (unlike the per-tri hit rows)."""
    lt = scene.light_tris
    lmat = scene.tri_mat[lt]
    cols = [attr[lt], scene.emission[lmat]]
    if getattr(scene, "has_textures", False):
        cols.append(scene.emission_tex[lmat][:, None].astype(jnp.float32))
    return jnp.concatenate(cols, axis=1)


def sample_lights(
    scene,
    u_pick: jnp.ndarray,
    u_tri: jnp.ndarray,
    u_uv: jnp.ndarray,
    attr=None,
    meta=None,
    lt_table=None,
    attr_w: int | None = None,
):
    """Sample one light point per wavefront entry.

    u_pick, u_tri, u_uv: (N,) uniforms (u_tri is reused/remapped for the
    triangle pick + barycentric x, as the reference does with uv.x).
    attr: optional core.shading.triangle_attribute_table; meta: optional
    light_meta_table — both collapse per-attribute gathers in hot loops.

    Returns dict:
      p (N,3) sampled point, n (N,3) light normal, pdf (N,) area pdf
      already divided by the light count, mat (N,) emitter material id,
      valid (N,) False for the zero-contribution cases (no lights /
      infinite-light sample).
    """
    nl = scene.num_lights
    light_idx, _ = remap_index_sample(u_pick, nl)

    if meta is None:
        ltype = scene.light_type[light_idx]
        lmat = scene.light_mat[light_idx]
        loffset = scene.light_offset[light_idx]
        lcount_raw = scene.light_count[light_idx]
        larea = scene.light_area[light_idx]
    else:
        if meta.shape[0] <= 4:
            # a handful of lights: broadcast-select instead of a gather —
            # a gather is a whole kernel launch on the axon platform,
            # a <=4-way select fuses into the surrounding elementwise work
            sel = light_idx[:, None] == jnp.arange(
                meta.shape[0], dtype=light_idx.dtype
            )[None, :]
            row = jnp.sum(jnp.where(sel[:, :, None], meta[None], 0), axis=1)
        else:
            row = meta[light_idx]  # (N, 5)
        ltype, lmat, loffset = row[..., 0], row[..., 1], row[..., 2]
        lcount_raw = row[..., 3]
        larea = row[..., 4].view(jnp.float32)
    lcount = jnp.maximum(lcount_raw, 1)

    # area light: uniform triangle pick with sample reuse
    tri_sel, u_rem = remap_index_sample(u_tri, lcount)
    bary = triangle_sample(jnp.stack([u_rem, u_uv], axis=-1))
    bu, bv = bary[..., 0], bary[..., 1]

    e_area = None
    etex_area = None
    if lt_table is not None:
        # consolidated light-tri row: attrs + emission in ONE gather,
        # indexed without the light_tris indirection
        row = lt_table[loffset + tri_sel]
        a, b, c = row[..., 0:3], row[..., 3:6], row[..., 6:9]
        aw = attr_w if attr_w is not None else row.shape[-1] - 3
        e_area = row[..., aw : aw + 3]
        if getattr(scene, "has_textures", False):
            etex_area = row[..., aw + 3].astype(jnp.int32)
        sp = shading_parameters(scene, loffset, bu, bv, row=row)
    else:
        gtri = scene.light_tris[loffset + tri_sel]
        if attr is None:
            f = scene.faces[gtri]
            a = scene.vertices[f[..., 0]]
            b = scene.vertices[f[..., 1]]
            c = scene.vertices[f[..., 2]]
        else:
            arow = attr[gtri]
            a, b, c = arow[..., 0:3], arow[..., 3:6], arow[..., 6:9]
        # ...the light-side shading normal is computed with the *hit*
        # convention on the same (u, v) — replicating the reference's
        # convention mismatch (spt.hpp:245 via mesh.cpp:176-197).
        sp = shading_parameters(scene, gtri, bu, bv, attr=attr)
    # reference convention: barycentric_to_point = u*a + v*b + (1-u-v)*c
    # (src/mesh.cpp:314-316)
    p_area = (
        bu[..., None] * a + bv[..., None] * b + (1.0 - bu - bv)[..., None] * c
    )
    n_area = sp["n"]
    # guard 1e-12, NOT 1e-20: the vjp of 1/max(x, eps) is -1/eps^2 on
    # clamped lanes and (1e-20)^2 underflows f32 to 0 -> -inf, which
    # turns the (zero) cotangent into NaN and poisons VERTEX grads
    # through the light-area sums on every scene with an environment
    # light (BMW config-5; measured 888 NaN vertex rows). 1e-12^2
    # stays representable, so the clamped-lane jacobian is finite.
    pdf_area = 1.0 / jnp.maximum(larea, 1e-12)

    # infinite light (zero-contribution in NEE, see module docstring)
    hemi, pdf_inf = uniform_hemisphere(
        jnp.stack([u_tri, u_uv], axis=-1)
    )
    p_inf = hemi * 1000.0

    is_area = ltype == LIGHT_AREA
    is_inf = ltype == LIGHT_INFINITE

    p = jnp.where(is_area[..., None], p_area, p_inf)
    n = jnp.where(is_area[..., None], n_area, 0.0)
    pdf = jnp.where(is_area, pdf_area, pdf_inf) / nl
    valid = is_area & (lcount_raw > 0)
    st = jnp.where(is_area[..., None], sp["st"], 0.0)

    out = {"p": p, "n": n, "pdf": pdf, "mat": lmat, "valid": valid, "st": st}
    if e_area is not None:
        # emission pre-gathered in the light-tri row: callers skip their
        # emission_at() gather (texture modulation still applies at st)
        out["e"] = jnp.where(is_area[..., None], e_area, 0.0)
        out["etex"] = (
            jnp.where(is_area, etex_area, -1) if etex_area is not None else None
        )
    return out
