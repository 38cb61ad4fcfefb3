"""BSDF lobe container: eval and one-sample-mixture sampling.

Counterpart of the reference's ``bsdf_t`` (reference src/bsdf.cpp:113-248):
``f()`` sums hemisphere-matching lobes times the incident cosine;
``sample()`` picks one lobe uniformly (with sample reuse), then folds in
the values/pdfs of flag-compatible other lobes and averages the pdf
("MIS-lite" one-sample mixture).

Here the container is a struct-of-arrays over the wavefront: per-hit lobe
arrays gathered from the material tables by material id.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from phosphorus_mk2_tpu.bsdf.lobes import (
    eval_lobe,
    eval_lobe_sorted,
    sample_lobe,
    sample_lobe_sorted,
)
from phosphorus_mk2_tpu.core.material import (
    FLAG_REFLECT,
    FLAG_SPECULAR,
    FLAG_TRANSMIT,
    MAX_LOBES,
)
from phosphorus_mk2_tpu.math.sampling import remap_index_sample
from phosphorus_mk2_tpu.math.vec import dot


def material_tables(scene):
    """Packed per-material rows: one float row (weights|params) and one
    int row (types|flags|n_lobes) per material.

    Built in-jit (hoisted out of the bounce scan; differentiable w.r.t.
    lobe weights/params) so gather_lobes needs 2 row-gathers instead of
    5 — per-gather kernel-launch overhead dominates small wavefronts on
    the axon platform (tools/tpu_stagesplit.py).
    """
    m, L = scene.lobe_type.shape
    fl = jnp.concatenate(
        [
            scene.lobe_weight.reshape(m, L * 3),
            scene.lobe_param.reshape(m, -1),
        ],
        axis=1,
    )
    il = jnp.concatenate(
        [
            scene.lobe_type,
            scene.lobe_flags,
            scene.n_lobes[:, None],
        ],
        axis=1,
    )
    return fl, il


def hit_row_tables(scene, attr):
    """Per-TRIANGLE consolidated hit rows: fold the material float/int
    tables through tri_mat so the whole hit side (attributes + emission
    + lobes + texture ids + NEE pdf) reads with TWO row-gathers instead
    of ~7 — on the axon TPU platform every gather is a kernel launch and
    launches dominate small wavefronts (tools/tpu_r2_probe.py).

    Width is attr_w + 4 + Lu*(3+P) floats (Lu = max lobes actually used),
    so callers gate on scene size; the light side keeps the narrow attr
    table (a wide row for 3 values measured 13% slower there in round 1).

    Returns (hit_f, hit_i, layout). The integer columns ride in the SAME
    float table as exact small-int float values (all < 2^24: types,
    flags, ids), so the whole hit side is ONE gather; hit_i is that
    trailing block pre-sliced for callers that want it.
      hit_f: (F, attr_w | emission 3 | weights Lu*3 | params Lu*P |
                 nee_pdf 1 | mat 1 | types Lu | flags Lu | n_lobes 1
                 [| emission_tex 1 | lobe_tex Lu] [| normal_tex 1])
    """
    m, L = scene.lobe_type.shape
    lu = getattr(scene, "max_lobes_used", 0) or L
    p = scene.lobe_param.shape[2]
    tm = scene.tri_mat
    mat_f = jnp.concatenate(
        [
            scene.emission,
            scene.lobe_weight[:, :lu].reshape(m, lu * 3),
            scene.lobe_param[:, :lu].reshape(m, lu * p),
        ],
        axis=1,
    )
    nee = scene.tri_light_pdf
    if nee is None:
        nee = jnp.zeros((tm.shape[0],), jnp.float32)

    icols = [
        tm[:, None],
        scene.lobe_type[:, :lu][tm],
        scene.lobe_flags[:, :lu][tm],
        scene.n_lobes[tm][:, None],
    ]
    has_tex = getattr(scene, "has_textures", False)
    has_nm = getattr(scene, "has_normal_maps", False)
    if has_tex:
        icols += [scene.emission_tex[tm][:, None], scene.lobe_tex[:, :lu][tm]]
    if has_nm:
        icols += [scene.normal_tex[tm][:, None]]
    hit_i = jnp.concatenate(icols, axis=1).astype(jnp.float32)
    hit_f = jnp.concatenate([attr, mat_f[tm], nee[:, None], hit_i], axis=1)
    layout = {
        "attr_w": attr.shape[1],
        "lu": lu,
        "p": p,
        "has_tex": has_tex,
        "has_nm": has_nm,
        "int_off": attr.shape[1] + 3 + lu * (3 + p) + 1,
    }
    return hit_f, hit_i, layout


def gather_hit_rows(hit_f, idx, layout, trainable=None):
    """``hit_f[idx]`` with gradient flow restricted to the trainable
    field set (None = fully differentiable — today's behavior).

    The vjp of a fat-row gather is a FULL-width (N, W) -> (F, W)
    scatter even when only a 3-column block (say emission) carries
    cotangents — scatters cannot be narrowed column-wise after the
    fact, and every non-trainable column also drags its upstream
    table-build chain into the backward graph. Splitting the gather
    into one stop-gradient full-row gather plus narrow differentiable
    block gathers makes the backward exactly as wide as the trainable
    columns and lets XLA DCE the dead table-build transposes (round-5
    backward attack; the reference has no AD at all — this scoping is
    the TPU analogue of its forward-only pipeline being "free").

    Trainable fields -> hit_f column blocks:
      vertices/normals -> attr block [0, attr_w)
      emission         -> [aw, aw+3)
      lobe_weight      -> [aw+3, aw+3+3*lu)
      lobe_param       -> [aw+3+3*lu, aw+3+lu*(3+p))
    The nee_pdf column and the float-encoded int tail are always
    severed (their only consumers are stop-gradient MIS weights and
    discrete ids).
    """
    if trainable is None:
        return hit_f[idx]
    aw, lu, p = layout["attr_w"], layout["lu"], layout["p"]
    t = frozenset(trainable)
    segs = [
        (0, aw, bool(t & {"vertices", "normals"})),
        (aw, aw + 3, "emission" in t),
        (aw + 3, aw + 3 + 3 * lu, "lobe_weight" in t),
        (aw + 3 + 3 * lu, aw + 3 + lu * (3 + p), "lobe_param" in t),
        (aw + 3 + lu * (3 + p), hit_f.shape[1], False),
    ]
    merged = []
    for c0, c1, d in segs:
        if c1 <= c0:
            continue
        if merged and merged[-1][2] == d:
            merged[-1] = (merged[-1][0], c1, d)
        else:
            merged.append((c0, c1, d))
    if all(not d for _, _, d in merged):
        return jax.lax.stop_gradient(hit_f)[idx]
    if all(d for _, _, d in merged):
        return hit_f[idx]
    # one gather per merged block (no duplicated bytes; ~2-3 blocks in
    # practice — the em/weight/param blocks are adjacent)
    parts = []
    for c0, c1, d in merged:
        blk = hit_f[:, c0:c1]
        if not d:
            blk = jax.lax.stop_gradient(blk)
        parts.append(blk[idx])
    return jnp.concatenate(parts, axis=1)


def unpack_hit_rows(scene, hrow, irow, layout):
    """Parse gathered consolidated rows -> (mat_id, emission (N,3),
    lobes dict, tex dict). irow=None slices the float-encoded int block
    out of hrow itself (single-gather form). tex dict keys (present when
    textured): emission_tex (N,), lobe_tex (N, Lu), normal_tex (N,)."""
    aw, lu, p = layout["attr_w"], layout["lu"], layout["p"]
    n = hrow.shape[0]
    emission = hrow[:, aw : aw + 3]
    weight = hrow[:, aw + 3 : aw + 3 + lu * 3].reshape(n, lu, 3)
    param = hrow[:, aw + 3 + lu * 3 : aw + 3 + lu * (3 + p)].reshape(n, lu, p)
    nee_pdf = hrow[:, aw + 3 + lu * (3 + p)]
    if irow is None:
        # exact small-int float columns; sever the (zero) tangent before
        # the int cast so AD never touches discrete ids
        irow = jax.lax.stop_gradient(
            hrow[:, layout["int_off"] :]
        ).astype(jnp.int32)
    mat_id = irow[:, 0]
    lobes = {
        "type": irow[:, 1 : 1 + lu],
        "weight": weight,
        "param": param,
        "flags": irow[:, 1 + lu : 1 + 2 * lu],
        "n": irow[:, 1 + 2 * lu],
        "present": getattr(scene, "lobe_types_present", ()) or None,
        "max_lobes": lu,
    }
    tex = {}
    col = 2 + 2 * lu
    if layout["has_tex"]:
        tex["emission_tex"] = irow[:, col]
        tex["lobe_tex"] = irow[:, col + 1 : col + 1 + lu]
        col += 1 + lu
    if layout["has_nm"]:
        tex["normal_tex"] = irow[:, col]
    return mat_id, emission, lobes, nee_pdf, tex


def gather_lobes(scene, mat_id: jnp.ndarray, tables=None) -> dict:
    """Per-hit lobe arrays for a wavefront of material ids (N,).

    tables: optional material_tables(scene) — pass in hot loops to
    collapse the five per-material gathers into two."""
    if tables is None:
        gathered = {
            "type": scene.lobe_type[mat_id],      # (N, L)
            "weight": scene.lobe_weight[mat_id],  # (N, L, 3)
            "param": scene.lobe_param[mat_id],    # (N, L, P)
            "flags": scene.lobe_flags[mat_id],    # (N, L)
            "n": scene.n_lobes[mat_id],           # (N,)
        }
    else:
        fl, il = tables
        n = mat_id.shape[0]
        _, L = scene.lobe_type.shape
        frow = fl[mat_id]  # (N, L*3 + L*P)
        irow = il[mat_id]  # (N, 2L + 1)
        gathered = {
            "type": irow[:, :L],
            "weight": frow[:, : L * 3].reshape(n, L, 3),
            "param": frow[:, L * 3 :].reshape(n, L, -1),
            "flags": irow[:, L : 2 * L],
            "n": irow[:, 2 * L],
        }
    gathered.update(
        {
            # static: which lobe types exist anywhere in the scene (compiles
            # away absent BSDF code paths); empty tuple means "unknown -> all"
            "present": getattr(scene, "lobe_types_present", ()) or None,
            # static: max lobes on any material (0 -> unknown -> MAX_LOBES)
            "max_lobes": getattr(scene, "max_lobes_used", 0) or MAX_LOBES,
        }
    )
    return gathered


def apply_textures(
    scene, lobes: dict, mat_id: jnp.ndarray, st: jnp.ndarray, tex=None,
    footprint=None,
) -> dict:
    """Fold texture lookups into the per-hit lobe weights (the TPU form
    of the reference's OSL texture() closure inputs). No-op (compiled
    away) for untextured scenes. tex: optional pre-gathered (N, L)
    lobe-texture ids (consolidated hit row). footprint: optional (N,)
    uv-space sample diameter for mip filtering (core/texture.py)."""
    if not getattr(scene, "has_textures", False):
        return lobes

    L = lobes.get("max_lobes", MAX_LOBES)
    if tex is None:
        tex = scene.lobe_tex[mat_id][:, :L]  # (N, L)
    else:
        tex = tex[:, :L]
    n = mat_id.shape[0]
    flat_tex = tex.reshape(-1)
    flat_st = jnp.broadcast_to(st[:, None, :], (n, L, 2)).reshape(-1, 2)
    flat_fp = None
    if isinstance(footprint, dict):
        # anisotropic footprint (integrator _footprint): broadcast each
        # per-ray field over the lobe-slot axis
        flat_fp = {
            "minor": jnp.broadcast_to(
                footprint["minor"][:, None], (n, L)).reshape(-1),
            "major_uv": jnp.broadcast_to(
                footprint["major_uv"][:, None, :], (n, L, 2)).reshape(-1, 2),
            "taps": footprint["taps"],
        }
    elif footprint is not None:
        flat_fp = jnp.broadcast_to(footprint[:, None], (n, L)).reshape(-1)
    factor = _sample_any(scene, flat_tex, flat_st, footprint=flat_fp)
    factor = factor.reshape(n, L, 3)
    weight = jnp.where(
        (tex >= 0)[..., None], lobes["weight"][:, :L] * factor, lobes["weight"][:, :L]
    )
    out = dict(lobes)
    out["weight"] = jnp.concatenate(
        [weight, lobes["weight"][:, L:]], axis=1
    ) if L < MAX_LOBES else weight
    return out


def apply_fresnel(scene, lobes: dict, n: jnp.ndarray, wi: jnp.ndarray) -> dict:
    """Per-hit fresnel lobe weighting (the reference Glass expansion's
    fresnel + mix subgraph, plugins/blender/blender/shader.hpp:306-361,
    and fresnel_node.osl semantics: eta inverted when backfacing).

    lobe param[4]: 0 = none, 1 = weight by F, 2 = weight by 1-F;
    param[5]: ior. No-op (compiled away) without fresnel lobes.
    """
    if not getattr(scene, "has_fresnel", False):
        return lobes
    from phosphorus_mk2_tpu.math.fresnel import dielectric

    L = lobes.get("max_lobes", MAX_LOBES)
    mode = lobes["param"][:, :L, 4]  # (N, L)
    ior = lobes["param"][:, :L, 5]
    cosi = dot(n, wi)[:, None]  # (N, 1)
    F = dielectric(cosi, jnp.where(ior == 0.0, 1.5, ior))
    factor = jnp.where(
        mode == 1.0, F, jnp.where(mode == 2.0, 1.0 - F, 1.0)
    )
    out = dict(lobes)
    w = lobes["weight"][:, :L] * factor[..., None]
    out["weight"] = (
        jnp.concatenate([w, lobes["weight"][:, L:]], axis=1)
        if L < MAX_LOBES
        else w
    )
    return out


def _sample_any(scene, tex_id, uv, footprint=None):
    """Texture sample honoring procedural textures when present (static)."""
    from phosphorus_mk2_tpu.core.texture import sample_texture, sample_texture_any

    if getattr(scene, "has_procedural", False):
        return sample_texture_any(
            {
                "atlas": scene.tex_atlas,
                "info": scene.tex_info,
                "proc": scene.tex_proc,
                "proc_params": scene.tex_proc_params,
            },
            tex_id,
            uv,
            footprint=footprint,
        )
    return sample_texture(scene.tex_atlas, scene.tex_info, tex_id, uv,
                          footprint=footprint)


def emission_at(scene, mat_id: jnp.ndarray, st: jnp.ndarray, tables=None,
                footprint=None) -> jnp.ndarray:
    """Per-hit emission, texture-modulated when the material has an
    emission texture. (tables is accepted for signature stability but
    unused: packing emission into the wide material row made the light
    side gather a (N, ~90)-column row to read 3 values — measured 13%
    SLOWER on the bench; the (M, 3) emission gather stays separate.)"""
    e = scene.emission[mat_id]
    if not getattr(scene, "has_textures", False):
        return e

    t = scene.emission_tex[mat_id]
    f = _sample_any(scene, t, st, footprint=footprint)
    return jnp.where((t >= 0)[..., None], e * f, e)


def emission_from_row(scene, e, etex, st, footprint=None) -> jnp.ndarray:
    """Texture-modulated emission from pre-gathered values (consolidated
    hit row): e (N,3), etex (N,) texture ids or None when untextured."""
    if not getattr(scene, "has_textures", False) or etex is None:
        return e
    f = _sample_any(scene, etex, st, footprint=footprint)
    return jnp.where((etex >= 0)[..., None], e * f, e)


def env_emission_at(scene, d: jnp.ndarray) -> jnp.ndarray:
    """Environment radiance for miss directions (lat-long env map when
    the environment material is textured)."""
    if scene.env_mat < 0:
        return jnp.zeros((d.shape[0], 3), jnp.float32)
    e = jnp.broadcast_to(scene.emission[scene.env_mat], (d.shape[0], 3))
    if not getattr(scene, "has_textures", False):
        return e
    from phosphorus_mk2_tpu.core.texture import direction_to_latlong_uv

    t = scene.emission_tex[scene.env_mat]
    uv = direction_to_latlong_uv(d)
    f = _sample_any(scene, jnp.full(d.shape[:1], t, jnp.int32), uv)
    return jnp.where(t >= 0, e * f, e)


def _hemisphere_match(flags_i, n, wi, wo):
    """reflect/transmit matching (reference src/bsdf.cpp:120-127)."""
    atl = dot(n, wi)
    reflect = atl * dot(n, wo) > 0.0
    is_refl = (flags_i & FLAG_REFLECT) == FLAG_REFLECT
    is_trans = (flags_i & FLAG_TRANSMIT) == FLAG_TRANSMIT
    reflect = reflect.reshape(reflect.shape + (1,) * (flags_i.ndim - reflect.ndim))
    return jnp.where(reflect, is_refl, is_trans)


def _eval_all_slots(lobes: dict, n, wi, wo):
    """One flattened eval_lobe call over the (hit x lobe-slot) axis.

    A per-slot Python loop would inline eval_lobe MAX_LOBES times into
    the graph (and its transpose into the backward), which blows up XLA
    compile time; flattening keeps one copy and gives the VPU a bigger
    batch. Returns (e, pdf) of shape (N, L).
    """
    num = wi.shape[0]
    L = lobes.get("max_lobes", MAX_LOBES)
    flat_type = lobes["type"][:, :L].reshape(-1)
    flat_param = lobes["param"][:, :L].reshape(num * L, -1)

    def tile(x):
        return jnp.broadcast_to(x[:, None, :], (num, L, 3)).reshape(num * L, 3)

    present = lobes.get("present")
    # sorted dispatch is AD-capable since round 5 (custom_vjp reruns the
    # sorted sweep with per-type vjps — lobes._sorted_bwd); sorted_ok
    # remains a caller override for A/B measurement
    if (
        present and len(present) > 2 and num * L >= 4096
        and lobes.get("sorted_ok", True)
    ):
        e, pdf = eval_lobe_sorted(
            flat_type, flat_param, tile(n), tile(wi), tile(wo), present
        )
    else:
        e, pdf = eval_lobe(
            flat_type, flat_param, tile(n), tile(wi), tile(wo), present=present
        )
    return e.reshape(num, L), pdf.reshape(num, L)


def bsdf_f(lobes: dict, n: jnp.ndarray, wi: jnp.ndarray, wo: jnp.ndarray):
    """Evaluate the container (reference bsdf_t::f, src/bsdf.cpp:113-131).

    wi = direction toward the light; wo = toward the viewer. Includes the
    incident-cosine factor, as the reference does inside f().
    Returns (N, 3) rgb.
    """
    L = lobes.get("max_lobes", MAX_LOBES)
    atl = dot(n, wi)
    match = _hemisphere_match(lobes["flags"][:, :L], n, wi, wo)  # (N, L)
    active = jnp.arange(L)[None, :] < lobes["n"][:, None]
    e, _ = _eval_all_slots(lobes, n, wi, wo)  # (N, L)
    contrib = (
        e[..., None] * lobes["weight"][:, :L] * atl[..., None, None]
    )  # (N, L, 3)
    return jnp.where((active & match)[..., None], contrib, 0.0).sum(axis=1)


def bsdf_pdf(lobes: dict, n: jnp.ndarray, wi: jnp.ndarray, wo: jnp.ndarray):
    """Solid-angle pdf of the uniform one-sample lobe mixture sampling
    direction ``wi`` (toward the light) given viewer direction ``wo``.

    pdf(wi) = (1/n_lobes) * sum over active hemisphere-matching lobes of
    the per-lobe pdf — the clean mixture density. Used only by the MIS
    integrator path (the reference has no MIS, and its sample() pdf
    averaging over *matched* lobes, src/bsdf.cpp:244, is not a proper
    mixture density; MIS balance weights need the same density on both
    the NEE and BSDF-hit sides, so both use this function's convention).
    Specular lobes contribute zero (their eval pdf is 0).
    Returns (N,) f32.
    """
    L = lobes.get("max_lobes", MAX_LOBES)
    match = _hemisphere_match(lobes["flags"][:, :L], n, wi, wo)  # (N, L)
    active = jnp.arange(L)[None, :] < lobes["n"][:, None]
    _, pdf = _eval_all_slots(lobes, n, wi, wo)  # (N, L)
    total = jnp.where(active & match, pdf, 0.0).sum(axis=1)
    return total / jnp.maximum(lobes["n"], 1).astype(total.dtype)


def bsdf_sample(lobes: dict, n: jnp.ndarray, wi: jnp.ndarray, u2: jnp.ndarray):
    """Sample the container (reference bsdf_t::sample, src/bsdf.cpp:133-248).

    wi = direction toward the previous path vertex; u2 = (N, 2) uniforms.
    Returns (f (N,3), wo (N,3), pdf (N,), flags (N,) int32).
    """
    num = wi.shape[0]
    rows = jnp.arange(num)

    n_lobes = jnp.maximum(lobes["n"], 1)
    idx, u_remap = remap_index_sample(u2[..., 0], n_lobes)

    # slot selection by static broadcast-select, NOT arr[rows, idx]:
    # the fancy-index form is a per-LANE gather (the measured TPU
    # poison) AND — with a wavefront-sharded operand and sharded
    # indices — a form the SPMD partitioner can only realize by
    # ALL-GATHERING the per-ray lobe arrays across devices (caught by
    # test_sharding's compiled-HLO collective census, round 5). A
    # <=MAX_LOBES-way select fuses into the surrounding elementwise
    # work and stays device-local.
    Lsel = lobes["type"].shape[1]
    onehot = idx[:, None] == jnp.arange(Lsel, dtype=idx.dtype)[None, :]

    def sel_slot(arr):
        m = onehot.reshape(onehot.shape + (1,) * (arr.ndim - 2))
        return jnp.where(m, arr, 0).sum(axis=1)

    type_sel = sel_slot(lobes["type"])
    weight_sel = sel_slot(lobes["weight"])
    param_sel = sel_slot(lobes["param"])
    flags_sel = sel_slot(lobes["flags"])

    remapped = jnp.stack([u_remap, u2[..., 1]], axis=-1)
    present = lobes.get("present")
    if (
        present and len(present) > 2 and num >= 4096
        and lobes.get("sorted_ok", True)
    ):
        # many lobe types + big wavefront: type-sorted dispatch (the
        # reference's deferred-shading bucketing) beats dense all-types
        # (AD-capable since round 5: custom_vjp in lobes.py)
        f_s, wo, pdf = sample_lobe_sorted(
            type_sel, param_sel, n, wi, remapped, present
        )
    else:
        f_s, wo, pdf = sample_lobe(
            type_sel, param_sel, n, wi, remapped, present=present
        )

    selected_valid = pdf != 0.0
    result = f_s[..., None] * weight_sel  # (N, 3)

    # fold in other flag-compatible lobes (one-sample mixture,
    # reference src/bsdf.cpp:226-247) — one flattened eval over all
    # slots; compiled away entirely for single-lobe scenes (static)
    L = lobes.get("max_lobes", MAX_LOBES)
    if L > 1:
        slot = jnp.arange(L)[None, :]
        flags_all = lobes["flags"][:, :L]  # (N, L)
        subset = (flags_sel[:, None] & flags_all) == flags_all
        cond = (slot != idx[:, None]) & (slot < lobes["n"][:, None]) & subset
        hemi = _hemisphere_match(flags_all, n, wi, wo)  # (N, L)
        use = cond & hemi
        e_all, pdf_all = _eval_all_slots(lobes, n, wi, wo)
        result = result + jnp.where(
            use[..., None], e_all[..., None] * lobes["weight"][:, :L], 0.0
        ).sum(axis=1)
        pdf = pdf + jnp.where(use, pdf_all, 0.0).sum(axis=1)
        matched = 1 + use.sum(axis=1)
        pdf = pdf / matched.astype(pdf.dtype)
    result = jnp.where(selected_valid[..., None], result, 0.0)
    pdf = jnp.where(selected_valid, pdf, 0.0)
    return result, wo, pdf, flags_sel


def is_specular_flags(flags: jnp.ndarray) -> jnp.ndarray:
    return (flags & FLAG_SPECULAR) == FLAG_SPECULAR
