"""Wavefront unidirectional path integrator with NEE and Russian roulette.

Counterpart of the reference's sample-parallel-tracing pipeline
(reference src/kernels/cpu/spt.hpp and the per-tile wavefront in
src/xpu/cpu.cpp:148-154: trace -> shade -> prepare_occlusion ->
trace(shadow) -> integrate). TPU-first reformulation:

* the per-bounce wavefront is a dense ``lax.scan`` over a fixed
  ``max_depth`` with per-ray alive masks — the reference's ``active_t``
  index compaction (src/state.hpp:250) becomes masking, which is the
  right trade on a machine that wants static shapes (SURVEY.md §5.7);
* path state (origin, direction, throughput, radiance, flags) is a
  struct of dense (N, ...) arrays — the SoA ray/interaction streams of
  reference src/state.hpp:40-248 with N = the whole frame, not 1024;
* every random number is counter-based (math/rng.py), so any sharding of
  the pixel axis yields identical images.

Numerical semantics replicated from the reference integrator:
  * emission is added at the first vertex and after specular bounces only
    (spt.hpp:177-179); environment emission on miss (spt.hpp:201);
  * NEE: shadow rays are masked when the light lies in the lower
    hemisphere (spt.hpp:138-141); the direct-light factor is
    (e * 4) * f / (light_pdf * d^2 / |cos theta_l|) (spt.hpp:252-254);
  * Russian roulette after 3 vertices with q = max(0.05, 1 - lum(beta))
    and survivor reweighting (spt.hpp:307-328);
  * throughput update beta *= f * |n.wo| / pdf (spt.hpp:291-299).

Differentiability: radiance is differentiable w.r.t. scene.vertices,
scene.normals, lobe weights/params and emission. Discrete events (hit
ids, visibility, lobe choice, RR) are primal/stop-gradiented, so these
are interior gradients (no visibility-edge terms) — the scoping called
out in SURVEY.md §7 "hard parts".
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from phosphorus_mk2_tpu.accel.intersect import reintersect
from phosphorus_mk2_tpu.bsdf.bsdf import (
    apply_fresnel,
    apply_textures,
    bsdf_f,
    bsdf_pdf,
    bsdf_sample,
    emission_at,
    emission_from_row,
    env_emission_at,
    gather_hit_rows,
    gather_lobes,
    hit_row_tables,
    is_specular_flags,
    material_tables,
    unpack_hit_rows,
)
from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays
from phosphorus_mk2_tpu.core.lights import (
    light_meta_table,
    light_tri_table,
    sample_lights,
)
from phosphorus_mk2_tpu.core.shading import (
    apply_normal_map,
    shading_parameters,
    triangle_attribute_table,
)
from phosphorus_mk2_tpu.math import rng
from phosphorus_mk2_tpu.math.vec import (
    RAY_EPSILON,
    dot,
    is_black,
    luminance,
    normalize,
    offset,
)


def make_tracer(scene, use_bvh: bool = True, use_pallas: bool = False,
                kind: str = "auto", tracer_tune: dict | None = None):
    """Pick the traversal backend.

    kind: "auto" (cluster tracer when a BVH is attached and the scene is
    big enough to beat brute force), "cluster" (sorted cluster
    scheduling — the TPU performance path), "block" (shared-stack block
    traversal), "per_ray" (vmapped per-ray stacks — oracle), "brute"
    (dense all-pairs — oracle / small scenes).
    tracer_tune: cluster-tracer launch-count tunables (dense_waves /
    chunk / dense_chunk / expand_batch / slab_bf16 / recompact — see
    accel/cluster_traverse._trace); ignored by other backends. A
    "shadow" sub-dict overrides keys for the any-hit (occlusion) trace
    only — shadow rays terminate on the first hit within a short tmax
    and need no front-to-back completeness, so e.g. a shallower
    front_k can serve them (exact fallback covers overflow either way;
    results are identical by construction, only the schedule changes).
    """
    has_bvh = use_bvh and scene.bvh is not None
    if kind == "auto":
        if has_bvh and scene.num_tris > 1024:
            kind = "cluster"
        else:
            kind = "brute"
    if kind in ("block", "per_ray", "cluster") and not has_bvh:
        raise ValueError(f"tracer kind {kind!r} requires an attached BVH")

    if kind == "cluster":
        from phosphorus_mk2_tpu.accel.cluster_traverse import (
            intersect_clusters,
            occluded_clusters,
        )

        if tracer_tune:
            tune = dict(tracer_tune)
            shadow = {**tune, **(tune.pop("shadow", None) or {})}
            shadow.pop("shadow", None)
            return (
                functools.partial(intersect_clusters, **tune),
                functools.partial(occluded_clusters, **shadow),
            )
        return intersect_clusters, occluded_clusters

    if kind == "block":
        from phosphorus_mk2_tpu.accel.block_traverse import (
            intersect_blocks,
            occluded_blocks,
        )
        from phosphorus_mk2_tpu.accel.sort import sorted_trace

        def closest(scene, p, d, tmax=None):
            return sorted_trace(intersect_blocks, scene, p, d, tmax)

        def occluded(scene, p, d, tmax):
            return sorted_trace(occluded_blocks, scene, p, d, tmax)

        return closest, occluded
    if kind == "per_ray":
        from phosphorus_mk2_tpu.accel.traverse import intersect_bvh, occluded_bvh

        return intersect_bvh, occluded_bvh
    if use_pallas:
        # explicit-VMEM Pallas MT (1.6x the XLA brute on TPU, see
        # tools/tpu_pallas_probe.py); real-TPU only (interpret mode in
        # tests)
        from phosphorus_mk2_tpu.accel.pallas_mt import (
            intersect_pallas_brute,
            occluded_pallas_brute,
        )

        return intersect_pallas_brute, occluded_pallas_brute
    from phosphorus_mk2_tpu.accel.intersect import intersect_brute, occluded_brute

    return intersect_brute, occluded_brute


# per-tri consolidated hit rows cost ~(attr_w + 4 + 9*Lu) floats per
# triangle; cap where that is still small next to the geometry itself
HIT_ROW_MAX_TRIS = 1 << 18

# SceneData fields a caller may declare trainable (the gradient-scoping
# contract shared with optim.InverseRenderer)
SCOPABLE_FIELDS = ("vertices", "normals", "emission", "lobe_weight",
                   "lobe_param")


def scope_scene(scene, trainable):
    """Sever gradient flow at every NON-trainable scene leaf.

    ∂loss/∂(trainable fields) is bit-identical with or without this —
    a stop_gradient on OTHER leaves never changes a partial derivative
    w.r.t. the fields left live — but the backward graph shrinks to
    exactly the chains rooted at the trainable set (XLA DCEs the dead
    table-build transposes and scatters). trainable=None returns the
    scene unchanged (fully differentiable — the historical behavior).
    Round-5 backward attack: grad cost was measured param-set-
    INDEPENDENT in round 4 because every field rode the same fat
    gathered rows.
    """
    if trainable is None:
        return scene
    import dataclasses

    t = frozenset(trainable)
    unknown = t - frozenset(SCOPABLE_FIELDS)
    if unknown:
        # a typo here would silently sever every real field and return
        # exactly-zero gradients — fail loudly instead
        raise ValueError(
            f"unknown trainable field(s) {sorted(unknown)}; "
            f"scopable: {SCOPABLE_FIELDS}"
        )
    sg = {
        f: jax.lax.stop_gradient(getattr(scene, f))
        for f in SCOPABLE_FIELDS
        if f not in t and getattr(scene, f, None) is not None
    }
    return dataclasses.replace(scene, **sg) if sg else scene


def make_scene_tables(scene) -> dict:
    """Build the consolidated gather tables used by trace_sample.

    Beyond the round-1 attr/mat/light tables, two fat-row tables fold
    whole lookup chains into single row-gathers (each gather is a kernel
    launch on the axon platform — the dominant cost at bench wavefronts):
    * hit_f/hit_i: per-TRIANGLE attribute+material rows (hit side reads
      2 rows instead of ~7 gathers); gated on scene size;
    * light_tri: per-LIGHT-TRIANGLE attr+emission rows (NEE side reads
      1 row instead of 3 gathers); always on — light tris are few.
    """
    attr = triangle_attribute_table(scene)
    tables = {
        "attr": attr,
        "mat": material_tables(scene),
        "light": light_meta_table(scene),
        "light_tri": light_tri_table(scene, attr),
    }
    if scene.num_tris <= HIT_ROW_MAX_TRIS:
        hit_f, hit_i, layout = hit_row_tables(scene, attr)
        tables.update({"hit_f": hit_f, "hit_i": hit_i, "hit_layout": layout})
    return tables


MAX_ANISO = 8.0  # major/minor clamp, like OIIO's default aniso limit


def _footprint(aux, t_hit, sp, d, spread, aniso_taps=0):
    """uv-space sample footprint at this hit. Primal-only (mip
    selection must not carry tangents).

    aniso_taps=0 (default): scalar diameter — ray-cone width (angular
    spread x camera->vertex distance) x the triangle's uv-per-world
    scale, stretched by 1/sqrt(|cos|) at grazing incidence (the
    geometric mean of the anisotropic footprint's two axes — the
    isotropic stand-in for OIIO's anisotropic filter).

    aniso_taps>0: the cone's elliptical intersection with the surface,
    as {"minor", "major_uv", "taps"} for core/texture._sample_aniso
    (the reference inherits true anisotropic/EWA filtering via OSL
    texture() over OIIO, src/material.cpp:127-129): minor = cone width
    x uv_scale (LOD axis); major = the in-plane projected view
    direction, length cone/max(cos, 1/MAX_ANISO), mapped world->uv
    through the triangle's edge Jacobian (normal-equations solve over
    the edges shading_parameters already loaded — zero extra gathers).
    """
    dist = aux["plen"] + jax.lax.stop_gradient(t_hit)
    cos_i = jnp.abs((sp["ng"] * d).sum(axis=-1))
    w_c = dist * spread  # world-space cone diameter at the hit
    uv_scale = jax.lax.stop_gradient(sp["uv_scale"])
    if not aniso_taps:
        graze = 1.0 / jnp.sqrt(jnp.maximum(cos_i, 1e-2))
        return (w_c * graze) * uv_scale

    sg = jax.lax.stop_gradient
    ng = sg(sp["ng"])
    e0w, e1w, e0t, e1t = (sg(e) for e in sp["edges"])
    # in-plane major-axis direction: the projected view direction
    t_w = d - ng * (ng * d).sum(axis=-1, keepdims=True)
    t_len = jnp.sqrt(jnp.maximum((t_w * t_w).sum(-1), 1e-20))
    # near-normal incidence the projection vanishes and the ellipse is a
    # circle — any in-plane direction works; fall back to edge 0
    degenerate = t_len < 1e-6
    t_hat = jnp.where(
        degenerate[:, None],
        e0w / jnp.sqrt(jnp.maximum((e0w * e0w).sum(-1, keepdims=True), 1e-20)),
        t_w / t_len[:, None],
    )
    # world->uv linear map via least squares over the triangle edges:
    # solve [e0w e1w] (a, b) ~= t_hat, then uv_vec = a*e0t + b*e1t
    g00 = (e0w * e0w).sum(-1)
    g01 = (e0w * e1w).sum(-1)
    g11 = (e1w * e1w).sum(-1)
    det = jnp.maximum(g00 * g11 - g01 * g01, 1e-12)
    r0 = (e0w * t_hat).sum(-1)
    r1 = (e1w * t_hat).sum(-1)
    a = (g11 * r0 - g01 * r1) / det
    b = (g00 * r1 - g01 * r0) / det
    uv_dir = a[:, None] * e0t + b[:, None] * e1t  # uv image of t_hat
    major_world = w_c / jnp.maximum(cos_i, 1.0 / MAX_ANISO)
    return {
        "minor": w_c * uv_scale,
        "major_uv": uv_dir * major_world[:, None],
        "taps": int(aniso_taps),
    }


def trace_sample(
    scene,
    cam_params,
    pixel_x,
    pixel_y,
    sample_idx,
    key,
    *,
    max_depth: int,
    tracer,
    film_strata: int = 1,
    mis: bool = False,
    depth_unroll: int = 1,
    tables: dict | None = None,
    remat: bool = False,
    sorted_dispatch: bool = True,
    pipeline_shadow: bool = False,
    aniso_taps: int = 0,
    trainable: tuple | None = None,
):
    """Trace one sample per pixel for a wavefront. Returns (radiance (N,3),
    first-hit normal (N,3), first-hit alpha (N,)).

    trainable: optional tuple of SceneData field names (SCOPABLE_FIELDS)
    the caller will differentiate w.r.t. — gradient flow from all OTHER
    fields is severed (scope_scene + column-scoped hit-row gathers), so
    the backward pass only pays for the chains actually requested.
    Grads for the listed fields are bit-identical to trainable=None.

    pipeline_shadow: software-pipeline NEE — bounce b's shadow rays ride
    in the SAME stacked trace as bounce b+1's closest-hit rays (one trace
    kernel per bounce instead of two; the deferred contribution lands one
    iteration later, identical values up to fp summation order). One
    trailing any-hit trace resolves the last bounce after the scan.
    Default OFF: measured a slight LOSS on the launch-bound brute bench
    (48.7 vs 49.8 Mrays/s, tools/tpu_r2c_pipeline.py) — closest-hit
    keying on the shadow half costs more than the saved launch. Kept for
    traversal backends where per-wave fixed costs dominate.

    film_strata: stratify the film jitter on a d x d grid cycled by
    sample index (the reference stratifies its pixel samples over spp,
    src/sampling.cpp:98-112 — but shares one pattern across all pixels;
    we stratify per pixel, identical expectation, lower variance).

    mis: multiple importance sampling between NEE and BSDF sampling
    (balance heuristic). The reference has NO MIS — it drops emission at
    non-first/non-specular vertices entirely (spt.hpp:177-179) and
    scales NEE by an (e*4) quirk factor (spt.hpp:254). mis=True is a
    flag-gated deviation: emission is kept at every vertex with balance
    weights, the 4x quirk is dropped (the two strategies must estimate
    the same integral), so absolute brightness differs from the
    reference by that factor on NEE-dominated paths. mis=False (default)
    is exact reference parity."""
    n = pixel_x.shape[0]
    closest, occluded = tracer

    # wide attribute tables: one row-gather per bounce instead of ~25
    # per-attribute gathers (each gather is a kernel launch; launches
    # dominate small wavefronts on the axon platform). Built in-jit so
    # they stay differentiable and XLA hoists them out of the scans.
    if tables is None:
        scene = scope_scene(scene, trainable)
        tables = make_scene_tables(scene)
    attr = tables["attr"]
    mat_tables = tables["mat"]
    light_meta = tables["light"]
    light_tri = tables.get("light_tri")
    hit_f = tables.get("hit_f")
    hit_layout = tables.get("hit_layout")

    seed32 = jax.random.key_data(key).reshape(-1)[-1].astype(jnp.uint32)
    pix = (pixel_y.astype(jnp.uint32) << jnp.uint32(16)) | pixel_x.astype(
        jnp.uint32
    )
    u_cam = rng.pixel_uniforms4(seed32, pix, sample_idx, 0, 0)
    film_u, lens_u = u_cam[:, 0:2], u_cam[:, 2:4]
    if film_strata > 1:
        d = film_strata
        cell = jnp.asarray(sample_idx, jnp.int32) % (d * d)
        sx = (cell % d).astype(jnp.float32)
        sy = (cell // d).astype(jnp.float32)
        off = jnp.stack([sx, sy], -1)
        if off.ndim == 1:  # scalar sample_idx; (N,) per-ray ids pass through
            off = off[None, :]
        film_u = (off + film_u) / d

    p0, d0 = generate_rays(cam_params, pixel_x, pixel_y, film_u, lens_u)

    # ray-cone angular spread: one pixel's angle at the image center
    # (zoom/height radians) — drives uv-footprint mip selection like the
    # reference's OSL texture() derivatives over an OIIO cache
    # (src/material.cpp:127-129). Footprints are primal-only.
    filtered_tex = getattr(scene, "has_textures", False) and (
        getattr(scene, "tex_info", None) is not None
        and scene.tex_info.ndim == 3 and scene.tex_info.shape[1] > 1
    )
    if filtered_tex:
        cone_spread = jax.lax.stop_gradient(
            1.12 * jnp.tan(cam_params["fov"] * 0.5) / cam_params["height"]
        )

    nee_enabled = scene.num_lights > 0
    pipe = pipeline_shadow and nee_enabled

    def bounce(carry, b):
        if pipe:
            p, d, beta, radiance, alive, spec, pdf_prev, pend, aux = carry
            # stacked trace: this bounce's closest-hit rays + the
            # PREVIOUS bounce's NEE shadow rays in one launch
            from phosphorus_mk2_tpu.accel.intersect import T_MAX as _TMAX

            P = jnp.concatenate([p, pend["p"]], axis=0)
            D = jnp.concatenate([d, pend["d"]], axis=0)
            # dead lanes trace with tmax ~ 0: the cluster tracer's
            # overlap sort then skips them entirely (no pending
            # clusters), so deep bounces only pay for live rays
            TM = jnp.concatenate(
                [jnp.where(alive, _TMAX, 1e-6), pend["tmax"]], axis=0
            )
            hits2 = closest(scene, P, D, TM)
            hits = {k: v[:n] for k, v in hits2.items()}
            occ_prev = hits2["hit"][n:]
            radiance = radiance + jnp.where(
                (pend["valid"] & ~occ_prev)[..., None], pend["contrib"], 0.0
            )
        else:
            p, d, beta, radiance, alive, spec, pdf_prev, aux = carry
            from phosphorus_mk2_tpu.accel.intersect import T_MAX as _TMAX

            # dead lanes trace with tmax ~ 0 (see pipelined branch note)
            hits = closest(scene, p, d, jnp.where(alive, _TMAX, 1e-6))
        tri = hits["tri"]
        hit = hits["hit"] & alive
        safe_tri = jnp.maximum(tri, 0)

        if hit_f is not None:
            # consolidated hit side: ONE row-gather feeds the
            # re-intersection, shading attrs, material lobes, emission,
            # texture ids (float-encoded int columns) and the
            # NEE-competing pdf
            hrow = gather_hit_rows(hit_f, safe_tri, hit_layout, trainable)
            mat_raw, e_row, lobes_raw, nee_pdf_row, texids = unpack_hit_rows(
                scene, hrow, None, hit_layout
            )
            t_hit, u, v = reintersect(scene, tri, p, d, row=hrow)
            u = jnp.where(hit, u, 0.0)
            v = jnp.where(hit, v, 0.0)
            sp = shading_parameters(scene, tri, u, v, row=hrow)
            mat = jnp.where(hit, mat_raw, 0)
            wo_view = -d
            n_interp = sp["n"]
            fp = (_footprint(aux, t_hit, sp, d, cone_spread, aniso_taps)
                  if filtered_tex else None)
            sp = apply_normal_map(scene, sp, mat, tid=texids.get("normal_tex"),
                                  footprint=fp)
            hp, hn = sp["p"], sp["n"]
            e_hit = emission_from_row(
                scene, e_row, texids.get("emission_tex"), sp["st"],
                footprint=fp,
            )
            lobes = apply_textures(
                scene, lobes_raw, mat, sp["st"], tex=texids.get("lobe_tex"),
                footprint=fp,
            )
        else:
            # differentiable re-evaluation of the hit point
            t_hit, u, v = reintersect(scene, tri, p, d, attr=attr)
            u = jnp.where(hit, u, 0.0)
            v = jnp.where(hit, v, 0.0)
            sp = shading_parameters(scene, tri, u, v, attr=attr)
            wo_view = -d  # toward the previous vertex (reference flips wi)
            mat = jnp.where(hit, scene.tri_mat[safe_tri], 0)
            n_interp = sp["n"]  # pre-normal-map interpolated normal: the
            # cosine convention sample_lights uses on the NEE side
            fp = (_footprint(aux, t_hit, sp, d, cone_spread, aniso_taps)
                  if filtered_tex else None)
            sp = apply_normal_map(scene, sp, mat, footprint=fp)
            hp, hn = sp["p"], sp["n"]
            e_hit = emission_at(scene, mat, sp["st"], tables=mat_tables,
                                footprint=fp)
            lobes = apply_textures(
                scene, gather_lobes(scene, mat, tables=mat_tables), mat,
                sp["st"], footprint=fp,
            )

        # 1. emission at first/specular vertices; env on miss
        emit_mask = hit & ((b == 0) | spec)
        radiance = radiance + jnp.where(emit_mask[..., None], beta * e_hit, 0.0)
        if mis:
            # balance-weighted emission at the remaining vertices: the
            # BSDF-sampling side of the NEE/BSDF MIS pair. pdf_prev is
            # the mixture pdf of the direction that produced this hit;
            # the competing strategy is NEE with solid-angle pdf
            # tri_light_pdf * d^2 / |cos| (zero off lights).
            # cos from the un-perturbed interpolated normal so both
            # sides of the balance pair share the NEE side's cosine
            # convention (sample_lights interpolates without the normal
            # map); weights then sum to 1 on normal-mapped emitters
            dist = jax.lax.stop_gradient(t_hit)
            cos_h = jnp.abs(dot(n_interp, d))
            nee_pdf = (
                nee_pdf_row if hit_f is not None else scene.tri_light_pdf[safe_tri]
            )
            pdf_nee_sa = nee_pdf * dist * dist / jnp.maximum(cos_h, 1e-12)
            w_b = jax.lax.stop_gradient(
                pdf_prev / jnp.maximum(pdf_prev + pdf_nee_sa, 1e-20)
            )
            mis_mask = hit & ~emit_mask
            radiance = radiance + jnp.where(
                mis_mask[..., None], beta * e_hit * w_b[..., None], 0.0
            )
        miss_mask = alive & ~hit
        env_e = env_emission_at(scene, d)
        radiance = radiance + jnp.where(miss_mask[..., None], beta * env_e, 0.0)

        # record first-hit AOVs
        first = aux["first"] & alive
        aux_next = {
            "first": aux["first"] & ~alive,  # only bounce 0 has alive=first
            "normal": jnp.where((first & hit)[..., None], hn, aux["normal"]),
            "alpha": jnp.where(first & hit, 1.0, aux["alpha"]),
        }
        if filtered_tex:  # accumulated camera->vertex distance (ray cone)
            aux_next["plen"] = aux["plen"] + jnp.where(
                hit, jax.lax.stop_gradient(t_hit), 0.0
            )
        aux = aux_next

        lobes["sorted_ok"] = sorted_dispatch  # type-sorted dispatch
        # (AD-capable since round 5; flag kept as an A/B override)
        lobes = apply_fresnel(scene, lobes, hn, wo_view)

        # per-bounce randomness: two PCG4D evaluations cover light pick /
        # light tri / light uv / RR and bsdf lobe / bsdf uv
        u_light = rng.pixel_uniforms4(seed32, pix, sample_idx, b, 1)
        u_bsdf = rng.pixel_uniforms4(seed32, pix, sample_idx, b, 2)

        # 2. next-event estimation
        if nee_enabled:
            ls = sample_lights(
                scene,
                u_light[:, 0],
                u_light[:, 1],
                u_light[:, 2],
                attr=attr,
                meta=light_meta,
                lt_table=light_tri,
                attr_w=attr.shape[1],
            )

            p_off = offset(hp, hn)
            wi_vec = ls["p"] - p_off
            dist = jnp.sqrt(jnp.maximum(dot(wi_vec, wi_vec), 1e-20))
            wi = wi_vec / dist[..., None]
            dist = dist - RAY_EPSILON

            same_hemi = dot(hn, wi) > 0.0
            valid = hit & same_hemi & ls["valid"]
            if not pipe:
                occ = occluded(scene, p_off, wi, jnp.where(valid, dist, 0.0))

            f = bsdf_f(lobes, hn, wi, wo_view)
            if "e" in ls:
                # emission pre-gathered in the consolidated light-tri row
                light_e = emission_from_row(scene, ls["e"], ls["etex"], ls["st"])
            else:
                light_e = emission_at(scene, ls["mat"], ls["st"], tables=mat_tables)
            cos_l = jnp.abs(dot(ls["n"], -wi))
            # division guards at 1e-12: (1e-20)^2 underflows in the
            # vjp of 1/max(x, eps) -> inf*0 = NaN on masked lanes
            # (see core/lights.pdf_area)
            pdf_l = ls["pdf"] * dist * dist / jnp.maximum(cos_l, 1e-12)
            if mis:
                # balance weight vs BSDF sampling of the same direction;
                # the reference's (e*4) quirk is dropped in MIS mode so
                # both strategies estimate the same integral
                pdf_b = bsdf_pdf(lobes, hn, wi, wo_view)
                w_nee = jax.lax.stop_gradient(
                    pdf_l / jnp.maximum(pdf_l + pdf_b, 1e-20)
                )
                li = (
                    light_e
                    * f
                    * (w_nee / jnp.maximum(pdf_l, 1e-12))[..., None]
                )
            else:
                li = (light_e * 4.0) * f / jnp.maximum(pdf_l, 1e-12)[..., None]
            if pipe:
                # defer: visibility resolves inside the NEXT bounce's
                # stacked trace (or the trailing resolve after the scan)
                pend = {
                    "p": p_off,
                    "d": wi,
                    "tmax": jnp.where(valid, dist, 0.0),
                    "contrib": jnp.where(valid[..., None], beta * li, 0.0),
                    "valid": valid,
                }
            else:
                use = valid & ~occ
                radiance = radiance + jnp.where(use[..., None], beta * li, 0.0)

        # 3. Russian roulette + termination (reference terminate_path)
        depth_after = b + 1
        alive_next = hit & (depth_after < max_depth)
        u_rr = u_light[:, 3]
        q = jnp.maximum(0.05, 1.0 - luminance(jax.lax.stop_gradient(beta)))
        rr_on = alive_next & (depth_after >= 3)
        survive = u_rr >= q
        alive_next = alive_next & (~rr_on | survive)
        w = jnp.where(rr_on & survive, 1.0 / (1.0 - q), 1.0)
        beta = beta * w[..., None]

        # 4. BSDF sampling for the next bounce
        f_s, wo, pdf_s, flags = bsdf_sample(lobes, hn, wo_view, u_bsdf[:, 0:2])

        dead_f = is_black(f_s) | (pdf_s == 0.0)
        alive_next = alive_next & ~dead_f

        cos_o = dot(hn, wo)
        safe_pdf = jnp.where(pdf_s == 0.0, 1.0, pdf_s)
        beta_next = beta * f_s * (jnp.abs(cos_o) / safe_pdf)[..., None]
        beta = jnp.where(alive_next[..., None], beta_next, beta)

        p_next = offset(hp, hn, invert=cos_o < 0.0)
        d_next = normalize(wo)
        p = jnp.where(alive_next[..., None], p_next, p)
        d = jnp.where(alive_next[..., None], d_next, d)
        spec = jnp.where(alive_next, is_specular_flags(flags), False)

        if mis:
            # the clean mixture pdf of the direction just sampled — the
            # density the BSDF-hit weight at the NEXT vertex competes
            # with (must match bsdf_pdf's convention on the NEE side)
            pdf_mix = bsdf_pdf(lobes, hn, d_next, wo_view)
            pdf_prev = jnp.where(alive_next, pdf_mix, 0.0)

        if pipe:
            return (
                p, d, beta, radiance, alive_next, spec, pdf_prev, pend, aux
            ), None
        return (p, d, beta, radiance, alive_next, spec, pdf_prev, aux), None

    aux0 = {
        "first": jnp.ones((n,), bool),
        **({"plen": jnp.zeros((n,))} if filtered_tex else {}),
        "normal": jnp.zeros((n, 3), jnp.float32),
        "alpha": jnp.zeros((n,), jnp.float32),
    }
    carry0 = [
        p0,
        d0,
        jnp.ones((n, 3), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.ones((n,), bool),
        jnp.zeros((n,), bool),
        jnp.zeros((n,), jnp.float32),
        aux0,
    ]
    if pipe:
        pend0 = {
            "p": jnp.zeros((n, 3), jnp.float32),
            "d": jnp.zeros((n, 3), jnp.float32),
            "tmax": jnp.zeros((n,), jnp.float32),
            "contrib": jnp.zeros((n, 3), jnp.float32),
            "valid": jnp.zeros((n,), bool),
        }
        carry0.insert(7, pend0)
    bounce_fn = jax.checkpoint(bounce) if remat else bounce
    out_carry, _ = jax.lax.scan(
        bounce_fn, tuple(carry0), jnp.arange(max_depth), unroll=depth_unroll
    )
    if pipe:
        radiance, pend, aux = out_carry[3], out_carry[7], out_carry[8]
        # trailing resolve: the last bounce's shadow rays
        occ = occluded(scene, pend["p"], pend["d"], pend["tmax"])
        radiance = radiance + jnp.where(
            (pend["valid"] & ~occ)[..., None], pend["contrib"], 0.0
        )
    else:
        radiance, aux = out_carry[3], out_carry[7]
    return radiance, aux["normal"], aux["alpha"]


def render_pass_pixels(
    scene,
    cam_params,
    key,
    sample_offset,
    n_samples: int,
    px,
    py,
    *,
    max_depth: int,
    tracer,
    film_strata: int = 1,
    mis: bool = False,
    spp_batch: int = 1,
    depth_unroll: int = 1,
    sample_unroll: int = 1,
    remat: bool = False,
    sorted_dispatch: bool = True,
    pipeline_shadow: bool = False,
    aniso_taps: int = 0,
    trainable: tuple | None = None,
):
    """Accumulate ``n_samples`` samples for an arbitrary pixel wavefront.

    px, py: (N,) pixel coordinates — THE sharding axis: shard these over
    a device mesh and the whole integrator runs SPMD with the scene
    replicated (the TPU replacement for the reference's atomic tile
    queue, src/jobs/tiles.hpp:40).

    spp_batch: samples traced per wavefront. >1 tiles the pixel axis so
    each scan step runs a (spp_batch*N)-ray wavefront — small frames
    otherwise under-fill the chip (TPU rule of thumb: give loop bodies
    >=100k elements). Sample values are identical to spp_batch=1 (same
    per-(pixel, sample) counters), sums differ only by fp reassociation.
    Must divide n_samples; falls back to 1 when it doesn't.

    Returns dict of per-pixel sums (not yet divided by spp).
    """
    n = px.shape[0]
    sb = max(1, min(spp_batch, n_samples))
    if n_samples % sb != 0:
        sb = 1
    if sb > 1:
        pxb = jnp.tile(px, sb)
        pyb = jnp.tile(py, sb)
        sub = jnp.repeat(jnp.arange(sb, dtype=jnp.int32), n)
    else:
        pxb, pyb, sub = px, py, None

    scene = scope_scene(scene, trainable)  # sever non-trainable grads
    tables = make_scene_tables(scene)  # once per pass, shared by samples

    def one(carry, s):
        c_sum, n_sum, a_sum = carry
        sidx = sample_offset + s * sb + sub if sb > 1 else sample_offset + s
        r, nrm, alpha = trace_sample(
            scene,
            cam_params,
            pxb,
            pyb,
            sidx,
            key,
            max_depth=max_depth,
            tracer=tracer,
            film_strata=film_strata,
            mis=mis,
            depth_unroll=depth_unroll,
            tables=tables,
            remat=remat,
            sorted_dispatch=sorted_dispatch,
            pipeline_shadow=pipeline_shadow,
            aniso_taps=aniso_taps,
            trainable=trainable,
        )
        if sb > 1:
            r = r.reshape(sb, n, 3).sum(axis=0)
            nrm = nrm.reshape(sb, n, 3).sum(axis=0)
            alpha = alpha.reshape(sb, n).sum(axis=0)
        return (c_sum + r, n_sum + nrm, a_sum + alpha), None

    init = (
        jnp.zeros((n, 3), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )
    (c, nrm, a), _ = jax.lax.scan(
        one, init, jnp.arange(n_samples // sb), unroll=sample_unroll
    )
    return {"color": c, "normal": nrm, "alpha": a}


def render_pass(
    scene,
    cam_params,
    key,
    sample_offset,
    n_samples: int,
    *,
    width: int,
    height: int,
    max_depth: int,
    tracer,
    film_strata: int = 1,
    mis: bool = False,
    spp_batch: int = 1,
    depth_unroll: int = 1,
    sample_unroll: int = 1,
    remat: bool = False,
    sorted_dispatch: bool = True,
    pipeline_shadow: bool = False,
    aniso_taps: int = 0,
    trainable: tuple | None = None,
):
    """Accumulate ``n_samples`` samples for the full frame. Jittable."""
    n = width * height
    ids = jnp.arange(n, dtype=jnp.int32)
    px = ids % width
    py = ids // width
    return render_pass_pixels(
        scene,
        cam_params,
        key,
        sample_offset,
        n_samples,
        px,
        py,
        max_depth=max_depth,
        tracer=tracer,
        film_strata=film_strata,
        mis=mis,
        spp_batch=spp_batch,
        depth_unroll=depth_unroll,
        sample_unroll=sample_unroll,
        remat=remat,
        sorted_dispatch=sorted_dispatch,
        pipeline_shadow=pipeline_shadow,
        aniso_taps=aniso_taps,
        trainable=trainable,
    )


def render_aovs(
    scene,
    camera,
    *,
    spp: int | None = None,
    max_depth: int | None = None,
    options=None,
    key=None,
):
    """Full render returning color + AOVs as (H, W, C) numpy-convertible
    jnp arrays. Python-level loop over sample passes (progressive-ready)."""
    from phosphorus_mk2_tpu.core.options import Options

    options = options or Options()
    spp = spp if spp is not None else options.samples_per_pixel
    max_depth = max_depth if max_depth is not None else options.path_depth
    key = key if key is not None else jax.random.key(options.seed)

    cam_params = camera_to_params(camera)
    w, h = camera.width, camera.height
    tracer = make_tracer(
        scene, options.use_bvh, options.use_pallas,
        tracer_tune=options.tracer_tune,
    )

    per_pass = max(1, min(options.samples_per_pass, spp))
    import math

    strata = max(1, round(math.sqrt(spp)))
    # unroll the bounce scan (and samples moderately): the axon TPU
    # platform has a large per-scan-iteration/kernel overhead (measured
    # in tools/tpu_unroll.py: 15.0 -> 18.0 Mrays/s on the 256^2 bench)
    depth_unroll = max_depth if max_depth <= 8 else 1
    sample_unroll = 4 if per_pass % 4 == 0 else 1
    jitted = jax.jit(
        functools.partial(
            render_pass,
            width=w,
            height=h,
            max_depth=max_depth,
            tracer=tracer,
            film_strata=strata,
            mis=getattr(options, "mis", False),
            depth_unroll=depth_unroll,
            sample_unroll=sample_unroll,
            aniso_taps=getattr(options, "aniso_taps", 0),
        ),
        static_argnames=("n_samples",),
    )

    sums = None
    done = 0
    while done < spp:
        todo = min(per_pass, spp - done)
        out = jitted(scene, cam_params, key, done, todo)
        if sums is None:
            sums = out
        else:
            sums = jax.tree_util.tree_map(jnp.add, sums, out)
        done += todo

    inv = 1.0 / spp
    color = (sums["color"] * inv).reshape(h, w, 3)
    normal = (sums["normal"] * inv).reshape(h, w, 3)
    alpha = (sums["alpha"] * inv).reshape(h, w)
    return {"color": color, "normal": normal, "alpha": alpha}


def render(scene, camera, **kwargs):
    """Forward render: (H, W, 3) radiance."""
    return render_aovs(scene, camera, **kwargs)["color"]
