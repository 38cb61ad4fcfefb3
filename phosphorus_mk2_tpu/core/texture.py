"""Texture system: atlas-packed images with bilinear sampling.

The reference samples textures through OSL's texture() with an OIIO
cache (reference src/shaders/texture_node.osl, src/material.cpp:127-129
sets a 16GB texture cache). TPU-native redesign: all scene textures are
shelf-packed into one HBM-resident atlas array at scene build; lookups
are 4-texel gathers + bilinear weights, dense over the wavefront.

Addressing is repeat-wrapped in [0,1)^2 like OSL's default. Environment
(lat-long) lookups map a direction to uv the standard equirect way.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


PROC_IMAGE = 0
PROC_RANDOM = 1    # value noise (reference random_noise_*_node.osl)
PROC_MUSGRAVE = 2  # fractal noise (reference musgrave_noise_3d_node.osl)


@dataclasses.dataclass
class Texture:
    """Host-side image, float32 (H, W, 3) scene-linear — or a procedural
    descriptor (the reference's OSL noise nodes become closed-form
    jnp evaluations at the hit uv)."""

    image: np.ndarray = None
    name: str = ""
    procedural: int = PROC_IMAGE
    # procedural params: [scale, octaves, lacunarity, gain]
    proc_params: tuple = (8.0, 4.0, 2.0, 0.5)

    def __post_init__(self):
        if self.procedural != PROC_IMAGE:
            if self.image is None:
                self.image = np.zeros((1, 1, 3), np.float32)
            return
        img = np.asarray(self.image, np.float32)
        if img.ndim == 2:
            img = img[..., None].repeat(3, axis=-1)
        if img.shape[-1] == 4:
            img = img[..., :3]
        self.image = np.ascontiguousarray(img)

    @staticmethod
    def random_noise(scale: float = 8.0, name="random"):
        return Texture(procedural=PROC_RANDOM, proc_params=(scale, 0, 0, 0), name=name)

    @staticmethod
    def musgrave(
        scale: float = 4.0, octaves: int = 4, lacunarity: float = 2.0,
        gain: float = 0.5, name="musgrave",
    ):
        return Texture(
            procedural=PROC_MUSGRAVE,
            proc_params=(scale, float(octaves), lacunarity, gain),
            name=name,
        )


def checkerboard(n=8, size=64, a=(1.0, 1.0, 1.0), b=(0.0, 0.0, 0.0)) -> Texture:
    y, x = np.mgrid[0:size, 0:size]
    cells = ((x * n // size) + (y * n // size)) % 2
    img = np.where(cells[..., None] == 0, np.asarray(a), np.asarray(b))
    return Texture(img.astype(np.float32), name="checker")


def _downsample2(img: np.ndarray) -> np.ndarray:
    """2x2 box-filter downsample (odd edges replicate-padded)."""
    h, w = img.shape[:2]
    if h % 2:
        img = np.concatenate([img, img[-1:]], axis=0)
        h += 1
    if w % 2:
        img = np.concatenate([img, img[:, -1:]], axis=1)
        w += 1
    return 0.25 * (
        img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2] + img[1::2, 1::2]
    )


def build_mips(image: np.ndarray) -> list:
    """Full mip chain [L0, L1, ...] down to 1x1 (box filter — the
    OIIO/maketx default the reference inherits through OSL texture())."""
    levels = [np.asarray(image, np.float32)]
    while max(levels[-1].shape[:2]) > 1:
        levels.append(_downsample2(levels[-1]))
    return levels


# default atlas HBM budget: the atlas must coexist with geometry, BVH
# tables and the tracer's front-table temps in 16G HBM; half is a safe
# ceiling for texture-heavy scenes (override per call for bigger parts)
ATLAS_BUDGET_BYTES = 8 << 30


def pack_textures(textures: list, mips: bool = True, dtype: str = "f32",
                  budget_bytes: int = ATLAS_BUDGET_BYTES) -> dict:
    """Shelf-pack textures (and their mip pyramids) into one atlas.

    Returns {"atlas": (AH, AW, 3) f32|f16, "info": (K, L, 4) i32 rows
    (y0, x0, h, w) per mip level — textures with fewer levels repeat
    their deepest level so level indexing never branches}. K = 0
    produces a 1x1 atlas so downstream shapes stay valid.

    The reference gets mip-mapped filtering for free from OSL texture()
    over an OIIO cache (reference src/material.cpp:127-129); here the
    pyramid lives in the same HBM atlas and the level pair is fetched in
    the one stacked gather sample_texture already does.

    dtype "f16" halves the atlas bytes AND the per-sample gather
    traffic — texels (unlike geometry) tolerate it: filtering upcasts
    to f32 and the quantization is below 8-bit-source precision. The
    reference's OIIO cache serves half-float tiles the same way.
    budget_bytes: loud capacity guard — the atlas is HBM-RESIDENT (no
    paging tier like OIIO's 16 GB disk-backed cache), so an oversized
    texture set must fail actionably at build, not OOM mid-render.
    """
    if not textures:
        return {
            "atlas": np.zeros((1, 1, 3), np.float32),
            "info": np.zeros((1, 1, 4), np.int32),
            "proc": np.zeros((1,), np.int32),
            "proc_params": np.zeros((1, 4), np.float32),
        }
    np_dtype = {"f32": np.float32, "f16": np.float16}[dtype]
    itemsize = np.dtype(np_dtype).itemsize
    pyramids = [
        build_mips(t.image) if mips else [np.asarray(t.image, np.float32)]
        for t in textures
    ]
    n_levels = max(len(p) for p in pyramids)
    flat_imgs = [img for p in pyramids for img in p]
    max_w = max(i.shape[1] for i in flat_imgs)
    atlas_w = max(256, 1 << int(np.ceil(np.log2(max_w))))
    # shelf packing over every (texture, level) image
    shelves: list = []  # (y0, height, x_cursor)
    placements = []
    atlas_h = 0
    for img in flat_imgs:
        h, w = img.shape[:2]
        placed = False
        for s in shelves:
            if s[1] >= h and s[2] + w <= atlas_w:
                placements.append((s[0], s[2], h, w))
                s[2] += w
                placed = True
                break
        if not placed:
            shelves.append([atlas_h, h, w])
            placements.append((atlas_h, 0, h, w))
            atlas_h += h
    # capacity guard on the TRUE allocation (post-placement: shelf
    # padding to atlas_w counts — a raw-texel estimate under-counts by
    # up to ~2x on wide-texture sets)
    total = atlas_h * atlas_w * 3 * itemsize
    if total > budget_bytes:
        per_tex = [
            sum(i.shape[0] * i.shape[1] for i in p) * 3 * itemsize
            for p in pyramids
        ]
        worst = sorted(
            zip(per_tex,
                (t.name or f"tex{i}" for i, t in enumerate(textures))),
            reverse=True,
        )[:8]
        lines = "\n".join(f"  {name}: {b / 1e9:.2f} GB" for b, name in worst)
        raise ValueError(
            f"texture atlas needs {total / 1e9:.2f} GB "
            f"({atlas_h}x{atlas_w} shelf-packed, {len(textures)} textures "
            f"incl. mips, dtype={dtype}) but the HBM budget is "
            f"{budget_bytes / 1e9:.2f} GB — the atlas is HBM-resident "
            "(no out-of-core paging tier). Largest sources:\n"
            f"{lines}\n"
            "Fix: downscale the sources, pack with dtype='f16' "
            "(Scene.texture_dtype), or raise budget_bytes if the scene "
            "is small."
        )
    atlas = np.zeros((atlas_h, atlas_w, 3), np_dtype)
    info = np.zeros((len(textures), n_levels, 4), np.int32)
    proc = np.zeros((len(textures),), np.int32)
    proc_params = np.zeros((len(textures), 4), np.float32)
    it = iter(zip(flat_imgs, placements))
    for i, (t, pyr) in enumerate(zip(textures, pyramids)):
        for lv in range(n_levels):
            if lv < len(pyr):
                img, (y0, x0, h, w) = next(it)
                atlas[y0 : y0 + h, x0 : x0 + w] = img
            info[i, lv] = (y0, x0, h, w)  # deeper-than-chain: repeat last
        proc[i] = t.procedural
        proc_params[i] = t.proc_params
    return {"atlas": atlas, "info": info, "proc": proc, "proc_params": proc_params}


def _pick_level(rows, lsel, n_levels):
    """Per-level row selection via static broadcast-selects over the
    (already gathered) (N, L, 4) rows — a fancy-index rows[nrows, lsel]
    is a per-LANE gather: 1.48x total textured-render cost vs 1.25x
    with selects (tools/tpu_r3i_tex.py: 396.9 -> 335.6 ms trilinear,
    267.9 ms unfiltered; the residual cost is the honest 8- vs 4-texel
    gather and lod math)."""
    out = rows[:, 0]
    for lv in range(1, n_levels):
        out = jnp.where((lsel == lv)[:, None], rows[:, lv], out)
    return out


def _sample_aniso(flat, rows, aw, n_levels, uv, fp):
    """Anisotropic filter: `taps` trilinear probes spread along the
    uv-space major-axis vector, box-averaged; the mip level comes from
    the MINOR axis so the minification direction stays sharp (the EWA
    property the reference inherits from OIIO, src/material.cpp:127-129;
    EWA's gaussian weighting is approximated by the box line average).
    ALL taps x both levels ride in ONE stacked (N, taps*8) gather."""
    minor = fp["minor"]
    major = fp["major_uv"]  # (N, 2) uv vector, full extent
    taps = int(fp.get("taps", 4))

    # gap-free line sampling: each tap's isotropic filter must cover
    # major/taps of the line, so the lod axis is max(minor, major/taps)
    # — the aspect ratio the probes can't span folds back into the lod
    # (OIIO does the same when aspect > nprobes)
    major_len = jnp.sqrt(jnp.maximum((major * major).sum(-1), 1e-20))
    minor = jnp.maximum(minor, major_len / taps)

    base = jnp.maximum(rows[:, 0, 2], rows[:, 0, 3]).astype(jnp.float32)
    lod = jnp.log2(jnp.maximum(minor, 1e-20) * base)
    lod = jnp.clip(lod, 0.0, n_levels - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n_levels - 1)
    tl = (lod - l0.astype(jnp.float32))[..., None]
    row0 = _pick_level(rows, l0, n_levels)
    row1 = _pick_level(rows, l1, n_levels)

    idxs, wts0, wts1 = [], [], []
    for k in range(taps):
        off = (k + 0.5) / taps - 0.5
        uv_k = uv + major * off
        i0, w0 = _bilinear_idx_weights(row0, uv_k, aw)
        i1, w1 = _bilinear_idx_weights(row1, uv_k, aw)
        idxs.extend([i0, i1])
        wts0.append(w0)
        wts1.append(w1)
    idx = jnp.concatenate(idxs, axis=-1)  # (N, taps*8)
    texels = flat[idx].astype(jnp.float32)  # f16 atlas upcasts post-gather
    texels = texels.reshape(idx.shape[0], taps, 2, 4, -1)
    w0 = jnp.stack(wts0, axis=1)  # (N, taps, 4)
    w1 = jnp.stack(wts1, axis=1)
    c0 = (texels[:, :, 0] * w0[..., None]).sum(axis=-2)  # (N, taps, 3)
    c1 = (texels[:, :, 1] * w1[..., None]).sum(axis=-2)
    per_tap = c0 * (1.0 - tl[:, None]) + c1 * tl[:, None]
    return per_tap.mean(axis=1)


def _bilinear_idx_weights(row, uv, aw):
    """Flat atlas indices (…, 4) + bilinear weights for one mip row."""
    y0 = row[..., 0].astype(jnp.float32)
    x0 = row[..., 1].astype(jnp.float32)
    h = row[..., 2].astype(jnp.float32)
    w = row[..., 3].astype(jnp.float32)

    u = uv[..., 0] % 1.0
    v = uv[..., 1] % 1.0
    # v flipped: uv origin bottom-left, image origin top-left
    fx = u * w - 0.5
    fy = (1.0 - v) * h - 0.5
    ix = jnp.floor(fx)
    iy = jnp.floor(fy)
    tx = fx - ix
    ty = fy - iy

    def flat_idx(ix_, iy_):
        xw = (ix_ % w) + x0
        yw = (iy_ % h) + y0
        return yw.astype(jnp.int32) * aw + xw.astype(jnp.int32)

    idx = jnp.stack(
        [
            flat_idx(ix, iy),
            flat_idx(ix + 1, iy),
            flat_idx(ix, iy + 1),
            flat_idx(ix + 1, iy + 1),
        ],
        axis=-1,
    )  # (..., 4)
    wts = jnp.stack(
        [
            (1 - tx) * (1 - ty),
            tx * (1 - ty),
            (1 - tx) * ty,
            tx * ty,
        ],
        axis=-1,
    )
    return idx, wts


def sample_texture(atlas: jnp.ndarray, info: jnp.ndarray, tex_id, uv,
                   footprint=None):
    """Bilinear (footprint=None), trilinear-mip ((N,) footprint) or
    anisotropic (dict footprint) atlas sample.

    tex_id: (N,) int32 (clamped >= 0 by caller; callers mask by
    tex_id >= 0). uv: (N, 2) in [0, inf) — repeat wrapped.
    footprint: optional (N,) uv-space sample diameter (ray-cone width x
    per-triangle uv scale); selects the mip level pair whose texel pitch
    brackets it, like OSL texture() over an OIIO cache does for the
    reference (src/material.cpp:127-129). A dict {"minor": (N,),
    "major_uv": (N,2), "taps": int} instead requests anisotropic
    filtering: `taps` trilinear probes at lod(minor) spread along the
    uv-space major-axis vector, box-averaged — the TPU stand-in for
    OIIO's EWA (all probes ride in ONE stacked gather; cost is taps/2 x
    the trilinear texel bytes but still a single launch). Returns (N,3).

    All texels of both levels ride in ONE stacked gather — on the axon
    TPU platform every gather is a separate kernel launch and launches
    dominate the textured pipeline (tools/tpu_r2_probe.py: 22.4 vs
    36.9 Mrays/s with the 4-gather form; trilinear costs one 8-wide
    gather, not two 4-wide ones).
    """
    if info.ndim == 2:  # legacy single-level table
        info = info[:, None]
    aw = atlas.shape[1]
    flat = atlas.reshape(-1, atlas.shape[-1])
    rows = info[jnp.maximum(tex_id, 0)]  # (N, L, 4)
    n_levels = info.shape[1]

    if isinstance(footprint, dict) and n_levels > 1:
        return _sample_aniso(flat, rows, aw, n_levels, uv, footprint)
    if isinstance(footprint, dict):
        footprint = footprint["minor"]

    if footprint is None or n_levels == 1:
        idx, wts = _bilinear_idx_weights(rows[:, 0], uv, aw)
        texels = flat[idx].astype(jnp.float32)  # (..., 4, 3)
        return (texels * wts[..., None]).sum(axis=-2)

    # level from footprint: texel pitch at level l is 2^l / base_size
    base = jnp.maximum(
        rows[:, 0, 2], rows[:, 0, 3]
    ).astype(jnp.float32)  # level-0 resolution
    lod = jnp.log2(jnp.maximum(footprint, 1e-20) * base)
    lod = jnp.clip(lod, 0.0, n_levels - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n_levels - 1)
    tl = (lod - l0.astype(jnp.float32))[..., None]

    idx0, w0 = _bilinear_idx_weights(_pick_level(rows, l0, n_levels), uv, aw)
    idx1, w1 = _bilinear_idx_weights(_pick_level(rows, l1, n_levels), uv, aw)
    idx = jnp.concatenate([idx0, idx1], axis=-1)  # (..., 8)
    texels = flat[idx].astype(jnp.float32)  # ONE stacked gather, both levels
    c0 = (texels[..., :4, :] * w0[..., None]).sum(axis=-2)
    c1 = (texels[..., 4:, :] * w1[..., None]).sum(axis=-2)
    return c0 * (1.0 - tl) + c1 * tl


def direction_to_latlong_uv(d: jnp.ndarray) -> jnp.ndarray:
    """Equirectangular mapping for environment lookups (y-up)."""
    phi = jnp.arctan2(d[..., 2], d[..., 0])  # [-pi, pi]
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))  # [0, pi]
    u = (phi / (2.0 * jnp.pi)) + 0.5
    v = 1.0 - theta / jnp.pi
    return jnp.stack([u, v], axis=-1)


# --- procedural evaluation (reference src/shaders/*noise*.osl) ----------

def _hash01(ix, iy, seed):
    """Lattice hash -> [0,1) float, PCG-style (math/rng.pcg4d family)."""
    x = ix.astype(jnp.uint32) * jnp.uint32(1664525) + jnp.uint32(1013904223)
    y = iy.astype(jnp.uint32) * jnp.uint32(22695477) + jnp.uint32(seed)
    h = (x ^ (y << 7)) * jnp.uint32(0x9E3779B9)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    mant = (h & jnp.uint32(0x007FFFFF)) | jnp.uint32(0x3F800000)
    import jax

    return jax.lax.bitcast_convert_type(mant, jnp.float32) - 1.0


def value_noise(uv: jnp.ndarray, scale, seed: int = 1) -> jnp.ndarray:
    """Bilinear value noise in [0,1), (N,) from (N,2) uv."""
    q = uv * scale
    i = jnp.floor(q)
    f = q - i
    f = f * f * (3.0 - 2.0 * f)  # smoothstep
    ix = i[..., 0].astype(jnp.int32)
    iy = i[..., 1].astype(jnp.int32)
    a = _hash01(ix, iy, seed)
    b = _hash01(ix + 1, iy, seed)
    c = _hash01(ix, iy + 1, seed)
    d = _hash01(ix + 1, iy + 1, seed)
    top = a * (1 - f[..., 0]) + b * f[..., 0]
    bot = c * (1 - f[..., 0]) + d * f[..., 0]
    return top * (1 - f[..., 1]) + bot * f[..., 1]


def musgrave_noise(uv: jnp.ndarray, scale, octaves: int, lacunarity, gain):
    """Fractal (fBm) value noise, fixed octave unroll."""
    out = jnp.zeros(uv.shape[:-1], jnp.float32)
    amp = 1.0
    freq = scale
    norm = 0.0
    for o in range(int(octaves)):
        out = out + amp * value_noise(uv, freq, seed=11 + o)
        norm += amp
        amp = amp * gain
        freq = freq * lacunarity
    return out / jnp.maximum(norm, 1e-9)


def sample_texture_any(tex_tables: dict, tex_id, uv, footprint=None):
    """Image-or-procedural texture sample. tex_tables holds atlas/info/
    proc/proc_params (jnp). Returns (N, 3). Callers gate on the scene's
    static has_procedural flag so image-only scenes never build the
    noise graph. (Procedurals are evaluated analytically and not
    band-limited; footprint only filters image textures.)"""
    img = sample_texture(tex_tables["atlas"], tex_tables["info"], tex_id, uv,
                         footprint=footprint)
    proc = tex_tables["proc"][jnp.maximum(tex_id, 0)]
    pp = tex_tables["proc_params"][jnp.maximum(tex_id, 0)]
    rnd = value_noise(uv, pp[..., 0:1])
    mus = musgrave_noise(uv, pp[..., 0:1], 4, 2.0, 0.5)
    out = jnp.where((proc == PROC_RANDOM)[..., None], rnd[..., None], img)
    out = jnp.where((proc == PROC_MUSGRAVE)[..., None], mus[..., None], out)
    return out
