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


@dataclasses.dataclass
class Texture:
    """Host-side image, float32 (H, W, 3) scene-linear."""

    image: np.ndarray
    name: str = ""

    def __post_init__(self):
        img = np.asarray(self.image, np.float32)
        if img.ndim == 2:
            img = img[..., None].repeat(3, axis=-1)
        if img.shape[-1] == 4:
            img = img[..., :3]
        self.image = np.ascontiguousarray(img)


def checkerboard(n=8, size=64, a=(1.0, 1.0, 1.0), b=(0.0, 0.0, 0.0)) -> Texture:
    y, x = np.mgrid[0:size, 0:size]
    cells = ((x * n // size) + (y * n // size)) % 2
    img = np.where(cells[..., None] == 0, np.asarray(a), np.asarray(b))
    return Texture(img.astype(np.float32), name="checker")


def pack_textures(textures: list) -> dict:
    """Shelf-pack textures into one atlas.

    Returns {"atlas": (AH, AW, 3) f32, "info": (K, 4) i32 rows
    (y0, x0, h, w)}. K = 0 produces a 1x1 atlas so downstream shapes
    stay valid.
    """
    if not textures:
        return {
            "atlas": np.zeros((1, 1, 3), np.float32),
            "info": np.zeros((1, 4), np.int32),
        }
    max_w = max(t.image.shape[1] for t in textures)
    atlas_w = max(256, 1 << int(np.ceil(np.log2(max_w))))
    # shelf packing
    shelves: list = []  # (y0, height, x_cursor)
    placements = []
    atlas_h = 0
    for t in textures:
        h, w = t.image.shape[:2]
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
    atlas = np.zeros((atlas_h, atlas_w, 3), np.float32)
    info = np.zeros((len(textures), 4), np.int32)
    for i, (t, (y0, x0, h, w)) in enumerate(zip(textures, placements)):
        atlas[y0 : y0 + h, x0 : x0 + w] = t.image
        info[i] = (y0, x0, h, w)
    return {"atlas": atlas, "info": info}


def sample_texture(atlas: jnp.ndarray, info: jnp.ndarray, tex_id, uv):
    """Bilinear atlas sample.

    tex_id: (N,) int32 (clamped >= 0 by caller; callers mask by
    tex_id >= 0). uv: (N, 2) in [0, inf) — repeat wrapped.
    Returns (N, 3).
    """
    row = info[jnp.maximum(tex_id, 0)]
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

    def texel(ix_, iy_):
        xw = (ix_ % w) + x0
        yw = (iy_ % h) + y0
        return atlas[yw.astype(jnp.int32), xw.astype(jnp.int32)]

    c00 = texel(ix, iy)
    c10 = texel(ix + 1, iy)
    c01 = texel(ix, iy + 1)
    c11 = texel(ix + 1, iy + 1)
    top = c00 * (1 - tx)[..., None] + c10 * tx[..., None]
    bot = c01 * (1 - tx)[..., None] + c11 * tx[..., None]
    return top * (1 - ty)[..., None] + bot * ty[..., None]


def direction_to_latlong_uv(d: jnp.ndarray) -> jnp.ndarray:
    """Equirectangular mapping for environment lookups (y-up)."""
    phi = jnp.arctan2(d[..., 2], d[..., 0])  # [-pi, pi]
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))  # [0, pi]
    u = (phi / (2.0 * jnp.pi)) + 0.5
    v = 1.0 - theta / jnp.pi
    return jnp.stack([u, v], axis=-1)
