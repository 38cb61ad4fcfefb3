"""Pixel-exact repair of the config-4 frame after the pallas_front
precision fix (round 5).

The broken kernel produced deterministic wrong hits on ~600 isolated
pixels (black dashes). Because every sample is COUNTER-based
(pixel, sample index) -> the same RNG stream regardless of wavefront
membership, re-rendering exactly those pixels with the FIXED kernel at
the full 512 spp / depth 5 / strata 23 configuration reproduces
bit-for-bit the samples a clean full re-render would produce for them
(sums differ only in pass-grouping fp reassociation). The spliced frame
is therefore the fixed-code render everywhere it differs visibly; a
full-frame re-render was not spent (~70 min of chip) because unaffected
pixels' front tables select identical clusters either way.

Usage:
  python tools/bmw_c4_repair.py detect   # writes /tmp/c4_bad_px.npz
  python tools/bmw_c4_repair.py render   # TPU render of bad pixels
  python tools/bmw_c4_repair.py splice   # rewrite EXR + PNG
"""
from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

OUT = os.path.join(REPO, "examples", "renders")
EXR = os.path.join(OUT, "bmw_config4.exr")
PNG = os.path.join(OUT, "bmw_config4.png")
SPP, DEPTH, RES, STRATA = 512, 5, 1024, 23


def detect():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from PIL import Image

    from phosphorus_mk2_tpu.io.exr import read_exr

    ch = read_exr(EXR)
    img = np.stack([ch["R"], ch["G"], ch["B"]], -1)
    # reference: the last known-good (round-3-era) frame. ANY pixel
    # deviating visibly is a repair candidate — wrong-hit pixels were
    # both darkened (interior hits) and occasionally brightened
    # (slivers in front of glass); over-repair is harmless because the
    # repaired value IS the fixed renderer's value (same RNG counters).
    # 512-spp MC noise sits far below the 0.1-linear threshold; glint
    # re-rolls above it just get re-rendered to their current value.
    import subprocess

    base = subprocess.run(
        ["git", "-C", REPO, "log", "--format=%H",
         "--diff-filter=M", "-2", "--", "examples/renders/bmw_config4.png"],
        capture_output=True, text=True,
    ).stdout.split()[-1]
    # `base` = the modifying commit BEFORE the refresh: its version of
    # the file is the known-good frame itself
    old = subprocess.run(
        ["git", "-C", REPO, "show", f"{base}:examples/renders/bmw_config4.png"],
        capture_output=True,
    ).stdout
    import io

    old_img = np.asarray(Image.open(io.BytesIO(old)), np.float32) / 255.0
    old_lin = old_img ** 2.2
    bad = np.abs(np.minimum(img, 1.0) - old_lin).max(axis=-1) > 0.1
    # dilate 1px: dash borders are partially wrong too
    b = bad.copy()
    b[1:] |= bad[:-1]; b[:-1] |= bad[1:]
    b[:, 1:] |= bad[:, :-1]; b[:, :-1] |= bad[:, 1:]
    ys, xs = np.where(b)
    print(f"repairing {len(ys)} pixels ({bad.sum()} cores + dilation)")
    np.savez("/tmp/c4_bad_px.npz", px=xs.astype(np.int32),
             py=ys.astype(np.int32))


def render():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import bmw_asset
    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.core.camera import camera_to_params
    from phosphorus_mk2_tpu.integrator.path import (
        make_tracer,
        render_pass_pixels,
    )

    bp = np.load("/tmp/c4_bad_px.npz")
    n_real = bp["px"].shape[0]
    # pad the wavefront to a power of two: an 11094-ray (ragged) front
    # crashed the TPU worker twice (kernel fault) where 1<<N-class
    # sizes run fine — pad with pixel 0 and slice after
    n_pad = 1 << max(1, (n_real - 1).bit_length())
    px = jnp.asarray(np.pad(bp["px"], (0, n_pad - n_real), mode="edge"))
    py = jnp.asarray(np.pad(bp["py"], (0, n_pad - n_real), mode="edge"))
    scene = bmw_asset.load_scene("/tmp/bmw_class.abc", RES, RES)
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=True)
    key = jax.random.key(0)  # config4 Options.seed
    # pass-chunked like the production Renderer (the flaky axon worker
    # dies mid-execution on a single 512-sample program; 64-sample
    # executions match the pass granularity that survives). Counter-
    # based RNG: sums are identical up to pass-grouping reassociation.
    import functools

    fn = jax.jit(functools.partial(
        render_pass_pixels, max_depth=DEPTH, tracer=tracer,
        film_strata=STRATA), static_argnames=("n_samples",))
    out = None
    for off in range(0, SPP, 64):
        part = fn(data, cam, key, off, 64, px, py)
        part = jax.block_until_ready(part)
        out = part if out is None else jax.tree_util.tree_map(
            lambda a, b: a + b, out, part)
        print("  pass", off + 64, "/", SPP, flush=True)
    np.savez(
        "/tmp/c4_repair_px.npz",
        color=np.asarray(out["color"])[:n_real] / SPP,
        normal=np.asarray(out["normal"])[:n_real] / SPP,
        alpha=np.asarray(out["alpha"])[:n_real] / SPP,
    )
    print("rendered", n_real, "pixels at", SPP, "spp",
          f"(padded wavefront {n_pad})")


def splice():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from phosphorus_mk2_tpu.io.exr import read_exr, write_exr, write_png

    bp = np.load("/tmp/c4_bad_px.npz")
    rp = np.load("/tmp/c4_repair_px.npz")
    ch = read_exr(EXR)
    xs, ys = bp["px"], bp["py"]
    for i, c in enumerate("RGB"):
        ch[c][ys, xs] = rp["color"][:, i]
    for i, c in enumerate(("normal.X", "normal.Y", "normal.Z")):
        if c in ch:
            ch[c][ys, xs] = rp["normal"][:, i]
    if "A" in ch:
        ch["A"][ys, xs] = rp["alpha"]
    write_exr(EXR, ch, compression="zip", pixel_type="half")
    img = np.stack([ch["R"], ch["G"], ch["B"]], -1)
    write_png(PNG, img)
    still = (img[ys, xs].max(axis=-1) < 0.02).sum()
    print(f"spliced {len(xs)} pixels; still-black after repair: {still}")


if __name__ == "__main__":
    {"detect": detect, "render": render, "splice": splice}[sys.argv[1]]()
