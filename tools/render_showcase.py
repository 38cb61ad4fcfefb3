"""Render the builtin benchmark scenes to examples/renders/ (PNG + EXR).

Run on TPU (default) or CPU (--cpu). Produces the visual evidence set
for the three procedural BASELINE configs.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from phosphorus_mk2_tpu.core.options import Options
    from phosphorus_mk2_tpu.io.exr import write_film, write_png
    from phosphorus_mk2_tpu.renderer import Renderer
    from phosphorus_mk2_tpu.scenes import (
        cornell_box,
        multi_bsdf_scene,
        sphere_in_box,
    )

    out_dir = os.path.join(os.path.dirname(__file__), "..", "examples", "renders")
    os.makedirs(out_dir, exist_ok=True)

    # resolutions/spp match (or exceed) the BASELINE.json config specs:
    # config-1 sphere 128^2/16spp, config-2 cornell 256^2/64spp,
    # config-3 multi-BSDF 512^2/256spp
    configs = [
        ("sphere_in_box", sphere_in_box(width=256, height=256), 64, 4),
        ("cornell_box", cornell_box(width=256, height=256), 64, 6),
        ("multi_bsdf", multi_bsdf_scene(width=512, height=512), 256, 8),
    ]
    if "--config3-only" in sys.argv:
        configs = configs[2:]
    for name, scene, spp, depth in configs:
        opts = Options(
            samples_per_pixel=spp,
            samples_per_pass=16,
            path_depth=depth,
            use_bvh=scene.build().num_tris > 1024,
        )
        t0 = time.time()
        film = Renderer(scene, opts).render()
        dt = time.time() - t0
        png = os.path.join(out_dir, f"{name}.png")
        exr = os.path.join(out_dir, f"{name}.exr")
        write_png(png, film["color"])
        write_film(exr, film)
        mean = float(np.asarray(film["color"]).mean())
        print(f"{name}: {dt:.1f}s, mean={mean:.3f} -> {png}", flush=True)


if __name__ == "__main__":
    main()
