"""MIS demo render: glossy reflection of a small light.

A tight GGX highlight of a small light is the classic high-variance
case for NEE-only estimators (the light subtends a tiny solid angle
inside a sharp lobe): at equal spp the parity-mode image speckles while
--mis resolves it via the BSDF-sampling strategy with balance weights.

Writes examples/mis_off.png and examples/mis_on.png.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from phosphorus_mk2_tpu.core.camera import Camera
from phosphorus_mk2_tpu.core.material import Material
from phosphorus_mk2_tpu.core.options import Options
from phosphorus_mk2_tpu.core.scene import Scene
from phosphorus_mk2_tpu.integrator.path import render
from phosphorus_mk2_tpu.scenes.builders import make_quad

W = H = 256
SPP = 64


def build():
    scene = Scene()
    floor = scene.add_material(Material.glossy((0.9, 0.9, 0.9), roughness=0.08, name="floor"))
    back = scene.add_material(Material.diffuse((0.2, 0.2, 0.25), name="back"))
    emit = scene.add_material(Material.emitter((1.0, 0.9, 0.7), power=60.0, name="lamp"))
    scene.add_mesh(
        make_quad([-6, 0, 6], [6, 0, 6], [6, 0, -6], [-6, 0, -6], floor, "floor")
    )
    scene.add_mesh(
        make_quad([-6, 0, -6], [6, 0, -6], [6, 5, -6], [-6, 5, -6], back, "back")
    )
    # small light placed so its floor reflection lands mid-frame
    s = 0.3
    scene.add_mesh(
        make_quad([-s, 2.5, -5 - s], [s, 2.5, -5 - s], [s, 2.5, -5 + s],
                  [-s, 2.5, -5 + s], emit, "lamp")
    )
    scene.camera = Camera.look_at(
        position=(0.0, 1.2, 3.2),
        target=(0.0, 0.5, 0.0),
        up=(0.0, 1.0, 0.0),
        width=W,
        height=H,
    )
    return scene


def tonemap(img):
    return (np.clip(img, 0, 1) ** (1 / 2.2) * 255).astype(np.uint8)


def main():
    from PIL import Image

    scene = build()
    data = scene.build()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
    for mis in (False, True):
        opts = Options(use_bvh=False, samples_per_pass=16, mis=mis)
        img = np.asarray(render(data, scene.camera, spp=SPP, max_depth=4, options=opts))
        name = "mis_on.png" if mis else "mis_off.png"
        Image.fromarray(tonemap(img)).save(os.path.join(out_dir, name))
        print(name, "mean", img.mean(), flush=True)


if __name__ == "__main__":
    main()
