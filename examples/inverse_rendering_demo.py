"""Inverse-rendering demo: recover lamp emission + wall albedo from a
target render (BASELINE.json config 5 on the procedural stand-in scene).

    python examples/inverse_rendering_demo.py [--cpu]

Writes before/target/after PNGs next to this script.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from phosphorus_mk2_tpu.core.options import Options
    from phosphorus_mk2_tpu.integrator.path import render_aovs
    from phosphorus_mk2_tpu.io.exr import write_png
    from phosphorus_mk2_tpu.optim import InverseRenderer
    from phosphorus_mk2_tpu.scenes import sphere_in_box

    here = os.path.dirname(os.path.abspath(__file__))
    res = 64

    # ground-truth scene -> target image
    truth = sphere_in_box(width=res, height=res)
    target = np.asarray(
        render_aovs(
            truth.build(),
            truth.camera,
            spp=32,
            max_depth=3,
            options=Options(use_bvh=False, samples_per_pass=16),
        )["color"]
    )
    write_png(os.path.join(here, "inverse_target.png"), target)

    # perturbed initial guess: dim lamp, wrong wall color
    guess = sphere_in_box(width=res, height=res)
    guess.materials[3].emission = tuple(
        0.25 * e for e in guess.materials[3].emission
    )
    guess.materials[0].lobes[0].weight = (0.3, 0.5, 0.3)

    before = np.asarray(
        render_aovs(
            guess.build(),
            guess.camera,
            spp=32,
            max_depth=3,
            options=Options(use_bvh=False, samples_per_pass=16),
        )["color"]
    )
    write_png(os.path.join(here, "inverse_before.png"), before)

    inv = InverseRenderer(
        guess,
        target,
        trainable=("emission", "lobe_weight"),
        learning_rate=0.2,
        spp=4,
        max_depth=3,
        use_bvh=False,
        seed=3,
    )
    losses = inv.run(150, log_every=25)

    after = np.asarray(
        render_aovs(
            inv.current_scene(),
            guess.camera,
            spp=32,
            max_depth=3,
            options=Options(use_bvh=False, samples_per_pass=16),
        )["color"]
    )
    write_png(os.path.join(here, "inverse_after.png"), after)

    true_e = np.asarray(truth.build().emission)[3]
    got_e = np.asarray(inv.params["emission"])[3]
    true_w = np.asarray(truth.build().lobe_weight)[0, 0]
    got_w = np.asarray(inv.params["lobe_weight"])[0, 0]
    print(f"loss: {losses[0]:.4f} -> {np.mean(losses[-10:]):.4f}")
    print(f"emission: true={true_e.round(2)} recovered={got_e.round(2)}")
    print(f"albedo:   true={true_w.round(3)} recovered={got_w.round(3)}")


if __name__ == "__main__":
    main()
