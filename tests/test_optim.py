"""Inverse rendering: recover emission from a target image."""
import numpy as np

from phosphorus_mk2_tpu.core.options import Options
from phosphorus_mk2_tpu.integrator.path import render_aovs
from phosphorus_mk2_tpu.optim import InverseRenderer
from phosphorus_mk2_tpu.scenes import sphere_in_box


def test_recover_emission():
    res = 12
    scene = sphere_in_box(width=res, height=res)
    data = scene.build()
    target = np.asarray(
        render_aovs(
            data,
            scene.camera,
            spp=4,
            max_depth=2,
            options=Options(use_bvh=False, samples_per_pass=4),
        )["color"]
    )

    # perturb the lamp emission (material id 3) and recover it
    true_e = np.asarray(data.emission)[3].copy()
    perturbed = sphere_in_box(width=res, height=res)
    perturbed.materials[3].emission = tuple(float(x) * 0.3 for x in true_e)

    inv = InverseRenderer(
        perturbed,
        target,
        trainable=("emission",),
        learning_rate=0.5,
        spp=2,
        max_depth=2,
        use_bvh=False,
        seed=1,
        fresh_rng=False,  # deterministic convergence for the test
    )
    losses = inv.run(60)
    # converges to the MC-noise floor between the 2-spp render and the
    # 4-spp target; emission recovery is the real acceptance criterion
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    recovered = np.asarray(inv.params["emission"])[3]
    np.testing.assert_allclose(recovered, true_e, rtol=0.2)
