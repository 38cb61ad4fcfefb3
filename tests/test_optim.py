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
        # fresh paths per step: unbiased stochastic gradients (a FIXED
        # sample set yields a biased optimum e* = e_true * E[ab]/E[a^2])
        fresh_rng=True,
    )
    losses = inv.run(80)
    # stochastic loss: compare a late-window average to the start
    assert np.mean(losses[-10:]) < losses[0] * 0.6, losses[::10]
    recovered = np.asarray(inv.params["emission"])[3]
    np.testing.assert_allclose(recovered, true_e, rtol=0.25)


def test_log_emission_recovers_scale():
    """log-space emission parametrization: a 10x-dimmed emitter recovers
    in few steps where raw-space Adam crawls (relative vs absolute
    steps) — the BMW config-5 lamp-recovery fix."""
    import numpy as np

    from phosphorus_mk2_tpu.core.options import Options
    from phosphorus_mk2_tpu.integrator.path import render_aovs
    from phosphorus_mk2_tpu.optim import InverseRenderer
    from phosphorus_mk2_tpu.scenes import sphere_in_box

    scene = sphere_in_box(width=12, height=12)
    data = scene.build()
    target = np.asarray(render_aovs(
        data, scene.camera, spp=8, max_depth=2,
        options=Options(use_bvh=False, samples_per_pass=8))["color"])
    true_e = np.asarray(data.emission).copy()
    lamp_rows = np.abs(true_e).sum(axis=1) > 0

    for m in scene.materials:
        if m.is_emitter:
            m.emission = tuple(0.1 * e for e in m.emission)

    inv = InverseRenderer(
        scene, target, trainable=("emission",), learning_rate=0.25,
        spp=4, max_depth=2, use_bvh=False, seed=2, log_emission=True,
        fresh_rng=False,
    )
    losses = inv.run(30)
    assert losses[-1] < losses[0]
    rec = np.asarray(inv.current_scene().emission)
    rel = np.abs(rec[lamp_rows] - true_e[lamp_rows]) / true_e[lamp_rows].max()
    # 10x scale gap closed to <25% in 30 noisy steps (raw space moves
    # ~0.25*30 = 7.5 absolute at best vs the ~e_true*0.9 gap per channel)
    assert rel.max() < 0.25, rel


def test_unbiased_loss_removes_variance_dimming():
    """Single-render MSE contains Var(img), which shrinks with dimmer
    lights — stochastic optimization converges DARK (the BMW config-5
    lamp failure, tools/bmw_c5_probe.py). The double-sample loss cancels
    the parameter-dependent variance term."""
    import numpy as np

    from phosphorus_mk2_tpu.core.options import Options
    from phosphorus_mk2_tpu.integrator.path import render_aovs
    from phosphorus_mk2_tpu.optim import InverseRenderer
    from phosphorus_mk2_tpu.scenes import sphere_in_box

    def make():
        return sphere_in_box(width=12, height=12)

    s0 = make()
    data = s0.build()
    target = np.asarray(render_aovs(
        data, s0.camera, spp=32, max_depth=2,
        options=Options(use_bvh=False, samples_per_pass=8))["color"])
    true_e = np.asarray(data.emission).copy()
    rows = np.abs(true_e).sum(1) > 0

    ratios = {}
    for unb in (False, True):
        s = make()
        for m in s.materials:
            if m.is_emitter:
                m.emission = tuple(0.4 * e for e in m.emission)
        inv = InverseRenderer(
            s, target, trainable=("emission",), learning_rate=0.15,
            spp=2, max_depth=2, use_bvh=False, seed=5,
            log_emission=True, unbiased_loss=unb,
        )
        inv.run(40)
        rec = np.asarray(inv.current_scene().emission)
        ratios[unb] = float((rec[rows] / true_e[rows]).mean())
    # the biased run must land dimmer than the unbiased one
    assert ratios[True] > ratios[False] + 0.05, ratios


def test_multi_view_round_robin():
    """views=[(cam, target), ...] round-robins under ONE jit (stacked
    camera leaves indexed by a traced view id) and still recovers
    parameters — the BMW config-5 G/B identifiability fix."""
    import dataclasses

    import numpy as np

    from phosphorus_mk2_tpu.core.options import Options
    from phosphorus_mk2_tpu.integrator.path import render_aovs
    from phosphorus_mk2_tpu.optim import InverseRenderer
    from phosphorus_mk2_tpu.scenes import sphere_in_box

    res = 12
    scene = sphere_in_box(width=res, height=res)
    data = scene.build()

    cam0 = scene.camera
    tw = np.array(cam0.to_world, np.float32).copy()
    tw[3, 0] += 0.35  # second view: slide the eye sideways
    cam1 = dataclasses.replace(cam0, to_world=tw)
    views = []
    for cam in (cam0, cam1):
        img = np.asarray(render_aovs(
            data, cam, spp=4, max_depth=2,
            options=Options(use_bvh=False, samples_per_pass=4))["color"])
        views.append((cam, img))
    # the two targets must actually differ (distinct viewpoints)
    assert np.abs(views[0][1] - views[1][1]).max() > 1e-3

    true_e = np.asarray(data.emission)[3].copy()
    perturbed = sphere_in_box(width=res, height=res)
    perturbed.materials[3].emission = tuple(float(x) * 0.3 for x in true_e)
    inv = InverseRenderer(
        perturbed, None, trainable=("emission",), learning_rate=0.5,
        spp=2, max_depth=2, use_bvh=False, seed=1, views=views,
    )
    assert inv._n_views == 2
    losses = inv.run(80)
    assert np.mean(losses[-10:]) < losses[0] * 0.6, losses[::10]
    recovered = np.asarray(inv.params["emission"])[3]
    np.testing.assert_allclose(recovered, true_e, rtol=0.3)


def test_multi_view_resolution_mismatch_rejected():
    import dataclasses

    import numpy as np
    import pytest

    from phosphorus_mk2_tpu.optim import InverseRenderer
    from phosphorus_mk2_tpu.scenes import sphere_in_box

    scene = sphere_in_box(width=12, height=12)
    bad_cam = dataclasses.replace(scene.camera, width=8, height=8)
    img = np.zeros((12, 12, 3), np.float32)
    with pytest.raises(ValueError, match="resolution"):
        InverseRenderer(
            scene, None, trainable=("emission",), spp=2, max_depth=2,
            use_bvh=False,
            views=[(scene.camera, img), (bad_cam, np.zeros((8, 8, 3)))],
        )
