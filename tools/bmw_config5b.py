"""Config-5 convergence rerun on the BMW-class asset.

Round-3 finding (tools/bmw_c5_probe.py): the lamp under-recovery was
NOT a gradient-SNR/step-size problem — the single-render MSE's
expectation contains Var(img), which shrinks with dimmer lights, so
the loss at the TRUE parameters (1.48) exceeds the loss at a darkened
scene (1.03) and stochastic optimization converges dim. This runner
uses log-space emission + the double-sample unbiased loss
(optim.InverseRenderer log_emission/unbiased_loss) with scheduled
Adam; saves/resumes the optimizer checkpoint (--resume).

Measured trajectory: lamp rel err 0.61 (raw loss, r2) -> 0.204 at 800
steps, body 0.0118, loss still descending.

    python tools/bmw_config5b.py [--steps 400] [--resume]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    args = sys.argv[1:]
    steps = int(args[args.index("--steps") + 1]) if "--steps" in args else 200
    res, spp, depth = 192, 4, 3
    abc = "/tmp/bmw_class.abc"

    import functools

    import jax
    import optax

    import bmw_asset
    from bmw_configs import save_png, OUT_DIR
    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.core.camera import camera_to_params
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
    from phosphorus_mk2_tpu.optim import InverseRenderer

    if not os.path.exists(abc):
        bmw_asset.write_asset(abc, scale=1.0)
    scene = bmw_asset.load_scene(abc, res, res)
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=True)
    fn = jax.jit(
        functools.partial(render_pass, width=res, height=res, max_depth=depth,
                          tracer=tracer, depth_unroll=depth),
        static_argnames=("n_samples",),
    )
    t0 = time.time()
    tgt_spp = 16
    out = fn(data, cam, jax.random.key(7), 0, tgt_spp)
    target = np.asarray(out["color"]).reshape(res, res, 3) / tgt_spp
    print(f"[c5b] target render {time.time()-t0:.1f} s", flush=True)

    body_mid = scene._material_ids["body"]
    lamp_mid = scene._material_ids["lamp"]
    true_body_w = tuple(scene.materials[body_mid].lobes[0].weight)
    true_lamp_e = tuple(scene.materials[lamp_mid].emission)
    scene.materials[body_mid].lobes[0].weight = (0.35, 0.35, 0.35)
    scene.materials[lamp_mid].emission = tuple(0.3 * e for e in true_lamp_e)

    # log-space emission (emission = exp(theta)): the raw-space runs
    # plateaued at 40-61% lamp error — absolute Adam steps cannot serve
    # a ~9-unit emission gap and a ~0.3 albedo gap at once. In log space
    # the emission step is RELATIVE; one modest shared schedule fits
    # both fields (r3: per-field raw lrs made body WORSE, lamp 0.40).
    sched = optax.exponential_decay(0.12, transition_steps=160,
                                    decay_rate=0.6)
    # unbiased_loss: the single-render MSE's parameter-dependent variance
    # term REWARDS dim lamps (measured: loss at the true params 1.48 vs
    # 1.03 at the dim recovered point, tools/bmw_c5_probe.py) — the
    # double-sample loss cancels it
    inv = InverseRenderer(
        scene, target, trainable=("emission", "lobe_weight"),
        spp=2 * spp, max_depth=depth, use_bvh=True, seed=3,
        optimizer=optax.adam(sched), log_emission=True,
        unbiased_loss=True,
    )

    ck = "/tmp/bmw_c5b_opt.npz"
    if "--resume" in args and os.path.exists(ck):
        inv.load_checkpoint(ck)
        print(f"[c5b] resumed at step {inv._step_count}", flush=True)

    t0 = time.time()
    losses = []
    for chunk in range(0, steps, 25):
        losses += inv.run(min(25, steps - chunk), log_every=25)
        rec = inv.current_scene()
        lamp = np.asarray(rec.emission)[lamp_mid]
        body = np.asarray(rec.lobe_weight)[body_mid, 0]
        print(f"[c5b] step {len(losses)}: lamp={np.round(lamp, 3)} "
              f"body={np.round(body, 3)}", flush=True)
    dt = time.time() - t0
    print(f"[c5b] {steps} steps in {dt:.1f} s ({dt/steps:.2f} s/step)",
          flush=True)
    inv.save_checkpoint(ck)

    rec = inv.current_scene()
    rec_body = np.asarray(rec.lobe_weight)[body_mid, 0]
    rec_lamp = np.asarray(rec.emission)[lamp_mid]
    print(f"[c5b] body weight: true {true_body_w} recovered {rec_body}",
          flush=True)
    print(f"[c5b] lamp emission: true {true_lamp_e} recovered {rec_lamp}",
          flush=True)
    import dataclasses

    img_after = np.asarray(
        fn(dataclasses.replace(data, emission=rec.emission,
                               lobe_weight=rec.lobe_weight),
           cam, jax.random.key(7), 0, tgt_spp)["color"]
    ).reshape(res, res, 3) / tgt_spp
    save_png(os.path.join(OUT_DIR, "bmw_inverse_after.png"), img_after)
    print(json.dumps({
        "config": "5b", "steps": steps,
        "loss_first": round(float(losses[0]), 6),
        "loss_last": round(float(losses[-1]), 6),
        "body_err": round(float(np.abs(rec_body - np.array(true_body_w)).max()), 4),
        "lamp_err_rel": round(float(
            np.abs(rec_lamp - np.array(true_lamp_e)).max() / max(true_lamp_e)
        ), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
