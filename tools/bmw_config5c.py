"""Config-5 finish run: drive lamp-emission rel err below 0.1.

Round-3 end state (tools/bmw_config5b.py): with log-space emission +
the double-sample unbiased loss, 800 steps reached lamp rel err 0.204
(R 1%, G/B 15-21%), body 0.0118, loss still descending. The residual
G/B error is an identifiability/SNR problem at spp 8 with a 16-spp
target, not a bias (the unbiased loss removed the mechanism that
rewarded dim lamps; see bmw_c5_probe.py).

This runner attacks the SNR directly:
  - per-step spp 16 (two independent 8-spp halves) — 2x cleaner grads;
  - target rendered at 64 spp — 4x less target noise in the
    E[(img1-t)(img2-t)] loss;
  - a slower-decaying schedule (the c5b schedule had decayed to
    lr~0.009 by step 800, which throttled the G/B channels).

The loop is TIME-budgeted (--budget seconds, default 2100): it stops
at the deadline, saves the optimizer checkpoint, and prints the final
JSON line, so a hard wall-clock cap still yields a committed result.
Resume with --resume to continue from /tmp/bmw_c5c_opt.npz.

    python tools/bmw_config5c.py [--budget 2100] [--resume]
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
    budget = float(args[args.index("--budget") + 1]) if "--budget" in args else 2100.0
    max_steps = int(args[args.index("--steps") + 1]) if "--steps" in args else 1200
    res, spp, depth = 192, 8, 3
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
    tgt_spp = 64
    out = fn(data, cam, jax.random.key(7), 0, tgt_spp)
    target = np.asarray(out["color"]).reshape(res, res, 3) / tgt_spp
    print(f"[c5c] target render ({tgt_spp} spp) {time.time()-t0:.1f} s",
          flush=True)

    body_mid = scene._material_ids["body"]
    lamp_mid = scene._material_ids["lamp"]
    true_body_w = np.array(scene.materials[body_mid].lobes[0].weight)
    true_lamp_e = np.array(scene.materials[lamp_mid].emission)
    scene.materials[body_mid].lobes[0].weight = (0.35, 0.35, 0.35)
    scene.materials[lamp_mid].emission = tuple(0.3 * e for e in true_lamp_e)

    # c5b's schedule was lr~0.009 by step 800 — too small for the
    # still-descending G/B channels. Keep the step useful longer.
    sched = optax.exponential_decay(0.10, transition_steps=250,
                                    decay_rate=0.55)
    inv = InverseRenderer(
        scene, target, trainable=("emission", "lobe_weight"),
        spp=2 * spp, max_depth=depth, use_bvh=True, seed=11,
        optimizer=optax.adam(sched), log_emission=True,
        unbiased_loss=True,
    )

    ck = "/tmp/bmw_c5c_opt.npz"
    if "--resume" in args and os.path.exists(ck):
        inv.load_checkpoint(ck)
        print(f"[c5c] resumed at step {inv._step_count}", flush=True)

    t0 = time.time()
    losses = []

    def report(tag):
        rec = inv.current_scene()
        lamp = np.asarray(rec.emission)[lamp_mid]
        body = np.asarray(rec.lobe_weight)[body_mid, 0]
        rel = np.abs(lamp - true_lamp_e) / true_lamp_e.max()
        print(f"[c5c] {tag}: lamp={np.round(lamp, 3)} "
              f"rel_err={np.round(rel, 4)} body={np.round(body, 3)}",
              flush=True)
        return rel, body

    while len(losses) < max_steps:
        losses += inv.run(25)
        elapsed = time.time() - t0
        rel, _ = report(f"step {inv._step_count} ({elapsed:.0f} s, "
                        f"{elapsed/len(losses):.2f} s/step)")
        inv.save_checkpoint(ck)
        if elapsed > budget:
            print(f"[c5c] budget reached ({elapsed:.0f} s)", flush=True)
            break
        if rel.max() < 0.05:
            print("[c5c] converged below 0.05", flush=True)
            break

    rec = inv.current_scene()
    rec_body = np.asarray(rec.lobe_weight)[body_mid, 0]
    rec_lamp = np.asarray(rec.emission)[lamp_mid]
    print(f"[c5c] body weight: true {tuple(true_body_w)} recovered {rec_body}",
          flush=True)
    print(f"[c5c] lamp emission: true {tuple(true_lamp_e)} recovered {rec_lamp}",
          flush=True)
    import dataclasses

    img_after = np.asarray(
        fn(dataclasses.replace(data, emission=rec.emission,
                               lobe_weight=rec.lobe_weight),
           cam, jax.random.key(7), 0, tgt_spp)["color"]
    ).reshape(res, res, 3) / tgt_spp
    save_png(os.path.join(OUT_DIR, "bmw_inverse_after.png"), img_after)
    print(json.dumps({
        "config": "5c", "steps": inv._step_count,
        "loss_first": round(float(losses[0]), 6),
        "loss_last": round(float(np.mean(losses[-25:])), 6),
        "body_err": round(float(np.abs(rec_body - true_body_w).max()), 4),
        "lamp_err_rel": round(float(
            np.abs(rec_lamp - true_lamp_e).max() / true_lamp_e.max()
        ), 4),
        "lamp_err_rel_per_channel": [
            round(float(x), 4)
            for x in np.abs(rec_lamp - true_lamp_e) / true_lamp_e.max()
        ],
    }), flush=True)


if __name__ == "__main__":
    main()
