"""Config-5 identifiability probe: is the lamp emission constrained by
the loss at this sampling level, or has the optimizer converged to the
MC noise floor of a flat basin?

Evaluates the config-5 loss (spp-4 render vs the spp-16 target, fresh
keys) at three parameter points: the TRUE scene, the perturbed START,
and the RECOVERED point from the log-space run. If loss(true) is
indistinguishable from loss(recovered), the residual lamp error is an
identifiability problem (compensating solutions at the noise floor),
not an optimization failure.

    python tools/bmw_c5_probe.py 2>&1 | tee /tmp/bmw_c5_probe.log
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    res, spp, depth = 192, 4, 3
    abc = "/tmp/bmw_class.abc"

    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    import bmw_asset
    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.core.camera import camera_to_params
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass

    scene = bmw_asset.load_scene(abc, res, res)
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=True)
    fn = jax.jit(
        functools.partial(render_pass, width=res, height=res,
                          max_depth=depth, tracer=tracer,
                          depth_unroll=depth),
        static_argnames=("n_samples",),
    )
    tgt_spp = 16
    target = np.asarray(
        fn(data, cam, jax.random.key(7), 0, tgt_spp)["color"]
    ).reshape(res, res, 3) / tgt_spp
    target = jnp.asarray(target.reshape(-1, 3))

    body_mid = scene._material_ids["body"]
    lamp_mid = scene._material_ids["lamp"]
    true_e = np.asarray(data.emission)
    true_w = np.asarray(data.lobe_weight)

    # recovered point from the r3 log-space run (/tmp/bmw_c5b_r3b.log)
    rec_e = true_e.copy()
    rec_e[lamp_mid] = [2.0815485, 0.8337458, 0.88287157]
    rec_w = true_w.copy()
    rec_w[body_mid, 0] = [0.5687406, 0.11154225, 0.08722901]

    start_e = true_e.copy()
    start_e[lamp_mid] = 0.3 * true_e[lamp_mid]
    start_w = true_w.copy()
    start_w[body_mid, 0] = [0.35, 0.35, 0.35]

    @jax.jit
    def loss(emission, lobe_weight, key):
        sd = dataclasses.replace(data, emission=emission,
                                 lobe_weight=lobe_weight)
        out = fn(sd, cam, key, 0, spp)
        img = out["color"] / spp
        err = img - target
        return jnp.mean(jnp.sum(err * err, axis=-1)) * 3.0 / 3.0

    points = {
        "true": (jnp.asarray(true_e), jnp.asarray(true_w)),
        "start": (jnp.asarray(start_e), jnp.asarray(start_w)),
        "recovered_r3b": (jnp.asarray(rec_e), jnp.asarray(rec_w)),
    }
    out = {}
    for name, (e, w) in points.items():
        vals = [float(loss(e, w, jax.random.key(100 + k))) for k in range(6)]
        out[name] = {"mean": round(float(np.mean(vals)), 5),
                     "std": round(float(np.std(vals)), 5)}
        print(json.dumps({name: out[name]}), flush=True)

    sep = (out["recovered_r3b"]["mean"] - out["true"]["mean"]) / max(
        out["true"]["std"], 1e-9)
    print(json.dumps({"recovered_minus_true_in_sigmas": round(sep, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
