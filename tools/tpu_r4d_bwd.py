"""Round-4 TPU batch D: backward-pass decomposition + first BMW fwd+bwd.

Cornell fwd+bwd has been flat at ~27.5 Mrays/s for three rounds; the
round-2 diagnosis was "scatter-add-launch-bound" and nothing has tested
it since. The jaxpr census (this round) shows ~45 gathers + 9 scatters
per sample-iteration in the value_and_grad graph — at the 0.4 ms launch
floor that alone explains the 75 ms step. Decompose and attack:

  1. grad cost by param group (emission / +lobe_weight / +vertices):
     which chain carries the launches?
  2. sample batching: spp_batch=4/16 merges the per-sample backward
     scatters into one per site (launch /4 or /16) at the cost of a
     4x/16x-taller wavefront. (spp_batch measured a LOSS on forward —
     re-test for the backward where the economics differ.)
  3. remat on the best variant (fewer stored intermediates, more
     recompute — the r2 test predates the consolidated tables).
  4. bench.bmw_live() + bench.bmw_fwd_bwd(): verifies the new bench
     code on-chip and produces the FIRST north-star number at BMW
     scale (round-3 verdict item 2).

    python tools/tpu_r4d_bwd.py 2>&1 | tee /tmp/tpu_r4d.log
"""
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.core.camera import camera_to_params
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
from phosphorus_mk2_tpu.scenes import cornell_box

W = H = 256
SPP = 16
DEPTH = 4


def timed(f, *a, reps=3):
    out = jax.block_until_ready(f(*a))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(f(*a))
        best = min(best, time.time() - t0)
    return best, out


def J(**kw):
    print(json.dumps(kw), flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    scene = cornell_box(width=W, height=H)
    data = scene.build()
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    key = jax.random.key(0)
    rays = W * H * SPP * DEPTH * 2

    def make_grad(param_names, spp_batch=1, sample_unroll=4, remat=False):
        kw = dict(width=W, height=H, max_depth=DEPTH, tracer=tracer,
                  depth_unroll=DEPTH, sample_unroll=sample_unroll,
                  spp_batch=spp_batch, remat=remat)

        def loss(params, data, key):
            d2 = dataclasses.replace(data, **params)
            return render_pass(d2, cam, key, 0, SPP, **kw)["color"].sum()

        params = {k: getattr(data, k) for k in param_names}
        return jax.jit(jax.grad(loss)), params

    ALL = ("emission", "lobe_weight", "vertices")
    # --- 1. param-group decomposition at the bench config --------------
    for names in (("emission",), ("emission", "lobe_weight"), ALL):
        g, params = make_grad(names)
        try:
            b, out = timed(g, params, data, key)
            J(grad_params=list(names), ms=round(b * 1e3, 1),
              mrays=round(rays / b / 1e6, 1))
        except Exception as e:  # noqa: BLE001
            J(grad_params=list(names), error=repr(e)[:200])

    # --- 2/3. sample batching + remat ---------------------------------
    for tag, kw2 in (("spp_batch4", dict(spp_batch=4, sample_unroll=1)),
                     ("spp_batch16", dict(spp_batch=16, sample_unroll=1)),
                     ("spp_batch4_remat", dict(spp_batch=4, sample_unroll=1,
                                               remat=True))):
        g, params = make_grad(ALL, **kw2)
        try:
            b, out = timed(g, params, data, key)
            J(variant=tag, ms=round(b * 1e3, 1),
              mrays=round(rays / b / 1e6, 1))
        except Exception as e:  # noqa: BLE001
            J(variant=tag, error=repr(e)[:200])

    # forward-only with the best batching, for the fwd/bwd split
    fwd = jax.jit(functools.partial(
        render_pass, width=W, height=H, max_depth=DEPTH, tracer=tracer,
        depth_unroll=DEPTH, spp_batch=4), static_argnames=("n_samples",))
    b, _ = timed(lambda: fwd(data, cam, key, 0, SPP))
    J(variant="fwd_only_spp_batch4", ms=round(b * 1e3, 1),
      mrays=round(rays / b / 1e6, 1))

    # --- 4. BMW-scale live lines (verifies the new bench code) --------
    import bench
    try:
        J(**bench.bmw_live())
    except Exception as e:  # noqa: BLE001
        J(metric="bmw_live", error=repr(e)[:300])
    try:
        J(**bench.bmw_fwd_bwd())
    except Exception as e:  # noqa: BLE001
        J(metric="bmw_fwd_bwd", error=repr(e)[:300])


if __name__ == "__main__":
    main()
