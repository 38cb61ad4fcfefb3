"""TPU probe: forward+backward (gradient) throughput on the bench scene.

BASELINE.md north star is rays/sec/chip forward + backward; this times
one value_and_grad step of a pixel loss w.r.t. emission, lobe weights
and vertices on the Cornell 256^2 config.

    python tools/tpu_bwd.py
"""
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.core.camera import camera_to_params
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
from phosphorus_mk2_tpu.scenes import cornell_box

W = H = 256
SPP = 4
DEPTH = 4


def main():
    print("devices:", jax.devices())
    scene = cornell_box(width=W, height=H)
    data = scene.build()
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    key = jax.random.key(0)

    target = jnp.zeros((W * H, 3), jnp.float32)

    params = {
        "emission": data.emission,
        "lobe_weight": data.lobe_weight,
        "vertices": data.vertices,
    }
    rays = W * H * SPP * DEPTH * 2
    for remat in (False, True):
        def loss_fn(params, scene_data, remat=remat):
            sd = dataclasses.replace(scene_data, **params)
            out = render_pass(
                sd, cam, key, 0, SPP,
                width=W, height=H, max_depth=DEPTH, tracer=tracer,
                depth_unroll=DEPTH, remat=remat,
            )
            return jnp.mean((out["color"] / SPP - target) ** 2)

        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        t0 = time.time()
        loss, grads = grad_fn(params, data)
        jax.block_until_ready(grads)
        print(f"remat={remat}: compile+run {time.time()-t0:.1f}s, "
              f"loss {float(loss):.5f}", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            loss, grads = grad_fn(params, data)
            jax.block_until_ready(grads)
            best = min(best, time.time() - t0)
        print(
            f"remat={remat}: fwd+bwd {best*1e3:.1f} ms for {SPP} spp depth "
            f"{DEPTH} -> {rays/best/1e6:.2f} Mrays/s (fwd+bwd)", flush=True
        )
        for k, g in grads.items():
            g = np.asarray(g)
            assert np.isfinite(g).all(), k
            print(f"  grad[{k}]: |g|max {np.abs(g).max():.3e}")


if __name__ == "__main__":
    main()
