"""Round-2 TPU batch I: BMW pipeline after dead-lane tmax masking.

  1. Cornell bench guard (fwd + fwd/bwd must hold 63 / 27.6 Mrays/s)
  2. BMW 512^2 spp4 depth4 render_pass steady-state (excl compile),
     the apples-to-apples number for the dead-lane masking change
  3. CLI-equivalent steady state: second Renderer.render() call
     (VERDICT #2's fair in-process measure)

    python tools/tpu_r2i.py 2>&1 | tee /tmp/tpu_r2i.log
"""
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

import bmw_asset
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.core.camera import camera_to_params
from phosphorus_mk2_tpu.core.options import Options
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
from phosphorus_mk2_tpu.renderer import Renderer
from phosphorus_mk2_tpu.scenes import cornell_box

ABC = "/tmp/bmw_class.abc"


def timed(f, *a, reps=3):
    t0 = time.time()
    out = jax.block_until_ready(f(*a))
    t_c = time.time() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(f(*a))
        best = min(best, time.time() - t0)
    return best, t_c, out


def cornell_guard():
    W = H = 256
    SPP, DEPTH = 16, 4
    rays = W * H * SPP * DEPTH * 2
    scene = cornell_box(width=W, height=H)
    data = scene.build()
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    kw = dict(width=W, height=H, max_depth=DEPTH, tracer=tracer,
              depth_unroll=DEPTH, sample_unroll=4)
    fwd = jax.jit(functools.partial(render_pass, **kw),
                  static_argnames=("n_samples",))
    key = jax.random.key(0)
    b, tc, out = timed(lambda: fwd(data, cam, key, SPP, SPP))
    print(f"[cornell fwd ] {rays / b / 1e6:8.2f} Mrays/s ({b*1e3:.1f} ms, "
          f"compile {tc:.0f} s) mean={float(np.asarray(out['color']).mean())/SPP:.4f}",
          flush=True)

    def loss(params, data, key, n):
        d2 = dataclasses.replace(data, **params)
        return render_pass(d2, cam, key, 0, n, **kw)["color"].sum()

    grad = jax.jit(jax.grad(loss), static_argnames=("n",))
    params = {"emission": data.emission, "lobe_weight": data.lobe_weight,
              "vertices": data.vertices}
    b, tc, _ = timed(lambda: grad(params, data, key, SPP))
    print(f"[cornell f+b ] {rays / b / 1e6:8.2f} Mrays/s ({b*1e3:.1f} ms, "
          f"compile {tc:.0f} s)", flush=True)


def bmw_pass():
    RES, SPP, DEPTH = 512, 4, 4
    scene = bmw_asset.load_scene(ABC, RES, RES)
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=True)
    n = RES * RES  # 262144 rays/pass; auto bound is 131k -> use direct pass
    fn = jax.jit(
        functools.partial(render_pass, width=RES, height=RES,
                          max_depth=DEPTH, tracer=tracer, depth_unroll=1),
        static_argnames=("n_samples",),
    )
    key = jax.random.key(0)
    b, tc, out = timed(lambda: fn(data, cam, key, 0, SPP), reps=2)
    rays = RES * RES * SPP * DEPTH * 2
    print(f"[bmw pass    ] {rays / b / 1e6:8.2f} Mrays/s steady "
          f"({b:.2f} s, compile {tc:.0f} s) "
          f"mean={float(np.asarray(out['color']).mean())/SPP:.4f}", flush=True)


def bmw_renderer_steady():
    RES, SPP, DEPTH = 512, 8, 4
    scene = bmw_asset.load_scene(ABC, RES, RES)
    opts = Options(samples_per_pixel=SPP, samples_per_pass=4,
                   path_depth=DEPTH, use_bvh=True, depth_unroll=1,
                   sample_unroll=1)
    r = Renderer(scene, opts)
    t0 = time.time()
    film = r.render()
    t_first = time.time() - t0
    t0 = time.time()
    film = r.render()
    t_second = time.time() - t0
    rays = RES * RES * SPP * DEPTH * 2
    img = np.asarray(film["color"])
    print(f"[bmw renderer] first {t_first:.1f} s (incl compile), steady "
          f"{t_second:.1f} s = {rays / t_second / 1e6:.2f} Mrays/s "
          f"finite={bool(np.isfinite(img).all())} mean={img.mean():.4f}",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    if not os.path.exists(ABC):
        bmw_asset.write_asset(ABC, scale=1.0)
    cornell_guard()
    bmw_pass()
    bmw_renderer_steady()


if __name__ == "__main__":
    main()
