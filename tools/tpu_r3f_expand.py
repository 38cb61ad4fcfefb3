"""Round-3 TPU batch F: expand-stage levers + wave diagnostics + render.
(Batches D/E each died when a pallas standalone run poisoned the device;
pallas is skipped here — it measured neutral inside the front jit.)

    python tools/tpu_r3f_expand.py 2>&1 | tee /tmp/tpu_r3f.log
"""
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

import bmw_asset
from phosphorus_mk2_tpu.accel import cluster_traverse as ct
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.accel.intersect import T_MAX
from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass

N = 1 << 17
ABC = "/tmp/bmw_class.abc"


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
    scene = bmw_asset.load_scene(ABC, 512, 512)
    data = attach_bvh(scene.build())
    bvh = data.bvh
    cam = camera_to_params(scene.camera)
    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % 512, (ids // 512) % 512
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)
    t_lim = jnp.full((N,), T_MAX)

    # front with merged-gather expand, eb 1 vs 16, fk 64 vs 32
    for fk in (64, 32):
        for eb in (1, 16):
            kk = min(fk, bvh["cluster_bmin"].shape[0])
            fn = jax.jit(lambda p, d, kk=kk, eb=eb:
                         ct._front_table_hierarchical(
                             p, d, bvh, t_lim, kk, expand_batch=eb))
            b, _ = timed(fn, p, d)
            J(stage=f"front_fk{fk}_eb{eb}_merged", ms=round(b * 1e3, 1))

    # full traces
    for tune in ({"front_k": 32},
                 {"front_k": 32, "expand_batch": 16},
                 {"front_k": 32, "dense_waves": 6},
                 {"front_k": 32, "dense_waves": 6, "expand_batch": 16},
                 {"front_k": 32, "chunk": 4096}):
        fn = jax.jit(lambda p, d, tune=tune:
                     ct.intersect_clusters(data, p, d, **tune))
        try:
            b, out = timed(fn, p, d)
            J(trace=str(tune), ms=round(b * 1e3, 1),
              hits=int(np.asarray(out["hit"]).sum()))
        except Exception as e:
            J(trace=str(tune), error=repr(e)[:250])

    # fallback share at fk32
    real_cond = jax.lax.cond

    def no_fb(pred, tf, ff, arg):
        return ff(arg)

    jax.lax.cond = no_fb
    try:
        fn = jax.jit(lambda p, d: ct.intersect_clusters(data, p, d, front_k=32))
        b, _ = timed(fn, p, d)
        J(trace="fk32_no_fallback", ms=round(b * 1e3, 1))
    finally:
        jax.lax.cond = real_cond

    # renders
    RES, SPP, DEPTH = 512, 4, 4
    rays = RES * RES * SPP * DEPTH * 2
    for name, tune, kw in [
        ("render_fk32", {"front_k": 32}, {}),
        ("render_fk32_eb16", {"front_k": 32, "expand_batch": 16}, {}),
        ("render_fk32_sppb2", {"front_k": 32}, {"spp_batch": 2}),
    ]:
        tracer = make_tracer(data, use_bvh=True, tracer_tune=tune)
        fn = jax.jit(functools.partial(
            render_pass, width=RES, height=RES, max_depth=DEPTH,
            tracer=tracer, depth_unroll=1, **kw),
            static_argnames=("n_samples",))
        try:
            b, out = timed(lambda: fn(data, cam, jax.random.key(0), 0, SPP))
            mean = float(np.asarray(out["color"]).mean()) / SPP
            J(render=name, ms=round(b * 1e3, 1),
              mrays=round(rays / b / 1e6, 3), mean=round(mean, 5))
        except Exception as e:
            J(render=name, error=repr(e)[:250])


if __name__ == "__main__":
    main()
