"""Round-3 TPU batch E: recover batch D's crashed measurements + wave
loop diagnostics.

    python tools/tpu_r3e_waves.py 2>&1 | tee /tmp/tpu_r3e.log
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

    # ---- front-table stage timings (lost in batch D's crash) ----------
    for mode in ("extract", "pallas"):
        kk = min(ct.MAX_FRONT, bvh["cluster_bmin"].shape[0])
        fn = jax.jit(lambda p, d, mode=mode:
                     ct._front_table_hierarchical(p, d, bvh, t_lim, kk,
                                                  sc_topk=mode))
        try:
            b, _ = timed(fn, p, d)
            J(stage=f"front_{mode}", ms=round(b * 1e3, 1))
        except Exception as e:
            J(stage=f"front_{mode}", error=repr(e)[:200])

    # expand stage alone, batched vs scan
    from phosphorus_mk2_tpu.accel.pallas_front import slab_extract_pallas
    bounds6 = jnp.concatenate([bvh["sc_bmin"], bvh["sc_bmax"]], axis=1)

    def sel(p, d):
        return slab_extract_pallas(bounds6, p, d, t_lim, jj=16)

    try:
        b, _ = timed(jax.jit(sel), p, d)
        J(stage="pallas_slab_extract_only", ms=round(b * 1e3, 1))
    except Exception as e:
        J(stage="pallas_slab_extract_only", error=repr(e)[:200])

    for eb in (1, 16):
        def exp(p, d, eb=eb):
            sc_ttbl, sctbl = ct._select_topk(
                jnp.where(
                    ct._slab_all(p, d, bvh["sc_bmin"], bvh["sc_bmax"])[0],
                    ct._slab_all(p, d, bvh["sc_bmin"], bvh["sc_bmax"])[1],
                    T_MAX),
                16, mode="extract")
            return ct._expand_members(
                p, d, bvh["sc_member_bmin"], bvh["sc_member_bmax"],
                sctbl, sc_ttbl, t_lim, expand_batch=eb)[0]
        b, _ = timed(jax.jit(exp), p, d)
        J(stage=f"select+expand_eb{eb}", ms=round(b * 1e3, 1))

    # ---- wave-loop diagnostics ----------------------------------------
    # dense head phase (transpose-free): does batching head waves win now?
    for tune in ({"front_k": 32, "dense_waves": 6},
                 {"front_k": 32, "dense_waves": 6, "dense_chunk": 32768},
                 {"front_k": 32, "chunk": 4096},
                 {"front_k": 32, "sc_topk": "pallas"}):
        fn = jax.jit(lambda p, d, tune=tune:
                     ct.intersect_clusters(data, p, d, **tune))
        try:
            b, out = timed(fn, p, d)
            J(trace=str(tune), ms=round(b * 1e3, 1),
              hits=int(np.asarray(out["hit"]).sum()))
        except Exception as e:
            J(trace=str(tune), error=repr(e)[:250])

    # fallback share at front_k=32
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

    # ---- renders -------------------------------------------------------
    RES, SPP, DEPTH = 512, 4, 4
    rays = RES * RES * SPP * DEPTH * 2
    for name, tune, kw in [
        ("render_fk32", {"front_k": 32}, {}),
        ("render_fk32_sppb2", {"front_k": 32}, {"spp_batch": 2}),
        ("render_fk32_dw6", {"front_k": 32, "dense_waves": 6}, {}),
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
