"""Round-3 TPU batch B: fine stage split of the best config (treelet +
extract) and the remaining levers.

Questions this answers (each costs one remote compile):
  1. front-table split: slab / +select / +expand / full front — how much
     is launch floor (op count) vs traffic?
  2. wave-loop share at front_k 16/32/64 and chunk 8k/32k
  3. dense all-waves microbench: ONE fat gather of the head-8 columns
     per 16k chunk + MT — the launch-amortized wave-loop alternative
  4. render-level levers on the 512^2 spp4 d4 BMW render: best-config
     baseline, pipeline_shadow, spp_batch=2

    python tools/tpu_r3b_split.py 2>&1 | tee /tmp/tpu_r3b.log
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


def main():
    print(f"devices: {jax.devices()}", flush=True)
    scene = bmw_asset.load_scene(ABC, 512, 512)
    data = attach_bvh(scene.build())  # treelet default
    bvh = data.bvh
    K = bvh["cluster_bmin"].shape[0]
    cam = camera_to_params(scene.camera)
    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % 512, (ids // 512) % 512
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)
    t_lim = jnp.full((N,), T_MAX)
    kk = min(ct.MAX_FRONT, K)

    def J(**kw):
        print(json.dumps(kw), flush=True)

    # ---- 1. front-table fine split (treelet, L2, extract) ------------
    def stage_slab(p, d):
        return ct._slab_all(p, d, bvh["sc_bmin"], bvh["sc_bmax"])

    def stage_select(p, d):
        sc_hit, sc_tn = ct._slab_all(p, d, bvh["sc_bmin"], bvh["sc_bmax"])
        jj = min(ct.SC_FRONT, sc_tn.shape[1])
        sc_m = jnp.where(sc_hit & (sc_tn < t_lim[:, None]), sc_tn, T_MAX)
        return ct._select_topk(sc_m, jj, mode="extract")

    def stage_expand(p, d):
        sc_ttbl, sctbl = stage_select(p, d)
        return ct._expand_members(
            p, d, bvh["sc_member_bmin"], bvh["sc_member_bmax"],
            sctbl, sc_ttbl, t_lim)[0]

    def stage_front(p, d):
        return ct._front_table_hierarchical(p, d, bvh, t_lim, kk,
                                            sc_topk="extract")

    for name, fn in [("slab", stage_slab), ("slab+select", stage_select),
                     ("+expand", stage_expand), ("front_full", stage_front)]:
        b, _ = timed(jax.jit(fn), p, d)
        J(stage=name, ms=round(b * 1e3, 1))

    # ---- 2. full trace at front_k / chunk variants --------------------
    for tune in ({}, {"front_k": 32}, {"front_k": 16},
                 {"chunk": 32768}, {"chunk": 16384, "front_k": 32}):
        fn = jax.jit(lambda p, d, tune=tune:
                     ct.intersect_clusters(data, p, d, **tune))
        b, out = timed(fn, p, d)
        J(trace=str(tune), ms=round(b * 1e3, 1),
          mrays=round(N / b / 1e6, 2),
          hits=int(np.asarray(out["hit"]).sum()))

    # ---- 3. dense all-waves microbench --------------------------------
    rows_tbl = jax.jit(lambda: ct._cluster_rows(data))()
    ftbl = jax.jit(lambda p, d: stage_front(p, d))
    _, (ttbl, ctbl, hor) = timed(ftbl, p, d)

    def dense8(p, d, ttbl, ctbl):
        CH, W0 = 16384, 8
        best = (t_lim, jnp.full((N,), -1, jnp.int32),
                jnp.zeros((N,)), jnp.zeros((N,)))

        def chunk_fn(ci, best):
            start = ci * CH
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start, CH)
            c = jax.lax.dynamic_slice(ctbl, (start, 0), (CH, W0))
            tn_c = jax.lax.dynamic_slice(ttbl, (start, 0), (CH, W0))
            cur = tuple(sl(x) for x in best)
            live = tn_c < T_MAX
            rows = rows_tbl[jnp.where(live, c, 0)]
            C = rows.shape[-1]
            rows = rows.transpose(0, 2, 1, 3).reshape(CH, 10, W0 * C)
            live_el = jnp.broadcast_to(
                live[:, :, None], (CH, W0, C)).reshape(CH, W0 * C)
            new = ct._mt_rows(sl(p), sl(d), rows, cur, live_el)
            return tuple(
                jax.lax.dynamic_update_slice_in_dim(f, v, start, 0)
                for f, v in zip(best, new))

        return jax.lax.fori_loop(0, N // CH, chunk_fn, best)

    b, _ = timed(jax.jit(dense8), p, d, ttbl, ctbl)
    J(stage="dense8_waves_16k_chunks", ms=round(b * 1e3, 1))

    # ---- 4. render-level levers on 512^2 spp4 d4 ----------------------
    RES, SPP, DEPTH = 512, 4, 4
    tracer = make_tracer(data, use_bvh=True)
    rays = RES * RES * SPP * DEPTH * 2
    for name, kw in [
        ("render_base", {}),
        ("render_pipeline_shadow", {"pipeline_shadow": True}),
        ("render_spp_batch2", {"spp_batch": 2}),
    ]:
        fn = jax.jit(functools.partial(
            render_pass, width=RES, height=RES, max_depth=DEPTH,
            tracer=tracer, depth_unroll=1, **kw),
            static_argnames=("n_samples",))
        try:
            b, out = timed(lambda: fn(data, cam, jax.random.key(0), 0, SPP))
        except Exception as e:
            J(render=name, error=repr(e)[:200])
            continue
        mean = float(np.asarray(out["color"]).mean()) / SPP
        J(render=name, ms=round(b * 1e3, 1),
          mrays=round(rays / b / 1e6, 3), mean=round(mean, 5))


if __name__ == "__main__":
    main()
