"""Round-3 TPU batch D: transpose-free MT layout + fixed pallas front.

Batch C verdicts already baked in: rows_bf16 dropped (481 ms — the
in-MT upcast eats the bandwidth win), winner-id map switched to
row-gather + one-hot (flat element gather measured 26.8 ms).

    python tools/tpu_r3d_fused.py 2>&1 | tee /tmp/tpu_r3d.log
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
    cam = camera_to_params(scene.camera)
    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % 512, (ids // 512) % 512
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)
    t_lim = jnp.full((N,), T_MAX)

    combos = [
        {},                               # new layout baseline
        {"sc_topk": "pallas"},
        {"front_k": 32},
        {"front_k": 32, "sc_topk": "pallas"},
        {"front_k": 32, "sc_topk": "pallas", "expand_batch": 16},
    ]
    for tune in combos:
        fn = jax.jit(lambda p, d, tune=tune:
                     ct.intersect_clusters(data, p, d, **tune))
        try:
            b, out = timed(fn, p, d)
        except Exception as e:
            J(trace=str(tune), error=repr(e)[:200])
            continue
        J(trace=str(tune), ms=round(b * 1e3, 1),
          mrays=round(N / b / 1e6, 2),
          hits=int(np.asarray(out["hit"]).sum()))

    # stage: pallas front table alone + full front
    bvh = data.bvh
    kk = min(ct.MAX_FRONT, bvh["cluster_bmin"].shape[0])

    def front(p, d, sc_topk):
        return ct._front_table_hierarchical(p, d, bvh, t_lim, kk,
                                            sc_topk=sc_topk)

    for mode in ("extract", "pallas"):
        b, _ = timed(jax.jit(functools.partial(front, sc_topk=mode)), p, d)
        J(stage=f"front_{mode}", ms=round(b * 1e3, 1))

    from phosphorus_mk2_tpu.accel.pallas_front import slab_extract_pallas
    bounds6 = jnp.concatenate([bvh["sc_bmin"], bvh["sc_bmax"]], axis=1)
    fsp = jax.jit(lambda p, d: slab_extract_pallas(bounds6, p, d, t_lim, jj=16))
    b, _ = timed(fsp, p, d)
    J(stage="pallas_slab_extract_only", ms=round(b * 1e3, 1))

    # dense8 with the new layout (was 132 ms with the transpose)
    rows_tbl = jax.jit(lambda: ct._cluster_rows(data))()
    ftbl = jax.jit(lambda p, d: front(p, d, "extract"))
    _, (ttbl, ctbl, hor) = timed(ftbl, p, d)

    def dense8(p, d, ttbl, ctbl):
        CH, W0 = 16384, 8
        best = (t_lim, jnp.full((N,), -1, jnp.int32),
                jnp.zeros((N,), jnp.int32), jnp.zeros((N,)), jnp.zeros((N,)))

        def chunk_fn(ci, best):
            start = ci * CH
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start, CH)
            c = jax.lax.dynamic_slice(ctbl, (start, 0), (CH, W0))
            tn_c = jax.lax.dynamic_slice(ttbl, (start, 0), (CH, W0))
            cur = tuple(sl(x) for x in best)
            live = tn_c < T_MAX
            rows = rows_tbl[jnp.where(live, c, 0)]  # (CH, W0, 9, C)
            C = rows.shape[-1]
            live_el = jnp.broadcast_to(live[:, :, None], (CH, W0, C))
            new = ct._mt_rows(sl(p), sl(d), rows, cur, live_el, cand_cids=c)
            return tuple(
                jax.lax.dynamic_update_slice_in_dim(f, v, start, 0)
                for f, v in zip(best, new))

        return jax.lax.fori_loop(0, N // CH, chunk_fn, best)

    b, _ = timed(jax.jit(dense8), p, d, ttbl, ctbl)
    J(stage="dense8_noT_16k_chunks", ms=round(b * 1e3, 1))

    # render with best trace combo
    RES, SPP, DEPTH = 512, 4, 4
    rays = RES * RES * SPP * DEPTH * 2
    for name, tune, kw in [
        ("render_layout_base", None, {}),
        ("render_pallas_fk32", {"front_k": 32, "sc_topk": "pallas"}, {}),
        ("render_pallas_fk32_sppb2",
         {"front_k": 32, "sc_topk": "pallas"}, {"spp_batch": 2}),
    ]:
        tracer = make_tracer(data, use_bvh=True, tracer_tune=tune)
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
