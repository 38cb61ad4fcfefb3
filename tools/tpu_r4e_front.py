"""Round-4 TPU batch E: front-table decomposition + trace levers +
grad full-unroll, at the NEW defaults (front_k 32, chunk 2048,
recompact 8 — tools/tpu_r4c_waveloop.py).

The r4c/r4d split: BMW trace 167.7 ms best = front table ~77 ms + wave
loop ~90 ms. The wave loop is byte-bound (synthetic: 93 GB/s); the
front table is now the bigger half and has never been decomposed.
Stages (levels=2): slab over (N, K2) superclusters -> extract top-16 ->
expand member bounds (16-step scan of (N, 1, 16, 6) gathers) ->
select top-32 of 256 candidates (packed row sort).

Also: the Cornell fwd+bwd graph is launch-bound with backward fusing
worse than forward (jaxpr census r4d); test the one untried lever —
full sample unroll (no scan, no carry spills).

    python tools/tpu_r4e_front.py 2>&1 | tee /tmp/tpu_r4e.log
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

import bmw_asset
from phosphorus_mk2_tpu.accel import cluster_traverse as ct
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays

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
    if not os.path.exists(ABC):
        bmw_asset.write_asset(ABC, scale=1.0)
    scene = bmw_asset.load_scene(ABC, 512, 512)
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % 512, (ids // 512) % 512
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)
    bvh = data.bvh
    kk = 32
    jj = min(ct.SC_FRONT, bvh["sc_bmin"].shape[0])

    # --- A. front-table stage decomposition ---------------------------
    def stage(upto, expand_batch=1, sel_mode="sort"):
        def f(p, d):
            tl = jnp.full((N,), ct.T_MAX)
            sc_hit, sc_tn = ct._slab_all(p, d, bvh["sc_bmin"], bvh["sc_bmax"])
            sc_m = jnp.where(sc_hit & (sc_tn < tl[:, None]), sc_tn, ct.T_MAX)
            if upto == "slab":
                return sc_m.sum()
            sc_ttbl, sctbl = ct._select_topk(sc_m, jj, mode="extract")
            if upto == "extract":
                return sc_ttbl.sum()
            cand_t, sc_pad = ct._expand_members(
                p, d, bvh["sc_member_bmin"], bvh["sc_member_bmax"],
                sctbl, sc_ttbl, tl, expand_batch=expand_batch)
            if upto == "expand":
                return cand_t.sum()
            ttbl, col = ct._select_topk(cand_t, kk, mode=sel_mode)
            return ttbl.sum()
        return jax.jit(f)

    for name, kwargs in (("slab", {}), ("extract", {}), ("expand", {}),
                         ("expand_b16", dict(expand_batch=16)),
                         ("full_sort", {"upto": "full"}),
                         ("full_b16", dict(expand_batch=16)),
                         ("full_extract", dict(sel_mode="extract")),
                         ):
        upto = kwargs.pop("upto", name.split("_")[0])
        if name.startswith("full"):
            upto = "full"
        try:
            b, _ = timed(stage(upto, **kwargs), p, d)
            J(front_stage=name, ms=round(b * 1e3, 1))
        except Exception as e:  # noqa: BLE001
            J(front_stage=name, error=repr(e)[:200])

    # --- B. full-trace levers at the new defaults ---------------------
    base = None
    for tune in ({},                      # new defaults
                 {"slab_bf16": True},
                 {"expand_batch": 16},
                 {"front_levels": 3},
                 ):
        fn = jax.jit(lambda p, d, tune=tune:
                     ct.intersect_clusters(data, p, d, **tune))
        try:
            b, out = timed(fn, p, d)
            hits = int(np.asarray(out["hit"]).sum())
            tri_sum = int(np.asarray(out["tri"]).sum())
            if base is None:
                base = (hits, tri_sum)
            J(trace=str(tune) or "defaults", ms=round(b * 1e3, 1),
              mrays=round(N / b / 1e6, 2), hits=hits,
              winners_match=(hits, tri_sum) == base)
        except Exception as e:  # noqa: BLE001
            J(trace=str(tune), error=repr(e)[:200])

    # --- C. Cornell grad full sample unroll ---------------------------
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
    from phosphorus_mk2_tpu.scenes import cornell_box

    W = H = 256
    SPP, DEPTH = 16, 4
    cscene = cornell_box(width=W, height=H)
    cdata = cscene.build()
    ccam = camera_to_params(cscene.camera)
    ctracer = make_tracer(cdata, use_bvh=False)
    key = jax.random.key(0)
    rays = W * H * SPP * DEPTH * 2
    params = {"emission": cdata.emission, "lobe_weight": cdata.lobe_weight,
              "vertices": cdata.vertices}
    for su in (8, 16):
        def loss(params, data, key, su=su):
            d2 = dataclasses.replace(data, **params)
            return render_pass(
                d2, ccam, key, 0, SPP, width=W, height=H, max_depth=DEPTH,
                tracer=ctracer, depth_unroll=DEPTH, sample_unroll=su,
            )["color"].sum()
        g = jax.jit(jax.grad(loss))
        try:
            t0 = time.time()
            out = jax.block_until_ready(g(params, cdata, key))
            compile_s = time.time() - t0
            b, _ = timed(g, params, cdata, key)
            J(cornell_grad_unroll=su, ms=round(b * 1e3, 1),
              mrays=round(rays / b / 1e6, 1), compile_s=round(compile_s, 1))
        except Exception as e:  # noqa: BLE001
            J(cornell_grad_unroll=su, error=repr(e)[:200])

    # --- D. re-measure the bench BMW lines on the new defaults --------
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
