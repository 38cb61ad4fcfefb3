"""Round-4 TPU batch G: post-fix verification + liveness model + aniso
cost at BMW scale.

  1. bmw_live + bmw_fwd_bwd via bench.py — the fwd+bwd number must now
     report grads_finite=true (the env-light division-guard underflow
     was fixed this round; see tests/test_grad.py).
  2. The r4c host-side liveness model (fixed): static vs dynamic-
     estimate overlap, expected chunk-iterations and bytes at the new
     chunk=2048 default — pins how much of the 87.7 ms wave loop is
     bytes vs fixed per-iteration cost.
  3. Anisotropic-filter cost on a TEXTURED BMW variant (checker ground
     + mips): render cost aniso_taps=4 vs 0 (round-3 verdict item 6:
     cost <= 1.4x or bust).

    python tools/tpu_r4g_verify.py 2>&1 | tee /tmp/tpu_r4g.log
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

    # --- 1. bench lines (grads_finite must be true now) ---------------
    import bench
    for fn in (bench.bmw_live, bench.bmw_fwd_bwd):
        try:
            J(**fn())
        except Exception as e:  # noqa: BLE001
            J(metric=fn.__name__, error=repr(e)[:300])

    # --- 2. liveness model at the current defaults --------------------
    scene = bmw_asset.load_scene(ABC, 512, 512)
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % 512, (ids // 512) % 512
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)
    kk = min(ct.MAX_FRONT, data.bvh["cluster_bmin"].shape[0])

    def front(p, d):
        tl = jnp.full((N,), ct.T_MAX)
        ttbl, _, _ = ct._front_table_hierarchical(
            p, d, data.bvh, tl, kk, expand_batch=1,
            slab_bf16=False, levels=2, sc_topk="extract")
        return ttbl

    ttbl = jax.block_until_ready(jax.jit(front)(p, d))
    out = jax.block_until_ready(
        jax.jit(lambda p, d: ct.intersect_clusters(data, p, d))(p, d))
    t_final = np.asarray(out["t"])

    rows = ct._cluster_rows(data, bf16=False)
    row_bytes = rows.shape[1] * rows.shape[2] * 4
    tt = np.asarray(ttbl)
    tmax = float(ct.T_MAX)
    static_ov = (tt < tmax).sum(axis=1)
    dyn_live = (tt < np.minimum(t_final[:, None], tmax)).sum(axis=1)
    for name, ov in (("static", static_ov), ("dynamic_est", dyn_live)):
        hist = [float(x) for x in np.percentile(ov, [50, 90, 99])]
        for CH in (2048, 4096):
            alive_w = (ov[None, :] > np.arange(kk)[:, None]).sum(axis=1)
            iters = int(np.ceil(alive_w / CH).sum())
            J(model=name, mean=round(float(ov.mean()), 2), p50_90_99=hist,
              total_raywaves=int(ov.sum()), chunk=CH, chunk_iters=iters,
              bytes_gb=round(float(alive_w.sum()) * row_bytes / 1e9, 2))

    # --- 3. aniso cost on a textured BMW variant ----------------------
    from phosphorus_mk2_tpu.core.texture import checkerboard
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass

    tex_scene = bmw_asset.load_scene(ABC, 256, 256)
    checker = tex_scene.add_texture(checkerboard(n=64, size=256))
    gid = tex_scene._material_ids["ground"]
    tex_scene.materials[gid].lobes[0].texture = checker
    tdata = attach_bvh(tex_scene.build())
    tcam = camera_to_params(tex_scene.camera)
    ttracer = make_tracer(tdata, use_bvh=True)
    key = jax.random.key(0)
    base_ms = None
    for taps in (0, 4):
        fn = jax.jit(functools.partial(
            render_pass, width=256, height=256, max_depth=2,
            tracer=ttracer, depth_unroll=2, aniso_taps=taps),
            static_argnames=("n_samples",))
        try:
            b, out2 = timed(lambda: fn(tdata, tcam, key, 0, 2))
            mean = float(np.asarray(out2["color"]).mean()) / 2
            if taps == 0:
                base_ms = b * 1e3
            J(aniso_taps=taps, ms=round(b * 1e3, 1), mean=round(mean, 5),
              cost_ratio=(round(b * 1e3 / base_ms, 3) if base_ms else None))
        except Exception as e:  # noqa: BLE001
            J(aniso_taps=taps, error=repr(e)[:200])


if __name__ == "__main__":
    main()
