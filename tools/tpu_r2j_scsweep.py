"""Round-2 TPU batch J: supercluster-shape sweep on the BMW-class asset.

The 887k-tri trace is front-table bound (tpu_r2h: sc slab+top_k 60 ms of
258). Bigger superclusters shrink the top_k input (K2 = K/SC) and let
jj drop while keeping candidate count jj*SC constant; MAX_FRONT trades
wave-table depth against fallback pressure (overlap p99 = 30).

    python tools/tpu_r2j_scsweep.py 2>&1 | tee /tmp/tpu_r2j.log
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

import bmw_asset
from phosphorus_mk2_tpu.accel import bvh_builder as bb
from phosphorus_mk2_tpu.accel import cluster_traverse as ct
from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays

N = 1 << 17
ABC = "/tmp/bmw_class.abc"


def main():
    print(f"devices: {jax.devices()}", flush=True)
    if not os.path.exists(ABC):
        bmw_asset.write_asset(ABC, scale=1.0)
    scene = bmw_asset.load_scene(ABC, 512, 512)
    built = scene.build()
    cam = camera_to_params(scene.camera)
    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % 512, (ids // 512) % 512
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)

    ref = None
    # (SUPER_CLUSTERS, SC_FRONT, MAX_FRONT)
    for SC, JJ, MF in (
        (16, 16, 64),   # baseline (258 ms in r2g)
        (32, 8, 64),
        (32, 16, 64),   # 512 candidates: wider horizon
        (64, 4, 64),
        (64, 8, 64),    # 512 candidates
        (16, 16, 32),
        (32, 8, 32),
    ):
        bb.SUPER_CLUSTERS = SC
        ct.SC_FRONT = JJ
        ct.MAX_FRONT = MF
        data = bb.attach_bvh(built)
        try:
            f = jax.jit(lambda p, d: ct.intersect_clusters(data, p, d))
            t0 = time.time()
            out = jax.block_until_ready(f(p, d))
            tc = time.time() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                out = jax.block_until_ready(f(p, d))
                best = min(best, time.time() - t0)
            h = np.asarray(out["hit"]); t = np.asarray(out["t"])
            if ref is None:
                ref = (h, t)
            ok = bool((h == ref[0]).all()
                      and np.allclose(t[h & ref[0]], ref[1][h & ref[0]], rtol=1e-5))
            print(f"[SC={SC:2d} jj={JJ:2d} mf={MF:2d}] {best*1e3:8.1f} ms "
                  f"({N/best/1e6:5.2f} Mrays/s) match={ok} (compile {tc:.0f} s)",
                  flush=True)
        except Exception as e:
            print(f"[SC={SC:2d} jj={JJ:2d} mf={MF:2d}] FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)
    bb.SUPER_CLUSTERS = 16
    ct.SC_FRONT = 16
    ct.MAX_FRONT = 64


if __name__ == "__main__":
    main()
