"""Round-4 TPU batch F: supercluster-front width + fused Pallas front
at BMW scale.

r4e decomposition of the 79.8 ms front table: slab 23.1 + extract 17.5
+ expand 30.4 + select 5.5. Two attacks:
  - sc_front=8: halves the extract rounds AND the expand gather bytes
    (p99 supercluster overlap ~8; the exact fallback covers overflow —
    watch the hits invariance and the fallback cost).
  - sc_topk="pallas": the fused slab+extract kernel keeps the (N, K2)
    matrix in VMEM (round-3 kernel, measured neutral at Cornell
    shapes; round-3 verdict item 9 demands the BMW-scale re-measure).
    LAST in the batch: a failed Pallas remote compile poisons the
    process (CLAUDE.md).

    python tools/tpu_r4f_pallas.py 2>&1 | tee /tmp/tpu_r4f.log
"""
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

    base = None
    for tune in ({"sc_front": 8},
                 {"sc_front": 12},
                 {"sc_front": 8, "front_k": 24},
                 {"sc_topk": "pallas"},            # POISON RISK: last
                 {"sc_topk": "pallas", "sc_front": 8},
                 ):
        fn = jax.jit(lambda p, d, tune=tune:
                     ct.intersect_clusters(data, p, d, **tune))
        try:
            b, out = timed(fn, p, d)
            hits = int(np.asarray(out["hit"]).sum())
            tri_sum = int(np.asarray(out["tri"]).sum())
            if base is None:
                base = (hits, tri_sum)
            J(trace=str(tune), ms=round(b * 1e3, 1),
              mrays=round(N / b / 1e6, 2), hits=hits,
              winners_match=(hits, tri_sum) == base)
        except Exception as e:  # noqa: BLE001
            J(trace=str(tune), error=repr(e)[:200])


if __name__ == "__main__":
    main()
