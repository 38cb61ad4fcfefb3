"""Round-4 TPU batch I: the fused FULL-front Pallas kernel at BMW scale.

r4e decomposition: the front table is 79.8 ms of the 167.6 ms trace
(slab 23.1 + extract 17.5 + expand 30.4 + select 5.5), all HBM-
intermediate-bound. front_all_pallas does the whole chain in one
launch with every intermediate in VMEM (one-hot MXU matmul member
gathers). This is the round-4 attack (VERDICT item 9 / CLAUDE.md).

Stage 1 (this file): trace-level A/B at BMW shapes. Baseline FIRST
(a failed Pallas remote compile poisons the process — CLAUDE.md), then
pallas_full variants. Winners-match asserts bit parity.

    python tools/tpu_r4i_pallasfull.py 2>&1 | tee /tmp/tpu_r4i.log
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
    for tune in ({},                                   # current defaults
                 {"sc_topk": "pallas_full"},           # the attack
                 {"sc_topk": "pallas_full", "front_k": 24},
                 {"sc_topk": "pallas_full", "front_k": 48},
                 {"sc_topk": "pallas_full", "recompact": 4},
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
            J(trace=str(tune), error=repr(e)[:300])


if __name__ == "__main__":
    main()
