"""Round-4 TPU batch H: cluster capacity re-sweep under the BYTE-bound
cost model.

Round-2 measured C=64 slower and concluded "the wave loop is
iteration-bound, not byte-bound" — but the r4c synthetic discriminator
disproved that model (gathers are byte-bound at ~93 GB/s; iterations
cost ~0.1 ms). At C=128 the mean cluster occupancy on the BMW asset is
81/128, so ~36% of every gathered row is padding bytes; C=64 halves
the row size, trading higher per-ray overlap (more, smaller clusters)
for fewer wasted bytes. Re-measure with the round-4 defaults
(recompact 8, chunk 2048, front_k 32).

    python tools/tpu_r4h_capacity.py 2>&1 | tee /tmp/tpu_r4h.log
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
    built = scene.build()
    cam = camera_to_params(scene.camera)
    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % 512, (ids // 512) % 512
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)

    base = None
    for cap in (128, 64, 96):
        data = attach_bvh(built, cluster_tris=cap)
        K, _, C = ct._cluster_rows(data, bf16=False).shape
        valid = np.asarray(data.bvh["cluster_id"] >= 0)
        # occupancy from the validity mask the MT stage uses
        fn = jax.jit(lambda p, d, data=data:
                     ct.intersect_clusters(data, p, d))
        try:
            b, out = timed(fn, p, d)
            hits = int(np.asarray(out["hit"]).sum())
            tri_sum = int(np.asarray(out["tri"]).sum())
            if base is None:
                base = (hits, tri_sum)
            J(cluster_tris=cap, K=K, row_kb=round(9 * C * 4 / 1024, 2),
              ms=round(b * 1e3, 1), mrays=round(N / b / 1e6, 2),
              hits=hits, winners_match=(hits, tri_sum) == base)
        except Exception as e:  # noqa: BLE001
            J(cluster_tris=cap, error=repr(e)[:200])


if __name__ == "__main__":
    main()
