"""Round-4 TPU batch P: front_k at the post-v2 balance.

With the fused front at 36.7 ms the wave loop (~78 ms) dominates
again; front_k (wave-column budget) 24/28 was never tested — 32 beat
48 and 8/16 exploded the fallback for SHADOW rays, but closest-hit
camera rays may tolerate a narrower table. Fresh subprocesses.

    python tools/tpu_r4p_frontk.py 2>&1 | tee /tmp/tpu_r4p.log
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
sys.path.insert(0, {here!r})
import jax, jax.numpy as jnp
import numpy as np
import bmw_asset
from phosphorus_mk2_tpu.accel import cluster_traverse as ct
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays

N = 1 << 17
scene = bmw_asset.load_scene("/tmp/bmw_class.abc", 512, 512)
data = attach_bvh(scene.build())
cam = camera_to_params(scene.camera)
ids = jnp.arange(N, dtype=jnp.int32)
px, py = ids % 512, (ids // 512) % 512
u = jnp.full((N, 2), 0.5)
p, d = generate_rays(cam, px, py, u, u)
tune = {tune}
fn = jax.jit(lambda p, d: ct.intersect_clusters(data, p, d, **tune))
out = jax.block_until_ready(fn(p, d))
best = 1e9
for _ in range(3):
    t0 = time.time(); out = jax.block_until_ready(fn(p, d))
    best = min(best, time.time() - t0)
print(json.dumps(dict(tune={tune}, ms=round(best*1e3, 1),
    mrays=round(N/best/1e6, 2),
    hits=int(np.asarray(out["hit"]).sum()),
    tri_sum=int(np.asarray(out["tri"]).sum()))), flush=True)
"""

if __name__ == "__main__":
    repo = os.path.dirname(HERE)
    for tune in ('{"front_k": 24, "recompact": 8}',
                 '{"front_k": 28, "recompact": 8}',
                 '{"front_k": 24, "recompact": 6}'):
        code = CHILD.format(repo=repo, here=HERE, tune=tune)
        print(f"=== r4p {tune} ===", flush=True)
        subprocess.run([sys.executable, "-c", code], timeout=2400)
