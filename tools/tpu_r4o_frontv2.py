"""Round-4 TPU batch O: the v2 fused front kernel (batched one-hot
expansion + host-side top-kk sort).

v1 measured 58 us/block — all dependency-chain latency (16 sequential
small MXU calls + 32 sequential extraction rounds). v2 replaces them
with ONE (B*jj, K2p) matmul and ONE host-side (N, jj*sc) int sort.
Fresh subprocess per variant (pallas compile-failure poisoning).

    python tools/tpu_r4o_frontv2.py 2>&1 | tee /tmp/tpu_r4o.log
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

FRONT = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
sys.path.insert(0, {here!r})
import jax, jax.numpy as jnp
import numpy as np
import bmw_asset
from phosphorus_mk2_tpu.accel import cluster_traverse as ct
from phosphorus_mk2_tpu.accel import pallas_front as pf
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
tl = jnp.full((N,), ct.T_MAX)
bvh = data.bvh
bounds6 = jnp.concatenate([bvh["sc_bmin"], bvh["sc_bmax"]], axis=1)
rb = {rb}

def front(p, d):
    return pf.front_all_pallas(bounds6, bvh["sc_member_bmin"],
                               bvh["sc_member_bmax"], p, d, tl,
                               jj=16, kk=32, ray_block=rb)
fn = jax.jit(front)
out = jax.block_until_ready(fn(p, d))
best = 1e9
for _ in range(3):
    t0 = time.time(); out = jax.block_until_ready(fn(p, d))
    best = min(best, time.time() - t0)
print(json.dumps(dict(front_v2_rb=rb, ms=round(best*1e3, 1))), flush=True)
"""

TRACE = r"""
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
    for rb in (0, 128):
        code = FRONT.format(repo=repo, here=HERE, rb=rb)
        print(f"=== r4o front v2 rb={rb} ===", flush=True)
        subprocess.run([sys.executable, "-c", code], timeout=2400)
    for tune in (
        '{"front_k": 32, "recompact": 8, "sc_topk": "pallas_full"}',
    ):
        code = TRACE.format(repo=repo, here=HERE, tune=tune)
        print(f"=== r4o trace {tune} ===", flush=True)
        subprocess.run([sys.executable, "-c", code], timeout=2400)
