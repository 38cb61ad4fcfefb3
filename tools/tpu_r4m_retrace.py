"""Round-4 TPU batch M: trace A/Bs after the r4l findings.

Each variant runs in a FRESH subprocess (a failed pallas remote compile
poisons the process). Against the r4l baseline (167.9 ms / 0.78 Mrays
with the OLD fancy-index winner extraction):

  1. baseline re-run — now with reduction-based winner extraction and
     the u/v carry dropped (_mt_rows slimming; r4l expE showed the wave
     body at 50 GB/s vs 145 GB/s for its gather stream — the five
     per-lane fancy-index extractions were the suspect);
  2. sc_topk="pallas_full" — the fused front kernel with the VMEM
     auto-scaled ray block (r4l root cause: 17.03 M scoped-VMEM stack
     at K2p=768 with B=256; B=128 fits);
  3. wave_dedup onehot d=512 (the r4l run lost to an edit race);
  4. pallas_full + the winner of 1-3 combined, if distinct.

    python tools/tpu_r4m_retrace.py 2>&1 | tee /tmp/tpu_r4m.log
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

VARIANTS = [
    '{"front_k": 32, "recompact": 8}',
    '{"front_k": 32, "recompact": 8, "sc_topk": "pallas_full"}',
    '{"front_k": 32, "recompact": 8, "wave_dedup": "onehot", "dedup_d": 512}',
]

if __name__ == "__main__":
    for tune in VARIANTS + sys.argv[1:]:
        code = CHILD.format(repo=os.path.dirname(HERE), here=HERE, tune=tune)
        print(f"=== r4m {tune} ===", flush=True)
        subprocess.run([sys.executable, "-c", code], timeout=2400)
