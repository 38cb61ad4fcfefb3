"""Round-4 TPU batch R: the fused wave-MT kernel in-trace at BMW scale.

r4q measured in-kernel per-row DMA at 18-27 ns (167-255 GB/s) — above
the XLA gather engine — and the XLA wave body runs ~3x above its byte
floor in materialized MT intermediates (r4l expE). wave_pallas fuses
DMA + MT + min-update in VMEM. Fresh subprocess per variant.

    python tools/tpu_r4r_wavepallas.py 2>&1 | tee /tmp/tpu_r4r.log

HISTORICAL (round 5): wave_pallas and accel/pallas_wave.py were PRUNED
after the decisive negative (see cluster_traverse._trace docstring);
this probe only runs against commit d639293 or earlier. It exits
early on current trees to avoid a misleading TypeError.
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

sys.path.insert(0, os.path.dirname(HERE))
try:
    import phosphorus_mk2_tpu.accel.pallas_wave  # noqa: F401
except ImportError:
    sys.exit(
        "wave_pallas was pruned in round 5 (decisive negative; see "
        "cluster_traverse._trace). Check out commit d639293 to rerun."
    )

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
    for tune in (
        '{"front_k": 32, "recompact": 8, "wave_pallas": True}',
        '{"front_k": 32, "recompact": 8, "wave_pallas": True,'
        ' "sc_topk": "pallas_full"}',
        '{"front_k": 32, "recompact": 0, "wave_pallas": True,'
        ' "sc_topk": "pallas_full"}',
    ):
        code = CHILD.format(repo=repo, here=HERE, tune=tune)
        print(f"=== r4r {tune} ===", flush=True)
        subprocess.run([sys.executable, "-c", code], timeout=2400)
