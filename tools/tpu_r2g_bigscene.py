"""Round-2 TPU batch G: big-scene cluster-tracer launch-count levers.

The BMW-class 887k-tri trace is launch-bound (~200 chunk/wave launches
x 0.44 ms). Sweep the new _trace tunables on the imported asset:

  - dense_waves W0: head columns for ALL rays in fat gathers
  - expand_batch: supercluster expansion as ONE row-gather vs 16-step scan
  - chunk / dense_chunk: launches vs HBM per gather

    python tools/tpu_r2g_bigscene.py 2>&1 | tee /tmp/tpu_r2g.log
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
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.accel import cluster_traverse as ct
from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays

N = 1 << 17  # the renderer's auto wavefront bound for cluster scenes
ABC = "/tmp/bmw_class.abc"


def main():
    print(f"devices: {jax.devices()}", flush=True)
    if not os.path.exists(ABC):
        bmw_asset.write_asset(ABC, scale=1.0)
    scene = bmw_asset.load_scene(ABC, 512, 512)
    data = attach_bvh(scene.build())
    K = data.bvh["cluster_bmin"].shape[0]
    print(f"tris={data.faces.shape[0]} clusters={K}", flush=True)
    cam = camera_to_params(scene.camera)

    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % 512, (ids // 512) % 512
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)

    ref = None
    variants = [
        ("baseline", {}),
        ("exp16", {"expand_batch": 16}),
        ("dw2", {"dense_waves": 2}),
        ("dw4", {"dense_waves": 4}),
        ("dw8", {"dense_waves": 8}),
        ("dw4+exp16", {"dense_waves": 4, "expand_batch": 16}),
        ("dw4+exp16+ch32k", {"dense_waves": 4, "expand_batch": 16,
                             "chunk": 32768}),
        ("dw8+exp16+dch32k", {"dense_waves": 8, "expand_batch": 16,
                              "dense_chunk": 32768}),
        ("dw4+exp16+dch64k", {"dense_waves": 4, "expand_batch": 16,
                              "dense_chunk": 65536}),
        ("bf16", {"slab_bf16": True}),
        ("bf16+dw4+exp16", {"slab_bf16": True, "dense_waves": 4,
                            "expand_batch": 16}),
    ]
    for tag, tune in variants:
        try:
            f = jax.jit(lambda p, d: ct.intersect_clusters(data, p, d, **tune))
            t0 = time.time()
            out = jax.block_until_ready(f(p, d))
            t_c = time.time() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                out = jax.block_until_ready(f(p, d))
                best = min(best, time.time() - t0)
            h = np.asarray(out["hit"])
            t = np.asarray(out["t"])
            if ref is None:
                ref = (h, t)
            ok = bool(
                (h == ref[0]).all()
                and np.allclose(t[h & ref[0]], ref[1][h & ref[0]], rtol=1e-5)
            )
            print(
                f"[{tag:20s}] {best * 1e3:8.1f} ms /131k rays "
                f"({N / best / 1e6:6.2f} Mrays/s) hits={h.sum()} "
                f"match={ok} (compile {t_c:.0f} s)",
                flush=True,
            )
        except Exception as e:  # OOM etc: report and continue the sweep
            print(f"[{tag:20s}] FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
