"""CPU probe: cluster-sharing (dedup factor) inside wave-loop chunks.

The wave loop gathers one (9,128) f32 cluster row (~4.6 KB) per live
(ray, front-column) reference; the stream is byte-bound at ~93 GB/s
(tools/tpu_r4c_waveloop.py). A Pallas block-dedup kernel (load each
DISTINCT cluster of a ray chunk once into VMEM, route rows to rays via
one-hot MXU matmul — the pallas_front.front_all_pallas idiom) only
pays if chunks actually share clusters. This measures, on the real BMW
front table, distinct-clusters-per-chunk vs references-per-chunk for
the overlap-sorted order the loop actually uses, at several chunk
sizes. Pure numpy + one CPU jit of the front table; forces local CPU.

    python tools/r4_dedup_probe.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bmw_asset  # noqa: E402
from phosphorus_mk2_tpu.accel import cluster_traverse as ct  # noqa: E402
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh  # noqa: E402
from phosphorus_mk2_tpu.core.camera import (  # noqa: E402
    camera_to_params, generate_rays,
)

N = 1 << 15  # CPU-affordable; chunk statistics are size-local anyway
ABC = "/tmp/bmw_class.abc"


def main():
    if not os.path.exists(ABC):
        bmw_asset.write_asset(ABC, scale=1.0)
    scene = bmw_asset.load_scene(ABC, 512, 512)
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    ids = jnp.arange(N, dtype=jnp.int32)
    # spread over the full image so chunk stats aren't one corner
    px = (ids * 7919) % 512
    py = ((ids * 104729) // 512) % 512
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)
    t_limit = jnp.full((N,), 1e30)

    bvh = data.bvh
    kk = min(ct.MAX_FRONT, data.bvh["cl_bmin"].shape[0]
             if "cl_bmin" in bvh else 1 << 30)

    @jax.jit
    def front(p, d):
        return ct._front_table_hierarchical(
            p, d, bvh, t_limit, 32, expand_batch=1, slab_bf16=False,
            levels=2, sc_topk="extract", sc_front=0)

    ttbl, ctbl, _ = front(p, d)
    ttbl = np.asarray(ttbl)
    ctbl = np.asarray(ctbl)
    live = ttbl < ct.T_MAX
    overlap = live.sum(axis=1)
    order = np.argsort(-overlap)
    print(json.dumps({"N": N, "kk": int(ctbl.shape[1]),
                      "mean_overlap": round(float(overlap.mean()), 2)}))

    for ch in (512, 1024, 2048, 4096):
        for name, idx in (("overlap_sorted", order),
                          ("camera_order", np.arange(N))):
            refs = dist = 0
            col0 = []  # distinct count for wave column 0 only
            for s in range(0, N, ch):
                sel = idx[s:s + ch]
                c = ctbl[sel]
                m = live[sel]
                refs += int(m.sum())
                dist += len(np.unique(c[m]))
                col0.append(len(np.unique(c[:, 0][m[:, 0]])))
            print(json.dumps({
                "chunk": ch, "order": name, "refs": refs,
                "distinct": dist,
                "dedup_x": round(refs / max(dist, 1), 2),
                "col0_distinct_mean": round(float(np.mean(col0)), 1),
            }), flush=True)


if __name__ == "__main__":
    main()
