"""Round-3 CPU measurement: per-ray cluster/supercluster overlap under
flat vs treelet clustering on the BMW-class scene.

Overlap (clusters whose slab is hit per camera ray) is the wave-loop
cost driver at big-scene scale (ARCHITECTURE.md: mean 7.55 / p99 30 on
the 887k-tri car with flat chopping). Treelet clusters inherit the SAH
subtree bounds, so this script quantifies the reduction before spending
a remote TPU compile on it. CPU-only, safe to run alongside TPU jobs.
"""
from __future__ import annotations

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
import bmw_asset  # noqa: E402

from phosphorus_mk2_tpu.accel import cluster_traverse as ct  # noqa: E402
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh  # noqa: E402
from phosphorus_mk2_tpu.core.camera import (  # noqa: E402
    camera_to_params, generate_rays,
)
from phosphorus_mk2_tpu.math.rng import pcg4d  # noqa: E402


def stats(name, data, p, d):
    bvh = data.bvh
    K = bvh["cluster_bmin"].shape[0]
    K2 = bvh["sc_bmin"].shape[0]
    K3 = bvh["ssc_bmin"].shape[0] if "ssc_bmin" in bvh else 0
    hit, tn = ct._slab_all(p, d, bvh["cluster_bmin"], bvh["cluster_bmax"])
    ov = np.asarray((hit & (tn < ct.T_MAX)).sum(axis=1))
    sc_hit, sc_tn = ct._slab_all(p, d, bvh["sc_bmin"], bvh["sc_bmax"])
    sov = np.asarray((sc_hit & (sc_tn < ct.T_MAX)).sum(axis=1))
    line = {
        "mode": name, "K": int(K), "K2": int(K2), "K3": int(K3),
        "overlap_mean": round(float(ov.mean()), 2),
        "overlap_p99": int(np.percentile(ov, 99)),
        "overlap_max": int(ov.max()),
        "sc_overlap_mean": round(float(sov.mean()), 2),
        "sc_overlap_p99": int(np.percentile(sov, 99)),
    }
    if K3:
        s3_hit, s3_tn = ct._slab_all(p, d, bvh["ssc_bmin"], bvh["ssc_bmax"])
        s3 = np.asarray((s3_hit & (s3_tn < ct.T_MAX)).sum(axis=1))
        line["ssc_overlap_mean"] = round(float(s3.mean()), 2)
        line["ssc_overlap_p99"] = int(np.percentile(s3, 99))
    print(line, flush=True)
    return line


def main():
    abc = "/tmp/bmw_class.abc"
    if not os.path.exists(abc):
        bmw_asset.write_asset(abc)
    RES = 256
    scene = bmw_asset.load_scene(abc, RES, RES)
    base = scene.build()
    cam = camera_to_params(scene.camera)

    n = RES * RES
    pix = jnp.arange(n, dtype=jnp.uint32)
    u = pcg4d(pix, jnp.uint32(0), jnp.uint32(1), jnp.uint32(2))
    film = jnp.stack([u[0], u[1]], axis=-1).astype(jnp.float32) / 4294967296.0
    p, d = generate_rays(cam, pix % RES, pix // RES, film)

    for mode in ("flat", "treelet", "treelet_nested"):
        t0 = time.time()
        data = attach_bvh(base, cluster_mode=mode)
        t_attach = time.time() - t0
        line = stats(mode, data, p, d)
        line["attach_s"] = round(t_attach, 2)
        # correctness spot check vs the other mode comes from the test
        # suite; here just confirm a trace returns sane hit fraction
        mid = n // 2  # middle rows: the car, not the sky
        sub_p, sub_d = p[mid : mid + 4096], d[mid : mid + 4096]
        res = ct.intersect_clusters(data, sub_p, sub_d)
        frac = float(np.asarray(res["hit"]).mean())
        print({"mode": mode, "hit_frac": round(frac, 4),
               "attach_s": round(t_attach, 2)}, flush=True)


if __name__ == "__main__":
    main()
