"""Terrain trace decomposition: table build vs waves vs fallback."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print(jax.devices(), flush=True)
    from phosphorus_mk2_tpu.accel import cluster_traverse as ct
    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.accel.native_bvh import build_bvh_native
    from phosphorus_mk2_tpu.scenes import terrain_scene

    scene = terrain_scene(grid=707, width=256, height=256)
    data = scene.build()
    bvh = build_bvh_native(np.asarray(data.vertices), np.asarray(data.faces))
    data = attach_bvh(data, bvh)
    K = data.bvh["cluster_bmin"].shape[0]
    print("K", K, "K2", data.bvh["sc_bmin"].shape[0], flush=True)

    N = 65536
    ij = jnp.stack(
        jnp.meshgrid(jnp.linspace(-0.5, 0.5, 256), jnp.linspace(-0.5, 0.5, 256)), -1
    ).reshape(-1, 2)
    p = jnp.tile(jnp.array([[0.0, 1.2, 4.5]]), (N, 1))
    d = jnp.concatenate([ij, jnp.full((N, 1), -1.0)], axis=1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tlim = jnp.full((N,), 3.4e38)

    def timed(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(5):
            out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name:24s} {(time.time()-t0)/5*1e3:9.1f} ms", flush=True)
        return out

    kk = ct.MAX_FRONT
    f_tbl = jax.jit(
        lambda p, d: ct._front_table_hierarchical(p, d, data.bvh, tlim, kk)
    )
    tt, ctb, sch = timed("front table build", f_tbl, p, d)

    f_tr = jax.jit(lambda p, d: ct.intersect_clusters(data, p, d))
    out = timed("full trace", f_tr, p, d)

    # needy stats
    kth = np.asarray(jnp.minimum(tt[:, -1], sch))
    best = np.asarray(out["t"])
    needy = kth < best
    overlap = np.asarray((tt < 3.4e38).sum(axis=1))
    print("needy fraction:", needy.mean(), flush=True)
    print("overlap mean/p95/max:", overlap.mean(), np.percentile(overlap, 95),
          overlap.max(), flush=True)
    print("sc_horizon finite frac:", (np.asarray(sch) < 3.4e38).mean(), flush=True)


if __name__ == "__main__":
    main()
