"""Micro-probes for cluster-tracer cost attribution on TPU."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 65536
REPS = 10


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:30s} {dt * 1e3:8.2f} ms", flush=True)
    return out


def main():
    print(jax.devices(), flush=True)
    key = jax.random.key(0)
    keys32 = jax.random.randint(key, (N,), 0, 300).astype(jnp.uint32)
    vals = jax.random.normal(jax.random.fold_in(key, 1), (N, 3))

    timed("argsort u32 65k", jax.jit(jnp.argsort), keys32)
    order = jnp.argsort(keys32)
    timed("gather (N,3) by perm", jax.jit(lambda v, o: v[o]), vals, order)

    tnK = jax.random.normal(jax.random.fold_in(key, 2), (N, 300))
    timed("argmin (N,300)", jax.jit(lambda x: jnp.argmin(x, axis=1)), tnK)
    timed("slab-ish (N,300)x12ops", jax.jit(lambda x: ((x * 1.1 + 2) * (x - 3)).sum(axis=1)), tnK)

    # wave count of the cluster tracer on the big scene
    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.accel import cluster_traverse as ct
    from phosphorus_mk2_tpu.accel.native_bvh import build_bvh_native
    from phosphorus_mk2_tpu.core.material import Material
    from phosphorus_mk2_tpu.core.scene import Scene
    from phosphorus_mk2_tpu.scenes import make_quad, make_uv_sphere

    s = Scene()
    m = s.add_material(Material.diffuse(name="w"))
    s.add_mesh(make_uv_sphere((0, 0, 0), 1.0, n_theta=128, n_phi=256, material=m))
    s.add_mesh(make_quad([-3, -1.2, 3], [3, -1.2, 3], [3, -1.2, -3], [-3, -1.2, -3], m, "f"))
    data = s.build()
    bvh = build_bvh_native(np.asarray(data.vertices), np.asarray(data.faces))
    data = attach_bvh(data, bvh)
    print("K clusters:", data.bvh["cluster_bmin"].shape[0], flush=True)

    ij = jnp.stack(jnp.meshgrid(jnp.linspace(-1, 1, 256), jnp.linspace(-1, 1, 256)), -1).reshape(-1, 2)
    p = jnp.tile(jnp.array([[0.0, 0.5, 4.0]]), (N, 1))
    d = jnp.concatenate([ij * 0.45, jnp.full((N, 1), -1.0)], axis=1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    # count waves by running the python-level equivalent of the loop
    hit, tn = ct._slab_all(p, d, data.bvh["cluster_bmin"], data.bvh["cluster_bmax"])
    hit = np.asarray(hit)
    overlap = hit.sum(axis=1)
    print("cluster overlaps per ray: mean", overlap.mean(), "p95",
          np.percentile(overlap, 95), "max", overlap.max(), flush=True)


if __name__ == "__main__":
    main()
