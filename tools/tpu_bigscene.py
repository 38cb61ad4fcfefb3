"""Large-scene traversal benchmark on TPU: brute vs sorted block BVH.

65k-triangle sphere + floor; coherent (camera) and incoherent (random)
wavefronts.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.accel.block_traverse import intersect_blocks
from phosphorus_mk2_tpu.accel.cluster_traverse import intersect_clusters
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.accel.intersect import intersect_brute
from phosphorus_mk2_tpu.accel.native_bvh import build_bvh_native
from phosphorus_mk2_tpu.accel.sort import sorted_trace
from phosphorus_mk2_tpu.core.material import Material
from phosphorus_mk2_tpu.core.scene import Scene
from phosphorus_mk2_tpu.scenes import make_quad, make_uv_sphere

N = 65536
REPS = 5


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:28s} {dt * 1e3:9.2f} ms | {N / dt / 1e6:7.2f} Mray/s", flush=True)


def main():
    print(jax.devices(), flush=True)
    s = Scene()
    m = s.add_material(Material.diffuse(name="w"))
    s.add_mesh(make_uv_sphere((0, 0, 0), 1.0, n_theta=128, n_phi=256, material=m))
    s.add_mesh(
        make_quad([-3, -1.2, 3], [3, -1.2, 3], [3, -1.2, -3], [-3, -1.2, -3], m, "f")
    )
    data = s.build()
    print("tris:", data.faces.shape[0], flush=True)
    bvh = build_bvh_native(np.asarray(data.vertices), np.asarray(data.faces))
    data = attach_bvh(data, bvh)
    print("nodes:", bvh["node_child"].shape[0], flush=True)

    key = jax.random.key(0)
    # coherent: camera-style grid of rays from one origin
    ij = jnp.stack(
        jnp.meshgrid(jnp.linspace(-1, 1, 256), jnp.linspace(-1, 1, 256)), -1
    ).reshape(-1, 2)
    p_coh = jnp.tile(jnp.array([[0.0, 0.5, 4.0]]), (N, 1))
    d_coh = jnp.concatenate([ij * 0.45, jnp.full((N, 1), -1.0)], axis=1)
    d_coh = d_coh / jnp.linalg.norm(d_coh, axis=-1, keepdims=True)
    # incoherent: random origins and directions inside the bounds
    p_inc = jax.random.uniform(key, (N, 3), minval=-1.1, maxval=1.1)
    d_inc = jax.random.normal(jax.random.fold_in(key, 1), (N, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)

    f_brute = jax.jit(lambda p, d: intersect_brute(data, p, d))
    f_cluster = jax.jit(lambda p, d: intersect_clusters(data, p, d))

    timed("cluster coherent", f_cluster, p_coh, d_coh)
    timed("cluster incoherent", f_cluster, p_inc, d_inc)
    timed("brute coherent", f_brute, p_coh, d_coh)

    # sanity
    r1 = f_brute(p_coh, d_coh)
    r2 = f_cluster(p_coh, d_coh)
    agree = (np.asarray(r1["hit"]) == np.asarray(r2["hit"])).mean()
    print("agreement:", agree, flush=True)


if __name__ == "__main__":
    main()
