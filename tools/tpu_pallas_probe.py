"""Pallas MT kernel vs XLA brute on TPU."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp

from phosphorus_mk2_tpu.accel.intersect import intersect_brute
from phosphorus_mk2_tpu.accel.pallas_mt import intersect_pallas_brute
from phosphorus_mk2_tpu.scenes import cornell_box
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
    print(f"{name:28s} {dt * 1e3:9.2f} ms | {N / dt / 1e6:7.2f} Mray/s", flush=True)
    return out


def main():
    print(jax.devices(), flush=True)
    scene = cornell_box()
    data = scene.build()
    key = jax.random.key(0)
    p = jax.random.uniform(key, (N, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.fold_in(key, 1), (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    f_x = jax.jit(lambda p, d: intersect_brute(data, p, d))
    f_p = jax.jit(lambda p, d: intersect_pallas_brute(data, p, d))

    r1 = timed("xla brute 108tri", f_x, p, d)
    r2 = timed("pallas brute 108tri", f_p, p, d)
    h1 = np.asarray(r1["hit"])
    h2 = np.asarray(r2["hit"])
    print("agree:", (h1 == h2).mean(), flush=True)


if __name__ == "__main__":
    main()
