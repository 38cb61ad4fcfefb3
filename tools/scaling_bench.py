"""Scaling-efficiency harness: rays/s/device from 1 -> N devices.

BASELINE.json north star: >=85% scaling efficiency 1 chip -> 1 host ->
N hosts. On real multi-chip slices this measures true ICI scaling; on a
virtual CPU mesh (--cpu, xla_force_host_platform_device_count) it
validates the harness + sharding correctness (virtual devices share one
socket, so efficiency numbers there are NOT meaningful scaling data).

    python tools/scaling_bench.py [--cpu] [--devices 1 2 4 8]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time


def main():
    args = sys.argv[1:]
    if "--cpu" in args:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from phosphorus_mk2_tpu.core.options import Options
    from phosphorus_mk2_tpu.parallel import (
        comm_accounting,
        initialize,
        make_render_mesh,
        make_sharded_render,
    )
    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.scenes import textured_terrain_scene

    initialize()  # no-op single-process; jax.distributed on a pod

    if "--devices" in args:
        i = args.index("--devices")
        counts = [int(x) for x in args[i + 1 :] if x.isdigit()]
    else:
        n = len(jax.devices())
        counts = sorted({1, 2, n} & set(range(1, n + 1))) or [1]

    W = H = 256
    if "--res" in args:
        W = H = int(args[args.index("--res") + 1])
    SPP = 8
    DEPTH = 4
    # production configuration: cluster BVH traversal + textures + MIS
    # (round-2 verdict: the scaling harness ran only the brute tracer)
    scene = textured_terrain_scene(grid=64, width=W, height=H)
    data = attach_bvh(scene.build())

    print(f"devices available: {len(jax.devices())} x {jax.devices()[0].platform}")
    base_rate = None
    for n_dev in counts:
        # production 2-D (host, chip) mesh; host axis from process count
        # (synthetic 2-way factorization under --cpu to exercise the spec)
        host_axis = None
        if "--cpu" in args and n_dev % 2 == 0 and n_dev > 1:
            host_axis = 2
        mesh = make_render_mesh(n_dev, host_axis=host_axis)
        fn, px, py, n_valid = make_sharded_render(
            mesh, data, scene.camera, max_depth=DEPTH, use_bvh=True,
            mis=True,
        )
        acct = comm_accounting(
            mesh, W, H, n_param_floats=int(np.prod(data.emission.shape)),
            spp=SPP, max_depth=DEPTH,
        )
        print(f"  mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}: {acct.summary()}")
        key = jax.random.key(0)
        out = fn(data, key, 0, SPP)
        jax.block_until_ready(out)
        t0 = time.time()
        out = fn(data, key, SPP, SPP)
        jax.block_until_ready(out)
        dt = time.time() - t0
        rays = W * H * SPP * DEPTH * 2
        rate = rays / dt
        per_dev = rate / n_dev
        if base_rate is None:
            base_rate = per_dev
        eff = per_dev / base_rate
        print(
            f"n={n_dev}: {dt*1e3:8.1f} ms  {rate/1e6:7.2f} Mray/s "
            f"({per_dev/1e6:.2f}/dev, efficiency {eff:5.1%})",
            flush=True,
        )


if __name__ == "__main__":
    main()
