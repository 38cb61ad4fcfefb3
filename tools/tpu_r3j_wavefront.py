"""Round-3 TPU batch J: Renderer max_wavefront on the BMW scene.

The auto policy caps cluster-scene wavefronts at 1<<17 (a round-2 HBM
bound from the old top_k front table). The round-3 front table holds
O(N*16) temps, so bigger waves should fit — and the launch-floor share
amortizes with wave size.

    python tools/tpu_r3j_wavefront.py

RESULT (round 3, first run): inconclusive — each config paid its fresh
remote compile inside the timed render (57.9 s vs 166.4 s wall include
compiles). Fixed: a warm-up render per config now precedes the timed
one, so the JSON lines are steady-state.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

import bmw_asset
from phosphorus_mk2_tpu.core.options import Options
from phosphorus_mk2_tpu.renderer import Renderer

RES, SPP, DEPTH = 512, 8, 4
ABC = "/tmp/bmw_class.abc"


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for mw in (1 << 17, 1 << 18):
        scene = bmw_asset.load_scene(ABC, RES, RES)
        opts = Options(samples_per_pixel=SPP, samples_per_pass=4,
                       path_depth=DEPTH, use_bvh=True,
                       depth_unroll=1, sample_unroll=1, max_wavefront=mw)
        r = Renderer(scene, opts)
        t0 = time.time()
        r.render()  # warm-up: compiles + first-touch transfers
        warm = time.time() - t0
        t0 = time.time()  # render() restarts from pass 0 (no ckpt dir)
        film = r.render()
        dt = time.time() - t0
        rays = RES * RES * SPP * DEPTH * 2
        mean = float(np.asarray(film["color"]).mean())
        print(json.dumps({
            "max_wavefront": mw, "warm_s": round(warm, 1),
            "s": round(dt, 1),
            "mrays": round(rays / dt / 1e6, 3), "mean": round(mean, 5),
        }), flush=True)


if __name__ == "__main__":
    main()
