"""Round-2 TPU batch B: measure the consolidated-row pipeline.

  1. bench config (now with hit/light fat rows + 1-gather textures)
  2. textured cornell (was 22.4 Mrays/s with 4-gather bilinear)
  3. fwd+bwd through render_pass (BASELINE metric)
  4. try to dump compiled-HLO stats (fusion/kernel count) for one pass

    python tools/tpu_r2b_consolidated.py 2>&1 | tee /tmp/tpu_r2b.log
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.core.camera import camera_to_params
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
from phosphorus_mk2_tpu.scenes import cornell_box

W = H = 256
SPP = 16
DEPTH = 4


def make_fn(scene, **kw):
    data = scene.build()
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    fn = jax.jit(
        functools.partial(
            render_pass, width=W, height=H, max_depth=DEPTH, tracer=tracer, **kw
        ),
        static_argnames=("n_samples",),
    )
    return fn, data, cam


def bench_config(tag, scene, **kw):
    fn, data, cam = make_fn(scene, **kw)
    key = jax.random.key(0)
    t0 = time.time()
    out = fn(data, cam, key, 0, SPP)
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = fn(data, cam, key, SPP, SPP)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    rays = W * H * SPP * DEPTH * 2
    print(
        f"[{tag}] {rays / best / 1e6:8.2f} Mrays/s  "
        f"({best * 1e3:.1f} ms run, {t_compile:.1f} s compile) "
        f"mean={float(np.asarray(out['color']).mean()) / SPP:.4f}",
        flush=True,
    )
    return rays / best


def hlo_stats():
    """Compiled-module op census for ONE bounce-depth-1 1-sample pass:
    how many fusions/gathers/reduces actually launch."""
    scene = cornell_box(width=W, height=H)
    data = scene.build()
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    fn = jax.jit(
        functools.partial(
            render_pass, width=W, height=H, max_depth=1, tracer=tracer,
            depth_unroll=1, sample_unroll=1,
        ),
        static_argnames=("n_samples",),
    )
    try:
        compiled = fn.lower(data, cam, jax.random.key(0), 0, 1).compile()
        txt = compiled.as_text()
        import re

        ops = {}
        for m in re.finditer(r"^\s*(?:ROOT )?\S+ = \S+ (\w+)\(", txt, re.M):
            ops[m.group(1)] = ops.get(m.group(1), 0) + 1
        top = sorted(ops.items(), key=lambda kv: -kv[1])[:14]
        print(f"[hlo] total instructions: {sum(ops.values())}", flush=True)
        print(f"[hlo] top ops: {top}", flush=True)
        fus = txt.count("fusion(")
        print(
            f"[hlo] fusion calls: {fus}, gathers: {ops.get('gather', 0)}, "
            f"while: {ops.get('while', 0)}, custom: {ops.get('custom-call', 0)}",
            flush=True,
        )
        # entry computation kernel-ish count: top-level instructions
        entry = txt.split("ENTRY")[1] if "ENTRY" in txt else txt
        entry_ops = {}
        for m in re.finditer(r"^\s*(?:ROOT )?\S+ = \S+ (\S+?)\(", entry, re.M):
            entry_ops[m.group(1)] = entry_ops.get(m.group(1), 0) + 1
        print(f"[hlo] ENTRY ops: {sorted(entry_ops.items(), key=lambda kv: -kv[1])[:14]}", flush=True)
    except Exception as e:  # remote-compile paths may not expose text
        print(f"[hlo] unavailable: {type(e).__name__}: {e}", flush=True)


def fwd_bwd():
    scene = cornell_box(width=W, height=H)
    data = scene.build()
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    params = {
        "emission": data.emission,
        "lobe_weight": data.lobe_weight,
        "vertices": data.vertices,
    }

    def loss(params, data):
        import dataclasses

        d2 = dataclasses.replace(data, **params)
        out = render_pass(
            d2, cam, jax.random.key(0), 0, SPP,
            width=W, height=H, max_depth=DEPTH, tracer=tracer,
            depth_unroll=DEPTH, sample_unroll=4,
        )
        return out["color"].sum()

    g = jax.jit(jax.grad(loss))
    t0 = time.time()
    r = g(params, data)
    jax.block_until_ready(r)
    t_compile = time.time() - t0
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(g(params, data))
        best = min(best, time.time() - t0)
    rays = W * H * SPP * DEPTH * 2
    print(
        f"[fwd+bwd] {rays / best / 1e6:8.2f} Mrays/s  "
        f"({best * 1e3:.1f} ms, compile {t_compile:.1f} s)",
        flush=True,
    )


def textured():
    from phosphorus_mk2_tpu.core.texture import Texture

    scene = cornell_box(width=W, height=H)
    rng_np = np.random.default_rng(0)
    img = rng_np.random((256, 256, 3), dtype=np.float32)
    tid = scene.add_texture(Texture(image=img))
    for m in scene.materials:
        if m.lobes:
            m.lobes[0].texture = tid
    bench_config("textured", scene, depth_unroll=DEPTH, sample_unroll=4)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    bench_config(
        "consolidated", cornell_box(width=W, height=H),
        depth_unroll=DEPTH, sample_unroll=4,
    )
    textured()
    fwd_bwd()
    hlo_stats()


if __name__ == "__main__":
    main()
