"""BASELINE configs 4 + 5 on the imported BMW-class Alembic asset.

Config 4: full render of the ~1M-tri multi-mesh archive imported through
the native Ogawa reader (the reference's headline BMW render,
README.md "Example Renders", importer src/codecs/scene/alembic.hpp).
Config 5: differentiable inverse rendering on the same asset — recover
body albedo + lamp emission from a target image via pixel-loss
gradients — plus finite-difference gradient spot-checks.

Batched for one TPU session (the chip is single-client):

    python tools/bmw_configs.py [--spp 16] [--res 1024] 2>&1 | tee /tmp/bmw.log

Outputs: examples/renders/bmw_config4.png/.exr, bmw_inverse_{target,
before,after}.png, and a JSON summary line per config.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "examples", "renders")


def save_png(path, img):
    from PIL import Image

    arr = (np.clip(np.asarray(img), 0, 1) ** (1 / 2.2) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
    print(f"saved {path}", flush=True)


def config4(abc_path, res, spp, depth):
    import jax

    import bmw_asset
    from phosphorus_mk2_tpu.core.options import Options
    from phosphorus_mk2_tpu.io.exr import write_film
    from phosphorus_mk2_tpu.renderer import Renderer

    t0 = time.time()
    scene = bmw_asset.load_scene(abc_path, res, res)
    n_tris = sum(m.faces.shape[0] for m in scene.meshes)
    t_import = time.time() - t0
    print(f"[config4] imported {len(scene.meshes)} meshes, {n_tris} tris "
          f"in {t_import:.1f} s", flush=True)

    opts = Options(
        samples_per_pixel=spp, samples_per_pass=min(4, spp), path_depth=depth,
        use_bvh=True, verbose=True,
        # the 887k-tri cluster program at a 131k chunk is already huge;
        # unrolling multiplies compile time (a depth-5-unrolled variant
        # was still in remote compile after 25 min)
        depth_unroll=1, sample_unroll=1,
        # spec-scale runs (1024^2 x 512 spp ~ 2 h) must be restartable:
        # stamped film checkpoints every 8 passes (32 spp)
        checkpoint_dir="/tmp/bmw_c4_ck", checkpoint_every=8,
    )
    t0 = time.time()
    r = Renderer(scene, opts)
    t_build = time.time() - t0
    print(f"[config4] scene+BVH build {t_build:.1f} s", flush=True)

    t0 = time.time()
    film = r.render()
    dt = time.time() - t0
    rays = res * res * spp * depth * 2
    print(f"[config4] render {dt:.1f} s ({rays / dt / 1e6:.2f} Mrays/s incl "
          f"compile)", flush=True)

    os.makedirs(OUT_DIR, exist_ok=True)
    save_png(os.path.join(OUT_DIR, "bmw_config4.png"), film["color"])
    write_film(os.path.join(OUT_DIR, "bmw_config4.exr"), film)
    img = np.asarray(film["color"])
    ok = bool(np.isfinite(img).all() and img.max() > 0)
    print(json.dumps({
        "config": 4, "tris": int(n_tris), "res": res, "spp": spp,
        "depth": depth, "render_s": round(dt, 1),
        "mrays_per_s": round(rays / dt / 1e6, 2), "finite": ok,
        "mean": round(float(img.mean()), 5),
    }), flush=True)


def config5(abc_path, res=192, spp=4, depth=3, steps=40):
    import dataclasses

    import jax
    import jax.numpy as jnp

    import bmw_asset
    from phosphorus_mk2_tpu.optim import InverseRenderer

    scene = bmw_asset.load_scene(abc_path, res, res)

    # ground truth render = target
    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.core.camera import camera_to_params
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass

    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=True)
    import functools

    fn = jax.jit(
        functools.partial(
            render_pass, width=res, height=res, max_depth=depth, tracer=tracer,
            depth_unroll=depth,
        ),
        static_argnames=("n_samples",),
    )
    t0 = time.time()
    tgt_spp = 16
    out = fn(data, cam, jax.random.key(7), 0, tgt_spp)
    target = np.asarray(out["color"]).reshape(res, res, 3) / tgt_spp
    print(f"[config5] target render {time.time()-t0:.1f} s", flush=True)
    os.makedirs(OUT_DIR, exist_ok=True)
    save_png(os.path.join(OUT_DIR, "bmw_inverse_target.png"), target)

    # perturb: grey body, dim lamp — recover via gradients
    true_body_w = None
    pert = scene
    body_mid = pert._material_ids["body"]
    lamp_mid = pert._material_ids["lamp"]
    true_body_w = tuple(pert.materials[body_mid].lobes[0].weight)
    true_lamp_e = tuple(pert.materials[lamp_mid].emission)
    pert.materials[body_mid].lobes[0].weight = (0.35, 0.35, 0.35)
    pert.materials[lamp_mid].emission = tuple(
        0.3 * e for e in true_lamp_e
    )

    # log-space emission + double-sample unbiased loss: the raw
    # single-render MSE provably prefers dimmer lamps (its variance term
    # depends on the parameters — tools/bmw_c5_probe.py) and absolute
    # Adam steps crawl across the ~9-unit emission gap
    inv = InverseRenderer(
        pert, target, trainable=("emission", "lobe_weight"),
        learning_rate=8e-2, spp=2 * spp, max_depth=depth, use_bvh=True,
        seed=3, log_emission=True, unbiased_loss=True,
    )
    before = np.asarray(inv.current_scene().emission), np.asarray(
        inv.current_scene().lobe_weight
    )
    img_before = np.asarray(
        fn(
            dataclasses.replace(
                data,
                emission=inv.params["emission"],
                lobe_weight=inv.params["lobe_weight"],
            ),
            cam, jax.random.key(7), 0, tgt_spp,
        )["color"]
    ).reshape(res, res, 3) / tgt_spp
    save_png(os.path.join(OUT_DIR, "bmw_inverse_before.png"), img_before)

    t0 = time.time()
    losses = inv.run(steps, log_every=max(1, steps // 8))
    dt = time.time() - t0
    print(f"[config5] {steps} steps in {dt:.1f} s "
          f"({dt/steps:.2f} s/step)", flush=True)

    rec = inv.current_scene()
    img_after = np.asarray(
        fn(
            dataclasses.replace(
                data, emission=rec.emission, lobe_weight=rec.lobe_weight
            ),
            cam, jax.random.key(7), 0, tgt_spp,
        )["color"]
    ).reshape(res, res, 3) / tgt_spp
    save_png(os.path.join(OUT_DIR, "bmw_inverse_after.png"), img_after)

    rec_body = np.asarray(rec.lobe_weight)[body_mid, 0]
    rec_lamp = np.asarray(rec.emission)[lamp_mid]
    print(f"[config5] body weight: true {true_body_w} recovered {rec_body}",
          flush=True)
    print(f"[config5] lamp emission: true {true_lamp_e} recovered {rec_lamp}",
          flush=True)
    print(json.dumps({
        "config": 5, "steps": steps, "loss_first": round(float(losses[0]), 6),
        "loss_last": round(float(losses[-1]), 6),
        "body_err": round(float(np.abs(rec_body - np.array(true_body_w)).max()), 4),
        "lamp_err_rel": round(float(
            np.abs(rec_lamp - np.array(true_lamp_e)).max()
            / max(true_lamp_e)
        ), 4),
    }), flush=True)

    # finite-difference gradient spot-checks (fixed RNG)
    fd_res, fd_spp, fd_depth = 64, 2, 2
    sc2 = bmw_asset.load_scene(abc_path, fd_res, fd_res)
    d2 = attach_bvh(sc2.build())
    cam2 = camera_to_params(sc2.camera)
    tr2 = make_tracer(d2, use_bvh=True)
    key = jax.random.key(11)

    def loss_of(emission, lobe_weight):
        dd = dataclasses.replace(d2, emission=emission, lobe_weight=lobe_weight)
        out = render_pass(
            dd, cam2, key, 0, fd_spp, width=fd_res, height=fd_res,
            max_depth=fd_depth, tracer=tr2, depth_unroll=fd_depth,
            sorted_dispatch=False,
        )
        return (out["color"] / fd_spp).mean()

    loss_j = jax.jit(loss_of)
    g = jax.jit(jax.grad(loss_of, argnums=(0, 1)))(d2.emission, d2.lobe_weight)
    checks = []
    for name, field, idx in (
        ("lamp_emission_g", 0, (lamp_mid, 1)),
        ("body_albedo_r", 1, (body_mid, 0, 0)),
    ):
        eps = 1e-2
        base = (np.asarray(d2.emission), np.asarray(d2.lobe_weight))
        hi = [a.copy() for a in base]
        lo = [a.copy() for a in base]
        hi[field][idx] += eps
        lo[field][idx] -= eps
        f_hi = float(loss_j(jnp.asarray(hi[0]), jnp.asarray(hi[1])))
        f_lo = float(loss_j(jnp.asarray(lo[0]), jnp.asarray(lo[1])))
        fd = (f_hi - f_lo) / (2 * eps)
        ad = float(np.asarray(g[field])[idx])
        rel = abs(fd - ad) / max(abs(fd), abs(ad), 1e-12)
        checks.append({"param": name, "fd": fd, "ad": ad, "rel_err": rel})
        print(f"[config5-fd] {name}: fd={fd:.6e} ad={ad:.6e} rel={rel:.4f}",
              flush=True)
    print(json.dumps({"config": "5-fd", "checks": checks}), flush=True)


def main():
    args = sys.argv[1:]
    res = int(args[args.index("--res") + 1]) if "--res" in args else 1024
    spp = int(args[args.index("--spp") + 1]) if "--spp" in args else 16
    depth = int(args[args.index("--depth") + 1]) if "--depth" in args else 5
    scale = float(args[args.index("--scale") + 1]) if "--scale" in args else 1.0
    abc_path = args[args.index("--abc") + 1] if "--abc" in args else "/tmp/bmw_class.abc"
    if "--cpu" in args:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import bmw_asset

    if not os.path.exists(abc_path):
        bmw_asset.write_asset(abc_path, scale=scale)

    if "--skip4" not in args:
        config4(abc_path, res, spp, depth)
    if "--skip5" not in args:
        inv_res = int(args[args.index("--invres") + 1]) if "--invres" in args else 192
        steps = int(args[args.index("--steps") + 1]) if "--steps" in args else 40
        config5(abc_path, res=inv_res, steps=steps)


if __name__ == "__main__":
    main()
