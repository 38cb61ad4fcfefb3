"""Benchmark: path-tracing throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric (BASELINE.json: "rays/sec/chip fwd+bwd"): forward AND
backward wavefront rays per second on the Cornell-box scene — a render
pass plus the gradient of the pixel sum w.r.t. emission, lobe weights
and vertex positions. rays = W*H*spp*max_depth*2 (closest + shadow per
bounce; the dense wavefront really issues all of them).

vs_baseline: the reference renderer (C++/AVX2) publishes no numbers and
cannot be built in this container (BASELINE.md, VALIDATION.md), so the
baseline is MEASURED here instead of guessed: the same integrator, same
scene, same spp/depth, run on this host's CPU via the XLA CPU backend —
a stand-in for "a well-optimized CPU wavefront tracer on the hardware
physically attached to this chip". vs_baseline = TPU fwd+bwd rays/s
divided by host-CPU fwd+bwd rays/s. Extra fields report the forward-only
throughput, the measured per-scan-iteration launch floor, and an HBM
roofline estimate (bytes-per-ray model / measured chip bandwidth) so the
distance to speed-of-light is visible (the pipeline is launch-bound, not
bandwidth-bound — CLAUDE.md perf rules).
"""
from __future__ import annotations

import dataclasses
import functools
import json
import sys
import time


WIDTH = HEIGHT = 256
SPP = 16
MAX_DEPTH = 4

# HBM traffic model: ~36 f32 of per-ray carry state (p/d/beta/radiance/
# aux) + ~1 (rays x 128-tri chunk) intermediate crossing one fusion
# boundary, read+written once per bounce.
HBM_BYTES_PER_RAY = (36 * 4) * 2 + 128 * 4
HBM_GBPS = 819.0  # v5e HBM bandwidth (public spec)

CPU_SPP = 2  # baseline measured at reduced spp, scaled by ray count


def _timed(fn, *args, reps=2):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best, out


def _launch_floor():
    """Per-scan-iteration overhead: a null scan body, ms/iter."""
    import jax
    import jax.numpy as jnp

    K = 64
    f = jax.jit(
        lambda c: jax.lax.scan(lambda c, _: (c + 1.0, None), c, None, length=K)[0]
    )
    best, _ = _timed(f, jnp.float32(0), reps=3)
    return best / K * 1e3


def main() -> int:
    import jax
    import numpy as np

    from phosphorus_mk2_tpu.core.camera import camera_to_params
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
    from phosphorus_mk2_tpu.scenes import cornell_box

    scene = cornell_box(width=WIDTH, height=HEIGHT)
    data = scene.build()
    cam = camera_to_params(scene.camera)
    # XLA brute tracer: in-pipeline fusion beats the isolated Pallas
    # kernel win (the pallas_call is a fusion barrier; see CLAUDE.md).
    tracer = make_tracer(data, use_bvh=False)
    key = jax.random.key(0)

    kw = dict(
        width=WIDTH, height=HEIGHT, max_depth=MAX_DEPTH, tracer=tracer,
        depth_unroll=MAX_DEPTH, sample_unroll=4,
    )
    fwd = jax.jit(
        functools.partial(render_pass, **kw), static_argnames=("n_samples",)
    )

    # grad path: FULL sample unroll — no sample scan at all, so the
    # backward fuses across samples (measured r4: 27.7 -> 32.1 Mrays/s;
    # partial unroll 8 was WORSE, 26.3 — tools/tpu_r4e_front.py).
    # Forward keeps unroll 4 (full unroll is neutral there, r2).
    kw_grad = dict(kw, sample_unroll=SPP)

    def loss(params, data, key, n):
        d2 = dataclasses.replace(data, **params)
        return render_pass(d2, cam, key, 0, n, **kw_grad)["color"].sum()

    grad = jax.jit(jax.grad(loss), static_argnames=("n",))
    params = {
        "emission": data.emission,
        "lobe_weight": data.lobe_weight,
        "vertices": data.vertices,
    }

    # warmup/compile with the SAME static args as the timed calls
    rays = WIDTH * HEIGHT * SPP * MAX_DEPTH * 2
    t_fwd, out = _timed(lambda: fwd(data, cam, key, SPP, SPP))
    fwd_rays = rays / t_fwd
    t_bwd, _ = _timed(lambda: grad(params, data, key, SPP))
    fwdbwd_rays = rays / t_bwd

    # gradient-scoped variant (round 5): materials/emission training
    # with the vertex-grad chains severed (trainable=)
    def loss_s(params, data, key, n):
        d2 = dataclasses.replace(data, **params)
        return render_pass(
            d2, cam, key, 0, n, trainable=("emission", "lobe_weight"),
            **kw_grad,
        )["color"].sum()

    grad_s = jax.jit(jax.grad(loss_s), static_argnames=("n",))
    params_s = {"emission": data.emission, "lobe_weight": data.lobe_weight}
    t_bs, _ = _timed(lambda: grad_s(params_s, data, key, SPP))
    scoped_rays = rays / t_bs

    mean = float(np.asarray(out["color"]).mean()) / SPP
    ok = bool(np.isfinite(mean) and mean > 0.0)

    floor_ms = _launch_floor()
    hbm_roofline = HBM_GBPS * 1e9 / HBM_BYTES_PER_RAY  # rays/s if HBM-bound

    # measured CPU baseline (same integrator/scene on the host CPU)
    baseline = None
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            data_c = jax.device_put(data, cpu)
            params_c = jax.device_put(params, cpu)
            key_c = jax.device_put(key, cpu)
            cam_c = jax.device_put(cam, cpu)

            def loss_c(params, data, key, n):
                d2 = dataclasses.replace(data, **params)
                return render_pass(d2, cam_c, key, 0, n, **kw)["color"].sum()

            grad_c = jax.jit(jax.grad(loss_c), static_argnames=("n",))
            t_c, _ = _timed(lambda: grad_c(params_c, data_c, key_c, CPU_SPP), reps=1)
            baseline = WIDTH * HEIGHT * CPU_SPP * MAX_DEPTH * 2 / t_c
    except Exception:
        baseline = None

    # --- second always-on line: the PRODUCTION path (Renderer + cluster
    # BVH traversal), so a traversal regression moves BENCH_r*.json even
    # though the headline line uses the brute tracer (round-2 verdict
    # item 4). Timed via the Renderer's own jitted sharded pass fn.
    bvh_line = None
    try:
        from phosphorus_mk2_tpu.core.options import Options
        from phosphorus_mk2_tpu.renderer import Renderer

        scene_b = cornell_box(width=WIDTH, height=HEIGHT)
        opts = Options(
            use_bvh=True, samples_per_pixel=SPP, samples_per_pass=SPP,
            path_depth=MAX_DEPTH,
        )
        r = Renderer(scene_b, opts)
        t_bvh, out_b = _timed(lambda: r.fn(r.data, r.key, 0, SPP))
        bvh_rays = rays / t_bvh
        mean_b = float(np.asarray(out_b["color"]).mean()) / SPP
        ok = ok and bool(np.isfinite(mean_b) and mean_b > 0.0)

        bvh_baseline = None
        with jax.default_device(jax.devices("cpu")[0]):
            data_b = jax.device_put(r.data, jax.devices("cpu")[0])
            cam_b = jax.device_put(cam, jax.devices("cpu")[0])
            tr_c = make_tracer(data_b, use_bvh=True)
            fwd_c = jax.jit(
                functools.partial(
                    render_pass, width=WIDTH, height=HEIGHT,
                    max_depth=MAX_DEPTH, tracer=tr_c, depth_unroll=1,
                ),
                static_argnames=("n_samples",),
            )
            t_cb, _ = _timed(
                lambda: fwd_c(data_b, cam_b, jax.device_put(
                    key, jax.devices("cpu")[0]), 0, CPU_SPP),
                reps=1,
            )
            bvh_baseline = WIDTH * HEIGHT * CPU_SPP * MAX_DEPTH * 2 / t_cb
        bvh_line = {
            "metric": "cornell_bvh_renderer_fwd_rays_per_sec",
            "value": round(bvh_rays, 1),
            "unit": "rays/s",
            "vs_baseline": (
                round(bvh_rays / bvh_baseline, 4) if bvh_baseline else None
            ),
            "baseline_cpu_fwd_rays_per_sec": (
                round(bvh_baseline, 1) if bvh_baseline else None
            ),
            "mean": round(mean_b, 5),
            "note": (
                "production Renderer pass (sharded, cluster BVH "
                "traversal); baseline = same integrator+tracer on the "
                "host CPU"
            ),
        }
    except Exception as e:  # the headline line must still print
        bvh_line = {"metric": "cornell_bvh_renderer_fwd_rays_per_sec",
                    "error": repr(e)[:300]}

    result = {
        "metric": "cornell_fwd_bwd_rays_per_sec",
        "value": round(fwdbwd_rays, 1),
        "unit": "rays/s",
        "vs_baseline": round(fwdbwd_rays / baseline, 4) if baseline else None,
        "fwd_rays_per_sec": round(fwd_rays, 1),
        "scoped_emlw_rays_per_sec": round(scoped_rays, 1),
        "baseline_cpu_fwd_bwd_rays_per_sec": round(baseline, 1) if baseline else None,
        "launch_floor_ms_per_scan_iter": round(floor_ms, 4),
        "hbm_roofline_rays_per_sec": round(hbm_roofline, 1),
        "roofline_note": (
            "pipeline is launch/overhead-bound, not HBM-bound: roofline is "
            f"{hbm_roofline / max(fwd_rays, 1):.0f}x the fwd throughput; "
            "baseline is the same integrator measured on the host CPU "
            "(reference C++ unbuildable here, publishes no numbers)"
        ),
    }
    print(json.dumps(result))
    if bvh_line is not None:
        print(json.dumps(bvh_line))

    # third always-on line: LIVE BMW-scale measurement (887k tris) so a
    # traversal regression at scale moves BENCH_r*.json (round-3 verdict
    # item 3: the previous pasted constants were regression-blind)
    try:
        print(json.dumps(bmw_live()))
    except Exception as e:  # the first two lines must still print
        print(json.dumps({"metric": "bmw_live_fwd_rays_per_sec",
                          "error": repr(e)[:300]}))

    if "--bmw" in sys.argv:
        # each --bmw extra in its own SUBPROCESS: bmw_live already ran
        # a pallas-bearing program in this process, and the axon client
        # cannot reliably compile another one afterwards (the round-4
        # poisoning pattern — see bmw_live's decomposition note)
        import os
        import subprocess

        # one subprocess per metric: each compiles a pallas-bearing
        # program, and the axon client cannot compile a second one
        # in-process (round-4 poisoning pattern)
        for fn_name in ("bmw_extra", "bmw_fwd_bwd", "bmw_fwd_bwd_scoped"):
            child = (
                "import sys, json\n"
                f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})\n"
                "import bench\n"
                f"print(json.dumps(bench.{fn_name}()), flush=True)\n"
            )
            res = subprocess.run([sys.executable, "-c", child],
                                 timeout=7200, capture_output=True,
                                 text=True)
            emitted = False
            for ln in res.stdout.splitlines():
                if ln.startswith("{"):
                    print(ln)
                    emitted = True
            if not emitted:
                print(json.dumps({
                    "metric": fn_name,
                    "error": (res.stderr or "no output")[-300:],
                }))
    return 0 if ok else 1


# Host-CPU BMW baseline, measured by tools/r3_cpu_baseline.py.
# HONEST FRAMING (round-3 verdict item 5): this denominator is THIS
# framework's integrator on this host's 2-core XLA-CPU backend — NOT
# the reference. The reference's AVX2 stream-BVH tracer on a real
# workstation would plausibly run 1e5-1e6 rays/s (it is unbuildable in
# this container and publishes no numbers), so bmw_vs_baseline is a
# portability ratio, not evidence of beating the reference; the
# roofline fields below are the honest absolute-performance framing.
BMW_CPU_BASELINE = 2170.6
# Measured gather bandwidth at BMW scale: cluster-row gathers sustain
# ~125 GB/s (tools/tpu_r3c_levers.py, round 3) re-measured at
# 141-150 GB/s in round 4 (tools/tpu_r4l_dedup.py expA — and shown to
# be LOCALITY-INDEPENDENT: same rate for duplicate/sorted/small-table
# indices). Roofline uses the round-4 midpoint.
GATHER_GBPS = 145.0


def bmw_live() -> dict:
    """Always-on LIVE BMW-scale line: a 1<<17-ray closest-hit trace on
    the 887k-tri asset (cached in /tmp), plus a front-table-only timing
    so the wave loop's achieved gather GB/s vs the measured 125 GB/s
    roofline is reported live (round-3 verdict items 3 and 5)."""
    import functools
    import os
    import sys as _sys

    import jax
    import jax.numpy as jnp
    import numpy as np

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    import bmw_asset

    from phosphorus_mk2_tpu.accel import cluster_traverse as ct
    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays

    abc = "/tmp/bmw_class.abc"
    if not os.path.exists(abc):
        bmw_asset.write_asset(abc, scale=1.0)
    N = 1 << 17
    scene = bmw_asset.load_scene(abc, 512, 512)
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    ids = jnp.arange(N, dtype=jnp.int32)
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, ids % 512, (ids // 512) % 512, u, u)

    trace = jax.jit(lambda p, d: ct.intersect_clusters(data, p, d))
    t_trace, out = _timed(lambda: trace(p, d))
    hits = int(np.asarray(out["hit"]).sum())

    # decomposition: front-table-only time + per-ray cluster overlap ->
    # wave-loop bytes -> achieved gather GB/s
    kk = min(ct.MAX_FRONT, data.bvh["cluster_bmin"].shape[0])

    # decomposition in a SUBPROCESS: the axon client cannot reliably
    # compile a second pallas-bearing program after one has already run
    # in this process (compiles start failing with a bare
    # InvalidArgument — measured in round 4; tools/tpu_r4*-series
    # batches isolate every pallas jit for the same reason). A fresh
    # process times the fused front (36.7 ms, tools/tpu_r4o_frontv2.py
    # form) and reports the overlap count; the LIVE trace metric above
    # never depends on the decomposition succeeding.
    decomp = {}
    try:
        import subprocess
        import sys as _ssys

        child = (
            "import json,sys,time\n"
            f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})\n"
            f"sys.path.insert(0, {os.path.join(os.path.dirname(os.path.abspath(__file__)), 'tools')!r})\n"
            "import jax, jax.numpy as jnp, numpy as np\n"
            "import bmw_asset\n"
            "from phosphorus_mk2_tpu.accel import cluster_traverse as ct\n"
            "from phosphorus_mk2_tpu.accel.pallas_front import front_all_pallas\n"
            "from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh\n"
            "from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays\n"
            f"N = {N}\n"
            "scene = bmw_asset.load_scene('/tmp/bmw_class.abc', 512, 512)\n"
            "data = attach_bvh(scene.build())\n"
            "cam = camera_to_params(scene.camera)\n"
            "ids = jnp.arange(N, dtype=jnp.int32)\n"
            "u = jnp.full((N, 2), 0.5)\n"
            "p, d = generate_rays(cam, ids % 512, (ids // 512) % 512, u, u)\n"
            "bvh = data.bvh\n"
            "b6 = jnp.concatenate([bvh['sc_bmin'], bvh['sc_bmax']], axis=1)\n"
            "tl = jnp.full((N,), ct.T_MAX)\n"
            f"kk = {kk}\n"
            "fr = jax.jit(lambda p, d: (front_all_pallas(b6,"
            " bvh['sc_member_bmin'], bvh['sc_member_bmax'], p, d, tl,"
            " jj=ct.SC_FRONT, kk=kk)[0] < ct.T_MAX).sum())\n"
            "out = jax.block_until_ready(fr(p, d))\n"
            "best = 1e9\n"
            "for _ in range(3):\n"
            "    t0 = time.time(); out = jax.block_until_ready(fr(p, d))\n"
            "    best = min(best, time.time() - t0)\n"
            "print('DECOMP ' + json.dumps("
            "dict(t_front=best, overlap=int(out))))\n"
        )
        res = subprocess.run([_ssys.executable, "-c", child], timeout=1800,
                             capture_output=True, text=True)
        line = next(ln for ln in res.stdout.splitlines()
                    if ln.startswith("DECOMP "))
        dj = json.loads(line[len("DECOMP "):])
        t_front, overlap_sum = dj["t_front"], dj["overlap"]
        rows = ct._cluster_rows(data, bf16=False)
        row_bytes = rows.shape[1] * rows.shape[2] * 4
        wave_gb = float(overlap_sum) * row_bytes / 1e9
        t_wave = max(t_trace - t_front, 1e-9)
        decomp = {
            "front_table_ms": round(t_front * 1e3, 1),
            "front_mode": "pallas_full (fresh-process timing)",
            "wave_loop_ms": round(t_wave * 1e3, 1),
            "wave_loop_gather_gb": round(wave_gb, 2),
            "achieved_gather_gbps": round(wave_gb / t_wave, 1),
            "pct_of_gather_roofline": round(
                100 * wave_gb / t_wave / GATHER_GBPS, 1
            ),
        }
    except Exception as e:  # noqa: BLE001 - decomposition best-effort
        decomp = {"decomposition_error": repr(e)[:120]}
    return {
        "metric": "bmw_live_fwd_rays_per_sec",
        "value": round(N / t_trace, 1),
        "unit": "rays/s",
        "trace_ms": round(t_trace * 1e3, 1),
        "hits": hits,
        **decomp,
        "note": (
            "LIVE 1<<17-ray closest-hit trace, 887k-tri Ogawa-imported "
            "asset, production tracer defaults (fused Pallas front on "
            "TPU since round 4); roofline = measured "
            f"{GATHER_GBPS:.0f} GB/s locality-independent cluster-row "
            "gather bandwidth (tools/tpu_r4l_dedup.py expA); bytes = "
            "front-table overlap x row size (upper bound - early-out "
            "culls some)"
        ),
    }


N_BMW, SPP_BMW, DEPTH_BMW = 1 << 16, 2, 3  # bmw grad-step shapes
RES_BMW = 512


def _bmw_grad_setup(fields, trainable):
    """Shared setup for the BMW grad-step metrics: returns
    (grad_fn, params, data, key, rays)."""
    import dataclasses as _dc
    import os
    import sys as _sys

    import jax
    import jax.numpy as jnp

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    import bmw_asset

    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.core.camera import camera_to_params
    from phosphorus_mk2_tpu.integrator.path import (
        make_tracer,
        render_pass_pixels,
    )

    abc = "/tmp/bmw_class.abc"
    if not os.path.exists(abc):
        bmw_asset.write_asset(abc, scale=1.0)
    scene = bmw_asset.load_scene(abc, RES_BMW, RES_BMW)
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=True)
    ids = jnp.arange(N_BMW, dtype=jnp.int32)
    px, py = ids % RES_BMW, (ids // RES_BMW) % RES_BMW
    key = jax.random.key(0)
    params = {f: getattr(data, f) for f in fields}

    def loss(params, data, key):
        d2 = _dc.replace(data, **params)
        out = render_pass_pixels(
            d2, cam, key, 0, SPP_BMW, px, py, max_depth=DEPTH_BMW,
            tracer=tracer, sorted_dispatch=False, trainable=trainable,
        )
        return out["color"].sum()

    rays = N_BMW * SPP_BMW * DEPTH_BMW * 2
    return jax.jit(jax.grad(loss)), params, data, key, rays


def bmw_fwd_bwd() -> dict:
    """--bmw extra: the NORTH-STAR metric on the north-star scene —
    fwd+bwd rays/s on the BMW asset (gradient of a pixel loss through
    the production cluster tracer; round-3 verdict item 2: this number
    had never been measured)."""
    import numpy as np

    grad, params, data, key, rays = _bmw_grad_setup(
        ("emission", "lobe_weight", "vertices"), None
    )
    t_b, g = _timed(lambda: grad(params, data, key))
    finite = all(bool(np.isfinite(np.asarray(v)).all()) for v in g.values())
    return {
        "metric": "bmw_fwd_bwd_rays_per_sec",
        "value": round(rays / t_b, 1),
        "unit": "rays/s",
        "step_ms": round(t_b * 1e3, 1),
        "rays": rays,
        "grads_finite": finite,
        "tris": int(data.faces.shape[0]),
        "wavefront": N_BMW, "spp": SPP_BMW, "depth": DEPTH_BMW,
        "note": (
            "BASELINE.md north star at BMW scale: one value_and_grad "
            "step of a pixel loss (emission+lobe_weight+vertices, "
            "trainable=None) through the production cluster tracer, "
            "1<<16-pixel 512^2-class wavefront. The gradient-scoped "
            "materials/emission variant reports separately "
            "(bmw_fwd_bwd_scoped) — one pallas program per process"
        ),
    }


def bmw_fwd_bwd_scoped() -> dict:
    """--bmw extra: the gradient-SCOPED north-star variant (round 5) —
    emission+lobe_weight training with the vertex-grad chains severed
    (integrator.path trainable=; the loss-side option VERDICT r4
    next #1 named). Own subprocess: one pallas-bearing compile per
    process (axon client limitation)."""
    import numpy as np

    grad_s, params_s, data, key, rays = _bmw_grad_setup(
        ("emission", "lobe_weight"), ("emission", "lobe_weight")
    )
    t_s, g_s = _timed(lambda: grad_s(params_s, data, key))
    finite_s = all(
        bool(np.isfinite(np.asarray(v)).all()) for v in g_s.values()
    )
    return {
        "metric": "bmw_fwd_bwd_scoped_emlw_rays_per_sec",
        "value": round(rays / t_s, 1),
        "unit": "rays/s",
        "step_ms": round(t_s * 1e3, 1),
        "grads_finite": finite_s,
        "rays": rays,
        "wavefront": N_BMW, "spp": SPP_BMW, "depth": DEPTH_BMW,
        "note": (
            "emission+lobe_weight training step with gradient scoping: "
            "grads for those params identical to the full graph, vertex "
            "chains severed (round 5)"
        ),
    }


def bmw_extra() -> dict:
    """Optional second JSON line (--bmw): steady-state throughput on the
    BASELINE BMW-class scene (887k tris through the native Ogawa
    importer) — the scene BASELINE.json's headline metric names. Opt-in
    because asset build + the big cluster-program compile add minutes."""
    import functools
    import os
    import sys as _sys

    import jax
    import numpy as np

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    import bmw_asset

    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.core.camera import camera_to_params
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass

    abc = "/tmp/bmw_class.abc"
    if not os.path.exists(abc):
        bmw_asset.write_asset(abc, scale=1.0)
    RES, SPP, DEPTH = 512, 4, 4
    scene = bmw_asset.load_scene(abc, RES, RES)
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=True)
    fn = jax.jit(
        functools.partial(render_pass, width=RES, height=RES,
                          max_depth=DEPTH, tracer=tracer, depth_unroll=1),
        static_argnames=("n_samples",),
    )
    key = jax.random.key(0)
    rays = RES * RES * SPP * DEPTH * 2
    best, out = _timed(lambda: fn(data, cam, key, 0, SPP))
    mean = float(np.asarray(out["color"]).mean()) / SPP
    return {
        "metric": "bmw_fwd_rays_per_sec",
        "value": round(rays / best, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays / best / BMW_CPU_BASELINE, 1),
        "baseline_cpu_fwd_rays_per_sec": BMW_CPU_BASELINE,
        "tris": int(data.faces.shape[0]),
        "res": RES, "spp": SPP, "depth": DEPTH,
        "mean": round(mean, 5),
        "note": (
            "887k-tri Ogawa-imported asset; treelet clusters + extract "
            "selection (round-3, tools/tpu_r3_front.py). vs_baseline "
            "denominator is THIS framework on the host's 2-core XLA-CPU "
            "(tools/r3_cpu_baseline.py) — NOT the reference; the "
            "reference's AVX2 tracer on a workstation would plausibly "
            "run 1e5-1e6 rays/s (unbuildable here, publishes none)"
        ),
    }


if __name__ == "__main__":
    sys.exit(main())
