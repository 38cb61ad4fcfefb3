"""Round-4 TPU batch N: where does the trace time sit AFTER the
extraction rewrite (141.1 ms) and the pallas_full fix (135.9 ms)?

  1. front-only: XLA hierarchical front vs front_all_pallas, N=131k —
     the r4m full-trace delta (5.2 ms) is far below the predicted
     ~60 ms; measure the stage directly before blaming either half.
  2. chunk x recompact re-sweep on the new wave body (the old optimum
     chunk=2048/recompact=8 was tuned when extraction dominated).
  3. full render_pass 512^2 spp4 depth4 with the best trace config —
     the number the bench's bmw_live line tracks.

pallas variants in fresh subprocesses (compile-failure poisoning).

    python tools/tpu_r4n_front.py 2>&1 | tee /tmp/tpu_r4n.log
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))


def timed(f, *a, reps=3):
    import jax
    out = jax.block_until_ready(f(*a))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(f(*a))
        best = min(best, time.time() - t0)
    return best, out


def J(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bmw_asset
    from phosphorus_mk2_tpu.accel import cluster_traverse as ct
    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays

    print(f"devices: {jax.devices()}", flush=True)
    N = 1 << 17
    scene = bmw_asset.load_scene("/tmp/bmw_class.abc", 512, 512)
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    ids = jnp.arange(N, dtype=jnp.int32)
    px, py = ids % 512, (ids // 512) % 512
    u = jnp.full((N, 2), 0.5)
    p, d = generate_rays(cam, px, py, u, u)
    tl = jnp.full((N,), ct.T_MAX)

    # --- 1a. XLA front-only --------------------------------------------
    def front_xla(p, d):
        return ct._front_table_hierarchical(
            p, d, data.bvh, tl, 32, expand_batch=1, slab_bf16=False,
            levels=2, sc_topk="extract")

    b, _ = timed(jax.jit(front_xla), p, d)
    J(front_xla_ms=round(b * 1e3, 1))

    # --- 2. chunk x recompact on the new wave body ---------------------
    base = None
    for tune in ({"front_k": 32, "recompact": 8},
                 {"front_k": 32, "recompact": 8, "chunk": 4096},
                 {"front_k": 32, "recompact": 4},
                 {"front_k": 32, "recompact": 16, "chunk": 4096},
                 {"front_k": 48, "recompact": 8},
                 ):
        fn = jax.jit(lambda p, d, tune=tune:
                     ct.intersect_clusters(data, p, d, **tune))
        b, out = timed(fn, p, d)
        key = (int(np.asarray(out["hit"]).sum()),
               int(np.asarray(out["tri"]).sum()))
        if base is None:
            base = key
        J(trace=str(tune), ms=round(b * 1e3, 1),
          mrays=round(N / b / 1e6, 2), match=key == base)

    # --- 3. full render at the default config --------------------------
    import functools
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass

    res = 512
    tracer = make_tracer(data, use_bvh=True)
    fn = jax.jit(functools.partial(
        render_pass, width=res, height=res, max_depth=4, tracer=tracer,
        depth_unroll=4), static_argnames=("n_samples",))
    key = jax.random.key(1)
    b, out = timed(lambda: fn(data, cam, key, 0, 4), reps=2)
    rays = res * res * 4 * 4  # spp x avg-ish depth upper bound
    J(render_512_spp4_d4_s=round(b, 2),
      mrays_upper=round(rays / b / 1e6, 2),
      mean=float(np.asarray(out["color"]).mean()))


CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
sys.path.insert(0, {here!r})
import jax, jax.numpy as jnp
import numpy as np
import bmw_asset
from phosphorus_mk2_tpu.accel import cluster_traverse as ct
from phosphorus_mk2_tpu.accel import pallas_front as pf
from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.core.camera import camera_to_params, generate_rays

N = 1 << 17
scene = bmw_asset.load_scene("/tmp/bmw_class.abc", 512, 512)
data = attach_bvh(scene.build())
cam = camera_to_params(scene.camera)
ids = jnp.arange(N, dtype=jnp.int32)
px, py = ids % 512, (ids // 512) % 512
u = jnp.full((N, 2), 0.5)
p, d = generate_rays(cam, px, py, u, u)
tl = jnp.full((N,), ct.T_MAX)
bvh = data.bvh
bounds6 = jnp.concatenate([bvh["sc_bmin"], bvh["sc_bmax"]], axis=1)
rb = {rb}

def front(p, d):
    return pf.front_all_pallas(bounds6, bvh["sc_member_bmin"],
                               bvh["sc_member_bmax"], p, d, tl,
                               jj=16, kk=32, ray_block=rb)
fn = jax.jit(front)
out = jax.block_until_ready(fn(p, d))
best = 1e9
for _ in range(3):
    t0 = time.time(); out = jax.block_until_ready(fn(p, d))
    best = min(best, time.time() - t0)
print(json.dumps(dict(front_pallas_rb=rb, ms=round(best*1e3, 1))), flush=True)
"""


def pallas_front_only():
    for rb in (128, 64):
        code = CHILD.format(repo=os.path.dirname(HERE), here=HERE, rb=rb)
        print(f"=== r4n pallas front rb={rb} ===", flush=True)
        subprocess.run([sys.executable, "-c", code], timeout=2400)


if __name__ == "__main__":
    pallas_front_only()
    main()
