"""Multi-BSDF pipeline timing (type-sorted dispatch benefit)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import functools, time
import jax
import numpy as np

def main():
    print(jax.devices(), flush=True)
    from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
    from phosphorus_mk2_tpu.core.camera import camera_to_params
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
    from phosphorus_mk2_tpu.scenes import multi_bsdf_scene

    W = H = 256
    scene = multi_bsdf_scene(width=W, height=H)
    data = attach_bvh(scene.build())
    print("tris:", data.faces.shape[0], "types:", data.lobe_types_present, flush=True)
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=True)
    key = jax.random.key(0)
    fn = jax.jit(functools.partial(render_pass, width=W, height=H,
                                   max_depth=8, tracer=tracer,
                                   depth_unroll=8, sample_unroll=4),
                 static_argnames=("n_samples",))
    out = fn(data, cam, key, 0, 4)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(data, cam, key, 4, 4)
    jax.block_until_ready(out)
    dt = time.time() - t0
    rays = W * H * 4 * 8 * 2
    print(f"multi_bsdf 4spp depth8: {dt:.2f}s  {rays/dt/1e6:.2f} Mray/s "
          f"({dt/4:.2f} s/spp; showcase baseline was 0.99 s/spp)", flush=True)
    print("mean:", float(np.asarray(out["color"]).mean()) / 4, flush=True)

if __name__ == "__main__":
    main()
