"""High-level render session: device mesh, passes, checkpoint/resume.

Counterpart of the reference's device/runtime layer — ``xpu_t``
discover/preprocess/start/join (reference src/xpu.hpp:12-39) and the
Blender ``session_t`` (reference plugins/blender/session.cpp:19-168) —
reimagined for TPU:

* "discover" = jax.devices() -> a wave Mesh (parallel/sharding.py);
* "preprocess" = Scene.build() + BVH build + device_put (replicated);
* "start/join" = jitted SPMD render passes; progressive accumulation is
  device-resident sums, gathered to host only for output;
* checkpoint/resume (absent in the reference, SURVEY.md §5.4): film
  sums + sample counter + RNG seed are written per pass, so a killed
  render resumes exactly.
"""
from __future__ import annotations

import os
import time

import jax
import numpy as np

from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.core.options import Options
from phosphorus_mk2_tpu.core.scene import Scene
from phosphorus_mk2_tpu.parallel.sharding import (
    gather_film,
    make_sharded_render,
    make_wave_mesh,
)


class Renderer:
    def __init__(self, scene: Scene, options: Options | None = None,
                 n_devices=None, mesh=None):
        """mesh: optional prebuilt jax.sharding.Mesh (e.g. the
        production 2-D (host, chip) mesh from parallel.distributed) —
        default is the 1-D wave mesh over local devices."""
        self.scene = scene
        self.options = options or Options()
        self.data = scene.build()
        if self.options.use_bvh:
            self.data = attach_bvh(self.data)
        self.mesh = mesh if mesh is not None else make_wave_mesh(n_devices)
        import math

        o = self.options
        # auto-resolve the launch-floor tuning knobs (same policy as
        # integrator.render_aovs, measured in tools/tpu_unroll.py)
        per_pass = max(1, min(o.samples_per_pass, o.samples_per_pixel))
        depth_unroll = o.depth_unroll or (
            o.path_depth if o.path_depth <= 8 else 1
        )
        sample_unroll = o.sample_unroll or (
            4 if (per_pass // max(1, o.spp_batch)) % 4 == 0 else 1
        )
        if not o.max_wavefront:  # auto HBM bound, see Options.max_wavefront
            cluster = o.use_bvh and self.data.num_tris > 1024
            o.max_wavefront = (1 << 17) if cluster else (1 << 20)
        self.fn, self.px, self.py, self.n_valid = make_sharded_render(
            self.mesh,
            self.data,
            scene.camera,
            max_depth=o.path_depth,
            use_bvh=o.use_bvh,
            use_pallas=o.use_pallas,
            film_strata=max(1, round(math.sqrt(o.samples_per_pixel))),
            mis=o.mis,
            spp_batch=o.spp_batch,
            depth_unroll=depth_unroll,
            sample_unroll=sample_unroll,
            remat=o.remat,
            tracer_tune=o.tracer_tune,
            aniso_taps=getattr(o, "aniso_taps", 0),
        )
        self.key = jax.random.key(self.options.seed)

    # --- progressive pass loop ---------------------------------------

    def passes(self, cancel=None):
        """Yield (film, done_spp) after each accumulation pass.

        cancel: optional zero-arg callable polled between passes AND
        between wavefront chunks of a pass (a chunk can be the better
        part of a minute at 4K with remote TPU compiles — front-ends
        like the Blender engine pass their test_break here so aborts
        don't wait out a whole pass). On cancel the generator returns
        without yielding a partial pass."""
        opts = self.options
        spp = opts.samples_per_pixel
        per_pass = max(1, min(opts.samples_per_pass, spp))
        sums, done = self._load_checkpoint()
        pass_idx = 0
        n_pix = self.px.shape[0]
        chunk = self.options.max_wavefront
        while done < spp:
            if cancel is not None and cancel():
                return
            todo = min(per_pass, spp - done)
            if n_pix <= chunk:
                out = self.fn(self.data, self.key, done, todo)
            else:
                # wavefront chunking: sequential pixel slices bound the
                # per-pass memory for very large frames (the reference's
                # 32x32 tiles served the same purpose, jobs/tiles.hpp)
                import jax.numpy as jnp

                pieces = []
                for s0 in range(0, n_pix, chunk):
                    if cancel is not None and cancel():
                        return
                    s1 = min(s0 + chunk, n_pix)
                    pad = chunk - (s1 - s0)
                    cpx = jnp.pad(self.px[s0:s1], (0, pad))
                    cpy = jnp.pad(self.py[s0:s1], (0, pad))
                    part = self.fn(self.data, self.key, done, todo, cpx, cpy)
                    pieces.append(
                        jax.tree_util.tree_map(lambda a: a[: s1 - s0], part)
                    )
                out = jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs, axis=0), *pieces
                )
            if sums is None:
                sums = out
            else:
                sums = jax.tree_util.tree_map(lambda a, b: a + b, sums, out)
            done += todo
            pass_idx += 1
            if (
                opts.checkpoint_dir
                and opts.checkpoint_every
                and pass_idx % opts.checkpoint_every == 0
            ):
                self._save_checkpoint(sums, done)
            yield gather_film(
                sums, self.scene.camera.width, self.scene.camera.height, done
            ), done
        if opts.checkpoint_dir and opts.checkpoint_every:
            self._save_checkpoint(sums, done)

    def render(self) -> dict:
        from phosphorus_mk2_tpu.utils.log import Metrics, get_logger

        log = get_logger("renderer")
        m = Metrics("render")
        film = None
        for film, done in self.passes():
            m.inc("passes")
            if self.options.verbose:
                log.info(f"pass {done}/{self.options.samples_per_pixel} spp")
        if self.options.verbose and film is not None:
            o = self.options
            w, h = self.scene.camera.width, self.scene.camera.height
            rays = w * h * o.samples_per_pixel * o.path_depth * 2
            m.set("spp", o.samples_per_pixel).set("width", w).set("height", h)
            m.set("mrays_per_s", round(rays / max(m.elapsed(), 1e-9) / 1e6, 6))
            m.emit()
        return film

    # --- checkpointing ------------------------------------------------

    def _ckpt_path(self) -> str:
        return os.path.join(self.options.checkpoint_dir, "film_checkpoint.npz")

    def _ckpt_stamp(self) -> dict:
        """Identity of the render this film belongs to. A resume whose
        stamp differs would silently blend incompatible films — the
        failure the reference cannot even have (it has no checkpoints,
        SURVEY.md §5.4) but a progressive renderer must refuse."""
        import hashlib

        h = hashlib.sha1()
        for a in (
            self.data.vertices,
            self.data.faces,
            self.data.emission,
            self.data.lobe_weight,
            self.data.lobe_param,
        ):
            h.update(np.asarray(a).tobytes())
        o = self.options
        return {
            "scene_hash": h.hexdigest(),
            "width": self.scene.camera.width,
            "height": self.scene.camera.height,
            "spp_target": o.samples_per_pixel,
            "max_depth": o.path_depth,
            "mis": int(o.mis),
            "seed": o.seed,
        }

    def _save_checkpoint(self, sums, done: int) -> None:
        os.makedirs(self.options.checkpoint_dir, exist_ok=True)
        tmp = self._ckpt_path()[: -len(".npz")] + "_tmp"
        np.savez(
            tmp,
            color=np.asarray(sums["color"]),
            normal=np.asarray(sums["normal"]),
            alpha=np.asarray(sums["alpha"]),
            done=done,
            **self._ckpt_stamp(),
        )
        os.replace(tmp + ".npz", self._ckpt_path())

    def _load_checkpoint(self):
        if not self.options.checkpoint_dir:
            return None, 0
        path = self._ckpt_path()
        if not os.path.exists(path):
            return None, 0
        ck = np.load(path)
        stamp = self._ckpt_stamp()
        legacy = [k for k in stamp if k not in ck]  # pre-stamp checkpoint
        if legacy:
            raise RuntimeError(
                f"checkpoint {path} lacks identity fields {legacy}; "
                "delete it to start fresh"
            )
        bad = {
            k: (str(ck[k]), str(v))
            for k, v in stamp.items()
            if str(ck[k]) != str(v)
        }
        if bad:
            raise RuntimeError(
                f"checkpoint {path} was written by a different render "
                f"(mismatched {bad}); delete it or restore the original "
                "scene/options to resume"
            )
        import jax.numpy as jnp

        sums = {
            "color": jnp.asarray(ck["color"]),
            "normal": jnp.asarray(ck["normal"]),
            "alpha": jnp.asarray(ck["alpha"]),
        }
        return sums, int(ck["done"])
