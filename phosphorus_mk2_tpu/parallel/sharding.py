"""Wavefront sharding over a device mesh.

The reference's entire parallel story is {pthread tile queue} x {AVX2
packets} (SURVEY.md §2.5). The TPU-native replacement:

* the pixel/ray wavefront axis is sharded statically over a
  ``jax.sharding.Mesh`` — SPMD has no cheap global atomic tile counter,
  and a path tracer's per-pixel cost is statistically uniform at
  wavefront scale, so static even sharding is the right trade;
* scene + BVH + material tables are **replicated** per device (the
  reference shares them read-only across threads);
* the film is produced sharded and gathered on the host (or left
  device-resident for progressive accumulation);
* under ``jax.grad``, XLA all-reduces scene-parameter gradients over ICI
  automatically because the scene is replicated while the loss sums over
  the sharded pixel axis — the gradient-psum-overlapped-with-backward
  design of BASELINE.json falls out of the sharding annotations.

Mesh axes: ("wave",) for single-host chips; multi-host pods use
("host", "chip") with the wavefront sharded over both (pixels don't
communicate, so DCN never carries per-ray traffic — only the film gather
and gradient all-reduce).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from phosphorus_mk2_tpu.core.camera import camera_to_params
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass_pixels


def make_wave_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("wave",))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def shard_pixels(mesh: Mesh, width: int, height: int):
    """Flat pixel coordinate arrays padded to the mesh size and sharded
    over ALL mesh axes (1-D ('wave',) and production 2-D ('host','chip')
    meshes take the same path). Returns (px, py, n_valid)."""
    n = width * height
    n_dev = mesh.devices.size
    n_pad = pad_to_multiple(n, n_dev)
    ids = np.arange(n_pad, dtype=np.int32)
    px = np.where(ids < n, ids % width, 0).astype(np.int32)
    py = np.where(ids < n, ids // width, 0).astype(np.int32)
    sharding = NamedSharding(mesh, P(mesh.axis_names))
    return (
        jax.device_put(px, sharding),
        jax.device_put(py, sharding),
        n,
    )


def make_sharded_render(
    mesh: Mesh,
    scene,
    camera,
    *,
    max_depth: int,
    use_bvh: bool = True,
    use_pallas: bool = False,
    donate: bool = False,
    film_strata: int = 1,
    mis: bool = False,
    spp_batch: int = 1,
    depth_unroll: int = 1,
    sample_unroll: int = 1,
    remat: bool = False,
    tracer_tune: dict | None = None,
    aniso_taps: int = 0,
):
    """Build a jitted SPMD render-pass function.

    The performance knobs (depth_unroll/sample_unroll: scan unrolling
    against the per-launch floor; spp_batch: samples folded into the
    wavefront; remat: trade recompute for memory under grad) and the mis
    flag are honored HERE — the production path renders exactly the
    configuration the CLI/bench tuned (a round-1 gap: --mis was silently
    dropped and CLI renders ran the slow un-unrolled scans).

    Returns (fn, px, py, n_valid) where fn(scene, key, sample_offset,
    n_samples) -> dict of per-pixel sums sharded over the wave axis.
    """
    cam_params = camera_to_params(camera)
    tracer = make_tracer(scene, use_bvh, use_pallas, tracer_tune=tracer_tune)
    px, py, n_valid = shard_pixels(mesh, camera.width, camera.height)

    wave = NamedSharding(mesh, P(mesh.axis_names))

    @functools.partial(
        jax.jit,
        static_argnames=("n_samples",),
        out_shardings={"color": wave, "normal": wave, "alpha": wave},
    )
    def fn(scene, key, sample_offset, n_samples, px=px, py=py):
        return render_pass_pixels(
            scene,
            cam_params,
            key,
            sample_offset,
            n_samples,
            px,
            py,
            max_depth=max_depth,
            tracer=tracer,
            film_strata=film_strata,
            mis=mis,
            spp_batch=spp_batch,
            depth_unroll=depth_unroll,
            sample_unroll=sample_unroll,
            remat=remat,
            aniso_taps=aniso_taps,
        )

    return fn, px, py, n_valid


def gather_film(sums: dict, width: int, height: int, spp: int) -> dict:
    """Device->host film gather + spp normalization (the reference's
    film::file_t accumulation, src/film/file.cpp:27-45)."""
    inv = 1.0 / spp
    n = width * height
    out = {}
    out["color"] = np.asarray(sums["color"])[:n].reshape(height, width, 3) * inv
    out["normal"] = np.asarray(sums["normal"])[:n].reshape(height, width, 3) * inv
    out["alpha"] = np.asarray(sums["alpha"])[:n].reshape(height, width) * inv
    return out
