"""phosphorus_mk2_tpu — a TPU-native, differentiable wavefront path tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference CPU renderer ``jkrueger/phosphorus_mk2`` (wavefront unidirectional
path tracing, 8-wide SAH BVH, Moller-Trumbore intersection, multi-lobe
BSDFs, next-event estimation, Russian roulette, area/environment lights,
YAML scene import, tiled multi-channel film output) — redesigned TPU-first:

* compute path: pure JAX + Pallas kernels, dense masked wavefronts
  (the reference's ``active_t`` compaction becomes alive-masks under
  ``lax.scan``; its AVX2 packets become VPU lanes).
* parallelism: SPMD sharding of the pixel/ray wavefront axis over a
  ``jax.sharding.Mesh`` (the reference's pthread tile queue, see
  reference ``src/jobs/tiles.hpp``), scene/BVH replicated per device,
  film gathered and gradients all-reduced by XLA collectives.
* differentiability: the integrator is differentiable w.r.t. vertex
  positions, BSDF parameters and light emission; discrete events
  (visibility, lobe selection, Russian roulette) are stop-gradiented.
"""

__version__ = "0.1.0"

from phosphorus_mk2_tpu.core.camera import Camera
from phosphorus_mk2_tpu.core.scene import Scene, SceneData
from phosphorus_mk2_tpu.core.options import Options
from phosphorus_mk2_tpu.integrator.path import render, render_aovs

__all__ = [
    "Camera",
    "Scene",
    "SceneData",
    "Options",
    "render",
    "render_aovs",
]
