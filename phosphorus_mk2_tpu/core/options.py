"""Render options, mirroring the reference CLI flags
(reference src/options.hpp:6-43: spp=16, depth=9, paths/sample=16,
single_threaded, host_only, progressive, render_normals, verbose)."""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class Options:
    output: str = "out.exr"
    samples_per_pixel: int = 16
    paths_per_sample: int = 1  # path revival is disabled in the reference too
    path_depth: int = 9
    progressive: bool = False
    render_normals: bool = False
    verbose: bool = False
    # TPU-specific knobs (no reference counterpart):
    samples_per_pass: int = 4      # spp chunking per jit invocation
    use_bvh: bool = True           # False = brute-force oracle tracer
    mis: bool = False              # NEE/BSDF multiple importance sampling
                                   # (deviation: the reference has no MIS
                                   # and keeps an (e*4) NEE quirk; see
                                   # integrator/path.trace_sample)
    use_pallas: bool = False       # Pallas traversal kernels (TPU only)
    seed: int = 0
    checkpoint_dir: str | None = None
    checkpoint_every: int = 0      # passes between checkpoints; 0 = off
    max_wavefront: int = 0         # pixels per device pass; larger frames
                                   # render in sequential wavefront chunks
                                   # (bounds HBM for 4K-class frames).
                                   # 0 = auto: 1<<20 for the dense small-
                                   # scene tracer, 1<<17 for the cluster
                                   # tracer (its per-ray front-table sort
                                   # temps scale with supercluster count —
                                   # a 1M-ray wavefront OOMed 16G HBM on
                                   # an 887k-tri scene)
    # scan/launch tuning (the axon TPU platform has a ~0.78 ms floor per
    # kernel launch/scan iteration; unrolling is how the bench reached
    # 36 Mrays/s — these flow through Renderer/make_sharded_render so
    # production renders run the tuned configuration):
    depth_unroll: int = 0          # bounce-scan unroll; 0 = auto
                                   # (full unroll when max_depth <= 8)
    sample_unroll: int = 0         # sample-scan unroll; 0 = auto
                                   # (4 when samples_per_pass % 4 == 0)
    spp_batch: int = 1             # samples folded into one wavefront
    remat: bool = False            # jax.checkpoint the bounce body (grad)
    aniso_taps: int = 0            # anisotropic texture taps along the
                                   # footprint's uv major axis (0 =
                                   # isotropic trilinear); the TPU
                                   # stand-in for the reference's OIIO
                                   # EWA (src/material.cpp:127-129)
    tracer_tune: dict | None = None  # cluster-tracer launch-count knobs
                                   # (dense_waves/chunk/dense_chunk/
                                   # expand_batch/slab_bf16), see
                                   # accel/cluster_traverse._trace; None
                                   # = per-scene auto (measured policy)
