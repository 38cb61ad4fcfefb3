"""Profiling and metrics.

The reference has almost none of this (SURVEY.md §5.1: a gettimeofday
wall clock around start/join, src/core.cpp:158-177, and a commented-out
stats thread). Designed in here:

* StageTimer — named wall-clock stages with device synchronization
  (block_until_ready), so numbers mean device time, not dispatch time;
* RenderMeter — rays/sec accounting for the dense wavefront (every lane
  issues closest+shadow rays per bounce, so nominal rays = N*depth*2);
* trace() — context manager around jax.profiler for XPlane dumps when a
  profile directory is given.
"""
from __future__ import annotations

import contextlib
import time

import jax


class StageTimer:
    """Accumulating named wall-clock timers with device sync."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.time()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} {total:8.3f}s  ({n}x, {total / n * 1e3:.1f} ms/call)")
        return "\n".join(lines)


class RenderMeter:
    """rays/sec accounting for dense wavefront renders."""

    def __init__(self, width: int, height: int, max_depth: int):
        self.per_sample_rays = width * height * max_depth * 2
        self.rays = 0
        self.seconds = 0.0

    def add_pass(self, n_samples: int, seconds: float) -> None:
        self.rays += self.per_sample_rays * n_samples
        self.seconds += seconds

    @property
    def rays_per_sec(self) -> float:
        return self.rays / self.seconds if self.seconds > 0 else 0.0


@contextlib.contextmanager
def trace(profile_dir: str | None):
    """jax.profiler trace scope (no-op when profile_dir is None)."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
