"""Render profiling & observability.

The reference prints wall-clock and per-thread CPU time around the render
loop plus a progress percentage (Integrators.cpp:50,121-128) and keeps a
hand-maintained timing changelog in comments (main.cpp:317-332).  Here:

  * `RenderTimer` — jax.block_until_ready-bounded wall timing with derived
    rays/sec and camera-samples/sec counters;
  * `trace_to` — context manager around jax.profiler for on-device traces;
  * structured single-line JSON logs the driver/tools can parse.
"""
from __future__ import annotations

import contextlib
import json
import sys
import time

import jax


class RenderTimer:
    """Usage:
        with RenderTimer(n_pixels, spp, max_depth) as t:
            film = render(...)
            t.result = film
    Prints a JSON metrics line on exit."""

    def __init__(self, n_pixels: int, spp: int, max_depth: int,
                 label: str = "render", stream=None):
        self.n_pixels = n_pixels
        self.spp = spp
        self.max_depth = max_depth
        self.label = label
        self.result = None
        self.stream = stream or sys.stderr
        self.metrics = None

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, exc_type, *a):
        if exc_type is not None:
            return False
        if self.result is not None:
            jax.block_until_ready(self.result)
        dt = time.perf_counter() - self.t0
        samples = self.n_pixels * self.spp
        self.metrics = dict(
            label=self.label, wall_s=round(dt, 4),
            camera_samples=samples,
            samples_per_s=round(samples / dt, 1),
            # upper bound on traced rays (<= samples * depth, RR ends early)
            max_rays_per_s=round(samples * self.max_depth / dt, 1),
            n_devices=jax.device_count(),
        )
        print(json.dumps(self.metrics), file=self.stream)
        return False


@contextlib.contextmanager
def trace_to(logdir: str):
    """jax.profiler trace around a block: view with TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
