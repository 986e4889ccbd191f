"""Benchmark: camera-samples/sec on the Cornell-style scene (1 chip).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference CPU tracer's best logged figure is San Miguel
1920x1080 @100SPP in 349 s on an unspecified all-core AVX x86 box
(reference main.cpp:332) = 0.594 M camera samples/s.  Until San Miguel
itself is loaded, we benchmark the analytic Cornell scene (BASELINE
config 1 geometry class) at PathIntegrator settings and compare sample
throughput; `vs_baseline` > 1 means faster than the reference's best.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from pathtracing_tpu.scenes import cornell_box
from pathtracing_tpu.integrators.path import RenderConfig
from pathtracing_tpu.integrators.render import render

BASELINE_SAMPLES_PER_S = 1920 * 1080 * 100 / 349.0  # reference main.cpp:332


def main():
    res = (512, 512)
    spp = 32
    cfg = RenderConfig(spp=spp, max_depth=8, integrator="path",
                       rays_per_batch=1 << 16)
    scene, cam, meta = cornell_box(resolution=res)

    # warmup / compile with the SAME wave count (n_samples is a static
    # arg: a different count would recompile inside the timed region)
    film = render(scene, cam, meta, cfg, spp=spp)
    jax.block_until_ready(film)

    # NOTE: on the remote-TPU tunnel block_until_ready can report ready
    # before the device work drains; only a device->host read truly
    # syncs, so time through jax.device_get
    jax.device_get(film["rgb"])
    t0 = time.perf_counter()
    film = render(scene, cam, meta, cfg, spp=spp, sample_offset=spp)
    jax.device_get(film["rgb"])
    dt = time.perf_counter() - t0

    n_samples = res[0] * res[1] * spp
    rate = n_samples / dt
    print(json.dumps({
        "metric": "camera_samples_per_sec_cornell_512_path_d8",
        "value": round(rate, 1),
        "unit": "samples/s",
        "vs_baseline": round(rate / BASELINE_SAMPLES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
