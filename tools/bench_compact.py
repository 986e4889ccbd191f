"""A/B wavefront scheduling end-to-end: compaction AND regeneration.

Builds the 10.5M-tri mesh bench scene ONCE, then times full forward
frames (1080p unless FAST, path integrator) for each mode given on the
command line: 'off' (plain waves), an integer (compact_after value), or
'regen' (persistent wavefront).  A DEPTHS env var (comma list) A/Bs
max_depth in the same process.

  python tools/bench_compact.py off 6 regen
  DEPTHS=32,64 python tools/bench_compact.py off 6 regen
"""
from __future__ import annotations

import os
import sys
import time

import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))


def main():
    fast = bool(os.environ.get("BENCH_FAST"))
    res = (512, 512) if fast else (1920, 1080)
    n_tris = 200_000 if fast else 10_500_000
    n_tris = int(os.environ.get("N_TRIS", n_tris))
    if os.environ.get("RES"):
        res = tuple(int(x) for x in os.environ["RES"].split(","))
    depths = [int(x) for x in
              os.environ.get("DEPTHS", "8" if fast else "32").split(",")]
    modes = [a if a in ("off", "none", "regen") else int(a)
             for a in (sys.argv[1:] or ["off", "6", "regen"])]

    from pathtracing_tpu.scenes import sanmiguel_analog
    from pathtracing_tpu.integrators.path import RenderConfig
    from pathtracing_tpu.integrators.render import render

    t0 = time.perf_counter()
    scene, cam, meta = sanmiguel_analog(resolution=res, n_tris=n_tris)
    print(f"scene: {meta.n_tri:,} tris accel={meta.accel} "
          f"build {time.perf_counter()-t0:.0f}s "
          f"backend={jax.default_backend()}", flush=True)
    w, h = res
    spp = 1

    for depth in depths:
        for mode in modes:
            regen = mode == "regen"
            ca = mode if isinstance(mode, int) else None
            cfg = RenderConfig(spp=spp, max_depth=depth,
                               integrator="path",
                               rays_per_batch=1 << 16,
                               compact_after=ca, regenerate=regen)
            t0 = time.perf_counter()
            film = render(scene, cam, meta, cfg, spp=spp)
            jax.device_get(film["weight"][0])
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            film = render(scene, cam, meta, cfg, spp=spp,
                          sample_offset=spp)
            jax.device_get(film["weight"][0])
            timed = time.perf_counter() - t0
            rate = w * h * spp / timed
            label = mode if isinstance(mode, int) else mode[:5]
            print(f"depth={depth:2d} mode={label:>5} "
                  f"warm {warm:6.1f}s  timed {timed:6.1f}s  "
                  f"{rate/1e3:8.1f} Ksamp/s", flush=True)


if __name__ == "__main__":
    main()
