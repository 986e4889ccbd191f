"""TPU check for ray regeneration: correctness + quick timing A/B.

Renders a mesh scene (Pallas backend) with the standard wave driver and
with regeneration, asserts the films agree, and prints both timings.
Sized for a fast tunnel run; N_TRIS/RES/SPP/DEPTH env knobs override.

  python tools/verify_regen.py                    # on the TPU
  FORCE_CPU=1 N_TRIS=6000 python tools/verify_regen.py
"""
from __future__ import annotations

import math
import os
import sys
import time

import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np


def main():
    import dataclasses
    from bench_traversal import heightfield
    from pathtracing_tpu import SceneBuilder
    from pathtracing_tpu.integrators.path import RenderConfig
    from pathtracing_tpu.integrators.render import render

    n_tris = int(os.environ.get("N_TRIS", 500_000))
    res = tuple(int(x) for x in os.environ.get("RES", "512,384").split(","))
    spp = int(os.environ.get("SPP", "1"))
    depth = int(os.environ.get("DEPTH", "16"))

    tri = heightfield(n_tris)
    b = SceneBuilder()
    b.add_mesh(tri.reshape(-1, 3),
               np.arange(len(tri) * 3).reshape(-1, 3),
               material=b.add_diffuse((0.6, 0.55, 0.5)))
    b.add_distant_light(direction=(-0.3, -1.0, -0.2), color=(5, 5, 4.6))
    b.add_uniform_inf_light((0.35, 0.45, 0.65))
    b.set_camera([50, 40, -30], [50, 0, 50], math.radians(55), res)
    scene, cam, meta = b.build()
    print(f"scene: {meta.n_tri:,} tris accel={meta.accel} "
          f"backend={jax.default_backend()}", flush=True)
    cfg = RenderConfig(spp=spp, max_depth=depth, integrator="path",
                       rays_per_batch=1 << 16)

    films = {}
    for name, c in (("waves", cfg),
                    ("regen", dataclasses.replace(cfg, regenerate=True))):
        t0 = time.perf_counter()
        f = render(scene, cam, meta, c, spp=spp)
        jax.device_get(f["weight"][0])
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        f = render(scene, cam, meta, c, spp=spp, sample_offset=spp)
        jax.device_get(f["weight"][0])
        timed = time.perf_counter() - t0
        rate = res[0] * res[1] * spp / timed
        print(f"{name}: warm {warm:6.1f}s timed {timed:6.1f}s "
              f"{rate/1e3:8.1f} Ksamp/s", flush=True)
        films[name] = np.asarray(f["rgb"])

    d = np.abs(films["regen"] - films["waves"])
    rel = d / np.maximum(np.abs(films["waves"]), 1e-3)
    print(f"agreement: max_abs {d.max():.2e}  p99_rel {np.quantile(rel, 0.99):.2e}")
    assert np.quantile(rel, 0.999) < 1e-3, "regen does not match waves"
    print("REGEN VERIFIED")


if __name__ == "__main__":
    main()
