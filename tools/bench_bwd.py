"""fwd+bwd A/B: differentiable-scan tail compaction sweep.

The differentiable path runs a fixed-depth scan (no early exit), so
after ~3 bounces most lanes are dead but every iteration still pays
full-width shade math forward AND backward.  Round-3 adds tail
compaction to the differentiable form (path.trace); this tool measures
its effect on the bench fwd+bwd workload (sanmiguel_analog, 64K pixels,
depth 8, grad w.r.t. material base colors).

  python tools/bench_bwd.py [n_tris] [compact values...]

Default sweep: off 2 3 4.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 10_500_000
    vals = [None if a in ("off", "none") else int(a)
            for a in sys.argv[2:]] or [None, 2, 3, 4]

    from pathtracing_tpu.scenes import sanmiguel_analog
    from pathtracing_tpu.integrators.path import RenderConfig
    from pathtracing_tpu.integrators.render import render_tile
    from pathtracing_tpu.sensor import film as filmmod

    res = (512, 512)
    t0 = time.perf_counter()
    scene, cam, meta = sanmiguel_analog(resolution=res, n_tris=n_tris)
    print(f"scene {meta.n_tri:,} tris build {time.perf_counter()-t0:.0f}s "
          f"backend={jax.default_backend()}", flush=True)

    w, h = res
    rows = (1 << 16) // w
    pixel_idx = jnp.arange(rows * w, dtype=jnp.int32)
    film0 = filmmod.new_film((w, rows))

    ref = None
    for compact in vals:
        cfg = RenderConfig(spp=1, max_depth=8, integrator="path",
                           differentiable=True, rays_per_batch=1 << 16,
                           compact_after=compact)

        # film0/pixel_idx are jit ARGUMENTS: closing over arrays bakes
        # them into every compile request over the tunnel (CLAUDE.md
        # HTTP-413 guidance)
        def loss(base, scene, film0, pixel_idx):
            sc = dict(scene, mat_base=base)
            f = render_tile(sc, cam, meta, cfg, film0, pixel_idx, 1, 0,
                            rows=rows, row0=jnp.asarray(0, jnp.int32))
            return jnp.sum(f["rgb"])

        gfn = jax.jit(jax.grad(loss))
        t0 = time.perf_counter()
        g = jax.device_get(gfn(scene["mat_base"], scene, film0, pixel_idx))
        warm = time.perf_counter() - t0
        assert np.isfinite(g).all()
        t0 = time.perf_counter()
        jax.device_get(gfn(scene["mat_base"], scene, film0, pixel_idx))
        dt = time.perf_counter() - t0
        rate = rows * w / dt
        if ref is None:
            ref = g
        dev = float(np.abs(g - ref).max() / max(np.abs(ref).max(), 1e-18))
        print(f"compact={str(compact):>4s} {dt*1e3:8.1f} ms  "
              f"{rate/1e3:7.1f} Ksamp/s  (compile {warm:.0f}s, "
              f"max grad dev vs first {dev:.2e})", flush=True)


if __name__ == "__main__":
    main()
