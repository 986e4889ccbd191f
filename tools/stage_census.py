"""Per-stage cost attribution for the render pipeline (op-census analog).

jax.profiler traces hang over the remote-TPU tunnel and XLA op-level
dumps can't see inside Pallas kernels, so attribution here is by STAGE
ABLATION: time nested prefixes of one sample wave —

  raygen            camera ray generation only
  +closest-hit      raygen + one scene intersect
  +interaction      ... + make_interaction (gathers, normal mapping)
  +shadow           ... + one NEE shadow query (occluded)
  full wave         the whole bounce loop + film splat

and report the deltas, plus the two-level kernel's in-kernel counters
(L1 visits / children tested per 128-ray tile) when the scene uses it.

Usage: python tools/stage_census.py [scene] [n_tris] [depth]
  scene: cornell | sanmiguel (default sanmiguel, n_tris 2_000_000)
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dispatch_overhead():
    f = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((1024,), jnp.float32)
    jax.device_get(f(x))
    t0 = time.perf_counter()
    for _ in range(5):
        jax.device_get(f(x))
    return (time.perf_counter() - t0) / 5


def timeit(fn, *args, iters=3, base=0.0):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
    return max((time.perf_counter() - t0) / iters - base, 0.0)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "sanmiguel"
    n_tris = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pathtracing_tpu import scenes
    from pathtracing_tpu.integrators.path import RenderConfig, trace
    from pathtracing_tpu.integrators.render import render_tile
    from pathtracing_tpu.scene.intersect import (intersect,
                                                 make_interaction,
                                                 occluded)
    from pathtracing_tpu.sensor.camera import generate_ray
    from pathtracing_tpu.sensor.film import new_film
    from pathtracing_tpu.core.rng import sample_1d, sample_2d

    if which == "cornell":
        scene, cam, meta = scenes.cornell_box(resolution=(512, 512))
    else:
        scene, cam, meta = scenes.sanmiguel_analog(
            resolution=(1920, 1080), n_tris=n_tris)
    w, h = cam["resolution"]
    cfg = RenderConfig(spp=1, max_depth=depth, integrator="path",
                       rays_per_batch=1 << 16)
    n = max(1, (1 << 16) // w) * w     # whole rows: the dense film path
    pixel_idx = (h // 2) * w + jnp.arange(n, dtype=jnp.int32)
    print(f"scene={which} tris={meta.n_tri:,} accel={meta.accel} "
          f"depth={depth} rays={n}", flush=True)
    base = dispatch_overhead()
    print(f"{'dispatch overhead':26s} {base*1e3:9.1f} ms", flush=True)

    s = cfg.sampler
    px = pixel_idx % w
    py = pixel_idx // w

    def rays(scene, cam):
        pj = sample_2d(s, px, py, jnp.asarray(0, jnp.uint32), 0)
        tu = sample_1d(s, px, py, jnp.asarray(0, jnp.uint32), 2)
        lu = sample_2d(s, px, py, jnp.asarray(0, jnp.uint32), 3)
        p = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)],
                      -1) + pj
        return generate_ray(cam, p, tu, lu)

    @jax.jit
    def st_raygen(scene, cam):
        o, d, tm = rays(scene, cam)
        return o + d

    @jax.jit
    def st_hit(scene, cam):
        o, d, tm = rays(scene, cam)
        return intersect(scene, meta, o, d, 1e30, time=tm)["t"]

    @jax.jit
    def st_inter(scene, cam):
        o, d, tm = rays(scene, cam)
        hit = intersect(scene, meta, o, d, 1e30, time=tm)
        it = make_interaction(scene, meta, o, d, hit, time=tm)
        return it["p"]

    @jax.jit
    def st_shadow(scene, cam):
        o, d, tm = rays(scene, cam)
        hit = intersect(scene, meta, o, d, 1e30, time=tm)
        it = make_interaction(scene, meta, o, d, hit, time=tm)
        sun = jnp.broadcast_to(
            jnp.asarray([0.3, 0.9, 0.3], jnp.float32), it["p"].shape)
        occ = occluded(scene, meta, it["p"], sun, 1e30, time=tm)
        return occ

    @jax.jit
    def st_full(scene, cam):
        o, d, tm = rays(scene, cam)
        return trace(scene, cam, meta, cfg, o, d, tm, px, py,
                     jnp.asarray(0, jnp.uint32))

    @partial(jax.jit, static_argnames=())
    def st_wave(scene, cam, film):
        # row-aligned so the film takes the dense row-tile splat the
        # real frame uses (the scatter path over a 2M-pixel film costs
        # operand-size, not update-count — it showed as a bogus +648 ms
        # stage here)
        rows = n // w
        return render_tile(scene, cam, meta, cfg, film, pixel_idx, 1, 0,
                           rows=rows, row0=jnp.asarray(h // 2, jnp.int32))

    stages = [("raygen", lambda: timeit(st_raygen, scene, cam, base=base)),
              ("raygen+closest", lambda: timeit(st_hit, scene, cam,
                                                base=base)),
              ("  +interaction", lambda: timeit(st_inter, scene, cam,
                                                base=base)),
              ("  +shadow(any-hit)", lambda: timeit(st_shadow, scene, cam,
                                                    base=base)),
              ("full bounce loop", lambda: timeit(st_full, scene, cam,
                                                  base=base)),
              ("full wave (+film)", lambda: timeit(
                  st_wave, scene, cam, new_film(cam["resolution"]),
                  base=base))]
    prev = 0.0
    for name, f in stages:
        dt = f()
        print(f"{name:26s} {dt*1e3:9.1f} ms   (+{(dt-prev)*1e3:8.1f})",
              flush=True)
        prev = dt

    if meta.accel == "pallas" and "pk_l1_base" in scene:
        from pathtracing_tpu.accel.pallas_trace2 import pallas_tri_intersect2
        o, d, tm = jax.jit(rays)(scene, cam)
        r = pallas_tri_intersect2(scene, o, d,
                                  jnp.full((n,), 1e30, jnp.float32),
                                  meta.block_k, counters=True)
        nl1 = np.asarray(r["n_l1_visited"])
        nch = np.asarray(r["n_children_tested"])
        print(f"kernel counters (camera rays): L1 visits/tile mean "
              f"{nl1.mean():.0f} max {nl1.max():.0f}; children "
              f"tested/tile mean {nch.mean():.0f} max {nch.max():.0f}",
              flush=True)


if __name__ == "__main__":
    main()
