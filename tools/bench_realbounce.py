"""Traversal cost on REAL in-frame bounce rays (not synthetic extremes).

bench_traversal's bounce_rays() draws random surface points x random
directions — a worst case.  The frame's actual per-iteration cost
(~86 ms per 64K lanes at 10.5M tris, inferred from the round-3 regen
trace rate) sits between that and the coherent camera case; this tool
measures it directly: run the production bounce step k times from real
camera rays, pull each depth's (o, d, alive) ray set, and time
closest-hit + any-hit (+ visit counters) under the production dispatch
sort.

Usage: python tools/bench_realbounce.py [n_tris] [depth_max]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 10_500_000
    depth_max = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from pathtracing_tpu import scenes
    from pathtracing_tpu.integrators.path import (RenderConfig,
                                                  _make_bounce)
    from pathtracing_tpu.scene.intersect import _pallas_dispatch
    from pathtracing_tpu.scene import intersect as isect
    from pathtracing_tpu.sensor.camera import camera_lanes
    from pathtracing_tpu.accel.pallas_trace2 import pallas_tri_intersect2

    n = 1 << 16
    t0 = time.perf_counter()
    scene, cam, meta = scenes.sanmiguel_analog(resolution=(1920, 1080),
                                               n_tris=n_tris)
    print(f"tris={meta.n_tri:,} accel={meta.accel} build "
          f"{time.perf_counter()-t0:.0f}s backend={jax.default_backend()}",
          flush=True)
    w, h = cam["resolution"]
    pix = (h // 2) * w + jnp.arange(n, dtype=jnp.int32)
    px, py = pix % w, pix // w
    cfg = RenderConfig(spp=1, max_depth=depth_max + 1, integrator="path",
                       rays_per_batch=n)

    @jax.jit
    def step(scene, cam, st, b):
        tm = jnp.zeros((n,), jnp.float32)
        bounce = _make_bounce(scene, meta, cfg, px, py, tm,
                              jnp.asarray(0, jnp.uint32), n)
        return bounce(st, b)

    @jax.jit
    def init(scene, cam):
        o, d, t, _ = camera_lanes(cam, cfg.sampler, px, py,
                                  jnp.asarray(0, jnp.uint32))
        return dict(o=o, d=d, tput=jnp.ones((n, 3), jnp.float32),
                    radiance=jnp.zeros((n, 3), jnp.float32),
                    prev_pdf=jnp.ones((n,), jnp.float32),
                    spec=jnp.ones((n,), bool),
                    alive=jnp.ones((n,), bool),
                    medium=jnp.full((n,), meta.camera_medium, jnp.int32),
                    rr_depth=jnp.zeros((n,), jnp.int32),
                    n_rays=jnp.zeros((), jnp.float32))

    # trivial-dispatch baseline
    f = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((1024,), jnp.float32)
    jax.device_get(f(x))
    base = 1e30
    for _ in range(10):
        t0 = time.perf_counter()
        jax.device_get(f(x))
        base = min(base, time.perf_counter() - t0)
    print(f"dispatch {base*1e3:.1f} ms", flush=True)

    def timed(fn, iters=3):
        jax.device_get(jax.tree.leaves(fn())[0])
        best = 1e30
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.device_get(jax.tree.leaves(fn())[0])
            best = min(best, time.perf_counter() - t0)
        return (best - base) * 1e3

    @jax.jit
    def closest(scene, o, d, tm):
        r = _pallas_dispatch(scene, meta, o, d, tm)
        return jnp.sum(r["t"] * (r["t"] < 1e30))

    @jax.jit
    def anyhit(scene, o, d, tm):
        r = _pallas_dispatch(scene, meta, o, d, tm, any_hit=True)
        return jnp.sum(r["valid"].astype(jnp.float32))

    st = init(scene, cam)
    for b in range(depth_max):
        o = st["o"]
        d = st["d"]
        alive = st["alive"]
        na = int(jax.device_get(jnp.sum(alive.astype(jnp.int32))))
        tm = jnp.where(alive, 1e30, 0.0)
        ms_c = timed(lambda: closest(scene, o, d, tm))
        ms_a = timed(lambda: anyhit(scene, o, d, tm))
        # visit counters under the production sort order (two-level only)
        cnt = ""
        if "pk_l1_base" in scene:
            key = isect._first_block_key(scene, o, d)
            key = jnp.where(tm <= 0.0, jnp.uint32(0xFFFFFFFF), key)
            p = jnp.argsort(key)
            r = pallas_tri_intersect2(scene, o[p], d[p], tm[p],
                                      meta.block_k, counters=True)
            nl1 = np.asarray(r["n_l1_visited"])
            nch = np.asarray(r["n_children_tested"])
            cnt = (f"  L1/tile {nl1.mean():5.0f} (max {nl1.max():4.0f})"
                   f"  child/tile {nch.mean():5.0f}")
        print(f"depth {b}: alive {na:6d}  closest {ms_c:7.1f} ms  "
              f"any-hit {ms_a:7.1f} ms{cnt}", flush=True)
        st = step(scene, cam, st, jnp.asarray(b, jnp.int32))


if __name__ == "__main__":
    main()
