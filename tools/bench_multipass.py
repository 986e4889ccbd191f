"""A/B: single-pass two-level kernel vs the multipass re-binned driver.

Measures closest-hit wall time on coherent camera rays and incoherent
bounce rays at San-Miguel scale for several per-pass visit schedules,
plus any-hit.  The single-pass row pre-sorts by the two-block key (the
production dispatch path); multipass rows start from the same order.

Usage: python tools/bench_multipass.py [n_tris] [n_rays] [k2] [g]
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
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))
from bench_traversal import (heightfield, camera_rays, bounce_rays,
                             dispatch_overhead_ms)


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 10_500_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 16
    from pathtracing_tpu.accel.pallas_trace2 import (build_tri_blocks2,
                                                     pallas_tri_intersect2,
                                                     G_DEFAULT)
    from pathtracing_tpu.scene import intersect as isect

    k2_raw = sys.argv[3] if len(sys.argv) > 3 else None
    k2_arg = None if k2_raw in (None, "0", "-", "auto") else int(k2_raw)
    g = int(sys.argv[4]) if len(sys.argv) > 4 else G_DEFAULT

    tri = heightfield(n_tris)
    print(f"tris={len(tri):,} rays={n_rays:,} g={g} "
          f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    arrays, k2 = build_tri_blocks2(tri, k2=k2_arg, g=g)
    scene = {k: jnp.asarray(v) for k, v in arrays.items()}
    print(f"build {time.perf_counter()-t0:.0f}s k2={k2} "
          f"m1={arrays['pk_blk_lo'].shape[0]}", flush=True)
    base = dispatch_overhead_ms()
    t_max = jnp.full((n_rays,), 1e30, jnp.float32)

    oc, dc = camera_rays(n_rays)
    ob, db = bounce_rays(n_rays)

    def order(o, d):
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        key = isect._first_block_key(scene, o, d)
        p = jnp.argsort(key)
        return o[p], d[p]

    import functools

    # scene must be an ARGUMENT of the jit: closing over the 10.5M-tri
    # tables bakes them into the remote compile request (HTTP 413)
    @functools.partial(jax.jit, static_argnames=("visits", "any_hit"))
    def mp_(sc, o, d, visits, any_hit=False):
        return isect._multipass2(sc, o, d, t_max, k2, any_hit, None,
                                 visits=visits, g=g)

    def mp(o, d, visits, any_hit=False):
        return mp_(scene, o, d, visits, any_hit)

    def run(fn, iters=3):
        jax.device_get(fn()["t"])
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.device_get(fn()["t"])
        return (time.perf_counter() - t0) / iters * 1e3 - base

    schedules = [(16, 8, 8), (16, 8), (8, 8, 8, 8), (24, 12), (32,)]
    for label, o, d in [("bounce", ob, db), ("coherent", oc, dc)]:
        os_, ds_ = order(o, d)
        ms = run(lambda: pallas_tri_intersect2(scene, os_, ds_, t_max,
                                               k2, g=g))
        print(f"{label:9s} single-pass          {ms:8.1f} ms "
              f"{n_rays/ms/1e3:7.2f} Mray/s", flush=True)
        ref = jax.device_get(
            pallas_tri_intersect2(scene, os_, ds_, t_max, k2, g=g)["t"])
        for sched in schedules:
            ms = run(lambda: mp(os_, ds_, sched))
            got = jax.device_get(mp(os_, ds_, sched)["t"])
            bad = int((~np.isclose(got, ref, rtol=1e-5)).sum())
            print(f"{label:9s} multipass {str(sched):11s}{ms:8.1f} ms "
                  f"{n_rays/ms/1e3:7.2f} Mray/s  mismatch {bad}",
                  flush=True)
        ms = run(lambda: pallas_tri_intersect2(scene, os_, ds_, t_max,
                                               k2, g=g, any_hit=True))
        print(f"{label:9s} any-hit single       {ms:8.1f} ms", flush=True)
        ms = run(lambda: mp(os_, ds_, (16, 8), True))
        print(f"{label:9s} any-hit mp (16,8)    {ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
