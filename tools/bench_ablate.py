"""Ablation bench: sort key x re-cull cadence on the two-level kernel.

Measures closest-hit time for coherent camera rays and incoherent bounce
rays under (a) Morton-sorted vs first-entered-block-sorted ray order and
(b) re-cull cadence in {off, 8, 16, 32}, plus in-kernel visit counters
for the extremes.  Usage:

  python tools/bench_ablate.py [n_tris] [n_rays] [k2] [g] [pops]
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
sys.path.insert(0, _here)                      # tools/ (bench_traversal)
sys.path.insert(0, os.path.dirname(_here))     # repo root (pathtracing_tpu)
from bench_traversal import (heightfield, camera_rays, bounce_rays,
                             dispatch_overhead_ms)


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 10_500_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 16
    from pathtracing_tpu.accel.pallas_trace2 import (build_tri_blocks2,
                                                     pallas_tri_intersect2,
                                                     G_DEFAULT)
    from pathtracing_tpu.scene.intersect import (_morton_key,
                                                 _first_block_key)

    # "0" / "-" / "auto" all mean auto-pick k2 (build_tri_blocks2 treats
    # only None as auto), so a g sweep can keep the default k2
    k2_raw = sys.argv[3] if len(sys.argv) > 3 else None
    k2_arg = None if k2_raw in (None, "0", "-", "auto") else int(k2_raw)
    g = int(sys.argv[4]) if len(sys.argv) > 4 else G_DEFAULT
    pops = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    tri = heightfield(n_tris)
    print(f"tris={len(tri):,} rays={n_rays:,} g={g} "
          f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    arrays, k2 = build_tri_blocks2(tri, k2=k2_arg, g=g)
    scene = {k: jnp.asarray(v) for k, v in arrays.items()}
    print(f"build {time.perf_counter()-t0:.0f}s k2={k2} "
          f"m1={arrays['pk_blk_lo'].shape[0]}", flush=True)
    base = dispatch_overhead_ms()

    oc, dc = camera_rays(n_rays)
    ob, db = bounce_rays(n_rays)
    fake = dict(scene_lo=jnp.asarray(ob.min(0)),
                scene_hi=jnp.asarray(ob.max(0)))

    def order(o, d, how):
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        if how == "morton":
            key = _morton_key(fake, o, d)
        else:
            key = _first_block_key(scene, o, d)
        p = jnp.argsort(key)
        return o[p], d[p]

    t_max = jnp.full((n_rays,), 1e30, jnp.float32)

    def run(o, d, recull_every, iters=3):
        fn = lambda: pallas_tri_intersect2(scene, o, d, t_max, k2,
                                           g=g, pops=pops,
                                           recull_every=recull_every)
        jax.device_get(fn()["t"])
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.device_get(fn()["t"])
        return (time.perf_counter() - t0) / iters * 1e3 - base

    OFF = 1 << 30
    # bounce/firstblk first: the decision-relevant rows come out early
    # even if a sweep run is cut short
    for label, o, d in [("bounce", ob, db), ("coherent", oc, dc)]:
        for how in ("firstblk", "morton"):
            os_, ds_ = order(o, d, how)
            for rc in (16, OFF, 32, 8):
                ms = run(os_, ds_, rc)
                rcs = "off" if rc == OFF else str(rc)
                print(f"{label:9s} sort={how:8s} recull={rcs:>3s} "
                      f"{ms:8.1f} ms  {n_rays/ms/1e3:7.2f} Mray/s",
                      flush=True)

    # visit counters at the extremes (bounce rays)
    for how in ("morton", "firstblk"):
        os_, ds_ = order(ob, db, how)
        for rc in (OFF, 16):
            r = pallas_tri_intersect2(scene, os_, ds_, t_max, k2, g=g,
                                      pops=pops,
                                      counters=True, recull_every=rc)
            nl1 = np.asarray(r["n_l1_visited"])
            nch = np.asarray(r["n_children_tested"])
            rcs = "off" if rc == OFF else str(rc)
            print(f"counters bounce sort={how:8s} recull={rcs:>3s} "
                  f"L1/tile mean {nl1.mean():6.0f} max {nl1.max():5.0f}  "
                  f"child/tile mean {nch.mean():6.0f}", flush=True)


if __name__ == "__main__":
    main()
