"""(K2, G) block-shape sweep on the two-level kernel, one process.

Round-3 re-sweep: the vectorized child drain removed the ~2us/visit
scalar-pipeline overhead that made small children unattractive in round
2 — smaller K2 buys finer culling (fewer wasted prim tests per entered
child) at more pops per visit.  The SAH order is computed ONCE and
reused across configs (it is k2/g-independent), so each extra config
costs only the blocking + kernel compile.

  python tools/bench_kg.py [n_tris] [n_rays] [k2,g ...]

Default sweep: 256,16 (current default) 128,32 128,16 256,32 128,64.
Rows print decision-relevant first (bounce before coherent).
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
    configs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[3:]]
    if not configs:
        configs = [(256, 16), (128, 32), (128, 16), (256, 32), (128, 64)]

    from pathtracing_tpu.accel.pallas_trace2 import (build_tri_blocks2,
                                                     pallas_tri_intersect2)
    from pathtracing_tpu.accel.build import _sah_build_binary
    from pathtracing_tpu.native.loader import native_build_bvh
    from pathtracing_tpu.scene.intersect import _first_block_key

    tri = heightfield(n_tris)
    print(f"tris={len(tri):,} rays={n_rays:,} "
          f"backend={jax.default_backend()}", flush=True)
    lo = tri.min(1)
    hi = tri.max(1)
    t0 = time.perf_counter()
    native = native_build_bvh(lo, hi, 4)
    order = native[3] if native is not None else \
        _sah_build_binary(lo, hi, leaf_size=4)[1]
    print(f"SAH order {time.perf_counter()-t0:.0f}s", flush=True)
    base = dispatch_overhead_ms()

    oc, dc = camera_rays(n_rays)
    ob, db = bounce_rays(n_rays)
    t_max = jnp.full((n_rays,), 1e30, jnp.float32)

    for k2, g in configs:
        t0 = time.perf_counter()
        arrays, k2b = build_tri_blocks2(tri, k2=k2, g=g, order=order)
        scene = {k: jnp.asarray(v) for k, v in arrays.items()}
        m1 = arrays["pk_blk_lo"].shape[0]
        print(f"-- k2={k2b} g={g} m1={m1} "
              f"(block {time.perf_counter()-t0:.0f}s)", flush=True)

        def srt(o, d):
            key = _first_block_key(scene, jnp.asarray(o), jnp.asarray(d))
            p = jnp.argsort(key)
            return jnp.asarray(o)[p], jnp.asarray(d)[p]

        def run(o, d, iters=3):
            fn = lambda: pallas_tri_intersect2(scene, o, d, t_max, k2b,
                                               g=g)
            jax.device_get(fn()["t"])
            t0 = time.perf_counter()
            for _ in range(iters):
                jax.device_get(fn()["t"])
            return (time.perf_counter() - t0) / iters * 1e3 - base

        for label, o, d in [("bounce", ob, db), ("coherent", oc, dc)]:
            os_, ds_ = srt(o, d)
            ms = run(os_, ds_)
            print(f"  {label:9s} {ms:8.1f} ms  "
                  f"{n_rays/ms/1e3:7.2f} Mray/s", flush=True)
        # visit counters (bounce)
        os_, ds_ = srt(ob, db)
        r = pallas_tri_intersect2(scene, os_, ds_, t_max, k2b, g=g,
                                  counters=True)
        nl1 = np.asarray(r["n_l1_visited"])
        nch = np.asarray(r["n_children_tested"])
        print(f"  counters bounce: L1/tile {nl1.mean():6.0f} "
              f"child/tile {nch.mean():6.0f} "
              f"prim-tests/ray {nch.mean()*k2b/128:7.0f}", flush=True)


if __name__ == "__main__":
    main()
