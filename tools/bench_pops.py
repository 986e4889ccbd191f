"""Sweep (k2, g, pops) on the two-level kernel's child drain.

The drain's per-iteration vector->scalar->branch sync measured ~0.7us
against ~0.4us for the bare [128,256] leaf test (tools/bench_mxu_leaf),
so testing P popped children per iteration amortizes the sync; smaller
k2 with larger g keeps the group-row size and L1 count CONSTANT while
making child selection finer (less wasted leaf volume per entered
child).  This tool builds each (k2, g) table set once from a shared SAH
order and times closest-hit on coherent + bounce rays for each pops,
checking exact agreement with the (default, pops=1) result.

Usage: python tools/bench_pops.py [n_tris] [n_rays]
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
                                                     pallas_tri_intersect2)
    from pathtracing_tpu.accel.build import _sah_build_binary
    from pathtracing_tpu.native.loader import native_build_bvh
    from pathtracing_tpu.scene.intersect import _first_block_key

    tri = heightfield(n_tris)
    lo, hi = tri.min(1), tri.max(1)
    t0 = time.perf_counter()
    native = native_build_bvh(lo, hi, 4)
    order = (native[3] if native is not None
             else _sah_build_binary(lo, hi, leaf_size=4)[1])
    print(f"tris={len(tri):,} rays={n_rays:,} order "
          f"{time.perf_counter()-t0:.0f}s backend={jax.default_backend()}",
          flush=True)
    base = dispatch_overhead_ms()
    print(f"dispatch overhead {base:.1f} ms", flush=True)

    oc, dc = camera_rays(n_rays)
    ob, db = bounce_rays(n_rays)
    t_max = jnp.full((n_rays,), 1e30, jnp.float32)

    # (k2, g, [pops...]); round-4 production default is (128, 32, 4).
    # PT_SWEEP="k2,g,pops k2,g,pops ..." overrides the grid.
    env = os.environ.get("PT_SWEEP")
    if env:
        configs = {}
        for tok in env.split():
            k2c, gg, pp = (int(x) for x in tok.split(","))
            configs.setdefault((k2c, gg), []).append(pp)
        configs = [(k2c, gg, tuple(pp))
                   for (k2c, gg), pp in configs.items()]
    else:
        configs = [(256, 16, (1, 2)),
                   (128, 32, (1, 2, 4)),
                   (128, 16, (2, 4)),
                   (512, 16, (1, 2)),
                   (256, 32, (2,))]
    ref = {}
    for k2c, g, pops_list in configs:
        t0 = time.perf_counter()
        arrays, k2 = build_tri_blocks2(tri, k2=k2c, g=g, order=order)
        scene = {k: jnp.asarray(v) for k, v in arrays.items()}
        m1 = arrays["pk_blk_lo"].shape[0]
        print(f"-- k2={k2} g={g} m1={m1} W={g*k2+128} "
              f"(block {time.perf_counter()-t0:.0f}s)", flush=True)
        orders = {}
        for label, o, d in (("bounce", ob, db), ("coherent", oc, dc)):
            o = jnp.asarray(o)
            d = jnp.asarray(d)
            p = jnp.argsort(_first_block_key(scene, o, d))
            orders[label] = (o[p], d[p])
        pair = os.environ.get("PT_PAIR") == "1"
        for pops in pops_list:
            for label in ("bounce", "coherent"):
                o_s, d_s = orders[label]
                fn = lambda: pallas_tri_intersect2(scene, o_s, d_s,
                                                   t_max, k2, g=g,
                                                   pops=pops, pair=pair)
                r = fn()
                tt = np.asarray(r["t"])
                tri_ids = np.asarray(r["tri"])
                if label not in ref and (k2c, g) == (256, 16):
                    ref[label] = (tt, tri_ids)
                if label in ref:
                    # same (o,d) order only within a table config; cross
                    # configs compare the multiset of t values
                    agree = np.allclose(np.sort(tt),
                                        np.sort(ref[label][0]),
                                        rtol=1e-6, atol=1e-6)
                else:
                    agree = True
                jax.device_get(r["t"])
                t0 = time.perf_counter()
                for _ in range(3):
                    jax.device_get(fn()["t"])
                ms = (time.perf_counter() - t0) / 3 * 1e3 - base
                cnt = pallas_tri_intersect2(scene, o_s, d_s, t_max, k2,
                                            g=g, pops=pops,
                                            counters=True)
                nl1 = float(np.asarray(cnt["n_l1_visited"]).mean())
                nch = float(np.asarray(cnt["n_children_tested"]).mean())
                print(f"k2={k2:3d} g={g:2d} pops={pops} {label:9s}"
                      f" {ms:8.1f} ms  {n_rays/ms/1e3:7.2f} Mray/s"
                      f"  L1/tile {nl1:6.1f} child/tile {nch:6.1f}"
                      f"  {'ok' if agree else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
