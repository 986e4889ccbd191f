"""Scoping A/B: exact slab sort key vs FREE hit-block-derived key.

The production dispatch sort key is exact first-two-entered-blocks
(+octant) from an ~10-20 ms/64K slab pre-pass per dispatch
(intersect._first_block_key).  Bounce and NEE rays originate ON the
previous hit, whose containing L2 block is already known from the hit
record — so (hit_block << 3) | octant is a ZERO-cost key candidate.
This tool measures what the kernel loses under the free key on real
mid-frame bounce states: if the loss is below the slab cost, round 5
should thread hit-block keys through the bounce state.

Usage: python tools/bench_hitkey.py [n_tris] [foliage] [depth]
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
    foliage = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    depth_max = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from pathtracing_tpu import scenes
    from pathtracing_tpu.integrators.path import RenderConfig, _make_bounce
    from pathtracing_tpu.scene.intersect import (_first_block_key,
                                                 _subset_scene, intersect)
    from pathtracing_tpu.sensor.camera import camera_lanes
    from pathtracing_tpu.accel.pallas_trace2 import pallas_tri_intersect2

    n = 1 << 16
    t0 = time.perf_counter()
    scene, cam, meta = scenes.sanmiguel_analog(resolution=(1920, 1080),
                                               n_tris=n_tris,
                                               foliage=foliage)
    print(f"tris={meta.n_tri:,} accel={meta.accel} build "
          f"{time.perf_counter()-t0:.0f}s", flush=True)
    w, h = cam["resolution"]
    pix = (h // 2) * w + jnp.arange(n, dtype=jnp.int32)
    px, py = pix % w, pix // w
    cfg = RenderConfig(spp=1, max_depth=depth_max + 2, integrator="path",
                       rays_per_batch=n)

    # tri id -> physical L2 block of the OPAQUE two-level tables
    s2t = np.asarray(scene["pk_slot2tri"])
    k2 = meta.block_k
    inv_slot = np.full(meta.n_tri, 0, np.int64)
    valid = s2t >= 0
    inv_slot[s2t[valid]] = np.nonzero(valid)[0]
    inv_blk = jnp.asarray(inv_slot // k2, jnp.int32)

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

    f = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((1024,), jnp.float32)
    jax.device_get(f(x))
    base = 1e30
    for _ in range(8):
        t0 = time.perf_counter()
        jax.device_get(f(x))
        base = min(base, time.perf_counter() - t0)
    print(f"dispatch {base*1e3:.1f} ms", flush=True)

    sub = _subset_scene(scene, "pk_")
    g = meta.block_g
    pops = meta.block_pops

    def timed_kernel(o_s, d_s, tm_s):
        fn = lambda: pallas_tri_intersect2(sub, o_s, d_s, tm_s, k2, g=g,
                                           pops=pops)
        jax.device_get(fn()["t"])
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(fn()["t"])
            best = min(best, time.perf_counter() - t0)
        cnt = pallas_tri_intersect2(sub, o_s, d_s, tm_s, k2, g=g,
                                    pops=pops, counters=True)
        nl1 = float(np.asarray(cnt["n_l1_visited"]).mean())
        return (best - base) * 1e3, nl1

    st = init(scene, cam)
    prev_hit = None
    for b in range(depth_max + 1):
        o, d, alive = st["o"], st["d"], st["alive"]
        tm = jnp.where(alive, 1e30, 0.0)
        octant = ((d[:, 0] > 0).astype(jnp.uint32)
                  | ((d[:, 1] > 0).astype(jnp.uint32) << 1)
                  | ((d[:, 2] > 0).astype(jnp.uint32) << 2))
        if b > 0 and prev_hit is not None:
            # ---- exact key
            ka = _first_block_key(scene, o, d)
            ka = jnp.where(tm <= 0.0, jnp.uint32(0xFFFFFFFF), ka)
            pa = jnp.argsort(ka)
            ms_a, l1_a = timed_kernel(o[pa], d[pa], tm[pa])
            # ---- free hit-block key (origin = previous hit point)
            htri = jnp.clip(prev_hit["idx"], 0, meta.n_tri - 1)
            blk = jnp.where(prev_hit["valid"], inv_blk[htri], 0)
            kb = (blk.astype(jnp.uint32) << 3) | octant
            kb = jnp.where(tm <= 0.0, jnp.uint32(0xFFFFFFFF), kb)
            pb = jnp.argsort(kb)
            ms_b, l1_b = timed_kernel(o[pb], d[pb], tm[pb])
            print(f"depth {b}: exact {ms_a:7.1f} ms (L1/tile {l1_a:5.1f})"
                  f"  hitblk {ms_b:7.1f} ms (L1/tile {l1_b:5.1f})"
                  f"  delta {ms_b-ms_a:+6.1f}", flush=True)
        prev_hit = intersect(scene, meta, o, d, tm)
        st = step(scene, cam, st, jnp.asarray(b, jnp.int32))


if __name__ == "__main__":
    main()
