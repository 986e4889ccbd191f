"""Interleaved A/B of the in-kernel alpha micro-masks on the faithful
San-Miguel-analog scene (round-5 item 1).

Builds ONE scene (masks in the tables), then times the shadow predicate
and the alpha closest pass under meta.alpha_cull_mask = True vs False —
same arrays, same rays, interleaved within one session so tunnel drift
cannot bias the comparison (STATUS round-4 items 13/16).  Shadow rays
are REAL sampled NEE directions from mid-frame bounce states (the
synthetic sun probe under-states chain incoherence, STATUS round-4
item 8).

Usage: python tools/bench_amask.py [n_tris] [foliage] [depth]
"""
from __future__ import annotations

import dataclasses
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
    depth_max = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    from pathtracing_tpu import scenes
    from pathtracing_tpu.integrators.path import (RenderConfig,
                                                  _make_bounce)
    from pathtracing_tpu.scene.intersect import (_pallas_dispatch,
                                                 intersect,
                                                 make_interaction,
                                                 occluded)
    from pathtracing_tpu.scene import lights as L
    from pathtracing_tpu.sensor.camera import camera_lanes
    from pathtracing_tpu.core.rng import sample_1d, sample_2d
    from pathtracing_tpu.core import rng as rngmod

    n = 1 << 16
    t0 = time.perf_counter()
    scene, cam, meta1 = scenes.sanmiguel_analog(resolution=(1920, 1080),
                                                n_tris=n_tris,
                                                foliage=foliage)
    assert getattr(meta1, "alpha_cull_mask", False), \
        "scene built without masks (PT_ALPHA_MASK=0 or cached v<5?)"
    meta0 = dataclasses.replace(meta1, alpha_cull_mask=False)
    print(f"tris={meta1.n_tri:,} accel={meta1.accel} "
          f"build {time.perf_counter()-t0:.0f}s "
          f"backend={jax.default_backend()}", flush=True)
    w, h = cam["resolution"]
    pix = (h // 2) * w + jnp.arange(n, dtype=jnp.int32)
    px, py = pix % w, pix // w
    cfg = RenderConfig(spp=1, max_depth=depth_max + 2, integrator="path",
                       rays_per_batch=n)
    s = cfg.sampler

    @jax.jit
    def step(scene, cam, st, b):
        tm = jnp.zeros((n,), jnp.float32)
        bounce = _make_bounce(scene, meta1, cfg, px, py, tm,
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
                    medium=jnp.full((n,), meta1.camera_medium, jnp.int32),
                    rr_depth=jnp.zeros((n,), jnp.int32),
                    n_rays=jnp.zeros((), jnp.float32))

    f = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((1024,), jnp.float32)
    jax.device_get(f(x))
    base = 1e30
    for _ in range(10):
        t0 = time.perf_counter()
        jax.device_get(f(x))
        base = min(base, time.perf_counter() - t0)
    print(f"dispatch {base*1e3:.1f} ms", flush=True)

    @jax.jit
    def shadow_rays(scene, o, d, tm, alive):
        """Real NEE shadow-ray population at this bounce state: surface
        hit points + sampled light directions."""
        hit = intersect(scene, meta1, o, d, tm)
        it = make_interaction(scene, meta1, o, d, hit)
        uv_light = sample_2d(s, px, py, jnp.asarray(0, jnp.uint32), 11)
        u_select = sample_1d(s, px, py, jnp.asarray(0, jnp.uint32), 12)
        u_cell = rngmod.hash_float(px, py, jnp.asarray(0, jnp.uint32),
                                   13, s.seed)
        lidx, pmf, lvalid = L.sample_light_index(scene, meta1, u_select)
        ls = L.light_sample(scene, meta1, lidx, it["p"], u_cell,
                            uv_light, None)
        t_sh = jnp.where(alive & hit["valid"] & lvalid,
                         ls.get("dist", jnp.full((n,), 1e30)), 0.0)
        return it["p"], ls["dir"], t_sh

    def mk_occl(meta):
        @jax.jit
        def fn(scene, p, sdir, t_sh):
            return occluded(scene, meta, p, sdir, t_sh, rand_key=7)
        return fn

    def mk_pka(meta):
        @jax.jit
        def fn(scene, o, d, tm):
            r = _pallas_dispatch(scene, meta, o, d, tm,
                                 tri_tables="alpha", analytic=False)
            return jnp.sum(r["t"] * (r["t"] < 1e30))
        return fn

    occl1, occl0 = mk_occl(meta1), mk_occl(meta0)
    pka1, pka0 = mk_pka(meta1), mk_pka(meta0)

    def timed_pair(fa, fb, iters=4):
        """Interleaved min-of-iters for two closures (same session,
        alternating order)."""
        jax.device_get(jax.tree.leaves(fa())[0])
        jax.device_get(jax.tree.leaves(fb())[0])
        best_a = best_b = 1e30
        for i in range(iters):
            for which in ((fa, fb) if i % 2 == 0 else (fb, fa)):
                t0 = time.perf_counter()
                jax.device_get(jax.tree.leaves(which())[0])
                dt = time.perf_counter() - t0
                if which is fa:
                    best_a = min(best_a, dt)
                else:
                    best_b = min(best_b, dt)
        return (best_a - base) * 1e3, (best_b - base) * 1e3

    st = init(scene, cam)
    for b in range(depth_max + 1):
        o, d, alive = st["o"], st["d"], st["alive"]
        na = int(jax.device_get(jnp.sum(alive.astype(jnp.int32))))
        tm = jnp.where(alive, 1e30, 0.0)
        p, sdir, t_sh = shadow_rays(scene, o, d, tm, alive)
        oc1, oc0 = timed_pair(lambda: occl1(scene, p, sdir, t_sh),
                              lambda: occl0(scene, p, sdir, t_sh))
        pk1, pk0 = timed_pair(lambda: pka1(scene, o, d, tm),
                              lambda: pka0(scene, o, d, tm))
        # sanity: predicates must agree exactly (MASK foliage)
        a1 = np.asarray(jax.device_get(occl1(scene, p, sdir, t_sh)))
        a0 = np.asarray(jax.device_get(occl0(scene, p, sdir, t_sh)))
        print(f"depth {b}: alive {na:6d} | occl masked {oc1:7.1f} "
              f"unmasked {oc0:7.1f} ({oc0/max(oc1,1e-9):.2f}x) | "
              f"pka closest masked {pk1:6.1f} unmasked {pk0:6.1f} | "
              f"pred diff {(a1 != a0).sum()}", flush=True)
        st = step(scene, cam, st, jnp.asarray(b, jnp.int32))


if __name__ == "__main__":
    main()
