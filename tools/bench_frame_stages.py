"""Bounce-wave cost attribution on the FAITHFUL San-Miguel-analog scene.

The round-4 faithful scene (textures + 2500 instanced alpha-foliage +
depth 64) dropped the forward rate ~12x vs the round-3 gentle scene;
this tool splits one production bounce wave at a REAL mid-frame depth
into its stages so the optimization targets are measured, not guessed:

  key        _first_block_key + argsort (dispatch sort pre-pass)
  pk         closest-hit over the opaque world tables only
  pka        closest-hit over the instanced alpha (foliage) tables only
  closest    full production intersect (pk + pka + merge)
  inter      + make_interaction (gathers, normal mapping)
  mat        + resolve_material (texture fetches)
  nee        one full sample_ld (light sample + occluded + MIS)
  occl       the occluded() predicate alone (opaque any-hit + chain)
  bounce     the whole production bounce step

Usage: python tools/bench_frame_stages.py [n_tris] [foliage] [depth]
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
    from pathtracing_tpu.integrators.path import (RenderConfig,
                                                  _make_bounce,
                                                  resolve_material,
                                                  sample_ld)
    from pathtracing_tpu.scene.intersect import (_pallas_dispatch,
                                                 _first_block_key,
                                                 intersect,
                                                 make_interaction,
                                                 occluded)
    from pathtracing_tpu.scene import lights as L
    from pathtracing_tpu.sensor.camera import camera_lanes
    from pathtracing_tpu.core.rng import sample_1d, sample_2d
    from pathtracing_tpu.core import rng as rngmod

    n = 1 << 16
    t0 = time.perf_counter()
    scene, cam, meta = scenes.sanmiguel_analog(resolution=(1920, 1080),
                                               n_tris=n_tris,
                                               foliage=foliage)
    print(f"tris={meta.n_tri:,} inst={meta.n_inst} accel={meta.accel} "
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

    # ---- stage functions (jitted once per shape) ---------------------
    @jax.jit
    def stage_key(scene, o, d):
        return jnp.argsort(_first_block_key(scene, o, d))

    def mk_tables(tables):
        @jax.jit
        def fn(scene, o, d, tm):
            r = _pallas_dispatch(scene, meta, o, d, tm, time=None,
                                 tri_tables=tables, analytic=False)
            return jnp.sum(r["t"] * (r["t"] < 1e30))
        return fn

    stage_pk = mk_tables("opaque")
    stage_pka = mk_tables("alpha")

    @jax.jit
    def stage_closest(scene, o, d, tm):
        return intersect(scene, meta, o, d, tm)["t"]

    @jax.jit
    def stage_inter(scene, o, d, tm):
        hit = intersect(scene, meta, o, d, tm)
        return make_interaction(scene, meta, o, d, hit)["p"]

    @jax.jit
    def stage_mat(scene, o, d, tm):
        hit = intersect(scene, meta, o, d, tm)
        it = make_interaction(scene, meta, o, d, hit)
        return resolve_material(scene, meta, it)["base_color"]

    @jax.jit
    def stage_anyhit(scene, o, d, tm, sdir, alive):
        """The opaque any-hit pass alone (occluded minus the alpha
        chain)."""
        hit = intersect(scene, meta, o, d, tm)
        it = make_interaction(scene, meta, o, d, hit)
        t_sh = jnp.where(alive & hit["valid"], 1e30, 0.0)
        return _pallas_dispatch(scene, meta, it["p"], sdir, t_sh,
                                any_hit=True, tri_tables="opaque",
                                analytic=False)["valid"]

    @jax.jit
    def stage_occl(scene, o, d, tm, sdir, alive):
        hit = intersect(scene, meta, o, d, tm)
        it = make_interaction(scene, meta, o, d, hit)
        t_sh = jnp.where(alive & hit["valid"], 1e30, 0.0)
        return occluded(scene, meta, it["p"], sdir, t_sh, rand_key=7)

    @jax.jit
    def stage_lmath(scene, o, d, tm, alive):
        """sample_ld's light machinery WITHOUT the occluded() call:
        light_sample + bsdf_eval_pdf + L/pdf/MIS on the same lanes."""
        from pathtracing_tpu.core.bsdf import bsdf_eval_pdf
        hit = intersect(scene, meta, o, d, tm)
        it = make_interaction(scene, meta, o, d, hit)
        mat = resolve_material(scene, meta, it)
        uv_light = sample_2d(s, px, py, jnp.asarray(0, jnp.uint32), 11)
        u_select = sample_1d(s, px, py, jnp.asarray(0, jnp.uint32), 12)
        u_cell = rngmod.hash_float(px, py, jnp.asarray(0, jnp.uint32),
                                   13, s.seed)
        lidx, pmf, lvalid = L.sample_light_index(scene, meta, u_select)
        ls = L.light_sample(scene, meta, lidx, it["p"], u_cell,
                            uv_light, None)
        f_surf, pdf_surf = bsdf_eval_pdf(mat, d, it, ls["dir"])
        l_val = L.light_sample_L(scene, meta, lidx, ls, ls["dir"])
        shape_pdf = L.light_sample_pdf(scene, meta, lidx, ls, it["p"],
                                       ls["dir"])
        return (jnp.sum(f_surf) + jnp.sum(l_val) + jnp.sum(shape_pdf)
                + jnp.sum(pdf_surf) + jnp.sum(pmf))

    @jax.jit
    def stage_nee(scene, o, d, tm, alive, b):
        hit = intersect(scene, meta, o, d, tm)
        it = make_interaction(scene, meta, o, d, hit)
        mat = resolve_material(scene, meta, it)
        uv_light = sample_2d(s, px, py, jnp.asarray(0, jnp.uint32), 11)
        u_select = sample_1d(s, px, py, jnp.asarray(0, jnp.uint32), 12)
        u_cell = rngmod.hash_float(px, py, jnp.asarray(0, jnp.uint32),
                                   13, s.seed)
        g_lanes = jnp.zeros((n,), jnp.float32)
        return sample_ld(scene, meta, cfg, d, it, mat,
                         jnp.zeros((n,), bool),
                         jnp.full((n,), -1, jnp.int32), g_lanes,
                         u_select, uv_light, u_cell, 7,
                         alive & hit["valid"], False)

    st = init(scene, cam)
    for b in range(depth_max + 1):
        o, d, alive = st["o"], st["d"], st["alive"]
        na = int(jax.device_get(jnp.sum(alive.astype(jnp.int32))))
        tm = jnp.where(alive, 1e30, 0.0)
        # a representative NEE direction: sun-ish with jitter
        sdir = jnp.asarray([-0.35, 1.0, -0.25], jnp.float32)
        sdir = sdir / jnp.linalg.norm(sdir)
        sdir = jnp.broadcast_to(sdir, (n, 3))

        r = {}
        print(f"depth {b}: alive {na:6d} | ", end="", flush=True)
        for name, fn in [
                ("key", lambda: stage_key(scene, o, d)),
                ("pk", lambda: stage_pk(scene, o, d, tm)),
                ("pka", lambda: stage_pka(scene, o, d, tm)),
                ("closest", lambda: stage_closest(scene, o, d, tm)),
                ("inter", lambda: stage_inter(scene, o, d, tm)),
                ("mat", lambda: stage_mat(scene, o, d, tm)),
                ("lmath", lambda: stage_lmath(scene, o, d, tm, alive)),
                ("anyhit", lambda: stage_anyhit(scene, o, d, tm, sdir,
                                                alive)),
                ("occl", lambda: stage_occl(scene, o, d, tm, sdir,
                                            alive)),
                ("nee", lambda: stage_nee(scene, o, d, tm, alive,
                                          jnp.asarray(b, jnp.int32))),
                ("bounce", lambda: step(scene, cam, st,
                                        jnp.asarray(b, jnp.int32)))]:
            r[name] = timed(fn)
            print(f"{name} {r[name]:7.1f}  ", end="", flush=True)
        print(flush=True)
        st = step(scene, cam, st, jnp.asarray(b, jnp.int32))

    # foliage kernel counters on the last bounce state
    if "pka_tri" in scene and "pka_l1_base" in scene:
        from pathtracing_tpu.accel.pallas_trace2 import pallas_tri_intersect2
        from pathtracing_tpu.scene.intersect import _subset_scene
        sub = _subset_scene(scene, "pka_")
        key = _first_block_key(scene, st["o"], st["d"])
        p = jnp.argsort(key)
        r = pallas_tri_intersect2(sub, st["o"][p], st["d"][p],
                                  jnp.where(st["alive"], 1e30, 0.0)[p],
                                  meta.alpha_block_k, counters=True)
        nl1 = np.asarray(r["n_l1_visited"])
        nch = np.asarray(r["n_children_tested"])
        print(f"pka counters (bounce rays): L1 visits/tile mean "
              f"{nl1.mean():.0f} max {nl1.max():.0f}; children/tile "
              f"mean {nch.mean():.0f}", flush=True)


if __name__ == "__main__":
    main()
