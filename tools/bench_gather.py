"""Microbench: make_interaction's per-hit gather cost on the TPU.

The round-3 stage census showed make_interaction at ~17 ms / 64K rays
on the 10.5M-tri bench scene — ~7x the closest-hit traversal it
follows.  It performs FIVE separate random-row gathers from
triangle-count-sized tables (tri_v 9f, tri_n 9f, tri_uv 6f, tri_tan 9f,
tri_prop 4f).  This tool times, per 64K-hit batch:

  one9       a single [N] gather from a [M,9] table
  five       the five production gathers
  packed     ONE gather from a packed [M,40] AoS row
  interact   the full production make_interaction

Usage: python tools/bench_gather.py [n_tris] [n_rays]
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


def timeit(fn, *args, iters=5, base=0.0):
    """min-of-iters (the tunnel adds tail noise comparable to the
    signal; the minimum is the honest per-call figure)."""
    jax.device_get(jax.tree.leaves(fn(*args))[0])
    best = 1e30
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best - base


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 10_500_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 16
    rng = np.random.default_rng(0)
    tabs = dict(
        tri_v=jnp.asarray(rng.normal(size=(m, 3, 3)).astype(np.float32)),
        tri_n=jnp.asarray(rng.normal(size=(m, 3, 3)).astype(np.float32)),
        tri_uv=jnp.asarray(rng.normal(size=(m, 3, 2)).astype(np.float32)),
        tri_tan=jnp.asarray(rng.normal(size=(m, 3, 3)).astype(np.float32)),
        tri_prop=jnp.asarray(
            rng.integers(0, 4, (m, 4)).astype(np.int32)),
        packed=jnp.asarray(rng.normal(size=(m, 40)).astype(np.float32)),
    )
    idx = jnp.asarray(rng.integers(0, m, (n,)).astype(np.int32))

    f = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((1024,), jnp.float32)
    base = timeit(f, x, iters=10)
    print(f"m={m:,} n={n:,} backend={jax.default_backend()} "
          f"dispatch {base*1e3:.1f} ms", flush=True)

    # every timed fn returns a SCALAR: device_get of a [64K] result pays
    # the tunnel's wire time (~10 ms/MB) on top of compute
    @jax.jit
    def one9(tabs, idx):
        return jnp.sum(tabs["tri_v"][idx])

    @jax.jit
    def five(tabs, idx):
        a = jnp.sum(tabs["tri_v"][idx], axis=(1, 2))
        b = jnp.sum(tabs["tri_n"][idx], axis=(1, 2))
        c = jnp.sum(tabs["tri_uv"][idx], axis=(1, 2))
        d = jnp.sum(tabs["tri_tan"][idx], axis=(1, 2))
        e = jnp.sum(tabs["tri_prop"][idx].astype(jnp.float32), axis=1)
        return jnp.sum(a + b + c + d + e)

    @jax.jit
    def packed(tabs, idx):
        return jnp.sum(tabs["packed"][idx])

    for name, fn in [("one9", one9), ("five", five), ("packed", packed)]:
        dt = timeit(fn, tabs, idx, base=base)
        print(f"{name:9s} {dt*1e3:8.2f} ms  ({dt/n*1e9:6.1f} ns/row)",
              flush=True)

    # full production make_interaction on a real built scene
    from pathtracing_tpu import scenes
    from pathtracing_tpu.scene.intersect import intersect, make_interaction
    from pathtracing_tpu.sensor.camera import generate_ray
    from pathtracing_tpu.core.rng import sample_1d, sample_2d
    from pathtracing_tpu.integrators.path import RenderConfig

    scene, cam, meta = scenes.sanmiguel_analog(resolution=(1920, 1080),
                                               n_tris=m)
    w, h = cam["resolution"]
    pix = (h // 2) * w + jnp.arange(n, dtype=jnp.int32)
    s = RenderConfig(spp=1, max_depth=8).sampler
    px, py = pix % w, pix // w

    def rays_hit(scene, cam):
        pj = sample_2d(s, px, py, jnp.asarray(0, jnp.uint32), 0)
        tu = sample_1d(s, px, py, jnp.asarray(0, jnp.uint32), 2)
        lu = sample_2d(s, px, py, jnp.asarray(0, jnp.uint32), 3)
        p = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)],
                      -1) + pj
        o, d, tm = generate_ray(cam, p, tu, lu)
        return o, d, tm, intersect(scene, meta, o, d, 1e30, time=tm)

    @jax.jit
    def hit_only(scene, cam):
        o, d, tm, hit = rays_hit(scene, cam)
        # touch every hit output (scalar reduction: no wire cost)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in hit.values())

    @jax.jit
    def interact(scene, cam):
        o, d, tm, hit = rays_hit(scene, cam)
        it = make_interaction(scene, meta, o, d, hit, time=tm)
        # touch every output so nothing is DCE'd (the census only kept p)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in it.values())

    t_hit = timeit(hit_only, scene, cam, base=base)
    t_int = timeit(interact, scene, cam, base=base)
    print(f"{'raygen+hit':9s} {t_hit*1e3:8.2f} ms", flush=True)
    print(f"{'+interact (all outputs)':9s} {t_int*1e3:8.2f} ms  "
          f"(delta {(t_int-t_hit)*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
