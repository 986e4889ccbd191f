"""Traversal-kernel microbench: Mray/s of the Pallas kernels on the TPU.

Builds a synthetic heightfield mesh (configurable triangle count), fires
coherent camera rays and incoherent (hemisphere) rays at it, and times
pallas_tri_intersect / pallas_tri_intersect2 end to end.

Usage: python tools/bench_traversal.py [n_tris] [n_rays] [auto|one|two]
       [k2] [g]     (two-level block-size sweep overrides)
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def heightfield(n_tris: int):
    """~n_tris triangles over a bumpy [0,100]^2 heightfield."""
    side = max(2, int(np.sqrt(n_tris / 2)) + 1)
    xs = np.linspace(0, 100, side, dtype=np.float32)
    zs = np.linspace(0, 100, side, dtype=np.float32)
    x, z = np.meshgrid(xs, zs, indexing="ij")
    rng = np.random.default_rng(0)
    y = (4.0 * np.sin(x * 0.23) * np.cos(z * 0.17)
         + 1.5 * np.sin(x * 1.7) * np.sin(z * 2.3)
         + rng.normal(0, 0.2, x.shape)).astype(np.float32)
    v = np.stack([x, y, z], -1).reshape(-1, 3)
    i, j = np.meshgrid(np.arange(side - 1), np.arange(side - 1),
                       indexing="ij")
    a = (i * side + j).ravel()
    b = a + 1
    c = a + side
    d = c + 1
    f = np.concatenate([np.stack([a, b, c], -1),
                        np.stack([b, d, c], -1)], 0).astype(np.int32)
    tri = v[f]                                            # [T,3,3]
    return tri


def camera_rays(n: int):
    """Raster-order pinhole rays: consecutive 128-ray tiles are scanline
    neighbors (the coherence the production render path provides)."""
    side = int(np.sqrt(n))
    assert side * side == n, n
    o = np.asarray([50.0, 40.0, -30.0], np.float32)
    px, pz = np.meshgrid(np.linspace(0, 100, side, dtype=np.float32),
                         np.linspace(0, 100, side, dtype=np.float32),
                         indexing="ij")
    target = np.stack([px.ravel(), np.zeros(n, np.float32), pz.ravel()], -1)
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return np.broadcast_to(o, (n, 3)).copy(), d.astype(np.float32)


def morton_sorted(o, d):
    """Production bounce rays go through the Morton sort in
    scene.intersect._pallas_dispatch; reproduce it here."""
    from pathtracing_tpu.scene.intersect import _morton_key
    fake = dict(scene_lo=jnp.asarray(o.min(0)), scene_hi=jnp.asarray(o.max(0)))
    perm = jnp.argsort(_morton_key(fake, jnp.asarray(o), jnp.asarray(d)))
    return jnp.asarray(o)[perm], jnp.asarray(d)[perm]


def bounce_rays(n: int):
    rng = np.random.default_rng(2)
    o = np.stack([rng.uniform(0, 100, n), rng.uniform(6, 10, n),
                  rng.uniform(0, 100, n)], -1).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d[:, 1] = -np.abs(d[:, 1])
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


_DISPATCH_MS = None


def dispatch_overhead_ms():
    """Fixed per-jitted-call overhead of this backend (the remote-TPU
    tunnel costs ~35 ms per dispatch regardless of the program — measure
    it with a trivial jit and subtract it from kernel timings)."""
    global _DISPATCH_MS
    if _DISPATCH_MS is None:
        x = jnp.zeros((1024,), jnp.float32)
        f = jax.jit(lambda v: v + 1.0)
        jax.device_get(f(x))
        t0 = time.perf_counter()
        for _ in range(5):
            jax.device_get(f(x))
        _DISPATCH_MS = (time.perf_counter() - t0) / 5 * 1e3
        print(f"{'(per-dispatch overhead)':34s} {_DISPATCH_MS:8.1f} ms")
    return _DISPATCH_MS


def bench(fn, o, d, t_max, label, iters=3):
    base = dispatch_overhead_ms()
    hit = fn(o, d, t_max)
    jax.device_get(hit["t"])          # real sync (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(iters):
        hit = fn(o, d, t_max)
        jax.device_get(hit["t"])
    dt = max((time.perf_counter() - t0) / iters - base * 1e-3, 1e-9)
    n = o.shape[0]
    print(f"{label:34s} {dt * 1e3:8.1f} ms   {n / dt / 1e6:7.2f} Mray/s"
          f"   hitrate {float(jnp.mean(hit['valid'])):.3f}")
    return n / dt


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 16
    mode = sys.argv[3] if len(sys.argv) > 3 else "auto"
    tri = heightfield(n_tris)
    print(f"tris={len(tri):,} rays={n_rays:,} backend={jax.default_backend()}")

    t_build = time.perf_counter()
    if mode == "two" or (mode == "auto" and len(tri) > 2_000_000):
        from pathtracing_tpu.accel.pallas_trace2 import (build_tri_blocks2,
                                                         pallas_tri_intersect2,
                                                         G_DEFAULT)
        k2 = int(sys.argv[4]) if len(sys.argv) > 4 else None
        g = int(sys.argv[5]) if len(sys.argv) > 5 else G_DEFAULT
        arrays, k = build_tri_blocks2(tri, k2=k2, g=g)
        scene = {kk: jnp.asarray(vv) for kk, vv in arrays.items()}
        fn = lambda o, d, t: pallas_tri_intersect2(scene, o, d, t, k, g=g)
        fn_any = lambda o, d, t: pallas_tri_intersect2(scene, o, d, t, k,
                                                       any_hit=True, g=g)
        kind = f"two-level g={g}"
    else:
        from pathtracing_tpu.accel.pallas_trace import (build_tri_blocks,
                                                        pallas_tri_intersect)
        arrays, k = build_tri_blocks(tri)
        scene = {kk: jnp.asarray(vv) for kk, vv in arrays.items()}
        fn = lambda o, d, t: pallas_tri_intersect(scene, o, d, t, k)
        fn_any = lambda o, d, t: pallas_tri_intersect(scene, o, d, t, k,
                                                      any_hit=True)
        kind = "single-level"
    m = arrays["pk_blk_lo"].shape[0]
    print(f"{kind}: K={k} blocks={m} build={time.perf_counter()-t_build:.1f}s")

    t_max = jnp.full((n_rays,), 1e30, jnp.float32)
    o, d = camera_rays(n_rays)
    o, d = jnp.asarray(o), jnp.asarray(d)
    bench(fn, o, d, t_max, "closest-hit, coherent")
    ob, db = bounce_rays(n_rays)
    ob, db = morton_sorted(ob, db)
    bench(fn, ob, db, t_max, "closest-hit, bounce (sorted)")
    bench(fn_any, ob, db, jnp.full((n_rays,), 30.0, jnp.float32),
          "any-hit, bounce (sorted)")


if __name__ == "__main__":
    main()
