"""Microbench: VPU Moller-Trumbore vs MXU determinant-form leaf test.

The two-level kernel's bounce cost is ~90% leaf tests (403 children/tile
x K2=256 prims, ~1.2us each, ALU-bound on the VPU at ~53 ops per
(ray, prim) pair).  The candidate replacement evaluates det/t*det/u*det/
v*det as ONE [128,16]x[16,4*K2] matmul per child (Plucker-style scalar
triple products, per-L1 local frame) and only does ~14 VPU ops of
post-processing — trading VPU ALU for MXU passes that can overlap it.

This bench isolates the per-child leaf cost: a kernel loops N_ITER leaf
tests over VMEM-resident tables (no DMA, no traversal), for
  vpu       current moller_trumbore
  mxu_hi    dot_general precision=HIGHEST (f32-exact, ~6 bf16 passes)
  mxu_3x    precision=HIGH (bf16x3, ~1e-6 relative)
  mxu_1x    precision=DEFAULT (1 bf16 pass — accuracy floor reference)

Usage: python tools/bench_mxu_leaf.py [k2] [n_iter]
"""
from __future__ import annotations

import os
import sys
import time
import functools

import numpy as np
import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pathtracing_tpu.accel import _kernel_common as kc
from pathtracing_tpu.core.math import BIG_F32

PRECS = {"mxu_hi": jax.lax.Precision.HIGHEST,
         "mxu_1x": jax.lax.Precision.DEFAULT}


def _bf16_split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_bf16x3(a, b):
    """Manual bf16x3 (precision=HIGH is not lowerable in Mosaic): a*b =
    ah*bh + ah*bl + al*bh to ~f32 accuracy, 3 DEFAULT-precision passes."""
    ah, al = _bf16_split(a)
    bh, bl = _bf16_split(b)

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return dot(ah, bh) + dot(ah, bl) + dot(al, bh)


def _kernel(tri_ref, trib_ref, rays_ref, tri_hbm, out_ref, scratch, sem,
            *, k2, n_iter, mode):
    cols = [rays_ref[pl.ds(i, 1), :] for i in range(7)]     # [1,128] rows
    to_col, to_row = kc.make_transposes(128)
    ox, oy, oz, dx, dy, dz, tm = [to_col(c) for c in cols]
    n_blk = tri_hbm.shape[1] // k2

    if mode.startswith("mxu"):
        one = jnp.ones_like(ox)
        zero = jnp.zeros_like(ox)
        cxd = oy * dz - oz * dy
        cyd = oz * dx - ox * dz
        czd = ox * dy - oy * dx
        A = jnp.concatenate([dx, dy, dz, ox, oy, oz, cxd, cyd, czd, one,
                             zero, zero, zero, zero, zero, zero], axis=1)

    def mt(best_t, row):
        return kc.moller_trumbore(row, (ox, oy, oz, dx, dy, dz), None,
                                  False, best_t)

    def update(best, t, blk_val):
        best_t, best_blk = best
        kbest = jnp.argmin(t, axis=1)[:, None]
        tbest = jnp.min(t, axis=1, keepdims=True)
        better = tbest < best_t
        best_t = jnp.where(better, tbest, best_t)
        best_blk = jnp.where(better, kc.itof_exact(blk_val + kbest),
                             best_blk)
        return best_t, best_blk

    def vmem_row(r):
        return tri_ref[pl.ds(r, 1), :]

    if mode in ("vpu", "mxu_hi", "mxu_3x", "mxu_1x"):
        # bare leaf math, VMEM-resident, fori loop (lower bound)
        def body(i, best_t):
            if mode == "vpu":
                t = mt(best_t, vmem_row)
            else:
                if mode == "mxu_3x":
                    q = _dot_bf16x3(A, trib_ref[...])
                else:
                    q = jax.lax.dot_general(
                        A, trib_ref[...], (((1,), (0,)), ((), ())),
                        precision=PRECS[mode],
                        preferred_element_type=jnp.float32)
                det = q[:, :k2]
                tdet = q[:, k2:2 * k2]
                udet = q[:, 2 * k2:3 * k2]
                vdet = q[:, 3 * k2:]
                near0 = jnp.abs(det) < 1e-9
                inv_det = 1.0 / jnp.where(near0, 1.0, det)
                t = tdet * inv_det
                u = udet * inv_det
                v = vdet * inv_det
                ok = (~near0 & (u >= 0) & (u <= 1) & (v >= 0)
                      & (u + v <= 1) & (t >= 1e-4) & (t < best_t))
                t = jnp.where(ok, t, BIG_F32)
            tbest = jnp.min(t, axis=1, keepdims=True)
            return jnp.minimum(best_t, tbest + 1e-7)  # keep loop live

        best = jax.lax.fori_loop(0, n_iter, body, tm)
        out_ref[...] = to_row(best)
        return

    if mode == "vpu_rec":
        # + argmin/min hit recording (test_l2 equivalent)
        def body(i, best):
            t = mt(best[0] + 1e-7, vmem_row)
            return update(best, t, i)

        best, _ = jax.lax.fori_loop(
            0, n_iter, body, (tm, jnp.zeros((128, 1), jnp.float32)))
        out_ref[...] = to_row(best)
        return

    if mode == "vpu_cond":
        # + each test wrapped in lax.cond (the do_test gate)
        def body(i, best):
            def run(b):
                t = mt(b[0] + 1e-7, vmem_row)
                return update(b, t, i)

            return jax.lax.cond(i >= 0, run, lambda b: b, best)

        best, _ = jax.lax.fori_loop(
            0, n_iter, body, (tm, jnp.zeros((128, 1), jnp.float32)))
        out_ref[...] = to_row(best)
        return

    if mode == "vpu_dma":
        # + per-iteration HBM block DMA, double-buffered like the drain
        def dma(slot, b):
            return pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(b * k2, k2)], scratch.at[slot],
                sem.at[slot])

        dma(0, 0).start()

        def body(i, best):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_iter)
            def _():
                dma(nxt, jax.lax.rem(i + 1, n_blk)).start()

            dma(slot, jax.lax.rem(i, n_blk)).wait()

            def run(b):
                def row(r):
                    return scratch[slot, pl.ds(r, 1), :]
                t = mt(b[0] + 1e-7, row)
                return update(b, t, i)

            return jax.lax.cond(i >= 0, run, lambda b: b, best)

        best, _ = jax.lax.fori_loop(
            0, n_iter, body, (tm, jnp.zeros((128, 1), jnp.float32)))
        out_ref[...] = to_row(best)
        return

    if mode == "vpu_while":
        # full child_body analog: while_loop over a 16-bit mask with
        # nearest-first selection, cond-gated test, double-buffered DMA
        G = 16

        def dma(slot, b):
            return pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(b * k2, k2)], scratch.at[slot],
                sem.at[slot])

        def visit(v, best):
            entry = [jnp.float32(g) * 0.1 for g in range(G)]
            for g in range(G):
                dma(g, jax.lax.rem(v * G + g, n_blk)).start()

            def cond(c):
                return c[0] != 0

            def body(c):
                mask, best = c
                bestg = jnp.asarray(0, jnp.int32)
                beste = jnp.asarray(BIG_F32, jnp.float32)
                for g in range(G):
                    sel = (((mask >> g) & 1) == 1) & (entry[g] < beste)
                    bestg = jnp.where(sel, g, bestg)
                    beste = jnp.where(sel, entry[g], beste)
                dma(bestg, jax.lax.rem(v * G + bestg, n_blk)).wait()

                def run(b):
                    def row(r):
                        return scratch[bestg, pl.ds(r, 1), :]
                    t = mt(b[0] + 1e-7, row)
                    return update(b, t, bestg)

                best = jax.lax.cond(beste < BIG_F32, run, lambda b: b,
                                    best)
                return (mask & ~(jnp.asarray(1, jnp.int32) << bestg),
                        best)

            _, best = jax.lax.while_loop(
                cond, body, (jnp.asarray((1 << G) - 1, jnp.int32), best))
            return best

        best = jax.lax.fori_loop(
            0, n_iter // G, visit,
            (tm, jnp.zeros((128, 1), jnp.float32)))
        out_ref[...] = to_row(best[0])
        return

    raise ValueError(mode)


def run_mode(mode, tri, trib, rays, tri_hbm, k2, n_iter):
    kern = functools.partial(_kernel, k2=k2, n_iter=n_iter, mode=mode)
    fn = jax.jit(lambda t, tb, r, th: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
                 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, 16, k2), jnp.float32),
                        pltpu.SemaphoreType.DMA((16,))],
        interpret=jax.default_backend() != "tpu",
    )(t, tb, r, th))
    out = jax.device_get(fn(tri, trib, rays, tri_hbm))  # compile+sanity
    t0 = time.perf_counter()
    for _ in range(3):
        out = jax.device_get(fn(tri, trib, rays, tri_hbm))
    dt = (time.perf_counter() - t0) / 3
    return dt, out


def main():
    k2 = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    rng = np.random.default_rng(0)

    v = rng.uniform(-1, 1, (k2, 3, 3)).astype(np.float32)
    v0, e1, e2 = v[:, 0], v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]
    tri = np.zeros((16, k2), np.float32)
    tri[0:3] = v0.T
    tri[3:6] = e1.T
    tri[6:9] = e2.T

    n = np.cross(e1, e2)
    trib = np.zeros((16, 4 * k2), np.float32)
    trib[0:3, 0 * k2:1 * k2] = -n.T                      # det: d rows
    trib[3:6, 1 * k2:2 * k2] = n.T                       # tdet: o rows
    trib[9, 1 * k2:2 * k2] = -(v0 * n).sum(1)            # tdet: const
    trib[0:3, 2 * k2:3 * k2] = np.cross(v0, e2).T        # udet: d rows
    trib[6:9, 2 * k2:3 * k2] = e2.T                      # udet: oxd rows
    trib[0:3, 3 * k2:4 * k2] = np.cross(e1, v0).T        # vdet: d rows
    trib[6:9, 3 * k2:4 * k2] = -e1.T                     # vdet: oxd rows

    rays = np.zeros((8, 128), np.float32)
    o = rng.uniform(-2, 2, (128, 3)).astype(np.float32)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays[0:3] = o.T
    rays[3:6] = d.T
    rays[6] = 1e30

    n_blk = 512
    tri_hbm = np.tile(tri[:, None, :], (1, n_blk, 1)).reshape(16, -1)
    tri_hbm += rng.normal(0, 1e-3, tri_hbm.shape).astype(np.float32)
    tri, trib, rays, tri_hbm = map(jnp.asarray, (tri, trib, rays, tri_hbm))
    print(f"k2={k2} n_iter={n_iter} backend={jax.default_backend()}",
          flush=True)
    base, _ = run_mode("vpu", tri, trib, rays, tri_hbm, k2, 0)
    print(f"null-kernel baseline {base*1e3:8.2f} ms", flush=True)
    ref = None
    for mode in ("vpu", "mxu_hi", "mxu_3x", "mxu_1x", "vpu_rec",
                 "vpu_cond", "vpu_dma", "vpu_while"):
        dt, out = run_mode(mode, tri, trib, rays, tri_hbm, k2, n_iter)
        us = (dt - base) / n_iter * 1e6
        out = np.asarray(out)
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(np.nanmax(np.abs(out - ref)
                                  / np.maximum(np.abs(ref), 1e-3)))
        print(f"{mode:9s} {dt*1e3:8.2f} ms total  {us:7.3f} us/child  "
              f"max rel err vs vpu {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
