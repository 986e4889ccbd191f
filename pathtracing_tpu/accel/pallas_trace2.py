"""Two-level Pallas traversal for San-Miguel-scale scenes (>~2M tris).

The single-level kernel (pallas_trace.py) keeps per-tile order tables
SMEM-sized by capping the block count at 4096, which forces K=2688-prim
blocks at 10M tris — every visited block tests 2688 prims.  This kernel
adds a middle level:

  L1 superblocks (<=4096, ordered front-to-back IN-KERNEL by the same
  entry-phase + argmin-selection design as the single-level kernel)
  each own G=16 L2 blocks of K2 prims.  Per visited L1 the kernel DMAs
  the L1's child-box row, slab-tests its G L2 boxes, and DMAs + tests
  only the L2 blocks SOME ray in the tile enters (all entered-child
  DMAs launched up front so fetches overlap the first block's test).
  Per-ray work drops from K1=G*K2 to ~hit_blocks*K2.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math import BIG_F32, SHADOW_EPS
from .pallas_trace import TILE

G = 16              # L2 blocks per L1 superblock


def build_tri_blocks2(tri_v: np.ndarray, k2: int | None = None):
    """Two-level block tables.  Returns (arrays, k2):
      pk_tri      [16, M2*K2]   block-contiguous triangle components
      pk_l2box    [8, M2]       L2 AABBs (lox,loy,loz,hix,hiy,hiz,0,0)
      pk_blk_lo/hi[M1, 3]       L1 bounds (reuses single-level XLA phase)
      pk_slot2tri [M2*K2]
    """
    from .build import _sah_build_binary
    from ..native.loader import native_build_bvh

    tri_v = np.asarray(tri_v, np.float32)
    lo = tri_v.min(1)
    hi = tri_v.max(1)
    native = native_build_bvh(lo, hi, 4)
    if native is not None:
        order = native[3]
    else:
        _, order = _sah_build_binary(lo, hi, leaf_size=4)
    n = len(order)
    if k2 is None:
        k2 = 128
        while -(-n // (k2 * G)) > 4096:
            k2 += 128
    m2 = -(-n // k2)
    m2 = -(-m2 // G) * G                  # pad M2 to a multiple of G
    pad = m2 * k2 - n
    ord_pad = np.concatenate([order, np.repeat(order[-1:], pad)])
    v = tri_v[ord_pad]
    v0 = v[:, 0]
    e1 = v[:, 1] - v0
    e2 = v[:, 2] - v0
    tri9 = np.concatenate([v0.T, e1.T, e2.T,
                           np.zeros((7, len(v)), np.float32)], 0)
    l2lo = lo[ord_pad].reshape(m2, k2, 3).min(1)
    l2hi = hi[ord_pad].reshape(m2, k2, 3).max(1)
    # padding tail blocks (duplicated prim) keep the duplicate's box; give
    # fully-padded blocks (beyond the data) empty boxes
    n_blocks_data = -(-n // k2)
    if m2 > n_blocks_data:
        l2lo[n_blocks_data:] = np.inf
        l2hi[n_blocks_data:] = -np.inf
    m1 = m2 // G
    # [M1, 8, 128]: per-L1 row of its G children's box components padded
    # into the 128-lane axis (unused lanes get empty boxes) — the layout a
    # single aligned DMA can fetch per visited L1
    l2box = np.zeros((m1, 8, 128), np.float32)
    l2box[:, 0:3, :] = np.inf          # empty lo
    l2box[:, 3:6, :] = -np.inf         # empty hi
    l2box[:, 0:3, :G] = l2lo.reshape(m1, G, 3).transpose(0, 2, 1)
    l2box[:, 3:6, :G] = l2hi.reshape(m1, G, 3).transpose(0, 2, 1)
    l1lo = l2lo.reshape(m1, G, 3).min(1)
    l1hi = l2hi.reshape(m1, G, 3).max(1)
    slot2tri = ord_pad.astype(np.int32)
    if pad:
        slot2tri[n:] = -1
    return dict(pk_tri=tri9.astype(np.float32),
                pk_l2box=l2box,
                pk_blk_lo=l1lo.astype(np.float32),
                pk_blk_hi=l1hi.astype(np.float32),
                pk_slot2tri=slot2tri), k2


def _kernel2(l1box_hbm, ox_ref, oy_ref, oz_ref,
             dx_ref, dy_ref, dz_ref, tmax_ref, l2box_hbm, tri_hbm,
             out_t_ref, out_slot_ref, scratch, sem, box_scratch, box_sem,
             ecol_ref, l1v_ref, l1v_sem,
             *, k2: int, n_l1: int, any_hit: bool):
    """Two-level traversal with IN-KERNEL L1 ordering (same design as the
    single-level kernel: vectorized entry phase + argmin selection; the
    previous XLA [rays, M1] slab + argsort scaled with the superblock
    count).  l1box_hbm: [M1pad, 8] rows (lox..hiz,-,-), fetched into
    scratch once at grid step 0."""
    K2 = k2
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]           # [1,128]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tmax = tmax_ref[0]
    t_min = jnp.full_like(ox, SHADOW_EPS)
    m1pad = l1v_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        pltpu.make_async_copy(l1box_hbm, l1v_ref, l1v_sem).start()
        pltpu.make_async_copy(l1box_hbm, l1v_ref, l1v_sem).wait()

    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < 1e-32,
                               jnp.where(c < 0, -1e-32, 1e-32), c)
    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    # ---- L1 entry phase + selection (see pallas_trace._kernel) ---------
    SUBW = min(64, m1pad)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBW, 1), 0)

    def entry_chunk(c, _):
        bb = l1v_ref[pl.ds(c * SUBW, SUBW), :]             # [SUBW, 8]
        u0 = (bb[:, 0:1] - ox) * ix
        u1 = (bb[:, 3:4] - ox) * ix
        tn = jnp.minimum(u0, u1)
        tf = jnp.maximum(u0, u1)
        u0 = (bb[:, 1:2] - oy) * iy
        u1 = (bb[:, 4:5] - oy) * iy
        tn = jnp.maximum(tn, jnp.minimum(u0, u1))
        tf = jnp.minimum(tf, jnp.maximum(u0, u1))
        u0 = (bb[:, 2:3] - oz) * iz
        u1 = (bb[:, 5:6] - oz) * iz
        tn = jnp.maximum(jnp.maximum(tn, jnp.minimum(u0, u1)), SHADOW_EPS)
        tf = jnp.minimum(jnp.minimum(tf, jnp.maximum(u0, u1)), tmax)
        e = jnp.where(tn <= tf, tn, BIG_F32)
        e8 = jnp.min(e, axis=1, keepdims=True)             # [SUBW,1]
        e8 = jnp.where(c * SUBW + sub_iota < n_l1, e8, BIG_F32)
        ecol_ref[pl.ds(c * SUBW, SUBW), :] = e8
        return 0

    jax.lax.fori_loop(0, m1pad // SUBW, entry_chunk, 0)

    def select():
        e = ecol_ref[...]                                  # [M1pad, 1]
        v = jnp.min(e)
        i = jnp.argmin(e, axis=0)[0]
        ecol_ref[pl.ds(i, 1), :] = jnp.full((1, 1), BIG_F32)
        return i.astype(jnp.int32), v

    def dma(slot, b2):
        return pltpu.make_async_copy(
            tri_hbm.at[:, pl.ds(b2 * K2, K2)],
            scratch.at[slot], sem.at[slot])

    def test_l2(best, b2, slot):
        best_t, best_slot = best
        tri = scratch[slot]                                # [16->9, K2]
        col = lambda i: tri[i, :][:, None]
        e1x, e1y, e1z = col(3), col(4), col(5)
        e2x, e2y, e2z = col(6), col(7), col(8)
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        det = e1x * hx + e1y * hy + e1z * hz
        near0 = jnp.abs(det) < 1e-9
        inv_det = 1.0 / jnp.where(near0, 1.0, det)
        sx = ox - col(0)
        sy = oy - col(1)
        sz = oz - col(2)
        u = (sx * hx + sy * hy + sz * hz) * inv_det
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = (~near0 & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
              & (t >= t_min) & (t < best_t))
        t = jnp.where(ok, t, BIG_F32)
        kbest = jnp.argmin(t, axis=0)
        tbest = jnp.min(t, axis=0)[None, :]
        better = tbest < best_t
        best_t = jnp.where(better, tbest, best_t)
        best_slot = jnp.where(better, (b2 * K2 + kbest)[None, :],
                              best_slot)
        return best_t, best_slot

    def dma_boxes(b1):
        return pltpu.make_async_copy(l2box_hbm.at[b1], box_scratch,
                                     box_sem)

    def body(carry):
        b1, e1, best_t, best_slot, _ = carry
        dma_boxes(b1).start()
        dma_boxes(b1).wait()

        # per-child slab tests over the tile rays (static indices into the
        # DMA'd box row -> plain scalar reads); cull vs the tile's current
        # worst hit so converged tiles fetch nothing
        worst = jnp.max(best_t)
        enters = []
        for g in range(G):
            lox, loy, loz = (box_scratch[0, g], box_scratch[1, g],
                             box_scratch[2, g])
            hix, hiy, hiz = (box_scratch[3, g], box_scratch[4, g],
                             box_scratch[5, g])
            u0x = (lox - ox) * ix
            u1x = (hix - ox) * ix
            u0y = (loy - oy) * iy
            u1y = (hiy - oy) * iy
            u0z = (loz - oz) * iz
            u1z = (hiz - oz) * iz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(u0x, u1x), jnp.minimum(u0y, u1y)),
                jnp.maximum(jnp.minimum(u0z, u1z), t_min))
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(u0x, u1x), jnp.maximum(u0y, u1y)),
                jnp.minimum(jnp.maximum(u0z, u1z), best_t))
            enters.append(jnp.any((tn <= tf).astype(jnp.int32) > 0))

        # start every entered child's DMA up front (one slot each) so all
        # fetches are in flight while the first block is tested
        for g in range(G):
            @pl.when(enters[g])
            def _(g=g):
                dma(g, b1 * G + g).start()

        best = (best_t, best_slot)
        for g in range(G):
            b2 = b1 * G + g

            def do(best=best, b2=b2, g=g):
                dma(g, b2).wait()
                return test_l2(best, b2, g)

            # lax.cond so the skip saves real work (pl.when can't return)
            best = jax.lax.cond(enters[g], do, lambda best=best: best)
        best_t, best_slot = best

        nb, ne = select()
        has_next = ne < BIG_F32 * 0.5
        if any_hit:
            live = has_next & ~jnp.all(best_slot >= 0)
        else:
            live = has_next & (ne < jnp.max(best_t))
        return nb, ne, best_t, best_slot, live

    best_t0 = tmax
    best_slot0 = jnp.full(best_t0.shape, -1, jnp.int32)
    b0, e0 = select()
    live0 = e0 < BIG_F32 * 0.5
    _, _, best_t, best_slot, _ = jax.lax.while_loop(
        lambda c: c[4], body, (b0, e0, best_t0, best_slot0, live0))
    out_t_ref[0] = best_t
    out_slot_ref[0] = best_slot


@functools.partial(jax.jit, static_argnames=("k2", "any_hit"))
def pallas_tri_intersect2(scene, origin, direction, t_max, k2: int,
                          any_hit: bool = False):
    """Two-level closest/any hit.  Same contract as pallas_tri_intersect."""
    n = origin.shape[0]
    assert n % TILE == 0, n
    tiles = n // TILE
    m1 = scene["pk_blk_lo"].shape[0]
    m1pad = -(-m1 // 128) * 128

    ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
    dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]

    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    # L1 superblock boxes, blocks in sublanes, for the in-kernel ordering
    l1box = jnp.concatenate(
        [scene["pk_blk_lo"], scene["pk_blk_hi"],
         jnp.zeros((m1, 2), jnp.float32)], 1)              # [M1, 8]
    l1box = jnp.pad(l1box, ((0, m1pad - m1), (0, 0)))

    ray_spec = pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel2, k2=k2, n_l1=m1, any_hit=any_hit)
    interpret = jax.default_backend() != "tpu"
    out_t, out_slot = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [ray_spec] * 7 + [
            pl.BlockSpec(memory_space=pl.ANY),    # l2box rows in HBM
            pl.BlockSpec(memory_space=pl.ANY)],   # tri table in HBM
        out_specs=[ray_spec, ray_spec],
        out_shape=[jax.ShapeDtypeStruct((tiles, 1, TILE), jnp.float32),
                   jax.ShapeDtypeStruct((tiles, 1, TILE), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((G, 16, k2), jnp.float32),
                        pltpu.SemaphoreType.DMA((G,)),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.VMEM((m1pad, 1), jnp.float32),
                        pltpu.VMEM((m1pad, 8), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(l1box,
      ox.reshape(tiles, 1, TILE), oy.reshape(tiles, 1, TILE),
      oz.reshape(tiles, 1, TILE),
      dx.reshape(tiles, 1, TILE), dy.reshape(tiles, 1, TILE),
      dz.reshape(tiles, 1, TILE), t_max.reshape(tiles, 1, TILE),
      scene["pk_l2box"], scene["pk_tri"])

    t = out_t.reshape(n)
    slot = out_slot.reshape(n)
    valid = slot >= 0
    tri = jnp.where(valid, scene["pk_slot2tri"][jnp.clip(slot, 0)], -1)
    valid = valid & (tri >= 0)
    return dict(t=jnp.where(valid, t, BIG_F32), tri=tri, valid=valid)
