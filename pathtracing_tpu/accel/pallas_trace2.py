"""Two-level Pallas traversal for San-Miguel-scale scenes (>~64K tris).

The single-level kernel (pallas_trace.py) keeps per-tile order tables
SMEM-sized by capping the block count at 4096, which forces K=2688-prim
blocks at 10M tris — every visited block tests 2688 prims.  This kernel
adds a middle level:

  L1 superblocks (<=4096, ordered front-to-back IN-KERNEL by the same
  entry-phase + argmin-selection design as the single-level kernel)
  each own G=16 L2 blocks of K2 prims.  Per visited L1 the kernel
  slab-tests its G L2 boxes and DMAs + tests only the L2 blocks SOME ray
  in the tile enters.  Per-ray work drops from K1=G*K2 to
  ~hit_blocks*K2.

Latency structure (this is where the first version lost 10x):
  * TPS tiles are folded into each grid step — pallas pays ~70us of
    pipeline overhead per grid step, so 1 tile/step burned ~36ms per
    64K rays on overhead alone;
  * the child-box row of the NEXT selected L1 is DMA'd (double
    buffered) while the current L1's children are tested, so the
    serial per-L1 loop never stalls on the box fetch;
  * entered children are drained by a popcount loop over a bitmask
    (iterations = number entered) instead of a chain of G conds, and
    every entered child's triangle DMA is launched before the first
    child test so fetches overlap compute.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math import BIG_F32, SHADOW_EPS
from .pallas_trace import TILE, TPS

G = 16              # L2 blocks per L1 superblock


def build_tri_blocks2(tri_v: np.ndarray, k2: int | None = None,
                      tri_vel: np.ndarray | None = None,
                      shutter: tuple = (0.0, 0.0)):
    """Two-level block tables.  Returns (arrays, k2):
      pk_tri      [16, M2*K2]   block-contiguous triangle components
                                (+ velocity in rows 9..11 under motion)
      pk_l2box    [M1, 8, 128]  per-L1 row of child AABBs (components in
                                sublanes, children in lanes)
      pk_blk_lo/hi[M1, 3]       L1 bounds
      pk_slot2tri [M2*K2]
    tri_vel/shutter: linear motion — boxes expand by the union over the
    shutter (AnimatedPrimitive, Primitive.cpp:77-96).
    """
    from .build import _sah_build_binary
    from ..native.loader import native_build_bvh

    tri_v = np.asarray(tri_v, np.float32)
    lo = tri_v.min(1)
    hi = tri_v.max(1)
    if tri_vel is not None:
        tri_vel = np.asarray(tri_vel, np.float32)
        d0 = tri_vel * float(shutter[0])
        d1 = tri_vel * float(shutter[1])
        lo = lo + np.minimum(d0, d1)
        hi = hi + np.maximum(d0, d1)
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
    vel_rows = (tri_vel[ord_pad].T if tri_vel is not None
                else np.zeros((3, len(v)), np.float32))
    tri9 = np.concatenate([v0.T, e1.T, e2.T, vel_rows,
                           np.zeros((4, len(v)), np.float32)], 0)
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


def build_tri_blocks2_inst(tri_v, otri_v, inst_fwd, inst_inv, inst_base,
                           inst_count, k2: int | None = None):
    """Two-level INSTANCED block tables (TLAS/BLAS at San-Miguel scale,
    BVH.hpp:554-555 — the reference's TLAS templates work at any scale;
    round 1 only had instancing in the single-level kernel).

    Object-space geometry (triangle columns + L2 child boxes) is stored
    ONCE per model; the L1 superblock list the kernel orders and walks is
    instance-EXPANDED: each entry carries a world AABB (the model L1's
    object AABB pushed through the instance transform), the physical L1
    whose child boxes / triangle blocks to fetch, and the instance whose
    inverse transform the kernel applies to the ray tile
    (TransformedPrimitive semantics, Primitive.cpp:41-66).

    Returns (arrays, k2):
      pk_tri       [16, M2p*K2]  physical triangle columns
      pk_l2box     [M1p, 8, 128] physical child boxes (object space for
                                 model rows, world for world-tri rows)
      pk_blk_lo/hi [M1e, 3]      EXPANDED world L1 bounds
      pk_blk_src   [M1e] i32     expanded L1 -> physical L1
      pk_blk_inst  [M1e] i32     expanded L1 -> instance id (-1 world)
      pk_slot2tri  [M2p*K2] i32  physical slot -> tri id (world tri id
                                 for world rows, otri id for model rows)
      pk_inst_inv / pk_inst_fwd [ni, 12]
    """
    from .build import _sah_build_binary
    from ..native.loader import native_build_bvh

    tri_v = np.asarray(tri_v, np.float32).reshape(-1, 3, 3)
    otri_v = np.asarray(otri_v, np.float32).reshape(-1, 3, 3)
    inst_fwd = [np.asarray(f, np.float32) for f in inst_fwd]
    inst_inv = [np.asarray(f, np.float32) for f in inst_inv]
    nt = len(tri_v)
    ni = len(inst_fwd)
    models = {}                       # (base,count) -> instance indices
    for i in range(ni):
        models.setdefault((int(inst_base[i]), int(inst_count[i])),
                          []).append(i)

    def _order(v_sub):
        lo = v_sub.min(1)
        hi = v_sub.max(1)
        native = native_build_bvh(lo, hi, 4)
        if native is not None:
            return native[3]
        return _sah_build_binary(lo, hi, leaf_size=4)[1]

    if k2 is None:
        # expanded L1 count must stay <= 4096
        def n_l1_expanded(k2):
            def l1_of(n):
                return -(-(-(-n // k2)) // G) if n else 0
            me = l1_of(nt)
            for (base, count), insts in models.items():
                me += l1_of(count) * len(insts)
            return me

        k2 = 128
        while n_l1_expanded(k2) > 4096:
            k2 += 128

    tri_chunks, slot2tri, l2boxes = [], [], []
    exp_lo, exp_hi, exp_src, exp_inst = [], [], [], []
    phys_l1 = 0

    def emit_source(v_sub, glob_ids):
        """SAH-order + block one triangle soup into L2/L1 tables; returns
        per-L1 (physical ids, source-space lo/hi)."""
        nonlocal phys_l1
        order = _order(v_sub)
        n = len(order)
        m2 = -(-n // k2)
        m2 = -(-m2 // G) * G
        pad = m2 * k2 - n
        ord_pad = np.concatenate([order, np.repeat(order[-1:], pad)])
        v = v_sub[ord_pad]
        tri_chunks.append(v)
        s2t = glob_ids[ord_pad].astype(np.int32)
        if pad:
            s2t[n:] = -1
        slot2tri.append(s2t)
        lo = v_sub.min(1)
        hi = v_sub.max(1)
        l2lo = lo[ord_pad].reshape(m2, k2, 3).min(1)
        l2hi = hi[ord_pad].reshape(m2, k2, 3).max(1)
        nb_data = -(-n // k2)
        if m2 > nb_data:
            l2lo[nb_data:] = np.inf
            l2hi[nb_data:] = -np.inf
        m1 = m2 // G
        box = np.zeros((m1, 8, 128), np.float32)
        box[:, 0:3, :] = np.inf
        box[:, 3:6, :] = -np.inf
        box[:, 0:3, :G] = l2lo.reshape(m1, G, 3).transpose(0, 2, 1)
        box[:, 3:6, :G] = l2hi.reshape(m1, G, 3).transpose(0, 2, 1)
        l2boxes.append(box)
        l1lo = l2lo.reshape(m1, G, 3).min(1)
        l1hi = l2hi.reshape(m1, G, 3).max(1)
        src = np.arange(phys_l1, phys_l1 + m1, dtype=np.int32)
        phys_l1 += m1
        return src, l1lo, l1hi

    if nt:
        src, lo, hi = emit_source(tri_v, np.arange(nt))
        exp_lo.append(lo)
        exp_hi.append(hi)
        exp_src.append(src)
        exp_inst.append(np.full(len(src), -1, np.int32))

    for (base, count), insts in models.items():
        src, lo, hi = emit_source(otri_v[base:base + count],
                                  np.arange(base, base + count))
        # 8 corners of each object-space L1 AABB -> world AABB per instance
        corners = np.stack([np.stack([np.where(m & (1 << a), hi[:, a],
                                               lo[:, a]) for a in range(3)],
                                     -1) for m in range(8)], 1)  # [m1,8,3]
        for i in insts:
            f = inst_fwd[i]
            wc = corners @ f[:3, :3].T + f[:3, 3]
            exp_lo.append(wc.min(1))
            exp_hi.append(wc.max(1))
            exp_src.append(src)
            exp_inst.append(np.full(len(src), i, np.int32))

    v = np.concatenate(tri_chunks, 0)                     # [M2p*K2, 3, 3]
    v0 = v[:, 0]
    e1 = v[:, 1] - v0
    e2 = v[:, 2] - v0
    tri9 = np.concatenate([v0.T, e1.T, e2.T,
                           np.zeros((7, len(v)), np.float32)],
                          0).astype(np.float32)
    return dict(
        pk_tri=tri9,
        pk_l2box=np.concatenate(l2boxes, 0),
        pk_blk_lo=np.concatenate(exp_lo, 0).astype(np.float32),
        pk_blk_hi=np.concatenate(exp_hi, 0).astype(np.float32),
        pk_blk_src=np.concatenate(exp_src, 0),
        pk_blk_inst=np.concatenate(exp_inst, 0),
        pk_slot2tri=np.concatenate(slot2tri, 0),
        pk_inst_inv=np.stack([f[:3, :4].reshape(12) for f in inst_inv]),
        pk_inst_fwd=np.stack([f[:3, :4].reshape(12) for f in inst_fwd]),
    ), k2


def _kernel2(l1box_hbm, ox_ref, oy_ref, oz_ref,
             dx_ref, dy_ref, dz_ref, tmax_ref, l2box_hbm, tri_hbm,
             *rest, k2: int, n_l1: int, any_hit: bool,
             instanced: bool = False, motion: bool = False):
    """Two-level traversal with IN-KERNEL L1 ordering (see module
    docstring for the latency structure).  l1box_hbm: [M1pad, 8] rows
    (lox..hiz,-,-), fetched into scratch once at grid step 0.

    instanced: the L1 list is instance-expanded; per visited L1 the ray
    tile is inverse-transformed into the model's object space with the
    direction left UNNORMALIZED so t stays world-parameterized
    (Primitive.cpp:47-66), and child boxes / triangle blocks are fetched
    through the expanded->physical map."""
    K2 = k2
    assert not (instanced and motion), "instanced+motion falls back"
    rest = list(rest)
    src_ref = inst_ref = inv_ref = time_ref = None
    if instanced:
        src_ref, inst_ref, inv_ref = rest[:3]
        rest = rest[3:]
    if motion:
        time_ref = rest[0]
        rest = rest[1:]
    out_t_ref, out_slot_ref, scratch, sem, box_scratch, box_sem, \
        ecol_ref, l1v_ref, l1v_sem = rest
    m1pad = l1v_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        pltpu.make_async_copy(l1box_hbm, l1v_ref, l1v_sem).start()
        pltpu.make_async_copy(l1box_hbm, l1v_ref, l1v_sem).wait()

    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < 1e-32,
                               jnp.where(c < 0, -1e-32, 1e-32), c)

    SUBW = min(64, m1pad)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBW, 1), 0)

    def run_tile(tt, _):
        ox = ox_ref[0, pl.ds(tt, 1), :]                    # [1,128]
        oy = oy_ref[0, pl.ds(tt, 1), :]
        oz = oz_ref[0, pl.ds(tt, 1), :]
        dx = dx_ref[0, pl.ds(tt, 1), :]
        dy = dy_ref[0, pl.ds(tt, 1), :]
        dz = dz_ref[0, pl.ds(tt, 1), :]
        tmax = tmax_ref[0, pl.ds(tt, 1), :]
        rtime = time_ref[0, pl.ds(tt, 1), :] if motion else None
        t_min = jnp.full_like(ox, SHADOW_EPS)
        ix, iy, iz = inv(dx), inv(dy), inv(dz)

        # ---- L1 entry phase + selection (see pallas_trace._kernel) -----
        def entry_chunk(c, _):
            bb = l1v_ref[pl.ds(c * SUBW, SUBW), :]         # [SUBW, 8]
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
            tn = jnp.maximum(jnp.maximum(tn, jnp.minimum(u0, u1)),
                             SHADOW_EPS)
            tf = jnp.minimum(jnp.minimum(tf, jnp.maximum(u0, u1)), tmax)
            e = jnp.where(tn <= tf, tn, BIG_F32)
            e8 = jnp.min(e, axis=1, keepdims=True)         # [SUBW,1]
            e8 = jnp.where(c * SUBW + sub_iota < n_l1, e8, BIG_F32)
            ecol_ref[pl.ds(c * SUBW, SUBW), :] = e8
            return 0

        jax.lax.fori_loop(0, m1pad // SUBW, entry_chunk, 0)

        def select():
            e = ecol_ref[...]                              # [M1pad, 1]
            v = jnp.min(e)
            i = jnp.argmin(e, axis=0)[0]
            ecol_ref[pl.ds(i, 1), :] = jnp.full((1, 1), BIG_F32)
            return i.astype(jnp.int32), v

        def src_of(b1):
            # expanded L1 -> physical L1 row (instanced TLAS)
            return src_ref[0, b1] if instanced else b1

        def rays_for(b1):
            """Ray tile (o, d, inv_d) in the visited L1's source space:
            world rows use the rays as-is; instance rows inverse-transform
            them, direction UNNORMALIZED (Primitive.cpp:47-66)."""
            if not instanced:
                return ox, oy, oz, dx, dy, dz, ix, iy, iz
            inst = inst_ref[0, b1]
            ii = jnp.maximum(inst, 0)
            m = [inv_ref[ii, c] for c in range(12)]
            oxl = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
            oyl = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
            ozl = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
            dxl = m[0] * dx + m[1] * dy + m[2] * dz
            dyl = m[4] * dx + m[5] * dy + m[6] * dz
            dzl = m[8] * dx + m[9] * dy + m[10] * dz
            use = inst >= 0
            oxs = jnp.where(use, oxl, ox)
            oys = jnp.where(use, oyl, oy)
            ozs = jnp.where(use, ozl, oz)
            dxs = jnp.where(use, dxl, dx)
            dys = jnp.where(use, dyl, dy)
            dzs = jnp.where(use, dzl, dz)
            return (oxs, oys, ozs, dxs, dys, dzs,
                    inv(dxs), inv(dys), inv(dzs))

        def dma(slot, b2):
            return pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(b2 * K2, K2)],
                scratch.at[slot], sem.at[slot])

        def dma_boxes(slot, b1p):
            return pltpu.make_async_copy(l2box_hbm.at[b1p],
                                         box_scratch.at[slot],
                                         box_sem.at[slot])

        def test_l2(best, enc_base, slot, rays):
            best_t, best_slot = best
            oxs, oys, ozs, dxs, dys, dzs = rays
            tri = scratch[slot]                            # [16->9, K2]
            col = lambda i: tri[i, :][:, None]
            e1x, e1y, e1z = col(3), col(4), col(5)
            e2x, e2y, e2z = col(6), col(7), col(8)
            hx = dys * e2z - dzs * e2y
            hy = dzs * e2x - dxs * e2z
            hz = dxs * e2y - dys * e2x
            det = e1x * hx + e1y * hy + e1z * hz
            near0 = jnp.abs(det) < 1e-9
            inv_det = 1.0 / jnp.where(near0, 1.0, det)
            # moving prim at ray time == static prim hit from
            # o - vel*time (AnimatedPrimitive, Primitive.cpp:77-96)
            sx = oxs - col(0) - (col(9) * rtime if motion else 0.0)
            sy = oys - col(1) - (col(10) * rtime if motion else 0.0)
            sz = ozs - col(2) - (col(11) * rtime if motion else 0.0)
            u = (sx * hx + sy * hy + sz * hz) * inv_det
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = (dxs * qx + dys * qy + dzs * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = (~near0 & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
                  & (t >= t_min) & (t < best_t))
            t = jnp.where(ok, t, BIG_F32)
            kbest = jnp.argmin(t, axis=0)
            tbest = jnp.min(t, axis=0)[None, :]
            better = tbest < best_t
            best_t = jnp.where(better, tbest, best_t)
            best_slot = jnp.where(better,
                                  (enc_base + kbest)[None, :], best_slot)
            return best_t, best_slot

        def body(carry):
            b1, e1, slot, best_t, best_slot, _ = carry
            # select + prefetch the NEXT L1's child-box row while this
            # L1 is processed (double buffered)
            nb, ne = select()
            has_next = ne < BIG_F32 * 0.5

            @pl.when(has_next)
            def _():
                dma_boxes(1 - slot, src_of(nb)).start()

            dma_boxes(slot, src_of(b1)).wait()
            oxs, oys, ozs, dxs, dys, dzs, ixs, iys, izs = rays_for(b1)
            phys = src_of(b1)

            # child slab tests: [8(sublanes=box comps), G] row against
            # the 128-ray tile, one child per unrolled step (static
            # scalar reads from the DMA'd row); cull vs the tile's
            # current worst hit so converged tiles fetch nothing
            enters = jnp.zeros((), jnp.int32)
            for g in range(G):
                lox = box_scratch[slot, 0, g]
                loy = box_scratch[slot, 1, g]
                loz = box_scratch[slot, 2, g]
                hix = box_scratch[slot, 3, g]
                hiy = box_scratch[slot, 4, g]
                hiz = box_scratch[slot, 5, g]
                u0x = (lox - oxs) * ixs
                u1x = (hix - oxs) * ixs
                u0y = (loy - oys) * iys
                u1y = (hiy - oys) * iys
                u0z = (loz - ozs) * izs
                u1z = (hiz - ozs) * izs
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(u0x, u1x),
                                jnp.minimum(u0y, u1y)),
                    jnp.maximum(jnp.minimum(u0z, u1z), t_min))
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(u0x, u1x),
                                jnp.maximum(u0y, u1y)),
                    jnp.minimum(jnp.maximum(u0z, u1z), best_t))
                hitg = jnp.any(tn <= tf)
                enters = enters | (hitg.astype(jnp.int32) << g)

            # start every entered child's DMA up front (one slot each) so
            # all fetches are in flight while the first block is tested
            for g in range(G):
                @pl.when((enters >> g) & 1 == 1)
                def _(g=g):
                    dma(g, phys * G + g).start()

            # drain entered children: popcount-many iterations, lowest
            # set bit first (branchless scalar ctz for a 16-bit mask —
            # Mosaic has no scalar bitcast, so no float-exponent trick)
            def child_cond(c):
                return c[0] != 0

            def child_body(c):
                mask, best_t, best_slot = c
                low = mask & (-mask)
                g = (jnp.where((low & 0x5555) == 0, 1, 0)
                     | jnp.where((low & 0x3333) == 0, 2, 0)
                     | jnp.where((low & 0x0F0F) == 0, 4, 0)
                     | jnp.where((low & 0x00FF) == 0, 8, 0))
                dma(g, phys * G + g).wait()
                # best_slot encodes the EXPANDED child block so callers
                # recover (instance, physical slot) via the src tables
                best_t, best_slot = test_l2(
                    (best_t, best_slot), (b1 * G + g) * K2, g,
                    (oxs, oys, ozs, dxs, dys, dzs))
                return mask & (mask - 1), best_t, best_slot

            _, best_t, best_slot = jax.lax.while_loop(
                child_cond, child_body, (enters, best_t, best_slot))

            if any_hit:
                live = has_next & ~jnp.all(best_slot >= 0)
            else:
                # entryDist t-max culling (BVH.hpp:1129-1135) at tile
                # granularity
                live = has_next & (ne < jnp.max(best_t))

            @pl.when(has_next & ~live)
            def _():
                dma_boxes(1 - slot, nb).wait()

            return nb, ne, 1 - slot, best_t, best_slot, live

        best_t0 = tmax
        best_slot0 = jnp.full((1, TILE), -1, jnp.int32)
        b0, e0 = select()
        live0 = e0 < BIG_F32 * 0.5

        @pl.when(live0)
        def _():
            dma_boxes(0, src_of(b0)).start()

        _, _, _, best_t, best_slot, _ = jax.lax.while_loop(
            lambda c: c[5], body,
            (b0, e0, jnp.asarray(0, jnp.int32), best_t0, best_slot0,
             live0))
        out_t_ref[0, pl.ds(tt, 1), :] = best_t
        out_slot_ref[0, pl.ds(tt, 1), :] = best_slot
        return 0

    jax.lax.fori_loop(0, TPS, run_tile, 0)


@functools.partial(jax.jit, static_argnames=("k2", "any_hit"))
def pallas_tri_intersect2(scene, origin, direction, t_max, k2: int,
                          any_hit: bool = False, time=None):
    """Two-level closest/any hit.  Same contract as pallas_tri_intersect."""
    n = origin.shape[0]
    assert n % TILE == 0, n
    m1 = scene["pk_blk_lo"].shape[0]
    m1pad = -(-m1 // 128) * 128
    motion = time is not None

    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    # pad to a whole number of TPS-tile groups; padded rays get t_max=0
    n2 = -(-n // (TILE * TPS)) * (TILE * TPS)
    if n2 != n:
        origin = jnp.pad(origin, ((0, n2 - n), (0, 0)))
        direction = jnp.pad(direction, ((0, n2 - n), (0, 0)),
                            constant_values=1.0)
        t_max = jnp.pad(t_max, (0, n2 - n))
        if motion:
            time = jnp.pad(time, (0, n2 - n))
    groups = n2 // (TILE * TPS)

    ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
    dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]

    # L1 superblock boxes, blocks in sublanes, for the in-kernel ordering
    l1box = jnp.concatenate(
        [scene["pk_blk_lo"], scene["pk_blk_hi"],
         jnp.zeros((m1, 2), jnp.float32)], 1)              # [M1, 8]
    l1box = jnp.pad(l1box, ((0, m1pad - m1), (0, 0)))

    ray_spec = pl.BlockSpec((1, TPS, TILE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    instanced = "pk_blk_src" in scene
    kernel = functools.partial(_kernel2, k2=k2, n_l1=m1, any_hit=any_hit,
                               instanced=instanced, motion=motion)
    interpret = jax.default_backend() != "tpu"
    shp = (groups, TPS, TILE)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + [ray_spec] * 7 + [
        pl.BlockSpec(memory_space=pl.ANY),    # l2box rows in HBM
        pl.BlockSpec(memory_space=pl.ANY)]    # tri table in HBM
    operands = [l1box,
                ox.reshape(shp), oy.reshape(shp), oz.reshape(shp),
                dx.reshape(shp), dy.reshape(shp), dz.reshape(shp),
                t_max.reshape(shp),
                scene["pk_l2box"], scene["pk_tri"]]
    if instanced:
        ninst = scene["pk_inst_inv"].shape[0]

        def shared(shape):
            # grid-invariant tables: every step maps to block (0, 0, ...)
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                memory_space=pltpu.SMEM)

        in_specs += [shared((1, m1)), shared((1, m1)), shared((ninst, 12))]
        operands += [scene["pk_blk_src"].reshape(1, m1),
                     scene["pk_blk_inst"].reshape(1, m1),
                     scene["pk_inst_inv"]]
    if motion:
        in_specs += [ray_spec]
        operands += [jnp.asarray(time, jnp.float32).reshape(shp)]
    out_t, out_slot = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(groups,),
        in_specs=in_specs,
        out_specs=[ray_spec, ray_spec],
        out_shape=[jax.ShapeDtypeStruct(shp, jnp.float32),
                   jax.ShapeDtypeStruct(shp, jnp.int32)],
        scratch_shapes=[pltpu.VMEM((G, 16, k2), jnp.float32),
                        pltpu.SemaphoreType.DMA((G,)),
                        pltpu.VMEM((2, 8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.VMEM((m1pad, 1), jnp.float32),
                        pltpu.VMEM((m1pad, 8), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(*operands)

    t = out_t.reshape(n2)[:n]
    slot = out_slot.reshape(n2)[:n]
    valid = slot >= 0
    if instanced:
        # slot = (expanded_L1*G + g)*K2 + offset: recover (instance,
        # physical slot) through the expansion tables
        e = jnp.clip(slot // (G * k2), 0)
        off = jnp.clip(slot, 0) % (G * k2)
        src = scene["pk_blk_src"][e]
        inst = jnp.where(valid, scene["pk_blk_inst"][e], -1)
        tri = jnp.where(valid,
                        scene["pk_slot2tri"][src * (G * k2) + off], -1)
    else:
        inst = jnp.full((n,), -1, jnp.int32)
        tri = jnp.where(valid, scene["pk_slot2tri"][jnp.clip(slot, 0)], -1)
    valid = valid & (tri >= 0)
    inst = jnp.where(valid, inst, -1)
    return dict(t=jnp.where(valid, t, BIG_F32), tri=tri, inst=inst,
                valid=valid)
