"""Pallas TPU traversal kernel: tile-divergent block-BVH ray casting.

The XLA formulations hit two walls (see beam.py): per-lane stacks lower to
sort-based scatters, and any while_loop runs until the WORST lane of the
whole 64K-ray batch finishes while every iteration still pays full-batch
gather traffic.  This kernel fixes both with the one thing only Pallas
gives us: an independent control-flow instance per grid step.

Design (triangles; the few analytic prims of a scene take the dense XLA
path and results are merged):

  * rays are split into tiles of 128, TPS tiles per grid step.  Each tile
    runs its OWN while loop over candidate blocks — divergence costs are
    paid per 128 coherent rays, not per 65K;
  * block ordering happens IN-KERNEL: a vectorized entry phase computes
    every block's tile-min slab entry distance ([SUBW,128] = blocks x
    rays per step), then an argmin selection loop pops blocks
    front-to-back (an earlier design argsorted a dense [rays, M] entry
    matrix in XLA; the sort cost scaled with M and its [T,M] tables paid
    HBM round-trips — the in-kernel argmin is O(visited) and
    table-free);
  * per visited block, the kernel DMAs the block's 9xK contiguous triangle
    columns HBM->VMEM (next selection prefetched during the current
    block's test) and tests K prims x 128 rays as dense [SUB, 128]
    VPU ops (prims in sublanes, rays in lanes);
  * a tile exits when the closest unvisited block's entry exceeds the
    tile's worst best-hit: the entryDist t-max culling of the reference
    (BVH.hpp:1129-1135) hoisted to tile granularity.

Runtime instancing (TLAS/BLAS): expanded blocks carry world AABBs + an
instance id; the kernel inverse-transforms the ray tile per block with
the direction left unnormalized so t stays world-parameterized.

Outputs (t, slot) where slot indexes the block-ordered prim tables;
callers map slot -> original triangle id with one gather.

NOTE when benchmarking on the remote-TPU tunnel: every jitted dispatch
costs ~30-40 ms REGARDLESS of the program (measured with a no-op
kernel); subtract a calibrated trivial-jit baseline or per-call numbers
lie (tools/bench_traversal.py does this).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math import BIG_F32, SHADOW_EPS
from . import _kernel_common as kc

TILE = 128          # rays per tile (one independent traversal loop each)
TPS = 8             # tiles per grid step: pallas pays ~70us of pipeline
                    # overhead per grid step (measured with a no-op
                    # kernel); folding 8 tiles into one step amortizes it
RECULL_EVERY = 8    # block visits between per-ray entry-table re-culls
RECULL_MAX_MPAD = 8192   # beyond this many block lanes the [128, mpad]
                         # re-cull entry table would crowd VMEM — skip it


# ---------------------------------------------------------------------------
# Host-side build: triangle-only block structure
# ---------------------------------------------------------------------------

def build_tri_blocks(tri_v: np.ndarray, block_k: int | None = None,
                     tri_vel: np.ndarray | None = None,
                     shutter: tuple = (0.0, 0.0),
                     tri_mask: np.ndarray | None = None):
    """SAH-order triangles, cut into K-sized blocks, emit kernel tables.

    tri_vel/shutter: linear per-triangle motion (AnimatedPrimitive,
    Primitive.cpp:77-96) — velocity components ride in pk_tri rows
    9..11 and block AABBs are expanded by the union over the shutter
    interval, so moving scenes keep the Pallas kernel (round 1 forced
    them onto the brute backend).

    Returns (arrays, block_k):
      pk_tri     [16, M*K] f32 block-contiguous v0/e1/e2 components
                               (+ vel in rows 9..11 when motion)
      pk_blk_lo  [M, 3], pk_blk_hi [M, 3]
      pk_slot2tri[M*K] i32     slot -> original triangle id (-1 = padding)
    """
    from .build import _sah_build_binary
    from .beam import pick_block_k
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
    # only the SAH leaf ORDER is needed; prefer the threaded C++ builder
    native = native_build_bvh(lo, hi, 4)
    if native is not None:
        order = native[3]
    else:
        _, order = _sah_build_binary(lo, hi, leaf_size=4)
    n = len(order)
    # K is a multiple of 128 (the VPU lane width the DMA'd block occupies);
    # M is capped so the per-tile order tables stay SMEM-sized
    k = block_k or max(128, -(-pick_block_k(n) // 128) * 128)
    while -(-n // k) > 4096:
        k += 128
    if k > 512:
        # kernel tests blocks in 512-prim sub-chunks (VMEM intermediates
        # are [sub, 128]); keep K a multiple of the sub-chunk
        k = -(-k // 512) * 512
    m = -(-n // k)
    pad = m * k - n
    ord_pad = np.concatenate([order, np.repeat(order[-1:], pad)])
    v = tri_v[ord_pad]                                   # [MK, 3, 3]
    v0 = v[:, 0]
    e1 = v[:, 1] - v0
    e2 = v[:, 2] - v0
    # 16 rows (9 used; 9..11 = velocity under motion): DMA slices must
    # be 8-sublane aligned on dim 0
    if tri_mask is not None:
        # alpha micro-mask rows 9..15 (scene/alphamask.py); mutually
        # exclusive with motion velocities (rows 9..11)
        assert tri_vel is None, "alpha masks and motion share rows 9-11"
        tail = np.asarray(tri_mask, np.float32)[ord_pad].T
    else:
        vel_rows = (tri_vel[ord_pad].T if tri_vel is not None
                    else np.zeros((3, len(v)), np.float32))
        tail = np.concatenate([vel_rows,
                               np.zeros((4, len(v)), np.float32)], 0)
    tri9 = np.concatenate([v0.T, e1.T, e2.T, tail], 0).astype(np.float32)
    plo = lo[ord_pad].reshape(m, k, 3).min(1)
    phi = hi[ord_pad].reshape(m, k, 3).max(1)
    slot2tri = ord_pad.astype(np.int32)
    if pad:
        slot2tri[n:] = -1
        tri9[:, n:] = 0.0
    from .build import sort_key_coarse
    return dict(pk_tri=tri9, pk_blk_lo=plo.astype(np.float32),
                pk_blk_hi=phi.astype(np.float32),
                pk_slot2tri=slot2tri,
                **sort_key_coarse(plo, phi)), k


# ---------------------------------------------------------------------------
# Host-side build: instanced (TLAS/BLAS) block structure
# ---------------------------------------------------------------------------

def _sah_order(tri_v: np.ndarray) -> np.ndarray:
    """SAH leaf order for a triangle soup (threaded C++ builder preferred)."""
    from .build import _sah_build_binary
    from ..native.loader import native_build_bvh

    lo = tri_v.min(1)
    hi = tri_v.max(1)
    native = native_build_bvh(lo, hi, 4)
    if native is not None:
        return native[3]
    return _sah_build_binary(lo, hi, leaf_size=4)[1]


def build_tri_blocks_inst(tri_v, otri_v, inst_fwd, inst_inv, inst_base,
                          inst_count, block_k: int | None = None):
    """Two-level instanced block tables (TLAS/BLAS analog, BVH.hpp:554-555).

    Object-space triangle columns are stored ONCE per model; the block
    list the kernel walks is instance-EXPANDED: each entry carries a world
    AABB (the model block's object AABB pushed through the instance
    transform), the physical column block to DMA, and the instance id
    whose inverse transform the kernel applies to the ray tile before
    testing (TransformedPrimitive semantics, Primitive.cpp:41-66).

    Returns (arrays, block_k):
      pk_tri      [16, Mp*K] f32  physical v0/e1/e2 columns
                                  (world tris first, then per-model object
                                  tris, each SAH-ordered)
      pk_blk_lo/hi [Me, 3]        EXPANDED world-space block bounds
      pk_blk_src  [Me] i32        expanded block -> physical column block
      pk_blk_inst [Me] i32        expanded block -> instance id (-1 world)
      pk_slot2tri [Mp*K] i32      physical slot -> tri id (world tri id for
                                  world blocks, otri id for model blocks)
      pk_inst_inv [ni, 12] f32    row-major inverse [3,4] per instance
      pk_inst_fwd [ni, 12] f32    forward (unused by kernel; kept for AD
                                  completeness / debugging)
    """
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

    n_eff = nt + sum(int(inst_count[i]) for i in range(ni))
    from .beam import pick_block_k
    k = block_k or max(128, -(-pick_block_k(max(n_eff, 1)) // 128) * 128)

    def n_expanded(k):
        me = -(-nt // k) if nt else 0
        for (base, count), insts in models.items():
            me += (-(-count // k)) * len(insts)
        return me

    while n_expanded(k) > 4096:
        k += 128
    if k > 512:
        k = -(-k // 512) * 512

    ordered = []                      # [*, 3, 3] physical tri chunks
    slot2tri = []
    exp_lo, exp_hi, exp_src, exp_inst = [], [], [], []
    phys_blocks = 0

    def emit_source(v_sub, glob_ids):
        """SAH-order + block one triangle soup; returns per-block
        (src ids, object-space lo/hi)."""
        nonlocal phys_blocks
        order = _sah_order(v_sub)
        n = len(order)
        mb = -(-n // k)
        pad = mb * k - n
        ord_pad = np.concatenate([order, np.repeat(order[-1:], pad)])
        ordered.append(v_sub[ord_pad])
        s2t = glob_ids[ord_pad].astype(np.int32)
        if pad:
            s2t[n:] = -1
        slot2tri.append(s2t)
        lo = v_sub[ord_pad].min(1).reshape(mb, k, 3).min(1)
        hi = v_sub[ord_pad].max(1).reshape(mb, k, 3).max(1)
        src = np.arange(phys_blocks, phys_blocks + mb, dtype=np.int32)
        phys_blocks += mb
        return src, lo, hi

    if nt:
        src, lo, hi = emit_source(tri_v, np.arange(nt))
        exp_lo.append(lo)
        exp_hi.append(hi)
        exp_src.append(src)
        exp_inst.append(np.full(len(src), -1, np.int32))

    for (base, count), insts in models.items():
        src, lo, hi = emit_source(otri_v[base:base + count],
                                  np.arange(base, base + count))
        # 8 corners of each object-space block AABB
        corners = np.stack([np.stack([np.where(m & (1 << a), hi[:, a],
                                               lo[:, a]) for a in range(3)],
                                     -1) for m in range(8)], 1)  # [mb,8,3]
        for i in insts:
            f = inst_fwd[i]
            wc = corners @ f[:3, :3].T + f[:3, 3]
            exp_lo.append(wc.min(1))
            exp_hi.append(wc.max(1))
            exp_src.append(src)
            exp_inst.append(np.full(len(src), i, np.int32))

    v = np.concatenate(ordered, 0)                        # [Mp*K, 3, 3]
    v0 = v[:, 0]
    e1 = v[:, 1] - v0
    e2 = v[:, 2] - v0
    tri9 = np.concatenate([v0.T, e1.T, e2.T,
                           np.zeros((7, len(v)), np.float32)],
                          0).astype(np.float32)
    from .build import sort_key_coarse
    blo = np.concatenate(exp_lo, 0).astype(np.float32)
    bhi = np.concatenate(exp_hi, 0).astype(np.float32)
    return dict(
        pk_tri=tri9,
        pk_blk_lo=blo,
        pk_blk_hi=bhi,
        pk_blk_src=np.concatenate(exp_src, 0),
        pk_blk_inst=np.concatenate(exp_inst, 0),
        pk_slot2tri=np.concatenate(slot2tri, 0),
        pk_inst_inv=np.stack([f[:3, :4].reshape(12) for f in inst_inv]),
        pk_inst_fwd=np.stack([f[:3, :4].reshape(12) for f in inst_fwd]),
        **sort_key_coarse(blo, bhi),
    ), k


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _kernel(boxT_hbm, ox_ref, oy_ref, oz_ref,
            dx_ref, dy_ref, dz_ref, tmax_ref, tri_hbm, *rest,
            block_k: int, n_blocks: int, any_hit: bool,
            instanced: bool = False, motion: bool = False,
            debug_phase: int = 0, use_recull: bool = True,
            recull_every: int = RECULL_EVERY, amask: int = 0):
    """Tile-divergent traversal with IN-KERNEL block ordering, in the
    RAYS-IN-SUBLANES layout (see pallas_trace2._kernel2 for the design
    notes): lane-major entry table + iota-argmin selection, and
    Moller-Trumbore over [128 rays(sublanes), SUB prims(lanes)] read
    straight from the pk_tri rows.  Ray rows transpose once per tile
    through an exact-f32 MXU identity matmul.

    boxT_hbm: [8, Mpad] — box components in sublanes, blocks in lanes.
    """
    K = block_k
    assert not (instanced and motion), "instanced+motion falls back"
    rest = list(rest)
    src_ref = inst_ref = inv_ref = time_ref = None
    if instanced:
        src_ref, inst_ref, inv_ref = rest[:3]
        rest = rest[3:]
    if motion:
        time_ref = rest[0]
        rest = rest[1:]
    if use_recull:
        out_t_ref, out_slot_ref, scratch, sem, ecol_ref, etab_ref, \
            boxv_ref, box_sem = rest
    else:
        etab_ref = None
        out_t_ref, out_slot_ref, scratch, sem, ecol_ref, \
            boxv_ref, box_sem = rest

    mpad = boxv_ref.shape[1]
    R = mpad // 128

    if debug_phase == 1:          # timing probe: pure I/O, no compute
        out_t_ref[0] = tmax_ref[0]
        out_slot_ref[0] = jnp.full((TPS, TILE), -1.0, jnp.float32)
        return

    # the block-box table is shared by every tile: fetch it into scratch
    # ONCE (scratch persists across grid steps)
    @pl.when(pl.program_id(0) == 0)
    def _():
        pltpu.make_async_copy(boxT_hbm, boxv_ref, box_sem).start()
        pltpu.make_async_copy(boxT_hbm, boxv_ref, box_sem).wait()

    SUB = min(K, 512)
    assert K % SUB == 0

    to_col, to_row = kc.make_transposes(TILE)
    lane_row, flat_iota = kc.lane_iotas(R)
    inv_guard = kc.inv_guard

    def run_tile(tt, _):
        tmax_row = tmax_ref[0, pl.ds(tt, 1), :]            # [1,128]
        live_tile = jnp.max(tmax_row) > 0.0

        @pl.when(~live_tile)
        def _():
            # all-dead tile (regen drain tail or padding): emit miss
            # rows without paying the entry phase
            out_t_ref[0, pl.ds(tt, 1), :] = tmax_row
            out_slot_ref[0, pl.ds(tt, 1), :] = jnp.full(
                (1, TILE), -1.0, jnp.float32)

        @pl.when(live_tile)
        def _():
            run_live_tile(tt)
        return 0

    def run_live_tile(tt):
        ox = to_col(ox_ref[0, pl.ds(tt, 1), :])            # [128,1]
        oy = to_col(oy_ref[0, pl.ds(tt, 1), :])
        oz = to_col(oz_ref[0, pl.ds(tt, 1), :])
        dx = to_col(dx_ref[0, pl.ds(tt, 1), :])
        dy = to_col(dy_ref[0, pl.ds(tt, 1), :])
        dz = to_col(dz_ref[0, pl.ds(tt, 1), :])
        tmax = to_col(tmax_ref[0, pl.ds(tt, 1), :])
        rtime = to_col(time_ref[0, pl.ds(tt, 1), :]) if motion else None
        ix, iy, iz = inv_guard(dx), inv_guard(dy), inv_guard(dz)

        # ---- phase 1: tile-min entry distance per block -----------------
        kc.entry_phase(boxv_ref, ecol_ref, etab_ref, (ox, oy, oz),
                       (ix, iy, iz), tmax, n_blocks, R, lane_row,
                       use_recull)
        recull = kc.make_recull(etab_ref, ecol_ref, R)
        select = kc.make_select(ecol_ref, flat_iota, lane_row)

        def src_of(b):
            # expanded block -> physical column block (instanced TLAS)
            return src_ref[0, b] if instanced else b

        def rays_for(b):
            """Ray columns in the tested block's source space
            (TransformedPrimitive, Primitive.cpp:47-66)."""
            if not instanced:
                return ox, oy, oz, dx, dy, dz
            inst = inst_ref[0, b]
            (oxl, oyl, ozl), (dxl, dyl, dzl) = kc.instance_transform(
                inv_ref, jnp.maximum(inst, 0), (ox, oy, oz), (dx, dy, dz))
            use = inst >= 0
            return (jnp.where(use, oxl, ox), jnp.where(use, oyl, oy),
                    jnp.where(use, ozl, oz), jnp.where(use, dxl, dx),
                    jnp.where(use, dyl, dy), jnp.where(use, dzl, dz))

        def dma(slot, src):
            return pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(src * K, K)],
                scratch.at[slot], sem.at[slot])

        def test_block(best_t, best_slot, b, slot):
            rays = rays_for(b)
            # sub-chunks bound the [128, SUB] VPU intermediates to VMEM
            for sub in range(K // SUB):
                def row(i):
                    return scratch[slot, pl.ds(i, 1),
                                   pl.ds(sub * SUB, SUB)]   # [1,SUB]
                if amask:
                    # in-kernel conservative alpha test (the micro-mask
                    # rows; see pallas_trace2 for the mode semantics)
                    t, uu, vv = kc.moller_trumbore(row, rays, rtime,
                                                   motion, best_t,
                                                   with_uv=True)
                    opq, mix = kc.alpha_cell_bits(row, uu, vv)
                    hitm = t < BIG_F32 * 0.5
                    if amask == 1:
                        t = jnp.where(hitm & ~(opq | mix), BIG_F32, t)
                        solid = None
                    else:
                        solid = jnp.min(
                            jnp.where(hitm & opq, t, BIG_F32), axis=1,
                            keepdims=True) < BIG_F32 * 0.5
                        t = jnp.where(hitm & mix, t, BIG_F32)
                else:
                    t = kc.moller_trumbore(row, rays, rtime, motion,
                                           best_t)
                    solid = None
                kbest = jnp.argmin(t, axis=1)[:, None]      # [128,1]
                tbest = jnp.min(t, axis=1, keepdims=True)   # [128,1]
                better = tbest < best_t
                best_t = jnp.where(better, tbest, best_t)
                best_slot = jnp.where(
                    better,
                    kc.itof_exact(b * K + sub * SUB + kbest),
                    best_slot)
                if amask == 2 and solid is not None:
                    # definitely-opaque hit: occluded outright (any-hit
                    # collapse; -2 = "occluded, no candidate")
                    best_t = jnp.where(solid, 0.0, best_t)
                    best_slot = jnp.where(solid, -2.0, best_slot)
            return best_t, best_slot

        # ---- phase 2: selection-driven traversal, one-ahead prefetch ----
        b0, e0 = select()
        live0 = e0 < BIG_F32 * 0.5

        @pl.when(live0)
        def _():
            dma(0, src_of(b0)).start()

        def cond(carry):
            return carry[5]

        def body(carry):
            b, e, slot, best_t, best_slot, _, cnt = carry

            if use_recull:
                @pl.when(cnt >= recull_every)
                def _():
                    recull(best_t)

                cnt = jnp.where(cnt >= recull_every, 0, cnt + 1)
            nb, ne = select()
            has_next = ne < BIG_F32 * 0.5
            # prefetch the next selected block while testing this one
            @pl.when(has_next)
            def _():
                dma(1 - slot, src_of(nb)).start()
            dma(slot, src_of(b)).wait()
            best_t, best_slot = test_block(best_t, best_slot, b, slot)
            if any_hit:
                # a hit ray is DONE: collapsing its best_t lets recull
                # drop its blocks (callers consume the hit flag, not t)
                best_t = jnp.where(best_slot >= 0.0, 0.0, best_t)
                live = has_next & ~jnp.all(best_slot >= 0)
            else:
                # entryDist t-max culling (BVH.hpp:1129-1135) at tile
                # granularity: stop when the closest unvisited block
                # starts beyond the tile's worst best hit
                live = has_next & (ne < jnp.max(best_t))
            @pl.when(has_next & ~live)
            def _():
                dma(1 - slot, src_of(nb)).wait()
            return nb, ne, 1 - slot, best_t, best_slot, live, cnt

        best_t0 = tmax
        best_slot0 = jnp.full((TILE, 1), -1.0, jnp.float32)
        _, _, _, best_t, best_slot, _, _ = jax.lax.while_loop(
            cond, body,
            (b0, e0, jnp.asarray(0, jnp.int32), best_t0, best_slot0,
             live0, jnp.asarray(1, jnp.int32)))
        out_t_ref[0, pl.ds(tt, 1), :] = to_row(best_t)
        # slot rides the f32 transpose: exact below 2^24 (caller asserts)
        out_slot_ref[0, pl.ds(tt, 1), :] = to_row(best_slot)

    jax.lax.fori_loop(0, TPS, run_tile, 0)


@functools.partial(jax.jit, static_argnames=("block_k", "any_hit",
                                             "debug_phase",
                                             "recull_every", "amask"))
def pallas_tri_intersect(scene, origin, direction, t_max, block_k: int,
                         any_hit: bool = False, debug_phase: int = 0,
                         time=None, recull_every: int = RECULL_EVERY,
                         amask: int = 0):
    """Closest-hit over the triangle block tables via the Pallas kernel.

    Returns dict(t [N], tri [N] original-triangle-id, inst [N], valid [N]);
    `inst` is the runtime-instance id (-1 for world triangles), in which
    case `tri` indexes the object-space table.
    `time` [N]: per-ray shutter time for motion-blurred scenes (tables
    built with tri_vel).
    N must be a multiple of TILE (callers pad; padded rays get t_max<=0).
    """
    n = origin.shape[0]
    assert n % TILE == 0, n
    m = scene["pk_blk_lo"].shape[0]
    K = block_k
    instanced = "pk_blk_src" in scene
    motion = time is not None
    # slots ride through an f32 transpose in-kernel: must stay < 2^24.
    # Instanced slots are EXPANDED-block encoded (expanded_block*K + k),
    # so the bound is m*K — the physical table length understates it
    max_slot = m * K if instanced else scene["pk_slot2tri"].shape[0]
    assert max_slot < (1 << 24), \
        "encoded slot ids exceed exact-f32 range (2^24): scene too large"

    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    # pad to a whole number of TPS-tile groups; padded rays get t_max=0
    # (their tiles select no blocks and exit immediately)
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
    mpad = -(-m // 128) * 128
    # lane-major block-box table [8, Mpad]: components in sublanes,
    # blocks in lanes (the layout the in-kernel entry phase consumes)
    box = jnp.concatenate(
        [scene["pk_blk_lo"].T, scene["pk_blk_hi"].T,
         jnp.zeros((2, m), jnp.float32)], 0)               # [8, M]
    box = jnp.pad(box, ((0, 0), (0, mpad - m)))

    ray_spec = pl.BlockSpec((1, TPS, TILE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec(memory_space=pl.ANY)   # kernel DMAs once

    # sentinel-large cadence disables the re-cull machinery entirely
    # (no [TILE, mpad] table in VMEM, no per-chunk stores) — the true
    # baseline for A/B tools; the VMEM cap mirrors pallas_trace2
    use_recull = mpad <= RECULL_MAX_MPAD and recull_every < (1 << 29)
    if amask:
        # see pallas_trace2: mode 1 = closest transparent-cull, mode 2
        # = shadow walk; masks share rows 9..11 with motion velocities
        assert not any_hit and not motion and amask in (1, 2), \
            (amask, any_hit, motion)
    kernel = functools.partial(_kernel, block_k=K, n_blocks=m,
                               any_hit=any_hit, instanced=instanced,
                               motion=motion, debug_phase=debug_phase,
                               use_recull=use_recull,
                               recull_every=recull_every, amask=amask)
    in_specs = [box_spec] + [ray_spec] * 7 + [
        pl.BlockSpec(memory_space=pl.ANY)]
    shp = (groups, TPS, TILE)
    operands = [box,
                ox.reshape(shp), oy.reshape(shp), oz.reshape(shp),
                dx.reshape(shp), dy.reshape(shp), dz.reshape(shp),
                t_max.reshape(shp), scene["pk_tri"]]
    if instanced:
        ninst = scene["pk_inst_inv"].shape[0]

        def shared(shape):
            # grid-invariant tables: every tile maps to block (0, 0, ...)
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                memory_space=pltpu.SMEM)

        # inverse transforms FLAT [1, ninst*12]: an SMEM window pads the
        # minor dim to 128 lanes, so [ninst, 12] would cost ninst*512 B
        in_specs += [shared((1, m)), shared((1, m)),
                     shared((1, ninst * 12))]
        operands += [scene["pk_blk_src"].reshape(1, m),
                     scene["pk_blk_inst"].reshape(1, m),
                     scene["pk_inst_inv"].reshape(1, ninst * 12)]
    if motion:
        in_specs += [ray_spec]
        operands += [jnp.asarray(time, jnp.float32).reshape(shp)]
    # off-TPU (tests, virtual CPU meshes) the kernel runs interpreted
    interpret = jax.default_backend() != "tpu"
    out_t, out_slot = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(groups,),
        in_specs=in_specs,
        out_specs=[ray_spec, ray_spec],
        out_shape=[jax.ShapeDtypeStruct(shp, jnp.float32),
                   jax.ShapeDtypeStruct(shp, jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, 16, K), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.VMEM((mpad // 128, 128), jnp.float32)]
                       + ([pltpu.VMEM((TILE, mpad), jnp.float32)]
                          if use_recull else [])
                       + [pltpu.VMEM((8, mpad), jnp.float32),
                          pltpu.SemaphoreType.DMA(())],
    )(*operands)
    out_slot = out_slot.astype(jnp.int32)

    t = out_t.reshape(n2)[:n]
    slot = out_slot.reshape(n2)[:n]
    valid = slot >= 0
    if instanced:
        # slot = expanded_block*K + offset: recover (instance, physical
        # slot) through the expansion tables
        e = jnp.clip(slot // K, 0)
        off = jnp.clip(slot, 0) % K
        src = scene["pk_blk_src"][e]
        inst = jnp.where(valid, scene["pk_blk_inst"][e], -1)
        tri = jnp.where(valid, scene["pk_slot2tri"][src * K + off], -1)
    else:
        inst = jnp.full((n,), -1, jnp.int32)
        tri = jnp.where(valid, scene["pk_slot2tri"][jnp.clip(slot, 0)], -1)
    valid = valid & (tri >= 0)
    inst = jnp.where(valid, inst, -1)
    res = dict(t=jnp.where(valid, t, BIG_F32), tri=tri, inst=inst,
               valid=valid)
    if amask == 2:
        # definite in-kernel occlusion (opaque-cell hit; no candidate)
        res["solid"] = slot == -2
    return res
