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
  * the child-box row AND the whole [16, G*K2] triangle row of the
    NEXT selected L1 are DMA'd (double buffered) while the current
    L1's children are tested, so the serial per-L1 loop never stalls
    on a fetch;
  * the child drain is fully VECTORIZED (round 3): per-child entries
    stay a [1,128] lane vector popped by the same min + iota-min trick
    as the L1 selection, each popped child is tested unconditionally,
    and after every test the remaining children are re-culled against
    the post-test per-ray best_t.  The previous form extracted 16
    child entries to scalars, built a bitmask, ran 16 conditional
    per-child DMA starts and a 16-step scalar selection chain per
    pop — ~2us/visit of scalar-pipeline serialization (measured,
    tools/bench_mxu_leaf.py), which dominated bounce traversal.
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
from .pallas_trace import TILE, TPS

G_DEFAULT = 16      # L2 blocks per L1 superblock (tunable)
RECULL_EVERY = 8    # L1 visits between per-ray entry-table re-culls
RECULL_MAX_M1PAD = 8192   # beyond this many L1 lanes the [128, m1pad]
                          # entry table (~4MB) would crowd VMEM: skip it


def build_tri_blocks2(tri_v: np.ndarray, k2: int | None = None,
                      tri_vel: np.ndarray | None = None,
                      shutter: tuple = (0.0, 0.0),
                      g: int = G_DEFAULT,
                      order: np.ndarray | None = None,
                      tri_mask: np.ndarray | None = None):
    """Two-level block tables.  Returns (arrays, k2):
      pk_tri      [16, M1*(G*K2+128)]  per-L1 group row: the G children's
                                block-contiguous triangle components
                                (+ velocity in rows 9..11 under motion)
                                followed by 128 box lanes whose rows 0-5
                                carry the children's AABBs — ONE DMA per
                                visited L1 fetches triangles AND boxes
      pk_blk_lo/hi[M1, 3]       L1 bounds
      pk_l1_base  [M1] i32      first K2-block owned by each L1 (slot
                                decode: slot = l1_base*K2 + off)
      pk_slot2tri [M2*K2]
    tri_vel/shutter: linear motion — boxes expand by the union over the
    shutter (AnimatedPrimitive, Primitive.cpp:77-96).
    order: optional pre-built SAH order (sweep tools pass it to avoid
    re-running the build per (k2, g) config).  CONTRACT: a permutation
    of range(len(tri_v)) built over the SAME triangle set — including
    any motion expansion — or the blocking silently degrades/corrupts.
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
    if order is None:
        # order is k2/g-independent: sweep tools pass it in to avoid
        # re-running the SAH build per block-shape configuration
        native = native_build_bvh(lo, hi, 4)
        if native is not None:
            order = native[3]
        else:
            _, order = _sah_build_binary(lo, hi, leaf_size=4)
    else:
        order = np.asarray(order)
        assert len(order) == len(tri_v), \
            (f"order length {len(order)} != triangle count {len(tri_v)} "
             "(was it built over the same, motion-expanded, set?)")
    n = len(order)
    G = g
    if k2 is None:
        k2 = 128
        while -(-n // (k2 * G)) > 4096:
            k2 += 128
    m2 = -(-n // k2)
    nb_data = m2
    # pad the block count to a whole number of G-groups: the kernel DMAs
    # each visited L1's children as ONE [16, G*K2] row, which must stay
    # in-bounds even for the last group.  Padded slots are ZERO columns
    # (e1 = e2 = 0 => det == 0 => can never hit) under empty far-point
    # child boxes (never entered)
    m2 = -(-m2 // G) * G
    pad = m2 * k2 - n
    ord_pad = np.concatenate([order, np.repeat(order[-1:], pad)])
    v = tri_v[ord_pad]
    v0 = v[:, 0]
    e1 = v[:, 1] - v0
    e2 = v[:, 2] - v0
    if tri_mask is not None:
        # alpha micro-mask rows 9..15 (scene/alphamask.py); mutually
        # exclusive with motion velocities, which own rows 9..11
        assert tri_vel is None, "alpha masks and motion share rows 9-11"
        tail = np.asarray(tri_mask, np.float32)[ord_pad].T
    else:
        vel_rows = (tri_vel[ord_pad].T if tri_vel is not None
                    else np.zeros((3, len(v)), np.float32))
        tail = np.concatenate([vel_rows,
                               np.zeros((4, len(v)), np.float32)], 0)
    tri9 = np.concatenate([v0.T, e1.T, e2.T, tail], 0)
    if pad:
        tri9[:, n:] = 0.0
    l2lo = lo[ord_pad].reshape(m2, k2, 3).min(1)
    l2hi = hi[ord_pad].reshape(m2, k2, 3).max(1)
    if m2 > nb_data:
        l2lo[nb_data:] = 3e37      # degenerate far-point empty boxes
        l2hi[nb_data:] = 3e37

    # Fixed consecutive groups of G blocks.  MEASURED DEAD END: cutting
    # L1 groups at SAH-subtree boundaries (variable-size treelets,
    # snapped to K2 block boundaries and merged) reduced ENTERED L1
    # counts in CPU probes, yet ran 2-3x SLOWER on the TPU at 10.5M
    # tris — the snapped groups overlap more, which degrades the
    # front-to-back early-exit (more L1s with small entries are visited
    # before `ne < max(best_t)` fires) and adds 38% more selection
    # iterations.  pk_l1_base keeps variable grouping EXPRESSIBLE for
    # future experiments.
    groups = [(b, min(b + G, m2)) for b in range(0, m2, G)]
    m1 = len(groups)
    l1_base = np.asarray([b for b, _ in groups], np.int32)
    # [M1, 8, 128]: per-L1 row of its child box components padded into
    # the 128-lane axis (unused lanes get empty boxes) — the layout a
    # single aligned DMA can fetch per visited L1
    l2box = np.zeros((m1, 8, 128), np.float32)
    # empty child lanes are DEGENERATE FAR-POINT boxes (lo == hi == 3e37),
    # which the slab test rejects for EVERY ray sign.  +-inf "empty"
    # boxes are a trap: with a negative inverse direction the min/max
    # swap makes (lo=+inf, hi=-inf) look ENTERED, and since the last L1
    # group can own fewer than G blocks, a spurious entry DMA'd past the
    # end of pk_tri (TPU kernel fault).
    l2box[:, 0:6, :] = 3e37
    l1lo = np.empty((m1, 3), np.float32)
    l1hi = np.empty((m1, 3), np.float32)
    for i, (b, e) in enumerate(groups):
        w = e - b
        l2box[i, 0:3, :w] = l2lo[b:e].T
        l2box[i, 3:6, :w] = l2hi[b:e].T
        # L1 bounds span only DATA blocks (padded far-point blocks would
        # blow the box up to 3e37 and pin this L1 first in every entry
        # order)
        wd = max(1, min(e, nb_data) - b)
        l1lo[i] = l2lo[b:b + wd].min(0)
        l1hi[i] = l2hi[b:b + wd].max(0)
    slot2tri = ord_pad.astype(np.int32)
    if pad:
        slot2tri[n:] = -1
    from .build import sort_key_coarse
    return dict(pk_tri=_interleave_boxes(tri9.astype(np.float32),
                                         l2box, G, k2),
                pk_blk_lo=l1lo,
                pk_blk_hi=l1hi,
                pk_l1_base=l1_base,
                pk_slot2tri=slot2tri,
                **sort_key_coarse(l1lo, l1hi)), k2


def _interleave_boxes(tri9, l2box, G, k2):
    """[16, M1*(G*K2+128)] group rows: each visited L1's triangle
    columns AND its child-box lanes land in ONE contiguous DMA window
    (a separate per-visit 4KB box DMA cost a start+wait on the serial
    per-L1 loop)."""
    m1 = l2box.shape[0]
    W = G * k2 + 128
    out = np.zeros((16, m1 * W), np.float32)
    view = out.reshape(16, m1, W)
    view[:, :, :G * k2] = tri9.reshape(16, m1, G * k2)
    view[0:6, :, G * k2:] = l2box.transpose(1, 0, 2)[0:6]
    return out


def build_tri_blocks2_inst(tri_v, otri_v, inst_fwd, inst_inv, inst_base,
                           inst_count, k2: int | None = None,
                           g: int = G_DEFAULT,
                           tri_sel=None, otri_sel=None,
                           tri_vel=None, inst_vel=None,
                           shutter: tuple = (0.0, 0.0),
                           tri_mask=None, otri_mask=None):
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

    tri_sel / otri_sel: optional bool masks restricting which world /
    object triangles the tables cover — the builder's alpha-material
    table split (Primitive.cpp:6-14 alpha shadow semantics) builds one
    opaque and one alpha set this way.  pk_slot2tri always maps to
    GLOBAL ids, so downstream interaction lookups are unchanged; an
    instance whose model has no selected triangle emits no L1s.

    tri_vel [nt,3] / inst_vel [ni,3] / shutter: linear motion
    (AnimatedPrimitive, Primitive.cpp:77-96).  World rows carry per-tri
    velocities in rows 9..11 (leaf test shifts the origin); moving
    instances get their expanded world L1 AABBs unioned over the shutter
    and an OBJECT-SPACE velocity row (pk_inst_velo) the kernel uses to
    shift the object-space ray origin by -v_obj*time per visit.

    Returns (arrays, k2):
      pk_tri       [16, M1p*(G*K2+128)]  physical per-L1 group rows:
                                 triangle columns + child-box lanes
                                 (object space for model rows, world
                                 for world-tri rows; see
                                 _interleave_boxes)
      pk_blk_lo/hi [M1e, 3]      EXPANDED world L1 bounds
      pk_blk_src   [M1e] i32     expanded L1 -> physical L1
      pk_blk_inst  [M1e] i32     expanded L1 -> instance id (-1 world)
      pk_slot2tri  [M2p*K2] i32  physical slot -> tri id (world tri id
                                 for world rows, otri id for model rows)
      pk_inst_inv / pk_inst_fwd [ni, 12]
      pk_inst_velo [ni, 3]       object-space instance velocities
    """
    from .build import _sah_build_binary
    from ..native.loader import native_build_bvh

    G = g
    tri_v = np.asarray(tri_v, np.float32).reshape(-1, 3, 3)
    otri_v = np.asarray(otri_v, np.float32).reshape(-1, 3, 3)
    inst_fwd = [np.asarray(f, np.float32) for f in inst_fwd]
    inst_inv = [np.asarray(f, np.float32) for f in inst_inv]
    nt = len(tri_v)
    ni = len(inst_fwd)
    world_ids = (np.nonzero(np.asarray(tri_sel, bool))[0]
                 if tri_sel is not None else np.arange(nt))
    otri_sel = (np.asarray(otri_sel, bool) if otri_sel is not None
                else np.ones(len(otri_v), bool))
    if tri_vel is not None:
        tri_vel = np.asarray(tri_vel, np.float32)
    inst_vel = (np.asarray(inst_vel, np.float32) if inst_vel is not None
                else np.zeros((max(ni, 1), 3), np.float32))
    s0, s1 = float(shutter[0]), float(shutter[1])
    models = {}                       # (base,count) -> instance indices
    for i in range(ni):
        models.setdefault((int(inst_base[i]), int(inst_count[i])),
                          []).append(i)
    model_ids = {bc: bc[0] + np.nonzero(otri_sel[bc[0]:bc[0] + bc[1]])[0]
                 for bc in models}

    def _order(v_sub):
        lo = v_sub.min(1)
        hi = v_sub.max(1)
        native = native_build_bvh(lo, hi, 4)
        if native is not None:
            return native[3]
        return _sah_build_binary(lo, hi, leaf_size=4)[1]

    if k2 is None:
        # aim for <= 4096 expanded L1s (entry-phase cost is linear in
        # the L1 count) — but the kernel handles any count, and when the
        # count is INSTANCE-bound (every instance needs >= 1 L1) raising
        # k2 can't reduce it further: stop as soon as it stops helping
        def n_l1_expanded(k2):
            def l1_of(n):
                return -(-(-(-n // k2)) // G) if n else 0
            me = l1_of(len(world_ids))
            for bc, insts in models.items():
                me += l1_of(len(model_ids[bc])) * len(insts)
            return me

        k2 = 128
        while (n_l1_expanded(k2) > 4096
               and n_l1_expanded(k2 + 128) < n_l1_expanded(k2)):
            k2 += 128

    use_mask = tri_mask is not None or otri_mask is not None
    if use_mask:
        assert tri_vel is None and not np.abs(inst_vel).any(), \
            "alpha masks and motion share rows 9-11"
    tri_chunks, vel_chunks, slot2tri, l2boxes = [], [], [], []
    exp_lo, exp_hi, exp_src, exp_inst = [], [], [], []
    l1_bases = []
    phys_l1 = 0
    phys_blocks = 0

    def emit_source(v_sub, glob_ids, vel_sub=None, mask_sub=None):
        """SAH-order + block one triangle soup into L2/L1 tables; returns
        per-L1 (physical ids, source-space lo/hi)."""
        nonlocal phys_l1, phys_blocks
        order = _order(v_sub)
        n = len(order)
        m2 = -(-n // k2)
        m2 = -(-m2 // G) * G
        pad = m2 * k2 - n
        ord_pad = np.concatenate([order, np.repeat(order[-1:], pad)])
        v = v_sub[ord_pad]
        tri_chunks.append(v)
        if use_mask:
            vel_chunks.append(
                mask_sub[ord_pad] if mask_sub is not None
                else np.zeros((len(ord_pad), 7), np.float32))
        elif vel_sub is not None:
            vel_chunks.append(vel_sub[ord_pad])
        else:
            vel_chunks.append(np.zeros_like(v[:, 0]))
        s2t = glob_ids[ord_pad].astype(np.int32)
        if pad:
            s2t[n:] = -1
        slot2tri.append(s2t)
        lo = v_sub.min(1)
        hi = v_sub.max(1)
        if vel_sub is not None:
            # shutter-expanded boxes (AnimatedPrimitive under accel)
            d0 = vel_sub * s0
            d1 = vel_sub * s1
            lo = lo + np.minimum(d0, d1)
            hi = hi + np.maximum(d0, d1)
        l2lo = lo[ord_pad].reshape(m2, k2, 3).min(1)
        l2hi = hi[ord_pad].reshape(m2, k2, 3).max(1)
        nb_data = -(-n // k2)
        if m2 > nb_data:
            l2lo[nb_data:] = 3e37      # degenerate far-point empty box
            l2hi[nb_data:] = 3e37
        m1 = m2 // G
        box = np.zeros((m1, 8, 128), np.float32)
        # degenerate far-point empty boxes (see build_tri_blocks2)
        box[:, 0:6, :] = 3e37
        box[:, 0:3, :G] = l2lo.reshape(m1, G, 3).transpose(0, 2, 1)
        box[:, 3:6, :G] = l2hi.reshape(m1, G, 3).transpose(0, 2, 1)
        l2boxes.append(box)
        # L1 bounds span only DATA blocks: padded far-point (3e37) blocks
        # would blow the last group's box up so it tests as
        # entered-first for every ray (and its world corners overflow
        # through the instance transform)
        l2lo_d = np.where(l2lo >= 3e37, np.inf, l2lo)
        l2hi_d = np.where(l2hi >= 3e37, -np.inf, l2hi)
        l1lo = l2lo_d.reshape(m1, G, 3).min(1)
        l1hi = l2hi_d.reshape(m1, G, 3).max(1)
        src = np.arange(phys_l1, phys_l1 + m1, dtype=np.int32)
        l1_bases.append(phys_blocks + np.arange(m1, dtype=np.int32) * G)
        phys_l1 += m1
        phys_blocks += m2
        return src, l1lo, l1hi

    if len(world_ids):
        src, lo, hi = emit_source(
            tri_v[world_ids], world_ids,
            tri_vel[world_ids] if tri_vel is not None else None,
            np.asarray(tri_mask, np.float32)[world_ids]
            if tri_mask is not None else None)
        exp_lo.append(lo)
        exp_hi.append(hi)
        exp_src.append(src)
        exp_inst.append(np.full(len(src), -1, np.int32))

    for bc, insts in models.items():
        ids = model_ids[bc]
        if not len(ids):
            continue                  # model fully outside this subset
        src, lo, hi = emit_source(
            otri_v[ids], ids,
            mask_sub=np.asarray(otri_mask, np.float32)[ids]
            if otri_mask is not None else None)
        # 8 corners of each object-space L1 AABB -> world AABB per instance
        corners = np.stack([np.stack([np.where(m & (1 << a), hi[:, a],
                                               lo[:, a]) for a in range(3)],
                                     -1) for m in range(8)], 1)  # [m1,8,3]
        for i in insts:
            f = inst_fwd[i]
            wc = corners @ f[:3, :3].T + f[:3, 3]
            wlo = wc.min(1)
            whi = wc.max(1)
            d0 = inst_vel[i] * s0     # moving instance: union over shutter
            d1 = inst_vel[i] * s1
            exp_lo.append(wlo + np.minimum(d0, d1))
            exp_hi.append(whi + np.maximum(d0, d1))
            exp_src.append(src)
            exp_inst.append(np.full(len(src), i, np.int32))

    v = np.concatenate(tri_chunks, 0)                     # [M2p*K2, 3, 3]
    v0 = v[:, 0]
    e1 = v[:, 1] - v0
    e2 = v[:, 2] - v0
    tail = np.concatenate(vel_chunks, 0).T       # [3|7, M2p*K2]
    if not use_mask:
        tail = np.concatenate(
            [tail, np.zeros((4, len(v)), np.float32)], 0)
    tri9 = np.concatenate([v0.T, e1.T, e2.T, tail], 0).astype(np.float32)
    # object-space instance velocities: v_obj = inv_lin @ v_world (the
    # kernel shifts the object-space ray origin by -v_obj*time)
    velo = np.stack([inst_inv[i][:3, :3] @ inst_vel[i] if ni else
                     np.zeros(3, np.float32) for i in range(max(ni, 1))])
    from .build import sort_key_coarse
    blo = np.concatenate(exp_lo, 0).astype(np.float32)
    bhi = np.concatenate(exp_hi, 0).astype(np.float32)
    return dict(
        pk_tri=_interleave_boxes(tri9, np.concatenate(l2boxes, 0),
                                 G, k2),
        pk_blk_lo=blo,
        pk_blk_hi=bhi,
        **sort_key_coarse(blo, bhi),
        pk_blk_src=np.concatenate(exp_src, 0),
        pk_blk_inst=np.concatenate(exp_inst, 0),
        pk_l1_base=np.concatenate(l1_bases, 0),
        pk_slot2tri=np.concatenate(slot2tri, 0),
        pk_inst_inv=np.stack([f[:3, :4].reshape(12) for f in inst_inv]),
        pk_inst_fwd=np.stack([f[:3, :4].reshape(12) for f in inst_fwd]),
        pk_inst_velo=velo.astype(np.float32),
    ), k2


def _kernel2(l1boxT_hbm, ox_ref, oy_ref, oz_ref,
             dx_ref, dy_ref, dz_ref, tmax_ref, tri_hbm,
             base_ref, *rest, k2: int, n_l1: int, any_hit: bool,
             g: int = G_DEFAULT, instanced: bool = False,
             motion: bool = False, counters: bool = False,
             use_recull: bool = True,
             recull_every: int = RECULL_EVERY,
             drain_cull: bool = True,
             max_visits: int | None = None,
             frontier: bool = False,
             pops: int = 1,
             pair: bool = False,
             amask: int = 0,
             window: int = 1):
    """Two-level traversal, RAYS-IN-SUBLANES layout.

    window > 1: RESIDENT-WINDOW drain — `window` L1 group rows live in
    scratch at once and every drain iteration pops the `pops` nearest
    children across ALL of them ([window,128] entry matrix).  The
    single-L1 walk averages only ~4-5 entered children per visit, so
    its drain loop runs ~1 iteration per visit and the per-iteration
    vector->scalar->branch sync (~0.7us) plus per-visit loop overhead
    is paid per L1; a 4-L1 window amortizes one sync over 4 L1s' worth
    of candidates and lets pops rise without duplicate-test waste
    (pops>4 on a single L1 measured +12% from dup tests).  DMA
    prefetch is window-to-window double buffered.  Front-to-back
    quality is preserved (windows pop in entry order; cross-window
    exit tests the next window's nearest entry).

    amask: in-kernel conservative alpha-mask testing against the
    micro-mask rows 9..15 (scene/alphamask.py; the in-traversal analog
    of the reference's alpha test, Primitive.cpp:6-14):
      1 = closest-pass cull: definitely-transparent candidates become
          misses (the shade stage's exact test + restart handles the
          rest unchanged);
      2 = shadow pass: a definitely-opaque hit occludes outright — the
          ray collapses any-hit-style with best_blk = -2 — while MIXED
          hits walk as normal closest candidates, so the output is the
          nearest hit needing an exact texture test (the restart
          chain's seed).  Definitely-transparent hits are skipped.

    Everything per-ray lives in [128, 1] columns (sublane = ray), so the
    three hot loops are dense full-lane VPU work with zero scalar-load
    chains:
      * L1 entry phase: ray columns x a lane-major L1 box table
        ([8, M1pad], blocks in lanes) -> per-chunk [128, 128] slab,
        sublane-min -> a lane-major entry table ecol [M1pad/128, 128]
        whose argmin-selection is a full-lane min + iota trick (the old
        [M1pad, 1] sublane layout made every select a 1/128-occupancy
        reduction);
      * child phase: the [8, 128] child-box row (children in lanes) slabs
        against the ray columns in ONE [128, 128] op block — the old
        per-child scalar-read loop (6*G scalar VMEM loads per visit) was
        the bulk of a ~4-5us per-visit overhead;
      * leaf phase: Moller-Trumbore as [128 rays, K2 prims-in-lanes],
        reading pk_tri rows directly.

    Ray rows arrive in the usual lane layout and are transposed once per
    tile through an MXU identity matmul (exact for f32).
    l1boxT_hbm: [8, M1pad] rows lox,loy,loz,hix,hiy,hiz (blocks in
    lanes), fetched into scratch once at grid step 0.

    instanced: per visited L1 the ray columns are inverse-transformed
    into the model's object space, direction UNNORMALIZED so t stays
    world-parameterized (Primitive.cpp:47-66).
    """
    K2 = k2
    G = g
    W = G * K2 + 128     # group row: G children's tris + 128 box lanes
    rest = list(rest)
    src_ref = inst_ref = inv_ref = time_ref = velo_ref = None
    if instanced:
        src_ref, inst_ref, inv_ref = rest[:3]
        rest = rest[3:]
        if motion:
            # per-instance OBJECT-SPACE velocities (AnimatedPrimitive
            # wrapping a TransformedPrimitive, Primitive.cpp:77-96)
            velo_ref = rest[0]
            rest = rest[1:]
    if motion:
        time_ref = rest[0]
        rest = rest[1:]
    out_t_ref, out_blk_ref, out_off_ref, *rest = rest
    out_en_ref = out_bn_ref = out_cnt_ref = None
    if frontier:
        out_en_ref, out_bn_ref, *rest = rest
    if counters:
        out_cnt_ref, *rest = rest
    if use_recull:
        scratch, sem, ecol_ref, etab_ref, l1v_ref, l1v_sem = rest
    else:
        scratch, sem, ecol_ref, l1v_ref, l1v_sem = rest
        etab_ref = None
    m1pad = l1v_ref.shape[1]
    R = m1pad // 128

    @pl.when(pl.program_id(0) == 0)
    def _():
        pltpu.make_async_copy(l1boxT_hbm, l1v_ref, l1v_sem).start()
        pltpu.make_async_copy(l1boxT_hbm, l1v_ref, l1v_sem).wait()

    inv = kc.inv_guard
    to_col, to_row = kc.make_transposes(TILE)
    lane_row, flat_iota = kc.lane_iotas(R)

    def run_tile(tt, _):
        tmax_row = tmax_ref[0, pl.ds(tt, 1), :]            # [1,128]
        live_tile = jnp.max(tmax_row) > 0.0

        @pl.when(~live_tile)
        def _():
            # all-dead tile (regen drain tail, padding, or multipass
            # rays already resolved): emit miss rows without paying the
            # entry phase
            out_t_ref[0, pl.ds(tt, 1), :] = tmax_row
            out_blk_ref[0, pl.ds(tt, 1), :] = jnp.full(
                (1, TILE), -1.0, jnp.float32)
            out_off_ref[0, pl.ds(tt, 1), :] = jnp.zeros(
                (1, TILE), jnp.float32)
            if frontier:
                out_en_ref[0, pl.ds(tt, 1), :] = jnp.full(
                    (1, TILE), BIG_F32, jnp.float32)
                out_bn_ref[0, pl.ds(tt, 1), :] = jnp.zeros(
                    (1, TILE), jnp.float32)
            if counters:
                out_cnt_ref[0, pl.ds(tt, 1), :] = jnp.zeros(
                    (1, TILE), jnp.float32)

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
        ix, iy, iz = inv(dx), inv(dy), inv(dz)

        # ---- L1 entry phase: [128 rays, 128 blocks] per chunk ----------
        kc.entry_phase(l1v_ref, ecol_ref, etab_ref, (ox, oy, oz),
                       (ix, iy, iz), tmax, n_l1, R, lane_row, use_recull)
        recull = kc.make_recull(etab_ref, ecol_ref, R)
        select = kc.make_select(ecol_ref, flat_iota, lane_row)

        def src_of(b1):
            # expanded L1 -> physical L1 row (instanced TLAS)
            return src_ref[0, b1] if instanced else b1

        def rays_for(b1):
            """Ray columns (o, d, inv_d) in the visited L1's source
            space (TransformedPrimitive, Primitive.cpp:47-66)."""
            if not instanced:
                return ox, oy, oz, dx, dy, dz, ix, iy, iz
            inst = inst_ref[0, b1]
            iv = jnp.maximum(inst, 0)
            (oxl, oyl, ozl), (dxl, dyl, dzl) = kc.instance_transform(
                inv_ref, iv, (ox, oy, oz), (dx, dy, dz))
            if motion:
                # moving instance: object-space test at ray time == the
                # static test from origin - v_obj*time (the same re-wrap
                # as the leaf motion rows, Primitive.cpp:77-96); child
                # slabs below use these shifted origins too.  velo_ref
                # is FLAT [1, ninst*3] (see the SMEM note at the specs)
                oxl = oxl - velo_ref[0, iv * 3 + 0] * rtime
                oyl = oyl - velo_ref[0, iv * 3 + 1] * rtime
                ozl = ozl - velo_ref[0, iv * 3 + 2] * rtime
            use = inst >= 0
            oxs = jnp.where(use, oxl, ox)
            oys = jnp.where(use, oyl, oy)
            ozs = jnp.where(use, ozl, oz)
            dxs = jnp.where(use, dxl, dx)
            dys = jnp.where(use, dyl, dy)
            dzs = jnp.where(use, dzl, dz)
            return (oxs, oys, ozs, dxs, dys, dzs,
                    inv(dxs), inv(dys), inv(dzs))

        def dma_tris(slot, b1e):
            # ONE DMA fetches a visited L1's whole group row: all G
            # children's triangle columns PLUS the 128 child-box lanes
            # (rows 0-5 of the tail).  This replaced per-entered-child
            # DMAs + a 16-entry scalar bitmask/selection chain (the
            # vector->scalar extraction of child entries and 16
            # conditional DMA starts per visit serialized the scalar
            # pipeline for ~2us/visit — tools/bench_mxu_leaf.py), and
            # then also absorbed the separate 4KB child-box DMA.
            return pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(src_of(b1e) * W, W)],
                scratch.at[slot], sem.at[slot])

        def visit_core(b1, slot_r, best_t, best_blk, best_off, nch,
                       gate=None, wait_gate=None):
            """One L1 visit: child slab + nearest-first drain against
            the group row in scratch[slot_r].

            gate (scalar bool): a SPECULATIVE visit — when False the
            child slab runs against a sub-SHADOW_EPS bound, every entry
            comes out BIG and the drain never executes, so the visit is
            a no-op on the carry (the pair body uses this to process
            two L1s per loop sync without a carry-level branch).
            wait_gate: the visit's DMA was started conditionally — only
            wait under the same condition (waiting on a never-started
            copy would hang; reading stale scratch is safe because the
            gate bound kills every entry)."""
            oxs, oys, ozs, dxs, dys, dzs, ixs, iys, izs = rays_for(b1)
            phys = src_of(b1)
            # base maps physical L1 -> its first block (slot decode)
            base = base_ref[0, phys]

            # ---- child slab: ALL G children at once, [128 rays, 128
            # child-lanes] from the group row's box tail.  The per-
            # (ray, child) entry matrix E is VISIT-INVARIANT (boxes and
            # source-space rays don't change during the drain), so it is
            # computed ONCE per visit; every drain iteration's per-ray
            # re-cull is then a cheap compare+select+sublane-min over E
            # instead of a full slab recompute (round 4: the slab ran
            # once per drain iteration = ~(children+visits) full
            # [128,128] slabs per tile; entries with tn > best_t at
            # visit start are BIG in E, and later culls only shrink
            # best_t, so where(E <= bt) is exactly the recomputed slab).
            # Per-child tile-min entries order the drain front-to-back
            # (BVH.hpp:1142-1203); empty child lanes carry degenerate
            # far-point boxes and fall out as BIG.
            def child_matrix(bt):
                def brow(k):
                    return scratch[slot_r, pl.ds(k, 1),
                                   pl.ds(G * K2, 128)]         # [1,128]
                u0 = (brow(0) - oxs) * ixs
                u1 = (brow(3) - oxs) * ixs
                tn = jnp.minimum(u0, u1)
                tf = jnp.maximum(u0, u1)
                u0 = (brow(1) - oys) * iys
                u1 = (brow(4) - oys) * iys
                tn = jnp.maximum(tn, jnp.minimum(u0, u1))
                tf = jnp.minimum(tf, jnp.maximum(u0, u1))
                u0 = (brow(2) - ozs) * izs
                u1 = (brow(5) - ozs) * izs
                tn = jnp.maximum(jnp.maximum(tn, jnp.minimum(u0, u1)),
                                 SHADOW_EPS)
                tf = jnp.minimum(jnp.minimum(tf, jnp.maximum(u0, u1)),
                                 bt)
                return jnp.where(tn <= tf, tn, BIG_F32)    # [128,128]

            def child_entries(E, bt):
                return jnp.min(jnp.where(E <= bt, E, BIG_F32), axis=0,
                               keepdims=True)              # [1,128]

            def pop(e_row):
                # nearest unvisited child: full-lane min + first-match
                # iota — the same vectorized pop as the L1 selection
                # (2 scalar reads vs the old 16-entry scalar chain)
                beste = jnp.min(e_row)
                bestg = jnp.min(jnp.where(e_row <= beste, lane_row,
                                          jnp.int32(1 << 30)))
                return bestg, beste

            if wait_gate is None:
                dma_tris(slot_r, b1).wait()
            else:
                @pl.when(wait_gate)
                def _():
                    dma_tris(slot_r, b1).wait()
            btv = best_t if gate is None else \
                jnp.where(gate, best_t, SHADOW_EPS * 0.25)
            E = child_matrix(btv)                          # [128,128]
            e_row0 = jnp.min(E, axis=0, keepdims=True)
            g0, eg0 = pop(e_row0)

            # drain entered children NEAREST-FIRST, fully vectorized:
            # entries stay a [1,128] lane vector and every popped child
            # is tested unconditionally — its entry already proves some
            # ray needs it under that ray's CURRENT best_t (strictly
            # tighter than the old tile-max do_test gate)
            def drain_cond(c):
                return c[1] < BIG_F32 * 0.5

            def drain_body(c):
                (bestg, beste0, vis, e_row, best_t, best_blk, best_off,
                 nch) = c
                # pop up to `pops` nearest children for THIS iteration
                # (vector-only min+iota chain, no scalar sync between
                # pops); an empty pop clamps to the first child — a
                # duplicate test is harmless and cheaper than a branch
                plist = [(bestg, beste0)]
                er = jnp.where(lane_row == bestg, BIG_F32, e_row)
                for _ in range(1, pops):
                    gj, ej = pop(er)
                    gj = jnp.where(ej < BIG_F32 * 0.5, gj, bestg)
                    plist.append((gj, ej))
                    er = jnp.where(lane_row == gj, BIG_F32, er)

                # test every popped child against the PRE-iteration
                # best_t: the bound only shrinks, so the stale bound
                # admits extra candidates and the merge below picks the
                # true min — identical results, ONE loop sync for P
                # tests (the per-iteration vector->scalar->branch
                # round-trip measured ~0.7us vs 0.4us for the bare
                # [128,256] test, tools/bench_mxu_leaf.py)
                bt0 = best_t
                tested = []
                for gj, _ in plist:
                    col0 = pl.multiple_of(gj * K2, 128)

                    def row(i, col0=col0):
                        return scratch[slot_r, pl.ds(i, 1),
                                       pl.ds(col0, K2)]
                    if amask:
                        t, uu, vv = kc.moller_trumbore(
                            row, (oxs, oys, ozs, dxs, dys, dzs), rtime,
                            motion, bt0, with_uv=True)
                        opq, mix = kc.alpha_cell_bits(row, uu, vv)
                        hitm = t < BIG_F32 * 0.5
                        if amask == 1:
                            # definitely-transparent candidates = miss
                            t = jnp.where(hitm & ~(opq | mix), BIG_F32,
                                          t)
                            solid = None
                        else:
                            # opaque-cell hit anywhere below the bound
                            # occludes outright (OR semantics: order
                            # doesn't matter for a predicate)
                            solid = jnp.min(
                                jnp.where(hitm & opq, t, BIG_F32),
                                axis=1, keepdims=True) < BIG_F32 * 0.5
                            t = jnp.where(hitm & mix, t, BIG_F32)
                    else:
                        t = kc.moller_trumbore(row, (oxs, oys, ozs, dxs,
                                                     dys, dzs), rtime,
                                               motion, bt0)
                        solid = None
                    kbest = jnp.argmin(t, axis=1)[:, None]   # [128,1]
                    tbest = jnp.min(t, axis=1, keepdims=True)
                    tested.append((gj, tbest, kbest, solid))
                    vis = jnp.where(lane_row == gj, 1.0, vis)

                for gj, tbest, kbest, solid in tested:
                    better = tbest < best_t
                    best_t = jnp.where(better, tbest, best_t)
                    # hits are recorded as a (block, offset) PAIR: each
                    # component stays far below 2^24, so the pair
                    # survives the exact-f32 output transpose at ANY
                    # scene scale (a flat slot id overflowed past 16.7M
                    # slots).  Instanced: block = the EXPANDED L1
                    # (off = child*K2 + lane) so callers recover
                    # (instance, slot) via the src/base tables; plain
                    # scenes record the physical L2 block
                    blk_val = b1 if instanced else base + gj
                    off_base = gj * K2 if instanced else 0
                    best_blk = jnp.where(better,
                                         jnp.asarray(blk_val,
                                                     jnp.float32),
                                         best_blk)
                    best_off = jnp.where(better,
                                         kc.itof_exact(off_base + kbest),
                                         best_off)
                    if amask == 2 and solid is not None:
                        # definite occlusion: collapse like any-hit
                        # (t = 0 culls every remaining child/L1 for the
                        # ray); -2 marks "occluded, no candidate" for
                        # the caller.  A nearer mixed candidate cannot
                        # matter: nothing un-occludes a predicate.
                        best_t = jnp.where(solid, 0.0, best_t)
                        best_blk = jnp.where(solid, -2.0, best_blk)
                        best_off = jnp.where(solid, 0.0, best_off)
                if any_hit:
                    # collapse resolved rays mid-drain: a zero best_t
                    # culls every remaining child entry for that ray
                    best_t = jnp.where(best_blk >= 0.0, 0.0, best_t)
                if drain_cull:
                    # per-ray re-cull of the REMAINING children against
                    # the post-test best_t (the per-child analog of the
                    # L1-table recull, BVH.hpp:1129-1135) — children
                    # only already-finished rays wanted drop out
                    e_row = jnp.where(vis > 0.0, BIG_F32,
                                      child_entries(E, best_t))
                else:
                    e_row = er
                bestg, beste = pop(e_row)
                npop = jnp.asarray(1.0, jnp.float32)
                for _, ej in plist[1:]:
                    npop = npop + jnp.where(ej < BIG_F32 * 0.5, 1.0,
                                            0.0)
                return (bestg, beste, vis, e_row, best_t, best_blk,
                        best_off, nch + npop)

            (_, _, _, _, best_t, best_blk, best_off,
             nch) = jax.lax.while_loop(
                drain_cond, drain_body,
                (g0, eg0, jnp.zeros((1, TILE), jnp.float32), e_row0,
                 best_t, best_blk, best_off, nch))

            if any_hit:
                # a hit ray is DONE: collapsing its best_t to 0 stops it
                # entering children and lets recull drop its L1s (the
                # caller only consumes the hit flag, not t)
                best_t = jnp.where(best_blk >= 0.0, 0.0, best_t)
            return best_t, best_blk, best_off, nch

        def still_live(has_next, ne, best_t, best_blk, nl1):
            if any_hit:
                live = has_next & ~jnp.all(best_blk >= 0)
            else:
                # entryDist t-max culling (BVH.hpp:1129-1135) at tile
                # granularity
                live = has_next & (ne < jnp.max(best_t))
            if max_visits is not None:
                # multipass cap: stop after max_visits L1s; the frontier
                # outputs let the driver resume from the pending block
                live = live & (nl1 < float(max_visits))
            return live

        def body(carry):
            (b1, e1, slot, best_t, best_blk, best_off, _, nl1, nch,
             cnt) = carry
            nl1 = nl1 + 1.0

            if use_recull:
                @pl.when(cnt >= recull_every)
                def _():
                    recull(best_t)

                cnt = jnp.where(cnt >= recull_every, 0, cnt + 1)
            # select + prefetch the NEXT L1's group row while this L1
            # is processed (double buffered)
            nb, ne = select()
            has_next = ne < BIG_F32 * 0.5

            @pl.when(has_next)
            def _():
                dma_tris(1 - slot, nb).start()

            best_t, best_blk, best_off, nch = visit_core(
                b1, slot, best_t, best_blk, best_off, nch)
            live = still_live(has_next, ne, best_t, best_blk, nl1)
            if not pair:
                @pl.when(has_next & ~live)
                def _():
                    dma_tris(1 - slot, nb).wait()

                return (nb, ne, 1 - slot, best_t, best_blk, best_off,
                        live, nl1, nch, cnt)

            # ---- speculative SECOND visit in the same loop iteration:
            # halves the while-loop's vector->scalar->branch syncs per
            # visit.  The second visit consumes the row just prefetched
            # (1-slot) and prefetches its own successor back into
            # `slot`, so the carry's slot parity is UNCHANGED per body.
            # When the walk should have ended after visit 1 (live is
            # False) the second visit still executes but under a
            # sub-epsilon gate bound — a no-op on the carry; its select
            # pops a block the exiting walk would never visit anyway
            # (front-to-back: its entry cannot beat any ray's best).
            live1 = live
            nb2, ne2 = select()
            has_next2 = ne2 < BIG_F32 * 0.5
            started2 = live1 & has_next2

            @pl.when(started2)
            def _():
                dma_tris(slot, nb2).start()

            nl1 = nl1 + jnp.where(live1, 1.0, 0.0)
            best_t, best_blk, best_off, nch = visit_core(
                nb, 1 - slot, best_t, best_blk, best_off, nch,
                gate=live1, wait_gate=has_next)
            live_out = live1 & still_live(has_next2, ne2, best_t,
                                          best_blk, nl1)

            @pl.when(started2 & ~live_out)
            def _():
                dma_tris(slot, nb2).wait()

            return (nb2, ne2, slot, best_t, best_blk, best_off,
                    live_out, nl1, nch, cnt)

        # ---- resident-window walk (window > 1) -----------------------
        def window_walk(best_t0, best_blk0, best_off0):
            W4 = window
            wiota = (jax.lax.broadcasted_iota(jnp.int32, (W4, 128), 0)
                     * 128
                     + jax.lax.broadcasted_iota(jnp.int32, (W4, 128), 1))

            def sel_window():
                bs, es = [], []
                for _ in range(W4):
                    b1, e1 = select()
                    bs.append(b1)
                    es.append(e1)
                return tuple(bs), tuple(es)

            def start_dmas(buf, bs, es):
                for j in range(W4):
                    @pl.when(es[j] < BIG_F32 * 0.5)
                    def _(j=j):
                        dma_tris(buf * W4 + j, bs[j]).start()

            def wait_dmas(buf, bs, es):
                for j in range(W4):
                    @pl.when(es[j] < BIG_F32 * 0.5)
                    def _(j=j):
                        dma_tris(buf * W4 + j, bs[j]).wait()

            def pick(vals, slot):
                """Scalar-indexed select over a python list (per-popped-
                child ray-set / base selection; W4 <= 4 keeps this a
                two-level where)."""
                if len(vals) == 1:
                    return vals[0]
                if len(vals) == 2:
                    return jnp.where(slot == 0, vals[0], vals[1])
                lo = jnp.where(slot == 0, vals[0], vals[1])
                hi = jnp.where(slot == 2, vals[2],
                               vals[3 % len(vals)])
                return jnp.where(slot < 2, lo, hi)

            def drain_window(buf, bs, es, best_t, best_blk, best_off,
                             nch):
                rays_s = [rays_for(bs[j]) for j in range(W4)] \
                    if instanced else [
                        (ox, oy, oz, dx, dy, dz, ix, iy, iz)] * W4
                bases = [base_ref[0, src_of(bs[j])] for j in range(W4)]

                def child_matrix(j, bt):
                    oxs, oys, ozs, dxs, dys, dzs, ixs, iys, izs = \
                        rays_s[j]

                    def brow(kk):
                        return scratch[buf * W4 + j, pl.ds(kk, 1),
                                       pl.ds(G * K2, 128)]
                    u0 = (brow(0) - oxs) * ixs
                    u1 = (brow(3) - oxs) * ixs
                    tn = jnp.minimum(u0, u1)
                    tf = jnp.maximum(u0, u1)
                    u0 = (brow(1) - oys) * iys
                    u1 = (brow(4) - oys) * iys
                    tn = jnp.maximum(tn, jnp.minimum(u0, u1))
                    tf = jnp.minimum(tf, jnp.maximum(u0, u1))
                    u0 = (brow(2) - ozs) * izs
                    u1 = (brow(5) - ozs) * izs
                    tn = jnp.maximum(jnp.maximum(tn,
                                                 jnp.minimum(u0, u1)),
                                     SHADOW_EPS)
                    tf = jnp.minimum(jnp.minimum(tf,
                                                 jnp.maximum(u0, u1)),
                                     bt)
                    return jnp.where(tn <= tf, tn, BIG_F32)

                # per-slot entry matrices, gated: an empty slot (entry
                # BIG) slabs against a sub-epsilon bound -> all BIG
                Es = [child_matrix(j, jnp.where(es[j] < BIG_F32 * 0.5,
                                                best_t,
                                                SHADOW_EPS * 0.25))
                      for j in range(W4)]
                e_mat = jnp.concatenate(
                    [jnp.min(E, axis=0, keepdims=True) for E in Es], 0)

                def pop(e):
                    beste = jnp.min(e)
                    bestg = jnp.min(jnp.where(e <= beste, wiota,
                                              jnp.int32(1 << 30)))
                    return bestg, beste

                g0, eg0 = pop(e_mat)

                def d_cond(c):
                    return c[1] < BIG_F32 * 0.5

                def d_body(c):
                    (bestg, beste0, vis, e_mat, best_t, best_blk,
                     best_off, nch) = c
                    plist = [(bestg, beste0)]
                    er = jnp.where(wiota == bestg, BIG_F32, e_mat)
                    for _ in range(1, pops):
                        gj, ej = pop(er)
                        gj = jnp.where(ej < BIG_F32 * 0.5, gj, bestg)
                        plist.append((gj, ej))
                        er = jnp.where(wiota == gj, BIG_F32, er)
                    bt0 = best_t
                    tested = []
                    for gj, _ in plist:
                        slot_j = jax.lax.shift_right_logical(gj, 7)
                        lane_j = jnp.bitwise_and(gj, 127)
                        col0 = pl.multiple_of(lane_j * K2, 128)

                        def row(i, slot_j=slot_j, col0=col0):
                            return scratch[buf * W4 + slot_j,
                                           pl.ds(i, 1),
                                           pl.ds(col0, K2)]
                        if instanced:
                            rj = tuple(
                                pick([rays_s[s][c] for s in
                                      range(W4)], slot_j)
                                for c in range(6))
                        else:
                            rj = (ox, oy, oz, dx, dy, dz)
                        if amask:
                            t, uu, vv = kc.moller_trumbore(
                                row, rj, rtime, motion, bt0,
                                with_uv=True)
                            opq, mix = kc.alpha_cell_bits(row, uu, vv)
                            hitm = t < BIG_F32 * 0.5
                            if amask == 1:
                                t = jnp.where(hitm & ~(opq | mix),
                                              BIG_F32, t)
                                solid = None
                            else:
                                solid = jnp.min(
                                    jnp.where(hitm & opq, t, BIG_F32),
                                    axis=1,
                                    keepdims=True) < BIG_F32 * 0.5
                                t = jnp.where(hitm & mix, t, BIG_F32)
                        else:
                            t = kc.moller_trumbore(row, rj, rtime,
                                                   motion, bt0)
                            solid = None
                        kbest = jnp.argmin(t, axis=1)[:, None]
                        tbest = jnp.min(t, axis=1, keepdims=True)
                        tested.append((gj, slot_j, lane_j, tbest,
                                       kbest, solid))
                        vis = jnp.where(wiota == gj, 1.0, vis)

                    for gj, slot_j, lane_j, tbest, kbest, solid \
                            in tested:
                        better = tbest < best_t
                        best_t = jnp.where(better, tbest, best_t)
                        if instanced:
                            blk_val = pick(list(bs), slot_j)
                            off_base = lane_j * K2
                        else:
                            blk_val = pick(bases, slot_j) + lane_j
                            off_base = 0
                        best_blk = jnp.where(
                            better,
                            jnp.asarray(blk_val, jnp.float32),
                            best_blk)
                        best_off = jnp.where(
                            better, kc.itof_exact(off_base + kbest),
                            best_off)
                        if amask == 2 and solid is not None:
                            best_t = jnp.where(solid, 0.0, best_t)
                            best_blk = jnp.where(solid, -2.0, best_blk)
                            best_off = jnp.where(solid, 0.0, best_off)
                    if any_hit:
                        best_t = jnp.where(best_blk >= 0.0, 0.0,
                                           best_t)
                    # re-cull remaining candidates vs the merged best
                    e_mat = jnp.where(
                        vis > 0.0, BIG_F32,
                        jnp.concatenate(
                            [jnp.min(jnp.where(E <= best_t, E,
                                               BIG_F32),
                                     axis=0, keepdims=True)
                             for E in Es], 0))
                    bestg, beste = pop(e_mat)
                    npop = jnp.asarray(1.0, jnp.float32)
                    for _, ej in plist[1:]:
                        npop = npop + jnp.where(ej < BIG_F32 * 0.5,
                                                1.0, 0.0)
                    return (bestg, beste, vis, e_mat, best_t,
                            best_blk, best_off, nch + npop)

                (_, _, _, _, best_t, best_blk, best_off,
                 nch) = jax.lax.while_loop(
                    d_cond, d_body,
                    (g0, eg0, jnp.zeros((W4, 128), jnp.float32), e_mat,
                     best_t, best_blk, best_off, nch))
                if any_hit:
                    best_t = jnp.where(best_blk >= 0.0, 0.0, best_t)
                return best_t, best_blk, best_off, nch

            bs0, es0 = sel_window()
            live0 = es0[0] < BIG_F32 * 0.5
            start_dmas(0, bs0, es0)
            zero = jnp.asarray(0.0, jnp.float32)

            def w_cond(c):
                return c[2 * W4]

            def w_body(c):
                bs = c[0:W4]
                es = c[W4:2 * W4]
                (_, buf, best_t, best_blk, best_off, nl1, nch,
                 cnt) = c[2 * W4:]
                if use_recull:
                    @pl.when(cnt >= recull_every)
                    def _():
                        recull(best_t)

                    cnt = jnp.where(cnt >= recull_every, 0, cnt + 1)
                bs2, es2 = sel_window()
                started2 = es2[0] < BIG_F32 * 0.5
                start_dmas(1 - buf, bs2, es2)
                wait_dmas(buf, bs, es)
                nv = zero
                for j in range(W4):
                    nv = nv + jnp.where(es[j] < BIG_F32 * 0.5, 1.0,
                                        0.0)
                best_t, best_blk, best_off, nch = drain_window(
                    buf, bs, es, best_t, best_blk, best_off, nch)
                nl1 = nl1 + nv
                if any_hit:
                    live = started2 & ~jnp.all(best_blk >= 0)
                else:
                    live = started2 & (es2[0] < jnp.max(best_t))

                @pl.when(started2 & ~live)
                def _():
                    wait_dmas(1 - buf, bs2, es2)

                return bs2 + es2 + (live, 1 - buf, best_t, best_blk,
                                    best_off, nl1, nch, cnt)

            out = jax.lax.while_loop(
                w_cond, w_body,
                bs0 + es0 + (live0, jnp.asarray(0, jnp.int32), best_t0,
                             best_blk0, best_off0, zero, zero,
                             jnp.asarray(1, jnp.int32)))
            (_, _, best_t, best_blk, best_off, nl1, nch,
             _) = out[2 * W4:]
            return best_t, best_blk, best_off, nl1, nch

        best_t0 = tmax
        best_blk0 = jnp.full((TILE, 1), -1.0, jnp.float32)
        best_off0 = jnp.zeros((TILE, 1), jnp.float32)
        if window > 1:
            best_t, best_blk, best_off, nl1, nch = window_walk(
                best_t0, best_blk0, best_off0)
            b1f = jnp.asarray(0, jnp.int32)
            e1f = jnp.asarray(BIG_F32, jnp.float32)
        else:
            b0, e0 = select()
            live0 = e0 < BIG_F32 * 0.5

            @pl.when(live0)
            def _():
                dma_tris(0, b0).start()

            zero = jnp.asarray(0.0, jnp.float32)
            (b1f, e1f, _, best_t, best_blk, best_off, _, nl1, nch,
             _) = jax.lax.while_loop(
                lambda c: c[6], body,
                (b0, e0, jnp.asarray(0, jnp.int32), best_t0, best_blk0,
                 best_off0, live0, zero, zero, jnp.asarray(1, jnp.int32)))
        out_t_ref[0, pl.ds(tt, 1), :] = to_row(best_t)
        # each pair component stays far below 2^24, so both ride the
        # f32 transpose exactly at any scene scale
        out_blk_ref[0, pl.ds(tt, 1), :] = to_row(best_blk)
        out_off_ref[0, pl.ds(tt, 1), :] = to_row(best_off)
        if frontier:
            # per-ray frontier: the nearest block this tile's walk did
            # NOT consume whose entry still beats the ray's best — the
            # multipass driver's resume point.  Popped and re-cull-
            # dropped columns have ecol == BIG; dropped entries are
            # >= best_t for every ray (recull invariant + best_t
            # monotone), so the e < best_t filter keeps them out of
            # the frontier either way.
            def fr_chunk(c, st):
                en, bn = st
                e = etab_ref[:, pl.ds(c * 128, 128)]       # [128,128]
                open_col = ecol_ref[pl.ds(c, 1), :] < BIG_F32 * 0.5
                e = jnp.where(open_col & (e < best_t), e, BIG_F32)
                emin = jnp.min(e, axis=1, keepdims=True)   # [128,1]
                idx = jnp.min(jnp.where(e <= emin,
                                        lane_row + c * 128,
                                        jnp.int32(1 << 30)),
                              axis=1, keepdims=True)
                upd = emin < en
                return (jnp.where(upd, emin, en),
                        jnp.where(upd, idx, bn))

            e_next, b_next = jax.lax.fori_loop(
                0, R, fr_chunk,
                (jnp.full((TILE, 1), BIG_F32, jnp.float32),
                 jnp.zeros((TILE, 1), jnp.int32)))
            # the final selected-but-undrained block (the loop exit
            # pops it from ecol without testing it): fold its per-ray
            # entries back into the frontier.  When the exit was an
            # empty table (e1f == BIG) b1f is a bogus all-BIG pop —
            # gate it out or its STALE etab entries (etab is never
            # rewritten on pop) would resurrect a tested block.
            # (Single-lane dynamic slices of the lane dim don't lower
            # in Mosaic — read the aligned 128-chunk and lane-select.)
            cpend = pl.multiple_of((b1f >> 7) * 128, 128)
            e_pc = etab_ref[:, pl.ds(cpend, 128)]          # [128,128]
            e_p = jnp.min(jnp.where(lane_row == (b1f & 127), e_pc,
                                    BIG_F32), axis=1, keepdims=True)
            e_p = jnp.where((e1f < BIG_F32 * 0.5) & (e_p < best_t),
                            e_p, BIG_F32)
            upd = e_p < e_next
            e_next = jnp.where(upd, e_p, e_next)
            b_next = jnp.where(upd, b1f, b_next)
            out_en_ref[0, pl.ds(tt, 1), :] = to_row(e_next)
            out_bn_ref[0, pl.ds(tt, 1), :] = to_row(
                kc.itof_exact(b_next))
        if counters:
            out_cnt_ref[0, pl.ds(tt, 1), :] = jnp.where(
                lane_row == 0, nl1, jnp.where(lane_row == 1, nch, 0.0))
        return 0

    jax.lax.fori_loop(0, TPS, run_tile, 0)


@functools.partial(jax.jit, static_argnames=("k2", "any_hit", "g",
                                             "counters",
                                             "recull_every",
                                             "drain_cull",
                                             "max_visits", "frontier",
                                             "pops", "pair", "amask",
                                             "window"))
def pallas_tri_intersect2(scene, origin, direction, t_max, k2: int,
                          any_hit: bool = False, time=None,
                          g: int = G_DEFAULT, counters: bool = False,
                          recull_every: int = RECULL_EVERY,
                          drain_cull: bool = True,
                          max_visits: int | None = None,
                          frontier: bool = False,
                          pops: int = 1,
                          pair: bool = False,
                          amask: int = 0,
                          window: int | None = None):
    """Two-level closest/any hit.  Same contract as pallas_tri_intersect.

    window: resident-window drain width (None = 1; PT_WINDOW / explicit
    arg enables).  Measured on the 10.5M-tri faithful tables (v5e,
    within-run, 2026-08-21): window=4/pops=4 is 1.21x on UNBOUNDED
    synthetic bounce dispatches (91.5 vs 110.7 ms/64K; coherent 70.9 vs
    85.3) — one drain-loop sync amortizes over 4 L1s' candidates
    instead of ~1.1 iterations per visit — but e2e frame NEUTRAL
    (0.983x): production dispatches are bounded/short (opaque-bounded
    alpha passes, any-hit collapse, recull) and the window drains 4 L1s
    past the point where the single-visit walk exits, cancelling the
    amortization.  Kept as an exact, tested knob for long-walk
    workloads; pops=8/16 at window=4 measured WORSE (stale-entry
    duplicate tests); pair/frontier/multipass incompatible (asserted).

    max_visits caps each tile's L1 walk; frontier adds per-ray resume
    state {e_next, b_next} to the result — the entry distance and id of
    the nearest block the capped walk did not consume that could still
    beat the ray's best hit (BIG/0 when the ray is fully resolved).
    Together they let scene.intersect's MULTIPASS driver re-sort
    unresolved rays by b_next between short kernel passes so every
    pass's 128-ray tiles agree on the blocks they need."""
    n = origin.shape[0]
    assert n % TILE == 0, n
    m1 = scene["pk_blk_lo"].shape[0]
    m1pad = -(-m1 // 128) * 128
    motion = time is not None
    instanced = "pk_blk_src" in scene
    # hit records are a (block, offset) PAIR of f32 lanes, each of which
    # must survive the exact-f32 output transpose (< 2^24).  blk is the
    # expanded L1 (instanced) or the physical L2 block; off < G*K2.
    # Splitting the old flat slot id into the pair lifted its 16.7M-slot
    # scene-size cap — both components are tiny at any realistic scale,
    # but guard loudly rather than round silently
    max_blk = m1 if instanced else scene["pk_slot2tri"].shape[0] // k2
    assert max_blk < (1 << 24) and g * k2 < (1 << 24), \
        "hit-record slot ids exceed exact-f32 range (2^24)"

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

    # lane-major L1 box table [8, M1pad]: components in sublanes, blocks
    # in lanes (the layout the in-kernel entry phase consumes densely)
    l1boxT = jnp.concatenate(
        [scene["pk_blk_lo"].T, scene["pk_blk_hi"].T,
         jnp.zeros((2, m1), jnp.float32)], 0)              # [8, M1]
    l1boxT = jnp.pad(l1boxT, ((0, 0), (0, m1pad - m1)))

    ray_spec = pl.BlockSpec((1, TPS, TILE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    G = g
    # the re-cull's per-ray entry table is [128, m1pad] f32 VMEM: cap it
    # so giant scenes (>=16K superblocks ~ 8MB) keep their VMEM headroom.
    # A sentinel-large cadence disables the machinery entirely (no table
    # allocation or per-chunk stores), giving A/B tools a true baseline.
    use_recull = m1pad <= RECULL_MAX_M1PAD and recull_every < (1 << 29)
    if frontier:
        assert use_recull, \
            "frontier outputs need the per-ray entry table (use_recull)"
    if pair:
        # the speculative second visit pops blocks past the exit point
        # and does not count capped visits exactly — both fine for the
        # production exact walk, wrong for multipass/frontier resume
        assert max_visits is None and not frontier, \
            "pair visits are incompatible with multipass/frontier"
    if amask:
        # mode 1 is a closest-pass filter; mode 2 is its own predicate
        # walk (collapse on opaque) — a plain any_hit would wrongly
        # treat mixed candidates as definite occluders.  Masks share
        # rows 9..11 with motion velocities: mutually exclusive.
        assert not any_hit and not motion and amask in (1, 2), \
            (amask, any_hit, motion)
    if window is None:
        window = 1
    if window > 1:
        assert not pair and not frontier and max_visits is None, \
            "window walk is incompatible with pair/frontier/multipass"
        assert window in (2, 4), window
        # recull cadence is counted per WINDOW there: keep the same
        # per-visit cadence
        recull_every = max(1, recull_every // window)
    kernel = functools.partial(_kernel2, k2=k2, n_l1=m1, any_hit=any_hit,
                               g=g, instanced=instanced, motion=motion,
                               counters=counters, use_recull=use_recull,
                               recull_every=recull_every,
                               drain_cull=drain_cull,
                               max_visits=max_visits, frontier=frontier,
                               pops=pops, pair=pair, amask=amask,
                               window=window)
    interpret = jax.default_backend() != "tpu"
    shp = (groups, TPS, TILE)

    def shared(shape):
        # grid-invariant tables: every step maps to block (0, 0, ...)
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.SMEM)

    n_phys = scene["pk_l1_base"].shape[0]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + [ray_spec] * 7 + [
        pl.BlockSpec(memory_space=pl.ANY),    # group rows in HBM
        shared((1, n_phys))]                  # physical L1 -> first block
    operands = [l1boxT,
                ox.reshape(shp), oy.reshape(shp), oz.reshape(shp),
                dx.reshape(shp), dy.reshape(shp), dz.reshape(shp),
                t_max.reshape(shp),
                scene["pk_tri"],
                scene["pk_l1_base"].reshape(1, n_phys)]
    if instanced:
        ninst = scene["pk_inst_inv"].shape[0]
        # instance tables FLAT [1, ninst*k]: an SMEM window pads the
        # minor dim to 128 lanes, so [ninst, 12] would cost ninst*512 B
        # of SMEM (2500 foliage instances = 1.28 MB > the 1 MB budget)
        in_specs += [shared((1, m1)), shared((1, m1)),
                     shared((1, ninst * 12))]
        operands += [scene["pk_blk_src"].reshape(1, m1),
                     scene["pk_blk_inst"].reshape(1, m1),
                     scene["pk_inst_inv"].reshape(1, ninst * 12)]
        if motion:
            in_specs += [shared((1, ninst * 3))]
            operands += [scene["pk_inst_velo"].reshape(1, ninst * 3)]
    if motion:
        in_specs += [ray_spec]
        operands += [jnp.asarray(time, jnp.float32).reshape(shp)]
    n_out = 3 + 2 * bool(frontier) + bool(counters)
    out_specs = [ray_spec] * n_out
    out_shape = [jax.ShapeDtypeStruct(shp, jnp.float32)] * n_out
    outs = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(groups,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2 * window, 16, G * k2 + 128),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((2 * window,)),
                        pltpu.VMEM((m1pad // 128, 128), jnp.float32)]
                       + ([pltpu.VMEM((TILE, m1pad), jnp.float32)]
                          if use_recull else [])
                       + [pltpu.VMEM((8, m1pad), jnp.float32),
                          pltpu.SemaphoreType.DMA(())],
    )(*operands)
    t = outs[0].reshape(n2)[:n]
    blk = outs[1].astype(jnp.int32).reshape(n2)[:n]
    off = outs[2].astype(jnp.int32).reshape(n2)[:n]
    valid = blk >= 0
    blk_c = jnp.clip(blk, 0)
    if instanced:
        # blk = expanded L1, off = child*K2 + lane within it: recover
        # (instance, physical slot) through the expansion/base tables
        src = scene["pk_blk_src"][blk_c]
        inst = jnp.where(valid, scene["pk_blk_inst"][blk_c], -1)
        tri = jnp.where(
            valid,
            scene["pk_slot2tri"][scene["pk_l1_base"][src] * k2 + off], -1)
    else:
        # blk = physical L2 block, off = lane within it
        inst = jnp.full((n,), -1, jnp.int32)
        tri = jnp.where(valid,
                        scene["pk_slot2tri"][blk_c * k2 + off], -1)
    valid = valid & (tri >= 0)
    inst = jnp.where(valid, inst, -1)
    res = dict(t=jnp.where(valid, t, BIG_F32), tri=tri, inst=inst,
               valid=valid)
    if amask == 2:
        # definite in-kernel occlusion (opaque-cell hit): no candidate
        # to report, the predicate is already decided for these lanes
        res["solid"] = blk == -2
    if frontier:
        res["e_next"] = outs[3].reshape(n2)[:n]
        res["b_next"] = outs[4].astype(jnp.int32).reshape(n2)[:n]
    if counters:
        cnt = outs[3 + 2 * bool(frontier)].reshape(-1, TILE)
        res["n_l1_visited"] = cnt[:, 0]
        res["n_children_tested"] = cnt[:, 1]
    return res
