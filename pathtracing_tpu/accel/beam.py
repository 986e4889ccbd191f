"""Beam traversal: TPU-native two-phase BVH ("block BVH").

Why not a per-ray stack?  The first traversal design (traverse.py) keeps a
[N, S] stack per ray and pops one node per while_loop step — measured at
~0.01 Mray/s on a v5e: per-lane dynamic scatter into the stack lowers to a
sort-based scatter every iteration, and the loop runs until the WORST lane
finishes (full-batch lockstep divergence).  The reference's recursive
SSE/AVX stack (BVH.hpp:1111-1211) simply has no efficient lockstep analog.

The TPU-native shape of the problem (this module):

  * the SAH builder's leaf order is spatially coherent, so consecutive
    runs of K prims make good "blocks"; block AABBs form a flat M-entry
    top level (a BVH cut, like the reference's TLAS over BLASes);
  * phase 1: every ray slab-tests ALL M block boxes as one dense [N, M]
    VPU op — no gathers, boxes broadcast from VMEM; entries are argsorted
    once per ray (front-to-back order, replacing stack ordering);
  * phase 2: a short while_loop walks each ray's sorted block list B
    blocks at a time, gathering B*K *contiguous* primitives and testing
    them densely; a lane stops when the next block's entry distance
    exceeds its best hit — the same t-max culling as the reference's
    entryDist stack, amortized over blocks instead of nodes.
  * all geometry math is scalarized over xyz: shapes stay [N] / [N, B*K]
    so the 128-lane axis is rays/prims, never the 3-vector.

Fixed iteration counts, dense compute, zero scatters.  ~100x the stack
traversal on incoherent rays; scales to ~1M prims with M<=8192 (two-level
beams extend this; see plan in SURVEY.md §7).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.math import BIG_F32, SHADOW_EPS
from ..scene.types import SHAPE_TRI, SHAPE_SPH, SHAPE_QUAD

BEAM_B = 1        # blocks tested per while_loop step


# ---------------------------------------------------------------------------
# Build: cut the SAH binary tree into blocks (host side, NumPy)
# ---------------------------------------------------------------------------

def pick_block_k(n_prims: int) -> int:
    """Balance phase-1 (M block tests) vs phase-2 (B*K prim tests/step):
    M ~ sqrt(2n), K = n/M, rounded to multiples of 8, M capped at 4096."""
    m = int(np.clip(2 ** int(np.ceil(np.log2(max(np.sqrt(2.0 * n_prims),
                                                 1.0)))), 64, 4096))
    k = -(-n_prims // m)
    return max(8, -(-k // 8) * 8)


def build_blocks(lo, hi, kinds, idxs, order, block_k: int | None = None):
    """Group the SAH-ordered prims into blocks of block_k.
    Returns (dict of arrays, M):
      blk_lo/hi [M, 3]   block bounds
      blk_base  [M]      first prim (in BVH order) of each block
      blk_k     [1]      prims per block (static; also in the arrays for
                         save/load round-trips)
      prim_*    [P_pad]  BVH-ordered prim tables padded to M*K
    """
    n = len(order)
    k = block_k or pick_block_k(n)
    m = -(-n // k)
    pad = m * k - n
    ord_pad = np.concatenate([order, np.repeat(order[-1:], pad)])
    plo = lo[ord_pad].reshape(m, k, 3)
    phi = hi[ord_pad].reshape(m, k, 3)
    blk_lo = plo.min(1)
    blk_hi = phi.max(1)
    kind_pad = kinds[ord_pad].astype(np.int32)
    idx_pad = idxs[ord_pad].astype(np.int32)
    # mask padding by kind=-1 so duplicated prims don't double count
    if pad:
        kind_pad[n:] = -1
    return dict(
        blk_lo=blk_lo.astype(np.float32), blk_hi=blk_hi.astype(np.float32),
        blk_base=(np.arange(m, dtype=np.int32) * k),
        blk_k=np.asarray([k], np.int32),
        prim_kind=kind_pad, prim_idx=idx_pad), m


# ---------------------------------------------------------------------------
# Scalarized primitive tests: [N, C] shapes, xyz unrolled
#
# Geometry is gathered from component-FIRST tables ([9, T] / [4, S] /
# [16, Q]) so every gather result is [N, C] with the large C axis last.
# Gathering [N, C, 3, 3] slabs instead would be padded by the TPU tiled
# layout (3 -> lane dim 128) into ~57x the memory traffic — measured as an
# OOM at 2^16 rays x 160-prim beams.
# ---------------------------------------------------------------------------

def beam_tables(tri_v=None, sph_c=None, sph_r=None, quad_q=None,
                quad_u=None, quad_v=None, quad_n=None, quad_d=None,
                quad_w=None):
    """Precompute scalarized geometry tables for the beam kernel.
    Host-side NumPy; returns dict of scene arrays."""
    if tri_v is not None and len(tri_v):
        tv = np.asarray(tri_v, np.float32)
        v0 = tv[:, 0]
        e1 = tv[:, 1] - v0
        e2 = tv[:, 2] - v0
        tri9 = np.concatenate([v0.T, e1.T, e2.T], 0)       # [9, T]
    else:
        tri9 = np.zeros((9, 1), np.float32)
    if sph_c is not None and len(sph_c):
        sph4 = np.concatenate([np.asarray(sph_c, np.float32).T,
                               np.asarray(sph_r, np.float32)[None]], 0)
    else:
        sph4 = np.zeros((4, 1), np.float32)
    if quad_q is not None and len(quad_q):
        quad16 = np.concatenate(
            [np.asarray(quad_n, np.float32).T,
             np.asarray(quad_d, np.float32)[None],
             np.asarray(quad_q, np.float32).T,
             np.asarray(quad_u, np.float32).T,
             np.asarray(quad_v, np.float32).T,
             np.asarray(quad_w, np.float32).T], 0)          # [16, Q]
    else:
        quad16 = np.zeros((16, 1), np.float32)
    return dict(beam_tri=tri9.copy(), beam_sph=sph4.copy(),
                beam_quad=quad16.copy())


def _tri_block(scene, ox, oy, oz, dx, dy, dz, idx):
    """Möller–Trumbore on gathered triangles, scalar xyz."""
    ti = jnp.clip(idx, 0, scene["beam_tri"].shape[1] - 1)
    g = scene["beam_tri"][:, ti]                # [9, N, C]
    ax, ay, az = g[0], g[1], g[2]
    e1x, e1y, e1z = g[3], g[4], g[5]
    e2x, e2y, e2z = g[6], g[7], g[8]
    # h = d x e2
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    det = e1x * hx + e1y * hy + e1z * hz
    near0 = jnp.abs(det) < 1e-9
    inv_det = 1.0 / jnp.where(near0, 1.0, det)
    sx = ox - ax
    sy = oy - ay
    sz = oz - az
    u = (sx * hx + sy * hy + sz * hz) * inv_det
    # q = s x e1
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (~near0 & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1))
    return t, ok


def _sph_block(scene, ox, oy, oz, dx, dy, dz, tmn, idx):
    si = jnp.clip(idx, 0, scene["beam_sph"].shape[1] - 1)
    gs = scene["beam_sph"][:, si]               # [4, N, C]
    cx, cy, cz, r = gs[0], gs[1], gs[2], gs[3]
    ocx = ox - cx
    ocy = oy - cy
    ocz = oz - cz
    a = (dx * dx + dy * dy + dz * dz)
    b = ocx * dx + ocy * dy + ocz * dz
    cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = b * b - a * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / a
    t1 = (-b + sq) / a
    t = jnp.where((disc > 0) & (t0 > tmn), t0, t1)
    return t, (disc > 0) & (t > tmn)


def _quad_block(scene, ox, oy, oz, dx, dy, dz, idx):
    qi = jnp.clip(idx, 0, scene["beam_quad"].shape[1] - 1)
    gq = scene["beam_quad"][:, qi]              # [16, N, C]
    nx, ny, nz, qd = gq[0], gq[1], gq[2], gq[3]
    ddn = dx * nx + dy * ny + dz * nz
    sgn = jnp.where(ddn > 0, -1.0, 1.0)
    nx, ny, nz, qd, ddn = nx * sgn, ny * sgn, nz * sgn, qd * sgn, ddn * sgn
    small = jnp.abs(ddn) < 1e-8
    t = (qd - (ox * nx + oy * ny + oz * nz)) / jnp.where(small, 1.0, ddn)
    px = ox + t * dx - gq[4]
    py = oy + t * dy - gq[5]
    pz = oz + t * dz - gq[6]
    ux, uy, uz = gq[7], gq[8], gq[9]
    vx, vy, vz = gq[10], gq[11], gq[12]
    wx, wy, wz = gq[13], gq[14], gq[15]
    # alpha = w . (p x v); beta = w . (u x p)
    alpha = wx * (py * vz - pz * vy) + wy * (pz * vx - px * vz) \
        + wz * (px * vy - py * vx)
    beta = wx * (uy * pz - uz * py) + wy * (uz * px - ux * pz) \
        + wz * (ux * py - uy * px)
    ok = (~small & (alpha >= 0) & (alpha <= 1) & (beta >= 0) & (beta <= 1))
    return t, ok


def _prim_test(scene, ox, oy, oz, dx, dy, dz, t_min, kind, idx,
               shapes=(True, True, True)):
    """Test prims (kind, idx) [N,C] against rays [N].  Returns (t, ok).
    shapes: static (has_tri, has_sph, has_quad) — absent shape types are
    skipped entirely so their tables aren't gathered for nothing."""
    tmn = t_min[:, None]
    has_tri, has_sph, has_quad = shapes
    t = jnp.full(kind.shape, BIG_F32)
    ok = jnp.zeros(kind.shape, bool)
    if has_tri:
        tt, okt = _tri_block(scene, ox, oy, oz, dx, dy, dz, idx)
        sel = kind == SHAPE_TRI
        t = jnp.where(sel, tt, t)
        ok = jnp.where(sel, okt, ok)
    if has_sph:
        ts, oks = _sph_block(scene, ox, oy, oz, dx, dy, dz, tmn, idx)
        sel = kind == SHAPE_SPH
        t = jnp.where(sel, ts, t)
        ok = jnp.where(sel, oks, ok)
    if has_quad:
        tq, okq = _quad_block(scene, ox, oy, oz, dx, dy, dz, idx)
        sel = kind == SHAPE_QUAD
        t = jnp.where(sel, tq, t)
        ok = jnp.where(sel, okq, ok)
    ok = ok & (kind >= 0) & (t >= tmn)
    return jnp.where(ok, t, BIG_F32), ok


# ---------------------------------------------------------------------------
# Traversal
# ---------------------------------------------------------------------------

def beam_intersect(scene, origin, direction, t_max, block_k: int,
                   t_min=None, any_hit: bool = False,
                   shapes=(True, True, True)):
    """Closest-hit (or any-hit) beam traversal.  Same contract as
    intersect(): dict(t, kind, idx, valid).  block_k must be the static
    prims-per-block the scene was built with (SceneMeta.block_k);
    shapes = static (has_tri, has_sph, has_quad)."""
    BLOCK_K = block_k
    n = origin.shape[0]
    m = scene["blk_lo"].shape[0]
    t_min = jnp.full((n,), SHADOW_EPS) if t_min is None else t_min
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
    dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]

    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < 1e-32,
                               jnp.where(c < 0, -1e-32, 1e-32), c)
    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    # ---- phase 1: dense [N, M] slab test against every block box
    blo = scene["blk_lo"]                      # [M,3]
    bhi = scene["blk_hi"]

    def axis_slab(lo_a, hi_a, o_a, inv_a):
        u0 = (lo_a[None, :] - o_a[:, None]) * inv_a[:, None]
        u1 = (hi_a[None, :] - o_a[:, None]) * inv_a[:, None]
        return jnp.minimum(u0, u1), jnp.maximum(u0, u1)

    n0, f0 = axis_slab(blo[:, 0], bhi[:, 0], ox, ix)
    n1, f1 = axis_slab(blo[:, 1], bhi[:, 1], oy, iy)
    n2, f2 = axis_slab(blo[:, 2], bhi[:, 2], oz, iz)
    tn = jnp.maximum(jnp.maximum(n0, n1),
                     jnp.maximum(n2, t_min[:, None]))
    tf = jnp.minimum(jnp.minimum(f0, f1),
                     jnp.minimum(f2, t_max[:, None]))
    entry = jnp.where(tn <= tf, tn, BIG_F32)   # [N, M]

    # front-to-back block order per ray (once, replaces stack ordering)
    order = jnp.argsort(entry, axis=1)         # [N, M]
    entry_sorted = jnp.take_along_axis(entry, order, 1)

    n_steps = -(-m // BEAM_B)
    lane = jnp.arange(n)

    state = dict(
        step=jnp.zeros((), jnp.int32),
        best_t=t_max,
        best_kind=jnp.full((n,), -1, jnp.int32),
        best_idx=jnp.zeros((n,), jnp.int32),
        live=jnp.ones((n,), bool),
    )

    def cond(st):
        return (st["step"] < n_steps) & jnp.any(st["live"])

    def body(st):
        s0 = st["step"] * BEAM_B
        blocks = jax.lax.dynamic_slice_in_dim(order, s0, BEAM_B, axis=1)
        ents = jax.lax.dynamic_slice_in_dim(entry_sorted, s0, BEAM_B,
                                            axis=1)   # [N, B]
        # lanes whose nearest unprocessed block is beyond best_t are done
        live = st["live"] & (ents[:, 0] < st["best_t"])
        useful = ents < st["best_t"][:, None]          # per-block cull

        base = scene["blk_base"][blocks]               # [N, B]
        slot = jnp.arange(BLOCK_K, dtype=jnp.int32)
        pidx = (base[..., None] + slot).reshape(n, BEAM_B * BLOCK_K)
        pmask = jnp.repeat(useful & live[:, None], BLOCK_K, axis=1)
        pidx = jnp.clip(pidx, 0, scene["prim_kind"].shape[0] - 1)
        kind = jnp.where(pmask, scene["prim_kind"][pidx], -1)
        idx = scene["prim_idx"][pidx]

        t, ok = _prim_test(scene, ox[:, None], oy[:, None], oz[:, None],
                           dx[:, None], dy[:, None], dz[:, None],
                           t_min, kind, idx, shapes)
        t = jnp.where(t < st["best_t"][:, None], t, BIG_F32)
        j = jnp.argmin(t, axis=1)
        tj = t[lane, j]
        better = tj < st["best_t"]
        best_t = jnp.where(better, tj, st["best_t"])
        best_kind = jnp.where(better, kind[lane, j], st["best_kind"])
        best_idx = jnp.where(better, idx[lane, j], st["best_idx"])
        live = live & ~(jnp.zeros_like(better) if not any_hit else better)
        return dict(step=st["step"] + 1, best_t=best_t,
                    best_kind=best_kind, best_idx=best_idx, live=live)

    st = jax.lax.while_loop(cond, body, state)
    valid = st["best_kind"] >= 0
    return dict(t=jnp.where(valid, st["best_t"], BIG_F32),
                kind=st["best_kind"], idx=st["best_idx"], valid=valid)
