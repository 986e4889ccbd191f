"""Shared in-kernel building blocks for the Pallas traversal kernels.

Both traversal kernels (pallas_trace: single-level blocks; pallas_trace2:
two-level superblocks) are built from the same primitives in the same
RAYS-IN-SUBLANES layout:

  * an exact f32 transpose pair through an MXU identity matmul (scalar
    VMEM reads serialize the scalar pipeline; one [128,128] vector op
    replaces a 128-read chain),
  * a guarded direction reciprocal,
  * a vectorized 128-blocks-per-chunk slab entry phase writing a
    lane-major [R,128] tile-min table (+ optionally the full per-ray
    [128, mpad] table for re-culling),
  * a periodic per-ray interval re-cull of that table against each
    ray's current best hit,
  * an iota-argmin front-to-back selection pop,
  * the Moller-Trumbore inner product over [128 rays(sublanes),
    W prims(lanes)] read straight from the 16-row triangle tables,
  * the per-visited-block instance ray transform (TransformedPrimitive,
    reference Primitive.cpp:47-66).

Keeping them here keeps the two kernels in lock-step: a change to the
slab epsilon, the selection tie-break, or the re-cull rule lands in
both by construction.  Every function below is traced INSIDE a pallas
kernel; arguments named *_ref are VMEM/SMEM references.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math import BIG_F32, SHADOW_EPS

_MAGIC_2P23 = 8388608.0  # 2^23


def itof_exact(x):
    """Exact i32 -> f32 for 0 <= x < 2^24, without sitofp.

    Mosaic on this toolchain fails to legalize VECTOR int->float
    conversion ("failed to legalize operation 'arith.sitofp'" on
    vector<8x128xi32>), so hit-slot recording cannot use astype.
    Magic-number bitcast instead: OR each 16-bit half into the mantissa
    of 2^23 and subtract; both halves and their recombination are exact
    in f32 for x < 2^24 (the hit-record components are < 2^24 by
    design — see pallas_trace2.test_l2)."""
    x = x.astype(jnp.int32)
    lo = jnp.bitwise_and(x, 0xFFFF)
    hi = jnp.right_shift(x, 16)
    magic = jnp.int32(0x4B000000)
    flo = pltpu.bitcast(jnp.bitwise_or(lo, magic), jnp.float32)
    fhi = pltpu.bitcast(jnp.bitwise_or(hi, magic), jnp.float32)
    return (fhi - _MAGIC_2P23) * 65536.0 + (flo - _MAGIC_2P23)


def inv_guard(c):
    """1/c with the near-zero-component guard every slab test needs."""
    return 1.0 / jnp.where(jnp.abs(c) < 1e-32,
                           jnp.where(c < 0, -1e-32, 1e-32), c)


def make_transposes(tile: int):
    """(to_col, to_row): exact f32 [1,T]<->[T,1] transposes through an
    MXU identity dot_general (precision=HIGHEST: the bf16 3-pass split
    reconstructs x*1.0 exactly)."""
    ident = (jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
             ).astype(jnp.float32)

    def to_col(row):                                    # [1,T] -> [T,1]
        return jax.lax.dot_general(
            ident, row, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    def to_row(col):                                    # [T,1] -> [1,T]
        return jax.lax.dot_general(
            col, ident, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    return to_col, to_row


def lane_iotas(R: int):
    """(lane_row [1,128], flat_iota [R,128]) used by the entry/select
    phases."""
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    flat_iota = (jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
                 + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))
    return lane_row, flat_iota


def entry_phase(boxv_ref, ecol_ref, etab_ref, o, iv, tmax,
                n_blocks: int, R: int, lane_row, use_recull: bool):
    """Tile-min slab entry distance per block, 128 blocks per chunk.

    boxv_ref: [8, mpad] lane-major box table (lo xyz rows 0-2, hi rows
    3-5).  o/iv: ray origin / guarded inverse-direction column triples
    ([128,1] each).  Writes ecol_ref [R,128] (tile-min entries, BIG for
    padding lanes) and, when use_recull, the full per-ray table
    etab_ref [128, mpad]."""
    ox, oy, oz = o
    ix, iy, iz = iv

    def entry_chunk(c, _):
        def comp(k):
            return boxv_ref[pl.ds(k, 1), pl.ds(c * 128, 128)]  # [1,128]
        u0 = (comp(0) - ox) * ix                       # [128,128]
        u1 = (comp(3) - ox) * ix
        tn = jnp.minimum(u0, u1)
        tf = jnp.maximum(u0, u1)
        u0 = (comp(1) - oy) * iy
        u1 = (comp(4) - oy) * iy
        tn = jnp.maximum(tn, jnp.minimum(u0, u1))
        tf = jnp.minimum(tf, jnp.maximum(u0, u1))
        u0 = (comp(2) - oz) * iz
        u1 = (comp(5) - oz) * iz
        tn = jnp.maximum(jnp.maximum(tn, jnp.minimum(u0, u1)),
                         SHADOW_EPS)
        tf = jnp.minimum(jnp.minimum(tf, jnp.maximum(u0, u1)), tmax)
        e = jnp.where(tn <= tf, tn, BIG_F32)
        if use_recull:
            # full per-ray entry table kept for the periodic re-cull
            etab_ref[:, pl.ds(c * 128, 128)] = e
        emin = jnp.min(e, axis=0, keepdims=True)       # [1,128]
        emin = jnp.where(c * 128 + lane_row < n_blocks, emin, BIG_F32)
        ecol_ref[pl.ds(c, 1), :] = emin
        return 0

    jax.lax.fori_loop(0, R, entry_chunk, 0)


def make_recull(etab_ref, ecol_ref, R: int):
    """Per-ray interval culling (BVH.hpp:1129-1135 per-RAY, not
    per-tile): drop every block whose entry distance exceeds the
    CURRENT best hit of each ray that entered it.  The entry phase ran
    against the initial t_max, so without this a tile keeps visiting
    blocks that only already-finished rays wanted — on incoherent
    bounce tiles that is most of the visits (and one sky ray otherwise
    pins max(best_t) at BIG, disabling the tile-granularity exit)."""
    def recull(best_t):
        def chunk(c, _):
            e = etab_ref[:, pl.ds(c * 128, 128)]       # [128,128]
            emin = jnp.min(jnp.where(e < best_t, e, BIG_F32),
                           axis=0, keepdims=True)      # [1,128]
            old = ecol_ref[pl.ds(c, 1), :]
            # visited / padding lanes (already BIG) stay BIG; live
            # lanes take the raised still-needed-by-someone entry
            ecol_ref[pl.ds(c, 1), :] = jnp.where(
                (old >= BIG_F32 * 0.5) | (emin >= BIG_F32 * 0.5),
                BIG_F32, emin)
            return 0

        jax.lax.fori_loop(0, R, chunk, 0)

    return recull


def make_select(ecol_ref, flat_iota, lane_row):
    """Pop the nearest unvisited block from the lane-major entry table:
    full-lane min + first-match iota (front-to-back order)."""
    def select():
        e = ecol_ref[...]                              # [R,128]
        v = jnp.min(e)
        i = jnp.min(jnp.where(e <= v, flat_iota, jnp.int32(1 << 30)))
        r = i >> 7
        lane = i & 127
        row = ecol_ref[pl.ds(r, 1), :]
        ecol_ref[pl.ds(r, 1), :] = jnp.where(lane_row == lane,
                                             BIG_F32, row)
        return i, v

    return select


def instance_transform(inv_ref, inst, o, d):
    """Object-space ray for a visited instanced block: rows of the
    packed [1, n_inst*12] FLAT inverse-transform table applied to the
    origin (affine) and direction (linear), direction left unnormalized
    so t stays world-parameterized (TransformedPrimitive,
    Primitive.cpp:41-66).  inst: scalar instance id (callers pass
    max(inst, 0) and blend on inst >= 0).  The table is flat because an
    SMEM window pads the MINOR dim to 128 lanes: [n_inst, 12] costs
    n_inst*128*4 bytes of SMEM (2500 instances blew the 1MB budget);
    [1, n_inst*12] costs what it stores."""
    ox, oy, oz = o
    dx, dy, dz = d
    base = inst * 12
    m = [inv_ref[0, base + c] for c in range(12)]
    oxl = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
    oyl = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
    ozl = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
    dxl = m[0] * dx + m[1] * dy + m[2] * dz
    dyl = m[4] * dx + m[5] * dy + m[6] * dz
    dzl = m[8] * dx + m[9] * dy + m[10] * dz
    return (oxl, oyl, ozl), (dxl, dyl, dzl)


def moller_trumbore(row, rays, rtime, motion: bool, best_t,
                    with_uv: bool = False):
    """Moller-Trumbore over [128 rays(sublanes), W prims(lanes)].

    row(i): the i-th component row [1,W] of the 16-row triangle table
    (v0 xyz 0-2, e1 3-5, e2 6-8, velocity 9-11 when motion).  Returns
    the per-(ray, prim) hit distance t [128,W] with misses at BIG_F32
    (accepts t in [SHADOW_EPS, best_t)); with_uv also returns the
    barycentrics (u, v) — garbage on miss lanes, callers gate on t."""
    oxs, oys, ozs, dxs, dys, dzs = rays
    e1x, e1y, e1z = row(3), row(4), row(5)
    e2x, e2y, e2z = row(6), row(7), row(8)
    hx = dys * e2z - dzs * e2y                         # [128,W]
    hy = dzs * e2x - dxs * e2z
    hz = dxs * e2y - dys * e2x
    det = e1x * hx + e1y * hy + e1z * hz
    near0 = jnp.abs(det) < 1e-9
    inv_det = 1.0 / jnp.where(near0, 1.0, det)
    # moving prim at ray time == static prim hit from o - vel*time
    # (AnimatedPrimitive, Primitive.cpp:77-96)
    sx = oxs - row(0) - (row(9) * rtime if motion else 0.0)
    sy = oys - row(1) - (row(10) * rtime if motion else 0.0)
    sz = ozs - row(2) - (row(11) * rtime if motion else 0.0)
    u = (sx * hx + sy * hy + sz * hz) * inv_det
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = (dxs * qx + dys * qy + dzs * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (~near0 & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
          & (t >= SHADOW_EPS) & (t < best_t))
    t = jnp.where(ok, t, BIG_F32)
    if with_uv:
        return t, u, v
    return t


def alpha_cell_bits(row, u, v):
    """(definitely_opaque, mixed) bits at the hit's alpha-mask cell.

    Reads the per-triangle micro-mask rows the builders pack when
    meta.alpha_cull_mask is set (scene/alphamask.py — the in-traversal
    analog of the reference's alpha test, Primitive.cpp:6-14):
      rows 9..11: f32 words of two packed bf16 affine coefficients
                  (low half b_i, high half c_i) mapping barycentrics to
                  an 8x8 texture-space cell grid;
      rows 12..13 / 14..15: opaque / mixed bit planes, bit = cv*8+cu.
    Returns two boolean [128,W] arrays; only meaningful where the MT t
    is a hit (u, v are garbage on miss lanes — callers mask)."""
    b = []
    c = []
    for i in (9, 10, 11):
        w = pltpu.bitcast(row(i), jnp.int32)           # [1,W]
        b.append(pltpu.bitcast(jax.lax.shift_left(w, 16), jnp.float32))
        c.append(pltpu.bitcast(jnp.bitwise_and(w, jnp.int32(-65536)),
                               jnp.float32))
    gx = b[0] + b[1] * u + b[2] * v                    # [128,W]
    gy = c[0] + c[1] * u + c[2] * v
    cu = jnp.clip(jnp.floor(gx), 0.0, 7.0)
    cv = jnp.clip(jnp.floor(gy), 0.0, 7.0)
    magic = jnp.float32(_MAGIC_2P23)
    cui = jnp.bitwise_and(pltpu.bitcast(cu + magic, jnp.int32), 7)
    cvi = jnp.bitwise_and(pltpu.bitcast(cv + magic, jnp.int32), 7)
    cell = cvi * 8 + cui
    sh = jnp.bitwise_and(cell, 31)
    lo_half = cell < 32

    def bitplane(r0, r1):
        w0 = pltpu.bitcast(row(r0), jnp.int32)
        w1 = pltpu.bitcast(row(r1), jnp.int32)
        word = jnp.where(lo_half, w0, w1)
        return jnp.bitwise_and(jax.lax.shift_right_logical(word, sh),
                               1) > 0

    return bitplane(12, 13), bitplane(14, 15)
