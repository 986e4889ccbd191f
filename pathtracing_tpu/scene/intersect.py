"""Vectorized ray–scene intersection (brute-force backend).

The reference's hot path is recursive SIMD BVH traversal (BVH.hpp) calling
per-shape intersectors (Shape.cpp).  Here the per-shape math is vectorized
over rays × primitive-chunks with a `lax.scan` reduction — the correctness
backend every accelerator (JAX BVH, Pallas BVH) is tested against.

Shape kinds: 0 = triangle, 1 = sphere, 2 = quad (types.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import (SHADOW_EPS, BIG_F32, vdot, vdot_k, safe_normalize,
                         sphere_uv, onb_from_normal, onb_from_interaction,
                         to_world, offset_ray)
from .types import SHAPE_TRI, SHAPE_SPH, SHAPE_QUAD, SHAPE_ITRI, \
    ALPHA_OPAQUE, ALPHA_BLEND, ALPHA_MASK
from .textures import texture_eval, texture_alpha
from ..core.rng import hash_u32, uniform_from_u32

_CHUNK = 512


def _chunks(n: int):
    c = min(max(n, 1), _CHUNK)
    return c, -(-max(n, 1) // c)


# ---------------------------------------------------------------------------
# Per-shape batched intersection tests: rays [N,3] x prims [C,...] -> [N,C]
# ---------------------------------------------------------------------------

def _ray_origin_comps(o, vel, time):
    """Per-(ray, prim) effective origin components [N,C(|1)]: a prim
    moving at `vel` hit by a ray at `time` is the static prim hit from
    origin o - vel*time (AnimatedPrimitive re-wrap, Primitive.cpp:77-96).

    All hit tests below run on COMPONENT arrays ([N,1] ray x [1,C] prim
    broadcasts -> full-width [N,C] VPU ops); see the scalarized-math note
    in core/math.py — the [N,C,3] cross/dot forms pay minor-axis
    relayouts."""
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]          # [N,1]
    if vel is None or time is None:
        return ox, oy, oz
    tt = time[:, None]
    return (ox - vel[None, :, 0] * tt, oy - vel[None, :, 1] * tt,
            oz - vel[None, :, 2] * tt)


def _tri_hits(o, d, v0, v1, v2, t_min=SHADOW_EPS, vel=None, time=None):
    """Möller–Trumbore, two-sided (Shape.cpp:246-267). Returns (t, valid)."""
    e1 = v1 - v0          # [C,3]
    e2 = v2 - v0
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]          # [N,1]
    e1x, e1y, e1z = e1[None, :, 0], e1[None, :, 1], e1[None, :, 2]  # [1,C]
    e2x, e2y, e2z = e2[None, :, 0], e2[None, :, 1], e2[None, :, 2]
    hx = dy * e2z - dz * e2y                              # [N,C]
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    det = e1x * hx + e1y * hy + e1z * hz
    near_zero = jnp.abs(det) < 1e-9
    inv_det = 1.0 / jnp.where(near_zero, 1.0, det)
    ox, oy, oz = _ray_origin_comps(o, vel, time)
    sx = ox - v0[None, :, 0]
    sy = oy - v0[None, :, 1]
    sz = oz - v0[None, :, 2]
    u = (sx * hx + sy * hy + sz * hz) * inv_det
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    valid = (~near_zero & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
             & (t >= t_min))
    return jnp.where(valid, t, BIG_F32), valid


def _sph_hits(o, d, c, r, t_min=SHADOW_EPS, vel=None, time=None):
    """Quadratic sphere test, both roots (Shape.cpp:3-56)."""
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]          # [N,1]
    ox, oy, oz = _ray_origin_comps(o, vel, time)
    ocx = ox - c[None, :, 0]                              # [N,C]
    ocy = oy - c[None, :, 1]
    ocz = oz - c[None, :, 2]
    a = dx * dx + dy * dy + dz * dz                       # [N,1]
    b = ocx * dx + ocy * dy + ocz * dz
    cc = ocx * ocx + ocy * ocy + ocz * ocz - (r * r)[None]
    disc = b * b - a * cc
    ok = disc > 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / a
    t1 = (-b + sq) / a
    t0v = ok & (t0 > t_min)
    t1v = ok & (t1 > t_min)
    t = jnp.where(t0v, t0, jnp.where(t1v, t1, BIG_F32))
    return t, t0v | t1v


def _quad_hits(o, d, q, n, dd, u, v, w, t_min=SHADOW_EPS, vel=None,
               time=None):
    """Two-sided parallelogram test (Shape.cpp:320-358).
    Returns (t, valid, alpha, beta)."""
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]          # [N,1]
    ox, oy, oz = _ray_origin_comps(o, vel, time)
    nx, ny, nz = n[None, :, 0], n[None, :, 1], n[None, :, 2]  # [1,C]
    d_dot_n = dx * nx + dy * ny + dz * nz                 # [N,C]
    flip = d_dot_n > 0
    sgn = jnp.where(flip, -1.0, 1.0)
    nnx, nny, nnz = sgn * nx, sgn * ny, sgn * nz
    dd_s = sgn * dd[None]
    denom = sgn * d_dot_n
    small = jnp.abs(denom) < 1e-8
    t = (dd_s - (nnx * ox + nny * oy + nnz * oz)) \
        / jnp.where(small, 1.0, denom)
    px = ox + t * dx - q[None, :, 0]                      # [N,C]
    py = oy + t * dy - q[None, :, 1]
    pz = oz + t * dz - q[None, :, 2]
    ux, uy, uz = u[None, :, 0], u[None, :, 1], u[None, :, 2]
    vx, vy, vz = v[None, :, 0], v[None, :, 1], v[None, :, 2]
    wx, wy, wz = w[None, :, 0], w[None, :, 1], w[None, :, 2]
    # alpha = w . (p x v);  beta = w . (u x p)
    alpha = (wx * (py * vz - pz * vy) + wy * (pz * vx - px * vz)
             + wz * (px * vy - py * vx))
    beta = (wx * (uy * pz - uz * py) + wy * (uz * px - ux * pz)
            + wz * (ux * py - uy * px))
    interior = (alpha >= 0) & (alpha <= 1) & (beta >= 0) & (beta <= 1)
    valid = ~small & (t >= t_min) & interior
    return jnp.where(valid, t, BIG_F32), valid, alpha, beta


# ---------------------------------------------------------------------------
# Closest-hit over the whole scene
# ---------------------------------------------------------------------------

def _morton_key(scene, origin, direction):
    """Ray-coherence sort key: direction octant (high bits) + 7-bit-per-
    axis Morton code of the origin within the scene bounds.  Secondary
    (bounce) rays arrive pixel-ordered but spatially scattered; sorting
    keeps each 128-ray kernel tile visiting the same few blocks."""
    lo = scene["scene_lo"]
    ext = jnp.maximum(scene["scene_hi"] - lo, 1e-6)
    q = jnp.clip((origin - lo) / ext * 127.0, 0.0, 127.0).astype(jnp.uint32)

    def spread(x):  # 7 bits -> every 3rd bit
        x = (x | (x << 8)) & jnp.uint32(0x0100FF)
        x = (x | (x << 4)) & jnp.uint32(0x10C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x9249249)
        return x

    morton = (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
              | (spread(q[:, 2]) << 2))
    octant = ((direction[:, 0] > 0).astype(jnp.uint32)
              | ((direction[:, 1] > 0).astype(jnp.uint32) << 1)
              | ((direction[:, 2] > 0).astype(jnp.uint32) << 2))
    return (octant << 21) | (morton & jnp.uint32(0x1FFFFF))


def _slab_top2(bl, bh, origin, inv):
    """Chunked slab over box tables: per ray the TWO nearest entered
    boxes (entry dist + id), BIG/0 when fewer.  [N,512] fused chunks."""
    m = bl.shape[0]
    C = 512
    mp = -(-m // C) * C
    # pad with degenerate far-point boxes (never entered; see
    # pallas_trace2 build notes on +-inf empties)
    blp = jnp.pad(bl, ((0, mp - m), (0, 0)), constant_values=3e37)
    bhp = jnp.pad(bh, ((0, mp - m), (0, 0)), constant_values=3e37)
    n = origin.shape[0]
    lane = jnp.arange(C, dtype=jnp.int32)[None, :]

    def chunk(c, st):
        be, bi, be2, bi2 = st
        lo = jax.lax.dynamic_slice(blp, (c * C, 0), (C, 3))
        hi = jax.lax.dynamic_slice(bhp, (c * C, 0), (C, 3))
        u0 = (lo[None, :, 0] - origin[:, 0:1]) * inv[:, 0:1]
        u1 = (hi[None, :, 0] - origin[:, 0:1]) * inv[:, 0:1]
        tn = jnp.minimum(u0, u1)
        tf = jnp.maximum(u0, u1)
        u0 = (lo[None, :, 1] - origin[:, 1:2]) * inv[:, 1:2]
        u1 = (hi[None, :, 1] - origin[:, 1:2]) * inv[:, 1:2]
        tn = jnp.maximum(tn, jnp.minimum(u0, u1))
        tf = jnp.minimum(tf, jnp.maximum(u0, u1))
        u0 = (lo[None, :, 2] - origin[:, 2:3]) * inv[:, 2:3]
        u1 = (hi[None, :, 2] - origin[:, 2:3]) * inv[:, 2:3]
        tn = jnp.maximum(jnp.maximum(tn, jnp.minimum(u0, u1)), 0.0)
        tf = jnp.minimum(tf, jnp.maximum(u0, u1))
        e = jnp.where(tn <= tf, tn, BIG_F32)               # [N,C]
        ci_l = jnp.argmin(e, axis=1).astype(jnp.int32)
        ce = jnp.min(e, axis=1)
        ci = ci_l + c * C
        # chunk-local runner-up
        e2 = jnp.where(lane == ci_l[:, None], BIG_F32, e)
        ce2 = jnp.min(e2, axis=1)
        ci2 = jnp.argmin(e2, axis=1).astype(jnp.int32) + c * C
        # merge running top-2 with the chunk's top-2 (each pair sorted)
        old1 = be <= ce
        t1e = jnp.where(old1, be, ce)
        t1i = jnp.where(old1, bi, ci)
        alt_e = jnp.where(old1, ce, be)        # loser of the firsts
        alt_i = jnp.where(old1, ci, bi)
        sec_e = jnp.where(old1, be2, ce2)      # winner's own runner-up
        sec_i = jnp.where(old1, bi2, ci2)
        t2o = alt_e <= sec_e
        t2e = jnp.where(t2o, alt_e, sec_e)
        t2i = jnp.where(t2o, alt_i, sec_i)
        return t1e, t1i, t2e, t2i

    return jax.lax.fori_loop(
        0, mp // C, chunk,
        (jnp.full((n,), BIG_F32), jnp.zeros((n,), jnp.int32),
         jnp.full((n,), BIG_F32), jnp.zeros((n,), jnp.int32)))


def _first_block_key(scene, origin, direction):
    """Sort key for kernel dispatch: the ids of the first TWO blocks
    each ray enters, with the direction octant as tie-break.  Blocks
    are SAH-ordered, so rays sharing their first blocks share a
    traversal working set — a much stronger grouping for bounce rays
    than the origin Morton code (a 128-ray tile's visited-block union
    is the kernel's cost multiplier); the SECOND entered block
    separates rays that start in the same block but diverge
    immediately.

    HIERARCHICAL variant — MEASURED DEAD END, kept env-gated
    (PT_HIER_KEY=1): the flat slab over every block costs ~8 ms /
    64K rays at m=2563, so a coarse-union pre-pass (pk_sblk_*, slab
    ~m/8 unions then refine the top-2 groups' 16 members) looked
    attractive — but the approximate key degrades tile coherence
    enough that the KERNEL loses far more than the pre-pass saves
    (bounce 64K rays at 10.5M tris: exact 215 ms, hierarchical
    G16/top-1 271 ms, G8/top-2 247 ms; visits/tile 102 -> 138/119).
    Keys never affect results, only cost."""
    import os
    bl = scene["pk_blk_lo"]
    bh = scene["pk_blk_hi"]
    m = bl.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-32,
                          jnp.where(direction < 0, -1e-32, 1e-32),
                          direction)
    if ("pk_sblk_lo" in scene and m > 64
            and os.environ.get("PT_HIER_KEY") == "1"):
        from ..accel.build import SORT_COARSE_G as Gc
        ce1, ci1, ce2, ci2 = _slab_top2(scene["pk_sblk_lo"],
                                        scene["pk_sblk_hi"],
                                        origin, inv)
        # refine the TOP-2 coarse groups jointly: the key is exact
        # whenever the true first two blocks live in them (refining
        # only the winner measured 55 ms of extra kernel time on
        # bounce batches for the 6 ms of pre-pass it saved)
        have2 = ce2 < BIG_F32 * 0.5
        ar = jnp.arange(Gc, dtype=jnp.int32)[None, :]
        fid = jnp.concatenate(
            [ci1[:, None] * Gc + ar,
             jnp.where(have2, ci2, ci1)[:, None] * Gc + ar], 1)
        fidc = jnp.clip(fid, 0, m - 1)
        flo = bl[fidc]                                     # [N,2Gc,3]
        fhi = bh[fidc]
        u0 = (flo[:, :, 0] - origin[:, 0:1]) * inv[:, 0:1]
        u1 = (fhi[:, :, 0] - origin[:, 0:1]) * inv[:, 0:1]
        tn = jnp.minimum(u0, u1)
        tf = jnp.maximum(u0, u1)
        u0 = (flo[:, :, 1] - origin[:, 1:2]) * inv[:, 1:2]
        u1 = (fhi[:, :, 1] - origin[:, 1:2]) * inv[:, 1:2]
        tn = jnp.maximum(tn, jnp.minimum(u0, u1))
        tf = jnp.minimum(tf, jnp.maximum(u0, u1))
        u0 = (flo[:, :, 2] - origin[:, 2:3]) * inv[:, 2:3]
        u1 = (fhi[:, :, 2] - origin[:, 2:3]) * inv[:, 2:3]
        tn = jnp.maximum(jnp.maximum(tn, jnp.minimum(u0, u1)), 0.0)
        tf = jnp.minimum(tf, jnp.maximum(u0, u1))
        e = jnp.where((tn <= tf) & (fid < m), tn, BIG_F32)  # [N,2Gc]
        f1 = jnp.argmin(e, axis=1)
        e1 = jnp.min(e, axis=1)
        b1f = jnp.take_along_axis(fid, f1[:, None], 1)[:, 0]
        e2l = jnp.where(jnp.arange(2 * Gc)[None, :] == f1[:, None],
                        BIG_F32, e)
        f2 = jnp.argmin(e2l, axis=1)
        e2 = jnp.min(e2l, axis=1)
        b2f = jnp.take_along_axis(fid, f2[:, None], 1)[:, 0]
        # a coarse-entered ray can miss every member box: key it by the
        # group itself (quality-only fallback)
        bi = jnp.where(e1 < BIG_F32 * 0.5, b1f, ci1 * Gc)
        bi2 = b2f
        be2 = e2
        be = jnp.minimum(e1, ce1)  # coarse-entered => sorts as live
    else:
        be, bi, be2, bi2 = _slab_top2(bl, bh, origin, inv)
    octant = ((direction[:, 0] > 0).astype(jnp.uint32)
              | ((direction[:, 1] > 0).astype(jnp.uint32) << 1)
              | ((direction[:, 2] > 0).astype(jnp.uint32) << 2))
    b1 = bi.astype(jnp.uint32)
    b2 = jnp.where(be2 >= BIG_F32 * 0.5, b1,
                   jnp.clip(bi2, 0, m - 1).astype(jnp.uint32))
    if 8 * m * m < (1 << 31):
        key = (b1 * jnp.uint32(m) + b2) * jnp.uint32(8) | octant
    else:                      # huge block counts: first block only
        key = (b1 << 3) | octant
    # rays entering nothing sort after everything live (dead lanes get
    # 0xFFFFFFFF at the call site and stay last)
    return jnp.where(be >= BIG_F32 * 0.5, jnp.uint32(0x7FFFFFFE), key)


def _subset_scene(scene, prefix):
    """View of `scene` with the prefix'd triangle table set mounted under
    the standard pk_ names the kernels read (pka_* = alpha-material
    triangle split, builder.build)."""
    if prefix == "pk_":
        return scene
    sub = {k: v for k, v in scene.items() if not k.startswith("pk")}
    for k, v in scene.items():
        if k.startswith(prefix):
            sub["pk_" + k[len(prefix):]] = v
    return sub


def _multipass_visits():
    """Per-pass L1-visit caps for the multipass re-binned traversal;
    () disables it.  PT_MULTIPASS overrides: "0" off, "a,b,c" custom.
    Read at trace time (a jit cache entry bakes the schedule in)."""
    import os
    env = os.environ.get("PT_MULTIPASS")
    if env is not None:
        env = env.strip()
        if env in ("0", "off", ""):
            return ()
        return tuple(int(x) for x in env.split(","))
    return MULTIPASS_VISITS


# MEASURED DEAD END at 10.5M tris / 64K rays (tools/bench_multipass.py,
# v5e, 2026-08-19): bounce single-pass 215 ms vs multipass (16,8,8)
# 248 ms, (16,8) 237, (8,8,8,8) 285, (24,12) 233, (32,) 204; coherent
# strictly worse everywhere.  Re-binning only buys agreement on each
# ray's FIRST next block — tiles diverge again within a pass — while
# every pass pays a fresh entry phase (+7us/tile), kernel pipeline
# fill, an argsort and ~10 gathers.  Kept OFF by default; the
# machinery (frontier outputs, visit caps, this driver) stays tested
# (test_multipass_matches_single_pass) and PT_MULTIPASS-enabled for
# future scenes where per-ray needs are deeper.
MULTIPASS_VISITS = ()


def _multipass2(sub, o, d, tm, block_k, any_hit, time, visits, g=None):
    """Multipass re-binned two-level traversal (round 3).

    A 128-ray kernel tile pays for the UNION of the blocks its rays
    need — on incoherent bounce batches ~100 L1 visits/tile against a
    per-ray need of only a handful (the reference's per-ray recursion,
    BVH.hpp:1129-1203, never pays this).  Instead of one long walk,
    run SHORT capped passes: each kernel pass walks at most `visits[i]`
    L1s per tile and reports per-ray resume state (b_next/e_next, the
    nearest unconsumed block that could still beat the ray's best);
    between passes the still-unresolved rays are re-sorted by b_next,
    so the next pass's tiles AGREE on the blocks they need and the
    union collapses toward the per-ray need.  Later passes also run
    their entry phase against each ray's running best t (passed as
    t_max), which culls most of the table outright.

    Exactness: the final pass is uncapped, and a pass can only add
    hits strictly closer than the running bound, so the result equals
    the single-pass kernel's up to equal-t tie-breaks (same caveat as
    any ray regrouping, see trace_regen notes).

    NOTE: measured NON-viable on the San-Miguel-analog workload — see
    the MULTIPASS_VISITS dead-end note below for numbers and why.
    """
    from ..accel.pallas_trace2 import pallas_tri_intersect2, G_DEFAULT

    g = G_DEFAULT if g is None else g
    n = o.shape[0]
    res = dict(t=jnp.full((n,), BIG_F32), tri=jnp.full((n,), -1,
                                                       jnp.int32),
               inst=jnp.full((n,), -1, jnp.int32),
               valid=jnp.zeros((n,), bool))
    octant = ((d[:, 0] > 0).astype(jnp.uint32)
              | ((d[:, 1] > 0).astype(jnp.uint32) << 1)
              | ((d[:, 2] > 0).astype(jnp.uint32) << 2))
    o_s, d_s, t_s, time_s = o, d, tm, time
    ip = None                       # inverse perm of the current order
    for v in list(visits) + [None]:
        last = v is None
        hit = pallas_tri_intersect2(sub, o_s, d_s, t_s, block_k,
                                    any_hit=any_hit, time=time_s, g=g,
                                    max_visits=v, frontier=not last)
        if ip is not None:          # back to original ray order
            hit = {k: x[ip] for k, x in hit.items()}
        bound = jnp.where(res["valid"], res["t"], tm)
        closer = hit["valid"] & (hit["t"] < bound)
        res = dict(t=jnp.where(closer, hit["t"], res["t"]),
                   tri=jnp.where(closer, hit["tri"], res["tri"]),
                   inst=jnp.where(closer, hit["inst"], res["inst"]),
                   valid=res["valid"] | closer)
        if last:
            break
        bound = jnp.where(res["valid"], res["t"], tm)
        unresolved = (hit["e_next"] < bound) & (bound > 0.0)
        if any_hit:
            unresolved = unresolved & ~res["valid"]
        key = jnp.where(
            unresolved,
            (hit["b_next"].astype(jnp.uint32) << 3) | octant,
            jnp.uint32(0xFFFFFFFF))
        perm = jnp.argsort(key)
        ip = jnp.argsort(perm)
        o_s = o[perm]
        d_s = d[perm]
        t_s = jnp.where(unresolved, bound, 0.0)[perm]
        time_s = time[perm] if time is not None else None
    return res


def _pallas_dispatch(scene, meta, origin, direction, t_max,
                     any_hit: bool = False, sort: bool = True,
                     time=None, tri_tables: str = "all",
                     analytic: bool = True, sort_key=None,
                     alpha_shadow: bool = False):
    """Triangles via the Pallas tile-divergent kernel; the (few) analytic
    prims of a mixed scene take the dense brute path; results merged.

    tri_tables: "all" traverses the main tables plus the alpha split
    (pka_*) when present; "opaque"/"alpha" restrict to one set (the
    shadow predicate's single-pass opaque any-hit + alpha chain).
    sort_key: precomputed _first_block_key values — callers that
    dispatch repeatedly from (nearly) the same origins (the alpha
    restart chain) pay the ~10 ms/64K slab pre-pass once instead of
    per dispatch; keys are quality-only so a slightly stale key cannot
    change results (BVH.hpp:510-529 gets ordering for free per ray).

    When meta.alpha_cull_mask and the alpha split is two-level, the
    pka_* run tests the per-triangle alpha micro-masks in-kernel:
    closest passes cull definitely-transparent candidates (amask=1);
    alpha_shadow=True runs the shadow variant (amask=2) whose result
    carries a "solid" flag for lanes occluded outright by a
    definitely-opaque hit (scene/alphamask.py; Primitive.cpp:6-14)."""
    import dataclasses
    from ..accel.pallas_trace import pallas_tri_intersect, TILE

    n = origin.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    motion = meta.has_motion
    if motion and time is None:
        time = jnp.zeros((n,), jnp.float32)
    if sort and "scene_lo" in scene:
        key = sort_key if sort_key is not None else \
            (_first_block_key(scene, origin, direction)
             if "pk_blk_lo" in scene
             else _morton_key(scene, origin, direction))
        # dead lanes (t_max<=0) sort LAST: live rays compact into fewer
        # tiles and the all-dead tiles exit before selecting any block —
        # the wavefront-compaction analog of the reference's per-pixel
        # loop keeping every thread busy (Integrators.cpp:55-90)
        key = jnp.where(t_max <= 0.0, jnp.uint32(0xFFFFFFFF), key)
        perm = jnp.argsort(key)
        origin_s = origin[perm]
        direction_s = direction[perm]
        tmax_s = t_max[perm]
        time_s = time[perm] if motion else None
    else:
        perm = None
        origin_s, direction_s, tmax_s = origin, direction, t_max
        time_s = time if motion else None
    pad = (-n) % TILE
    if pad:
        o = jnp.pad(origin_s, ((0, pad), (0, 0)))
        d = jnp.pad(direction_s, ((0, pad), (0, 0)), constant_values=1.0)
        tm = jnp.pad(tmax_s, (0, pad))         # t_max 0 => padded rays miss
        tme = jnp.pad(time_s, (0, pad)) if motion else None
    else:
        o, d, tm = origin_s, direction_s, tmax_s
        tme = time_s
    # in-kernel alpha micro-mask mode for the pka_* run (the builder
    # sets alpha_cull_mask only when it attached mask rows — either
    # kernel level)
    import os as _os
    am_alpha = 0
    if getattr(meta, "alpha_cull_mask", False) and not any_hit:
        if alpha_shadow:
            am_alpha = 2
        elif _os.environ.get("PT_AMASK_CLOSEST", "1") != "0":
            # closest-pass transparent-cull: skippable for A/Bs (the
            # bit tests cost ~+7 ms standalone on the foliage table;
            # the cull saves whole bounce-loop restarts downstream)
            am_alpha = 1

    def run(tables, block_k, tmr=None, amask=0):
        sub = _subset_scene(scene, tables)
        tmr = tm if tmr is None else tmr
        if "pk_l1_base" in sub:          # two-level tables
            from ..accel.pallas_trace2 import (pallas_tri_intersect2,
                                               RECULL_MAX_M1PAD)
            m1pad = -(-sub["pk_blk_lo"].shape[0] // 128) * 128
            visits = _multipass_visits()
            g = getattr(meta, "block_g", 16)
            if visits and m1pad <= RECULL_MAX_M1PAD and not amask:
                return _multipass2(sub, o, d, tmr, block_k, any_hit,
                                   tme, visits, g=g)
            # resident-window drain (round 5): defaults to 4 in-flight
            # L1s on large scenes (pallas_tri_intersect2 auto);
            # PT_WINDOW=1|2|4 overrides for A/Bs
            wdw = _os.environ.get("PT_WINDOW")
            return pallas_tri_intersect2(sub, o, d, tmr, block_k,
                                         any_hit=any_hit, time=tme,
                                         g=g,
                                         pops=getattr(meta,
                                                      "block_pops", 1),
                                         amask=amask,
                                         window=int(wdw) if wdw
                                         else None)
        return pallas_tri_intersect(sub, o, d, tmr, block_k,
                                    any_hit=any_hit, time=tme,
                                    amask=amask)

    runs = []
    if tri_tables in ("all", "opaque"):
        runs.append(("pk_", meta.block_k, None, 0))
    if tri_tables in ("all", "alpha") and \
            getattr(meta, "alpha_block_k", 0) and "pka_tri" in scene:
        runs.append(("pka_", meta.alpha_block_k, None, am_alpha))
    hit = run(*runs[0])
    for tables, bk, _, amk in runs[1:]:
        # bound the (small) later table's traversal by the first
        # table's result: a closest-hit pass only needs strictly
        # closer hits, an any-hit pass needs nothing once occluded —
        # without the bound the alpha table was traversed to the
        # ORIGINAL t_max on every ray, including ones the opaque pass
        # already resolved at t ~ 0
        if any_hit:
            tm2 = jnp.where(hit["valid"], 0.0, tm)
        else:
            tm2 = jnp.where(hit["valid"], hit["t"], tm)
        h2 = run(tables, bk, tm2, amk)
        closer = h2["valid"] & (~hit["valid"] | (h2["t"] < hit["t"]))
        hit = dict(t=jnp.where(closer, h2["t"], hit["t"]),
                   tri=jnp.where(closer, h2["tri"], hit["tri"]),
                   inst=jnp.where(closer, h2.get("inst", -1),
                                  hit.get("inst", -1)),
                   valid=hit["valid"] | h2["valid"],
                   **({"solid": h2["solid"] | hit.get("solid", False)}
                      if "solid" in h2 else {}))
    t = hit["t"][:n]
    idx = hit["tri"][:n]
    inst = hit.get("inst")
    solid = hit.get("solid")
    valid = hit["valid"][:n]
    if perm is not None:
        inv = jnp.argsort(perm)
        t, idx, valid = t[inv], idx[inv], valid[inv]
        if inst is not None:
            inst = inst[:n][inv]
        if solid is not None:
            solid = solid[:n][inv]
    else:
        if inst is not None:
            inst = inst[:n]
        if solid is not None:
            solid = solid[:n]
    if inst is not None and getattr(meta, "n_inst", 0):
        # runtime-instance hits: encode idx as inst * n_obj_tri + otri so
        # make_interaction's SHAPE_ITRI path recovers both
        is_i = valid & (inst >= 0)
        idx = jnp.where(is_i, inst * meta.n_obj_tri + idx, idx)
        kind = jnp.where(valid, jnp.where(is_i, SHAPE_ITRI, SHAPE_TRI), -1)
    else:
        kind = jnp.where(valid, SHAPE_TRI, -1)

    if analytic and (meta.n_sph or meta.n_quad):
        meta2 = dataclasses.replace(meta, n_tri=0, accel="brute",
                                    n_inst=0, n_obj_tri=0)
        other = intersect(scene, meta2, origin, direction, t_max,
                          time=time)
        better = other["valid"] & (~valid | (other["t"] < t))
        t = jnp.where(better, other["t"], t)
        kind = jnp.where(better, other["kind"], kind)
        idx = jnp.where(better, other["idx"], idx)
        valid = valid | other["valid"]
    out = dict(t=jnp.where(valid, t, BIG_F32), kind=kind, idx=idx,
               valid=valid)
    if solid is not None:
        out["solid"] = solid
    return out


def intersect(scene, meta, origin, direction, t_max, time=None):
    """Closest hit: returns dict(t, kind, idx, valid) for a ray batch [N]
    (Scene::Intersect analog, Scene.cpp:31-33).

    Dispatches on meta.accel: "bvh" = wide-node SAH BVH traversal
    (accel/traverse.py); "brute" = chunked scan over all primitives (the
    correctness reference every accelerator is tested against).
    """
    if meta.accel == "pallas":
        return _pallas_dispatch(scene, meta, origin, direction, t_max,
                                time=time)
    motion = meta.has_motion and time is not None
    if meta.accel == "beam":
        from ..accel.beam import beam_intersect
        return beam_intersect(scene, origin, direction, t_max,
                              meta.block_k,
                              shapes=(meta.n_tri > 0, meta.n_sph > 0,
                                      meta.n_quad > 0))
    if meta.accel == "bvh":
        from ..accel.traverse import bvh_intersect
        return bvh_intersect(scene, origin, direction, t_max)
    n = origin.shape[0]
    best_t = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32) \
        if jnp.ndim(t_max) == 0 else t_max.astype(jnp.float32)
    best_kind = jnp.full((n,), -1, jnp.int32)
    best_idx = jnp.zeros((n,), jnp.int32)
    state = (best_t, best_kind, best_idx)

    def fold(state, t, valid, kind, base, j):
        best_t, best_kind, best_idx = state
        t = jnp.where(valid, t, BIG_F32)
        cmin = jnp.argmin(t, axis=1)
        tmin = jnp.take_along_axis(t, cmin[:, None], 1)[:, 0]
        better = tmin < best_t
        best_t = jnp.where(better, tmin, best_t)
        best_kind = jnp.where(better, kind, best_kind)
        best_idx = jnp.where(better, base + cmin.astype(jnp.int32), best_idx)
        return best_t, best_kind, best_idx

    if meta.n_tri:
        c, nch = _chunks(meta.n_tri)
        pad = c * nch
        v = jnp.pad(scene["tri_v"], ((0, pad - scene["tri_v"].shape[0]),
                                     (0, 0), (0, 0)))
        vr = v.reshape(nch, c, 3, 3)
        idx_valid = (jnp.arange(pad) < meta.n_tri).reshape(nch, c)

        def body(st, xs):
            if motion:
                tv, mask, j, vl = xs
            else:
                (tv, mask, j), vl = xs, None
            t, valid = _tri_hits(origin, direction, tv[:, 0], tv[:, 1],
                                 tv[:, 2], vel=vl, time=time)
            valid = valid & mask[None, :]
            return fold(st, t, valid, SHAPE_TRI, j * c, j), None

        xs = (vr, idx_valid, jnp.arange(nch))
        if motion:
            xs += (jnp.pad(scene["tri_vel"],
                           ((0, pad - scene["tri_vel"].shape[0]), (0, 0))
                           ).reshape(nch, c, 3),)
        state, _ = jax.lax.scan(body, state, xs)

    if meta.n_sph:
        c, nch = _chunks(meta.n_sph)
        pad = c * nch
        cs = jnp.pad(scene["sph_c"], ((0, pad - scene["sph_c"].shape[0]),
                                      (0, 0))).reshape(nch, c, 3)
        rs = jnp.pad(scene["sph_r"],
                     (0, pad - scene["sph_r"].shape[0])).reshape(nch, c)
        idx_valid = (jnp.arange(pad) < meta.n_sph).reshape(nch, c)

        def body(st, xs):
            if motion:
                cc, rr, mask, j, vl = xs
            else:
                (cc, rr, mask, j), vl = xs, None
            t, valid = _sph_hits(origin, direction, cc, rr, vel=vl,
                                 time=time)
            valid = valid & mask[None, :]
            return fold(st, t, valid, SHAPE_SPH, j * c, j), None

        xs = (cs, rs, idx_valid, jnp.arange(nch))
        if motion:
            xs += (jnp.pad(scene["sph_vel"],
                           ((0, pad - scene["sph_vel"].shape[0]), (0, 0))
                           ).reshape(nch, c, 3),)
        state, _ = jax.lax.scan(body, state, xs)

    if meta.n_quad:
        c, nch = _chunks(meta.n_quad)
        pad = c * nch

        def padq(a):
            width = ((0, pad - a.shape[0]),) + ((0, 0),) * (a.ndim - 1)
            return jnp.pad(a, width).reshape((nch, c) + a.shape[1:])

        qq, qu, qv, qn = (padq(scene[k]) for k in
                          ("quad_q", "quad_u", "quad_v", "quad_n"))
        qd = padq(scene["quad_d"])
        qw = padq(scene["quad_w"])
        idx_valid = (jnp.arange(pad) < meta.n_quad).reshape(nch, c)

        def body(st, xs):
            if motion:
                q, u, v, nn, dd, w, mask, j, vl = xs
            else:
                (q, u, v, nn, dd, w, mask, j), vl = xs, None
            t, valid, _, _ = _quad_hits(origin, direction, q, nn, dd, u, v,
                                        w, vel=vl, time=time)
            valid = valid & mask[None, :]
            return fold(st, t, valid, SHAPE_QUAD, j * c, j), None

        xs = (qq, qu, qv, qn, qd, qw, idx_valid, jnp.arange(nch))
        if motion:
            xs += (jnp.pad(scene["quad_vel"],
                           ((0, pad - scene["quad_vel"].shape[0]), (0, 0))
                           ).reshape(nch, c, 3),)
        state, _ = jax.lax.scan(body, state, xs)

    if getattr(meta, "n_inst", 0):
        # runtime instances (TransformedPrimitive, Primitive.cpp:41-66):
        # inverse-transform the rays per instance, test the shared
        # object-space triangles with the direction UNNORMALIZED so t is
        # preserved in world parameterisation
        for i in range(meta.n_inst):
            inv = scene["inst_inv"][i]                       # [3,4]
            # precision="highest": TPU matmuls default to bf16, which
            # quantizes transformed ray origins into visible banding
            o_l = jnp.matmul(origin, inv[:, :3].T,
                             precision="highest") + inv[:, 3]
            d_l = jnp.matmul(direction, inv[:, :3].T, precision="highest")
            if motion and "inst_vel" in scene:
                # moving instance (AnimatedPrimitive wrapping a
                # TransformedPrimitive, Primitive.cpp:77-96): test the
                # static object from origin - v_obj * time
                vel_l = jnp.matmul(scene["inst_vel"][i], inv[:, :3].T,
                                   precision="highest")
                o_l = o_l - vel_l[None, :] * time[:, None]
            base = scene["inst_base"][i]
            count = scene["inst_count"][i]
            c, nch = _chunks(meta.n_obj_tri)
            pad = c * nch
            v = jnp.pad(scene["otri_v"],
                        ((0, pad - scene["otri_v"].shape[0]),
                         (0, 0), (0, 0)))
            vr = v.reshape(nch, c, 3, 3)
            gidx = jnp.arange(pad).reshape(nch, c)
            in_range = (gidx >= base) & (gidx < base + count) \
                & (gidx < meta.n_obj_tri)

            def body(st, xs, o_l=o_l, d_l=d_l, i=i):
                tv, mask, j = xs
                t, valid = _tri_hits(o_l, d_l, tv[:, 0], tv[:, 1],
                                     tv[:, 2])
                valid = valid & mask[None, :]
                return fold(st, t, valid, SHAPE_ITRI,
                            i * meta.n_obj_tri + j * c, j), None

            state, _ = jax.lax.scan(body, state,
                                    (vr, in_range, jnp.arange(nch)))

    best_t, best_kind, best_idx = state
    valid = best_kind >= 0
    return dict(t=best_t, kind=best_kind, idx=best_idx, valid=valid)


# ---------------------------------------------------------------------------
# Interaction assembly (gathers at the winning primitive)
# ---------------------------------------------------------------------------

def make_interaction(scene, meta, origin, direction, hit, time=None,
                     lite: bool = False):
    """Build the SurfaceInteraction SoA for a hit batch.

    Reproduces the per-shape interaction conventions:
      triangle: Shape.cpp:185-244 (bary interp, normal-orientation fix,
                +-eps*N offset, Gram-Schmidt tangent, normal mapping)
      sphere:   Shape.cpp:3-38 (outward normal, +eps*n offset, sphere uv)
      quad:     Shape.cpp:320-343 (two-sided ns, +eps*ns offset)

    lite=True skips authored-tangent interpolation and normal mapping
    (the fallback ONB tangent is still produced): alpha-chain restarts
    and transmittance marching only consume p/p_raw/n/uv/mat_id/med_id,
    none of which depend on either.
    """
    n = origin.shape[0]
    t = hit["t"]
    idx = hit["idx"]
    kind = hit["kind"]
    p_raw = origin + t[:, None] * direction
    motion = meta.has_motion and time is not None

    # --- triangle
    want_tan = getattr(meta, "has_tangents", True) and not lite
    ti = jnp.clip(idx, 0, scene["tri_v"].shape[0] - 1)
    if "tri_pack" in scene:
        # ONE packed gather (verts/normals/uvs/prop) instead of four
        # separate table gathers — row gathers from triangle-count
        # tables are latency-bound per ROW, not per byte (round-3
        # tools/bench_gather.py: five gathers 4.7 ms vs packed 1.7 ms
        # per 64K hits at 10.5M tris)
        pk_row = scene["tri_pack"][ti]          # [N,32]
        tv = pk_row[:, 0:9].reshape(-1, 3, 3)
        tn_b = pk_row[:, 9:18].reshape(-1, 3, 3)
        tuv_b = pk_row[:, 18:24].reshape(-1, 3, 2)
        tprop_b = pk_row[:, 24:28].astype(jnp.int32)
    else:                        # pre-round-3 cached scenes
        tv = scene["tri_v"][ti]                 # [N,3,3]
        tn_b = scene["tri_n"][ti]
        tuv_b = scene["tri_uv"][ti]
        tprop_b = scene["tri_prop"][ti]
    ttan_b = scene["tri_tan"][ti] if want_tan else None
    if motion:
        tv = tv + (scene["tri_vel"][ti] * time[:, None])[:, None, :]
    if getattr(meta, "n_inst", 0):
        # instanced-triangle hits: gather object-space data and transform
        # to world, then run the standard triangle math (kind folded to
        # TRI below).  TransformedPrimitive back-transform,
        # Primitive.cpp:47-66.
        is_itri = kind == SHAPE_ITRI
        iid = jnp.clip(idx // meta.n_obj_tri, 0,
                       scene["inst_fwd"].shape[0] - 1)
        oid = jnp.clip(idx % meta.n_obj_tri, 0,
                       scene["otri_v"].shape[0] - 1)
        fwd = scene["inst_fwd"][iid]            # [N,3,4]
        nrm = scene["inst_nrm"][iid]            # [N,3,3]
        ov = scene["otri_v"][oid]               # [N,3,3]
        ov_w = jnp.einsum("nij,nkj->nki", fwd[:, :, :3], ov,
                          precision="highest") + fwd[:, None, :, 3]
        if motion and "inst_vel" in scene:
            # moving instance: world position at ray time (translation
            # only — normals unchanged)
            ov_w = ov_w + (scene["inst_vel"][iid]
                           * time[:, None])[:, None, :]
        on = scene["otri_n"][oid]
        on_w = safe_normalize(jnp.einsum("nij,nkj->nki", nrm, on,
                                         precision="highest"))
        if want_tan:
            otan = scene["otri_tan"][oid]
            otan_w = jnp.einsum("nij,nkj->nki", fwd[:, :, :3], otan,
                                precision="highest")
        m3 = is_itri[:, None, None]
        tv = jnp.where(m3, ov_w, tv)
        tn = jnp.where(m3, on_w, tn_b)
        tuv = jnp.where(is_itri[:, None, None], scene["otri_uv"][oid],
                        tuv_b)
        ttan = jnp.where(m3, otan_w, ttan_b) if want_tan else None
        tprop = jnp.where(is_itri[:, None], scene["otri_prop"][oid],
                          tprop_b)
        # per-instance area lights: light id = ilight_map[slot_base +
        # (otri - model base)] (instanced Model::BuildBlas emissives)
        lbase = scene["inst_slot_base"][iid]
        lslot = lbase + (oid - scene["inst_base"][iid])
        ilight = jnp.where(
            (lbase >= 0) & is_itri,
            scene["ilight_map"][jnp.clip(
                lslot, 0, scene["ilight_map"].shape[0] - 1)], -1)
        tprop = tprop.at[:, 1].set(jnp.where(is_itri, ilight, tprop[:, 1]))
        kind = jnp.where(is_itri, SHAPE_TRI, kind)
    if not getattr(meta, "n_inst", 0):
        tn = tn_b
        tuv = tuv_b
        ttan = ttan_b
        tprop = tprop_b
    # scalarized (component) triangle interaction math — see the note in
    # core/math.py: [N,3] cross/dot/normalize pay minor-axis relayouts
    from ..core.math import (unpack3, pack3, sdot, scross,
                             ssafe_normalize, sonb_from_normal)
    dxr, dyr, dzr = unpack3(direction)
    e1x, e1y, e1z = (tv[:, 1, 0] - tv[:, 0, 0], tv[:, 1, 1] - tv[:, 0, 1],
                     tv[:, 1, 2] - tv[:, 0, 2])
    e2x, e2y, e2z = (tv[:, 2, 0] - tv[:, 0, 0], tv[:, 2, 1] - tv[:, 0, 1],
                     tv[:, 2, 2] - tv[:, 0, 2])
    # recompute barycentrics at the hit point (cheaper than storing them)
    hx, hy, hz = scross(dxr, dyr, dzr, e2x, e2y, e2z)
    det = e1x * hx + e1y * hy + e1z * hz
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    sx = origin[:, 0] - tv[:, 0, 0]
    sy = origin[:, 1] - tv[:, 0, 1]
    sz = origin[:, 2] - tv[:, 0, 2]
    bu = (sx * hx + sy * hy + sz * hz) * inv_det
    qx, qy, qz = scross(sx, sy, sz, e1x, e1y, e1z)
    bv = sdot(dxr, dyr, dzr, qx, qy, qz) * inv_det
    bw = 1.0 - bu - bv
    tri_uv = (bu[:, None] * tuv[:, 1] + bv[:, None] * tuv[:, 2]
              + bw[:, None] * tuv[:, 0])
    nsx, nsy, nsz = ssafe_normalize(
        bu * tn[:, 1, 0] + bv * tn[:, 2, 0] + bw * tn[:, 0, 0],
        bu * tn[:, 1, 1] + bv * tn[:, 2, 1] + bw * tn[:, 0, 1],
        bu * tn[:, 1, 2] + bv * tn[:, 2, 2] + bw * tn[:, 0, 2])
    ngx, ngy, ngz = ssafe_normalize(*scross(e1x, e1y, e1z, e2x, e2y, e2z))
    flip_ns = sdot(ngx, ngy, ngz, nsx, nsy, nsz) < 0
    nsx = jnp.where(flip_ns, -nsx, nsx)
    nsy = jnp.where(flip_ns, -nsy, nsy)
    nsz = jnp.where(flip_ns, -nsz, nsz)
    # fallback tangent: reference uses normalize(cross(up, ns))
    # (Shape.cpp:239-240) == onb axis[1]
    _, (fbx, fby, fbz) = sonb_from_normal(nsx, nsy, nsz)
    if want_tan:
        trx = bu * ttan[:, 1, 0] + bv * ttan[:, 2, 0] + bw * ttan[:, 0, 0]
        try_ = bu * ttan[:, 1, 1] + bv * ttan[:, 2, 1] + bw * ttan[:, 0, 1]
        trz = bu * ttan[:, 1, 2] + bv * ttan[:, 2, 2] + bw * ttan[:, 0, 2]
        has_tan = tprop[:, 3] > 0
        ns_dot_tr = sdot(nsx, nsy, nsz, trx, try_, trz)
        tgx, tgy, tgz = ssafe_normalize(trx - nsx * ns_dot_tr,
                                        try_ - nsy * ns_dot_tr,
                                        trz - nsz * ns_dot_tr)
        tan_t = pack3(jnp.where(has_tan, tgx, fbx),
                      jnp.where(has_tan, tgy, fby),
                      jnp.where(has_tan, tgz, fbz))
    else:   # static: no triangle in the scene has authored tangents
        tan_t = pack3(fbx, fby, fbz)
    ns_t = pack3(nsx, nsy, nsz)
    ng_t = pack3(ngx, ngy, ngz)
    off_sign = jnp.where(sdot(dxr, dyr, dzr, ngx, ngy, ngz) > 0,
                         -1.0, 1.0)[:, None]
    p_t = offset_ray(p_raw, ng_t * off_sign)

    # --- sphere
    si = jnp.clip(idx, 0, scene["sph_c"].shape[0] - 1)
    sc = scene["sph_c"][si]
    if motion:
        sc = sc + scene["sph_vel"][si] * time[:, None]
    sprop = scene["sph_prop"][si]
    ns_s = safe_normalize(p_raw - sc)
    p_s = offset_ray(p_raw, ns_s)
    uv_s = sphere_uv(ns_s)
    tan_s = safe_normalize(jnp.cross(
        jnp.where((jnp.abs(ns_s[..., 0:1]) > 0.9999),
                  jnp.asarray([0.0, 1.0, 0.0]),
                  jnp.asarray([1.0, 0.0, 0.0])), ns_s))

    # --- quad
    qi = jnp.clip(idx, 0, scene["quad_q"].shape[0] - 1)
    qq_p = scene["quad_q"][qi]
    if motion:
        qq_p = qq_p + scene["quad_vel"][qi] * time[:, None]
    qn = scene["quad_n"][qi]
    qprop = scene["quad_prop"][qi]
    flip_q = vdot_k(direction, qn) > 0
    ns_q = jnp.where(flip_q, -qn, qn)
    planar = p_raw - qq_p
    alpha = vdot(scene["quad_w"][qi], jnp.cross(planar, scene["quad_v"][qi]))
    beta = vdot(scene["quad_w"][qi], jnp.cross(scene["quad_u"][qi], planar))
    uv_q = jnp.stack([alpha, beta], -1)
    tan_q = safe_normalize(jnp.cross(
        jnp.where((jnp.abs(ns_q[..., 0:1]) > 0.9999),
                  jnp.asarray([0.0, 1.0, 0.0]),
                  jnp.asarray([1.0, 0.0, 0.0])), ns_q))
    p_q = offset_ray(p_raw, ns_q)

    is_t = (kind == SHAPE_TRI)[:, None]
    is_s = (kind == SHAPE_SPH)[:, None]
    it = dict(
        valid=hit["valid"], t=t, p_raw=p_raw,
        p=jnp.where(is_t, p_t, jnp.where(is_s, p_s, p_q)),
        n=jnp.where(is_t, ng_t, jnp.where(is_s, ns_s, qn)),
        ns=jnp.where(is_t, ns_t, jnp.where(is_s, ns_s, ns_q)),
        tangent=jnp.where(is_t, tan_t, jnp.where(is_s, tan_s, tan_q)),
        uv=jnp.where(is_t, tri_uv, jnp.where(is_s, uv_s, uv_q)),
        mat_id=jnp.where(kind == SHAPE_TRI, tprop[:, 0],
                         jnp.where(kind == SHAPE_SPH, sprop[:, 0],
                                   qprop[:, 0])),
        light_id=jnp.where(kind == SHAPE_TRI, tprop[:, 1],
                           jnp.where(kind == SHAPE_SPH, sprop[:, 1],
                                     qprop[:, 1])),
        med_id=jnp.where(kind == SHAPE_TRI, tprop[:, 2],
                         jnp.where(kind == SHAPE_SPH, sprop[:, 2],
                                   qprop[:, 2])),
        kind=kind, idx=idx,
    )

    # normal mapping (Material::sample_normalMap, Material.hpp:344-348),
    # applied where the material has a normal texture
    # static gate: scenes with no normal-textured material skip the
    # texture fetch + TBN transform outright (it previously ran for
    # every hit of every bounce regardless)
    if meta.n_mat and getattr(meta, "has_normal_maps", True) and not lite:
        mat_ids = jnp.clip(it["mat_id"], 0, scene["mat_type"].shape[0] - 1)
        norm_tex = scene["mat_tex"][mat_ids, 3]
        has_norm = (norm_tex >= 0) & (it["mat_id"] >= 0) & it["valid"]
        nmap = texture_eval(scene, norm_tex, it["uv"])
        n_local = safe_normalize(2.0 * nmap - 1.0)
        tt, bb2, nn2 = onb_from_interaction(it["ns"], it["tangent"])
        ns_mapped = safe_normalize(to_world(tt, bb2, nn2, n_local))
        it["ns"] = jnp.where(has_norm[:, None], ns_mapped, it["ns"])
    # sanitize miss lanes: with t = BIG_F32 the hit point overflows and the
    # quad UV becomes inf/NaN; that garbage is masked in the forward pass
    # but any `param * f(garbage)` has a NaN *partial*, and 0-cotangent x
    # NaN-partial = NaN poisons the whole batch in reverse mode.
    ok = hit["valid"]
    okn = ok[:, None]
    up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), p_raw.shape)
    right = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), p_raw.shape)
    it["p"] = jnp.where(okn, it["p"], 0.0)
    it["p_raw"] = jnp.where(okn, it["p_raw"], 0.0)
    it["n"] = jnp.where(okn, it["n"], up)
    it["ns"] = jnp.where(okn, it["ns"], up)
    it["tangent"] = jnp.where(okn, it["tangent"], right)
    it["uv"] = jnp.where(okn, it["uv"], 0.0)
    it["mat_id"] = jnp.where(ok, it["mat_id"], -1)
    it["light_id"] = jnp.where(ok, it["light_id"], -1)
    it["med_id"] = jnp.where(ok, it["med_id"], -1)

    # geometry is detached from AD: gradients target material / texture /
    # light / medium parameters (detached-sampling estimator); geometry
    # derivatives (silhouettes) need dedicated estimators and are out of
    # scope, and detaching removes a large NaN-gradient surface.
    return {k: (jax.lax.stop_gradient(v)
                if isinstance(v, jnp.ndarray) else v)
            for k, v in it.items()}


def _chain_interaction(scene, meta, origin, direction, hit):
    """Triangle-only interaction subset for the alpha restart chain:
    p_raw, geometric normal, uv, mat_id — nothing else (the chain only
    advances past the surface and fetches its alpha).  ~1/4 the work of
    make_interaction(lite=True): no sphere/quad branches, no shading-
    normal interpolation, no tangents, no merge selects.  Only legal
    when the chain excludes analytic prims (meta.analytic_alpha False).
    """
    from ..core.math import unpack3, sdot, scross, ssafe_normalize, pack3
    t = hit["t"]
    idx = hit["idx"]
    kind = hit["kind"]
    ok = hit["valid"]
    p_raw = origin + t[:, None] * direction
    ti = jnp.clip(idx, 0, scene["tri_v"].shape[0] - 1)
    if "tri_pack" in scene:
        row = scene["tri_pack"][ti]
        tv = row[:, 0:9].reshape(-1, 3, 3)
        tuv = row[:, 18:24].reshape(-1, 3, 2)
        mat = row[:, 24].astype(jnp.int32)
    else:
        tv = scene["tri_v"][ti]
        tuv = scene["tri_uv"][ti]
        mat = scene["tri_prop"][ti][:, 0]
    if getattr(meta, "n_inst", 0):
        # instanced TLAS hits: object-space uv + world-transformed verts
        is_i = kind == SHAPE_ITRI
        iid = jnp.clip(idx // meta.n_obj_tri, 0,
                       scene["inst_fwd"].shape[0] - 1)
        oid = jnp.clip(idx % meta.n_obj_tri, 0,
                       scene["otri_v"].shape[0] - 1)
        fwd = scene["inst_fwd"][iid]
        ov = scene["otri_v"][oid]
        ov_w = jnp.einsum("nij,nkj->nki", fwd[:, :, :3], ov,
                          precision="highest") + fwd[:, None, :, 3]
        m3 = is_i[:, None, None]
        tv = jnp.where(m3, ov_w, tv)
        tuv = jnp.where(m3, scene["otri_uv"][oid], tuv)
        mat = jnp.where(is_i, scene["otri_prop"][oid][:, 0], mat)
    dxr, dyr, dzr = unpack3(direction)
    e1x, e1y, e1z = (tv[:, 1, 0] - tv[:, 0, 0], tv[:, 1, 1] - tv[:, 0, 1],
                     tv[:, 1, 2] - tv[:, 0, 2])
    e2x, e2y, e2z = (tv[:, 2, 0] - tv[:, 0, 0], tv[:, 2, 1] - tv[:, 0, 1],
                     tv[:, 2, 2] - tv[:, 0, 2])
    hx, hy, hz = scross(dxr, dyr, dzr, e2x, e2y, e2z)
    det = e1x * hx + e1y * hy + e1z * hz
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    sx = origin[:, 0] - tv[:, 0, 0]
    sy = origin[:, 1] - tv[:, 0, 1]
    sz = origin[:, 2] - tv[:, 0, 2]
    bu = (sx * hx + sy * hy + sz * hz) * inv_det
    qx, qy, qz = scross(sx, sy, sz, e1x, e1y, e1z)
    bv = sdot(dxr, dyr, dzr, qx, qy, qz) * inv_det
    bw = 1.0 - bu - bv
    uv = (bu[:, None] * tuv[:, 1] + bv[:, None] * tuv[:, 2]
          + bw[:, None] * tuv[:, 0])
    ngx, ngy, ngz = ssafe_normalize(*scross(e1x, e1y, e1z, e2x, e2y, e2z))
    okn = ok[:, None]
    return dict(
        valid=ok, t=t,
        p_raw=jnp.where(okn, p_raw, 0.0),
        n=jnp.where(okn, pack3(ngx, ngy, ngz),
                    jnp.asarray([0.0, 0.0, 1.0])),
        uv=jnp.where(okn, uv, 0.0),
        mat_id=jnp.where(ok, mat, -1))


# ---------------------------------------------------------------------------
# Shadow predicates
# ---------------------------------------------------------------------------

def occluded(scene, meta, origin, direction, t_max, rand_key=None,
             time=None):
    """Scene::IntersectPred with alpha-tested restarts
    (Primitive.cpp:6-14, Material.hpp:181-198).

    Without alpha materials: one any-hit pass.  With alpha on the Pallas
    backend, the builder splits alpha-material triangles into their own
    pka_* tables, so the predicate is ONE any-hit traversal of the
    opaque set plus a restart chain over only the (small) alpha set +
    analytic prims — the single-pass analog of the reference's in-
    traversal alpha test.  Other backends run the restart chain over
    the whole scene.
    """
    if not meta.has_alpha:
        # opaque scene: pure any-hit (IntersectPred early-out semantics,
        # BVH.hpp:1019-1109)
        if meta.accel == "pallas":
            return _pallas_dispatch(scene, meta, origin, direction,
                                    t_max - SHADOW_EPS,
                                    any_hit=True, time=time)["valid"]
        if meta.accel == "beam":
            from ..accel.beam import beam_intersect
            return beam_intersect(scene, origin, direction,
                                  t_max - SHADOW_EPS, meta.block_k,
                                  any_hit=True,
                                  shapes=(meta.n_tri > 0, meta.n_sph > 0,
                                          meta.n_quad > 0))["valid"]
        if meta.accel == "bvh":
            from ..accel.traverse import bvh_intersect
            return bvh_intersect(scene, origin, direction,
                                 t_max - SHADOW_EPS, any_hit=True)["valid"]
        return intersect(scene, meta, origin, direction,
                         t_max - SHADOW_EPS, time=time)["valid"]

    split = (meta.accel == "pallas"
             and getattr(meta, "alpha_block_k", 0) > 0
             and "pka_tri" in scene)
    if split:
        # ONE slab pre-pass for the whole predicate: the opaque any-hit
        # and every alpha-chain restart dispatch from the same origins
        # (restarts only advance along the ray), so they share the key
        # (keys order work, never change results)
        key0 = (_first_block_key(scene, origin, direction)
                if "pk_blk_lo" in scene and "scene_lo" in scene else None)
        # analytic prims with only opaque materials never need an alpha
        # test: fold them into the single any-hit pass and drop them
        # from every chain iteration (they cost a full-width dense test
        # + interaction merge per restart otherwise)
        ana_alpha = getattr(meta, "analytic_alpha", True)
        occ0 = _pallas_dispatch(scene, meta, origin, direction,
                                t_max - SHADOW_EPS, any_hit=True,
                                time=time, tri_tables="opaque",
                                analytic=not ana_alpha,
                                sort_key=key0)["valid"]

        def make_chain(direction_, key_, time_):
            def chain_isect(o, t_rem):
                # alpha_shadow: with micro-masked tables
                # (alpha_cull_mask) each dispatch resolves definitely-
                # opaque hits IN-KERNEL ("solid" lanes: occluded, no
                # restart needed) and skips definitely-transparent
                # ones, so the chain only iterates on hits that
                # genuinely need the exact texture test
                return _pallas_dispatch(scene, meta, o, direction_,
                                        t_rem, time=time_,
                                        tri_tables="alpha",
                                        analytic=ana_alpha,
                                        sort_key=key_,
                                        alpha_shadow=True)
            if not ana_alpha:
                def chain_inter(h_, o_):
                    return _chain_interaction(scene, meta, o_,
                                              direction_, h_)
            else:
                def chain_inter(h_, o_):
                    return make_interaction(scene, meta, o_, direction_,
                                            h_, time=time_, lite=True)
            return chain_isect, chain_inter
    else:
        occ0 = jnp.zeros((origin.shape[0],), bool)
        key0 = None

        def make_chain(direction_, key_, time_):
            def chain_isect(o, t_rem):
                return intersect(scene, meta, o, direction_, t_rem,
                                 time=time_)

            def chain_inter(h_, o_):
                return make_interaction(scene, meta, o_, direction_, h_,
                                        time=time_, lite=True)
            return chain_isect, chain_inter

    # trip count is data-dependent (the while_loop exits as soon as no
    # lane is marching); the reference loops unbounded (Scene.cpp:8-29,
    # Primitive.cpp:6-14) — 64 is a safety net against degenerate
    # geometry, not a budget (round 1 capped at 8, which silently
    # mis-rendered >8 stacked transparent surfaces)
    max_restarts = 64

    def cond(st):
        _, _, _, live, it_ = st
        return jnp.any(live) & (it_ < max_restarts)

    def make_body(direction_, key_, time_, rand_key_):
        chain_isect, chain_inter = make_chain(direction_, key_, time_)

        def body(st):
            o, t_rem, occ, live, it_ = st
            # finished lanes trace ZERO-length rays (sorted last, tile
            # early exit) — without the mask every restart iteration
            # re-traced the full shadow ray for every resolved lane
            h = chain_isect(o, jnp.where(live, t_rem, 0.0))
            # in-kernel definite occlusion (alpha micro-masks): these
            # lanes carry no candidate hit (valid=False), they're done
            solid_k = h.get("solid", jnp.zeros((o.shape[0],), bool))
            inter = chain_inter(h, o)
            mat_ids = jnp.clip(inter["mat_id"], 0,
                               scene["mat_type"].shape[0] - 1)
            mode = scene["mat_alpha_mode"][mat_ids]
            cutoff = scene["mat_alpha_cutoff"][mat_ids]
            atex = scene["mat_tex"][mat_ids, 4]
            btex = scene["mat_tex"][mat_ids, 0]
            a_from_mask = texture_alpha(scene,
                                        jnp.where(atex >= 0, atex, btex),
                                        inter["uv"])
            if getattr(meta, "mat_tex_present", (True,) * 5)[4]:
                # dedicated alpha textures read channel 0; scenes
                # without any skip the second fetch statically
                a_from_mask = jnp.where(
                    atex >= 0,
                    texture_eval(scene, atex, inter["uv"])[:, 0],
                    a_from_mask)
            u = uniform_from_u32(hash_u32(
                jnp.arange(o.shape[0]), it_,
                0 if rand_key_ is None else rand_key_))
            solid = jnp.where(mode == ALPHA_BLEND, u < a_from_mask,
                              jnp.where(mode == ALPHA_MASK,
                                        a_from_mask > cutoff, True))
            solid = solid | (inter["mat_id"] < 0)  # no material: occluder
            newly_occ = (h["valid"] & solid) | solid_k
            occ = jnp.where(live & newly_occ, True, occ)
            live_next = live & h["valid"] & ~solid & ~solid_k
            # scale-robust advance past the transparent surface
            n_fwd = jnp.where(vdot_k(direction_, inter["n"]) > 0,
                              inter["n"], -inter["n"])
            o = jnp.where(live_next[:, None],
                          offset_ray(inter["p_raw"], n_fwd), o)
            t_rem = jnp.where(live_next, t_rem - h["t"], t_rem)
            return o, t_rem, occ, live_next, it_ + 1
        return body

    n = origin.shape[0]
    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32) - SHADOW_EPS,
                          (n,))
    body = make_body(direction, key0, time, rand_key)
    st = (origin, t0, jnp.zeros((n,), bool),
          jnp.ones((n,), bool) & ~occ0, jnp.asarray(0))
    cap = max(1024, -(-(n // 16) // 1024) * 1024)
    if n < 4096:
        _, _, occ, _, _ = jax.lax.while_loop(cond, body, st)
        return occ0 | occ
    # ---- chain-tail compaction: iteration 0 runs full width (most
    # lanes resolve there — in-kernel solid collapse + exact test);
    # the surviving few-percent then gather into a 1/16-width batch so
    # the remaining restarts stop paying full-width interaction/texture
    # fixed costs (measured: 6 tail iterations at <=2% occupancy cost
    # ~60 ms of a ~125 ms predicate on the faithful scene).  Same
    # compaction exactness notes as trace()'s tail: RNG for BLEND keys
    # on the lane index, which regrouping changes (unbiased; documented
    # exception), everything else is lane-local.
    st = body(st)
    o1, t1, occ1, live1, it1 = st

    def tail_full(_):
        _, _, occf, _, _ = jax.lax.while_loop(cond, body, st)
        return occf

    def tail_compact(_):
        take = jnp.argsort(~live1)[:cap]   # stable: live lanes first
        bodyc = make_body(
            direction[take],
            key0[take] if key0 is not None else None,
            time[take] if time is not None else None,
            rand_key[take] if getattr(rand_key, "ndim", 0) else rand_key)
        sub = (o1[take], t1[take], jnp.zeros((cap,), bool), live1[take],
               it1)
        _, _, occ_s, _, _ = jax.lax.while_loop(cond, bodyc, sub)
        return occ1.at[take].set(occ1[take] | occ_s)

    occ = jax.lax.cond(jnp.sum(live1) <= cap, tail_compact, tail_full,
                       None)
    return occ0 | occ
