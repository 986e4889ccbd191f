"""Batched stackless-ish BVH traversal in pure JAX (XLA).

The reference traverses its BVH per-ray with SSE/AVX recursion over a
thread-local stack (BVH.hpp:1111-1211,1454-1542).  The TPU redesign keeps
thousands of rays in lockstep: every ray carries a small traversal stack in
a [N, S] register/VMEM array, one `lax.while_loop` iteration pops one node
per ray, slab-tests its W child boxes on the VPU, orders hits front-to-back
by a vectorized argsort of the W entry distances (replacing the reference's
per-ray-sign permutation LUTs, BVH.hpp:562-738), and pushes survivors.
Leaves test up to LEAF_MAX primitives (Möller–Trumbore / sphere quadratic /
quad plane in masked lockstep).  Stack entries carry the entry distance so
stale pushes are t-max-culled at pop time, exactly like the reference's
`entryDist` stack (BVH.hpp:1129-1135).

This module is the correctness-first XLA version; a Pallas kernel with the
same node layout can slot in underneath without changing callers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import BIG_F32, SHADOW_EPS
from .build import W, LEAF_MAX, LEAF_SHIFT, MAX_STACK
from ..scene.types import SHAPE_TRI, SHAPE_SPH, SHAPE_QUAD


def _slab_w(o, inv_d, t_min, t_max, lo, hi):
    """Slab test of each ray against its W child boxes.
    o [N,3], inv_d [N,3], lo/hi [N,W,3].  Returns entry distance or +inf
    (AABB::HitDistance semantics, AABB.hpp:99-141)."""
    t0 = (lo - o[:, None, :]) * inv_d[:, None, :]
    t1 = (hi - o[:, None, :]) * inv_d[:, None, :]
    tn = jnp.minimum(t0, t1).max(-1)
    tf = jnp.maximum(t0, t1).min(-1)
    tn = jnp.maximum(tn, t_min[:, None])
    tf = jnp.minimum(tf, t_max[:, None])
    # empty slots are (lo=+inf, hi=-inf); inf arithmetic lets them sneak
    # through the clamped comparison, so mask them explicitly
    nonempty = jnp.all(lo <= hi, -1)
    hit = (tn <= tf) & nonempty
    return jnp.where(hit, tn, BIG_F32)


def _leaf_test(scene, o, d, t_min, t_max, base, count):
    """Test up to LEAF_MAX primitives (prim table order) per ray.
    Returns (t, kind, idx, valid) of the closest hit in the leaf."""
    n = o.shape[0]
    slots = jnp.arange(LEAF_MAX, dtype=jnp.int32)[None, :]       # [1,L]
    pidx = base[:, None] + slots                                  # [N,L]
    live = slots < count[:, None]
    pidx = jnp.clip(pidx, 0, scene["prim_kind"].shape[0] - 1)
    kind = scene["prim_kind"][pidx]
    idx = scene["prim_idx"][pidx]

    # --- triangles (Möller–Trumbore, two-sided; Shape.cpp:246-267)
    ti = jnp.clip(idx, 0, scene["tri_v"].shape[0] - 1)
    tv = scene["tri_v"][ti]                                       # [N,L,3,3]
    e1 = tv[..., 1, :] - tv[..., 0, :]
    e2 = tv[..., 2, :] - tv[..., 0, :]
    h = jnp.cross(d[:, None, :], e2)
    det = jnp.sum(e1 * h, -1)
    near0 = jnp.abs(det) < 1e-9
    inv_det = 1.0 / jnp.where(near0, 1.0, det)
    s = o[:, None, :] - tv[..., 0, :]
    u = jnp.sum(s * h, -1) * inv_det
    q = jnp.cross(s, e1)
    v = jnp.sum(d[:, None, :] * q, -1) * inv_det
    t_tri = jnp.sum(e2 * q, -1) * inv_det
    ok_tri = (~near0 & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1))

    # --- spheres (both roots; Shape.cpp:3-56)
    si = jnp.clip(idx, 0, scene["sph_c"].shape[0] - 1)
    oc = o[:, None, :] - scene["sph_c"][si]
    a = jnp.sum(d * d, -1)[:, None]
    b = jnp.sum(oc * d[:, None, :], -1)
    cc = jnp.sum(oc * oc, -1) - scene["sph_r"][si] ** 2
    disc = b * b - a * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / a
    t1 = (-b + sq) / a
    t0v = (disc > 0) & (t0 > t_min[:, None])
    t_sph = jnp.where(t0v, t0, t1)
    ok_sph = (disc > 0) & (t_sph > t_min[:, None])

    # --- quads (two-sided parallelogram; Shape.cpp:320-358)
    qi = jnp.clip(idx, 0, scene["quad_q"].shape[0] - 1)
    qn = scene["quad_n"][qi]
    qd = scene["quad_d"][qi]
    flip = jnp.sum(d[:, None, :] * qn, -1) > 0
    nn = jnp.where(flip[..., None], -qn, qn)
    dd_s = jnp.where(flip, -qd, qd)
    denom = jnp.sum(nn * d[:, None, :], -1)
    small = jnp.abs(denom) < 1e-8
    t_quad = (dd_s - jnp.sum(nn * o[:, None, :], -1)) \
        / jnp.where(small, 1.0, denom)
    pq = o[:, None, :] + t_quad[..., None] * d[:, None, :] \
        - scene["quad_q"][qi]
    alpha = jnp.sum(scene["quad_w"][qi] * jnp.cross(pq, scene["quad_v"][qi]),
                    -1)
    beta = jnp.sum(scene["quad_w"][qi] * jnp.cross(scene["quad_u"][qi], pq),
                   -1)
    ok_quad = (~small & (alpha >= 0) & (alpha <= 1)
               & (beta >= 0) & (beta <= 1))

    t = jnp.where(kind == SHAPE_TRI, t_tri,
                  jnp.where(kind == SHAPE_SPH, t_sph, t_quad))
    ok = jnp.where(kind == SHAPE_TRI, ok_tri,
                   jnp.where(kind == SHAPE_SPH, ok_sph, ok_quad))
    ok = ok & live & (t >= t_min[:, None]) & (t < t_max[:, None])
    t = jnp.where(ok, t, BIG_F32)
    j = jnp.argmin(t, axis=1)
    ar = jnp.arange(n)
    return (t[ar, j], kind[ar, j], idx[ar, j], ok[ar, j])


def bvh_intersect(scene, origin, direction, t_max, t_min=None,
                  any_hit: bool = False):
    """Closest-hit (or any-hit) BVH traversal for a ray batch.

    Returns dict(t, kind, idx, valid) matching the brute-force
    `scene.intersect.intersect` contract.  With any_hit=True, terminates
    lanes on the first accepted hit (shadow-ray IntersectPred semantics,
    BVH.hpp:1019-1109 — no front-to-back ordering needed).
    """
    n = origin.shape[0]
    t_min = jnp.full((n,), SHADOW_EPS) if t_min is None else t_min
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    inv_d = 1.0 / jnp.where(jnp.abs(direction) < 1e-32,
                            jnp.where(direction < 0, -1e-32, 1e-32),
                            direction)

    stack_n = jnp.zeros((n, MAX_STACK), jnp.int32)       # node/leaf codes
    stack_t = jnp.full((n, MAX_STACK), BIG_F32)          # entry distances
    sp = jnp.ones((n,), jnp.int32)                       # root pre-pushed
    stack_t = stack_t.at[:, 0].set(0.0)

    state = dict(
        sp=sp, stack_n=stack_n, stack_t=stack_t,
        best_t=t_max, best_kind=jnp.full((n,), -1, jnp.int32),
        best_idx=jnp.zeros((n,), jnp.int32),
        done=jnp.zeros((n,), bool),
    )

    lane = jnp.arange(n)

    def cond(st):
        return jnp.any(~st["done"] & (st["sp"] > 0))

    def body(st):
        active = ~st["done"] & (st["sp"] > 0)
        spi = jnp.maximum(st["sp"] - 1, 0)
        code = st["stack_n"][lane, spi]
        entry = st["stack_t"][lane, spi]
        sp = jnp.where(active, st["sp"] - 1, st["sp"])
        # t-max culling at pop (reference entryDist stack)
        stale = entry >= st["best_t"]
        work = active & ~stale

        is_leaf = code < 0
        # ---- leaf: primitive tests
        leaf_val = -(code + 1)
        base = leaf_val // LEAF_SHIFT
        cnt = jnp.where(work & is_leaf, leaf_val % LEAF_SHIFT, 0)
        lt, lk, li, lok = _leaf_test(scene, origin, direction, t_min,
                                     st["best_t"], base, cnt)
        better = lok & (lt < st["best_t"]) & work & is_leaf
        best_t = jnp.where(better, lt, st["best_t"])
        best_kind = jnp.where(better, lk, st["best_kind"])
        best_idx = jnp.where(better, li, st["best_idx"])
        done = st["done"] | (better if any_hit else jnp.zeros_like(better))

        # ---- internal: child slab tests + ordered push
        node = jnp.clip(code, 0, scene["bvh_lo"].shape[0] - 1)
        clo = scene["bvh_lo"][node]                       # [N,W,3]
        chi = scene["bvh_hi"][node]
        child = scene["bvh_child"][node]                  # [N,W]
        dist = _slab_w(origin, inv_d, t_min, best_t, clo, chi)
        is_int = work & ~is_leaf
        dist = jnp.where(is_int[:, None], dist, BIG_F32)
        # empty slots have lo=+inf/hi=-inf so the slab test misses them
        hit_mask = dist < BIG_F32
        # farthest-first push order => nearest on top of the stack
        ordr = jnp.argsort(-dist, axis=1)                 # [N,W]
        d_sorted = jnp.take_along_axis(dist, ordr, 1)
        c_sorted = jnp.take_along_axis(child, ordr, 1)
        h_sorted = jnp.take_along_axis(hit_mask, ordr, 1)
        n_push = h_sorted.sum(1)
        # position of each pushed child on the stack: hits are at the END
        # of the sorted row (misses sort first with -inf..), so slot k
        # (k over W) goes to sp + (k - (W - n_push)) for hit slots.
        slot = jnp.cumsum(h_sorted.astype(jnp.int32), axis=1) - 1
        pos = sp[:, None] + slot
        pos = jnp.where(h_sorted, pos, MAX_STACK)         # drop misses
        stack_n = st["stack_n"].at[lane[:, None], pos].set(
            c_sorted, mode="drop")
        stack_t = st["stack_t"].at[lane[:, None], pos].set(
            d_sorted, mode="drop")
        sp = jnp.where(is_int, sp + n_push, sp)

        return dict(sp=sp, stack_n=stack_n, stack_t=stack_t,
                    best_t=best_t, best_kind=best_kind, best_idx=best_idx,
                    done=done)

    st = jax.lax.while_loop(cond, body, state)
    valid = st["best_kind"] >= 0
    return dict(t=jnp.where(valid, st["best_t"], BIG_F32),
                kind=st["best_kind"], idx=st["best_idx"], valid=valid)
