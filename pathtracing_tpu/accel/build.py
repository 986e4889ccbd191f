"""Host-side SAH BVH builder -> flattened wide-node device arrays.

Re-designs the reference's BVH pipeline (BVH.hpp) for TPU:

  * same SAH cost model: binned sweep over 3 axes with adaptive bin count
    32/16/8 by span (BVH.hpp:312-313,319-355), leaf when the split cost
    beats the parent cost or span <= leaf size (BVH.hpp:356-369);
  * instead of pointer nodes + SSE recursion, the binary BVH is collapsed
    into W-wide clusters (the BVH8 idea, BVH.hpp:1320-1338: greedily split
    the largest-surface-area child until W children) and flattened to SoA
    arrays the traversal kernel gathers from HBM;
  * front-to-back ordering is done at *traversal* time by sorting the W
    child entry distances per ray (the TPU replacement for the reference's
    precomputed per-ray-sign permutation LUTs, BVH.hpp:562-738 — a data
    dependent gather of 8 f32s + vectorized argsort is cheap on the VPU,
    while sign-indexed LUT gathers would be another memory round-trip).

Build is NumPy (vectorized binning) — the analog of the reference's
multithreaded CPU build; arrays ship to HBM once per scene.

Output arrays (N nodes, W children each):
  bvh_lo    [N, W, 3] f32   child AABB min (empty slot: +inf)
  bvh_hi    [N, W, 3] f32   child AABB max (empty slot: -inf)
  bvh_child [N, W]    i32   >=0: internal node id; <0: leaf code
                            leaf code = -(prim_base * LEAF_SHIFT + count) - 1
  prim_kind [P] i32, prim_idx [P] i32 : BVH leaf order -> scene primitive
"""
from __future__ import annotations

import dataclasses

import numpy as np

W = 8            # children per node
LEAF_MAX = 4     # max primitives per leaf
LEAF_SHIFT = 8   # leaf code packs count in the low bits (count < LEAF_SHIFT)
MAX_STACK = 64   # traversal stack depth bound (checked at build time)


@dataclasses.dataclass(frozen=True)
class BVHMeta:
    n_nodes: int
    n_prims: int
    max_depth: int      # wide-tree depth, for stack sizing
    block_k: int = 0    # beam-traversal prims per block


def _leaf_code(base: int, count: int) -> int:
    assert 0 < count < LEAF_SHIFT
    return -(base * LEAF_SHIFT + count) - 1


def decode_leaf(code):
    """Vectorized leaf decode (used by traversal): (base, count)."""
    v = -(code + 1)
    return v // LEAF_SHIFT, v % LEAF_SHIFT


# ---------------------------------------------------------------------------
# Binary SAH build (BVH.hpp:290-390 cost model, vectorized binning)
# ---------------------------------------------------------------------------

def _sah_build_binary(lo, hi, leaf_size=LEAF_MAX):
    """Returns (nodes, order): nodes is a list of dicts
    {lo, hi, left, right, start, count}; `order` is the permuted prim index
    array; leaves have left == -1 and [start, start+count) in `order`."""
    n = lo.shape[0]
    centroid = 0.5 * (lo + hi)
    order = np.arange(n, dtype=np.int64)
    nodes = []

    def new_node():
        nodes.append(dict(lo=None, hi=None, left=-1, right=-1,
                          start=0, count=0))
        return len(nodes) - 1

    root = new_node()
    # iterative stack build (recursion depth can exceed CPython's limit)
    stack = [(root, 0, n)]
    while stack:
        ni, s, e = stack.pop()
        span = e - s
        idx = order[s:e]
        blo = lo[idx].min(0)
        bhi = hi[idx].max(0)
        nodes[ni]["lo"], nodes[ni]["hi"] = blo, bhi
        if span <= leaf_size:
            nodes[ni].update(start=s, count=span)
            continue

        c = centroid[idx]
        clo, chi = c.min(0), c.max(0)
        cext = chi - clo
        n_bins = 32 if span >= 1024 else (16 if span >= 64 else 8)

        best = (np.inf, -1, -1)  # cost, axis, bin split
        bin_of_axis = {}
        for axis in range(3):
            if cext[axis] <= 1e-12:
                continue
            b = np.minimum(((c[:, axis] - clo[axis]) / cext[axis]
                            * n_bins).astype(np.int64), n_bins - 1)
            bin_of_axis[axis] = b
            # per-bin bbox + count via np.minimum.at
            blo_b = np.full((n_bins, 3), np.inf)
            bhi_b = np.full((n_bins, 3), -np.inf)
            cnt = np.zeros(n_bins, np.int64)
            np.minimum.at(blo_b, b, lo[idx])
            np.maximum.at(bhi_b, b, hi[idx])
            np.add.at(cnt, b, 1)
            # prefix/suffix sweeps
            lcnt = np.cumsum(cnt)[:-1]
            rcnt = span - lcnt
            llo = np.minimum.accumulate(blo_b, 0)[:-1]
            lhi = np.maximum.accumulate(bhi_b, 0)[:-1]
            rlo = np.minimum.accumulate(blo_b[::-1], 0)[::-1][1:]
            rhi = np.maximum.accumulate(bhi_b[::-1], 0)[::-1][1:]

            def area(alo, ahi):
                d = np.maximum(ahi - alo, 0.0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] \
                    + d[:, 2] * d[:, 0]

            cost = area(llo, lhi) * lcnt + area(rlo, rhi) * rcnt
            cost = np.where((lcnt == 0) | (rcnt == 0), np.inf, cost)
            k = int(np.argmin(cost))
            if cost[k] < best[0]:
                best = (cost[k], axis, k)

        d = np.maximum(bhi - blo, 0.0)
        parent_area = d[0] * d[1] + d[1] * d[2] + d[2] * d[0]
        # SAH termination (BVH.hpp:356-360): make a leaf when splitting
        # costs more than testing all prims — but only if the count still
        # fits the leaf encoding.
        leaf_cost = span * parent_area
        if best[1] >= 0 and best[0] >= leaf_cost and span < LEAF_SHIFT:
            nodes[ni].update(start=s, count=span)
            continue
        if best[1] < 0:
            # all centroids coincide: median split to bound depth
            mid = s + span // 2
        else:
            axis, k = best[1], best[2]
            b = bin_of_axis[axis]
            mask = b <= k
            mid = s + int(mask.sum())
            order[s:e] = np.concatenate([idx[mask], idx[~mask]])
            if mid == s or mid == e:
                mid = s + span // 2
        li, ri = new_node(), new_node()
        nodes[ni]["left"], nodes[ni]["right"] = li, ri
        stack.append((ri, mid, e))
        stack.append((li, s, mid))
    return nodes, order


# ---------------------------------------------------------------------------
# Collapse binary -> W-wide (BVH8 greedy expansion, BVH.hpp:1320-1338)
# ---------------------------------------------------------------------------

def _collapse_wide(nodes, order):
    """Collapse the binary tree into W-wide nodes.  Each wide node's child
    list is grown by repeatedly replacing the child with the largest surface
    area by its two binary children (the reference's greedy rule)."""
    n_leaf_chunks = 0

    def area(i):
        d = np.maximum(nodes[i]["hi"] - nodes[i]["lo"], 0.0)
        return float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    wide_lo, wide_hi, wide_child = [], [], []
    out_kind_order = []  # leaf prim ranges in emit order

    # BFS so parents get indices before children (better locality)
    wide_index = {}
    queue = [0]
    wide_index[0] = 0
    wide_lo.append(np.full((W, 3), np.inf, np.float32))
    wide_hi.append(np.full((W, 3), -np.inf, np.float32))
    wide_child.append(np.zeros(W, np.int64))
    depth_of = {0: 1}
    max_depth = 1
    qi = 0
    while qi < len(queue):
        bi = queue[qi]
        wi = wide_index[bi]
        qi += 1
        # expand to up to W binary children
        children = [bi] if nodes[bi]["left"] < 0 else \
            [nodes[bi]["left"], nodes[bi]["right"]]
        while len(children) < W:
            # pick largest-area internal child to split
            cand = [(area(c), j) for j, c in enumerate(children)
                    if nodes[c]["left"] >= 0]
            if not cand:
                break
            _, j = max(cand)
            c = children.pop(j)
            children.extend([nodes[c]["left"], nodes[c]["right"]])

        clo = np.full((W, 3), np.inf, np.float32)
        chi = np.full((W, 3), -np.inf, np.float32)
        cidx = np.zeros(W, np.int64)
        for j, c in enumerate(children):
            clo[j] = nodes[c]["lo"]
            chi[j] = nodes[c]["hi"]
            if nodes[c]["left"] < 0:  # leaf
                s, cnt = nodes[c]["start"], nodes[c]["count"]
                # split over-full leaves into LEAF_MAX chunks is not needed:
                # builder guarantees count <= LEAF_SHIFT-1; chunk if > LEAF_MAX
                cidx[j] = _leaf_code(s, cnt)
                n_leaf_chunks += 1
            else:
                widx = len(wide_lo)
                wide_index[c] = widx
                wide_lo.append(np.full((W, 3), np.inf, np.float32))
                wide_hi.append(np.full((W, 3), -np.inf, np.float32))
                wide_child.append(np.zeros(W, np.int64))
                cidx[j] = widx
                queue.append(c)
                depth_of[c] = depth_of[bi] + 1
                max_depth = max(max_depth, depth_of[c])
        wide_lo[wi] = clo
        wide_hi[wi] = chi
        wide_child[wi] = cidx

    return (np.stack(wide_lo), np.stack(wide_hi),
            np.stack(wide_child).astype(np.int64), max_depth)


# ---------------------------------------------------------------------------
# Public entry: build over the whole scene IR
# ---------------------------------------------------------------------------

SORT_COARSE_G = 8


def sort_key_coarse(lo: np.ndarray, hi: np.ndarray,
                    group: int = SORT_COARSE_G):
    """Coarse unions of `group` consecutive top-level blocks, for the
    HIERARCHICAL dispatch sort key (intersect._first_block_key): the
    pre-pass slabs the ~m/8 coarse boxes first and refines only the
    top-2 groups' members — the full per-ray scan over every block
    measured ~8 ms / 64K rays at m=2563, 3x the traversal it was
    ordering (tools/bench_gather.py, round 3).  Blocks are SAH-ordered
    so consecutive unions stay tight; group=8 + top-2 refinement keeps
    the key near-exact (a 16-wide single-group refinement degraded
    bounce sort quality enough to cost 55 ms of kernel time for the
    6 ms it saved)."""
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    m = len(lo)
    mc = -(-m // group)
    pad = mc * group - m
    lop = np.concatenate([lo, np.full((pad, 3), np.inf, np.float32)])
    hip = np.concatenate([hi, np.full((pad, 3), -np.inf, np.float32)])
    clo = lop.reshape(mc, group, 3).min(1)
    chi = hip.reshape(mc, group, 3).max(1)
    return dict(pk_sblk_lo=clo, pk_sblk_hi=chi)


def _prim_bounds(builder_arrays):
    """AABBs for every primitive in the scene dict (NumPy host arrays)."""
    los, his, kinds, idxs = [], [], [], []
    tri_v = builder_arrays.get("tri_v")
    if tri_v is not None and len(tri_v):
        v = np.asarray(tri_v)                      # [T,3,3]
        los.append(v.min(1)); his.append(v.max(1))
        kinds.append(np.zeros(len(v), np.int64))
        idxs.append(np.arange(len(v), dtype=np.int64))
    sph_c = builder_arrays.get("sph_c")
    if sph_c is not None and len(sph_c):
        c = np.asarray(sph_c); r = np.asarray(builder_arrays["sph_r"])[:, None]
        los.append(c - r); his.append(c + r)
        kinds.append(np.ones(len(c), np.int64))
        idxs.append(np.arange(len(c), dtype=np.int64))
    quad_q = builder_arrays.get("quad_q")
    if quad_q is not None and len(quad_q):
        q = np.asarray(quad_q); u = np.asarray(builder_arrays["quad_u"])
        v2 = np.asarray(builder_arrays["quad_v"])
        pts = np.stack([q, q + u, q + v2, q + u + v2], 1)
        lo = pts.min(1); hi = pts.max(1)
        # pad degenerate axes so the slab test stays well-conditioned
        pad = 1e-4 * np.maximum((hi - lo).max(-1, keepdims=True), 1e-3)
        los.append(lo - pad); his.append(hi + pad)
        kinds.append(np.full(len(q), 2, np.int64))
        idxs.append(np.arange(len(q), dtype=np.int64))
    if not los:
        return None
    return (np.concatenate(los).astype(np.float32),
            np.concatenate(his).astype(np.float32),
            np.concatenate(kinds), np.concatenate(idxs))


def build_bvh(host_arrays, backend: str = "auto"):
    """Build the scene BVH. `host_arrays`: dict with tri_v/sph_c/sph_r/
    quad_q/quad_u/quad_v as (NumPy or JAX) arrays of REAL length (no
    padding rows).  Returns (device_arrays_dict, BVHMeta).

    backend: "auto" prefers the threaded C++ builder (native/, the analog
    of the reference's jthread build) and falls back to NumPy; "numpy" or
    "native" force one."""
    pb = _prim_bounds(host_arrays)
    if pb is None:
        raise ValueError("empty scene")
    lo, hi, kinds, idxs = pb

    result = None
    if backend in ("auto", "native"):
        from ..native.loader import native_build_bvh
        result = native_build_bvh(lo, hi, LEAF_MAX)
        if result is None and backend == "native":
            raise RuntimeError("native BVH builder unavailable")
    if result is not None:
        wlo, whi, wchild, order, depth = result
    else:
        nodes, order = _sah_build_binary(lo, hi, leaf_size=LEAF_MAX)
        wlo, whi, wchild, depth = _collapse_wide(nodes, order)
    assert depth * (W - 1) + 1 < MAX_STACK * (W - 1), "stack bound"
    arrays = dict(
        bvh_lo=wlo.astype(np.float32),
        bvh_hi=whi.astype(np.float32),
        bvh_child=wchild.astype(np.int32),
        prim_kind=kinds[order].astype(np.int32),
        prim_idx=idxs[order].astype(np.int32),
    )
    # beam-traversal block cut over the same SAH order (accel/beam.py);
    # its padded prim tables supersede the unpadded ones (indices of the
    # unpadded prefix are unchanged, so BVH leaf codes stay valid)
    from .beam import build_blocks, beam_tables
    blocks, _m = build_blocks(lo, hi, kinds, idxs, order)
    arrays.update(blocks)
    quad_u = host_arrays.get("quad_u")
    if host_arrays.get("quad_q") is not None and \
            host_arrays.get("quad_n") is None and quad_u is not None:
        # derive plane data when the caller passed only q/u/v
        q = np.asarray(host_arrays["quad_q"], np.float32)
        u = np.asarray(quad_u, np.float32)
        v = np.asarray(host_arrays["quad_v"], np.float32)
        raw = np.cross(u, v)
        len2 = np.maximum((raw * raw).sum(-1, keepdims=True), 1e-20)
        host_arrays = dict(host_arrays, quad_n=raw / np.sqrt(len2),
                           quad_d=((raw / np.sqrt(len2)) * q).sum(-1),
                           quad_w=raw / len2)
    arrays.update(beam_tables(
        tri_v=host_arrays.get("tri_v"), sph_c=host_arrays.get("sph_c"),
        sph_r=host_arrays.get("sph_r"), quad_q=host_arrays.get("quad_q"),
        quad_u=host_arrays.get("quad_u"), quad_v=host_arrays.get("quad_v"),
        quad_n=host_arrays.get("quad_n"), quad_d=host_arrays.get("quad_d"),
        quad_w=host_arrays.get("quad_w")))
    meta = BVHMeta(n_nodes=len(wlo), n_prims=len(order), max_depth=depth,
                   block_k=int(blocks["blk_k"][0]))
    return arrays, meta
