"""In-kernel alpha micro-mask tests (scene/alphamask.py).

The masks are a conservative in-traversal alpha test (the reference
does the exact test inside traversal, Primitive.cpp:6-14); correctness
contract:
  * classifier cells are conservative vs the exact bilinear alpha test;
  * the shadow predicate with masks is IDENTICAL to the restart-chain
    predicate without them for deterministic (MASK-mode) materials;
  * the masked closest pass only drops hits whose exact test would
    fail (transparent-definite) — every surviving hit agrees.
"""
import math
import os

import numpy as np
import pytest
import jax.numpy as jnp

from pathtracing_tpu.scene.textures import TexturePool
from pathtracing_tpu.scene.alphamask import build_tri_alpha_masks
from pathtracing_tpu.scene.intersect import occluded, intersect


def _leaf_tex(k=64):
    u, v = np.meshgrid((np.arange(k) + 0.5) / k, (np.arange(k) + 0.5) / k)
    leaf = np.zeros((k, k, 4), np.float32)
    leaf[..., 1] = 0.5
    leaf[..., 3] = ((((u - 0.5) / 0.38) ** 2
                     + ((v - 0.5) / 0.47) ** 2) < 1.0).astype(np.float32)
    return leaf


def _bilinear_alpha(plane, tx, ty):
    k_h, k_w = plane.shape
    x = tx * k_w - 0.5
    y = ty * k_h - 0.5
    xi = np.floor(x).astype(int)
    yi = np.floor(y).astype(int)
    dx = x - xi
    dy = y - yi

    def f(xx, yy):
        return plane[np.mod(yy, k_h), np.mod(xx, k_w)]

    return ((1 - dx) * (1 - dy) * f(xi, yi) + dx * (1 - dy) * f(xi + 1, yi)
            + (1 - dx) * dy * f(xi, yi + 1) + dx * dy * f(xi + 1, yi + 1))


def test_classifier_conservative():
    """No opaque cell may contain a failing point; no transparent cell a
    passing one — checked against dense sampling through the kernel's
    own (bf16 affine map, f32) cell computation."""
    rng = np.random.default_rng(0)
    leaf = _leaf_tex(64)
    pool = TexturePool()
    tid = pool.add_image(leaf)
    uvs = np.concatenate([
        np.array([[[0, 0], [1, 0], [1, 1]], [[0, 0], [1, 1], [0, 1]]],
                 np.float32),
        (rng.random((30, 3, 2)) * 1.4 - 0.2).astype(np.float32)], 0)
    n = len(uvs)
    rows = build_tri_alpha_masks(uvs, np.zeros(n, np.int64), pool,
                                 [2], [0.5], [[tid, -1, -1, -1, -1]])
    words = rows[:, 3:7].view(np.uint32)
    S = 64
    uu, vv = np.meshgrid((np.arange(S) + 0.5) / S,
                         (np.arange(S) + 0.5) / S)
    m = uu + vv <= 1.0
    uu, vv = uu[m].astype(np.float32), vv[m].astype(np.float32)
    classified = np.zeros(3, np.int64)
    for t in range(n):
        wi = rows[t, 0:3].view(np.uint32)
        bq = ((wi << 16) & 0xFFFF0000).view(np.float32)
        cq = (wi & 0xFFFF0000).view(np.float32)
        gx = (bq[0] + bq[1] * uu + bq[2] * vv).astype(np.float32)
        gy = (cq[0] + cq[1] * uu + cq[2] * vv).astype(np.float32)
        cell = (np.clip(np.floor(gy), 0, 7).astype(int) * 8
                + np.clip(np.floor(gx), 0, 7).astype(int))
        w = words[t]
        opq = (w[cell // 32] >> (cell % 32)) & 1
        mix = (w[2 + cell // 32] >> (cell % 32)) & 1
        uv0, uv1, uv2 = uvs[t]
        tx = uv0[0] + uu * (uv1[0] - uv0[0]) + vv * (uv2[0] - uv0[0])
        ty = uv0[1] + uu * (uv1[1] - uv0[1]) + vv * (uv2[1] - uv0[1])
        solid = _bilinear_alpha(leaf[..., 3], tx, ty) > 0.5
        assert not ((opq == 1) & ~solid).any(), t
        assert not ((opq == 0) & (mix == 0) & solid).any(), t
        classified[0] += (opq == 1).sum()
        classified[1] += ((opq == 0) & (mix == 0)).sum()
        classified[2] += (mix == 1).sum()
    # the masks must actually resolve a useful fraction (not all-mixed)
    assert classified[0] + classified[1] > 0.3 * classified.sum()


@pytest.fixture(scope="module")
def foliage_scenes():
    """(masked, unmasked) builds of an alpha-card scene on the two-level
    Pallas kernel (PT_TWOLEVEL_MIN forces two-level at test scale)."""
    saved = {k: os.environ.get(k) for k in
             ("PT_ALPHA_MASK", "PT_TWOLEVEL_MIN")}

    def build(mask_on, blend=False):
        os.environ["PT_ALPHA_MASK"] = "1" if mask_on else "0"
        os.environ["PT_TWOLEVEL_MIN"] = "256"
        from pathtracing_tpu.scene.builder import SceneBuilder
        rng = np.random.default_rng(7)
        b = SceneBuilder()
        tid = b.textures.add_image(_leaf_tex(64))
        leaf_mat = b.add_diffuse((0.3, 0.6, 0.3), base_tex=tid,
                                 alpha_mode=1 if blend else 2,
                                 alpha_cutoff=0.5)
        opaque_mat = b.add_diffuse((0.7, 0.7, 0.7))
        N = 60
        gx, gz = np.meshgrid(np.linspace(-10, 10, N + 1),
                             np.linspace(-10, 10, N + 1))
        V, F = [], []
        for i in range(N):
            for j in range(N):
                i0 = len(V)
                V += [[gx[i, j], 0, gz[i, j]], [gx[i, j + 1], 0,
                                                gz[i, j + 1]],
                      [gx[i + 1, j + 1], 0, gz[i + 1, j + 1]],
                      [gx[i + 1, j], 0, gz[i + 1, j]]]
                F += [[i0, i0 + 1, i0 + 2], [i0, i0 + 2, i0 + 3]]
        b.add_mesh(np.asarray(V, np.float32), np.asarray(F, np.int32),
                   material=opaque_mat)
        for _ in range(300):
            c = np.array([rng.uniform(-8, 8), rng.uniform(0.5, 4),
                          rng.uniform(-8, 8)])
            s = rng.uniform(0.5, 1.5)
            ry = rng.uniform(0, np.pi)
            ux = np.array([np.cos(ry), 0, np.sin(ry)]) * s
            uy = np.array([0, 1.0, 0]) * s
            V2 = np.array([c - 0.5 * ux, c + 0.5 * ux, c + 0.5 * ux + uy,
                           c - 0.5 * ux + uy], np.float32)
            b.add_mesh(V2, np.array([[0, 1, 2], [0, 2, 3]], np.int32),
                       uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]],
                                    np.float32),
                       material=leaf_mat)
        b.add_quad([-1, 8, -1], [2, 0, 0], [0, 0, 2],
                   emission=(10, 10, 10))
        b.set_camera([0, 3, -12], [0, 1, 0], math.radians(45), (64, 48))
        return b.build()

    out = dict(masked=build(True), unmasked=build(False),
               masked_blend=build(True, blend=True))
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    return out


def _rays(n=2048):
    rng = np.random.default_rng(3)
    o = np.stack([rng.uniform(-9, 9, n), rng.uniform(0.1, 5, n),
                  rng.uniform(-9, 9, n)], -1).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d), jnp.full((n,), 12.0)


def test_masked_shadow_predicate_exact(foliage_scenes):
    """MASK-mode occlusion is deterministic: masked == unmasked lane for
    lane, and the in-kernel solid collapse actually fires."""
    scene1, _, meta1 = foliage_scenes["masked"]
    scene0, _, meta0 = foliage_scenes["unmasked"]
    assert meta1.alpha_cull_mask and not meta0.alpha_cull_mask
    assert "pka_l1_base" in scene1
    o, d, tm = _rays()
    occ1 = np.asarray(occluded(scene1, meta1, o, d, tm, rand_key=5))
    occ0 = np.asarray(occluded(scene0, meta0, o, d, tm, rand_key=5))
    np.testing.assert_array_equal(occ1, occ0)
    # per-lane rand_key arrays (production passes alpha_salt [n]) must
    # survive the chain-tail compaction gather
    rk = jnp.arange(o.shape[0], dtype=jnp.uint32)
    occ_rk = np.asarray(occluded(scene1, meta1, o, d, tm, rand_key=rk))
    np.testing.assert_array_equal(occ_rk, occ0)
    assert 0.2 < occ0.mean() < 0.9
    # the mode-2 kernel must resolve a real fraction in-kernel
    from pathtracing_tpu.scene.intersect import _pallas_dispatch
    h = _pallas_dispatch(scene1, meta1, o, d, tm, tri_tables="alpha",
                         analytic=False, alpha_shadow=True)
    solid = np.asarray(h["solid"])
    assert solid.any(), "in-kernel solid collapse never fired"
    assert (solid & np.asarray(occ1)).sum() == solid.sum(), \
        "kernel-solid lane not occluded"


def test_masked_closest_consistent(foliage_scenes):
    """The masked closest pass drops ONLY definitely-transparent hits:
    every masked hit exists unmasked no closer; every unmasked hit that
    tests solid exactly survives at the same t."""
    scene1, _, meta1 = foliage_scenes["masked"]
    scene0, _, meta0 = foliage_scenes["unmasked"]
    o, d, tm = _rays()
    h1 = intersect(scene1, meta1, o, d, tm)
    h0 = intersect(scene0, meta0, o, d, tm)
    t1, t0 = np.asarray(h1["t"]), np.asarray(h0["t"])
    v1, v0 = np.asarray(h1["valid"]), np.asarray(h0["valid"])
    # masked is a filtered view: never finds anything unmasked misses
    assert not (v1 & ~v0).any()
    assert not (v1 & v0 & (t0 > t1 + 1e-4)).any()
    # fewer-or-equal hits, and some actually culled at this scale
    assert v1.sum() <= v0.sum()
    # unmasked hits whose exact alpha test PASSES must be identical
    from pathtracing_tpu.scene.intersect import make_interaction
    from pathtracing_tpu.scene.textures import texture_alpha
    inter = make_interaction(scene0, meta0, o, d, h0, lite=True)
    mid = np.asarray(inter["mat_id"])
    mode = np.asarray(scene0["mat_alpha_mode"])[np.clip(mid, 0, None)]
    a = np.asarray(texture_alpha(
        scene0, scene0["mat_tex"][jnp.clip(inter["mat_id"], 0), 0],
        inter["uv"]))
    cut = np.asarray(scene0["mat_alpha_cutoff"])[np.clip(mid, 0, None)]
    solid_exact = v0 & ((mode != 2) | (a > cut))
    keep = solid_exact
    assert np.all(v1[keep]), "masked pass dropped an exactly-solid hit"
    np.testing.assert_allclose(t1[keep], t0[keep], rtol=1e-5)


def test_masked_blend_statistical(foliage_scenes):
    """BLEND-mode masks only mark provably-0/1 alpha cells (the binary
    leaf texture has both); everything else is mixed and stays
    stochastic, so the occlusion RATE must match the chain's within
    noise (per-sample equality is not expected: the chain's RNG is
    keyed by restart iteration, which the mask path compresses)."""
    scene1, _, meta1 = foliage_scenes["masked_blend"]
    assert meta1.alpha_cull_mask
    scene0, _, meta0 = foliage_scenes["unmasked"]
    # flip the unmasked leaf material to BLEND on the fly (mode is
    # data, and the unmasked chain reads no mask rows)
    s0 = dict(scene0, mat_alpha_mode=jnp.where(
        scene0["mat_alpha_mode"] == 2, 1, scene0["mat_alpha_mode"]))
    o, d, tm = _rays(1024)
    r1 = []
    r0 = []
    for key in range(8):
        r1.append(np.asarray(occluded(scene1, meta1, o, d, tm,
                                      rand_key=key)).mean())
        r0.append(np.asarray(occluded(s0, meta0, o, d, tm,
                                      rand_key=key)).mean())
    assert abs(np.mean(r1) - np.mean(r0)) < 0.02


def test_masked_single_level_kernel():
    """Alpha micro-masks through the SINGLE-level kernel (alpha sets
    <= 64K tris build pallas_trace tables): shadow-predicate parity
    with the unmasked chain, and the builder attaches masks without
    the PT_TWOLEVEL_MIN override."""
    saved = {k: os.environ.get(k) for k in ("PT_ALPHA_MASK",)}

    def build(mask_on):
        os.environ["PT_ALPHA_MASK"] = "1" if mask_on else "0"
        from pathtracing_tpu.scene.builder import SceneBuilder
        rng = np.random.default_rng(11)
        b = SceneBuilder()
        tid = b.textures.add_image(_leaf_tex(64))
        lm = b.add_diffuse((0.3, 0.6, 0.3), base_tex=tid, alpha_mode=2,
                           alpha_cutoff=0.5)
        om = b.add_diffuse((0.7, 0.7, 0.7))
        N = 50
        gx, gz = np.meshgrid(np.linspace(-10, 10, N + 1),
                             np.linspace(-10, 10, N + 1))
        V, F = [], []
        for i in range(N):
            for j in range(N):
                i0 = len(V)
                V += [[gx[i, j], 0, gz[i, j]],
                      [gx[i, j + 1], 0, gz[i, j + 1]],
                      [gx[i + 1, j + 1], 0, gz[i + 1, j + 1]],
                      [gx[i + 1, j], 0, gz[i + 1, j]]]
                F += [[i0, i0 + 1, i0 + 2], [i0, i0 + 2, i0 + 3]]
        b.add_mesh(np.asarray(V, np.float32), np.asarray(F, np.int32),
                   material=om)
        for _ in range(200):
            c = np.array([rng.uniform(-8, 8), rng.uniform(0.5, 4),
                          rng.uniform(-8, 8)])
            s = rng.uniform(0.5, 1.5)
            ry = rng.uniform(0, np.pi)
            ux = np.array([np.cos(ry), 0, np.sin(ry)]) * s
            uy = np.array([0, 1.0, 0]) * s
            V2 = np.array([c - 0.5 * ux, c + 0.5 * ux,
                           c + 0.5 * ux + uy, c - 0.5 * ux + uy],
                          np.float32)
            b.add_mesh(V2, np.array([[0, 1, 2], [0, 2, 3]], np.int32),
                       uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]],
                                    np.float32),
                       material=lm)
        b.add_quad([-1, 8, -1], [2, 0, 0], [0, 0, 2],
                   emission=(10, 10, 10))
        b.set_camera([0, 3, -12], [0, 1, 0], math.radians(45), (64, 48))
        return b.build()

    try:
        scene1, _, meta1 = build(True)
        scene0, _, meta0 = build(False)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert meta1.alpha_cull_mask and not meta0.alpha_cull_mask
    assert "pka_tri" in scene1 and "pka_l1_base" not in scene1, \
        "expected a SINGLE-level alpha table"
    o, d, tm = _rays(1024)
    occ1 = np.asarray(occluded(scene1, meta1, o, d, tm, rand_key=5))
    occ0 = np.asarray(occluded(scene0, meta0, o, d, tm, rand_key=5))
    np.testing.assert_array_equal(occ1, occ0)
