"""Feature parity: motion blur, procedural sky, model instancing
(reference: AnimatedPrimitive Primitive.hpp:52-66, FunctionInfiniteLight
Light.cpp:52-107, TransformedPrimitive + ResourceManager caching)."""
import math

import numpy as np
import jax.numpy as jnp

from pathtracing_tpu.scene.builder import SceneBuilder
from pathtracing_tpu.core.rng import SamplerConfig
from pathtracing_tpu.integrators.path import RenderConfig
from pathtracing_tpu.integrators.render import render_image


def _moving_sphere_scene(velocity, shutter):
    b = SceneBuilder()
    m = b.add_diffuse((0.9, 0.2, 0.2))
    b.add_sphere([0, 0, 0], 0.8, material=m, velocity=velocity)
    b.add_uniform_inf_light((1.0, 1.0, 1.0))
    b.set_camera([0, 0, -5], [0, 0, 0], math.radians(40), (32, 32),
                 shutter=shutter)
    return b.build()


def test_motion_blur_smears():
    cfg = RenderConfig(spp=16, max_depth=2,
                       sampler=SamplerConfig(x_samples=4, y_samples=4))
    static = np.asarray(render_image(*_moving_sphere_scene((0, 0, 0),
                                                           (0.0, 1.0)), cfg))
    moving = np.asarray(render_image(*_moving_sphere_scene((2.5, 0, 0),
                                                           (0.0, 1.0)), cfg))
    # the sphere silhouette must widen along +x: columns right of the
    # static silhouette gain coverage
    cover_s = (static.mean(-1) > 0.99).mean()   # sky is 1.0; sphere darker
    cover_m = (moving.mean(-1) > 0.99).mean()
    assert cover_m < cover_s  # blurred sphere covers more pixels
    assert not np.allclose(static, moving, atol=1e-3)


def test_motion_blur_with_regeneration():
    """Refilled lanes must carry their own shutter-lerped ray time: a
    regenerative render of a moving sphere matches the wave form."""
    import dataclasses
    from pathtracing_tpu.integrators.render import render
    scene, cam, meta = _moving_sphere_scene((2.5, 0, 0), (0.0, 1.0))
    cfg = RenderConfig(spp=4, max_depth=3, rays_per_batch=256,
                       sampler=SamplerConfig(x_samples=2, y_samples=2))
    f0 = render(scene, cam, meta, cfg)
    f1 = render(scene, cam, meta, dataclasses.replace(cfg,
                                                      regenerate=True))
    np.testing.assert_allclose(np.asarray(f1["rgb"]),
                               np.asarray(f0["rgb"]),
                               atol=1e-5, rtol=1e-5)


def test_zero_shutter_matches_static():
    cfg = RenderConfig(spp=4, max_depth=2)
    a = np.asarray(render_image(*_moving_sphere_scene((0, 0, 0),
                                                      (0.0, 0.0)), cfg))
    b = np.asarray(render_image(*_moving_sphere_scene((2.5, 0, 0),
                                                      (0.0, 0.0)), cfg))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_function_inf_light_bakes_correctly():
    from pathtracing_tpu.scene.textures import texture_eval
    from pathtracing_tpu.core.math import sphere_uv

    def sky(dirs):
        up = np.clip(dirs[:, 1], 0, 1)[:, None]
        return up * np.asarray([[0.3, 0.5, 1.0]]) \
            + (1 - up) * np.asarray([[1.0, 0.6, 0.3]])

    b = SceneBuilder()
    lid = b.add_function_inf_light(sky, nx=128, ny=64)
    b.add_sphere([0, 0, 0], 1.0, material=b.add_diffuse((0.5, 0.5, 0.5)))
    b.set_camera([0, 0, -4], [0, 0, 0], math.radians(30), (8, 8))
    scene, cam, meta = b.build()
    assert meta.n_inf == 1

    rng = np.random.default_rng(0)
    d = rng.normal(0, 1, (256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    uv = sphere_uv(jnp.asarray(d))
    tex_ids = jnp.full((256,), int(scene["light_emtex"][lid]), jnp.int32)
    got = np.asarray(texture_eval(scene, tex_ids, uv))
    want = sky(d)
    np.testing.assert_allclose(got, want, atol=0.05)  # bilinear + quantized


def test_model_instancing():
    b = SceneBuilder()
    V = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    F = np.asarray([[0, 1, 2]], np.int32)
    mat = b.add_diffuse((0.5, 0.5, 0.5))
    mid = b.add_model(V, F, material=mat)
    tf = np.eye(4, dtype=np.float32)
    b.add_model_instance(mid, tf)
    tf2 = np.eye(4, dtype=np.float32)
    tf2[:3, 3] = [3, 0, 0]
    b.add_model_instance(mid, tf2)
    b.add_uniform_inf_light((1, 1, 1))
    b.set_camera([0, 0, -5], [0, 0, 0], math.radians(40), (8, 8))
    scene, cam, meta = b.build()
    assert meta.n_tri == 2
    v = np.asarray(scene["tri_v"])
    np.testing.assert_allclose(v[1, 0], [3, 0, 0], atol=1e-6)


def test_runtime_instancing_matches_duplication():
    """runtime=True instances (object-space ray transform at trace time,
    TransformedPrimitive) render like duplicated world-space geometry."""
    V = np.asarray([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1],
                    [0, 1.2, 0]], np.float32)
    F = np.asarray([[0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4],
                    [0, 2, 1], [0, 3, 2]], np.int32)   # a little pyramid

    def tf(tx, ty, tz, s=1.0, ry=0.0):
        c, si = math.cos(ry), math.sin(ry)
        m = np.asarray([[c * s, 0, si * s, tx],
                        [0, s, 0, ty],
                        [-si * s, 0, c * s, tz],
                        [0, 0, 0, 1]], np.float32)
        return m

    transforms = [tf(-2, 0, 0), tf(2, 0, 1, s=1.5, ry=0.7),
                  tf(0, 0, -2, s=0.7, ry=2.1)]

    def build(runtime):
        b = SceneBuilder()
        mat = b.add_diffuse((0.7, 0.5, 0.3))
        mid = b.add_model(V, F, material=mat)
        for t in transforms:
            b.add_model_instance(mid, t, runtime=runtime)
        b.add_quad([-6, 0, -6], [12, 0, 0], [0, 0, 12],
                   material=b.add_diffuse((0.5, 0.5, 0.5)))
        b.add_uniform_inf_light((1.0, 1.0, 1.0))
        b.set_camera([0, 4, -7], [0, 0.5, 0], math.radians(40), (32, 32))
        return b.build()

    scene_r, cam, meta_r = build(True)
    scene_d, _, meta_d = build(False)
    assert meta_r.n_inst == 3 and meta_r.n_obj_tri == 6
    assert meta_d.n_inst == 0 and meta_d.n_tri == 18
    cfg = RenderConfig(spp=4, max_depth=3,
                       sampler=SamplerConfig(x_samples=2, y_samples=2))
    img_r = np.asarray(render_image(scene_r, cam, meta_r, cfg))
    img_d = np.asarray(render_image(scene_d, cam, meta_d, cfg))
    # same geometry, same sampler: should agree everywhere except float
    # noise from the different transform application order
    close = np.isclose(img_r, img_d, rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.98, close.mean()


def test_runtime_instancing_pallas_kernel():
    """The instanced Pallas kernel (expanded-block TLAS with in-kernel ray
    transforms) agrees with the brute oracle on a mixed world+instance
    scene — closest hits, hit kinds/ids, and any-hit occlusion."""
    import jax
    from pathtracing_tpu.scene.intersect import intersect, occluded

    V = np.asarray([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1],
                    [0, 1.2, 0]], np.float32)
    F = np.asarray([[0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4],
                    [0, 2, 1], [0, 3, 2]], np.int32)

    def tf(tx, ty, tz, s=1.0, ry=0.0):
        c, si = math.cos(ry), math.sin(ry)
        return np.asarray([[c * s, 0, si * s, tx], [0, s, 0, ty],
                           [-si * s, 0, c * s, tz], [0, 0, 0, 1]],
                          np.float32)

    def build(accel):
        b = SceneBuilder()
        mat = b.add_diffuse((0.7, 0.5, 0.3))
        mid = b.add_model(V, F, material=mat)
        for t in [tf(-2, 0, 0), tf(2, 0, 1, s=1.5, ry=0.7),
                  tf(0, 0, -2, s=0.7, ry=2.1)]:
            b.add_model_instance(mid, t, runtime=True)
        b.add_mesh(V * 3.0 + np.asarray([0, 0, 5], np.float32), F,
                   material=mat)   # world triangles too
        b.add_uniform_inf_light((1, 1, 1))
        b.set_camera([0, 4, -7], [0, 0.5, 0], math.radians(40), (32, 32))
        return b.build(accel=accel)

    sc_b, _, mb = build("brute")
    sc_p, _, mp = build("pallas")
    assert mp.accel == "pallas" and mb.accel == "brute"

    rng = np.random.default_rng(0)
    n = 512
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 4, n)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    hb = jax.tree.map(np.asarray, intersect(sc_b, mb, o, d, 1e30))
    hp = jax.tree.map(np.asarray, intersect(sc_p, mp, o, d, 1e30))
    assert (hb["valid"] == hp["valid"]).all()
    m = hb["valid"]
    np.testing.assert_allclose(hp["t"][m], hb["t"][m], rtol=1e-4, atol=1e-5)
    assert (hb["kind"][m] == hp["kind"][m]).all()
    assert (hb["idx"][m] == hp["idx"][m]).all()
    ob = np.asarray(occluded(sc_b, mb, o, d, jnp.full((n,), 6.0)))
    op = np.asarray(occluded(sc_p, mp, o, d, jnp.full((n,), 6.0)))
    assert (ob == op).all()


def test_model_content_dedup():
    """Content-identical add_model registrations return the same id
    (ResourceManager::getMesh content-equality dedup,
    ResourceManager.hpp:33-43)."""
    V = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    F = np.asarray([[0, 1, 2]], np.int32)
    b = SceneBuilder()
    m = b.add_diffuse((0.5, 0.5, 0.5))
    a = b.add_model(V, F, material=m)
    same = b.add_model(V.copy(), F.copy(), material=m)
    other_geo = b.add_model(V * 2.0, F, material=m)
    other_mat = b.add_model(V, F, material=b.add_diffuse((0.9, 0.1, 0.1)))
    assert a == same
    assert len({a, other_geo, other_mat}) == 3


def test_motion_blur_under_pallas_kernel():
    """A moving mesh >4K tris keeps accel=pallas (velocities ride in the
    kernel tables, AABBs expand over the shutter) and matches brute
    (round 1 forced any motion onto the brute backend)."""
    side = 52                      # (side-1)^2*2 = 5202 tris > 4096
    x, z = np.meshgrid(np.linspace(-3, 3, side), np.linspace(-3, 3, side))
    y = 0.4 * np.sin(2 * x) * np.cos(2 * z)
    V = np.stack([x, y, z], -1).reshape(-1, 3)
    i, j = np.meshgrid(np.arange(side - 1), np.arange(side - 1),
                       indexing="ij")
    a = (i * side + j).ravel()
    F = np.concatenate([np.stack([a, a + 1, a + side], -1),
                        np.stack([a + 1, a + side + 1, a + side], -1)])

    def build(accel):
        b = SceneBuilder()
        b.add_mesh(V, F, material=b.add_diffuse((0.7, 0.5, 0.3)),
                   velocity=(1.5, 0.0, 0.0))
        b.add_uniform_inf_light((1.0, 1.0, 1.0))
        b.set_camera([0, 4, -7], [0, 0, 0], math.radians(40), (24, 24),
                     shutter=(0.0, 1.0))
        return b.build(accel=accel)

    scene_p, cam, meta_p = build("auto")
    assert meta_p.accel == "pallas" and meta_p.has_motion
    scene_b, _, meta_b = build("brute")
    cfg = RenderConfig(spp=4, max_depth=2,
                       sampler=SamplerConfig(x_samples=2, y_samples=2))
    img_p = np.asarray(render_image(scene_p, cam, meta_p, cfg))
    img_b = np.asarray(render_image(scene_b, cam, meta_b, cfg))
    close = np.isclose(img_p, img_b, rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.99, close.mean()


def test_alpha_split_tables_match_brute():
    """Alpha-material triangles split into their own pka_* tables on the
    Pallas backend (single-pass opaque any-hit + small alpha chain,
    Primitive.cpp:6-14 analog): closest hits, shadows, and renders must
    match the brute oracle."""
    import jax
    import jax.numpy as jnp
    from pathtracing_tpu.scene.intersect import intersect, occluded

    side = 52                      # 5202 tris per sheet
    x, z = np.meshgrid(np.linspace(-3, 3, side), np.linspace(-3, 3, side))
    V0 = np.stack([x, 0 * x, z], -1).reshape(-1, 3)
    i, j = np.meshgrid(np.arange(side - 1), np.arange(side - 1),
                       indexing="ij")
    a = (i * side + j).ravel()
    F = np.concatenate([np.stack([a, a + 1, a + side], -1),
                        np.stack([a + 1, a + side + 1, a + side], -1)])
    uvs = np.stack([(x.ravel() + 3) / 6, (z.ravel() + 3) / 6], -1)

    def build(accel):
        b = SceneBuilder()
        tex = np.zeros((32, 32, 4), np.float32)
        xx, yy = np.meshgrid(np.arange(32), np.arange(32))
        tex[..., :3] = 0.8
        tex[..., 3] = np.where(((xx // 4) + (yy // 4)) % 2 == 0, 1.0, 0.0)
        tid = b.textures.add_image(tex)
        cut = b.add_diffuse((1, 1, 1), base_tex=tid, alpha_mode=2,
                            alpha_cutoff=0.5)
        # alpha "leaf canopy" sheet above an opaque ground sheet
        b.add_mesh(V0 + np.asarray([0, 2.0, 0], np.float32), F, uvs=uvs,
                   material=cut)
        b.add_mesh(V0, F, material=b.add_diffuse((0.6, 0.5, 0.4)))
        b.add_uniform_inf_light((1.0, 1.0, 1.0))
        b.set_camera([0, 5, -8], [0, 1, 0], math.radians(40), (24, 24))
        return b.build(accel=accel)

    import os as _os
    # raw-closest parity needs the micro-masks OFF: with them on, the
    # closest pass deliberately culls definitely-transparent candidates
    # (the shade stage's exact test would discard them anyway — the
    # masked contract is tested below and in test_alphamask)
    _os.environ["PT_ALPHA_MASK"] = "0"
    try:
        sc_pr, _, mpr = build("auto")
    finally:
        _os.environ.pop("PT_ALPHA_MASK", None)
    sc_p, cam, mp = build("auto")
    assert mp.accel == "pallas" and mp.alpha_block_k > 0, \
        (mp.accel, mp.alpha_block_k)
    assert "pka_tri" in sc_p and mp.alpha_cull_mask
    sc_b, _, mb = build("brute")

    rng = np.random.default_rng(5)
    n = 256
    o = np.stack([rng.uniform(-2.5, 2.5, n), np.full(n, 0.05),
                  rng.uniform(-2.5, 2.5, n)], -1).astype(np.float32)
    d = np.tile([0.0, 1.0, 0.0], (n, 1)).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)
    hb = jax.tree.map(np.asarray, intersect(sc_b, mb, o, d, 1e30))
    hp = jax.tree.map(np.asarray, intersect(sc_pr, mpr, o, d, 1e30))
    assert (hb["valid"] == hp["valid"]).all()
    m = hb["valid"]
    np.testing.assert_allclose(hp["t"][m], hb["t"][m], rtol=1e-4,
                               atol=1e-5)
    assert (hb["idx"][m] == hp["idx"][m]).all()
    # masked closest: a filtered view of the same hits — anything it
    # returns exists unmasked no closer
    hm = jax.tree.map(np.asarray, intersect(sc_p, mp, o, d, 1e30))
    assert not (hm["valid"] & ~hb["valid"]).any()
    both = hm["valid"] & hb["valid"]
    assert (hb["t"][both] <= hm["t"][both] + 1e-4).all()
    # stochastic alpha decisions share the hash stream => exact match
    # (deterministic MASK here; masked and unmasked predicates agree)
    ob = np.asarray(occluded(sc_b, mb, o, d, jnp.full((n,), 4.0)))
    op = np.asarray(occluded(sc_p, mp, o, d, jnp.full((n,), 4.0)))
    assert (ob == op).all()
    # through the cutout holes the shadow ray must escape
    assert (~op).any() and op.any()

    cfg = RenderConfig(spp=2, max_depth=3,
                       sampler=SamplerConfig(x_samples=2, y_samples=1))
    # bitwise-class render parity on the UNMASKED build; the masked
    # build culls fake transparent hits in-kernel, which compresses
    # see-through paths by one bounce and shifts their RNG streams —
    # per-sample images differ, converged means agree
    img_p = np.asarray(render_image(sc_pr, cam, mpr, cfg))
    img_b = np.asarray(render_image(sc_b, cam, mb, cfg))
    close = np.isclose(img_p, img_b, rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.99, close.mean()
    cfg16 = RenderConfig(spp=16, max_depth=3,
                         sampler=SamplerConfig(x_samples=4, y_samples=4))
    img_m = np.asarray(render_image(sc_p, cam, mp, cfg16))
    img_b16 = np.asarray(render_image(sc_b, cam, mb, cfg16))
    rel = abs(img_m.mean() - img_b16.mean()) / img_b16.mean()
    assert rel < 0.03, rel


def test_stacked_transparent_quads_shadow():
    """10 stacked fully-transparent (MASK alpha=0) quads must not darken
    the floor: the shadow predicate has to march through all of them
    (round 1 capped alpha restarts at 8, silently occluding)."""
    import jax.numpy as jnp
    from pathtracing_tpu.scene.intersect import occluded

    b = SceneBuilder()
    # alpha texture that is fully transparent everywhere
    tex = np.zeros((8, 8, 4), np.float32)
    tex[..., :3] = 1.0
    tex[..., 3] = 0.0
    tid = b.textures.add_image(tex)
    clear = b.add_diffuse((1, 1, 1), base_tex=tid, alpha_mode=2,
                          alpha_cutoff=0.5)
    for i in range(10):
        b.add_quad([-2, 0.5 + 0.1 * i, -2], [4, 0, 0], [0, 0, 4],
                   material=clear)
    b.add_quad([-4, 0, -4], [8, 0, 0], [0, 0, 8],
               material=b.add_diffuse((0.7, 0.7, 0.7)))
    b.add_point_light([0, 5, 0], (50, 50, 50))
    b.set_camera([0, 3, -6], [0, 0, 0], math.radians(40), (8, 8))
    scene, cam, meta = b.build()
    assert meta.has_alpha
    # shadow rays from the floor straight up through all 10 quads
    n = 16
    o = jnp.asarray(np.stack([np.linspace(-1.5, 1.5, n),
                              np.full(n, 0.01), np.zeros(n)], -1),
                    jnp.float32)
    d = jnp.asarray(np.tile([0.0, 1.0, 0.0], (n, 1)), jnp.float32)
    occ = np.asarray(occluded(scene, meta, o, d,
                              jnp.full((n,), 4.5, jnp.float32)))
    assert not occ.any(), occ


def test_instanced_emissive_area_lights():
    """runtime=True instances of an emissive model get per-instance
    per-triangle area lights (Model::BuildBlas + TransformedLight
    semantics): NEE sampling, emitter-hit MIS, and hit-side light ids all
    resolve — the render is identical to duplicated world geometry."""
    V = np.asarray([[-0.5, 0, -0.5], [0.5, 0, -0.5], [0.5, 0, 0.5],
                    [-0.5, 0, 0.5]], np.float32)
    F = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)

    def tf(tx, ty, tz):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [tx, ty, tz]
        return m

    def build(runtime):
        b = SceneBuilder()
        mid = b.add_model(V, F, emission=(8.0, 6.0, 4.0))
        for t in [tf(-1.5, 2.0, 0), tf(1.5, 2.5, 0)]:
            b.add_model_instance(mid, t, runtime=runtime)
        b.add_quad([-4, 0, -4], [8, 0, 0], [0, 0, 8],
                   material=b.add_diffuse((0.6, 0.6, 0.6)))
        b.set_camera([0, 3, -6], [0, 1, 0], math.radians(45), (24, 24))
        return b.build()

    sc_r, cam, m_r = build(True)
    sc_d, _, m_d = build(False)
    assert m_r.n_lights == m_d.n_lights == 4
    np.testing.assert_allclose(np.asarray(sc_r["light_power"]),
                               np.asarray(sc_d["light_power"]), rtol=1e-6)
    cfg = RenderConfig(spp=16, max_depth=3)
    img_r = np.asarray(render_image(sc_r, cam, m_r, cfg))
    img_d = np.asarray(render_image(sc_d, cam, m_d, cfg))
    close = np.isclose(img_r, img_d, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.99, close.mean()
    assert img_r.max() > 1.0   # the lights actually illuminate


def test_animated_point_light_sampled_at_ray_time():
    """AnimatedLight analog (Light.cpp:336-364): a point light with
    velocity is sampled at the ray's shutter time."""
    import pathtracing_tpu.scene.lights as L

    b = SceneBuilder()
    b.add_point_light([0, 5, 0], (10, 10, 10), velocity=(4, 0, 0))
    b.add_quad([-4, 0, -4], [8, 0, 0], [0, 0, 8],
               material=b.add_diffuse((0.6, 0.6, 0.6)))
    b.set_camera([0, 3, -6], [0, 1, 0], math.radians(45), (8, 8),
                 shutter=(0.0, 1.0))
    scene, cam, meta = b.build()
    assert meta.has_light_motion
    n = 4
    lidx = jnp.zeros((n,), jnp.int32)
    ref_p = jnp.zeros((n, 3))
    u, uv = jnp.zeros((n,)), jnp.zeros((n, 2))
    p0 = np.asarray(L.light_sample(scene, meta, lidx, ref_p, u, uv,
                                   jnp.zeros((n,)))["p"])[0]
    p1 = np.asarray(L.light_sample(scene, meta, lidx, ref_p, u, uv,
                                   jnp.ones((n,)))["p"])[0]
    np.testing.assert_allclose(p0, [0, 5, 0], atol=1e-6)
    np.testing.assert_allclose(p1, [4, 5, 0], atol=1e-6)


def test_animated_area_light_sampled_at_ray_time():
    """An emissive quad with velocity: NEE samples the shape at the ray
    time (moving area light, AnimatedLight + AnimatedPrimitive)."""
    import pathtracing_tpu.scene.lights as L

    b = SceneBuilder()
    b.add_quad([-0.5, 4, -0.5], [1, 0, 0], [0, 0, 1],
               emission=(5, 5, 5), velocity=(3, 0, 0))
    b.add_quad([-4, 0, -4], [8, 0, 0], [0, 0, 8],
               material=b.add_diffuse((0.6, 0.6, 0.6)))
    b.set_camera([0, 3, -6], [0, 1, 0], math.radians(45), (8, 8),
                 shutter=(0.0, 1.0))
    scene, cam, meta = b.build()
    assert meta.has_motion
    n = 4
    lidx = jnp.zeros((n,), jnp.int32)
    ref_p = jnp.zeros((n, 3))
    u, uv = jnp.zeros((n,)), jnp.full((n, 2), 0.0)
    p0 = np.asarray(L.light_sample(scene, meta, lidx, ref_p, u, uv,
                                   jnp.zeros((n,)))["p"])[0]
    p1 = np.asarray(L.light_sample(scene, meta, lidx, ref_p, u, uv,
                                   jnp.ones((n,)))["p"])[0]
    np.testing.assert_allclose(p1 - p0, [3, 0, 0], atol=1e-5)


def test_instanced_slot_range_guard():
    """Single-level hit slots are flat-encoded and ride an exact-f32
    transpose in-kernel; past 2^24 encoded ids they would silently
    round to even (wrong triangle/instance), so that kernel must refuse
    loudly at trace time.  The two-level kernel records hits as a
    (block, offset) PAIR whose components stay tiny, so a scene the old
    flat encoding refused (m1*G*K2 >= 2^24) must now trace EXACTLY."""
    import pytest
    from pathtracing_tpu.accel.pallas_trace import pallas_tri_intersect
    from pathtracing_tpu.accel.pallas_trace2 import (
        build_tri_blocks2_inst, pallas_tri_intersect2)

    o = jnp.zeros((128, 3), jnp.float32)
    d = jnp.ones((128, 3), jnp.float32)
    tm = jnp.full((128,), 1e30, jnp.float32)

    # single-level: m expanded blocks * K = 8192 * 2048 = 2^24 -> refuse
    scene1 = dict(pk_blk_lo=jnp.zeros((8192, 3), jnp.float32),
                  pk_blk_src=jnp.zeros((8192,), jnp.int32),
                  pk_slot2tri=jnp.zeros((1024,), jnp.int32))
    with pytest.raises(AssertionError, match="slot ids"):
        pallas_tri_intersect(scene1, o, d, tm, 2048)

    # two-level: 1024 instances of one triangle at K2=1024 encodes to
    # m1*G*K2 = 1024*16*1024 = 2^24 under the old flat slot id (it
    # refused); the pair encoding must return exact (t, inst, tri)
    tri = np.asarray([[[-.5, -.5, 0], [.5, -.5, 0], [0, .5, 0]]],
                     np.float32)
    fwd = []
    for i in range(1024):
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 3.0 * i
        fwd.append(m)
    inv = [np.linalg.inv(m).astype(np.float32) for m in fwd]
    arrays, K2 = build_tri_blocks2_inst(
        np.zeros((0, 3, 3), np.float32), tri, fwd, inv,
        [0] * 1024, [1] * 1024, k2=1024)
    assert K2 == 1024
    scene2 = {k: jnp.asarray(v) for k, v in arrays.items()}
    targets = np.asarray([0, 1, 513, 1023] * 32, np.int32)
    o2 = np.zeros((128, 3), np.float32)
    o2[:, 0] = 3.0 * targets
    o2[:, 2] = -2.0
    d2 = np.tile(np.asarray([[0, 0, 1]], np.float32), (128, 1))
    res = pallas_tri_intersect2(scene2, jnp.asarray(o2),
                                jnp.asarray(d2), tm, K2)
    assert bool(jnp.all(res["valid"]))
    np.testing.assert_allclose(np.asarray(res["t"]), 2.0, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(res["inst"]), targets)
    np.testing.assert_array_equal(np.asarray(res["tri"]), 0)


def test_instanced_alpha_split_matches_brute():
    """Alpha table split for INSTANCED scenes (round-4): a runtime-
    instanced alpha-MASK foliage model keeps accel=pallas with pka_*
    tables (shadow predicate = one opaque any-hit + a small alpha chain)
    and matches the brute oracle — San-Miguel-class foliage is exactly
    alpha+instanced (Primitive.cpp:6-14 + Primitive.cpp:41-66)."""
    import jax
    from pathtracing_tpu.scene.intersect import intersect, occluded

    # foliage card model: two crossed quads (4 tris) with a cutout tex
    V = np.asarray([[-1, 0, 0], [1, 0, 0], [1, 2, 0], [-1, 2, 0],
                    [0, 0, -1], [0, 0, 1], [0, 2, 1], [0, 2, -1]],
                   np.float32)
    F = np.asarray([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32)
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]] * 2, np.float32)

    def tf(tx, tz, ry=0.0, s=1.0):
        c, si = math.cos(ry), math.sin(ry)
        return np.asarray([[c * s, 0, si * s, tx], [0, s, 0, 0],
                           [-si * s, 0, c * s, tz], [0, 0, 0, 1]],
                          np.float32)

    def build(accel):
        b = SceneBuilder()
        tex = np.zeros((32, 32, 4), np.float32)
        xx, yy = np.meshgrid(np.arange(32), np.arange(32))
        tex[..., :3] = np.asarray([0.2, 0.6, 0.2])
        tex[..., 3] = np.where(((xx // 4) + (yy // 4)) % 2 == 0, 1.0, 0.0)
        tid = b.textures.add_image(tex)
        leaf = b.add_diffuse((1, 1, 1), base_tex=tid, alpha_mode=2,
                             alpha_cutoff=0.5)
        mid = b.add_model(V, F, uvs=uvs, material=leaf)
        for k, t in enumerate([tf(-2, 0, 0.4), tf(2, 1, 1.3, 1.4),
                               tf(0, -2, 2.2, 0.8), tf(2.5, -2, 0.9)]):
            b.add_model_instance(mid, t, runtime=True)
        # opaque world geometry + an opaque instance
        b.add_mesh(V * 0.5 + np.asarray([0, 0, 4], np.float32), F,
                   material=b.add_diffuse((0.6, 0.5, 0.4)))
        omid = b.add_model(V * 0.6, F, material=b.add_diffuse((0.5,) * 3))
        b.add_model_instance(omid, tf(-3, 3), runtime=True)
        b.add_quad([-6, 0, -6], [12, 0, 0], [0, 0, 12],
                   material=b.add_diffuse((0.5, 0.5, 0.5)))
        b.add_uniform_inf_light((1.0, 1.0, 1.0))
        b.set_camera([0, 4, -8], [0, 1, 0], math.radians(40), (24, 24))
        return b.build(accel=accel)

    import os as _os
    # unmasked build for raw-closest parity (see
    # test_alpha_split_tables_match_brute for why)
    _os.environ["PT_ALPHA_MASK"] = "0"
    try:
        sc_pr, _, mpr = build("pallas")
    finally:
        _os.environ.pop("PT_ALPHA_MASK", None)
    sc_p, cam, mp = build("pallas")
    assert mp.accel == "pallas" and mp.alpha_block_k > 0, \
        (mp.accel, mp.alpha_block_k)
    assert "pka_tri" in sc_p and "pka_blk_src" in sc_p
    sc_b, _, mb = build("brute")
    assert mb.accel == "brute"

    rng = np.random.default_rng(7)
    n = 512
    o = np.stack([rng.uniform(-4, 4, n), rng.uniform(0.1, 2.5, n),
                  rng.uniform(-4, 4, n)], -1).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    hb = jax.tree.map(np.asarray, intersect(sc_b, mb, o, d, 1e30))
    hp = jax.tree.map(np.asarray, intersect(sc_pr, mpr, o, d, 1e30))
    assert (hb["valid"] == hp["valid"]).all()
    m = hb["valid"]
    np.testing.assert_allclose(hp["t"][m], hb["t"][m], rtol=1e-4,
                               atol=1e-5)
    assert (hb["kind"][m] == hp["kind"][m]).all()
    assert (hb["idx"][m] == hp["idx"][m]).all()
    # masked closest: a filtered view — never finds anything brute
    # misses, never closer than brute
    hm = jax.tree.map(np.asarray, intersect(sc_p, mp, o, d, 1e30))
    assert not (hm["valid"] & ~hb["valid"]).any()
    both = hm["valid"] & hb["valid"]
    assert (hb["t"][both] <= hm["t"][both] + 1e-4).all()
    # deterministic MASK cutouts: occlusion must match exactly, and some
    # shadow rays must escape through the holes
    ob = np.asarray(occluded(sc_b, mb, o, d, jnp.full((n,), 5.0)))
    op = np.asarray(occluded(sc_p, mp, o, d, jnp.full((n,), 5.0)))
    assert (ob == op).all()
    assert (~op).any() and op.any()

    cfg = RenderConfig(spp=2, max_depth=3,
                       sampler=SamplerConfig(x_samples=2, y_samples=1))
    img_p = np.asarray(render_image(sc_pr, cam, mpr, cfg))
    img_b = np.asarray(render_image(sc_b, cam, mb, cfg))
    close = np.isclose(img_p, img_b, rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.99, close.mean()
    cfg16 = RenderConfig(spp=16, max_depth=3,
                         sampler=SamplerConfig(x_samples=4, y_samples=4))
    img_m = np.asarray(render_image(sc_p, cam, mp, cfg16))
    img_b16 = np.asarray(render_image(sc_b, cam, mb, cfg16))
    rel = abs(img_m.mean() - img_b16.mean()) / img_b16.mean()
    assert rel < 0.03, rel


def test_moving_instance_matches_brute():
    """AnimatedPrimitive wrapping a TransformedPrimitive
    (Primitive.cpp:77-96 + 41-66): a runtime instance with a world
    velocity keeps accel=pallas (expanded L1 AABBs union over the
    shutter; the kernel shifts the object-space origin by -v_obj*time)
    and matches the brute oracle."""
    import jax
    from pathtracing_tpu.scene.intersect import intersect

    V = np.asarray([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1],
                    [0, 1.5, 0]], np.float32)
    F = np.asarray([[0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4],
                    [0, 2, 1], [0, 3, 2]], np.int32)

    def tf(tx, ty, tz, s=1.0, ry=0.0):
        c, si = math.cos(ry), math.sin(ry)
        return np.asarray([[c * s, 0, si * s, tx], [0, s, 0, ty],
                           [-si * s, 0, c * s, tz], [0, 0, 0, 1]],
                          np.float32)

    def build(accel):
        b = SceneBuilder()
        mat = b.add_diffuse((0.7, 0.5, 0.3))
        mid = b.add_model(V, F, material=mat)
        b.add_model_instance(mid, tf(-2, 0, 0, ry=0.5), runtime=True,
                             velocity=(2.0, 0.5, 0.0))
        b.add_model_instance(mid, tf(2, 0, 1, s=1.3), runtime=True)
        # moving WORLD triangles in the same instanced scene
        b.add_mesh(V + np.asarray([0, 0, 4], np.float32), F, material=mat,
                   velocity=(0.0, 1.0, 0.0))
        b.add_quad([-6, -0.2, -6], [12, 0, 0], [0, 0, 12],
                   material=b.add_diffuse((0.5, 0.5, 0.5)))
        b.add_uniform_inf_light((1.0, 1.0, 1.0))
        b.set_camera([0, 4, -8], [0, 0.5, 0], math.radians(40), (24, 24),
                     shutter=(0.0, 1.0))
        return b.build(accel=accel)

    sc_p, cam, mp = build("pallas")
    assert mp.accel == "pallas" and mp.has_motion and mp.n_inst == 2
    sc_b, _, mb = build("brute")

    rng = np.random.default_rng(11)
    n = 512
    o = np.stack([rng.uniform(-4, 4, n), rng.uniform(0.2, 4, n),
                  rng.uniform(-4, 4, n)], -1).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = rng.uniform(0.0, 1.0, n).astype(np.float32)
    o, d, t = jnp.asarray(o), jnp.asarray(d), jnp.asarray(t)
    hb = jax.tree.map(np.asarray,
                      intersect(sc_b, mb, o, d, 1e30, time=t))
    hp = jax.tree.map(np.asarray,
                      intersect(sc_p, mp, o, d, 1e30, time=t))
    assert (hb["valid"] == hp["valid"]).all()
    m = hb["valid"]
    np.testing.assert_allclose(hp["t"][m], hb["t"][m], rtol=1e-4,
                               atol=1e-5)
    assert (hb["kind"][m] == hp["kind"][m]).all()
    assert (hb["idx"][m] == hp["idx"][m]).all()

    cfg = RenderConfig(spp=4, max_depth=2,
                       sampler=SamplerConfig(x_samples=2, y_samples=2))
    img_p = np.asarray(render_image(sc_p, cam, mp, cfg))
    img_b = np.asarray(render_image(sc_b, cam, mb, cfg))
    close = np.isclose(img_p, img_b, rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.99, close.mean()
