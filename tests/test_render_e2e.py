"""End-to-end integration tests (SURVEY.md §4 test pyramid, level 3).

The reference has no tests; verification was golden-image eyeballing.
Here the golden standard is *estimator consistency*: the MIS+NEE path
integrator and the BSDF-only simple integrator are different unbiased
estimators of the same integral, so their converged images must agree.
Plus physics invariants (furnace) and bitwise determinism.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pathtracing_tpu import scenes, RenderConfig, render
from pathtracing_tpu.core.rng import SamplerConfig
from pathtracing_tpu.sensor import film as fm


def _img(scene, cam, meta, cfg):
    f = render(scene, cam, meta, cfg)
    w, h = cam["resolution"]
    return np.asarray(fm.finalize(f)).reshape(h, w, 3)


def test_furnace_sky_and_albedo():
    scene, cam, meta = scenes.furnace(resolution=(16, 16))
    cfg = RenderConfig(spp=8, max_depth=4, integrator="path",
                       sampler=SamplerConfig(x_samples=4, y_samples=2,
                                             seed=3))
    img = _img(scene, cam, meta, cfg)
    assert np.isfinite(img).all()
    # corner rays escape to the uniform sky == exactly 1.0
    np.testing.assert_allclose(img[0, 0], 1.0, atol=1e-4)
    # sphere center: approximately albedo under a uniform dome
    c = img[8, 8]
    assert 0.55 < c.mean() < 0.85


def test_path_vs_simple_consistency_cornell():
    """Two different unbiased estimators must agree in the mean."""
    scene, cam, meta = scenes.cornell_box(resolution=(32, 32))
    img_p = _img(scene, cam, meta,
                 RenderConfig(spp=32, max_depth=5, integrator="path",
                              sampler=SamplerConfig(x_samples=8,
                                                    y_samples=4, seed=1)))
    img_s = _img(scene, cam, meta,
                 RenderConfig(spp=64, max_depth=5, integrator="simple",
                              sampler=SamplerConfig(x_samples=8,
                                                    y_samples=8, seed=2)))
    assert np.isfinite(img_p).all() and np.isfinite(img_s).all()
    rel = abs(img_p.mean() - img_s.mean()) / img_p.mean()
    # agreement of two low-spp MC means: the gap is statistical noise plus
    # platform-dependent discrete decision flips (Russian-roulette kills
    # sit on f32 thresholds, so CPU/TPU means drift 2-3% each); 12% bounds
    # both without masking real estimator bugs (those show up 2-10x).
    assert rel < 0.12, f"estimator mismatch: {rel:.3f}"


def test_bitwise_determinism():
    scene, cam, meta = scenes.cornell_box(resolution=(16, 16))
    cfg = RenderConfig(spp=4, max_depth=4, integrator="path",
                       sampler=SamplerConfig(x_samples=2, y_samples=2,
                                             seed=7))
    a = _img(scene, cam, meta, cfg)
    b = _img(scene, cam, meta, cfg)
    np.testing.assert_array_equal(a, b)


def test_textured_alpha_scene():
    scene, cam, meta = scenes.textured_quad(resolution=(24, 24))
    cfg = RenderConfig(spp=8, max_depth=4, integrator="path",
                       sampler=SamplerConfig(x_samples=4, y_samples=2,
                                             seed=1))
    img = _img(scene, cam, meta, cfg)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_sanmiguel_faithful_scene_matches_brute():
    """The judged benchmark scene at miniature scale: textured terrain
    (base + normal map), instanced alpha-masked foliage, glass/metal
    props, emissive lamp meshes (the subsystems San Miguel exercises,
    /root/reference/main.cpp:279-354).  The Pallas path must (a) be the
    accel actually chosen, (b) carry the split alpha tables for the
    foliage, and (c) match the brute oracle.  The foliage instances are
    runtime="auto": at this size the builder FLATTENS them into world
    tables (round-4 measured decision; PT_FLATTEN_MAX=0 would keep the
    runtime TLAS, which tests/test_features.py exercises directly)."""
    kw = dict(resolution=(32, 32), n_tris=2_000, foliage=8)
    scene_b, cam, meta_b = scenes.sanmiguel_analog(accel="brute", **kw)
    scene_p, _, meta_p = scenes.sanmiguel_analog(accel="pallas", **kw)
    assert meta_p.accel == "pallas"
    assert meta_p.n_inst == 0, \
        "auto foliage instances should flatten at this size"
    # flattening re-emits the 8 instances' model tris as world tris
    # (for every accel, so the brute oracle shares the representation)
    assert meta_b.n_inst == 0 and meta_p.n_tri == meta_b.n_tri > 2_000
    assert any(k.startswith("pka_") for k in scene_p), \
        "alpha foliage must produce split alpha tables"
    cfg = RenderConfig(spp=4, max_depth=5, integrator="path",
                       sampler=SamplerConfig(x_samples=2, y_samples=2,
                                             seed=2))
    # strict parity runs with the alpha micro-masks OFF: the masked
    # closest pass culls definitely-transparent foliage hits in-kernel,
    # which compresses see-through paths by one bounce and shifts
    # their RNG streams (per-sample stochastic diffs; the masked
    # predicate/render contracts are pinned in tests/test_alphamask.py
    # and test_features.py)
    import os
    os.environ["PT_ALPHA_MASK"] = "0"
    try:
        scene_pr, _, meta_pr = scenes.sanmiguel_analog(accel="pallas",
                                                       **kw)
    finally:
        os.environ.pop("PT_ALPHA_MASK", None)
    img_b = _img(scene_b, cam, meta_b, cfg)
    img_p = _img(scene_pr, cam, meta_pr, cfg)
    assert np.isfinite(img_p).all()
    assert img_p.mean() > 0.01
    np.testing.assert_allclose(img_p, img_b, rtol=1e-4, atol=1e-5)
    # the masked production build: converged-mean agreement
    cfg16 = RenderConfig(spp=16, max_depth=5,
                         sampler=SamplerConfig(x_samples=4, y_samples=4,
                                               seed=2))
    img_m = _img(scene_p, cam, meta_p, cfg16)
    img_b16 = _img(scene_b, cam, meta_b, cfg16)
    rel = abs(img_m.mean() - img_b16.mean()) / img_b16.mean()
    assert rel < 0.03, rel


def test_volpath_medium_scene():
    scene, cam, meta = scenes.spheres_medium(resolution=(24, 24))
    cfg = RenderConfig(spp=8, max_depth=5, integrator="volpath",
                       sampler=SamplerConfig(x_samples=4, y_samples=2,
                                             seed=1))
    img = _img(scene, cam, meta, cfg)
    assert np.isfinite(img).all()
    assert img.mean() > 0.005


def test_volpath_reduces_to_path_without_media():
    """With no media in the scene, volpath must agree with path closely
    (same estimator; RR stream differs only via dims)."""
    scene, cam, meta = scenes.cornell_box(resolution=(16, 16))
    cfg_p = RenderConfig(spp=16, max_depth=4, integrator="path",
                         sampler=SamplerConfig(x_samples=4, y_samples=4,
                                               seed=5))
    cfg_v = RenderConfig(spp=16, max_depth=4, integrator="volpath",
                         sampler=SamplerConfig(x_samples=4, y_samples=4,
                                               seed=5))
    img_p = _img(scene, cam, meta, cfg_p)
    img_v = _img(scene, cam, meta, cfg_v)
    np.testing.assert_allclose(img_v, img_p, rtol=1e-4, atol=1e-5)


def test_gradients_through_render():
    """Pixel gradients flow to material base color (M5 seed test)."""
    import jax
    from pathtracing_tpu.integrators.render import render_tile

    scene, cam, meta = scenes.furnace(resolution=(8, 8))
    cfg = RenderConfig(spp=2, max_depth=3, integrator="path",
                       differentiable=True,
                       sampler=SamplerConfig(x_samples=2, y_samples=1,
                                             seed=1))
    pixel_idx = jnp.arange(64, dtype=jnp.int32)

    def loss(base):
        sc = dict(scene, mat_base=base)
        f = fm.new_film(cam["resolution"])
        f = render_tile(sc, cam, meta, cfg, f, pixel_idx, 2)
        return jnp.sum(f["rgb"])

    g = jax.grad(loss)(scene["mat_base"])
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


def _heightfield_scene(res=(96, 64)):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from bench_traversal import heightfield
    import math
    from pathtracing_tpu import SceneBuilder

    tri = heightfield(20_000)
    b = SceneBuilder()
    b.add_mesh(tri.reshape(-1, 3),
               np.arange(len(tri) * 3).reshape(-1, 3),
               material=b.add_diffuse((0.6, 0.55, 0.5)))
    b.add_distant_light(direction=(-0.3, -1.0, -0.2), color=(5, 5, 4.6))
    b.add_uniform_inf_light((0.35, 0.45, 0.65))
    b.set_camera([50, 40, -30], [50, 0, 50], math.radians(55), res)
    return b.build()


def test_tail_compaction_matches_full_width():
    """compact_after gathers survivors into a quarter-width batch after
    a few bounces; per-lane RNG is (pixel, sample, bounce)-keyed, so the
    image must match the uncompacted render to float precision (tile
    regrouping may flip traversal tie-breaks by ~1 ULP)."""
    import dataclasses

    scene, cam, meta = _heightfield_scene()
    cfg = RenderConfig(spp=1, max_depth=6, integrator="path")
    f0 = render(scene, cam, meta, cfg)
    f1 = render(scene, cam, meta,
                dataclasses.replace(cfg, compact_after=3))
    r0 = np.asarray(f0["rgb"])
    r1 = np.asarray(f1["rgb"])
    np.testing.assert_allclose(r1, r0, atol=1e-5, rtol=1e-5)

    # ray regeneration drains a 2-wave queue with refilled lanes; per-
    # sample RNG keys make it match the wave-by-wave render to float
    # precision on the same scene (same caveat on traversal tie-breaks)
    cfg2 = dataclasses.replace(cfg, spp=2, regenerate=True)
    f2 = render(scene, cam, meta, dataclasses.replace(cfg, spp=2))
    f3 = render(scene, cam, meta, cfg2)
    np.testing.assert_allclose(np.asarray(f3["rgb"]),
                               np.asarray(f2["rgb"]),
                               atol=1e-5, rtol=1e-5)

    # at spp=1 the queue spans several pixel tiles (lanes < queue): the
    # render driver groups consecutive row tiles into one drain
    cfg3 = dataclasses.replace(cfg, rays_per_batch=2048)
    f4 = render(scene, cam, meta, cfg3)
    f5 = render(scene, cam, meta,
                dataclasses.replace(cfg3, regenerate=True))
    np.testing.assert_allclose(np.asarray(f5["rgb"]),
                               np.asarray(f4["rgb"]),
                               atol=1e-5, rtol=1e-5)


def test_differentiable_tail_compaction_matches():
    """The differentiable scan's tail compaction (quarter-width gather
    after compact_after bounces) must leave the rendered value AND the
    parameter gradients unchanged to float precision: gather/scatter are
    linear and per-lane RNG is (pixel, sample, bounce)-keyed."""
    import dataclasses
    import jax
    from pathtracing_tpu.integrators.render import render_tile

    scene, cam, meta = _heightfield_scene()
    w, h = cam["resolution"]
    pixel_idx = jnp.arange(w * h, dtype=jnp.int32)
    cfg0 = RenderConfig(spp=1, max_depth=6, integrator="path",
                        differentiable=True)
    cfg1 = dataclasses.replace(cfg0, compact_after=2)

    def make_loss(cfg):
        def loss(base):
            sc = dict(scene, mat_base=base)
            f = fm.new_film(cam["resolution"])
            f = render_tile(sc, cam, meta, cfg, f, pixel_idx, 1)
            return jnp.sum(f["rgb"] * f["rgb"])
        return loss

    v0, g0 = jax.value_and_grad(make_loss(cfg0))(scene["mat_base"])
    v1, g1 = jax.value_and_grad(make_loss(cfg1))(scene["mat_base"])
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)
    assert np.abs(np.asarray(g0)).max() > 0.0


def test_regeneration_ray_count_invariant():
    """Regeneration reorders WHEN each sample's bounces run, never how
    many: total traced segments (closest-hit per live bounce + NEE rays)
    must equal the wave-by-wave form exactly."""
    import jax.numpy as jnp
    from pathtracing_tpu import scenes
    from pathtracing_tpu.integrators.path import trace, trace_regen
    from pathtracing_tpu.sensor.camera import camera_lanes

    scene, cam, meta = scenes.cornell_box(resolution=(16, 16))
    cfg = RenderConfig(spp=2, max_depth=4, integrator="path",
                       sampler=SamplerConfig(x_samples=2, y_samples=1))
    pixel_idx = jnp.arange(256, dtype=jnp.int32)
    px, py = pixel_idx % 16, pixel_idx // 16
    n_waves = 0.0
    for s in range(2):
        sidx = jnp.asarray(s, jnp.uint32)
        o, d, t, _ = camera_lanes(cam, cfg.sampler, px, py, sidx)
        _, st = trace(scene, cam, meta, cfg, o, d, t, px, py, sidx,
                      with_stats=True)
        n_waves += float(st["n_rays"])
    _, st = trace_regen(scene, cam, meta, cfg, pixel_idx, 2, 0,
                        lanes=64, with_stats=True)
    assert float(st["n_rays"]) == n_waves


def test_regeneration_matches_waves_volpath():
    """trace_regen refills lanes mid-queue; medium state, per-lane bounce
    RNG dims, and the camera-medium reset must all match the standard
    wave render on a volumetric scene."""
    import dataclasses
    from pathtracing_tpu import scenes

    scene, cam, meta = scenes.spheres_medium(resolution=(32, 32))
    cfg = RenderConfig(spp=4, max_depth=6, integrator="volpath",
                       sampler=SamplerConfig(x_samples=2, y_samples=2,
                                             seed=3))
    f0 = render(scene, cam, meta, cfg)
    f1 = render(scene, cam, meta,
                dataclasses.replace(cfg, regenerate=True))
    np.testing.assert_allclose(np.asarray(f1["rgb"]),
                               np.asarray(f0["rgb"]),
                               atol=1e-5, rtol=1e-5)
