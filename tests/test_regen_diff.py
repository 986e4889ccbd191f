"""Custom-VJP persistent wavefront (integrators/regen_diff.py).

Contract: trace_regen_diff's VALUE matches the production forward
regeneration (same queue semantics), and its GRADIENTS match jax.grad
of the differentiable scan form on the same sample population — the
scan form's gradients are separately validated against finite
differences (test_gradients.py), so agreement here chains the custom
VJP to ground truth.
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pathtracing_tpu import SceneBuilder, RenderConfig, SamplerConfig
from pathtracing_tpu.integrators.path import trace, trace_regen
from pathtracing_tpu.integrators.regen_diff import trace_regen_diff
from pathtracing_tpu.core.rng import sample_1d, sample_2d
from pathtracing_tpu.sensor.camera import generate_ray


RES = (24, 18)


def _scene():
    b = SceneBuilder()
    b.add_quad([-8, 0, -8], [16, 0, 0], [0, 0, 16],
               material=b.add_diffuse((0.65, 0.6, 0.55)))
    b.add_sphere([0, 1, 0], 1.0,
                 material=b.add_diffuse((0.5, 0.3, 0.25), roughness=0.6))
    b.add_sphere([2.2, 0.8, -1.0], 0.8,
                 material=b.add_conductor((0.9, 0.7, 0.4)))
    b.add_quad([-1, 4, -1], [2, 0, 0], [0, 0, 2],
               emission=(14.0, 12.0, 10.0), one_sided=True)
    b.add_uniform_inf_light((0.3, 0.4, 0.55))
    b.set_camera([0, 2.5, -7], [0, 1, 0], math.radians(45), RES)
    return b.build()


CFG = RenderConfig(spp=1, max_depth=5, integrator="path",
                   sampler=SamplerConfig(x_samples=4, y_samples=2,
                                         seed=9))


def _queue():
    w, h = RES
    pixel_idx = jnp.arange(w * h, dtype=jnp.int32)
    waves = 2
    lanes = w * h // 2          # forces multiple refills per lane
    return pixel_idx, waves, lanes


def test_value_matches_trace_regen():
    scene, cam, meta = _scene()
    pixel_idx, waves, lanes = _queue()
    ref = trace_regen(scene, cam, meta, CFG, pixel_idx, waves, 0,
                      lanes=lanes)
    out = trace_regen_diff(scene, cam, meta, CFG, pixel_idx, waves, 0,
                           lanes=lanes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_scan_form():
    scene, cam, meta = _scene()
    pixel_idx, waves, lanes = _queue()
    w, h = RES
    cfg_scan = RenderConfig(spp=CFG.spp, max_depth=CFG.max_depth,
                            integrator="path", sampler=CFG.sampler,
                            differentiable=True)

    def loss_regen(base):
        sc = dict(scene, mat_base=base)
        out = trace_regen_diff(sc, cam, meta, CFG, pixel_idx, waves, 0,
                               lanes=lanes)
        return jnp.sum(out)

    def loss_scan(base):
        sc = dict(scene, mat_base=base)
        total = jnp.zeros((), jnp.float32)
        s = CFG.sampler
        for wave in range(waves):
            px = pixel_idx % w
            py = pixel_idx // w
            sidx = jnp.asarray(wave, jnp.uint32)
            pj = sample_2d(s, px, py, sidx, 0)
            tu = sample_1d(s, px, py, sidx, 2)
            lu = sample_2d(s, px, py, sidx, 3)
            p = jnp.stack([px.astype(jnp.float32),
                           py.astype(jnp.float32)], -1) + pj
            o, d, tm = generate_ray(cam, p, tu, lu)
            li = trace(sc, cam, meta, cfg_scan, o, d, tm, px, py, sidx)
            total = total + jnp.sum(li)
        return total

    v_r, g_r = jax.value_and_grad(loss_regen)(scene["mat_base"])
    v_s, g_s = jax.value_and_grad(loss_scan)(scene["mat_base"])
    # same estimator, same RNG streams => same value (float tolerance)
    np.testing.assert_allclose(float(v_r), float(v_s), rtol=1e-4)
    g_r = np.asarray(g_r)
    g_s = np.asarray(g_s)
    assert np.isfinite(g_r).all()
    assert np.abs(g_r).sum() > 0
    scale = np.abs(g_s).max()
    np.testing.assert_allclose(g_r, g_s, rtol=2e-3, atol=2e-4 * scale)


def test_gradients_texture_params():
    """Gradients reach the texel pool through the custom VJP (the
    recording pass's replay re-runs texture fetches differentiably)."""
    scene, cam, meta = _scene()
    pixel_idx, waves, lanes = _queue()

    def loss(texels):
        sc = dict(scene, tex_texels=texels)
        out = trace_regen_diff(sc, cam, meta, CFG, pixel_idx, waves, 0,
                               lanes=lanes)
        return jnp.sum(out)

    g = jax.grad(loss)(scene["tex_texels"])
    assert np.isfinite(np.asarray(g)).all()


def test_render_differentiable_regen_matches_scan():
    """User-facing: RenderConfig(differentiable=True, regenerate=True)
    renders through the custom-VJP wavefront; value and gradients match
    the differentiable scan render on the same sample population."""
    from pathtracing_tpu.integrators.render import render

    scene, cam, meta = _scene()
    spp = 2
    kw = dict(spp=spp, max_depth=4, integrator="path",
              sampler=CFG.sampler, differentiable=True,
              rays_per_batch=256)
    cfg_regen = RenderConfig(regenerate=True, **kw)
    cfg_scan = RenderConfig(regenerate=False, **kw)

    def loss(base, cfg):
        sc = dict(scene, mat_base=base)
        film = render(sc, cam, meta, cfg)
        return jnp.sum(film["rgb"])

    v_r, g_r = jax.value_and_grad(loss)(scene["mat_base"], cfg_regen)
    v_s, g_s = jax.value_and_grad(loss)(scene["mat_base"], cfg_scan)
    np.testing.assert_allclose(float(v_r), float(v_s), rtol=1e-4)
    g_r, g_s = np.asarray(g_r), np.asarray(g_s)
    assert np.isfinite(g_r).all() and np.abs(g_r).sum() > 0
    scale = np.abs(g_s).max()
    np.testing.assert_allclose(g_r, g_s, rtol=2e-3, atol=2e-4 * scale)
