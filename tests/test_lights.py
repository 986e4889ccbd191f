"""Light-sampling correctness: estimator consistency per light type.

For each light kind, the MIS+NEE path estimator and the BSDF-only simple
estimator must agree in the mean — any bias in a light's sample/PDF pair
(importance table, solid-angle conversion, delta handling) shows up as a
systematic gap far exceeding MC noise."""
import math

import numpy as np
import jax.numpy as jnp

from pathtracing_tpu.scene.builder import SceneBuilder
from pathtracing_tpu.core.rng import SamplerConfig
from pathtracing_tpu.integrators.path import RenderConfig
from pathtracing_tpu.integrators.render import render_image


def _base(res=(24, 24)):
    b = SceneBuilder()
    m = b.add_diffuse((0.6, 0.55, 0.5), roughness=1.0)
    b.add_quad([-4, 0, -4], [8, 0, 0], [0, 0, 8], material=m)
    b.add_sphere([0, 1, 0], 1.0, material=m)
    b.set_camera([0, 2.5, -6], [0, 1, 0], math.radians(40), res)
    return b


def _consistency(b, rel_bound=0.15):
    scene, cam, meta = b.build()
    img_p = np.asarray(render_image(scene, cam, meta, RenderConfig(
        spp=48, max_depth=4, integrator="path",
        sampler=SamplerConfig(x_samples=8, y_samples=6, seed=3))))
    img_s = np.asarray(render_image(scene, cam, meta, RenderConfig(
        spp=96, max_depth=4, integrator="simple",
        sampler=SamplerConfig(x_samples=8, y_samples=12, seed=4))))
    assert np.isfinite(img_p).all() and np.isfinite(img_s).all()
    rel = abs(img_p.mean() - img_s.mean()) / max(img_p.mean(), 1e-6)
    assert rel < rel_bound, f"estimator gap {rel:.3f}"


def test_env_texture_light_consistency():
    b = _base()
    rng = np.random.default_rng(0)
    sky = (0.2 + rng.uniform(0, 1, (16, 32, 3)) ** 2).astype(np.float32)
    sky[4:8, 10:14] *= 20.0     # hot patch exercises the importance table
    tid = b.textures.add_image(sky)
    b.add_env_light(tid)
    _consistency(b)


def test_two_env_lights_consistency():
    """Two env lights with different importance tables: each light's
    sample/pdf must consult ITS OWN table (round-1 verdict: a single
    global table corrupted MIS weights whenever >1 env light existed)."""
    b = _base()
    rng = np.random.default_rng(1)
    sky1 = (0.1 + rng.uniform(0, 1, (16, 32, 3)) ** 2).astype(np.float32)
    sky1[2:5, 4:8] *= 30.0          # hot patch A
    sky2 = (0.1 + rng.uniform(0, 1, (16, 32, 3)) ** 2).astype(np.float32)
    sky2[10:13, 20:26] *= 25.0      # hot patch B elsewhere
    b.add_env_light(b.textures.add_image(sky1))
    b.add_env_light(b.textures.add_image(sky2))
    scene, cam, meta = b.build()
    assert meta.n_env == 2
    slots = np.asarray(scene["light_env_slot"])[:meta.n_lights]
    assert sorted(slots[slots >= 0].tolist()) == [0, 1]
    _consistency(b)


def test_function_light_consistency():
    b = _base()
    b.add_function_inf_light(
        lambda d: np.stack([1.0 + d[:, 1], 0.5 + 0.5 * d[:, 0] ** 2,
                            np.full(len(d), 0.8)], -1).astype(np.float32),
        nx=64, ny=32)
    _consistency(b)


def test_delta_lights_are_nee_only():
    """Delta lights (point/distant) cannot be hit by BSDF sampling: the
    simple integrator must be blind to them while the path integrator
    sees their direct lighting (reference SampleLd delta branch,
    Integrators.cpp:283-285; Simple misses them by construction)."""
    def build(with_delta):
        b = _base()
        if with_delta:
            b.add_point_light([2, 4, -2], (3.0, 2.8, 2.5))
            b.add_distant_light([-0.4, -1.0, 0.3], (1.0, 1.0, 1.1))
        b.add_uniform_inf_light((0.2, 0.2, 0.25))
        return b.build()

    def mean(scene_cam_meta, integ, spp, seed):
        scene, cam, meta = scene_cam_meta
        return np.asarray(render_image(scene, cam, meta, RenderConfig(
            spp=spp, max_depth=3, integrator=integ,
            sampler=SamplerConfig(x_samples=4, y_samples=spp // 4,
                                  seed=seed)))).mean()

    with_d = build(True)
    without = build(False)
    # simple: blind to delta lights
    s_with = mean(with_d, "simple", 16, 5)
    s_without = mean(without, "simple", 16, 5)
    np.testing.assert_allclose(s_with, s_without, rtol=1e-3)
    # path: sees them (direct term strictly positive)
    p_with = mean(with_d, "path", 16, 6)
    p_without = mean(without, "path", 16, 6)
    assert p_with > p_without * 1.2, (p_with, p_without)


def test_sphere_area_light_consistency():
    b = _base()
    b.add_sphere([2.0, 3.5, -1.0], 0.6, emission=(25, 24, 22))
    b.add_uniform_inf_light((0.05, 0.05, 0.08))
    _consistency(b)
