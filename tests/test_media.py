"""Volumetrics vs closed form.

transmittance() (the Scene::IntersectTr analog, Scene.cpp:8-29) marched
through a material-less medium boundary must equal exp(-sigma_t * chord)
exactly, and the volpath estimator's attenuation of a light seen through
fog must match Beer–Lambert within MC noise."""
import math

import numpy as np
import jax.numpy as jnp

from pathtracing_tpu.scene.builder import SceneBuilder
from pathtracing_tpu.core.rng import SamplerConfig
from pathtracing_tpu.integrators.path import RenderConfig, transmittance
from pathtracing_tpu.integrators.render import render_image


def test_transmittance_matches_beer_lambert():
    sigma_a = np.asarray([0.3, 0.5, 0.9], np.float32)
    b = SceneBuilder()
    fog = b.add_medium(sigma_a=sigma_a, sigma_s=(0, 0, 0))
    # material-less fog sphere: pure medium boundary
    b.add_sphere([0, 0, 0], 1.0, material=-1, medium=fog)
    b.add_uniform_inf_light((1, 1, 1))
    b.set_camera([0, 0, -5], [0, 0, 0], math.radians(30), (8, 8))
    scene, cam, meta = b.build()

    # rays through the center: chord = 2r; offset rays: shorter chords
    offsets = np.asarray([0.0, 0.5, 0.9, 1.5])  # 1.5 misses entirely
    n = len(offsets)
    o = jnp.asarray(np.stack([offsets, np.zeros(n),
                              np.full(n, -5.0)], -1).astype(np.float32))
    d = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32))
    tr, blocked = transmittance(scene, meta, o, d,
                                jnp.full((n,), 100.0),
                                jnp.full((n,), -1, jnp.int32),
                                jnp.ones((n,), bool))
    assert not np.asarray(blocked).any()   # no material in the way
    chord = 2.0 * np.sqrt(np.maximum(1.0 - offsets ** 2, 0.0))
    want = np.exp(-sigma_a[None, :] * chord[:, None])
    np.testing.assert_allclose(np.asarray(tr), want, rtol=1e-4, atol=1e-6)


def test_volpath_attenuates_background_light():
    """A camera looking through a fog ball at a bright wall sees it
    attenuated by ~exp(-sigma_t * chord) (absorption only; single pixel
    through the center)."""
    sigma = 0.4
    b = SceneBuilder()
    fog = b.add_medium(sigma_a=(sigma, sigma, sigma), sigma_s=(0, 0, 0))
    b.add_sphere([0, 0, 0], 1.0, material=-1, medium=fog)
    b.add_uniform_inf_light((1.0, 1.0, 1.0))
    b.set_camera([0, 0, -5], [0, 0, 0], math.radians(10), (16, 16))
    scene, cam, meta = b.build()
    # pass-through distance sampling is a Bernoulli estimator for pure
    # absorption (weight 1 with prob e^-sigma*t, else 0): per-sample std
    # ~0.5, so average a central region at high spp
    cfg = RenderConfig(spp=256, max_depth=4, integrator="volpath",
                       sampler=SamplerConfig(x_samples=16, y_samples=16,
                                             seed=2))
    img = np.asarray(render_image(scene, cam, meta, cfg))
    center = img[7:10, 7:10].mean()
    want = math.exp(-sigma * 2.0)
    np.testing.assert_allclose(center, want, rtol=0.06)
    # (the miss-the-fog case is covered analytically by the
    # offset-1.5 ray in test_transmittance_matches_beer_lambert)
