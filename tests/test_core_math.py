import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_tpu.core import math as m


def test_normalize():
    v = jnp.asarray([[3.0, 0.0, 4.0]])
    n = m.safe_normalize(v)
    np.testing.assert_allclose(np.asarray(m.length(n)), 1.0, rtol=1e-6)


def test_reflect_glm_convention():
    i = jnp.asarray([1.0, -1.0, 0.0]) / np.sqrt(2)
    n = jnp.asarray([0.0, 1.0, 0.0])
    r = m.reflect(i, n)
    np.testing.assert_allclose(np.asarray(r),
                               np.asarray([1.0, 1.0, 0.0]) / np.sqrt(2),
                               atol=1e-6)


def test_refract_matches_snell():
    # normal incidence: direction unchanged
    i = jnp.asarray([0.0, 0.0, -1.0])
    n = jnp.asarray([0.0, 0.0, 1.0])
    r = m.refract(i, n, 1.0 / 1.5)
    np.testing.assert_allclose(np.asarray(r), [0, 0, -1], atol=1e-6)


def test_refract_tir_returns_zero():
    i = m.safe_normalize(jnp.asarray([0.99, 0.0, -0.14]))
    n = jnp.asarray([0.0, 0.0, 1.0])
    r = m.refract(i, n, 1.5)   # dense-to-sparse, grazing -> TIR
    np.testing.assert_allclose(np.asarray(r), [0, 0, 0], atol=1e-6)


def test_onb_orthonormal():
    for nvec in ([0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.577, 0.577, 0.577]):
        n = m.safe_normalize(jnp.asarray(nvec))
        t, b, nn = m.onb_from_normal(n)
        for v in (t, b, nn):
            np.testing.assert_allclose(np.asarray(m.length(v)), 1.0,
                                       atol=1e-5)
        assert abs(float(m.vdot(t, b))) < 1e-5
        assert abs(float(m.vdot(t, nn))) < 1e-5
        # round trip
        v = jnp.asarray([0.3, -0.5, 0.8])
        lv = m.to_local(t, b, nn, v)
        wv = m.to_world(t, b, nn, lv)
        np.testing.assert_allclose(np.asarray(wv), np.asarray(v), atol=1e-5)


def test_sphere_uv_poles_and_equator():
    # +y pole: theta=0 -> v=0
    uv = m.sphere_uv(jnp.asarray([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(float(uv[1]), 0.0, atol=1e-6)
    # +x equator: phi=0 -> u=0, theta=pi/2 -> v=0.5
    uv = m.sphere_uv(jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(uv), [0.0, 0.5], atol=1e-6)


def test_cosine_hemisphere_mean_matches_analytic():
    # E[z] under cosine-weighted sampling is 2/3
    u = np.random.RandomState(0).rand(20000, 2).astype(np.float32)
    d = m.cosine_sample_hemisphere(jnp.asarray(u))
    assert abs(float(jnp.mean(d[:, 2])) - 2.0 / 3.0) < 0.01


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    y = m.srgb_to_linear(m.linear_to_srgb(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_luminance():
    assert abs(float(m.luminance(jnp.asarray([1.0, 1.0, 1.0]))) - 1.0) < 1e-6
