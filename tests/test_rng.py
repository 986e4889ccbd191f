import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.core import rng


def test_permutation_is_bijection():
    for l in (5, 8, 16, 100):
        i = jnp.arange(l, dtype=jnp.uint32)
        p = jnp.full((l,), 12345, jnp.uint32)
        out = np.asarray(rng.permutation_element(i, l, p))
        assert sorted(out.tolist()) == list(range(l))


def test_permutation_differs_by_seed():
    l = 64
    i = jnp.arange(l, dtype=jnp.uint32)
    a = np.asarray(rng.permutation_element(i, l, jnp.uint32(1)))
    b = np.asarray(rng.permutation_element(i, l, jnp.uint32(2)))
    assert (a != b).any()


def test_uniforms_in_range_and_decorrelated():
    cfg = rng.SamplerConfig(kind="stratified", x_samples=4, y_samples=4)
    px = jnp.zeros((1024,), jnp.uint32)
    py = jnp.arange(1024, dtype=jnp.uint32)
    u = np.asarray(rng.sample_1d(cfg, px, py, jnp.uint32(3), 7))
    assert (u >= 0).all() and (u < 1).all()
    assert 0.4 < u.mean() < 0.6


def test_stratified_covers_strata():
    """Each pixel's spp samples of one dim must hit every stratum once
    (Sampler.hpp:93-97 semantics)."""
    cfg = rng.SamplerConfig(kind="stratified", x_samples=4, y_samples=4)
    spp = cfg.spp
    px = jnp.zeros((spp,), jnp.uint32)
    py = jnp.zeros((spp,), jnp.uint32)
    sidx = jnp.arange(spp, dtype=jnp.uint32)
    u = np.asarray(rng.sample_1d(cfg, px, py, sidx, 5))
    strata = np.floor(u * spp).astype(int)
    assert sorted(strata.tolist()) == list(range(spp))


def test_stratified_2d_covers_grid():
    cfg = rng.SamplerConfig(kind="stratified", x_samples=4, y_samples=4)
    spp = cfg.spp
    px = jnp.full((spp,), 7, jnp.uint32)
    py = jnp.full((spp,), 9, jnp.uint32)
    sidx = jnp.arange(spp, dtype=jnp.uint32)
    uv = np.asarray(rng.sample_2d(cfg, px, py, sidx, 0))
    cells = (np.floor(uv[:, 0] * 4).astype(int)
             + 4 * np.floor(uv[:, 1] * 4).astype(int))
    assert sorted(cells.tolist()) == list(range(spp))


def test_deterministic():
    cfg = rng.SamplerConfig()
    a = rng.sample_2d(cfg, jnp.uint32(1), jnp.uint32(2), jnp.uint32(3), 4)
    b = rng.sample_2d(cfg, jnp.uint32(1), jnp.uint32(2), jnp.uint32(3), 4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
