"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 item 5: the fake-backend analog for DP sharding, psum film
reduction, and gradient all-reduce)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_tpu.scenes import cornell_box, furnace
from pathtracing_tpu.integrators.path import RenderConfig
from pathtracing_tpu.integrators.render import render
from pathtracing_tpu.sensor.film import finalize
from pathtracing_tpu.parallel.mesh import (make_mesh, render_sharded,
                                           train_step_sharded)


def test_sharded_render_matches_single_device():
    scene, cam, meta = cornell_box(resolution=(32, 32))
    cfg = RenderConfig(spp=4, max_depth=3, rays_per_batch=1024)
    ref = finalize(render(scene, cam, meta, cfg))
    for sp in (1, 2):
        mesh = make_mesh(8, sp=sp)
        film = render_sharded(scene, cam, meta, cfg, mesh=mesh)
        got = finalize(film)
        # identical samples, different summation order -> allclose
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_sharded_render_device_count_invariance():
    scene, cam, meta = furnace(resolution=(16, 16))
    cfg = RenderConfig(spp=4, max_depth=3, rays_per_batch=256)
    imgs = []
    for n in (1, 2, 8):
        film = render_sharded(scene, cam, meta, cfg, mesh=make_mesh(n))
        imgs.append(np.asarray(finalize(film)))
    np.testing.assert_allclose(imgs[0], imgs[1], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(imgs[0], imgs[2], rtol=2e-4, atol=2e-5)


def test_sharded_regeneration_matches_unsharded():
    """render_sharded with regenerate=True: each shard drains its own
    (pixel x local-sample) queue; result must match the plain unsharded
    wave render (identical per-sample RNG streams, psum summation
    order aside)."""
    import dataclasses
    scene, cam, meta = cornell_box(resolution=(32, 32))
    cfg = RenderConfig(spp=4, max_depth=3, rays_per_batch=1024,
                       regenerate=True)
    ref = finalize(render(scene, cam, meta,
                          dataclasses.replace(cfg, regenerate=False)))
    for n, sp in ((8, 1), (8, 2)):
        film = render_sharded(scene, cam, meta, cfg,
                              mesh=make_mesh(n, sp=sp))
        np.testing.assert_allclose(np.asarray(finalize(film)),
                                   np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_train_step_sharded_gradients_flow():
    scene, cam, meta = cornell_box(resolution=(16, 16))
    cfg = RenderConfig(spp=2, max_depth=3, rays_per_batch=256,
                       differentiable=True)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    mesh = make_mesh(8, sp=2)
    params, loss = train_step_sharded(scene, cam, meta, cfg, target,
                                      mesh=mesh, lr=0.1)
    assert np.isfinite(float(loss)) and float(loss) > 0
    for k, v in params.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    # rendering a black target must push the light emission down
    assert float(jnp.sum(params["light_color"])) < float(
        jnp.sum(scene["light_color"]))


@pytest.mark.parametrize("filt", ["box", "mitchell"])
def test_train_step_gradient_matches_unsharded(filt):
    """psum-all-reduced sharded grads == single-device grads, for the box
    AND the wide Mitchell filter: the partial films are psum-merged
    inside the loss, so cross-shard filter spill (the halo) is exchanged
    before normalization (round 1 dropped it, making non-box sharded
    losses device-count-dependent)."""
    from pathtracing_tpu.core.filters import box, mitchell
    scene, cam, meta = furnace(resolution=(8, 8))
    cfg = RenderConfig(spp=2, max_depth=2, rays_per_batch=64,
                       differentiable=True,
                       filter=box() if filt == "box" else mitchell())
    target = jnp.full((8, 8, 3), 0.25, jnp.float32)
    lr = 1.0
    p1, l1 = train_step_sharded(scene, cam, meta, cfg, target,
                                mesh=make_mesh(1), lr=lr)
    p8, l8 = train_step_sharded(scene, cam, meta, cfg, target,
                                mesh=make_mesh(8), lr=lr)
    assert np.isclose(float(l1), float(l8), rtol=1e-4)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p8[k]),
                                    rtol=1e-3, atol=1e-6)
