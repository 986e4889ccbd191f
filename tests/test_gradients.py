"""Gradient correctness (M5): AD gradients vs finite differences.

With detached sampling and counter-based RNG, the rendered image is a
deterministic function of the scene parameters for a fixed seed, and the
AD gradient must match central finite differences of that same estimator
as long as no discrete decision (lobe pick, RR) flips — guaranteed here by
diffuse-only materials (lobe prob 1 at roughness>=0.7) and depth below the
RR start."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from pathtracing_tpu.scene.builder import SceneBuilder
from pathtracing_tpu.core.rng import SamplerConfig
from pathtracing_tpu.integrators.path import RenderConfig
from pathtracing_tpu.integrators.render import render_tile
from pathtracing_tpu.sensor import film as fm


def _scene():
    b = SceneBuilder()
    m = b.add_diffuse((0.6, 0.5, 0.4), roughness=1.0)
    b.add_sphere([0, 0, 0], 1.0, material=m)
    b.add_quad([-4, -1, -4], [8, 0, 0], [0, 0, 8],
               material=b.add_diffuse((0.4, 0.4, 0.4), roughness=1.0))
    b.add_quad([-1, 4, -1], [2, 0, 0], [0, 0, 2], emission=(8, 8, 8))
    b.add_uniform_inf_light((0.2, 0.25, 0.3))
    b.set_camera([0, 1.5, -5], [0, 0, 0], math.radians(35), (8, 8))
    return b.build()


def _loss_fn(scene, cam, meta, cfg, key, which):
    pix = jnp.arange(64, dtype=jnp.int32)

    def loss(val):
        sc = dict(scene)
        sc[key] = val
        f = fm.new_film(cam["resolution"])
        f = render_tile(sc, cam, meta, cfg, f, pix, 4)
        img = f["rgb"] / jnp.maximum(f["weight"], 1e-12)[:, None]
        return jnp.mean(img)

    return loss


def test_ad_matches_finite_differences():
    scene, cam, meta = _scene()
    cfg = RenderConfig(spp=4, max_depth=3, integrator="path",
                       differentiable=True, rr_start=10,
                       sampler=SamplerConfig(x_samples=2, y_samples=2,
                                             seed=3))
    for key, eps in (("mat_base", 1e-2), ("light_color", 1e-1)):
        loss = _loss_fn(scene, cam, meta, cfg, key, None)
        val0 = scene[key]
        g_ad = np.asarray(jax.grad(loss)(val0))
        # probe the two largest-gradient coordinates with central FD
        flat = np.abs(g_ad).ravel()
        for lin in np.argsort(flat)[-2:]:
            idx = np.unravel_index(lin, g_ad.shape)
            basis = jnp.zeros_like(val0).at[idx].set(1.0)
            lp = float(loss(val0 + eps * basis))
            lm = float(loss(val0 - eps * basis))
            fd = (lp - lm) / (2 * eps)
            ad = float(g_ad[idx])
            assert np.isfinite(fd) and np.isfinite(ad)
            np.testing.assert_allclose(ad, fd, rtol=0.08, atol=1e-4), \
                (key, idx, ad, fd)


def test_gradient_descent_recovers_albedo():
    """Inverse rendering sanity: optimize albedo towards a target render."""
    scene, cam, meta = _scene()
    cfg = RenderConfig(spp=4, max_depth=2, integrator="path",
                       differentiable=True, rr_start=10,
                       sampler=SamplerConfig(x_samples=2, y_samples=2,
                                             seed=9))
    pix = jnp.arange(64, dtype=jnp.int32)

    def render_with(base):
        sc = dict(scene, mat_base=base)
        f = fm.new_film(cam["resolution"])
        f = render_tile(sc, cam, meta, cfg, f, pix, 4)
        return f["rgb"] / jnp.maximum(f["weight"], 1e-12)[:, None]

    target_base = scene["mat_base"]
    target = render_with(target_base)

    @jax.jit
    def step(base):
        def loss(b):
            diff = render_with(b) - target
            return jnp.mean(diff * diff)
        l, g = jax.value_and_grad(loss)(base)
        return base - 2.0 * g, l

    base = jnp.clip(target_base + 0.25, 0.05, 0.95)
    l0 = None
    for i in range(12):
        base, l = step(base)
        if l0 is None:
            l0 = float(l)
    assert float(l) < 0.3 * l0, (l0, float(l))


def test_gradients_flow_to_texels():
    """Texture texels are AD leaves: gradients reach the texel pool."""
    import numpy as np
    from pathtracing_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    tex = np.full((8, 8, 3), 0.5, np.float32)
    tid = b.textures.add_image(tex)
    m = b.add_diffuse((1, 1, 1), roughness=1.0, base_tex=tid)
    b.add_quad([-2, 0, -2], [4, 0, 0], [0, 0, 4], material=m)
    b.add_uniform_inf_light((1.0, 1.0, 1.0))
    b.set_camera([0, 3, -3], [0, 0, 0], math.radians(40), (8, 8))
    scene, cam, meta = b.build()
    cfg = RenderConfig(spp=2, max_depth=2, differentiable=True,
                       sampler=SamplerConfig(x_samples=2, y_samples=1,
                                             seed=4))
    pix = jnp.arange(64, dtype=jnp.int32)

    def loss(texels):
        sc = dict(scene, tex_texels=texels)
        f = fm.new_film(cam["resolution"])
        f = render_tile(sc, cam, meta, cfg, f, pix, 2)
        return jnp.sum(f["rgb"])

    g = np.asarray(jax.grad(loss)(scene["tex_texels"]))
    assert np.isfinite(g).all()
    assert np.abs(g[:, :3]).max() > 0.0     # rgb texels get gradient
