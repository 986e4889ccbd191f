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


def test_ragged_tile_grad_after_full_tiles():
    """Round-4 regression: jax.grad over a RAGGED film tile following a
    full-tile fori_loop crashed the TPU worker twice on the faithful
    scene (CLAUDE.md round-4 gotcha; suspected instanced-TLAS
    differentiable path).  Round 5 re-ran the exact crash config on
    hardware — 34-row tiles + a 26-row ragged grad at 1080p, both the
    flattened and the PT_FLATTEN_MAX=0 TLAS builds — twice each, clean
    (tools archive /tmp/ragged_grad.py).  This keeps the shape pattern
    exercised in CI: full-tile fori_loop + ragged-tail grad on an
    alpha-foliage pallas scene."""
    import os
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pathtracing_tpu.scene.builder import SceneBuilder
    from pathtracing_tpu.integrators.path import RenderConfig
    from pathtracing_tpu.integrators.render import render_tile
    from pathtracing_tpu.sensor import film as filmmod

    rng = np.random.default_rng(5)
    os.environ["PT_TWOLEVEL_MIN"] = "256"
    try:
        b = SceneBuilder()
        k = 32
        u, v = np.meshgrid((np.arange(k) + 0.5) / k,
                           (np.arange(k) + 0.5) / k)
        leaf = np.zeros((k, k, 4), np.float32)
        leaf[..., 1] = 0.5
        leaf[..., 3] = (((u - 0.5) ** 2 + (v - 0.5) ** 2)
                        < 0.2).astype(np.float32)
        tid = b.textures.add_image(leaf)
        lm = b.add_diffuse((0.3, 0.6, 0.3), base_tex=tid, alpha_mode=2)
        om = b.add_diffuse((0.7, 0.7, 0.7))
        N = 52
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
        # instanced alpha cards: the runtime-TLAS differentiable path
        mv = np.asarray([[-.5, 0, 0], [.5, 0, 0], [.5, 1, 0],
                         [-.5, 1, 0]], np.float32)
        mf = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        muv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        card = b.add_model(mv, mf, uvs=muv, material=lm)
        for _ in range(24):
            t = np.eye(4, dtype=np.float32)
            t[:3, 3] = [rng.uniform(-6, 6), rng.uniform(0, 2),
                        rng.uniform(-6, 6)]
            b.add_model_instance(card, t, runtime=True)
        b.add_quad([-1, 8, -1], [2, 0, 0], [0, 0, 2],
                   emission=(10, 10, 10))
        import math
        b.set_camera([0, 3, -12], [0, 1, 0], math.radians(45), (48, 28))
        scene, cam, meta = b.build()
    finally:
        os.environ.pop("PT_TWOLEVEL_MIN", None)
    assert meta.accel == "pallas" and meta.n_inst > 0
    cfg = RenderConfig(spp=1, max_depth=3, integrator="path",
                       differentiable=True)
    w, h = cam["resolution"]
    rows = 10                  # 28 = 2*10 + ragged 8
    n_full = h // rows
    rem = h - n_full * rows

    def tile_grad(base, film0, row0, rows):
        def loss(base):
            sc = dict(scene, mat_base=base)
            pix = row0 * w + jnp.arange(rows * w, dtype=jnp.int32)
            f = render_tile(sc, cam, meta, cfg, film0, pix, 1, 0,
                            rows=rows, row0=row0)
            return jnp.sum(f["rgb"])
        return jax.grad(loss)(base)

    film0 = filmmod.new_film((w, rows))

    @jax.jit
    def grad_full(base):
        def body(t, acc):
            return acc + tile_grad(base, film0,
                                   (t * rows).astype(jnp.int32), rows)
        return jax.lax.fori_loop(0, n_full, body, jnp.zeros_like(base))

    film0r = filmmod.new_film((w, rem))
    g = grad_full(scene["mat_base"])
    g = g + tile_grad(scene["mat_base"], film0r,
                      jnp.asarray(n_full * rows, jnp.int32), rem)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0
