"""Inverse rendering demo: recover material albedos from a target image.

Shows the differentiable path (detached-sampling estimator, counter-based
RNG replay): render a target with known albedos, perturb them, and run
gradient descent on the MSE between differentiable re-renders and the
target.  Run:  python examples/inverse_rendering.py
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu import SceneBuilder, RenderConfig, SamplerConfig
from pathtracing_tpu.integrators.render import render_tile
from pathtracing_tpu.sensor import film as fm

RES = (48, 48)

b = SceneBuilder()
red = b.add_diffuse((0.8, 0.15, 0.1), roughness=0.9)
blue = b.add_diffuse((0.1, 0.2, 0.75), roughness=0.9)
floor = b.add_diffuse((0.5, 0.5, 0.5), roughness=1.0)
b.add_quad([-6, 0, -6], [12, 0, 0], [0, 0, 12], material=floor)
b.add_sphere([-1.3, 1.0, 0], 1.0, material=red)
b.add_sphere([1.3, 1.0, 0], 1.0, material=blue)
b.add_quad([-2, 5, -2], [4, 0, 0], [0, 0, 4], emission=(10, 10, 10))
b.add_uniform_inf_light((0.3, 0.35, 0.45))
b.set_camera([0, 2.5, -6], [0, 1, 0], math.radians(40), RES)
scene, cam, meta = b.build()

cfg = RenderConfig(spp=8, max_depth=3, differentiable=True, rr_start=10,
                   sampler=SamplerConfig(x_samples=4, y_samples=2, seed=7))
pix = jnp.arange(RES[0] * RES[1], dtype=jnp.int32)


def render_with(mat_base):
    sc = dict(scene, mat_base=mat_base)
    f = fm.new_film(RES)
    f = render_tile(sc, cam, meta, cfg, f, pix, cfg.spp)
    return f["rgb"] / jnp.maximum(f["weight"], 1e-12)[:, None]


true_base = scene["mat_base"]
target = render_with(true_base)

# start from a wrong guess
guess = jnp.clip(true_base + jnp.asarray([[-0.4, 0.3, 0.3],
                                          [0.5, 0.2, -0.4],
                                          [0.2, -0.2, 0.2]]), 0.05, 0.95)


@jax.jit
def step(base, lr):
    def loss(bb):
        d = render_with(bb) - target
        return jnp.mean(d * d)
    l, g = jax.value_and_grad(loss)(base)
    return jnp.clip(base - lr * g, 0.0, 1.0), l


base = guess
for i in range(60):
    base, l = step(base, 3.0)
    if i % 10 == 0:
        err = float(jnp.abs(base - true_base).max())
        print(f"iter {i:3d}  loss {float(l):.6f}  max albedo err {err:.3f}")

print("\nrecovered albedos vs truth:")
for j in range(3):
    print(f"  mat {j}: {np.asarray(base[j]).round(3)} "
          f"vs {np.asarray(true_base[j]).round(3)}")
