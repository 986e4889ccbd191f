"""Fully commented API walkthrough — the analog of the reference's
examples/example_1.cpp (its 13-step scene/render tutorial), adapted to the
TPU-native API.  Run:  python examples/example_1.py
"""
import math

import numpy as np

from pathtracing_tpu import SceneBuilder, RenderConfig, SamplerConfig, render
from pathtracing_tpu.sensor import film as filmmod

# 1. A scene starts from a SceneBuilder (the reference builds a Scene object
#    and Adds primitives; here everything is staged host-side and compiled
#    to flat device arrays by build()).
b = SceneBuilder()

# 2. Textures live in a pool; ids are plain ints.  This checker uses two
#    solid sub-textures (CheckerTexture analog).
white = b.textures.add_solid((0.9, 0.9, 0.9))
black = b.textures.add_solid((0.2, 0.2, 0.2))
checker = b.textures.add_checker(white, black, uv_scale=(0.1, 0.1))

# 3. Materials: glTF-style metallic-roughness diffuse, rough glass, thin
#    glass, and a mirror (the reference's four material classes).
floor_mat = b.add_diffuse((1.0, 1.0, 1.0), roughness=1.0, base_tex=checker)
red_mat = b.add_diffuse((0.8, 0.15, 0.1), roughness=0.35, metallic=0.1)
glass = b.add_dielectric(ior=1.5, roughness=0.0)
mirror = b.add_conductor((0.9, 0.9, 0.95))

# 4. Shapes: quads take (corner, edge_u, edge_v); spheres (center, radius).
b.add_quad([-8, 0, -8], [16, 0, 0], [0, 0, 16], material=floor_mat)
b.add_sphere([-2.2, 1.0, 0.0], 1.0, material=red_mat)
b.add_sphere([0.0, 1.0, 0.0], 1.0, material=glass)
b.add_sphere([2.2, 1.0, 0.0], 1.0, material=mirror)

# 5. An area light is any emissive shape (per-shape AreaLight analog).
b.add_quad([-1.5, 5.0, -1.5], [3, 0, 0], [0, 0, 3], emission=(14, 14, 14))

# 6. A participating medium (HomogeneusMedium): attach to a shape to fill
#    its interior; set_scene_medium() would fill the whole world.
fog = b.add_medium(sigma_a=(0.05, 0.05, 0.05), sigma_s=(0.4, 0.4, 0.4),
                   g=0.3)
b.add_sphere([0.0, 1.0, 2.6], 0.8, material=glass, medium=fog)

# 7. Infinite light: uniform sky here; add_env_light_from_file("sky.hdr")
#    or add_function_inf_light(fn) also work.
b.add_uniform_inf_light((0.25, 0.35, 0.5))

# 8. The acceleration structure is chosen at build() (accel="auto" picks
#    brute/pallas by scene size) — the Scene::BuildTlas step.

# 9. Camera: thin lens; fov is the full vertical angle in radians; the
#    focus controls add defocus blur (set both to 0 for a pinhole).
b.set_camera(look_from=[0, 3.0, -8.0], look_at=[0, 1.0, 0],
             fov=math.radians(45.0), resolution=(640, 480),
             focus_angle=math.radians(1.2), focus_distance=8.0)

scene, cam, meta = b.build()

# 10. Render config: integrator ("simple" | "path" | "volpath"), sample
#     counts, bounce depth, stratified sampler grid, film filter.
cfg = RenderConfig(spp=64, max_depth=8, integrator="volpath",
                   sampler=SamplerConfig(x_samples=8, y_samples=8, seed=0))

# 11. Render: returns the film accumulator (RGB + weight); render() can be
#     resumed via sample_offset, checkpointed (utils.checkpoint), run
#     adaptively (utils.adaptive), or sharded over a TPU mesh
#     (parallel.render_sharded).
film = render(scene, cam, meta, cfg,
              progress=lambda d, t: print(f"\r{100*d/t:5.1f}%", end=""))
print()

# 12. Write the image: tone mapping (reinhard_jodie | aces | reinhard) and
#     linear->sRGB happen in the writer, like Film::WritePNG.
filmmod.write_png(film, cam["resolution"], "example_1.png")

# 13. Gradients: wrap the render in jax.grad with
#     RenderConfig(differentiable=True) to optimize scene parameters —
#     see tests/test_gradients.py and parallel.train_step_sharded.
print("wrote example_1.png")
