"""Built-in example scenes.

The reference hardcodes its scenes in main.cpp (main.cpp:44-935) and ships a
commented API walkthrough (examples/example_1.cpp).  These builders are the
same capability as a library: each returns (scene, cam, meta).
"""
from __future__ import annotations

import math

import numpy as np

from .scene.builder import SceneBuilder


def cornell_box(resolution=(256, 256), light_emission=(15.0, 15.0, 15.0)):
    """Cornell-style analytic box: diffuse walls, one area light
    (BASELINE config 1; mirrors examples/example_1.cpp:17-122)."""
    b = SceneBuilder()
    white = b.add_diffuse((0.73, 0.73, 0.73), roughness=1.0)
    red = b.add_diffuse((0.65, 0.05, 0.05), roughness=1.0)
    green = b.add_diffuse((0.12, 0.45, 0.15), roughness=1.0)
    glass = b.add_dielectric(ior=1.5, roughness=0.0)
    metal = b.add_conductor((0.8, 0.85, 0.88))

    s = 555.0
    b.add_quad([s, 0, 0], [0, s, 0], [0, 0, s], material=green)    # left
    b.add_quad([0, 0, 0], [0, s, 0], [0, 0, s], material=red)      # right
    b.add_quad([0, 0, 0], [s, 0, 0], [0, 0, s], material=white)    # floor
    b.add_quad([0, s, 0], [s, 0, 0], [0, 0, s], material=white)    # ceiling
    b.add_quad([0, 0, s], [s, 0, 0], [0, s, 0], material=white)    # back
    # area light (slightly below ceiling, one-sided facing down)
    b.add_quad([213, s - 1.0, 227], [130, 0, 0], [0, 0, 105],
               material=white, emission=light_emission, one_sided=False)
    # two spheres
    b.add_sphere([190, 90, 190], 90, material=glass)
    b.add_sphere([380, 90, 380], 90, material=metal)

    b.set_camera(look_from=[278, 278, -800], look_at=[278, 278, 0],
                 fov=math.radians(40.0) * 2, resolution=resolution)
    return b.build()


def furnace(resolution=(64, 64), albedo=(0.73, 0.73, 0.73),
            sky=(1.0, 1.0, 1.0)):
    """White-furnace-style probe: one diffuse sphere in a uniform dome."""
    b = SceneBuilder()
    mat = b.add_diffuse(albedo, roughness=1.0)
    b.add_sphere([0, 0, 0], 1.0, material=mat)
    b.add_uniform_inf_light(sky)
    b.set_camera(look_from=[0, 0, -4], look_at=[0, 0, 0],
                 fov=math.radians(30.0), resolution=resolution)
    return b.build()


def mat_test(resolution=(440, 720), rows=11, cols=18, spacing=2.2,
             radius=1.0):
    """Roughness x metallic sphere grid, the reference's BSDF regression
    chart (MatTest, main.cpp:44-162); BASELINE config 2."""
    b = SceneBuilder()
    b.add_uniform_inf_light((1.0, 1.0, 1.0))
    for i in range(rows):
        for j in range(cols):
            rough = i / max(rows - 1, 1)
            metal = j / max(cols - 1, 1)
            m = b.add_diffuse((0.8, 0.2, 0.2), roughness=max(rough, 0.05),
                              metallic=metal)
            b.add_sphere([(j - cols / 2) * spacing,
                          (i - rows / 2) * spacing, 0.0], radius,
                         material=m)
    b.set_camera(look_from=[0, 0, -40], look_at=[0, 0, 0],
                 fov=math.radians(35.0), resolution=resolution)
    return b.build()


def spheres_medium(resolution=(128, 128)):
    """Homogeneous-medium scene (NoModel analog, main.cpp:356-456);
    BASELINE config 4: volumetric scattering with NEE through media."""
    b = SceneBuilder()
    fog = b.add_medium(sigma_a=(0.02, 0.02, 0.02),
                       sigma_s=(0.15, 0.15, 0.15), g=0.0)
    white = b.add_diffuse((0.73, 0.73, 0.73), roughness=1.0)
    glass = b.add_dielectric(ior=1.5, roughness=0.0)
    b.add_quad([-50, 0, -50], [100, 0, 0], [0, 0, 100], material=white)
    b.add_sphere([0, 2, 0], 2.0, material=glass, medium=fog)
    b.add_sphere([-5, 1.5, 2], 1.5, material=white)
    b.add_quad([-3, 10, -3], [6, 0, 0], [0, 0, 6], material=white,
               emission=(20, 20, 20))
    b.add_uniform_inf_light((0.05, 0.07, 0.1))
    b.set_scene_medium(
        b.add_medium(sigma_a=(0.001, 0.001, 0.001),
                     sigma_s=(0.01, 0.01, 0.01), g=0.0))
    b.set_camera(look_from=[0, 4, -14], look_at=[0, 2, 0],
                 fov=math.radians(35.0), resolution=resolution)
    return b.build()


def textured_quad(resolution=(128, 128), checker=True):
    """Texture/alpha feature probe (BASELINE config 3 mini)."""
    b = SceneBuilder()
    tex = np.zeros((64, 64, 4), np.float32)
    xx, yy = np.meshgrid(np.arange(64), np.arange(64))
    tex[..., 0] = (xx / 63.0)
    tex[..., 1] = (yy / 63.0)
    tex[..., 2] = 0.5
    tex[..., 3] = np.where(((xx // 8) + (yy // 8)) % 2 == 0, 1.0, 0.0)
    tid = b.textures.add_image(tex)
    mat = b.add_diffuse((1, 1, 1), roughness=1.0, base_tex=tid,
                        alpha_mode=2, alpha_cutoff=0.5)
    floor = b.add_diffuse((0.6, 0.6, 0.6), roughness=1.0)
    b.add_quad([-5, 0, -5], [10, 0, 0], [0, 0, 10], material=floor)
    b.add_quad([-2, 1, 0], [4, 0, 0], [0, 3, 0], material=mat)
    b.add_uniform_inf_light((1.0, 1.0, 1.0))
    b.set_camera(look_from=[0, 3, -8], look_at=[0, 2, 0],
                 fov=math.radians(35.0), resolution=resolution)
    return b.build()


def sanmiguel_analog(resolution=(1920, 1080), n_tris=10_500_000,
                     accel="auto"):
    """San-Miguel-class synthetic workload (BASELINE config 5 class).

    The reference's headline benchmark is San Miguel: ~10M triangles,
    1920x1080, PathIntegrator, maxDepth 64, sun + procedural sky
    (main.cpp:279-354).  The asset itself is not redistributable (and
    this image has no egress), so the benchmark scene is a synthetic
    mesh of the same scale and character: a walled courtyard whose
    floor is a ~n_tris-triangle displaced grid with plateau "buildings"
    (lots of local occlusion, mixed normals), lit by a DistantLight sun
    and a uniform sky, viewed from inside so most pixels hit geometry.
    """
    b = SceneBuilder()
    plaster = b.add_diffuse((0.62, 0.55, 0.45), roughness=0.8)
    wall_m = b.add_diffuse((0.55, 0.42, 0.32), roughness=0.9)

    side = max(2, int(math.isqrt(n_tris // 2)) + 1)
    xs = np.linspace(0.0, 100.0, side, dtype=np.float32)
    zs = np.linspace(0.0, 100.0, side, dtype=np.float32)
    x, z = np.meshgrid(xs, zs, indexing="ij")
    # terrain: smooth undulation + fine detail (deterministic)
    y = (2.5 * np.sin(x * 0.11) * np.cos(z * 0.09)
         + 0.8 * np.sin(x * 0.9 + 1.3) * np.sin(z * 1.1)
         + 0.15 * np.sin(x * 7.1) * np.cos(z * 6.3)).astype(np.float32)
    # plateau "buildings": a court of raised blocks (occlusion / deep paths)
    for (bx, bz, hw, hh) in ((22, 22, 9, 14), (70, 25, 11, 18),
                             (28, 72, 10, 16), (72, 70, 8, 12),
                             (50, 50, 6, 8)):
        mask = (np.abs(x - bx) < hw) & (np.abs(z - bz) < hw)
        y = np.where(mask, y + hh, y)
    v = np.stack([x, y, z], -1).reshape(-1, 3)
    i, j = np.meshgrid(np.arange(side - 1), np.arange(side - 1),
                       indexing="ij")
    a = (i * side + j).ravel()
    f = np.concatenate([np.stack([a, a + 1, a + side], -1),
                        np.stack([a + 1, a + side + 1, a + side], -1)],
                       0).astype(np.int32)
    b.add_mesh(v, f, material=plaster)
    # enclosing walls (quads) keep bounce paths alive (courtyard effect)
    h = 30.0
    b.add_quad([0, -5, 0], [100, 0, 0], [0, h, 0], material=wall_m)
    b.add_quad([0, -5, 100], [100, 0, 0], [0, h, 0], material=wall_m)
    b.add_quad([0, -5, 0], [0, 0, 100], [0, h, 0], material=wall_m)
    b.add_quad([100, -5, 0], [0, 0, 100], [0, h, 0], material=wall_m)

    b.add_distant_light(direction=(-0.35, -1.0, -0.25),
                        color=(6.0, 5.7, 5.2))              # sun
    b.add_uniform_inf_light((0.35, 0.45, 0.65))             # sky
    b.set_camera(look_from=[6.0, 26.0, 6.0], look_at=[60.0, 2.0, 60.0],
                 fov=math.radians(65.0), resolution=resolution)
    return b.build(accel=accel)


SCENES = dict(cornell=cornell_box, furnace=furnace, mat_test=mat_test,
              medium=spheres_medium, textured=textured_quad,
              sanmiguel_analog=sanmiguel_analog)
