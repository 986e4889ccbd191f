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


SCENES = dict(cornell=cornell_box, furnace=furnace, mat_test=mat_test,
              medium=spheres_medium, textured=textured_quad)
