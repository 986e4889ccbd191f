"""Thin-lens camera (reference Camera.hpp:4-64)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import safe_normalize, in_unit_disk
from ..core.rng import sample_1d, sample_2d


def generate_ray(cam, p, time_u, lens_uv):
    """Camera::GenerateRay (Camera.hpp:21-35), vectorized.

    p: [N,2] film sample position in pixel coordinates
    time_u: [N] shutter interpolant; lens_uv: [N,2] lens sample.
    Returns (origin [N,3], dir [N,3], time [N]).
    """
    res_x, res_y = cam["resolution"]
    u_coord = p[..., 0] / res_x
    v_coord = p[..., 1] / res_y
    half_w = cam["half_wh"][0]
    half_h = cam["half_wh"][1]
    direction = safe_normalize(
        -cam["w"] + (2.0 * u_coord - 1.0)[..., None] * half_w * cam["u"]
        + (2.0 * v_coord - 1.0)[..., None] * half_h * cam["v"])
    t = cam["shutter"][0] + (cam["shutter"][1] - cam["shutter"][0]) * time_u

    no_dof = (cam["focus_distance"] == 0.0) | (cam["defocus_radius"] == 0.0)
    p_lens = in_unit_disk(lens_uv)
    offset = (p_lens[..., 0:1] * cam["u"] * cam["defocus_radius"]
              + p_lens[..., 1:2] * cam["v"] * cam["defocus_radius"])
    dir_dof = safe_normalize(direction * cam["focus_distance"] - offset)
    origin = jnp.where(no_dof, cam["origin"],
                       cam["origin"] + offset)
    direction = jnp.where(no_dof, direction, dir_dof)
    # camera parameters are not AD targets (see make_interaction note)
    return (jax.lax.stop_gradient(origin),
            jax.lax.stop_gradient(direction),
            jax.lax.stop_gradient(t))


def film_position(sampler, px, py, sample_idx):
    """Jittered film-plane sample position for (pixel, sample): dim 0 is
    the pixel jitter (getPixel2D) — the layout every render path shares
    so film splats and camera rays always agree."""
    p_jitter = sample_2d(sampler, px, py, sample_idx, 0)
    return jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)],
                     axis=-1) + p_jitter


def camera_lanes(cam, sampler, px, py, sample_idx):
    """Full per-lane camera sample: film jitter (dim 0), shutter time
    (dim 2), lens uv (dim 3).  Returns (origin, direction, time, p).
    Shared by the wave driver (render._sample_wave) and the regenerative
    wavefront (path.trace_regen) so both produce identical rays for any
    (pixel, sample_idx)."""
    time_u = sample_1d(sampler, px, py, sample_idx, 2)
    lens_uv = sample_2d(sampler, px, py, sample_idx, 3)
    p = film_position(sampler, px, py, sample_idx)
    origin, direction, time = generate_ray(cam, p, time_u, lens_uv)
    return origin, direction, time, p
