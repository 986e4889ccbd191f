"""Tone mapping operators (reference Film.hpp:22-47)."""
from __future__ import annotations

import jax.numpy as jnp

from .math import luminance, linear_to_srgb  # noqa: F401 (re-export)


def reinhard_jodie(color):
    """Default tone mapper (Film.hpp:34-38)."""
    l = luminance(color)[..., None]
    tcolor = color / (1.0 + color)
    return jnp.clip((1.0 - tcolor) * (color / (1.0 + l)) + tcolor * tcolor,
                    0.0, 1.0)


def aces(color):
    A, B, C, D, E = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((color * (A * color + B)) / (color * (C * color + D) + E),
                    0.0, 1.0)


def reinhard_extended(color, max_white_l: float = 4.0):
    l_old = luminance(color)[..., None]
    l_new = l_old * (1.0 + l_old / (max_white_l * max_white_l)) / (1.0 + l_old)
    return jnp.clip(color * (l_new / jnp.maximum(l_old, 1e-12)), 0.0, 1.0)


def none(color):
    return jnp.clip(color, 0.0, 1.0)


TONE_MAPPERS = {
    "reinhard_jodie": reinhard_jodie,
    "aces": aces,
    "reinhard_extended": reinhard_extended,
    "none": none,
}
