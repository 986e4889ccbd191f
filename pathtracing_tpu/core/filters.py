"""Reconstruction filters (reference Filter.hpp:29-144).

Each filter is described by a static config; `filter_weight(cfg, p)` is a
pure vectorized function of the sample offset p=[...,2] used by the film
splat, and `filter_integral(cfg)` the normalisation (Film.hpp:59,73).
"""
from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FilterConfig:
    kind: str = "mitchell"        # box | gaussian | mitchell | lanczos
    radius: tuple = (1.5, 1.5)
    # gaussian
    sigma: float = 0.5
    # mitchell
    b: float = 1.0 / 3.0
    c: float = 1.0 / 3.0
    # lanczos
    tau: float = 3.0

    @property
    def pixel_radius(self) -> tuple:
        """ceil(radius - 0.5): how many whole pixels the splat reaches on
        each side (Film.hpp:59)."""
        return (int(math.ceil(self.radius[0] - 0.5)),
                int(math.ceil(self.radius[1] - 0.5)))


def box(radius=(0.5, 0.5)):
    return FilterConfig(kind="box", radius=tuple(radius))


def gaussian(radius=(1.5, 1.5), sigma=0.5):
    return FilterConfig(kind="gaussian", radius=tuple(radius), sigma=sigma)


def mitchell(radius=(1.5, 1.5), b=1.0 / 3.0, c=1.0 / 3.0):
    return FilterConfig(kind="mitchell", radius=tuple(radius), b=b, c=c)


def lanczos(radius=(1.5, 1.5), tau=3.0):
    return FilterConfig(kind="lanczos", radius=tuple(radius), tau=tau)


def _gauss(x, sigma):
    inv_sqrt_pi = 1.0 / math.sqrt(math.pi)
    return (inv_sqrt_pi / (sigma * math.sqrt(2.0))
            * jnp.exp(-(x * x) / (2.0 * sigma * sigma)))


def _gauss_integral(x0, x1, sigma) -> float:
    from math import erf, sqrt
    s = sigma * sqrt(2.0)
    return 0.5 * (erf(-x0 / s) - erf(-x1 / s))


def _mitchell_1d(x, b, c):
    ax = jnp.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    inner = ((12 - 9 * b - 6 * c) * ax3 + (-18 + 12 * b + 6 * c) * ax2
             + (6 - 2 * b)) / 6.0
    outer = ((-b - 6 * c) * ax3 + (6 * b + 30 * c) * ax2
             + (-12 * b - 48 * c) * ax + (8 * b + 24 * c)) / 6.0
    return jnp.where(ax <= 1.0, inner, jnp.where(ax <= 2.0, outer, 0.0))


def _sinc(x):
    px = jnp.pi * x
    small = 1.0 - x * x == 1.0
    return jnp.where(small, 1.0, jnp.sin(px) / jnp.where(small, 1.0, px))


def _windowed_sinc(x, radius, tau):
    return jnp.where(jnp.abs(x) > radius, 0.0, _sinc(x) * _sinc(x / tau))


def filter_weight(cfg: FilterConfig, p):
    """Evaluate the 2D filter at offset p=[...,2] (Filter.hpp Evaluate)."""
    x, y = p[..., 0], p[..., 1]
    rx, ry = cfg.radius
    if cfg.kind == "box":
        return ((jnp.abs(x) <= rx) & (jnp.abs(y) <= ry)).astype(jnp.float32)
    if cfg.kind == "gaussian":
        ex = float(np.asarray(_gauss(jnp.asarray(rx), cfg.sigma)))
        ey = float(np.asarray(_gauss(jnp.asarray(ry), cfg.sigma)))
        return (jnp.maximum(0.0, _gauss(x, cfg.sigma) - ex)
                * jnp.maximum(0.0, _gauss(y, cfg.sigma) - ey))
    if cfg.kind == "mitchell":
        return (_mitchell_1d(2.0 * x / rx, cfg.b, cfg.c)
                * _mitchell_1d(2.0 * y / ry, cfg.b, cfg.c))
    if cfg.kind == "lanczos":
        return _windowed_sinc(x, rx, cfg.tau) * _windowed_sinc(y, ry, cfg.tau)
    raise ValueError(f"unknown filter kind {cfg.kind!r}")


def filter_integral(cfg: FilterConfig) -> float:
    """Analytic / quadrature filter integral (Filter.hpp Integral)."""
    rx, ry = cfg.radius
    if cfg.kind == "box":
        return 4.0 * rx * ry
    if cfg.kind == "gaussian":
        ex = float(np.asarray(_gauss(jnp.asarray(rx), cfg.sigma)))
        ey = float(np.asarray(_gauss(jnp.asarray(ry), cfg.sigma)))
        return ((_gauss_integral(-rx, rx, cfg.sigma) - 2 * rx * ex)
                * (_gauss_integral(-ry, ry, cfg.sigma) - 2 * ry * ey))
    if cfg.kind == "mitchell":
        return rx * ry / 4.0
    if cfg.kind == "lanczos":
        # deterministic midpoint quadrature (reference uses 65k-sample MC,
        # Filter.hpp:127-140)
        n = 256
        xs = (np.arange(n) + 0.5) / n * 2 * rx - rx
        ys = (np.arange(n) + 0.5) / n * 2 * ry - ry
        gx, gy = np.meshgrid(xs, ys)
        p = jnp.stack([jnp.asarray(gx, jnp.float32),
                       jnp.asarray(gy, jnp.float32)], axis=-1)
        w = filter_weight(cfg, p)
        return float(np.asarray(jnp.mean(w))) * 4.0 * rx * ry
    raise ValueError(f"unknown filter kind {cfg.kind!r}")
