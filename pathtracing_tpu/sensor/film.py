"""Film: filter-weighted accumulation + image output.

The reference splats each sample into every pixel within the filter radius
of an atomic per-pixel accumulator (Film.hpp:65-82,227-249).  The TPU-native
replacement is a deterministic scatter-add over a [H*W] RGB+weight buffer —
XLA lowers `.at[].add` to a deterministic sort-based scatter on TPU, so
renders are bit-reproducible (no atomics).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.filters import FilterConfig, filter_weight, filter_integral
from ..core.tonemap import TONE_MAPPERS
from ..core.math import linear_to_srgb


def new_film(resolution):
    w, h = resolution
    return dict(rgb=jnp.zeros((h * w, 3), jnp.float32),
                weight=jnp.zeros((h * w,), jnp.float32))


def splat(film, cfg: FilterConfig, resolution, p, color):
    """FilmTile::Add (Film.hpp:65-82): accumulate `color` at continuous
    film position `p` [N,2] over the (2r+1)^2 filter footprint."""
    w, h = resolution
    rx, ry = cfg.pixel_radius
    inv_integral = 1.0 / filter_integral(cfg)
    pixel = jnp.floor(p)
    frac = p - pixel
    pixel = pixel.astype(jnp.int32)

    rgb, wgt = film["rgb"], film["weight"]
    for dy in range(-ry, ry + 1):
        for dx in range(-rx, rx + 1):
            offset = jnp.asarray([dx, dy], jnp.float32)
            sample_pos = offset + 0.5 - frac
            fw = filter_weight(cfg, sample_pos) * inv_integral
            px = pixel[..., 0] + dx
            py = pixel[..., 1] + dy
            inb = (px >= 0) & (px < w) & (py >= 0) & (py < h) & (fw > 0)
            idx = jnp.where(inb, py * w + px, h * w)  # h*w = dropped
            fw = jnp.where(inb, fw, 0.0)
            rgb = rgb.at[idx].add(color * fw[..., None], mode="drop")
            wgt = wgt.at[idx].add(fw, mode="drop")
    return dict(rgb=rgb, weight=wgt)


def finalize(film):
    """RGB / weight (Film.hpp:161,179)."""
    return film["rgb"] / jnp.maximum(film["weight"], 1e-12)[..., None]


def to_uint8(film, resolution, tone_mapper="reinhard_jodie"):
    """Tone map + linear->sRGB + flip (Film.hpp:172-193). Returns [H,W,3]
    uint8 with row 0 at the top (PNG convention)."""
    w, h = resolution
    color = finalize(film).reshape(h, w, 3)
    color = TONE_MAPPERS[tone_mapper](color)
    srgb = linear_to_srgb(color)
    img = jnp.clip(srgb * 255.999, 0.0, 255.0).astype(jnp.uint8)
    return img[::-1]   # reference flips vertically on write


def write_png(film, resolution, path, tone_mapper="reinhard_jodie"):
    from PIL import Image
    img = np.asarray(to_uint8(film, resolution, tone_mapper))
    Image.fromarray(img).save(str(path))


def write_jpg(film, resolution, path, quality=90,
              tone_mapper="reinhard_jodie"):
    from PIL import Image
    img = np.asarray(to_uint8(film, resolution, tone_mapper))
    Image.fromarray(img).save(str(path), quality=quality)


def write_ppm(film, resolution, path, tone_mapper="reinhard_jodie"):
    img = np.asarray(to_uint8(film, resolution, tone_mapper))
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(img.tobytes())
