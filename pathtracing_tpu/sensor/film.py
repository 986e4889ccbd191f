"""Film: filter-weighted accumulation + image output.

The reference splats each sample into every pixel within the filter radius
of an atomic per-pixel accumulator (Film.hpp:65-82,227-249).  The TPU-native
replacement is a deterministic scatter-add over a [H*W] RGB+weight buffer —
XLA lowers `.at[].add` to a deterministic sort-based scatter on TPU, so
renders are bit-reproducible (no atomics).
"""
from __future__ import annotations

import numpy as np
import jax
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
    film position `p` [N,2] over the (2r+1)^2 filter footprint.

    All footprint taps are gathered into ONE scatter-add: TPU scatter
    cost scales with the OPERAND (film) size, not the update count —
    the per-tap formulation paid 2*(2r+1)^2 full-film scatters
    (~680 ms/wave at 1080p); one fused [taps*N] scatter is ~20 ms."""
    w, h = resolution
    rx, ry = cfg.pixel_radius
    inv_integral = 1.0 / filter_integral(cfg)
    pixel = jnp.floor(p)
    frac = p - pixel
    pixel = pixel.astype(jnp.int32)

    idxs, vals = [], []
    for dy in range(-ry, ry + 1):
        for dx in range(-rx, rx + 1):
            offset = jnp.asarray([dx, dy], jnp.float32)
            sample_pos = offset + 0.5 - frac
            fw = filter_weight(cfg, sample_pos) * inv_integral
            px = pixel[..., 0] + dx
            py = pixel[..., 1] + dy
            # bounds only: Mitchell/Lanczos have NEGATIVE lobes that are
            # part of the reconstruction (FilmTile::Add adds them too)
            inb = (px >= 0) & (px < w) & (py >= 0) & (py < h)
            idxs.append(jnp.where(inb, py * w + px, h * w))  # h*w = drop
            fw = jnp.where(inb, fw, 0.0)
            vals.append(jnp.concatenate([color * fw[..., None],
                                         fw[..., None]], -1))
    acc = jnp.concatenate([film["rgb"], film["weight"][:, None]], -1)
    acc = acc.at[jnp.concatenate(idxs)].add(jnp.concatenate(vals),
                                            mode="drop")
    return dict(rgb=acc[:, :3], weight=acc[:, 3])


def splat_rows(film, cfg: FilterConfig, resolution, row0, rows: int, p,
               color):
    """FilmTile::Add + Film::Merge as dense ops (Film.hpp:65-82,125-132).

    When a sample batch covers whole image rows [row0, row0+rows) in
    row-major order, every (dx, dy) filter tap is a STATIC slice add into
    a padded row-tile, and the merge is one dynamic_update_slice — no
    scatter at all (XLA scatters cost ~35ms per 64K-sample wave on v5e;
    this path measures ~2ms).  row0 may be traced; rows is static.
    jitter keeps each sample inside its own pixel so the tap offsets are
    exact."""
    # static dims from array shapes (resolution entries may be traced
    # inside jit when cam rides along as an argument pytree)
    w = p.shape[0] // rows
    h = film["rgb"].shape[0] // w
    rx, ry = cfg.pixel_radius
    inv_integral = 1.0 / filter_integral(cfg)
    frac = (p - jnp.floor(p)).reshape(rows, w, 2)
    color = color.reshape(rows, w, 3)

    acc = jnp.zeros((rows + 2 * ry, w + 2 * rx, 4), jnp.float32)
    for dy in range(-ry, ry + 1):
        for dx in range(-rx, rx + 1):
            offset = jnp.asarray([dx, dy], jnp.float32)
            fw = filter_weight(cfg, offset + 0.5 - frac) * inv_integral
            contrib = jnp.concatenate([color * fw[..., None],
                                       fw[..., None]], -1)
            acc = jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(
                    acc, (dy + ry, dx + rx, 0), (rows, w, 4)) + contrib,
                (dy + ry, dx + rx, 0))
    # crop x-padding (splats past the image border are dropped, matching
    # the scatter path); merge the y-extended region into a y-padded image
    # (padding rows absorb border spill, then get cropped)
    acc = acc[:, rx:rx + w, :]
    img = jnp.concatenate([film["rgb"], film["weight"][:, None]],
                          -1).reshape(h, w, 4)
    ext = rows + 2 * ry
    img_pad = jnp.pad(img, ((ry, ry), (0, 0), (0, 0)))
    region = jax.lax.dynamic_slice(img_pad, (row0, 0, 0), (ext, w, 4))
    img_pad = jax.lax.dynamic_update_slice(img_pad, region + acc,
                                           (row0, 0, 0))
    img = img_pad[ry:ry + h]
    return dict(rgb=img[..., :3].reshape(h * w, 3),
                weight=img[..., 3].reshape(h * w))


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
