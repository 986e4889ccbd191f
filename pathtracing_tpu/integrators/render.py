"""Render driver: the TPU replacement for TileIntegrator::Render.

The reference fans out CPU threads over 32x32 tiles pulled from an atomic
counter (Integrators.cpp:23-129).  Here the image is processed as pixel
batches (tiles) x sample waves: each wave traces one sample index for a
whole batch of pixels as a single fused XLA program, and film accumulation
is a deterministic scatter-add.  Multi-chip sharding splits the batch axis
across devices (parallel/mesh.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..sensor.camera import camera_lanes, film_position
from ..sensor import film as filmmod
from .path import RenderConfig, trace, trace_regen


def _sample_wave(scene, cam, meta, cfg: RenderConfig, film, pixel_idx,
                 sample_idx, rows: int | None = None, row0=None):
    """Trace one sample for a batch of pixels and splat into the film.

    When the batch covers whole image rows [row0, row0+rows) in row-major
    order (rows static, row0 may be traced), the splat takes the dense
    row-tile path (film.splat_rows) instead of scatter-adds."""
    w, h = cam["resolution"]
    px = pixel_idx % w
    py = pixel_idx // w
    origin, direction, time, p = camera_lanes(cam, cfg.sampler, px, py,
                                              sample_idx)
    color = trace(scene, cam, meta, cfg, origin, direction, time,
                  px, py, sample_idx)
    color = jnp.where(jnp.isfinite(color), color, 0.0)   # NaN guard
    if rows is not None:
        return filmmod.splat_rows(film, cfg.filter, cam["resolution"],
                                  row0, rows, p, color)
    # out-of-range pixels (padding) splat out of bounds and are dropped
    p = jnp.where((pixel_idx < w * h)[:, None], p,
                  jnp.full_like(p, -1e6))
    return filmmod.splat(film, cfg.filter, cam["resolution"], p, color)


@partial(jax.jit, static_argnames=("meta", "cfg", "n_samples", "rows"))
def render_tile(scene, cam, meta, cfg: RenderConfig, film, pixel_idx,
                n_samples: int, sample_offset=0, rows: int | None = None,
                row0=None):
    """Scan `n_samples` sample waves for one pixel batch.
    `sample_offset` is traced, so resuming a render reuses the compile.
    rows/row0: see _sample_wave (dense row-tile splat)."""
    offset = jnp.asarray(sample_offset, jnp.uint32)

    def body(film, s_idx):
        return _sample_wave(scene, cam, meta, cfg, film, pixel_idx,
                            s_idx + offset, rows=rows, row0=row0), None

    film, _ = jax.lax.scan(body, film,
                           jnp.arange(n_samples, dtype=jnp.uint32))
    return film


@partial(jax.jit, static_argnames=("meta", "cfg", "waves", "rows",
                                   "lanes"))
def render_tile_regen(scene, cam, meta, cfg: RenderConfig, film,
                      pixel_idx, waves: int, sample_offset,
                      rows: int | None = None, row0=None,
                      lanes: int | None = None):
    """Regenerative render of `waves` consecutive sample indices for one
    pixel batch: one persistent-wavefront queue drain (path.trace_regen)
    by `lanes` in-flight lanes, then per-wave splats — the same film
    contract as render_tile (dense row splats when the batch covers
    whole rows [row0, row0+rows), scatter splats with out-of-range
    padding dropped otherwise).  The pixel batch may span SEVERAL
    rays_per_batch tiles (that is what gives regeneration a queue to
    drain at spp=1)."""
    w, h = cam["resolution"]
    px = pixel_idx % w
    py = pixel_idx // w
    offset = jnp.asarray(sample_offset, jnp.uint32)
    if cfg.differentiable:
        # custom-VJP persistent wavefront (regen_diff.py): gradients
        # flow to material/texture/light/medium arrays while keeping
        # regeneration scheduling (the plain trace_regen while_loop is
        # not reverse-differentiable)
        from .regen_diff import trace_regen_diff
        out = trace_regen_diff(scene, cam, meta, cfg, pixel_idx, waves,
                               offset, lanes=lanes)
    else:
        out = trace_regen(scene, cam, meta, cfg, pixel_idx, waves,
                          offset, lanes=lanes)
    k = pixel_idx.shape[0]
    for s_w in range(waves):
        p = film_position(cfg.sampler, px, py, offset + jnp.uint32(s_w))
        color = out[s_w * k:(s_w + 1) * k]
        if rows is not None:
            film = filmmod.splat_rows(film, cfg.filter,
                                      cam["resolution"], row0, rows, p,
                                      color)
        else:
            p = jnp.where((pixel_idx < w * h)[:, None], p,
                          jnp.full_like(p, -1e6))
            film = filmmod.splat(film, cfg.filter, cam["resolution"], p,
                                 color)
    return film


REGEN_QUEUE_BATCHES = 4


def regen_schedule(n_tiles: int, spp: int, divisor: bool = False):
    """(g_tiles, waves_per_group) for a regenerative drain.

    Target queue size: REGEN_QUEUE_BATCHES lane-batches of samples per
    drain — enough that the drain tail amortizes and spp=1 renders
    regenerate across tiles, small enough that the per-iteration
    O(queue)-row flush scatter (CLAUDE.md: scatter cost follows the
    OPERAND size) stays noise next to a lane-batch bounce at any batch
    width.  divisor=True restricts g_tiles to divisors of n_tiles
    (the sharded worker scans equal-size groups)."""
    budget = REGEN_QUEUE_BATCHES
    g_tiles = min(n_tiles, max(1, budget // spp))
    if divisor:
        while n_tiles % g_tiles:
            g_tiles -= 1
    return g_tiles, max(1, budget // g_tiles)


def render(scene, cam, meta, cfg: RenderConfig, film=None, spp=None,
           sample_offset: int = 0, progress=None):
    """Full-frame render. Returns the film dict (rgb + weight)."""
    w, h = cam["resolution"]
    npix = w * h
    spp = cfg.spp if spp is None else spp
    # row-aligned batches take the dense (scatter-free) film splat
    rows_per = max(1, min(cfg.rays_per_batch, npix) // w)
    batch = rows_per * w
    n_tiles = -(-h // rows_per)
    if film is None:
        film = filmmod.new_film(cam["resolution"])
    # differentiable regeneration goes through the custom-VJP wavefront
    # (render_tile_regen -> trace_regen_diff); volpath keeps the scan
    # form there (regen_diff does not record transmittance marching)
    use_regen = cfg.regenerate and not (cfg.differentiable
                                        and cfg.integrator == "volpath")
    if use_regen:
        # queue groups of (consecutive row tiles) x (sample waves)
        g_tiles, wpg = regen_schedule(n_tiles, spp)
        t = 0
        while t < n_tiles:
            g = min(g_tiles, n_tiles - t)
            row0 = t * rows_per
            rows = min(g * rows_per, h - row0)
            pixel_idx = jnp.arange(row0 * w, (row0 + rows) * w,
                                   dtype=jnp.int32)
            done = 0
            while done < spp:
                waves = min(wpg, spp - done)
                film = render_tile_regen(scene, cam, meta, cfg, film,
                                         pixel_idx, waves,
                                         sample_offset + done, rows,
                                         jnp.asarray(row0, jnp.int32),
                                         lanes=batch)
                done += waves
            t += g
            if progress:
                progress(t, n_tiles)
        return film
    for t in range(n_tiles):
        row0 = t * rows_per
        rows = min(rows_per, h - row0)
        pixel_idx = jnp.arange(row0 * w, (row0 + rows) * w,
                               dtype=jnp.int32)
        film = render_tile(scene, cam, meta, cfg, film, pixel_idx, spp,
                           sample_offset, rows=rows,
                           row0=jnp.asarray(row0, jnp.int32))
        if progress:
            progress(t + 1, n_tiles)
    return film


def render_image(scene, cam, meta, cfg: RenderConfig,
                 tone_mapper="reinhard_jodie"):
    """Render and return the [H,W,3] float image (weight-normalised,
    linear)."""
    film = render(scene, cam, meta, cfg)
    w, h = cam["resolution"]
    return filmmod.finalize(film).reshape(h, w, 3)
