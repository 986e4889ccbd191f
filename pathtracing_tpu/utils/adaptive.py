"""Adaptive sampling: Welford variance + wave-loop stop rule.

The reference tracks a per-pixel 3-channel Welford VarianceEstimator and
keeps adding spp batches until `1.96 * stderr / mean <= 1.5` or a 128x spp
cap (Util.hpp:8-43, Integrators.cpp:55-90).  The TPU redesign keeps the
same math as whole-film arrays: each *wave* updates (count, mean, m2)
per pixel; a wave only splats pixels still above the variance target
(converged pixels keep their accumulated value, matching the reference's
early-out per pixel).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def welford_init(n):
    return dict(count=jnp.zeros((n,), jnp.float32),
                mean=jnp.zeros((n, 3), jnp.float32),
                m2=jnp.zeros((n, 3), jnp.float32))


def welford_add(st, value, mask):
    """VarianceEstimator::Add (Util.hpp:10-16), masked per lane."""
    m = mask.astype(jnp.float32)
    count = st["count"] + m
    safe = jnp.maximum(count, 1.0)
    delta = value - st["mean"]
    mean = st["mean"] + delta * (m / safe)[:, None]
    delta2 = value - mean
    m2 = st["m2"] + (delta * delta2) * m[:, None]
    return dict(count=count, mean=mean, m2=m2)


def relative_variance(st):
    """VarianceEstimator::RelativeVariance = 1.96*stderr/mean summed over
    RGB (Util.hpp:24-43; Integrators.cpp:78-86 uses the 3-channel sum)."""
    c = jnp.maximum(st["count"], 2.0)
    var = st["m2"] / (c - 1.0)[:, None]
    stderr = jnp.sqrt(jnp.maximum(var / c[:, None], 0.0))
    rel = jnp.where(jnp.abs(st["mean"]) > 1e-8,
                    1.96 * stderr / jnp.maximum(jnp.abs(st["mean"]), 1e-8),
                    0.0)
    return rel.sum(-1)


def _bucket(n: int, npix: int, floor: int) -> int:
    """Smallest pow2-stepped capacity >= n.  Pow2 steps bound the number
    of distinct render_tile shapes (compiles) to log2(npix/floor) while
    keeping padding waste under 2x; the floor stops tiny trailing batches
    from each compiling their own shape."""
    c = min(floor, npix)
    while c < n:
        c = min(c * 2, npix)
    return c


def render_adaptive(scene, cam, meta, cfg, base_spp: int | None = None,
                    target: float = 1.5, max_factor: int = 128,
                    progress=None, bucket_floor: int = 4096):
    """Adaptive render: repeat base_spp-sample waves per pixel until the
    relative variance target is met or max_factor * base_spp samples.

    Unlike a masked-splat formulation (round 1), each wave traces ONLY
    the still-active pixels: they are gathered into a dense batch padded
    to a pow4 bucket capacity, so converged pixels stop costing compute —
    the reference's per-pixel early-out (Integrators.cpp:59-87) as a
    wavefront gather.

    Returns (film, stats dict with spp_map [H*W], traced_samples).
    """
    from ..integrators.render import render_tile
    from ..sensor.film import new_film

    w, h = cam["resolution"]
    npix = w * h
    base_spp = base_spp or cfg.spp
    film = new_film(cam["resolution"])
    est = welford_init(npix)
    active = np.ones((npix,), bool)
    done_spp = np.zeros(npix, np.int32)
    traced = 0

    for wave in range(max_factor):
        idx_active = np.nonzero(active)[0].astype(np.int32)
        n_active = len(idx_active)
        if n_active == 0:
            break
        cap = _bucket(n_active, npix, bucket_floor)
        # padding slots point past the image: render_tile drops their
        # splat, and their trace cost is bounded by the pow4 bucket
        pixel_idx = np.full(cap, npix, np.int32)
        pixel_idx[:n_active] = idx_active
        traced += cap * base_spp
        scratch = new_film(cam["resolution"])
        if cfg.regenerate and not cfg.differentiable:
            # the active-pixel bucket x base_spp waves IS a queue: drain
            # it with lane-batch-wide regeneration instead of scanning
            # base_spp full-depth waves
            from ..integrators.render import render_tile_regen
            scratch = render_tile_regen(
                scene, cam, meta, cfg, scratch, jnp.asarray(pixel_idx),
                base_spp, wave * base_spp,
                lanes=min(cfg.rays_per_batch, cap))
        else:
            scratch = render_tile(scene, cam, meta, cfg, scratch,
                                  jnp.asarray(pixel_idx), base_spp,
                                  sample_offset=wave * base_spp)
        amask = jnp.asarray(active)
        val = scratch["rgb"] / jnp.maximum(scratch["weight"], 1e-12)[:, None]
        est = welford_add(est, val, amask)
        film = dict(
            rgb=film["rgb"] + jnp.where(amask[:, None], scratch["rgb"],
                                        0.0),
            weight=film["weight"] + jnp.where(amask, scratch["weight"],
                                              0.0))
        done_spp[active] += base_spp
        rel = relative_variance(est)
        # a pixel may stop only once the estimator has >=2 wave
        # observations — with one observation m2 is identically 0 and the
        # stop rule would (wrongly) converge the whole frame at wave 1
        can_stop = np.asarray(est["count"]) >= 2
        active = active & ~(np.asarray(rel <= target) & can_stop)
        if progress:
            progress(wave + 1, int(active.sum()), npix)
    return film, dict(spp_map=done_spp,
                      mean_spp=float(done_spp.mean()),
                      traced_samples=traced)
