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


def render_adaptive(scene, cam, meta, cfg, base_spp: int | None = None,
                    target: float = 1.5, max_factor: int = 128,
                    progress=None):
    """Adaptive render: repeat base_spp-sample waves per pixel until the
    relative variance target is met or max_factor * base_spp samples.

    Returns (film, stats dict with spp_map [H*W]).
    """
    from ..integrators.render import render_tile
    from ..sensor.film import new_film

    w, h = cam["resolution"]
    npix = w * h
    base_spp = base_spp or cfg.spp
    film = new_film(cam["resolution"])
    est = welford_init(npix)
    active = jnp.ones((npix,), bool)
    pixel_idx = jnp.arange(npix, dtype=jnp.int32)
    done_spp = np.zeros(npix, np.int32)

    for wave in range(max_factor):
        # render one batch only into a scratch film, then merge where active
        scratch = new_film(cam["resolution"])
        scratch = render_tile(scene, cam, meta, cfg, scratch, pixel_idx,
                              base_spp, sample_offset=wave * base_spp)
        val = scratch["rgb"] / jnp.maximum(scratch["weight"], 1e-12)[:, None]
        est = welford_add(est, val, active)
        film = dict(
            rgb=film["rgb"] + jnp.where(active[:, None], scratch["rgb"],
                                        0.0),
            weight=film["weight"] + jnp.where(active, scratch["weight"],
                                              0.0))
        done_spp += np.asarray(active, np.int32) * base_spp
        rel = relative_variance(est)
        active = active & (rel > target)
        n_active = int(jnp.sum(active))
        if progress:
            progress(wave + 1, n_active, npix)
        if n_active == 0:
            break
    return film, dict(spp_map=done_spp,
                      mean_spp=float(done_spp.mean()))
