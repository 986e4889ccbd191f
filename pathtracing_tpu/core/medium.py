"""Homogeneous participating media (reference Medium.hpp:14-61).

Media live in a device-resident SoA table; lanes carry a medium id
(-1 = vacuum).  All functions are vectorized over lanes and take gathered
per-lane parameters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def medium_tr(sigma_t, t):
    """Transmittance exp(-sigma_t * t) (Medium.hpp:22-25)."""
    t = jnp.minimum(t, jnp.finfo(jnp.float32).max)
    return jnp.exp(-sigma_t * t[..., None])


def medium_sample(sigma_t, sigma_s, t_max, u_channel, u_dist):
    """Distance sampling with RGB channel MIS (Medium.hpp:27-46).

    Returns (scattered, t_scatter, weight):
      scattered: bool, True when a real in-medium scatter event happened
      t_scatter: sampled distance (= min(dist, t_max))
      weight:    throughput multiplier tr*sigma_s/pdf (scatter) or tr/pdf
    Sampling decisions (channel, distance) are detached; the weight stays
    differentiable w.r.t. sigma_t / sigma_s.
    """
    u_channel = jax.lax.stop_gradient(u_channel)
    u_dist = jax.lax.stop_gradient(u_dist)
    channel = jnp.minimum((u_channel * 3.0).astype(jnp.int32), 2)
    sig_c = jnp.take_along_axis(sigma_t, channel[..., None], axis=-1)[..., 0]
    sig_c = jnp.maximum(sig_c, 1e-18)
    dist = -jnp.log(jnp.maximum(1.0 - u_dist, 1e-18)) / sig_c
    dist = jax.lax.stop_gradient(dist)
    scattered = dist < t_max
    t_scatter = jnp.minimum(dist, t_max)

    tr = medium_tr(sigma_t, t_scatter)
    density = jnp.where(scattered[..., None], sigma_t * tr, tr)
    pdf = jnp.mean(density, axis=-1)
    pdf = jnp.maximum(pdf, 1e-18)
    weight = jnp.where(scattered[..., None],
                       tr * sigma_s / pdf[..., None],
                       tr / pdf[..., None])
    return scattered, t_scatter, weight
