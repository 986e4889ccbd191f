"""Henyey–Greenstein phase function (reference PhaseFunction.hpp/.cpp)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .math import INV_PI, onb_from_normal, to_world, safe_normalize, vdot


def phase_hg(cos_theta, g):
    """HG phase value (PhaseFunction.hpp:4-8)."""
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    denom = jnp.maximum(denom, 1e-8)
    return 0.25 * INV_PI * (1.0 - g * g) / (denom * jnp.sqrt(denom))


def hg_pdf(w_in, w_out, g):
    """PDF(in, out) = phaseHG(dot(in,out), g) (PhaseFunction.cpp:4-6)."""
    return phase_hg(vdot(w_in, w_out), g)


def hg_sample(w_in, g, uv):
    """Sample outgoing direction; returns (w_out, pdf)
    (PhaseFunction.cpp:8-26). Local +z is the incoming direction."""
    u0, u1 = uv[..., 0], uv[..., 1]
    iso = jnp.abs(g) < 1e-3
    cos_iso = 1.0 - 2.0 * u0
    g_safe = jnp.where(iso, 0.5, g)
    sqr = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u0)
    cos_aniso = (1.0 + g_safe * g_safe - sqr * sqr) / (2.0 * g_safe)
    cos_theta = jnp.where(iso, cos_iso, cos_aniso)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * jnp.pi * u1
    local = jnp.stack([sin_theta * jnp.cos(phi),
                       sin_theta * jnp.sin(phi),
                       cos_theta], axis=-1)
    t, b, n = onb_from_normal(w_in)
    # detached sampling: direction is an AD constant, the returned pdf
    # (= phase value) stays differentiable w.r.t. g
    w_out = jax.lax.stop_gradient(safe_normalize(to_world(t, b, n, local)))
    return w_out, phase_hg(jax.lax.stop_gradient(cos_theta), g)
