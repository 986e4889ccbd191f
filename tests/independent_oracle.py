"""A from-scratch NumPy path tracer used as an INDEPENDENT estimator.

Round-1 review flagged that the golden images only pin the renderer to
its own earlier output; this module provides an estimator implemented
from the rendering equation up, sharing no code with pathtracing_tpu
(only the same published BSDF formulas: GGX NDF, height-correlated
Smith, Schlick), so tests/test_independent_oracle.py can compare
converged MEANS of the two implementations.

Scope is the `simple` integrator semantics (BSDF sampling only, unit
weights — reference SimplePathIntegrator, Integrators.cpp:117-158):
matching transport means here validates intersection, emission,
one-sidedness, sky handling, throughput bookkeeping and the diffuse
BSDF — independently of MIS/NEE, which the estimator-consistency test
(test_render_e2e.py) ties to the same mean.

Intentionally NOT shared with the renderer: intersection math is
written in plain per-shape NumPy, sampling is plain cosine-hemisphere
(any unbiased sampler integrates the same transport), no RR, no Morton
sorting, no masking — a different estimator of the same integral.
"""
from __future__ import annotations

import numpy as np

_EPS = 1e-4


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

def _quad_hit(q, u, v, o, d):
    """Two-sided parallelogram {q + a*u + b*v : a,b in [0,1]}."""
    n = np.cross(u, v)
    nn = n / np.linalg.norm(n)
    denom = d @ nn
    t = ((q - o) @ nn) / np.where(np.abs(denom) < 1e-12, np.inf, denom)
    p = o + t[:, None] * d
    w = p - q
    uu, vv, uv = u @ u, v @ v, u @ v
    det = uu * vv - uv * uv
    a = (vv * (w @ u) - uv * (w @ v)) / det
    b = (uu * (w @ v) - uv * (w @ u)) / det
    ok = (t > _EPS) & (a >= 0) & (a <= 1) & (b >= 0) & (b <= 1)
    return np.where(ok, t, np.inf), np.broadcast_to(nn, o.shape)


def _sphere_hit(c, r, o, d):
    oc = o - c
    bq = np.einsum("ij,ij->i", oc, d)
    cq = np.einsum("ij,ij->i", oc, oc) - r * r
    disc = bq * bq - cq
    s = np.sqrt(np.maximum(disc, 0.0))
    t0, t1 = -bq - s, -bq + s
    t = np.where(t0 > _EPS, t0, np.where(t1 > _EPS, t1, np.inf))
    t = np.where(disc < 0, np.inf, t)
    p = o + t[:, None] * d
    n = (p - c) / r
    return t, n


def _intersect(prims, o, d):
    """Brute force closest hit.  Returns (t, prim index, normal)."""
    n_lanes = len(o)
    best_t = np.full(n_lanes, np.inf)
    best_i = np.full(n_lanes, -1, np.int64)
    best_n = np.zeros((n_lanes, 3))
    for i, pr in enumerate(prims):
        if pr["kind"] == "quad":
            t, nrm = _quad_hit(pr["q"], pr["u"], pr["v"], o, d)
        else:
            t, nrm = _sphere_hit(pr["c"], pr["r"], o, d)
        closer = t < best_t
        best_t = np.where(closer, t, best_t)
        best_i = np.where(closer, i, best_i)
        best_n = np.where(closer[:, None], nrm, best_n)
    return best_t, best_i, best_n


# ---------------------------------------------------------------------------
# MicrofacetDiffuse BSDF value (Material.hpp:200-361 formulas)
# ---------------------------------------------------------------------------

def _bsdf_f(mat, woz, wiz, wi_dot_wh, whz):
    """f for the diffuse material in the flipped local frame (z = normal
    on the incident side).  All inputs are [N]-shaped cosines."""
    base = np.asarray(mat["base"], np.float64)
    rough = float(mat.get("rough", 1.0))
    metal = float(mat.get("metal", 0.0))
    alpha = rough * rough
    f0 = (1.0 - metal) * 0.04 + metal * base            # [3]
    m = np.clip(1.0 - wi_dot_wh, 0.0, 1.0)[:, None]
    fr = f0 + (1.0 - f0) * m ** 5                       # [N,3]
    a2 = alpha * alpha
    t = whz * whz * (a2 - 1.0) + 1.0
    d_ggx = a2 / np.maximum(np.pi * t * t, 1e-18)

    def lam(wz):
        cos2 = wz * wz
        tan2 = np.maximum(0.0, 1.0 - cos2) / np.maximum(cos2, 1e-18)
        return np.where(cos2 == 0, 0.0,
                        0.5 * (np.sqrt(1.0 + a2 * tan2) - 1.0))

    g = 1.0 / (1.0 + lam(woz) + lam(wiz))
    denom = np.abs(4.0 * woz * wiz)
    spec = (d_ggx * g)[:, None] * fr / np.maximum(denom, 1e-18)[:, None]
    spec = np.where((denom == 0.0)[:, None], 0.0, spec)
    kd = (1.0 - fr) * (1.0 - metal)
    return kd * base / np.pi + spec                     # [N,3]


def _onb(n):
    """Branchless Frisvad-style orthonormal basis, vectorized."""
    s = np.where(n[:, 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t = np.stack([1.0 + s * n[:, 0] ** 2 * a, s * b, -s * n[:, 0]], -1)
    bt = np.stack([b, s + n[:, 1] ** 2 * a, -n[:, 1]], -1)
    return t, bt


# ---------------------------------------------------------------------------
# Transport
# ---------------------------------------------------------------------------

def _occluded(prims, o, d, t_far):
    t, _, _ = _intersect(prims, o, d)
    return t < t_far - 1e-3


def _light_mixture_pdf(prims, sky, p, wi):
    """Solid-angle pdf of the one-sample NEE mixture at direction wi
    from points p: sum over strategies of P(strategy) * pdf_sw.

    Strategies: each emissive quad (uniform-area sampling; pdf_sw =
    dist^2 / (cos_l * area), 0 behind a one-sided emitter — the
    reference's area-light PDF, Shape.cpp quad SamplePDF semantics) and
    the uniform sky (uniform sphere, 1/4pi).  All equally likely."""
    lights = [pr for pr in prims if pr.get("emit") is not None]
    n_strat = len(lights) + (1 if sky is not None else 0)
    if n_strat == 0:
        return np.zeros(len(p))
    pdf = np.zeros(len(p))
    for pr in lights:
        # does the ray (p, wi) hit this quad, and at what geometry?
        t, nrm = _quad_hit(pr["q"], pr["u"], pr["v"], p, wi)
        hit = np.isfinite(t)
        cos_l = np.abs(np.einsum("ij,ij->i", wi, nrm))
        area = np.linalg.norm(np.cross(pr["u"], pr["v"]))
        pdf_i = np.where(hit & (cos_l > 1e-9),
                         t * t / np.maximum(cos_l * area, 1e-18), 0.0)
        if pr.get("one_sided", False):
            # emits only where d . n < 0 (front side); sampling the back
            # yields Le = 0 but the PDF strategy still only counts
            # visible-side solid angle in the renderer: match by zeroing
            front = np.einsum("ij,ij->i", wi, nrm) <= 0
            pdf_i = np.where(front, pdf_i, 0.0)
        pdf += pdf_i
    if sky is not None:
        pdf += 1.0 / (4.0 * np.pi)
    return pdf / n_strat


def trace_mis(prims, sky, o, d, max_depth, rng):
    """Li estimates under PathIntegrator semantics: per-vertex NEE with
    one uniformly chosen light strategy + BSDF continuation, both
    combined with the power heuristic (formulas written from the
    reference's SampleLd / MIS rules, Integrators.cpp:182-294; shares
    no code with pathtracing_tpu).

    The light-sample estimator divides by the CHOSEN strategy's
    P * pdf but weights with the mixture pdf (one-sample MIS); the
    BSDF-side hit on an emitter weights prev_pdf^2 / (prev_pdf^2 +
    mixture_pdf^2).  Any unbiased weighting integrates to the same
    mean — which is exactly what makes this an independent check of
    the renderer's MIS bookkeeping."""
    o = np.array(o, np.float64)
    d = np.array(d, np.float64)
    n_lanes = len(o)
    tput = np.ones((n_lanes, 3))
    rad = np.zeros((n_lanes, 3))
    alive = np.ones(n_lanes, bool)
    prev_pdf = np.zeros(n_lanes)          # bsdf pdf of the ray's sample
    first = np.ones(n_lanes, bool)
    lights = [pr for pr in prims if pr.get("emit") is not None]
    n_strat = len(lights) + (1 if sky is not None else 0)
    for _ in range(max_depth):
        t, idx, nrm = _intersect(prims, o, d)
        hit = np.isfinite(t)
        # --- miss: sky, MIS-weighted against NEE's chance of sampling it
        sky_pdf = _light_mixture_pdf(prims, sky, o, d)
        w_sky = np.where(first, 1.0,
                         prev_pdf ** 2
                         / np.maximum(prev_pdf ** 2 + sky_pdf ** 2,
                                      1e-24))
        miss = alive & ~hit
        if sky is not None:
            rad += np.where(miss[:, None],
                            tput * np.asarray(sky) * w_sky[:, None], 0.0)
        alive = alive & hit
        # --- emission at the hit, MIS-weighted (Integrators.cpp:220-244)
        for i, pr in enumerate(prims):
            em = pr.get("emit")
            if em is None:
                continue
            on = alive & (idx == i)
            front = np.einsum("ij,ij->i", d, nrm) <= 0
            vis = front if pr.get("one_sided", False) \
                else np.ones_like(front)
            w_em = np.where(first, 1.0,
                            prev_pdf ** 2
                            / np.maximum(prev_pdf ** 2 + sky_pdf ** 2,
                                         1e-24))
            rad += np.where((on & vis)[:, None],
                            tput * np.asarray(em) * w_em[:, None], 0.0)
        cosi = np.einsum("ij,ij->i", d, nrm)
        nf = np.where((cosi > 0)[:, None], -nrm, nrm)
        p_hit = o + np.where(hit, t, 0.0)[:, None] * d
        p_off = p_hit + nf * _EPS
        mats = np.full(n_lanes, -1, np.int64)
        for i, pr in enumerate(prims):
            if pr.get("mat") is not None:
                mats = np.where(idx == i, i, mats)
        scat = alive & (mats >= 0)
        through = alive & (mats < 0)

        # --- NEE: one uniformly chosen strategy per lane
        if n_strat:
            pick = rng.integers(0, n_strat, n_lanes)
            wi_l = np.zeros((n_lanes, 3))
            dist = np.full(n_lanes, np.inf)
            Le = np.zeros((n_lanes, 3))
            for j, pr in enumerate(lights):
                sel = pick == j
                u1 = rng.random(n_lanes)
                u2 = rng.random(n_lanes)
                lp = (pr["q"][None, :] + u1[:, None] * pr["u"][None, :]
                      + u2[:, None] * pr["v"][None, :])
                delta = lp - p_off
                dd = np.linalg.norm(delta, axis=-1)
                wdir = delta / np.maximum(dd[:, None], 1e-18)
                wi_l = np.where(sel[:, None], wdir, wi_l)
                dist = np.where(sel, dd, dist)
                nq = np.cross(pr["u"], pr["v"])
                nq = nq / np.linalg.norm(nq)
                if pr.get("one_sided", False):
                    facing = np.einsum("ij,j->i", wdir, nq) <= 0
                    le_j = (np.asarray(pr["emit"], np.float64)[None, :]
                            * facing[:, None])
                else:
                    le_j = np.broadcast_to(
                        np.asarray(pr["emit"], np.float64), (n_lanes, 3))
                Le = np.where(sel[:, None], le_j, Le)
            if sky is not None:
                sel = pick == n_strat - 1
                z = 1.0 - 2.0 * rng.random(n_lanes)
                phi = 2.0 * np.pi * rng.random(n_lanes)
                r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
                wdir = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1)
                wi_l = np.where(sel[:, None], wdir, wi_l)
                dist = np.where(sel, 1e9, dist)
                Le = np.where(sel[:, None], np.asarray(sky, np.float64),
                              Le)
            pdf_mix = _light_mixture_pdf(prims, sky, p_off, wi_l)
            # chosen strategy's own pdf (for the estimator divisor)
            pdf_own = np.zeros(n_lanes)
            for j, pr in enumerate(lights):
                sel = pick == j
                tq, nq = _quad_hit(pr["q"], pr["u"], pr["v"], p_off, wi_l)
                cos_l = np.abs(np.einsum("ij,ij->i", wi_l, nq))
                area = np.linalg.norm(np.cross(pr["u"], pr["v"]))
                pdf_j = dist * dist / np.maximum(cos_l * area, 1e-18)
                pdf_own = np.where(sel, pdf_j, pdf_own)
            if sky is not None:
                pdf_own = np.where(pick == n_strat - 1,
                                   1.0 / (4.0 * np.pi), pdf_own)
            wiz = np.einsum("ij,ij->i", wi_l, nf)
            occ = _occluded(prims, p_off, wi_l, dist)
            wo = -d
            woz = np.einsum("ij,ij->i", wo, nf)
            wh = wo + wi_l
            wh /= np.maximum(np.linalg.norm(wh, axis=-1, keepdims=True),
                             1e-18)
            whz = np.einsum("ij,ij->i", wh, nf)
            wi_dot_wh = np.einsum("ij,ij->i", wi_l, wh)
            f_total = np.zeros((n_lanes, 3))
            for i, pr in enumerate(prims):
                if pr.get("mat") is None:
                    continue
                f_total = np.where(
                    (mats == i)[:, None],
                    _bsdf_f(pr["mat"], woz, wiz, wi_dot_wh, whz),
                    f_total)
            pdf_b = np.where(wiz > 0, wiz / np.pi, 0.0)  # cosine pdf
            w_l = pdf_mix ** 2 / np.maximum(pdf_mix ** 2 + pdf_b ** 2,
                                            1e-24)
            good = scat & ~occ & (wiz > 0) & (pdf_own > 1e-12) \
                & (Le.sum(-1) > 0)
            # one-sample MIS estimator: divide by the chosen strategy's
            # P * pdf = pdf_own / n_strat, weight with the mixture
            contrib = (tput * f_total * Le
                       * (wiz * w_l * n_strat
                          / np.maximum(pdf_own, 1e-18))[:, None])
            rad += np.where(good[:, None], contrib, 0.0)

        # --- BSDF continuation (cosine), records prev_pdf for MIS
        u1 = rng.random(n_lanes)
        u2 = rng.random(n_lanes)
        z = np.sqrt(np.maximum(0.0, 1.0 - u2))
        s = np.sqrt(u2)
        phi = 2.0 * np.pi * u1
        tb, bb = _onb(nf)
        wi = (np.cos(phi) * s)[:, None] * tb + \
             (np.sin(phi) * s)[:, None] * bb + z[:, None] * nf
        wo = -d
        woz = np.einsum("ij,ij->i", wo, nf)
        wh = wo + wi
        wh /= np.maximum(np.linalg.norm(wh, axis=-1, keepdims=True),
                         1e-18)
        whz = np.einsum("ij,ij->i", wh, nf)
        wi_dot_wh = np.einsum("ij,ij->i", wi, wh)
        f_total = np.zeros((n_lanes, 3))
        for i, pr in enumerate(prims):
            if pr.get("mat") is None:
                continue
            f_total = np.where((mats == i)[:, None],
                               _bsdf_f(pr["mat"], woz, z, wi_dot_wh,
                                       whz),
                               f_total)
        tput = np.where(scat[:, None], tput * f_total * np.pi, tput)
        prev_pdf = np.where(scat, z / np.pi, prev_pdf)
        first = np.where(scat, False, first)   # boundaries keep `first`
        alive = through | (scat & (tput.sum(-1) > 0))
        o = np.where(scat[:, None], p_off, p_hit + d * _EPS)
        d = np.where(scat[:, None], wi, d)
    return rad


def trace(prims, sky, o, d, max_depth, rng):
    """Li estimates for rays (o, d) under SimplePath semantics.

    Each of max_depth segments: closest hit, add emission (one-sided
    cut on the geometric normal), cosine-sample the next direction on
    the incident side, throughput *= f * cos / (cos/pi) = f * pi.
    """
    o = np.array(o, np.float64)
    d = np.array(d, np.float64)
    n_lanes = len(o)
    tput = np.ones((n_lanes, 3))
    rad = np.zeros((n_lanes, 3))
    alive = np.ones(n_lanes, bool)
    for _ in range(max_depth):
        t, idx, nrm = _intersect(prims, o, d)
        hit = np.isfinite(t)
        miss = alive & ~hit
        rad += np.where(miss[:, None], tput * np.asarray(sky), 0.0)
        alive = alive & hit
        # emission at the hit (AreaLight::L one-sided cut)
        for i, pr in enumerate(prims):
            em = pr.get("emit")
            if em is None:
                continue
            on = alive & (idx == i)
            front = np.einsum("ij,ij->i", d, nrm) <= 0
            vis = front if pr.get("one_sided", False) else np.ones_like(front)
            rad += np.where((on & vis)[:, None], tput * np.asarray(em), 0.0)
        # scatter (diffuse materials only in oracle scenes)
        cosi = np.einsum("ij,ij->i", d, nrm)
        nf = np.where((cosi > 0)[:, None], -nrm, nrm)     # incident side
        u1 = rng.random(n_lanes)
        u2 = rng.random(n_lanes)
        z = np.sqrt(np.maximum(0.0, 1.0 - u2))
        s = np.sqrt(u2)
        phi = 2.0 * np.pi * u1
        tb, bb = _onb(nf)
        wi = (np.cos(phi) * s)[:, None] * tb + \
             (np.sin(phi) * s)[:, None] * bb + z[:, None] * nf
        wo = -d
        woz = np.einsum("ij,ij->i", wo, nf)
        wh = wo + wi
        wh /= np.maximum(np.linalg.norm(wh, axis=-1, keepdims=True), 1e-18)
        whz = np.einsum("ij,ij->i", wh, nf)
        wi_dot_wh = np.einsum("ij,ij->i", wi, wh)
        mats = np.full(n_lanes, -1, np.int64)
        for i, pr in enumerate(prims):
            if pr.get("mat") is not None:
                mats = np.where(idx == i, i, mats)
        f_total = np.zeros((n_lanes, 3))
        for i, pr in enumerate(prims):
            if pr.get("mat") is None:
                continue
            f_total = np.where((mats == i)[:, None],
                               _bsdf_f(pr["mat"], woz, z, wi_dot_wh, whz),
                               f_total)
        # material-less prims (e.g. bare emissive quads) are boundaries:
        # the ray continues through unchanged (path.py `boundary` lanes)
        through = alive & (mats < 0)
        scat = alive & (mats >= 0)
        # cosine pdf = z/pi  =>  tput *= f * z / pdf = f * pi
        tput = np.where(scat[:, None], tput * f_total * np.pi, tput)
        alive = through | (scat & (tput.sum(-1) > 0))
        p = o + np.where(np.isfinite(t), t, 0.0)[:, None] * d
        o = np.where(scat[:, None], p + nf * _EPS, p + d * _EPS)
        d = np.where(scat[:, None], wi, d)
    return rad
