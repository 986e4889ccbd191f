"""Device-side light sampling & evaluation.

Replaces the reference's Light virtual hierarchy (Light.hpp/Light.cpp) and
LightSampler (LightSampler.cpp) with a typed SoA light table + branch-free
per-type math selected by masks, and a CDF-based power sampler.

Conventions follow the reference:
  - delta lights (distant/point) are never MIS-weighted (isDelta)
  - infinite lights sample directions; area lights sample surface points
  - AreaLight solid-angle PDF = dist^2 / (cos * area) (Shape.cpp:64-71,308-315)
  - env light importance table over the (z, azimuth) grid
    (TextureInfiniteLight, Light.cpp:118-148)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import (vdot, vdot_k, safe_normalize, sphere_uv,
                         uv_to_direction, BIG_F32)
from .types import (LIGHT_UNIFORM_INF, LIGHT_ENV_TEX, LIGHT_DISTANT,
                    LIGHT_POINT, LIGHT_AREA, SHAPE_TRI, SHAPE_SPH,
                    SHAPE_QUAD, SHAPE_ITRI)
from .textures import texture_eval

INV_4PI = 1.0 / (4.0 * jnp.pi)


def sample_light_index(scene, meta, u):
    """LightSampler::Sample (LightSampler.cpp:34-46): CDF inversion.
    Returns (idx, pmf, valid)."""
    if meta.n_lights == 0:
        z = jnp.zeros_like(u)
        return z.astype(jnp.int32), z, jnp.zeros_like(u, dtype=bool)
    cdf = scene["light_cdf"][:meta.n_lights]
    idx = jnp.searchsorted(cdf, u, side="left").astype(jnp.int32)
    idx = jnp.minimum(idx, meta.n_lights - 1)
    pmf = light_pmf(scene, meta, idx)
    return idx, pmf, pmf > 0


def light_pmf(scene, meta, idx):
    """LightSampler::PMF (LightSampler.cpp:47-50)."""
    if meta.n_lights == 0:
        return jnp.zeros(idx.shape, jnp.float32)
    if meta.light_sampler == "uniform":
        return jnp.full(idx.shape, 1.0 / meta.n_lights, jnp.float32)
    total = scene["light_total_power"][0]
    return jnp.where(total > 0, scene["light_power"][idx] / total, 1.0)


# ---------------------------------------------------------------------------
# Shape sampling for area lights
# ---------------------------------------------------------------------------

def _sample_shape(scene, meta, kind, sidx, uv2, time=None):
    """Uniform point sample on tri/sphere/quad/instanced-tri.

    Triangle uses the standard sqrt warp (uniform over the triangle) — a
    deliberate fix of the reference's non-uniform parallelogram map
    (Shape.cpp:277-297); PDF=1/area matches the uniform map.
    Sphere: Shape.cpp:73-81. Quad: Shape.hpp:139-141.
    Instanced triangle (SHAPE_ITRI): object-space triangle pushed through
    the instance transform (TransformedLight::sample, Light.cpp:305-316).
    Moving shapes are sampled at the ray time (AnimatedLight semantics,
    Light.cpp:336-351).
    Returns (p, n, uv_for_emission).
    """
    motion = meta is not None and getattr(meta, "has_motion", False) \
        and time is not None
    # triangle
    ti = jnp.clip(sidx, 0, scene["tri_v"].shape[0] - 1)
    tv = scene["tri_v"][ti]
    if motion:
        tv = tv + (scene["tri_vel"][ti] * time[:, None])[:, None, :]
    tuv = scene["tri_uv"][ti]
    su = jnp.sqrt(jnp.maximum(uv2[..., 0], 0.0))
    b1 = 1.0 - su
    b2 = uv2[..., 1] * su
    b0 = 1.0 - b1 - b2
    p_t = (b0[:, None] * tv[:, 0] + b1[:, None] * tv[:, 1]
           + b2[:, None] * tv[:, 2])
    from ..core.math import pack3, scross, ssafe_normalize
    n_t = pack3(*ssafe_normalize(*scross(
        tv[:, 1, 0] - tv[:, 0, 0], tv[:, 1, 1] - tv[:, 0, 1],
        tv[:, 1, 2] - tv[:, 0, 2],
        tv[:, 2, 0] - tv[:, 0, 0], tv[:, 2, 1] - tv[:, 0, 1],
        tv[:, 2, 2] - tv[:, 0, 2])))
    uv_t = (b0[:, None] * tuv[:, 0] + b1[:, None] * tuv[:, 1]
            + b2[:, None] * tuv[:, 2])

    # sphere
    si = jnp.clip(sidx, 0, scene["sph_c"].shape[0] - 1)
    c = scene["sph_c"][si]
    if motion:
        c = c + scene["sph_vel"][si] * time[:, None]
    r = scene["sph_r"][si]
    z = 1.0 - 2.0 * uv2[..., 0]
    rr = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * uv2[..., 1]
    dir_s = jnp.stack([rr * jnp.cos(phi), rr * jnp.sin(phi), z], -1)
    p_s = c + r[:, None] * dir_s
    uv_s = sphere_uv(dir_s)

    # quad
    qi = jnp.clip(sidx, 0, scene["quad_q"].shape[0] - 1)
    qq = scene["quad_q"][qi]
    if motion:
        qq = qq + scene["quad_vel"][qi] * time[:, None]
    p_q = (qq + uv2[..., 0:1] * scene["quad_u"][qi]
           + uv2[..., 1:2] * scene["quad_v"][qi])
    n_q = scene["quad_n"][qi]

    is_t = (kind == SHAPE_TRI)[:, None]
    is_s = (kind == SHAPE_SPH)[:, None]
    p = jnp.where(is_t, p_t, jnp.where(is_s, p_s, p_q))
    n = jnp.where(is_t, n_t, jnp.where(is_s, dir_s, n_q))
    uv = jnp.where(is_t, uv_t, jnp.where(is_s, uv_s, uv2))

    if meta is not None and getattr(meta, "n_inst", 0):
        # instanced triangle: sidx encodes inst * n_obj_tri + otri
        ii = jnp.clip(sidx // meta.n_obj_tri, 0,
                      scene["inst_fwd"].shape[0] - 1)
        oi = jnp.clip(sidx % meta.n_obj_tri, 0,
                      scene["otri_v"].shape[0] - 1)
        fwd = scene["inst_fwd"][ii]                       # [N,3,4]
        ov = scene["otri_v"][oi]                          # [N,3,3]
        wv = jnp.einsum("nij,nkj->nki", fwd[:, :, :3], ov,
                        precision="highest") + fwd[:, None, :, 3]
        if motion and "inst_vel" in scene:
            # moving emissive instance: sample at the ray time
            # (AnimatedLight over a TransformedLight, Light.cpp:336-364)
            wv = wv + (scene["inst_vel"][ii] * time[:, None])[:, None, :]
        p_i = (b0[:, None] * wv[:, 0] + b1[:, None] * wv[:, 1]
               + b2[:, None] * wv[:, 2])
        n_i = safe_normalize(jnp.cross(wv[:, 1] - wv[:, 0],
                                       wv[:, 2] - wv[:, 0]))
        ouv = scene["otri_uv"][oi]
        uv_i = (b0[:, None] * ouv[:, 0] + b1[:, None] * ouv[:, 1]
                + b2[:, None] * ouv[:, 2])
        is_i = (kind == SHAPE_ITRI)[:, None]
        p = jnp.where(is_i, p_i, p)
        n = jnp.where(is_i, n_i, n)
        uv = jnp.where(is_i, uv_i, uv)
    return p, n, uv


def _shape_solid_angle_pdf(scene, kind, sidx, area, ref_p, sample_p,
                           sample_n):
    """dist^2/(|cos|*area) (Shape.cpp:64-71,308-315, Shape.hpp:151-158)."""
    from ..core.math import unpack3, sdot, ssafe_normalize
    tx, ty, tz = (sample_p[..., 0] - ref_p[..., 0],
                  sample_p[..., 1] - ref_p[..., 1],
                  sample_p[..., 2] - ref_p[..., 2])
    d2 = tx * tx + ty * ty + tz * tz
    wx, wy, wz = ssafe_normalize(tx, ty, tz)
    nx, ny, nz = unpack3(sample_n)
    cos = jnp.abs(sdot(wx, wy, wz, nx, ny, nz))
    denom = cos * area
    return jnp.where(denom > 0, d2 / jnp.maximum(denom, 1e-18), 0.0)


# ---------------------------------------------------------------------------
# Env importance table
# ---------------------------------------------------------------------------

def _env_cell_of(meta, d):
    u = jnp.clip((d[..., 2] + 1.0) * 0.5, 0.0, 1.0 - 1e-7)
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    v = jnp.mod(phi / (2.0 * jnp.pi), 1.0)
    ix = jnp.minimum((u * meta.env_nx).astype(jnp.int32), meta.env_nx - 1)
    iy = jnp.minimum((v * meta.env_ny).astype(jnp.int32), meta.env_ny - 1)
    return ix * meta.env_ny + iy


def env_pdf(scene, meta, lid, d):
    """Solid-angle pdf of light `lid`'s env importance sampler at
    direction d.  Each env light has its OWN table (the reference builds
    one per TextureInfiniteLight, Light.cpp:144-148); lid -> table row
    via light_env_slot."""
    if meta.env_nx == 0:
        return jnp.full(d.shape[:-1], INV_4PI, jnp.float32)
    cell = _env_cell_of(meta, d)
    slot = jnp.clip(scene["light_env_slot"][
        jnp.clip(lid, 0, scene["light_env_slot"].shape[0] - 1)], 0,
        max(meta.n_env - 1, 0))
    ncell = meta.env_nx * meta.env_ny
    cell_omega = 4.0 * jnp.pi / ncell
    return scene["env_weights"][slot, cell] / jnp.maximum(
        scene["env_total"][slot], 1e-18) / cell_omega


def env_sample_dir(scene, meta, lid, u_cell, uv2):
    """Importance-sample a direction from light `lid`'s env table
    (TextureInfiniteLight::sample, Light.cpp:118-142).  The CDF binary
    search runs once per env table (meta.n_env is static and small) and
    lanes select their light's result."""
    if meta.env_nx == 0:
        return uv_to_direction(uv2)
    slot = scene["light_env_slot"][
        jnp.clip(lid, 0, scene["light_env_slot"].shape[0] - 1)]
    ncell = meta.env_nx * meta.env_ny
    idx = jnp.zeros(u_cell.shape, jnp.int32)
    for e in range(meta.n_env):
        idx_e = jnp.searchsorted(scene["env_cdf"][e], u_cell,
                                 side="left").astype(jnp.int32)
        idx = jnp.where(slot == e, idx_e, idx)
    idx = jnp.minimum(idx, ncell - 1)
    ix = (idx // meta.env_ny).astype(jnp.float32)
    iy = (idx % meta.env_ny).astype(jnp.float32)
    cell_uv = jnp.stack([(ix + uv2[..., 0]) / meta.env_nx,
                         (iy + uv2[..., 1]) / meta.env_ny], -1)
    return uv_to_direction(cell_uv)


# ---------------------------------------------------------------------------
# Per-light radiance / sampling / pdf
# ---------------------------------------------------------------------------

def infinite_le(scene, meta, idx, ray_dir):
    """InfiniteLight::Le for light `idx` in direction ray_dir."""
    ltype = scene["light_type"][idx]
    color = scene["light_color"][idx]
    if not getattr(meta, "has_emissive_tex", True):
        # no textured lights in scene: an env light would have one, so
        # every infinite light here is a flat color — skip the per-lane
        # bilinear fetch the where() below would discard
        return color
    emtex = scene["light_emtex"][idx]
    uv = sphere_uv(ray_dir)
    tex = texture_eval(scene, jnp.maximum(emtex, 0), uv)
    env = color[..., 0:1] * tex   # color holds the LeScale for env lights
    return jnp.where((ltype == LIGHT_ENV_TEX)[..., None], env, color)


def area_light_L(scene, meta, light_id, geom_n, uv, ray_dir):
    """AreaLight::L (Light.cpp:257-260): emission toward -ray_dir with the
    one-sided cut on the geometric normal."""
    lid = jnp.clip(light_id, 0, scene["light_type"].shape[0] - 1)
    color = scene["light_color"][lid]
    if getattr(meta, "has_emissive_tex", True):
        emtex = scene["light_emtex"][lid]
        tex = texture_eval(scene, jnp.maximum(emtex, 0), uv)
        em = jnp.where((emtex >= 0)[..., None], tex, color)
    else:
        em = color           # no textured emitter anywhere in the scene
    one_sided = (scene["light_flags"][lid] & 1) > 0
    front = vdot(ray_dir, geom_n) <= 0
    vis = (~one_sided) | front
    return jnp.where((vis & (light_id >= 0))[..., None], em, 0.0)


def area_light_hit_pdf(scene, meta, light_id, ref_p, hit_p, hit_n, ray_dir):
    """AreaLight::PDF(interaction, ray) (Light.cpp:267-272) * one-sided."""
    lid = jnp.clip(light_id, 0, scene["light_type"].shape[0] - 1)
    area = scene["light_area"][lid]
    pdf = _shape_solid_angle_pdf(scene, None, None, area, ref_p, hit_p,
                                 hit_n)
    one_sided = (scene["light_flags"][lid] & 1) > 0
    front = vdot(-ray_dir, hit_n) > 0
    pdf = jnp.where(one_sided & ~front, 0.0, pdf)
    return jnp.where(light_id >= 0, pdf, 0.0)


def light_sample(scene, meta, idx, ref_p, u_cell, uv2, time):
    """Light::sample for every lane (Light.cpp sample methods).

    Returns dict with:
      is_delta: delta light (distant/point) — no MIS
      to_inf:   direction-type sample (infinite/env/distant)
      dir:      unit direction toward the light
      dist:     shadow-ray length (BIG_F32 for direction samples)
      p, n, uv: sampled point/normal/uv (area lights)
      L_delta:  radiance for delta lights (color)
    """
    lid = jnp.clip(idx, 0, scene["light_type"].shape[0] - 1)
    ltype = scene["light_type"][lid]
    color = scene["light_color"][lid]
    lvec = scene["light_vec"][lid]
    shape = scene["light_shape"][lid]

    sph_dir = uv_to_direction(uv2)

    # uniform / env infinite: direction sample
    env_dir = env_sample_dir(scene, meta, lid, u_cell, uv2)
    inf_dir = jnp.where((ltype == LIGHT_ENV_TEX)[..., None], env_dir,
                        sph_dir)
    # distant: jittered fixed direction (Light.cpp:208-215)
    dist_dir = safe_normalize(lvec + sph_dir * 0.02)

    # area: sample a point on the shape (at the ray time for moving shapes)
    p_a, n_a, uv_a = _sample_shape(scene, meta, shape[..., 0],
                                   shape[..., 1], uv2, time)

    is_delta = (ltype == LIGHT_DISTANT) | (ltype == LIGHT_POINT)
    to_inf = (ltype == LIGHT_UNIFORM_INF) | (ltype == LIGHT_ENV_TEX) | \
        (ltype == LIGHT_DISTANT)

    # target point for point/area lights; moving point lights are sampled
    # at the ray time (AnimatedLight, Light.cpp:336-351)
    p_pt = lvec
    if getattr(meta, "has_light_motion", False) and time is not None:
        p_pt = p_pt + scene["light_vel"][lid] * time[:, None]
    target = jnp.where((ltype == LIGHT_POINT)[..., None], p_pt, p_a)
    tlx = target[..., 0] - ref_p[..., 0]
    tly = target[..., 1] - ref_p[..., 1]
    tlz = target[..., 2] - ref_p[..., 2]
    dist_pt = jnp.sqrt(jnp.maximum(tlx * tlx + tly * tly + tlz * tlz,
                                   1e-18))
    inv_d = 1.0 / dist_pt
    from ..core.math import pack3 as _pack3
    dir_pt = _pack3(tlx * inv_d, tly * inv_d, tlz * inv_d)

    dirn = jnp.where(to_inf[..., None],
                     jnp.where((ltype == LIGHT_DISTANT)[..., None],
                               dist_dir, inf_dir),
                     dir_pt)
    dist = jnp.where(to_inf, BIG_F32, dist_pt)

    return dict(is_delta=is_delta, to_inf=to_inf, dir=dirn, dist=dist,
                p=target, n=jnp.where(to_inf[..., None], 0.0, n_a),
                uv=uv_a, L_delta=color, ltype=ltype)


def light_sample_L(scene, meta, idx, sample, shadow_dir):
    """Light::L at the sampled point/direction (for non-delta lights the
    reference evaluates L(lightSample.interaction, shadow_ray),
    Integrators.cpp:292,477)."""
    lid = jnp.clip(idx, 0, scene["light_type"].shape[0] - 1)
    ltype = scene["light_type"][lid]
    inf = infinite_le(scene, meta, lid, shadow_dir)
    area = area_light_L(scene, meta, lid, sample["n"], sample["uv"],
                        shadow_dir)
    return jnp.where((ltype == LIGHT_AREA)[..., None], area,
                     jnp.where(((ltype == LIGHT_UNIFORM_INF)
                                | (ltype == LIGHT_ENV_TEX))[..., None],
                               inf, sample["L_delta"]))


def light_sample_pdf(scene, meta, idx, sample, ref_p, shadow_dir):
    """Light::PDF(lightSample.interaction, shadow_ray) per type."""
    lid = jnp.clip(idx, 0, scene["light_type"].shape[0] - 1)
    ltype = scene["light_type"][lid]
    area = scene["light_area"][lid]
    pdf_area = _shape_solid_angle_pdf(scene, None, None, area, ref_p,
                                      sample["p"], sample["n"])
    one_sided = (scene["light_flags"][lid] & 1) > 0
    front = vdot(-shadow_dir, sample["n"]) > 0
    pdf_area = jnp.where(one_sided & ~front, 0.0, pdf_area)
    pdf_env = env_pdf(scene, meta, lid, shadow_dir)
    pdf = jnp.where(ltype == LIGHT_AREA, pdf_area,
                    jnp.where(ltype == LIGHT_ENV_TEX, pdf_env,
                              jnp.where(ltype == LIGHT_UNIFORM_INF,
                                        INV_4PI, 0.0)))
    return pdf


def infinite_light_mis_pdf(scene, meta, idx, ray_dir):
    """pmf(light) * light->PDF({}, ray) for escaped rays
    (Integrators.cpp:200-205)."""
    ltype = scene["light_type"][idx]
    pdf = jnp.where(ltype == LIGHT_ENV_TEX,
                    env_pdf(scene, meta, idx, ray_dir),
                    jnp.where(ltype == LIGHT_UNIFORM_INF, INV_4PI, 0.0))
    return pdf
