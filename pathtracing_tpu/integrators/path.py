"""Wavefront path integrators.

Re-designs the reference's recursive per-ray megakernels
(SimplePathIntegrator / PathIntegrator / VolPathIntegrator,
Integrators.cpp:131-479) as a masked SoA bounce loop over ray batches:
every lane carries (origin, dir, throughput, L, prevPDF, spec, medium,
alive) and a `lax.scan` over bounce index advances all lanes in lockstep —
the TPU-idiomatic replacement for thread-per-ray recursion.  Dead lanes are
masked: Russian roulette kills low-throughput lanes, dead lanes trace with
t_max=0 (the Morton sort clusters them so kernel tiles exit immediately),
and the while_loop form stops as soon as every lane is dead.

Random numbers are counter-based on (pixel, sample, dimension) so the
backward pass replays identical sampling decisions (path replay /
detached sampling).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..core.math import (vdot, vdot_k, safe_normalize, BIG_F32,
                         SHADOW_EPS, offset_ray)
from ..core import rng as rngmod
from ..core.rng import SamplerConfig, sample_1d, sample_2d
from ..core.bsdf import (bsdf_sample, bsdf_eval_pdf, material_lanes,
                         FLAG_SPECULAR, FLAG_TRANSMISSIVE)
from ..core.phase import hg_pdf, hg_sample
from ..core.medium import medium_sample, medium_tr
from ..core.filters import FilterConfig, mitchell
from ..scene.intersect import intersect, make_interaction, occluded
from ..scene import lights as L
from ..scene.textures import texture_eval

# per-bounce random dimension layout (camera uses dims 0..4)
_DIM_BASE = 5
_DIM_STRIDE = 16
_D_SCATTER_UV = 0
_D_LIGHT_UV = 2
_D_SCATTER_U = 4
_D_LIGHT_SELECT = 5
_D_RR = 6
_D_PHASE = 7
_D_ENV_CELL = 9
_D_MED_CHANNEL = 10
_D_MED_DIST = 11
_D_ALPHA = 12


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    spp: int = 16
    max_depth: int = 8
    integrator: str = "path"        # simple | path | volpath
    sampler: SamplerConfig = SamplerConfig(kind="stratified",
                                           x_samples=4, y_samples=4)
    filter: FilterConfig = mitchell()
    rr_start: int = 3               # RR after this many scatters
    rays_per_batch: int = 1 << 16   # ray-batch tile size
    differentiable: bool = False    # scan (diff) vs while_loop (fast fwd)
    remat: bool = True              # jax.checkpoint each bounce in the
                                    # differentiable scan: backward memory
                                    # drops from every per-bounce
                                    # intermediate to just the carried ray
                                    # state (recomputes the bounce in bwd)
    compact_after: int | None = None
                                    # tail compaction: after this many
                                    # bounces, gather surviving lanes
                                    # into a quarter-width batch so deep
                                    # bounces stop paying full-width
                                    # shade/NEE cost (the wavefront-
                                    # compaction analog of the
                                    # reference's per-pixel loop,
                                    # Integrators.cpp:55-90).  None = off.
                                    # Per-lane RNG is (pixel, sample,
                                    # bounce)-keyed so results match the
                                    # uncompacted render to float
                                    # precision (tile regrouping can
                                    # flip traversal tie-breaks: ~1 ULP
                                    # on isolated pixels).
    regenerate: bool = False        # persistent wavefront: lanes whose
                                    # path ends are refilled with fresh
                                    # camera samples the same iteration
                                    # (trace_regen), so a multi-wave
                                    # sample queue drains with every lane
                                    # busy.  Subsumes compact_after
                                    # (ignored when set); forward-only
                                    # (the differentiable path keeps the
                                    # fixed-depth scan).


# ---------------------------------------------------------------------------
# material parameter resolution (textures -> per-lane values)
# ---------------------------------------------------------------------------

def resolve_material(scene, meta, it):
    """Gather material params for each lane and apply textures.

    Roughness reads the G channel, metallic the B channel (glTF convention,
    Material.hpp:273-279); base color modulated by the base texture.
    """
    mid = jnp.clip(it["mat_id"], 0, scene["mat_type"].shape[0] - 1)
    mtype = jnp.where(it["mat_id"] >= 0, scene["mat_type"][mid], -1)
    base = scene["mat_base"][mid]
    rough = scene["mat_rough"][mid]
    metal = scene["mat_metal"][mid]
    ior = scene["mat_ior"][mid]
    tex_ids = scene["mat_tex"][mid]
    # static per-slot gates: a scene with no roughness/metallic texture
    # anywhere skips those bilinear fetches outright (they were computed
    # for every hit of every bounce and where()'d away)
    present = getattr(meta, "mat_tex_present", (True,) * 5)
    if meta.n_mat and present[0]:
        bt = tex_ids[:, 0]
        base = jnp.where((bt >= 0)[:, None],
                         base * texture_eval(scene, bt, it["uv"]), base)
    if meta.n_mat and present[1]:
        rt = tex_ids[:, 1]
        rough = jnp.where(rt >= 0,
                          rough * texture_eval(scene, rt, it["uv"])[:, 1],
                          rough)
    if meta.n_mat and present[2]:
        mt = tex_ids[:, 2]
        metal = jnp.where(mt >= 0,
                          metal * texture_eval(scene, mt, it["uv"])[:, 2],
                          metal)
    return material_lanes(mtype, base, rough, metal, ior)


# ---------------------------------------------------------------------------
# transmittance marching (Scene::IntersectTr, Scene.cpp:8-29)
# ---------------------------------------------------------------------------

def transmittance(scene, meta, origin, direction, dist, medium, active,
                  time=None):
    """March through material-less medium boundaries accumulating Tr.
    Returns (Tr [N,3], blocked [N])."""
    n = origin.shape[0]
    # data-dependent trip count (exits when no lane is marching); the
    # reference marches unbounded (Scene.cpp:8-29) — 64 is a degenerate-
    # geometry safety net, not a budget (round 1's cap of 8 returned
    # wrong visibility through >8 medium boundaries)
    max_marches = 64

    def med_tr(med, t):
        mi = jnp.clip(med, 0, scene["med_sigma_t"].shape[0] - 1)
        sig = scene["med_sigma_t"][mi]
        tr = medium_tr(sig, t)
        return jnp.where((med >= 0)[:, None], tr, 1.0)

    def cond(st):
        o, rem, med, tr, blocked, live, i = st
        return jnp.any(live) & (i < max_marches)

    def body(st):
        o, rem, med, tr, blocked, live, i = st
        # finished lanes march ZERO-length segments: the traversal skips
        # them (t_max=0 lanes sort last + whole-tile early exit); all
        # downstream updates are already `live`-masked
        h = intersect(scene, meta, o, direction,
                      jnp.where(live, rem, 0.0), time=time)
        it = make_interaction(scene, meta, o, direction, h, time=time,
                              lite=True)
        seg = jnp.where(h["valid"], h["t"], rem)
        tr = jnp.where(live[:, None], tr * med_tr(med, seg), tr)
        hit_mat = h["valid"] & (it["mat_id"] >= 0)
        blocked = blocked | (live & hit_mat)
        go_on = live & h["valid"] & ~hit_mat
        # medium switch at the boundary (Interaction.hpp:26-29)
        new_med = jnp.where(vdot(direction, it["n"]) < 0.0, it["med_id"], -1)
        med = jnp.where(go_on, new_med, med)
        # advance PAST the boundary with a scale-robust offset (an
        # absolute epsilon is sub-ULP at large scene scales and re-hits
        # the same boundary forever)
        n_fwd = jnp.where(vdot_k(direction, it["n"]) > 0, it["n"],
                          -it["n"])
        o = jnp.where(go_on[:, None], offset_ray(it["p_raw"], n_fwd), o)
        rem = jnp.where(go_on, rem - h["t"], rem)
        live = go_on & (rem > 0)
        return o, rem, med, tr, blocked, live, i + 1

    init = (origin, dist, medium, jnp.ones((n, 3), jnp.float32),
            jnp.zeros((n,), bool), active, jnp.asarray(0))
    _, _, _, tr, blocked, _, _ = jax.lax.while_loop(cond, body, init)
    return tr, blocked


# ---------------------------------------------------------------------------
# Next-event estimation (PathIntegrator::SampleLd, Integrators.cpp:260-294;
# VolPathIntegrator::SampleLd, Integrators.cpp:426-479)
# ---------------------------------------------------------------------------

def sample_ld(scene, meta, cfg, ray_dir, it, mat, is_medium_vertex,
              medium, g_lanes, u_select, uv_light, u_cell, alpha_salt,
              active, volumetric, time=None, occ_replay=None,
              want_occ: bool = False):
    """One-light NEE (SampleLd, Integrators.cpp:260-294).

    occ_replay: precomputed shadow-visibility bits — the custom-VJP
    persistent wavefront (regen_diff.py) replays its recorded forward
    without re-running the traversal kernels.  want_occ additionally
    returns the occlusion bits so the recording pass can save them."""
    if meta.n_lights == 0:
        z = jnp.zeros(ray_dir.shape, jnp.float32)
        if want_occ:
            return z, jnp.zeros(ray_dir.shape[:1], bool)
        return z

    lidx, pmf, lvalid = L.sample_light_index(scene, meta, u_select)
    ref_p = jnp.where(is_medium_vertex[:, None], it["p_raw"], it["p"])
    ls = L.light_sample(scene, meta, lidx, ref_p, u_cell, uv_light, time)

    sdir = ls["dir"]
    # shadow length: the reference shortens by an absolute shadowEpsilon
    # (Integrators.cpp:272,443-444) which is below f32 ULP at scene scale;
    # we use a relative shortening so no light self-occludes at any scale.
    t_shadow = jnp.where(ls["to_inf"], BIG_F32,
                         ls["dist"] * (1.0 - 1e-3) - SHADOW_EPS)

    # surface: backface rejection (Integrators.cpp:279,460)
    nsx, nsy, nsz = it["ns"][:, 0], it["ns"][:, 1], it["ns"][:, 2]
    cos_s = nsx * sdir[:, 0] + nsy * sdir[:, 1] + nsz * sdir[:, 2]
    cos_o = (nsx * ray_dir[:, 0] + nsy * ray_dir[:, 1]
             + nsz * ray_dir[:, 2])
    surf_reject = cos_s * cos_o >= 0.0

    # f and sampling pdf
    f_surf, pdf_surf = bsdf_eval_pdf(
        mat, ray_dir, it, sdir,
        present=getattr(meta, "mats_present", (1, 1, 1, 1)))
    f_surf = f_surf * jnp.abs(cos_s)[:, None]
    ph = hg_pdf(ray_dir, sdir, g_lanes)
    f = jnp.where(is_medium_vertex[:, None], ph[:, None], f_surf)
    sampling_pdf = jnp.where(is_medium_vertex, ph, pdf_surf)

    dead = (~lvalid) | (pmf <= 0) | (~is_medium_vertex & surf_reject) \
        | jnp.all(f == 0.0, axis=-1)
    active = active & ~dead

    # inactive lanes trace a ZERO-length shadow ray: like the closest-hit
    # path's t_max=0 for dead lanes, the traversal kernels skip them
    # (sorted last + whole-tile early exit).  Without this every NEE call
    # traced a full-length shadow ray per DEAD lane too — at depth 32
    # with ~6-bounce average paths, most shadow-traversal work was for
    # lanes whose contribution is masked out anyway.  Output is unchanged:
    # the contribution below is gated on `active & vis`.
    t_shadow = jnp.where(active, t_shadow, 0.0)

    occ = jnp.zeros(ray_dir.shape[:1], bool)
    if volumetric:
        tr, blocked = transmittance(scene, meta, ref_p, sdir, t_shadow,
                                    medium, active, time=time)
        vis = ~blocked
    else:
        if occ_replay is not None:
            occ = occ_replay
        else:
            occ = occluded(scene, meta, ref_p, sdir, t_shadow,
                           rand_key=alpha_salt, time=time)
            # saved by the remat policy like the closest hit: shadow
            # traversals don't re-run in the backward pass
            occ = checkpoint_name(occ, "traversal")
        vis = ~occ
        tr = jnp.ones_like(f)

    l_val = L.light_sample_L(scene, meta, lidx, ls, sdir)
    # delta lights: L*f/pmf; others: MIS (Integrators.cpp:283-293)
    shape_pdf = L.light_sample_pdf(scene, meta, lidx, ls, ref_p, sdir)
    light_pdf = pmf * shape_pdf
    w2 = light_pdf * light_pdf
    w1 = sampling_pdf * sampling_pdf
    w_light = w2 / jnp.maximum(w1 + w2, 1e-18)
    contrib_delta = l_val * f / jnp.maximum(pmf, 1e-18)[:, None]
    contrib_mis = l_val * f * (w_light / jnp.maximum(light_pdf,
                                                     1e-18))[:, None]
    contrib = jnp.where(ls["is_delta"][:, None], contrib_delta,
                        jnp.where((light_pdf > 0)[:, None], contrib_mis,
                                  0.0))
    out = jnp.where((active & vis)[:, None], tr * contrib, 0.0)
    if want_occ:
        return out, occ
    return out


# ---------------------------------------------------------------------------
# The bounce loop
# ---------------------------------------------------------------------------

def _make_bounce(scene, meta, cfg, px, py, time, sample_idx, n,
                 record: bool = False, replay=None):
    """Build the one-bounce step for a bound lane set.

    The returned `bounce(state, b)` advances every lane one bounce.
    `b` may be a traced scalar (the scan / while_loop forms in `trace`)
    or a per-lane [n] i32 array (`trace_regen`, where each lane sits at
    its own depth) — the RNG dimension arithmetic broadcasts either way.
    `trace` rebinds (px, py, time) to gathered subsets for tail
    compaction; `trace_regen` rebinds every lane on sample refill.

    record / replay (regen_diff.py, the custom-VJP persistent
    wavefront): record=True returns (state, aux) with aux = the
    traversal outputs {hit_t, hit_kind, hit_idx, hit_valid, occ};
    replay=aux re-runs ONLY the shade math with those outputs injected
    (no traversal kernels in the program) — everything else (RNG,
    sampling, shading) is deterministic and recomputes identically.
    """
    simple = cfg.integrator == "simple"
    volumetric = cfg.integrator == "volpath"
    if record or replay is not None:
        assert not volumetric, "regen_diff does not support media yet"
    s = cfg.sampler

    def dim(b, off):
        return _DIM_BASE + b * _DIM_STRIDE + off

    def bounce(state, b):
        alive = state["alive"]
        o, d = state["o"], state["d"]
        tput = state["tput"]
        radiance = state["radiance"]
        n_rays = state["n_rays"] + jnp.sum(alive.astype(jnp.float32))

        # dead lanes get t_max=0: they miss immediately, and after the
        # Morton sort clusters them the pallas kernel's whole-tile early
        # exit skips their traversal work entirely
        if replay is not None:
            hit = dict(t=replay["hit_t"], kind=replay["hit_kind"],
                       idx=replay["hit_idx"], valid=replay["hit_valid"])
        else:
            hit = intersect(scene, meta, o, d,
                            jnp.where(alive, BIG_F32, 0.0), time=time)
            # hit records are tiny and fully detached (make_interaction
            # stop-gradients geometry): naming them lets the per-bounce
            # remat policy SAVE them, so the backward pass never re-runs
            # the traversal kernels — only shade math is recomputed
            hit = {k: checkpoint_name(v, "traversal")
                   for k, v in hit.items()}
        it = make_interaction(scene, meta, o, d, hit, time=time)
        missed = alive & ~hit["valid"]

        # ---- escaped rays: infinite lights (Integrators.cpp:196-208)
        for i in range(meta.n_inf):
            lid = scene["inf_idx"][i]
            le = L.infinite_le(scene, meta, jnp.full((n,), lid, jnp.int32),
                               d)
            lpmf = L.light_pmf(scene, meta, jnp.full((n,), lid, jnp.int32))
            lpdf = lpmf * L.infinite_light_mis_pdf(
                scene, meta, jnp.full((n,), lid, jnp.int32), d)
            pp = state["prev_pdf"]
            w = jnp.where(state["spec"], 1.0,
                          jnp.where(pp > 0,
                                    pp * pp / jnp.maximum(
                                        pp * pp + lpdf * lpdf, 1e-18), 0.0))
            if simple:
                w = jnp.ones_like(w)
            radiance = radiance + jnp.where(missed[:, None],
                                            tput * le * w[:, None], 0.0)
        alive = alive & hit["valid"]

        # ---- participating medium segment (VolPath, Integrators.cpp:340-344)
        med_scatter = jnp.zeros((n,), bool)
        if volumetric and meta.n_media:
            med = state["medium"]
            if meta.scene_medium >= 0:
                med = jnp.where(med < 0, meta.scene_medium, med)
            in_medium = alive & (med >= 0)
            mi = jnp.clip(med, 0, scene["med_sigma_t"].shape[0] - 1)
            sig_t = scene["med_sigma_t"][mi]
            sig_s = scene["med_sigma_s"][mi]
            u_ch = sample_1d(s, px, py, sample_idx, dim(b, _D_MED_CHANNEL))
            u_dist = sample_1d(s, px, py, sample_idx, dim(b, _D_MED_DIST))
            scat, t_scat, w_med = medium_sample(sig_t, sig_s, hit["t"],
                                                u_ch, u_dist)
            tput = jnp.where(in_medium[:, None], tput * w_med, tput)
            med_scatter = in_medium & scat
            state = dict(state, medium=med)

        # ---- per-bounce randoms (Integrators.cpp:210-215)
        uv_scatter = sample_2d(s, px, py, sample_idx, dim(b, _D_SCATTER_UV))
        uv_light = sample_2d(s, px, py, sample_idx, dim(b, _D_LIGHT_UV))
        u_scatter = sample_1d(s, px, py, sample_idx, dim(b, _D_SCATTER_U))
        u_select = sample_1d(s, px, py, sample_idx, dim(b, _D_LIGHT_SELECT))
        u_rr = sample_1d(s, px, py, sample_idx, dim(b, _D_RR))
        u_cell = rngmod.hash_float(px, py, sample_idx, dim(b, _D_ENV_CELL),
                                   s.seed)
        alpha_salt = rngmod.hash_u32(sample_idx, b, s.seed)

        mat = resolve_material(scene, meta, it)
        mi = jnp.clip(state["medium"], 0, scene["med_g"].shape[0] - 1)
        g_lanes = scene["med_g"][mi]

        # ---- emitter hit (Integrators.cpp:217-226)
        surf = alive & ~med_scatter
        emit_l = L.area_light_L(scene, meta, it["light_id"], it["n"],
                                it["uv"], d)
        has_emit = surf & (it["light_id"] >= 0) \
            & jnp.any(emit_l != 0.0, axis=-1)
        lpmf_hit = L.light_pmf(scene, meta,
                               jnp.clip(it["light_id"], 0,
                                        max(meta.n_lights - 1, 0)))
        lpdf_hit = lpmf_hit * L.area_light_hit_pdf(
            scene, meta, it["light_id"], o, it["p_raw"], it["n"], d)
        pp = state["prev_pdf"]
        w_emit = jnp.where(state["spec"], 1.0,
                           jnp.where(pp > 0, pp * pp / jnp.maximum(
                               pp * pp + lpdf_hit * lpdf_hit, 1e-18), 0.0))
        if simple:
            w_emit = jnp.ones_like(w_emit)
        radiance = radiance + jnp.where(has_emit[:, None],
                                        tput * emit_l * w_emit[:, None],
                                        0.0)

        # ---- medium scatter vertex (Integrators.cpp:356-362)
        if volumetric and meta.n_media:
            uv_phase = sample_2d(s, px, py, sample_idx, dim(b, _D_PHASE))
            scat_p = o + t_scat[:, None] * d
            it_med = dict(it, p=scat_p, p_raw=scat_p)
            nee_med = sample_ld(scene, meta, cfg, d, it_med, mat,
                                jnp.ones((n,), bool), state["medium"],
                                g_lanes, u_select, uv_light, u_cell,
                                alpha_salt, med_scatter, volumetric,
                                time=time)
            radiance = radiance + jnp.where(med_scatter[:, None],
                                            tput * nee_med, 0.0)
            n_rays = n_rays + jnp.sum(med_scatter.astype(jnp.float32))
            mle = scene["med_le"][mi]
            radiance = radiance + jnp.where(med_scatter[:, None],
                                            tput * mle, 0.0)
            new_dir_med, _ = hg_sample(d, g_lanes, uv_phase)

        # ---- alpha transparency (Material.hpp:330-353): a failed
        # stochastic-blend or mask test means the ray passes through the
        # surface as if it weren't there (handled below like a
        # material-less boundary)
        boundary = surf & (it["mat_id"] < 0)
        can_scatter = surf & (it["mat_id"] >= 0)
        if meta.has_alpha:
            mid_a = jnp.clip(it["mat_id"], 0, scene["mat_type"].shape[0] - 1)
            mode_a = scene["mat_alpha_mode"][mid_a]
            cutoff_a = scene["mat_alpha_cutoff"][mid_a]
            atex = scene["mat_tex"][mid_a, 4]
            btex = scene["mat_tex"][mid_a, 0]
            from ..scene.textures import texture_alpha
            a_val = texture_alpha(scene, jnp.where(atex >= 0, atex, btex),
                                  it["uv"])
            if getattr(meta, "mat_tex_present", (True,) * 5)[4]:
                # dedicated alpha textures read channel 0; scenes
                # without any skip the second fetch statically
                a_val = jnp.where(atex >= 0,
                                  texture_eval(scene, atex,
                                               it["uv"])[:, 0],
                                  a_val)
            u_alpha = sample_1d(s, px, py, sample_idx, dim(b, _D_ALPHA))
            solid = jnp.where(mode_a == 1, u_alpha < a_val,      # BLEND
                              jnp.where(mode_a == 2,
                                        a_val > cutoff_a, True))  # MASK
            see_through = can_scatter & ~solid
            boundary = boundary | see_through
            can_scatter = can_scatter & solid
        wi, f, pdf, flags, bvalid, new_origin = bsdf_sample(
            mat, d, it, u_scatter, uv_scatter,
            present=getattr(meta, "mats_present", (1, 1, 1, 1)))
        absorbed = can_scatter & ~bvalid
        scattered = can_scatter & bvalid
        new_spec = (flags & FLAG_SPECULAR) > 0
        transmissive = (flags & FLAG_TRANSMISSIVE) > 0

        # ---- NEE from surface (Integrators.cpp:243-245)
        occ_rec = jnp.zeros((n,), bool)
        if not simple:
            nee_active = scattered & ~new_spec
            nee = sample_ld(scene, meta, cfg, d, it, mat,
                            jnp.zeros((n,), bool), state["medium"], g_lanes,
                            u_select, uv_light, u_cell, alpha_salt,
                            nee_active, volumetric, time=time,
                            occ_replay=(replay["occ"]
                                        if replay is not None else None),
                            want_occ=record)
            if record:
                nee, occ_rec = nee
            radiance = radiance + jnp.where(nee_active[:, None],
                                            tput * nee, 0.0)
            n_rays = n_rays + jnp.sum(nee_active.astype(jnp.float32))
            _, pdf_mis = bsdf_eval_pdf(
                mat, d, it, wi,
                present=getattr(meta, "mats_present", (1, 1, 1, 1)))
            new_prev_pdf = jnp.where(scattered & ~new_spec, pdf_mis,
                                     state["prev_pdf"])
        else:
            new_prev_pdf = state["prev_pdf"]

        # ---- throughput update (Integrators.cpp:247)
        cos_wi = jnp.abs(it["ns"][:, 0] * wi[:, 0]
                         + it["ns"][:, 1] * wi[:, 1]
                         + it["ns"][:, 2] * wi[:, 2])
        tput_new = tput * f * (cos_wi / jnp.maximum(pdf, 1e-18))[:, None]
        tput = jnp.where(scattered[:, None], tput_new, tput)

        # ---- medium handoff (VolPath, Integrators.cpp:393-399)
        if volumetric:
            going_in = vdot(wi, it["n"]) < 0.0
            med_next = jnp.where(going_in, it["med_id"], -1)
            carry = ~transmissive & (vdot(d, it["ns"]) <= 0.0)
            med_next = jnp.where(carry, state["medium"], med_next)
            med_boundary = jnp.where(vdot(d, it["n"]) < 0.0, it["med_id"],
                                     -1)
            medium = jnp.where(scattered, med_next,
                               jnp.where(boundary, med_boundary,
                                         state["medium"]))
        else:
            medium = state["medium"]

        # ---- next ray state
        o_next = jnp.where(scattered[:, None], new_origin,
                           jnp.where(boundary[:, None], it["p_raw"], o))
        d_next = jnp.where(scattered[:, None], wi, d)
        spec = jnp.where(scattered, new_spec,
                         jnp.where(boundary,
                                   False if volumetric else True,
                                   state["spec"]))
        if volumetric and meta.n_media:
            # medium scatter overrides surface results
            o_next = jnp.where(med_scatter[:, None], scat_p, o_next)
            d_next = jnp.where(med_scatter[:, None], new_dir_med, d_next)
            spec = jnp.where(med_scatter, False, spec)

        # ---- Russian roulette (Integrators.cpp:249-253)
        did_scatter = scattered | med_scatter
        rr_depth = state["rr_depth"] + did_scatter.astype(jnp.int32)
        rr_on = did_scatter & (rr_depth > cfg.rr_start)
        rr_prob = jnp.minimum(0.95, jnp.max(tput, axis=-1))
        rr_kill = rr_on & (u_rr >= rr_prob)
        tput = jnp.where((rr_on & ~rr_kill)[:, None],
                         tput / jnp.maximum(rr_prob, 1e-18)[:, None], tput)

        alive = alive & ~absorbed & ~rr_kill
        alive = alive & (did_scatter | boundary)
        alive = alive & (jnp.sum(tput, axis=-1) > 0.0)

        # every per-lane update above is masked by an `alive`-derived mask,
        # so dead lanes carry their state forward unchanged
        out = dict(o=o_next, d=d_next, tput=tput, radiance=radiance,
                   prev_pdf=new_prev_pdf, spec=spec, alive=alive,
                   medium=medium, rr_depth=rr_depth, n_rays=n_rays)
        if record:
            return out, dict(hit_t=hit["t"], hit_kind=hit["kind"],
                             hit_idx=hit["idx"], hit_valid=hit["valid"],
                             occ=occ_rec)
        return out

    return bounce



def trace(scene, cam, meta, cfg: RenderConfig, origin, direction, time,
          px, py, sample_idx, with_stats: bool = False):
    """Estimate Li for a batch of camera rays. Returns radiance [N,3];
    with_stats=True additionally returns {"n_rays": scalar} counting the
    rays actually traced (closest-hit rays per live bounce + NEE shadow
    rays) — the rays/sec numerator of the BASELINE metric."""
    n = origin.shape[0]

    state = dict(
        o=origin, d=direction,
        tput=jnp.ones((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),
        prev_pdf=jnp.ones((n,), jnp.float32),
        spec=jnp.ones((n,), bool),
        alive=jnp.ones((n,), bool),
        medium=jnp.full((n,), meta.camera_medium, jnp.int32),
        rr_depth=jnp.zeros((n,), jnp.int32),
        n_rays=jnp.zeros((), jnp.float32),
    )

    def bounce_for(px_, py_, time_, n_):
        return _make_bounce(scene, meta, cfg, px_, py_, time_,
                            sample_idx, n_)

    bounce = bounce_for(px, py, time, n)

    def make_tail_pair(state, run_tail, wrap_fn):
        """Shared tail-compaction plumbing for BOTH loop forms.

        Returns (tail_full, tail_compact, cap, live) for a lax.cond:
        compaction gathers the (<= cap) surviving lanes into a quarter-
        width batch — stable order, live first — runs the tail there via
        `run_tail(sub_state, bounce_fn)` (scan for the differentiable
        form, while_loop for the forward form), and scatters radiance
        back.  Exact: RNG is (pixel, sample, bounce)-keyed, gathered
        dead lanes carry state unchanged, untaken lanes are all dead;
        gather/scatter are linear so VJPs route gradients back exactly.

        NOTE both cond branches are traced and COMPILED even when one
        never executes at runtime — on this backend (10-260 s compiles)
        that roughly doubles tail compile cost.  Accepted: the branch is
        data-dependent (survivor count) and must exist in the program.
        """
        cap = max(1024, -(-(n // 4) // 1024) * 1024)
        live = state["alive"]

        def tail_full(_):
            st = run_tail(state, wrap_fn(bounce))
            return st["radiance"], st["n_rays"]

        def tail_compact(_):
            take = jnp.argsort(~live)[:cap]   # stable: live first
            sub = {k: (v[take] if getattr(v, "ndim", 0) else v)
                   for k, v in state.items()}
            sub = run_tail(sub, wrap_fn(bounce_for(px[take], py[take],
                                                   time[take], cap)))
            return (state["radiance"].at[take].set(sub["radiance"]),
                    sub["n_rays"])

        return tail_full, tail_compact, cap, live

    if cfg.differentiable:
        # per-bounce rematerialisation: the backward pass recomputes each
        # bounce from its carried ray state instead of saving every
        # intermediate of the bounce body (traversal candidates, NEE
        # temporaries, BSDF terms) — the memory that made deep
        # differentiable renders spill.  The policy SAVES the named
        # traversal outputs (hit records + shadow visibility: ~20 B/lane/
        # bounce, detached from AD), so rematerialisation re-runs only
        # the shade math, never the traversal kernels — without it the
        # backward pass paid the full traversal cost a second time.
        if cfg.remat:
            policy = jax.checkpoint_policies.save_only_these_names(
                "traversal")

            def wrap(fn):
                return jax.checkpoint(fn, policy=policy)
        else:
            def wrap(fn):
                return fn
        bounce_fn = wrap(bounce)

        def scan_body(st, b):
            return bounce_fn(st, b), None

        compact = (cfg.compact_after is not None
                   and cfg.compact_after < cfg.max_depth and n >= 4096)
        if not compact:
            state, _ = jax.lax.scan(scan_body, state,
                                    jnp.arange(cfg.max_depth))
        else:
            # ---- differentiable tail compaction: most paths die after
            # a few bounces, but a scan cannot early-exit — without
            # compaction every remaining iteration pays full-width shade
            # math (and its backward recompute) for mostly-dead lanes.
            # Shared plumbing with the while_loop form (make_tail_pair).
            state, _ = jax.lax.scan(scan_body, state,
                                    jnp.arange(cfg.compact_after))
            tail_b = jnp.arange(cfg.compact_after, cfg.max_depth)

            def run_tail(st, bounce_fn):
                st, _ = jax.lax.scan(lambda s, b: (bounce_fn(s, b), None),
                                     st, tail_b)
                return st

            tail_full, tail_compact, cap, live = make_tail_pair(
                state, run_tail, wrap)
            radiance, n_rays = jax.lax.cond(jnp.sum(live) <= cap,
                                            tail_compact, tail_full,
                                            None)
            state = dict(state, radiance=radiance, n_rays=n_rays)
    else:
        def cond(carry):
            st, b = carry
            return jnp.any(st["alive"]) & (b < cfg.max_depth)

        def body(carry):
            st, b = carry
            return bounce(st, b), b + 1

        compact = (cfg.compact_after is not None
                   and cfg.compact_after < cfg.max_depth and n >= 4096)
        if not compact:
            state, _ = jax.lax.while_loop(cond, body,
                                          (state, jnp.asarray(0)))
        else:
            # ---- tail compaction: full width up to compact_after, then
            # gather survivors into a quarter-width batch (shared
            # plumbing with the differentiable form, make_tail_pair).
            def cond0(carry):
                st, b = carry
                return jnp.any(st["alive"]) & (b < cfg.compact_after)

            state, b_end = jax.lax.while_loop(cond0, body,
                                              (state, jnp.asarray(0)))

            def run_tail(st, bounce_fn):
                st, _ = jax.lax.while_loop(
                    lambda c: jnp.any(c[0]["alive"]) & (c[1] <
                                                        cfg.max_depth),
                    lambda c: (bounce_fn(c[0], c[1]), c[1] + 1),
                    (st, b_end))
                return st

            tail_full, tail_compact, cap, live = make_tail_pair(
                state, run_tail, lambda f: f)
            radiance, n_rays = jax.lax.cond(jnp.sum(live) <= cap,
                                            tail_compact, tail_full,
                                            None)
            state = dict(state, radiance=radiance, n_rays=n_rays)
    if with_stats:
        return state["radiance"], dict(n_rays=state["n_rays"])
    return state["radiance"]


# ---------------------------------------------------------------------------
# Persistent wavefront (ray regeneration)
# ---------------------------------------------------------------------------

def trace_regen(scene, cam, meta, cfg: RenderConfig, pixel_idx, waves: int,
                sample_offset, lanes: int | None = None,
                with_stats: bool = False):
    """Persistent-wavefront estimator: drain a (pixel x sample) queue.

    The reference keeps every CPU thread busy by looping whole pixels per
    thread (Integrators.cpp:55-90); the TPU analog keeps every LANE busy.
    A queue of camera samples — `waves` consecutive sample indices for
    each entry of `pixel_idx` — is drained by a fixed lane batch: a lane
    whose path terminates flushes its radiance and is refilled with the
    next queue entry in the same iteration, so dead lanes exist only in
    the final drain-down, not for (max_depth - path_length) iterations
    per sample wave as in `trace`.

    `lanes` decouples the in-flight batch width from the queue length
    (default: one lane per pixel).  At spp=1 the queue must span SEVERAL
    pixel tiles for regeneration to do anything — the render driver
    passes a multi-tile pixel_idx with lanes=rays_per_batch.

    Exactness: each sample's radiance is a pure function of (pixel,
    sample_idx, per-sample bounce index) — identical RNG streams, camera
    rays (sensor.camera.camera_lanes), and estimator maths as the
    wave-by-wave path — so results match `trace` to float precision.
    Two documented exceptions, shared with tail compaction: lane
    regrouping can flip traversal tie-breaks (~1 ULP on isolated
    pixels), and stochastic alpha-BLEND occlusion keys on the lane
    index (intersect.occluded), which regrouping changes (unbiased
    either way).

    Returns radiance [waves * n_pixels, 3], wave-major: entry
    q = s * n_pixels + i is sample `sample_offset + s` of pixel
    `pixel_idx[i]`.  with_stats adds {"n_rays": scalar}.
    """
    from ..sensor.camera import camera_lanes
    n_pix = pixel_idx.shape[0]
    q_total = n_pix * waves
    k = min(lanes, q_total) if lanes else n_pix
    w = cam["resolution"][0]
    offset = jnp.asarray(sample_offset, jnp.uint32)

    def fresh(qi):
        """Camera state for queue entries `qi` (garbage for lanes whose
        qi is stale — callers mask with `take`)."""
        pix = pixel_idx[qi % n_pix]
        px = pix % w
        py = pix // w
        sidx = offset + (qi // n_pix).astype(jnp.uint32)
        o, d, t, _ = camera_lanes(cam, cfg.sampler, px, py, sidx)
        return px, py, sidx, o, d, t

    qi0 = jnp.arange(k, dtype=jnp.int32)
    px0, py0, sidx0, o0, d0, t0 = fresh(qi0)
    carry = dict(
        st=dict(o=o0, d=d0,
                tput=jnp.ones((k, 3), jnp.float32),
                radiance=jnp.zeros((k, 3), jnp.float32),
                prev_pdf=jnp.ones((k,), jnp.float32),
                spec=jnp.ones((k,), bool),
                alive=jnp.ones((k,), bool),
                medium=jnp.full((k,), meta.camera_medium, jnp.int32),
                rr_depth=jnp.zeros((k,), jnp.int32),
                n_rays=jnp.zeros((), jnp.float32)),
        qi=qi0, head=jnp.asarray(k, jnp.int32),
        b=jnp.zeros((k,), jnp.int32),
        px=px0, py=py0, sidx=sidx0, time=t0,
        out=jnp.zeros((q_total, 3), jnp.float32))

    def cond(c):
        return jnp.any(c["st"]["alive"])

    def body(c):
        bounce = _make_bounce(scene, meta, cfg, c["px"], c["py"],
                              c["time"], c["sidx"], k)
        st = bounce(c["st"], c["b"])
        b = c["b"] + 1
        alive = st["alive"] & (b < cfg.max_depth)
        # flush every sample exactly once, the iteration its path ends
        # (dead-from-before lanes have alive==False on both sides)
        finished = c["st"]["alive"] & ~alive
        rad = jnp.where(jnp.isfinite(st["radiance"]), st["radiance"], 0.0)
        out = c["out"].at[c["qi"]].add(
            jnp.where(finished[:, None], rad, 0.0))

        # refill finished lanes from the queue head, in lane order.  The
        # flush scatter above costs O(q_total) operand rows per
        # iteration (CLAUDE.md: TPU scatter cost follows operand size) —
        # the drivers keep q_total to a few lane-batches
        # (render.regen_schedule) so it stays noise next to a bounce.
        # The queue never refills, so lanes idle only once it drains.
        ranks = jnp.cumsum(finished.astype(jnp.int32)) - 1
        cand = c["head"] + ranks
        take = finished & (cand < q_total)
        qi = jnp.where(take, cand, c["qi"])
        head = jnp.minimum(
            c["head"] + jnp.sum(finished.astype(jnp.int32)), q_total)
        pxn, pyn, sidxn, on, dn, tn = fresh(qi)
        tk = take[:, None]
        st = dict(
            o=jnp.where(tk, on, st["o"]),
            d=jnp.where(tk, dn, st["d"]),
            tput=jnp.where(tk, 1.0, st["tput"]),
            radiance=jnp.where(tk, 0.0, st["radiance"]),
            prev_pdf=jnp.where(take, 1.0, st["prev_pdf"]),
            spec=jnp.where(take, True, st["spec"]),
            alive=alive | take,
            medium=jnp.where(take, meta.camera_medium, st["medium"]),
            rr_depth=jnp.where(take, 0, st["rr_depth"]),
            n_rays=st["n_rays"])
        return dict(st=st, qi=qi, head=head,
                    b=jnp.where(take, 0, b),
                    px=jnp.where(take, pxn, c["px"]),
                    py=jnp.where(take, pyn, c["py"]),
                    sidx=jnp.where(take, sidxn, c["sidx"]),
                    time=jnp.where(take, tn, c["time"]),
                    out=out)

    carry = jax.lax.while_loop(cond, body, carry)
    if with_stats:
        return carry["out"], dict(n_rays=carry["st"]["n_rays"])
    return carry["out"]


# ---------------------------------------------------------------------------
# medium scatter-position plumbing (defined after trace for clarity)
# ---------------------------------------------------------------------------
