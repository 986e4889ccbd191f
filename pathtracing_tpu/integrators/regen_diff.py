"""Differentiable persistent wavefront: custom-VJP ray regeneration.

Forward regeneration (path.trace_regen) is the measured-best scheduling
form (+24% over tail compaction at the bwd workload depth), but its
while_loop is not reverse-differentiable and a naive schedule-replay
under jax.grad costs TWO regen-shaped forwards (measured net loss,
STATUS round-4 item 10).  This module implements the design that wins:

  * ONE recording forward — the production regen while_loop, recording
    per-iteration residuals: the traversal outputs (hit records +
    shadow visibility, exactly what the scan form's remat policy saves)
    plus the schedule (queue entry, bounce index, queue head) and the
    differentiable carry primals (tput, prev_pdf; radiance is linear in
    the iteration map so only its finiteness gate is recorded);
  * a hand-rolled reverse while_loop over the recorded schedule: each
    step rebuilds that iteration's shade-only bounce via
    _make_bounce(replay=...) — NO traversal kernels in the program —
    and pulls cotangents through jax.vjp, accumulating parameter
    gradients and propagating the (tput, radiance, prev_pdf) carry
    cotangents backward.  Refill resets are constants, so gradient
    chains cut exactly at sample boundaries as they should.

Gradient semantics are identical to the scan form's (detached-sampling
estimator: bsdf_sample stop-gradients wi/origin, make_interaction
stop-gradients geometry — the only cross-iteration differentiable state
is {tput, radiance, prev_pdf}); tests/test_regen_diff.py ties the
gradients to jax.grad of the scan form.

Memory: residuals are ~73 B/lane/iteration with a static iteration
bound of ceil(q_total * max_depth / lanes) + max_depth (the queue keeps
every lane busy until it drains, so at most q_total*max_depth bounce
slots spread over `lanes` lanes, plus the drain-down tail).

Media (volpath) are not supported yet — transmittance marching is a
third traversal class the recorder does not capture; trace() keeps the
scan form for differentiable volpath.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .path import _make_bounce, RenderConfig


# scene keys whose arrays can carry gradients (materials, textures,
# lights, media).  Geometry/acceleration tables are detached by design
# (make_interaction stop-gradients its outputs) — excluding them keeps
# the reverse loop's gradient accumulator small.
_DIFF_PREFIXES = ("mat_", "tex_", "light_", "med_", "env_")


def split_scene(scene):
    """(diff, rest): parameter arrays vs detached geometry/tables."""
    diff = {k: v for k, v in scene.items()
            if k.startswith(_DIFF_PREFIXES)}
    rest = {k: v for k, v in scene.items()
            if not k.startswith(_DIFF_PREFIXES)}
    return diff, rest


def _zero_ct(pytree):
    """Zero cotangents for a primal pytree (float0 for int/bool)."""
    def z(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                  jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(jnp.shape(x), jax.dtypes.float0)
    return jax.tree.map(z, pytree)


def trace_regen_diff(scene, cam, meta, cfg: RenderConfig, pixel_idx,
                     waves: int, sample_offset, lanes: int | None = None):
    """Differentiable trace_regen: same queue/drain/refill semantics and
    return contract as path.trace_regen (radiance [waves * n_pixels, 3],
    wave-major), with gradients flowing to material / texture / light /
    medium scene arrays through a custom VJP."""
    n_pix = int(pixel_idx.shape[0])
    q_total = n_pix * waves
    k = min(lanes, q_total) if lanes else n_pix
    max_iters = (q_total * cfg.max_depth) // k + cfg.max_depth + 1
    fn = _regen_diff_fn(meta, cfg, int(waves), int(k), int(max_iters),
                        int(n_pix))
    diff, rest = split_scene(scene)
    return fn(diff, rest, cam, pixel_idx,
              jnp.asarray(sample_offset, jnp.uint32))


@functools.lru_cache(maxsize=16)
def _regen_diff_fn(meta, cfg, waves, k, max_iters, n_pix):
    q_total = n_pix * waves

    def fresh(cam, pixel_idx, offset, qi):
        from ..sensor.camera import camera_lanes
        w = cam["resolution"][0]
        pix = pixel_idx[qi % n_pix]
        px = pix % w
        py = pix // w
        sidx = offset + (qi // n_pix).astype(jnp.uint32)
        o, d, t, _ = camera_lanes(cam, cfg.sampler, px, py, sidx)
        return px, py, sidx, o, d, t

    # ---- recording forward: trace_regen's loop + residual writes -----
    def run_fwd(scene, cam, pixel_idx, offset):
        qi0 = jnp.arange(k, dtype=jnp.int32)
        px0, py0, sidx0, o0, d0, t0 = fresh(cam, pixel_idx, offset, qi0)
        st0 = dict(o=o0, d=d0,
                   tput=jnp.ones((k, 3), jnp.float32),
                   radiance=jnp.zeros((k, 3), jnp.float32),
                   prev_pdf=jnp.ones((k,), jnp.float32),
                   spec=jnp.ones((k,), bool),
                   alive=jnp.ones((k,), bool),
                   medium=jnp.full((k,), meta.camera_medium, jnp.int32),
                   rr_depth=jnp.zeros((k,), jnp.int32),
                   n_rays=jnp.zeros((), jnp.float32))
        bufs = dict(
            o=jnp.zeros((max_iters, k, 3), jnp.float32),
            d=jnp.ones((max_iters, k, 3), jnp.float32),
            tput=jnp.zeros((max_iters, k, 3), jnp.float32),
            prev_pdf=jnp.zeros((max_iters, k), jnp.float32),
            spec=jnp.zeros((max_iters, k), bool),
            alive=jnp.zeros((max_iters, k), bool),
            rr_depth=jnp.zeros((max_iters, k), jnp.int32),
            qi=jnp.zeros((max_iters, k), jnp.int32),
            b=jnp.zeros((max_iters, k), jnp.int32),
            head=jnp.zeros((max_iters,), jnp.int32),
            hit_t=jnp.zeros((max_iters, k), jnp.float32),
            hit_kind=jnp.zeros((max_iters, k), jnp.int32),
            hit_idx=jnp.zeros((max_iters, k), jnp.int32),
            hit_valid=jnp.zeros((max_iters, k), bool),
            occ=jnp.zeros((max_iters, k), bool),
            rad_ok=jnp.zeros((max_iters, k, 3), bool),
        )
        carry = dict(st=st0, qi=qi0, head=jnp.asarray(k, jnp.int32),
                     b=jnp.zeros((k,), jnp.int32),
                     px=px0, py=py0, sidx=sidx0, time=t0,
                     out=jnp.zeros((q_total, 3), jnp.float32),
                     i=jnp.asarray(0, jnp.int32), bufs=bufs)

        def cond(c):
            return jnp.any(c["st"]["alive"]) & (c["i"] < max_iters)

        def body(c):
            i = c["i"]
            bufs = c["bufs"]
            st_in = c["st"]
            # record this iteration's inputs + schedule
            rec = dict(o=st_in["o"], d=st_in["d"], tput=st_in["tput"],
                       prev_pdf=st_in["prev_pdf"], spec=st_in["spec"],
                       alive=st_in["alive"], rr_depth=st_in["rr_depth"],
                       qi=c["qi"], b=c["b"], head=c["head"])
            bufs = {**bufs, **{n: bufs[n].at[i].set(v)
                               for n, v in rec.items()}}
            bounce = _make_bounce(scene, meta, cfg, c["px"], c["py"],
                                  c["time"], c["sidx"], k, record=True)
            st, aux = bounce(st_in, c["b"])
            bufs = {**bufs,
                    **{n: bufs[n].at[i].set(aux[n])
                       for n in ("hit_t", "hit_kind", "hit_idx",
                                 "hit_valid", "occ")},
                    "rad_ok": bufs["rad_ok"].at[i].set(
                        jnp.isfinite(st["radiance"]))}
            b = c["b"] + 1
            alive = st["alive"] & (b < cfg.max_depth)
            finished = st_in["alive"] & ~alive
            rad = jnp.where(jnp.isfinite(st["radiance"]),
                            st["radiance"], 0.0)
            out = c["out"].at[c["qi"]].add(
                jnp.where(finished[:, None], rad, 0.0))
            ranks = jnp.cumsum(finished.astype(jnp.int32)) - 1
            cand = c["head"] + ranks
            take = finished & (cand < q_total)
            qi = jnp.where(take, cand, c["qi"])
            head = jnp.minimum(
                c["head"] + jnp.sum(finished.astype(jnp.int32)),
                q_total)
            pxn, pyn, sidxn, on, dn, tn = fresh(cam, pixel_idx,
                                                offset, qi)
            tk = take[:, None]
            st = dict(
                o=jnp.where(tk, on, st["o"]),
                d=jnp.where(tk, dn, st["d"]),
                tput=jnp.where(tk, 1.0, st["tput"]),
                radiance=jnp.where(tk, 0.0, st["radiance"]),
                prev_pdf=jnp.where(take, 1.0, st["prev_pdf"]),
                spec=jnp.where(take, True, st["spec"]),
                alive=alive | take,
                medium=jnp.where(take, meta.camera_medium,
                                 st["medium"]),
                rr_depth=jnp.where(take, 0, st["rr_depth"]),
                n_rays=st["n_rays"])
            return dict(st=st, qi=qi, head=head,
                        b=jnp.where(take, 0, b),
                        px=jnp.where(take, pxn, c["px"]),
                        py=jnp.where(take, pyn, c["py"]),
                        sidx=jnp.where(take, sidxn, c["sidx"]),
                        time=jnp.where(take, tn, c["time"]),
                        out=out, i=i + 1, bufs=bufs)

        carry = jax.lax.while_loop(cond, body, carry)
        return carry["out"], carry["bufs"], carry["i"]

    # ---- one-iteration shade replay (vjp'd in the reverse loop) ------
    def replay_iter(scene, cam, pixel_idx, offset, res, tput, prev_pdf,
                    radiance):
        """Re-run iteration i's shade math on recorded traversal
        outputs.  Differentiable in (scene params, tput, prev_pdf,
        radiance); radiance enters LINEARLY (pure accumulator), so the
        zero primal the reverse loop passes for it is exact for every
        cotangent — its finiteness flush gate uses the recorded
        rad_ok."""
        px, py, sidx, _, _, t = fresh(cam, pixel_idx, offset, res["qi"])
        replay = dict(hit_t=res["hit_t"], hit_kind=res["hit_kind"],
                      hit_idx=res["hit_idx"],
                      hit_valid=res["hit_valid"], occ=res["occ"])
        bounce = _make_bounce(scene, meta, cfg, px, py, t, sidx, k,
                              replay=replay)
        st_in = dict(o=res["o"], d=res["d"], tput=tput,
                     radiance=radiance, prev_pdf=prev_pdf,
                     spec=res["spec"], alive=res["alive"],
                     medium=jnp.full((k,), meta.camera_medium,
                                     jnp.int32),
                     rr_depth=res["rr_depth"],
                     n_rays=jnp.zeros((), jnp.float32))
        st = bounce(st_in, res["b"])
        b = res["b"] + 1
        alive = st["alive"] & (b < cfg.max_depth)
        finished = res["alive"] & ~alive
        rad = jnp.where(res["rad_ok"], st["radiance"], 0.0)
        flush = jnp.where(finished[:, None], rad, 0.0)
        ranks = jnp.cumsum(finished.astype(jnp.int32)) - 1
        cand = res["head"] + ranks
        take = finished & (cand < q_total)
        tk = take[:, None]
        return (jnp.where(tk, 1.0, st["tput"]),
                jnp.where(take, 1.0, st["prev_pdf"]),
                jnp.where(tk, 0.0, st["radiance"]),
                flush)

    # ---- custom-vjp wrapper ------------------------------------------
    @jax.custom_vjp
    def fn(scene_diff, scene_rest, cam, pixel_idx, offset):
        scene = {**scene_diff, **scene_rest}
        out, _, _ = run_fwd(scene, cam, pixel_idx, offset)
        return out

    def fwd(scene_diff, scene_rest, cam, pixel_idx, offset):
        scene = {**scene_diff, **scene_rest}
        out, bufs, count = run_fwd(scene, cam, pixel_idx, offset)
        return out, (scene_diff, scene_rest, cam, pixel_idx, offset,
                     bufs, count)

    def bwd(saved, g_out):
        scene_diff, scene_rest, cam, pixel_idx, offset, bufs, count = \
            saved

        def rp(sd, res, tput, prev_pdf, radiance):
            scene = {**sd, **scene_rest}
            return replay_iter(scene, cam, pixel_idx, offset, res, tput,
                               prev_pdf, radiance)

        def cond(c):
            return c["i"] >= 0

        def body(c):
            i = c["i"]
            res = {n: jax.lax.dynamic_index_in_dim(bufs[n], i, 0,
                                                   keepdims=False)
                   for n in bufs}
            ct_flush = g_out[res["qi"]]
            _, vjp = jax.vjp(rp, scene_diff, res, res["tput"],
                             res["prev_pdf"],
                             jnp.zeros((k, 3), jnp.float32))
            d_sd, _, ct_tp, ct_pp, ct_rad = vjp(
                (c["ct_tput"], c["ct_pp"], c["ct_rad"], ct_flush))
            d_diff = jax.tree.map(
                lambda a, g: a + g if (hasattr(g, "dtype") and
                                       jnp.issubdtype(g.dtype,
                                                      jnp.floating))
                else a, c["d_diff"], d_sd)
            return dict(i=i - 1, ct_tput=ct_tp, ct_pp=ct_pp,
                        ct_rad=ct_rad, d_diff=d_diff)

        init = dict(i=count - 1,
                    ct_tput=jnp.zeros((k, 3), jnp.float32),
                    ct_pp=jnp.zeros((k,), jnp.float32),
                    ct_rad=jnp.zeros((k, 3), jnp.float32),
                    d_diff=jax.tree.map(
                        lambda x: jnp.zeros_like(x)
                        if jnp.issubdtype(x.dtype, jnp.floating)
                        else x, scene_diff))
        final = jax.lax.while_loop(cond, body, init)
        d_diff = jax.tree.map(
            lambda x, g: g if jnp.issubdtype(x.dtype, jnp.floating)
            else np.zeros(jnp.shape(x), jax.dtypes.float0),
            scene_diff, final["d_diff"])
        return (d_diff, _zero_ct(scene_rest), _zero_ct(cam),
                _zero_ct(pixel_idx), _zero_ct(offset))

    fn.defvjp(fwd, bwd)
    return fn
