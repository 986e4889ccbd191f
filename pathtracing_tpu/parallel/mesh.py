"""Multi-chip parallelism: device mesh, sharded render, sharded train step.

The reference's only run-time parallelism is a CPU thread pool pulling 32x32
tiles from an atomic counter and merging into an atomic film
(Integrators.cpp:23-129, Film.hpp:227-249).  The TPU-native replacement is
data parallelism over the pixel/sample axes via `shard_map` on a
`jax.sharding.Mesh`:

  * the scene IR (BVH + material/light/medium/texture tables) is REPLICATED
    on every chip — the analog of the reference's shared address space;
  * pixels are sharded over the `dp` mesh axis; each device traces its pixel
    block and splats into a device-local full-resolution partial film;
  * the final film is a `psum` over the mesh — the deterministic collective
    replacement for `AtomicPixel::fetch_add` merges;
  * for inverse rendering, per-device parameter gradients are `psum`
    all-reduced (there is nothing like this in the reference — it has no
    gradients and no comms backend at all; SURVEY.md §2.9).

An optional second mesh axis (`sp`) shards sample waves, giving a 2D mesh
(dp x sp) so film contributions reduce over both axes.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..integrators.path import RenderConfig, trace, trace_regen
from ..integrators.render import _sample_wave
from ..sensor.camera import film_position
from ..sensor import film as filmmod


def make_mesh(n_devices: int | None = None, sp: int = 1) -> Mesh:
    """1D or 2D device mesh: ('dp',) or ('dp', 'sp').

    dp shards pixels, sp shards sample waves.  Uses the first
    `n_devices` visible devices (all by default).
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if sp > 1:
        assert n % sp == 0, f"{n} devices not divisible by sp={sp}"
        arr = np.asarray(devs).reshape(n // sp, sp)
        return Mesh(arr, ("dp", "sp"))
    return Mesh(np.asarray(devs), ("dp",))


def _pad_pixels(npix: int, parts: int, batch: int):
    """Pixel index layout: pad to parts*per, per a multiple of batch."""
    per = -(-npix // parts)
    per = -(-per // batch) * batch
    return per


def render_sharded(scene, cam, meta, cfg: RenderConfig, mesh: Mesh | None
                   = None, spp: int | None = None, sample_offset: int = 0):
    """Full-frame render sharded over the mesh. Returns the film dict.

    Pixels are split over 'dp' (and sample waves over 'sp' if present);
    every device splats into its own full-res partial film; one psum at the
    end produces the identical film on all devices (replicated output).
    """
    mesh = mesh or make_mesh()
    spp = cfg.spp if spp is None else spp
    w, h = cam["resolution"]
    npix = w * h
    dp = mesh.shape["dp"]
    sp = mesh.shape.get("sp", 1)
    assert spp % sp == 0, f"spp={spp} not divisible by sp={sp}"
    spp_local = spp // sp
    batch = min(cfg.rays_per_batch, npix)
    per = _pad_pixels(npix, dp, min(batch, -(-npix // dp)))
    batch = min(batch, per)
    n_tiles = per // batch
    pix = jnp.arange(dp * per, dtype=jnp.int32)
    axes = tuple(mesh.axis_names)

    cam_arrays = {k: v for k, v in cam.items() if k != "resolution"}

    use_regen = cfg.regenerate and not cfg.differentiable
    if use_regen:
        # queue groups of (consecutive tiles) x (local sample waves),
        # same schedule as the unsharded driver (g_tiles restricted to
        # divisors of n_tiles: the worker scans equal-size groups)
        from ..integrators.render import regen_schedule
        g_tiles, wpg = regen_schedule(n_tiles, spp_local, divisor=True)
        gbatch = g_tiles * batch

    def worker(scene, cam_arrays, pix_local, wave0):
        cam_l = dict(cam_arrays, resolution=cam["resolution"])
        film = filmmod.new_film((w, h))
        offset = jnp.asarray(sample_offset, jnp.uint32) \
            + wave0[0].astype(jnp.uint32)

        if use_regen:
            # persistent wavefront per tile group: drain the group's
            # (pixel x local-sample) queue with batch-wide lanes, then
            # splat each wave (shard pixel blocks are not row-aligned,
            # so this uses the scatter splat like _sample_wave)
            def group_body(film, t):
                idx = jax.lax.dynamic_slice_in_dim(pix_local, t * gbatch,
                                                   gbatch)
                px = idx % w
                py = idx // w
                done = 0
                while done < spp_local:
                    waves = min(wpg, spp_local - done)
                    out = trace_regen(scene, cam_l, meta, cfg, idx,
                                      waves, offset + jnp.uint32(done),
                                      lanes=batch)
                    for s_w in range(waves):
                        p = film_position(cfg.sampler, px, py,
                                          offset + jnp.uint32(done + s_w))
                        p = jnp.where((idx < npix)[:, None], p,
                                      jnp.full_like(p, -1e6))
                        film = filmmod.splat(
                            film, cfg.filter, cam["resolution"], p,
                            out[s_w * gbatch:(s_w + 1) * gbatch])
                    done += waves
                return film, None

            film, _ = jax.lax.scan(group_body, film,
                                   jnp.arange(n_tiles // g_tiles,
                                              dtype=jnp.int32))
        else:
            def wave_body(film, s_idx):
                def tile_body(film, t):
                    idx = jax.lax.dynamic_slice_in_dim(pix_local,
                                                       t * batch, batch)
                    return _sample_wave(scene, cam_l, meta, cfg, film,
                                        idx, s_idx + offset), None
                film, _ = jax.lax.scan(tile_body, film,
                                       jnp.arange(n_tiles, dtype=jnp.int32))
                return film, None

            film, _ = jax.lax.scan(wave_body, film,
                                   jnp.arange(spp_local, dtype=jnp.uint32))
        return jax.tree.map(lambda x: jax.lax.psum(x, axes), film)

    wave0 = jnp.repeat(jnp.arange(sp, dtype=jnp.int32) * spp_local, dp)
    if sp > 1:
        pix_spec, wave_spec = P("dp"), P("sp")
    else:
        pix_spec, wave_spec = P("dp"), P("dp")
        wave0 = jnp.zeros((dp,), jnp.int32)

    fn = shard_map(worker, mesh=mesh,
                   in_specs=(P(), P(), pix_spec, wave_spec),
                   out_specs=P(), check_vma=False)
    return jax.jit(fn)(scene, cam_arrays, pix, wave0)


def render_image_sharded(scene, cam, meta, cfg: RenderConfig,
                         mesh: Mesh | None = None, spp: int | None = None):
    film = render_sharded(scene, cam, meta, cfg, mesh, spp)
    w, h = cam["resolution"]
    return filmmod.finalize(film).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Sharded inverse-rendering train step
# ---------------------------------------------------------------------------

DEFAULT_PARAM_KEYS = ("mat_base", "mat_rough", "mat_metal", "light_color")


def train_step_sharded(scene, cam, meta, cfg: RenderConfig, target,
                       mesh: Mesh | None = None, lr: float = 0.05,
                       param_keys=DEFAULT_PARAM_KEYS, spp: int | None = None,
                       sample_offset: int = 0):
    """One SGD step of inverse rendering, sharded over the mesh.

    Differentiable-render MSE loss against `target` [H,W,3]; pixels sharded
    over 'dp' (and samples over 'sp'); parameter gradients psum-all-reduced
    over every mesh axis (the ICI collective the reference never needed —
    its "gradient" story is SURVEY.md §2.9: absent).

    Returns (new_params dict, loss scalar). Scene stays unmodified; callers
    merge params back with {**scene, **new_params}.

    The per-device partial films are psum-merged INSIDE the loss, so
    reconstruction-filter spill across shard borders is exchanged before
    normalization: the loss (and its gradient) is identical for every
    device count, including wide filters like Mitchell (round 1 compared
    each device's un-merged partial film against the target, which made
    sharded losses device-count-dependent for non-box filters).
    """
    mesh = mesh or make_mesh()
    cfg = RenderConfig(**{**cfg.__dict__, "differentiable": True})
    spp = cfg.spp if spp is None else spp
    w, h = cam["resolution"]
    npix = w * h
    dp = mesh.shape["dp"]
    sp = mesh.shape.get("sp", 1)
    assert spp % sp == 0
    spp_local = spp // sp
    per = _pad_pixels(npix, dp, 8)
    pix = jnp.arange(dp * per, dtype=jnp.int32)
    axes = tuple(mesh.axis_names)

    params = {k: scene[k] for k in param_keys}
    rest = {k: v for k, v in scene.items() if k not in param_keys}
    cam_arrays = {k: v for k, v in cam.items() if k != "resolution"}
    target_flat = jnp.reshape(target, (npix, 3))

    def worker(params, rest, cam_arrays, target_flat, pix_local, wave0):
        cam_l = dict(cam_arrays, resolution=cam["resolution"])
        offset = jnp.asarray(sample_offset, jnp.uint32) \
            + wave0[0].astype(jnp.uint32)

        def loss_fn(params):
            scene_l = {**rest, **params}
            film = filmmod.new_film((w, h))

            def wave_body(film, s_idx):
                return _sample_wave(scene_l, cam_l, meta, cfg, film,
                                    pix_local, s_idx + offset), None

            film, _ = jax.lax.scan(wave_body, film,
                                   jnp.arange(spp_local, dtype=jnp.uint32))
            # merge the partial films BEFORE normalizing: filter spill
            # into pixels owned by other devices is exchanged here (the
            # halo), so the loss is exact for any device count/filter
            film = jax.tree.map(lambda x: jax.lax.psum(x, axes), film)
            img = film["rgb"] / jnp.maximum(film["weight"], 1e-12)[:, None]
            valid = film["weight"] > 0
            err = jnp.where(valid[:, None], img - target_flat, 0.0)
            return jnp.sum(err * err) / (npix * 3)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # loss is already global/identical on every device.  JAX
        # transposes the in-loss film psum to another psum, so each
        # device's raw gradient is n_devices x (its own-sample
        # contribution); psum assembles the sum over devices and the
        # 1/n_devices normalizes the transpose factor, leaving the exact
        # full gradient.
        n_dev = 1
        for a in axes:
            n_dev *= mesh.shape[a]
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axes) / n_dev,
                             grads)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    wave0 = jnp.repeat(jnp.arange(sp, dtype=jnp.int32) * spp_local, dp)
    if sp > 1:
        pix_spec, wave_spec = P("dp"), P("sp")
    else:
        pix_spec, wave_spec = P("dp"), P("dp")
        wave0 = jnp.zeros((dp,), jnp.int32)

    fn = shard_map(worker, mesh=mesh,
                   in_specs=(P(), P(), P(), P(), pix_spec, wave_spec),
                   out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn)(params, rest, cam_arrays, target_flat, pix, wave0)
