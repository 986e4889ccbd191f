"""CLI entry point.

The reference selects scenes with a hardcoded `switch(1)` in main()
(main.cpp:902-930) and has no flags at all (SURVEY.md §5).  This CLI is the
config/flag system the rebuild adds:

  python -m pathtracing_tpu render --scene cornell --spp 64 --out img.png
  python -m pathtracing_tpu render --model scene.gltf --spp 128 ...
  python -m pathtracing_tpu bench
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path


def _build_scene(args):
    from . import scenes as builtin
    from .scene.builder import SceneBuilder
    from .io import load_gltf, load_obj, load_scene, save_scene

    if args.cache and Path(args.cache).exists() and not args.rebuild:
        from .io.cache import StaleCacheError
        print(f"[scene] loading cache {args.cache}", file=sys.stderr)
        try:
            return load_scene(args.cache)
        except StaleCacheError as e:
            print(f"[scene] {e}; rebuilding", file=sys.stderr)

    if args.model:
        b = SceneBuilder()
        p = Path(args.model)
        t0 = time.perf_counter()
        if p.suffix.lower() in (".gltf", ".glb"):
            stats = load_gltf(p, b, scale=args.scale)
        elif p.suffix.lower() == ".obj":
            stats = load_obj(p, b, scale=args.scale)
        else:
            raise SystemExit(f"unsupported model format: {p.suffix}")
        print(f"[scene] import {p.name}: {stats} "
              f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)
        if args.env_light:
            b.add_uniform_inf_light([args.env_light] * 3)
        if args.sun:
            b.add_distant_light(direction=(-0.3, -1.0, -0.3),
                                color=[args.sun] * 3)
        lf = [float(x) for x in args.look_from.split(",")]
        la = [float(x) for x in args.look_at.split(",")]
        b.set_camera(lf, la, math.radians(args.fov),
                     tuple(args.resolution),
                     focus_angle=math.radians(args.focus_angle),
                     focus_distance=args.focus_distance)
        t0 = time.perf_counter()
        out = b.build(accel=args.accel)
        print(f"[scene] build (SAH BVH): {time.perf_counter()-t0:.1f}s "
              f"accel={out[2].accel}", file=sys.stderr)
    else:
        if args.scene not in builtin.SCENES:
            raise SystemExit(f"unknown scene {args.scene}; "
                             f"have {sorted(builtin.SCENES)}")
        out = builtin.SCENES[args.scene](resolution=tuple(args.resolution))

    if args.cache:
        save_scene(args.cache, *out)
        print(f"[scene] cached -> {args.cache}", file=sys.stderr)
    return out


def _turntable(args, scene, cam, meta, cfg):
    """Orbit the camera around look_at over N frames and encode a video
    if ffmpeg is available (the reference's video path, main.cpp:557-594)."""
    import shutil
    import subprocess
    import numpy as np
    from .integrators.render import render
    from .scene.builder import SceneBuilder
    from .sensor import film as filmmod

    out = Path(args.out)
    frames_dir = out.with_suffix("") if out.suffix else out
    frames_dir = Path(str(frames_dir) + "_frames")
    frames_dir.mkdir(parents=True, exist_ok=True)
    look_at = np.asarray([float(x) for x in args.look_at.split(",")])
    look_from0 = np.asarray([float(x) for x in args.look_from.split(",")])
    rel = look_from0 - look_at
    radius = math.hypot(rel[0], rel[2])
    phi0 = math.atan2(rel[2], rel[0])
    for f in range(args.turntable):
        phi = phi0 + 2.0 * math.pi * f / args.turntable
        lf = look_at + np.asarray([radius * math.cos(phi), rel[1],
                                   radius * math.sin(phi)])
        b = SceneBuilder()   # camera-only rebuild: reuse scene arrays
        b.camera = dict(look_from=lf.astype(np.float32),
                        look_at=look_at.astype(np.float32),
                        fov=math.radians(args.fov),
                        resolution=tuple(args.resolution),
                        focus_angle=math.radians(args.focus_angle),
                        focus_distance=args.focus_distance,
                        shutter=(0.0, 0.0), medium=-1)
        cam_f = b._pack_camera()
        film = render(scene, cam_f, meta, cfg)
        filmmod.write_png(film, cam_f["resolution"],
                          frames_dir / f"frame_{f:04d}.png",
                          tone_mapper=args.tonemap)
        print(f"\r[turntable] {f + 1}/{args.turntable}", end="",
              file=sys.stderr)
    print("", file=sys.stderr)
    if shutil.which("ffmpeg"):
        video = out if out.suffix == ".mp4" else out.with_suffix(".mp4")
        subprocess.run(
            ["ffmpeg", "-y", "-framerate", "30", "-i",
             str(frames_dir / "frame_%04d.png"), "-pix_fmt", "yuv420p",
             str(video)], check=False, capture_output=True)
        print(f"[turntable] wrote {video}", file=sys.stderr)
    else:
        print(f"[turntable] frames in {frames_dir} (no ffmpeg found)",
              file=sys.stderr)


def cmd_render(args):
    from .integrators.path import RenderConfig
    from .core.rng import SamplerConfig
    from .integrators.render import render
    from .sensor import film as filmmod
    from .utils.profile import RenderTimer
    from .utils.checkpoint import render_with_checkpoints

    scene, cam, meta = _build_scene(args)
    w, h = cam["resolution"]
    x = max(1, int(math.isqrt(args.spp)))
    cfg = RenderConfig(
        spp=args.spp, max_depth=args.max_depth, integrator=args.integrator,
        sampler=SamplerConfig(kind=args.sampler, x_samples=x,
                              y_samples=max(1, args.spp // x),
                              seed=args.seed),
        rays_per_batch=args.rays_per_batch,
        compact_after=args.compact_after,
        regenerate=args.regen)

    if args.turntable:
        _turntable(args, scene, cam, meta, cfg)
        return

    def progress(done, total):
        print(f"\r[render] {100.0*done/total:5.1f}%", end="",
              file=sys.stderr)

    with RenderTimer(w * h, args.spp, args.max_depth) as t:
        if args.sharded:
            from .parallel.mesh import render_sharded
            film = render_sharded(scene, cam, meta, cfg)
        elif args.adaptive:
            from .utils.adaptive import render_adaptive
            film, stats = render_adaptive(
                scene, cam, meta, cfg, base_spp=max(args.spp // 8, 4),
                target=args.adaptive)
            print(f"\n[adaptive] mean spp {stats['mean_spp']:.1f}",
                  file=sys.stderr)
        elif args.checkpoint:
            film = render_with_checkpoints(scene, cam, meta, cfg, args.spp,
                                           args.checkpoint,
                                           every=args.checkpoint_every)
        else:
            film = render(scene, cam, meta, cfg, progress=progress)
        t.result = film
    print("", file=sys.stderr)

    out = Path(args.out)
    writer = dict(png=filmmod.write_png, jpg=filmmod.write_jpg,
                  jpeg=filmmod.write_jpg, ppm=filmmod.write_ppm)
    ext = out.suffix.lstrip(".").lower() or "png"
    writer[ext](film, cam["resolution"], out, tone_mapper=args.tonemap)
    print(f"[render] wrote {out}", file=sys.stderr)


def cmd_bench(args):
    import runpy
    sys.argv = ["bench.py"]
    runpy.run_path(str(Path(__file__).resolve().parent.parent / "bench.py"),
                   run_name="__main__")


def main(argv=None):
    # honor JAX_PLATFORMS even when a sitecustomize pinned the platform
    # before this process's env was consulted (e.g. remote-TPU plugins)
    import os
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ap = argparse.ArgumentParser(prog="pathtracing_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("render", help="render a scene")
    r.add_argument("--scene", default="cornell")
    r.add_argument("--model", default=None,
                   help="path to .gltf/.glb/.obj (overrides --scene)")
    r.add_argument("--cache", default=None,
                   help="scene-compile cache .npz (assbin analog)")
    r.add_argument("--rebuild", action="store_true")
    r.add_argument("--resolution", nargs=2, type=int, default=[512, 512])
    r.add_argument("--spp", type=int, default=64)
    r.add_argument("--max-depth", type=int, default=8)
    r.add_argument("--integrator", default="path",
                   choices=["simple", "path", "volpath"])
    r.add_argument("--sampler", default="stratified",
                   choices=["stratified", "uniform"])
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--accel", default="auto",
                   choices=["auto", "pallas", "beam", "bvh", "brute"],
                   help="auto picks by scene size (pallas kernel for "
                        ">4K-tri scenes)")
    r.add_argument("--rays-per-batch", type=int, default=1 << 16)
    r.add_argument("--compact-after", type=int, default=None,
                   help="tail compaction: gather surviving lanes into a "
                        "quarter-width batch after this many bounces")
    r.add_argument("--regen", action="store_true",
                   help="persistent wavefront: refill finished lanes with "
                        "fresh camera samples so multi-spp queues drain "
                        "with every lane busy (supersedes --compact-after)")
    r.add_argument("--tonemap", default="reinhard_jodie")
    r.add_argument("--out", default="out.png")
    r.add_argument("--sharded", action="store_true",
                   help="shard over all visible devices")
    r.add_argument("--adaptive", type=float, default=None,
                   help="adaptive sampling rel-variance target (ref: 1.5)")
    r.add_argument("--checkpoint", default=None)
    r.add_argument("--checkpoint-every", type=int, default=16)
    # model-import camera/lights
    r.add_argument("--scale", type=float, default=1.0)
    r.add_argument("--look-from", default="0,1,-4")
    r.add_argument("--look-at", default="0,0.5,0")
    r.add_argument("--fov", type=float, default=40.0)
    r.add_argument("--focus-angle", type=float, default=0.0)
    r.add_argument("--focus-distance", type=float, default=0.0)
    r.add_argument("--env-light", type=float, default=None)
    r.add_argument("--sun", type=float, default=None)
    r.add_argument("--turntable", type=int, default=0,
                   help="render N orbit frames + encode video (ffmpeg)")
    r.set_defaults(fn=cmd_render)

    b = sub.add_parser("bench", help="run the benchmark")
    b.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
