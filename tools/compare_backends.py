"""Cross-backend comparison: TPU render AND gradients vs CPU reference.

The BASELINE north star asks for images and pixel-gradients allclose
against a CPU reference at equal sample counts.  This framework IS its
own CPU reference: the same deterministic counter-based sampler runs on
both backends, so the only differences are platform numerics — and the
discrete decisions (Russian roulette, lobe picks) that sit on f32
thresholds and can flip.

Run:  python tools/compare_backends.py [scene] [spp] [res]
      python tools/compare_backends.py --grad [scene] [spp] [res]

Renders the scene (or computes parameter gradients of a differentiable
render) on the default (TPU) backend and on CPU (subprocess) and
reports agreement statistics.
"""
import json
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

SNIPPET = """
import jax, sys, numpy as np
if sys.argv[1] != "default":
    jax.config.update("jax_platforms", sys.argv[1])
import jax.numpy as jnp
from pathtracing_tpu import scenes
from pathtracing_tpu.core.rng import SamplerConfig
from pathtracing_tpu.integrators.path import RenderConfig
from pathtracing_tpu.integrators.render import render_image

mode = sys.argv[6]
scene, cam, meta = scenes.SCENES[sys.argv[2]](
    resolution=(int(sys.argv[4]), int(sys.argv[4])))
spp = int(sys.argv[3])
x = max(1, int(np.sqrt(spp)))
cfg = RenderConfig(spp=spp, max_depth=5,
                   differentiable=(mode == "grad"),
                   sampler=SamplerConfig(x_samples=x,
                                         y_samples=max(1, spp // x),
                                         seed=7))
if mode == "grad":
    # d(sum of pixels)/d(material base colors): the parameter-gradient
    # vector every inverse-rendering step consumes
    from pathtracing_tpu.integrators.render import render_tile
    from pathtracing_tpu.sensor import film as fm
    res = int(sys.argv[4])
    pixel_idx = jnp.arange(res * res, dtype=jnp.int32)
    film0 = fm.new_film(cam["resolution"])

    def loss(base):
        sc = dict(scene, mat_base=base)
        f = render_tile(sc, cam, meta, cfg, film0, pixel_idx, spp, 0,
                        rows=res, row0=jnp.asarray(0, jnp.int32))
        return jnp.sum(f["rgb"])

    out = np.asarray(jax.grad(loss)(scene["mat_base"]))
else:
    out = np.asarray(render_image(scene, cam, meta, cfg))
np.save(sys.argv[5], out)
"""


def render_on(platform, scene, spp, res, out, mode):
    cp = subprocess.run([sys.executable, "-c", SNIPPET, platform, scene,
                         str(spp), str(res), str(out), mode],
                        capture_output=True, text=True,
                        cwd=Path(__file__).resolve().parent.parent)
    if cp.returncode != 0:
        sys.stderr.write(cp.stderr[-3000:])
        raise SystemExit(f"{platform} {mode} failed")


def main():
    args = sys.argv[1:]
    mode = "render"
    if args and args[0] == "--grad":
        mode = "grad"
        args = args[1:]
    scene = args[0] if len(args) > 0 else "cornell"
    spp = int(args[1]) if len(args) > 1 else 32
    res = int(args[2]) if len(args) > 2 else 64
    with tempfile.TemporaryDirectory() as td:
        a, b = Path(td) / "tpu.npy", Path(td) / "cpu.npy"
        render_on("default", scene, spp, res, a, mode)  # default accel
        render_on("cpu", scene, spp, res, b, mode)
        tpu, cpu = np.load(a), np.load(b)
    diff = np.abs(tpu - cpu)
    # image pixels live on an absolute O(1) radiance scale; gradients
    # need a scale-aware floor (their magnitude depends on the scene)
    floor = 1e-3 if mode == "render" else 1e-3 * max(np.abs(cpu).max(),
                                                     1e-9)
    rel = diff / np.maximum(np.abs(cpu), floor)
    print(json.dumps(dict(
        mode=mode, scene=scene, spp=spp, res=res,
        mean_tpu=float(tpu.mean()), mean_cpu=float(cpu.mean()),
        mean_rel_err=float(rel.mean()),
        p99_rel_err=float(np.quantile(rel, 0.99)),
        frac_allclose_1pct=float((rel < 0.01).mean()),
        frac_allclose_5pct=float((rel < 0.05).mean()),
        max_abs=float(diff.max()))))


if __name__ == "__main__":
    main()
