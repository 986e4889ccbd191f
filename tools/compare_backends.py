"""Cross-backend image comparison: TPU render vs CPU reference.

The BASELINE north star asks for images allclose against a CPU reference
at equal sample counts.  This framework IS its own CPU reference: the
same deterministic counter-based sampler runs on both backends, so the
only differences are platform numerics — and the discrete decisions
(Russian roulette, lobe picks) that sit on f32 thresholds and can flip.

Run:  python tools/compare_backends.py [scene] [spp] [res]
Renders the scene on the default (TPU) backend and on CPU (subprocess)
and reports per-pixel agreement statistics.
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
from pathtracing_tpu import scenes
from pathtracing_tpu.core.rng import SamplerConfig
from pathtracing_tpu.integrators.path import RenderConfig
from pathtracing_tpu.integrators.render import render_image

scene, cam, meta = scenes.SCENES[sys.argv[2]](
    resolution=(int(sys.argv[4]), int(sys.argv[4])))
spp = int(sys.argv[3])
x = max(1, int(np.sqrt(spp)))
cfg = RenderConfig(spp=spp, max_depth=5,
                   sampler=SamplerConfig(x_samples=x,
                                         y_samples=max(1, spp // x),
                                         seed=7))
img = np.asarray(render_image(scene, cam, meta, cfg))
np.save(sys.argv[5], img)
"""


def render_on(platform, scene, spp, res, out):
    cp = subprocess.run([sys.executable, "-c", SNIPPET, platform, scene,
                         str(spp), str(res), str(out)],
                        capture_output=True, text=True,
                        cwd=Path(__file__).resolve().parent.parent)
    if cp.returncode != 0:
        sys.stderr.write(cp.stderr[-3000:])
        raise SystemExit(f"{platform} render failed")


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    with tempfile.TemporaryDirectory() as td:
        a, b = Path(td) / "tpu.npy", Path(td) / "cpu.npy"
        render_on("default", scene, spp, res, a)  # default accelerator
        render_on("cpu", scene, spp, res, b)
        tpu, cpu = np.load(a), np.load(b)
    diff = np.abs(tpu - cpu)
    denom = np.maximum(np.abs(cpu), 1e-3)
    rel = diff / denom
    print(json.dumps(dict(
        scene=scene, spp=spp, res=res,
        mean_tpu=float(tpu.mean()), mean_cpu=float(cpu.mean()),
        mean_rel_err=float(rel.mean()),
        p99_rel_err=float(np.quantile(rel, 0.99)),
        frac_allclose_1pct=float((rel < 0.01).mean()),
        frac_allclose_5pct=float((rel < 0.05).mean()),
        max_abs=float(diff.max()))))


if __name__ == "__main__":
    main()
