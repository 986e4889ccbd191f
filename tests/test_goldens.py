"""Golden-image regression tests (SURVEY.md §4 tier 3).

The reference's de-facto golden is an eyeballed JPG (README.md:9-12);
here tiny fixed-seed renders are pinned to committed arrays.  Goldens are
generated ON THE CPU BACKEND (tests always run there, conftest.py) so the
comparison is to float tolerance; regenerate with
`python tests/test_goldens.py regen` after INTENDED estimator changes."""
import sys
from pathlib import Path

import numpy as np

from pathtracing_tpu import scenes
from pathtracing_tpu.core.rng import SamplerConfig
from pathtracing_tpu.integrators.path import RenderConfig
from pathtracing_tpu.integrators.render import render_image

GOLDEN_DIR = Path(__file__).parent / "goldens"

CASES = {
    "cornell": (lambda: scenes.cornell_box(resolution=(32, 32)),
                RenderConfig(spp=8, max_depth=4, integrator="path",
                             sampler=SamplerConfig(x_samples=4, y_samples=2,
                                                   seed=11))),
    "furnace": (lambda: scenes.furnace(resolution=(16, 16)),
                RenderConfig(spp=8, max_depth=3, integrator="simple",
                             sampler=SamplerConfig(x_samples=4, y_samples=2,
                                                   seed=11))),
    "medium": (lambda: scenes.spheres_medium(resolution=(24, 24)),
               RenderConfig(spp=4, max_depth=4, integrator="volpath",
                            sampler=SamplerConfig(x_samples=2, y_samples=2,
                                                  seed=11))),
    "textured": (lambda: scenes.textured_quad(resolution=(24, 24)),
                 RenderConfig(spp=4, max_depth=3, integrator="path",
                              sampler=SamplerConfig(x_samples=2, y_samples=2,
                                                    seed=11))),
    # the reference's de-facto BSDF regression chart (MatTest,
    # main.cpp:44-162): roughness x metallic sphere grid
    "mat_test": (lambda: scenes.mat_test(resolution=(36, 22), rows=4,
                                         cols=6),
                 RenderConfig(spp=4, max_depth=3, integrator="path",
                              sampler=SamplerConfig(x_samples=2, y_samples=2,
                                                    seed=11))),
}


def _render(name):
    build, cfg = CASES[name]
    scene, cam, meta = build()
    return np.asarray(render_image(scene, cam, meta, cfg))


def _golden_path(name):
    return GOLDEN_DIR / f"{name}.npy"


def test_goldens():
    missing = [n for n in CASES if not _golden_path(n).exists()]
    assert not missing, (
        f"goldens missing: {missing}; run `python tests/test_goldens.py "
        f"regen`")
    for name in CASES:
        got = _render(name)
        want = np.load(_golden_path(name))
        np.testing.assert_allclose(
            got, want, rtol=2e-4, atol=2e-5,
            err_msg=f"golden mismatch for {name!r} — if the estimator "
                    f"change is intended, regenerate goldens")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        import jax
        jax.config.update("jax_platforms", "cpu")
        GOLDEN_DIR.mkdir(exist_ok=True)
        for name in CASES:
            img = _render(name)
            np.save(_golden_path(name), img)
            print(f"wrote {name}: mean={img.mean():.4f}")
