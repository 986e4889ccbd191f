"""M7 tooling: checkpoint/resume, adaptive sampling, CLI, profiler."""
import json
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

from pathtracing_tpu import scenes
from pathtracing_tpu.integrators.path import RenderConfig
from pathtracing_tpu.integrators.render import render
from pathtracing_tpu.utils.checkpoint import (save_checkpoint,
                                              load_checkpoint,
                                              render_with_checkpoints)
from pathtracing_tpu.utils.adaptive import (welford_init, welford_add,
                                            relative_variance,
                                            render_adaptive)


def test_checkpoint_resume_bit_identical(tmp_path):
    scene, cam, meta = scenes.furnace(resolution=(16, 16))
    cfg = RenderConfig(spp=8, max_depth=3)
    straight = render(scene, cam, meta, cfg, spp=8)

    ckpt = tmp_path / "ck.npz"
    # render 4, "crash", resume 4 more
    f1 = render_with_checkpoints(scene, cam, meta, cfg, 4, ckpt, every=2)
    f2 = render_with_checkpoints(scene, cam, meta, cfg, 8, ckpt, every=2)
    np.testing.assert_array_equal(np.asarray(f2["rgb"]),
                                  np.asarray(straight["rgb"]))
    np.testing.assert_array_equal(np.asarray(f2["weight"]),
                                  np.asarray(straight["weight"]))


def test_welford_matches_numpy():
    rng = np.random.default_rng(0)
    xs = rng.uniform(0, 1, (20, 5, 3)).astype(np.float32)
    st = welford_init(5)
    mask = jnp.ones((5,), bool)
    for x in xs:
        st = welford_add(st, jnp.asarray(x), mask)
    np.testing.assert_allclose(np.asarray(st["mean"]), xs.mean(0),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st["m2"]) / (len(xs) - 1),
                               xs.var(0, ddof=1), rtol=1e-4)
    rel = np.asarray(relative_variance(st))
    assert rel.shape == (5,) and np.isfinite(rel).all()


def test_adaptive_render_converges():
    scene, cam, meta = scenes.furnace(resolution=(8, 8))
    cfg = RenderConfig(spp=4, max_depth=2)
    film, stats = render_adaptive(scene, cam, meta, cfg, base_spp=4,
                                  target=1.5, max_factor=8)
    assert stats["mean_spp"] >= 4
    img = np.asarray(film["rgb"] / np.maximum(
        np.asarray(film["weight"])[:, None], 1e-12))
    assert np.isfinite(img).all()


def test_adaptive_saves_compute():
    """Converged pixels must stop being traced (the reference's per-pixel
    early-out, Integrators.cpp:59-87): total traced samples come in under
    the uniform-spp equivalent once most of the frame converges."""
    scene, cam, meta = scenes.cornell_box(resolution=(24, 24))
    cfg = RenderConfig(spp=4, max_depth=3)
    film, stats = render_adaptive(scene, cam, meta, cfg, base_spp=4,
                                  target=1.5, max_factor=8,
                                  bucket_floor=16)
    npix = 24 * 24
    uniform_equiv = npix * int(stats["spp_map"].max())
    assert stats["traced_samples"] < uniform_equiv, \
        (stats["traced_samples"], uniform_equiv)
    # and the estimator is still unbiased-looking: furnace == albedo-ish
    img = np.asarray(film["rgb"] / np.maximum(
        np.asarray(film["weight"])[:, None], 1e-12))
    assert np.isfinite(img).all()


def test_adaptive_with_regeneration_matches():
    """Adaptive + ray regeneration: each active-pixel bucket drains as a
    (pixel x base_spp) queue.  Per-sample values match the wave form, so
    the Welford stop decisions — and the final film — are identical."""
    import dataclasses
    from pathtracing_tpu.sensor.film import finalize
    scene, cam, meta = scenes.cornell_box(resolution=(24, 24))
    cfg = RenderConfig(spp=4, max_depth=3, rays_per_batch=256)
    f0, s0 = render_adaptive(scene, cam, meta, cfg, base_spp=4,
                             target=1.5, max_factor=4, bucket_floor=64)
    f1, s1 = render_adaptive(scene, cam, meta,
                             dataclasses.replace(cfg, regenerate=True),
                             base_spp=4, target=1.5, max_factor=4,
                             bucket_floor=64)
    assert s0["mean_spp"] == s1["mean_spp"]
    np.testing.assert_allclose(np.asarray(finalize(f1)),
                               np.asarray(finalize(f0)),
                               atol=1e-5, rtol=1e-5)


def test_cli_model_import_uses_pallas_kernel(tmp_path):
    """--accel defaults to auto, so a >4K-tri imported model must reach
    the production Pallas kernel (round-1 verdict: the CLI topped out at
    the slow XLA wide-node backend for imported models)."""
    side = 50                      # (side-1)^2*2 = 4802 tris > 4096
    obj = tmp_path / "grid.obj"
    with obj.open("w") as f:
        for i in range(side):
            for j in range(side):
                f.write(f"v {i * 0.1} 0.0 {j * 0.1}\n")
        for i in range(side - 1):
            for j in range(side - 1):
                a = i * side + j + 1
                b = a + 1
                c = a + side
                d = c + 1
                f.write(f"f {a} {b} {c}\nf {b} {d} {c}\n")
    out = tmp_path / "img.png"
    cp = subprocess.run(
        [sys.executable, "-m", "pathtracing_tpu", "render",
         "--model", str(obj), "--resolution", "16", "16",
         "--spp", "1", "--max-depth", "2", "--env-light", "1.0",
         "--look-from", "2.5,3,-2", "--look-at", "2.5,0,2.5",
         "--out", str(out)],
        capture_output=True, text=True, timeout=560,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert cp.returncode == 0, cp.stderr[-2000:]
    assert "accel=pallas" in cp.stderr, cp.stderr[-2000:]
    assert out.exists()


def test_cli_render_smoke(tmp_path):
    out = tmp_path / "img.png"
    cp = subprocess.run(
        [sys.executable, "-m", "pathtracing_tpu", "render",
         "--scene", "furnace", "--resolution", "32", "32",
         "--spp", "2", "--max-depth", "2", "--out", str(out)],
        capture_output=True, text=True, timeout=560,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert cp.returncode == 0, cp.stderr[-2000:]
    assert out.exists()
    # metrics line is JSON (may share a tty line with \r progress)
    line = [l for l in cp.stderr.splitlines()
            if '"samples_per_s"' in l][-1]
    m = json.loads(line[line.index("{"):])
    assert m["samples_per_s"] > 0
