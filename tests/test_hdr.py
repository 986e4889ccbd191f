"""Radiance RGBE (.hdr) codec + env-light-from-file path."""
import math

import numpy as np

from pathtracing_tpu.io.hdr import read_hdr, write_hdr


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 8, (64, 96, 3)) ** 2).astype(np.float32)
    p = tmp_path / "t.hdr"
    write_hdr(p, img)
    back = read_hdr(p)
    assert back.shape == img.shape
    # RGBE shares one exponent per pixel: error is bounded relative to the
    # pixel's max channel (1/256 quantization), not per channel
    pmax = img.max(-1, keepdims=True)
    err = np.abs(back - img) / np.maximum(pmax, 1e-6)
    assert err.max() < 1.0 / 128


def test_hdr_flat_narrow(tmp_path):
    """Width <8 falls back to flat RGBE."""
    img = np.linspace(0, 4, 4 * 4 * 3).reshape(4, 4, 3).astype(np.float32)
    p = tmp_path / "n.hdr"
    write_hdr(p, img)
    back = read_hdr(p)
    pmax = np.maximum(img.max(-1, keepdims=True), 1e-6)
    assert (np.abs(back - img) / pmax).max() < 1.0 / 128


def test_env_light_from_hdr(tmp_path):
    from pathtracing_tpu.scene.builder import SceneBuilder
    rng = np.random.default_rng(1)
    sky = rng.uniform(0.1, 3.0, (32, 64, 3)).astype(np.float32)
    p = tmp_path / "sky.hdr"
    write_hdr(p, sky)
    b = SceneBuilder()
    b.add_env_light_from_file(p)
    b.add_sphere([0, 0, 0], 1.0, material=b.add_diffuse((0.5, 0.5, 0.5)))
    b.set_camera([0, 0, -4], [0, 0, 0], math.radians(30), (8, 8))
    scene, cam, meta = b.build()
    assert meta.n_inf == 1
    assert float(scene["env_total"][0]) > 0
