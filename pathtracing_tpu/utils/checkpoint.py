"""Render checkpoint / resume.

The reference has NO render-state persistence — a mid-render crash loses
everything because the film only materializes at Write* (SURVEY.md §5).
Here the film accumulator plus the RNG position (sample offset and seed)
round-trip through one .npz every K sample waves; because the sampler is a
pure function of (pixel, sample_index, dim, seed), resuming from
(film, sample_offset) reproduces bit-identical output vs an uninterrupted
render.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp


def save_checkpoint(path, film, samples_done: int, seed: int,
                    resolution, extra: dict | None = None):
    path = Path(path)
    header = dict(samples_done=int(samples_done), seed=int(seed),
                  resolution=list(resolution), extra=extra or {})
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        path, rgb=np.asarray(film["rgb"]),
        weight=np.asarray(film["weight"]),
        header=np.frombuffer(json.dumps(header).encode(), np.uint8))


def load_checkpoint(path):
    """Returns (film, samples_done, seed, resolution, extra)."""
    z = np.load(Path(path))
    header = json.loads(bytes(z["header"]).decode())
    film = dict(rgb=jnp.asarray(z["rgb"]), weight=jnp.asarray(z["weight"]))
    return (film, header["samples_done"], header["seed"],
            tuple(header["resolution"]), header["extra"])


def render_with_checkpoints(scene, cam, meta, cfg, spp: int,
                            checkpoint_path, every: int = 16,
                            progress=None):
    """Render `spp` samples, writing a checkpoint every `every` waves and
    resuming from an existing checkpoint if present."""
    from ..integrators.render import render
    from ..sensor.film import new_film

    done = 0
    film = None
    path = Path(checkpoint_path)
    if path.exists():
        film, done, seed, res, _ = load_checkpoint(path)
        assert res == tuple(cam["resolution"]), (res, cam["resolution"])
        assert seed == cfg.sampler.seed
    if film is None:
        film = new_film(cam["resolution"])
    while done < spp:
        step = min(every, spp - done)
        film = render(scene, cam, meta, cfg, film=film, spp=step,
                      sample_offset=done)
        done += step
        save_checkpoint(path, film, done, cfg.sampler.seed,
                        cam["resolution"])
        if progress:
            progress(done, spp)
    return film
