"""Scene-compile cache: the assbin analog.

The reference auto-exports a serialized `.assbin` next to every imported
model so later runs skip Assimp postprocessing (Model.cpp:29-35,62-64).
Here the entire *compiled* scene — flattened SoA arrays including the built
BVH — round-trips through one .npz, so re-rendering a big scene skips both
parsing and the SAH build.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ..scene.types import SceneMeta

_FORMAT_VERSION = 5   # v2: per-env-light tables (light_env_slot)
                      # v5: alpha micro-mask rows in pka_* tables
                      #     (meta.alpha_cull_mask; scene/alphamask.py)
                      # v4: two-level group rows embed child boxes in
                      #     pk_tri (pk_l2box gone); tri_pack; pk_sblk_*
                      # v3: degenerate far-point empty AABBs in the
                      # two-level kernel tables — v2 caches hold the
                      # +-inf empties that OOB-DMA'd the TPU kernel


class StaleCacheError(RuntimeError):
    """Cache file uses an older format; callers should rebuild."""


def save_scene(path, scene, cam, meta: SceneMeta):
    """Serialize (scene arrays, camera, meta) to one .npz file."""
    path = Path(path)
    blobs = {f"scene/{k}": np.asarray(v) for k, v in scene.items()}
    for k, v in cam.items():
        if k == "resolution":
            continue
        blobs[f"cam/{k}"] = np.asarray(v)
    header = dict(version=_FORMAT_VERSION,
                  meta=dataclasses.asdict(meta),
                  resolution=list(cam["resolution"]))
    blobs["header"] = np.frombuffer(
        json.dumps(header).encode("utf-8"), np.uint8)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **blobs)


def load_scene(path):
    """Load a scene cache. Returns (scene, cam, meta)."""
    z = np.load(Path(path), allow_pickle=False)
    header = json.loads(bytes(z["header"]).decode("utf-8"))
    if header["version"] != _FORMAT_VERSION:
        raise StaleCacheError(
            f"scene cache {path} is format v{header['version']}, "
            f"current is v{_FORMAT_VERSION}; rebuild it")
    scene = {k.split("/", 1)[1]: jnp.asarray(z[k])
             for k in z.files if k.startswith("scene/")}
    cam = {k.split("/", 1)[1]: jnp.asarray(z[k])
           for k in z.files if k.startswith("cam/")}
    cam["resolution"] = tuple(header["resolution"])
    meta_kw = header["meta"]
    # json round-trips tuples as lists; SceneMeta must stay hashable
    # (it rides as a jit static argument)
    for k, v in meta_kw.items():
        if isinstance(v, list):
            meta_kw[k] = tuple(v)
    meta = SceneMeta(**meta_kw)
    return scene, cam, meta
