"""Measure the alpha micro-mask resolution ceiling (round-6 gap 3).

The shadow pass's restart chain only runs for rays whose nearest
non-transparent alpha candidate lands in a MIXED mask cell
(scene/alphamask.py).  Cards classify ~50% mixed at 8x8 — this probe
asks how much a finer grid would actually buy BEFORE anyone builds the
wider table format (a 16x16 plane needs 256 bits = 8 extra f32 rows, a
~25% triangle-table DMA growth):

  for the faithful scene's leaf cutout texture + card uv layouts, take
  uniform hits over the card triangles and report
  P(hit cell classified mixed) at 8x8 / 16x16 / 32x32, using the SAME
  conservative texel-pyramid classifier the build uses.

Pure CPU/NumPy — no TPU needed.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pathtracing_tpu.scene.alphamask import _Pyramid, _classify  # noqa: E402


def leaf_texture(k=256):
    # the faithful scene's cutout, verbatim (scenes.py:_sm_textures)
    u, v = np.meshgrid((np.arange(k) + 0.5) / k, (np.arange(k) + 0.5) / k)
    r2 = ((u - 0.5) / 0.38) ** 2 + ((v - 0.5) / 0.47) ** 2
    edge = 1.0 + 0.08 * np.sin(np.arctan2(v - 0.5, u - 0.5) * 14.0)
    return (r2 < edge).astype(np.float32)


def mixed_fraction(alpha, cells, n_samp=200_000, seed=0):
    """P(uniform barycentric hit on a full-texture card lands in a cell
    the pyramid classifies mixed) at `cells` x `cells`, plus the
    transparent/opaque split."""
    pyr = _Pyramid(alpha)
    ci = np.arange(cells)
    gx, gy = np.meshgrid(ci, ci, indexing="xy")
    gx = gx.reshape(-1)[None, :]
    gy = gy.reshape(-1)[None, :]
    pad = 0.05  # _CELL_PAD; full-texture cards have exact affine maps
    tx0 = (gx - pad) / cells
    tx1 = (gx + 1 + pad) / cells
    ty0 = (gy - pad) / cells
    ty1 = (gy + 1 + pad) / cells
    x_lo = np.floor(tx0 * pyr.w - 0.5).astype(np.int64)
    x_hi = np.floor(tx1 * pyr.w - 0.5).astype(np.int64) + 1
    y_lo = np.floor(ty0 * pyr.h - 0.5).astype(np.int64)
    y_hi = np.floor(ty1 * pyr.h - 0.5).astype(np.int64) + 1
    a_lo, a_hi = pyr.query(x_lo, x_hi, y_lo, y_hi)
    solid_lo, solid_hi = _classify(a_lo, a_hi, mode=2, cutoff=0.5)
    opaque = solid_lo.reshape(cells, cells)
    mixed = (solid_hi & ~solid_lo).reshape(cells, cells)

    # uniform hits over the two card triangles = uniform over the unit
    # square (the two uv layouts tile it)
    rng = np.random.default_rng(seed)
    u = rng.random(n_samp)
    v = rng.random(n_samp)
    cu = np.minimum((u * cells).astype(np.int64), cells - 1)
    cv = np.minimum((v * cells).astype(np.int64), cells - 1)
    p_mixed = float(mixed[cv, cu].mean())
    p_opaque = float(opaque[cv, cu].mean())
    return p_mixed, p_opaque, 1.0 - p_mixed - p_opaque


def main():
    alpha = leaf_texture()
    print(f"leaf cutout 256^2, alpha mean {alpha.mean():.3f}")
    base = None
    for cells in (8, 16, 32, 64):
        m, o, t = mixed_fraction(alpha, cells)
        note = ""
        if base is None:
            base = m
        else:
            note = (f"  (chain-seed ceiling vs 8x8: "
                    f"{(1 - m / base) * 100:.0f}% fewer)")
        bits = cells * cells * 2
        print(f"{cells:3d}x{cells:<3d} mixed {m:.3f}  opaque {o:.3f}  "
              f"transparent {t:.3f}  [{bits} mask bits]{note}")


if __name__ == "__main__":
    main()
