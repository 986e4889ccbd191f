"""Texture pool: host-side packing + device-side vectorized evaluation.

Replaces the reference's Texture hierarchy (Texture.hpp:108-231) with a flat
texel pool in HBM plus a small typed table, so one gather-based kernel
evaluates any number of textures for a whole lane batch at once.

Layout:
  texels   [NT, 4] f32 — RGBA texel pool, linear space, row-major per image
  info_i   [K, 6] i32  — kind, offset, width, height, channels, child packed
  info_f   [K, 8] f32  — colorScale rgb, inv_scale u/v (checker), solid rgb

Kinds: 0 image (bilinear, repeat wrap, Texture.hpp:143-158)
       1 checker (two child textures, Texture.hpp:195-216)
       2 uv debug (Texture.hpp:218-224)
       3 solid color
Texture id -1 = "no texture" — callers fall back to material constants.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

KIND_IMAGE = 0
KIND_CHECKER = 1
KIND_UV = 2
KIND_SOLID = 3


def _srgb_to_linear_np(s):
    s = np.clip(s, 0.0, 1.0)
    return np.where(s <= 0.04045, s / 12.92, ((s + 0.055) / 1.055) ** 2.4)


class TexturePool:
    """Host-side accumulation of textures; pack() produces device arrays."""

    def __init__(self):
        self._texels = []          # list of [H*W,4] float32
        self._info_i = []
        self._info_f = []
        self._offset = 0

    def __len__(self):
        return len(self._info_i)

    def add_image(self, img: np.ndarray, srgb: bool = False,
                  color_scale=(1.0, 1.0, 1.0)) -> int:
        """img: [H,W,C] uint8 or float; C in {1,3,4}. srgb converts RGB
        channels to linear at pack time (the reference's sRGBLUT analog,
        Texture.hpp:26-34)."""
        img = np.asarray(img)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        img = img.astype(np.float32)
        if img.ndim == 2:
            img = img[..., None]
        h, w, c = img.shape
        rgba = np.ones((h, w, 4), np.float32)
        if c == 1:
            rgba[..., :3] = img
        else:
            rgba[..., :c] = img[..., :4]
        if srgb:
            rgba[..., :3] = _srgb_to_linear_np(rgba[..., :3])
        tid = len(self._info_i)
        self._texels.append(rgba.reshape(-1, 4))
        self._info_i.append([KIND_IMAGE, self._offset, w, h, c, 0])
        cs = np.asarray(color_scale, np.float32)
        self._info_f.append([cs[0], cs[1], cs[2], 0, 0, 0, 0, 0])
        self._offset += h * w
        return tid

    def add_solid(self, color, color_scale=(1.0, 1.0, 1.0)) -> int:
        tid = len(self._info_i)
        self._info_i.append([KIND_SOLID, 0, 0, 0, 3, 0])
        c = np.asarray(color, np.float32)
        cs = np.asarray(color_scale, np.float32)
        self._info_f.append([cs[0], cs[1], cs[2], 0, 0, c[0], c[1], c[2]])
        return tid

    def add_checker(self, tex_a: int, tex_b: int, uv_scale=(1.0, 1.0),
                    color_scale=(1.0, 1.0, 1.0)) -> int:
        tid = len(self._info_i)
        child = (tex_a & 0xFFFF) | ((tex_b & 0xFFFF) << 16)
        self._info_i.append([KIND_CHECKER, 0, 0, 0, 3, child])
        cs = np.asarray(color_scale, np.float32)
        self._info_f.append([cs[0], cs[1], cs[2],
                             1.0 / uv_scale[0], 1.0 / uv_scale[1], 0, 0, 0])
        return tid

    def add_uv_debug(self) -> int:
        tid = len(self._info_i)
        self._info_i.append([KIND_UV, 0, 0, 0, 3, 0])
        self._info_f.append([1, 1, 1, 0, 0, 0, 0, 0])
        return tid

    def pack(self):
        if self._texels:
            texels = np.concatenate(self._texels, axis=0)
        else:
            texels = np.ones((1, 4), np.float32)
        if not self._info_i:
            info_i = np.zeros((1, 6), np.int32)
            info_f = np.zeros((1, 8), np.float32)
        else:
            info_i = np.asarray(self._info_i, np.int32)
            info_f = np.asarray(self._info_f, np.float32)
        return dict(tex_texels=jnp.asarray(texels),
                    tex_info_i=jnp.asarray(info_i),
                    tex_info_f=jnp.asarray(info_f))


# ---------------------------------------------------------------------------
# Device-side evaluation
# ---------------------------------------------------------------------------

def _fetch_rgba(tex, offset, width, height, x, y):
    """Repeat-wrap texel fetch (Texture.hpp wrap_index)."""
    xw = jnp.mod(x, width)
    yw = jnp.mod(y, height)
    idx = offset + yw * width + xw
    return tex["tex_texels"][idx]


def _bilinear(tex, offset, width, height, uv):
    """Bilinear fetch at u*W-0.5 (Texture.hpp:143-158). Returns RGBA."""
    x = uv[..., 0] * width.astype(jnp.float32) - 0.5
    y = uv[..., 1] * height.astype(jnp.float32) - 0.5
    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    dx = (x - xi.astype(jnp.float32))[..., None]
    dy = (y - yi.astype(jnp.float32))[..., None]
    a = _fetch_rgba(tex, offset, width, height, xi, yi)
    b = _fetch_rgba(tex, offset, width, height, xi + 1, yi)
    c = _fetch_rgba(tex, offset, width, height, xi, yi + 1)
    d = _fetch_rgba(tex, offset, width, height, xi + 1, yi + 1)
    return ((1 - dx) * (1 - dy) * a + dx * (1 - dy) * b
            + (1 - dx) * dy * c + dx * dy * d)


def _eval_leaf(tex, ids, uv):
    """Evaluate non-checker kinds for a batch of texture ids. Returns RGBA
    *before* colorScale."""
    ids_c = jnp.clip(ids, 0, tex["tex_info_i"].shape[0] - 1)
    info_i = tex["tex_info_i"][ids_c]
    info_f = tex["tex_info_f"][ids_c]
    kind = info_i[..., 0]
    img = _bilinear(tex, info_i[..., 1], jnp.maximum(info_i[..., 2], 1),
                    jnp.maximum(info_i[..., 3], 1), uv)
    solid = jnp.concatenate([info_f[..., 5:8],
                             jnp.ones_like(info_f[..., :1])], axis=-1)
    uvdbg = jnp.stack([uv[..., 0], uv[..., 1],
                       jnp.zeros_like(uv[..., 0]),
                       jnp.ones_like(uv[..., 0])], axis=-1)
    out = jnp.where((kind == KIND_SOLID)[..., None], solid,
                    jnp.where((kind == KIND_UV)[..., None], uvdbg, img))
    return out, info_f[..., 0:3], info_i, info_f


def texture_eval_rgba(tex, ids, uv):
    """Texture::Evaluate + alpha for a lane batch; ids may be -1 (callers
    mask). Handles one level of checker nesting."""
    rgba, cscale, info_i, info_f = _eval_leaf(tex, ids, uv)
    kind = info_i[..., 0]
    is_checker = kind == KIND_CHECKER
    # checker child selection (Texture.hpp:203-207)
    inv = info_f[..., 3:5]
    cell = jnp.floor(uv * inv).astype(jnp.int32)
    even = ((cell[..., 0] + cell[..., 1]) % 2) == 0
    child = info_i[..., 5]
    child_id = jnp.where(even, child & 0xFFFF, (child >> 16) & 0xFFFF)
    child_rgba, child_scale, _, _ = _eval_leaf(tex, child_id, uv)
    rgba = jnp.where(is_checker[..., None],
                     child_rgba * jnp.concatenate(
                         [child_scale, jnp.ones_like(child_scale[..., :1])],
                         axis=-1),
                     rgba)
    rgb = rgba[..., :3] * cscale
    # alpha defaults to 1 for <4-channel textures (Texture.cpp:47-48)
    channels = info_i[..., 4]
    alpha = jnp.where(channels == 4, rgba[..., 3], 1.0)
    return rgb, alpha


def texture_eval(tex, ids, uv):
    return texture_eval_rgba(tex, ids, uv)[0]


def texture_alpha(tex, ids, uv):
    return texture_eval_rgba(tex, ids, uv)[1]
