"""Counter-based RNG and samplers.

The reference uses thread_local pcg32 seeded from random_device
(Random.hpp:10-44) — i.e. its random streams are NOT reproducible between
runs.  The TPU-native replacement is a stateless, counter-based design:
every random number is a pure function of (pixel, sample_index, dimension,
seed), so forward renders are bit-reproducible across devices and the
backward pass can replay the exact sampling decisions (path replay).

The stratified sampler reproduces the semantics of the reference
StratifiedSampler (Sampler.hpp:73-151): per-dimension stratum selected by
a Kensler in-place permutation (Util.hpp:45-73) keyed on Hash(px, py, dim),
plus in-stratum jitter.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

U32 = jnp.uint32


def _u32(x):
    if isinstance(x, int):
        return jnp.asarray(np.uint32(x & 0xFFFFFFFF))
    return jnp.asarray(x).astype(U32)


def mix32(x):
    """32-bit finalizer (lowbias32 by Chris Wellons): the 32-bit analog of
    the reference's MixBits (Util.hpp:131-138)."""
    x = _u32(x)
    x ^= x >> 16
    x *= _u32(0x7FEB352D)
    x ^= x >> 15
    x *= _u32(0x846CA68B)
    x ^= x >> 16
    return x


def hash_u32(*args):
    """Hash a sequence of u32-coercible values into one u32 stream key.

    Plays the role of the variadic MurmurHash-based Hash(...) at
    Util.hpp:160-168 (we use a 32-bit chain: TPUs have no u64)."""
    h = _u32(0x9E3779B9)
    for a in args:
        h = mix32(h ^ _u32(a) ^ (h << 6) ^ (h >> 2))
    return h


def uniform_from_u32(h):
    """u32 -> float32 in [0, 1): take the top 24 bits."""
    return (h >> 8).astype(jnp.float32) * jnp.float32(2.0 ** -24)


def hash_float(*args):
    return uniform_from_u32(hash_u32(*args))


def permutation_element(i, l: int, p):
    """Kensler-style in-place permutation (Util.hpp:45-73), vectorized.

    `i`: u32 array of indices; `l`: static permutation size; `p`: u32 seed
    array (broadcastable to i).  The rejection loop runs until every lane
    lands inside [0, l); each round at least halves out-of-range mass so a
    bounded while_loop converges fast.
    """
    l_u = _u32(l)
    w = l_u - _u32(1)
    for s in (1, 2, 4, 8, 16):
        w = w | (w >> s)
    i = _u32(i)
    p = _u32(p)
    shape = jnp.broadcast_shapes(jnp.shape(i), jnp.shape(p))
    i = jnp.broadcast_to(i, shape)
    p = jnp.broadcast_to(p, shape)

    def round_fn(i):
        i ^= p
        i *= _u32(0xE170893D)
        i ^= p >> 16
        i ^= (i & w) >> 4
        i ^= p >> 8
        i *= _u32(0x0929EB3F)
        i ^= p >> 23
        i ^= (i & w) >> 1
        i *= _u32(1) | (p >> 27)
        i *= _u32(0x6935FA69)
        i ^= (i & w) >> 11
        i *= _u32(0x74DCB303)
        i ^= (i & w) >> 2
        i *= _u32(0x9E501CC3)
        i ^= (i & w) >> 2
        i *= _u32(0xC860A3DF)
        i &= w
        i ^= i >> 5
        return i

    # do-while: first round applies unconditionally, then lanes still >= l
    # keep re-rounding until all land in range.
    i = round_fn(i)
    if l & (l - 1) != 0:
        # non-power-of-two strata reject ~((w+1-l)/(w+1)) per round; the
        # while_loop runs until the SLOWEST lane lands in range
        i = jax.lax.while_loop(
            lambda x: jnp.any(x >= l_u),
            lambda x: jnp.where(x >= l_u, round_fn(x), x),
            i,
        )
    # else: w == l-1 and (i & w) < l always — one round suffices, and
    # skipping the while_loop removes a per-call sync (measured ~25% of
    # the per-bounce RNG cost at 64K lanes)
    return (i + p) % l_u


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampler description (hashable; safe as a jit static arg).

    kind: "uniform" | "stratified"
    x_samples/y_samples: stratification grid; spp = x*y (Sampler.hpp:77-84)
    seed: global stream seed (the reference's random_device analog —
          fixed for reproducibility).
    """
    kind: str = "stratified"
    x_samples: int = 4
    y_samples: int = 4
    seed: int = 0

    @property
    def spp(self) -> int:
        return self.x_samples * self.y_samples


def _jitter(cfg: SamplerConfig, px, py, sample_idx, dim, lane):
    """The in-stratum jitter: reference uses a free-running pcg float
    (Sampler.hpp:96,107-108); ours is counter-based on all coordinates."""
    return uniform_from_u32(
        hash_u32(px, py, sample_idx, dim, lane, cfg.seed ^ 0x5BF03635))


def sample_1d(cfg: SamplerConfig, px, py, sample_idx, dim):
    """Sampler::get1D (Sampler.hpp:93-97). `dim` may be traced."""
    if cfg.kind == "uniform":
        return _jitter(cfg, px, py, sample_idx, dim, 0)
    seed = hash_u32(px, py, dim, cfg.seed)
    stratum = permutation_element(sample_idx, cfg.spp, seed)
    u = _jitter(cfg, px, py, sample_idx, dim, 0)
    return (stratum.astype(jnp.float32) + u) / jnp.float32(cfg.spp)


def sample_2d(cfg: SamplerConfig, px, py, sample_idx, dim):
    """Sampler::get2D (Sampler.hpp:99-113): one stratum over the 2D grid,
    split into (sx, sy) cell + independent jitter per axis."""
    if cfg.kind == "uniform":
        return jnp.stack([
            _jitter(cfg, px, py, sample_idx, dim, 0),
            _jitter(cfg, px, py, sample_idx, dim, 1)], axis=-1)
    seed = hash_u32(px, py, dim, cfg.seed)
    stratum = permutation_element(sample_idx, cfg.spp, seed)
    sx = (stratum % _u32(cfg.x_samples)).astype(jnp.float32)
    sy = (stratum // _u32(cfg.x_samples)).astype(jnp.float32)
    dx = _jitter(cfg, px, py, sample_idx, dim, 0)
    dy = _jitter(cfg, px, py, sample_idx, dim, 1)
    return jnp.stack([(sx + dx) / cfg.x_samples,
                      (sy + dy) / cfg.y_samples], axis=-1)
