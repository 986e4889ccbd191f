"""Ray-sort strategy microbench.

The Morton coherence sort runs before every Pallas traversal; XLA's
jnp.argsort on this toolchain is ~50x off memory bound, so this tool
compares alternatives at the production size (64K rays):

  argsort32      jnp.argsort of the 24-bit morton key (current)
  sortpair       jax.lax.sort of (key, iota) pairs
  radix8x3       stable counting sort, 3x8-bit passes via one-hot
                 cumsums + scatter
  radix8x2       2x8-bit passes over a coarsened 16-bit key

Usage: python tools/bench_sort.py [n]
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def radix_perm(key, passes):
    n = key.shape[0]
    perm = jnp.arange(n, dtype=jnp.int32)
    buckets = jnp.arange(256, dtype=jnp.uint32)
    for shift in passes:
        k = ((key[perm] >> shift) & jnp.uint32(0xFF))
        onehot = (k[:, None] == buckets[None, :]).astype(jnp.int32)
        ranks = jnp.cumsum(onehot, axis=0)          # inclusive
        counts = ranks[-1]
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
        rank = jnp.take_along_axis(ranks, k[:, None].astype(jnp.int32),
                                   1)[:, 0] - 1
        pos = starts[k.astype(jnp.int32)] + rank
        perm = jnp.zeros_like(perm).at[pos].set(perm)
    return perm


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 24, n).astype(np.uint32))

    def bench(f, label):
        g = jax.jit(f)
        jax.device_get(g(key))
        t0 = time.perf_counter()
        for _ in range(5):
            jax.device_get(g(key))
        dt = (time.perf_counter() - t0) / 5
        print(f"{label:12s} {dt*1e3:8.2f} ms")
        return g

    base = bench(lambda k: k + 1, "baseline")
    a = bench(lambda k: jnp.argsort(k), "argsort32")
    b = bench(lambda k: jax.lax.sort(
        (k, jnp.arange(n, dtype=jnp.int32)), num_keys=1)[1], "sortpair")
    c = bench(lambda k: radix_perm(k, (0, 8, 16)), "radix8x3")
    d = bench(lambda k: radix_perm(k >> 8, (0, 8)), "radix8x2")
    # correctness: stable radix must order keys identically to argsort
    pa = np.asarray(jax.jit(lambda k: jnp.argsort(k, stable=True))(key))
    pc = np.asarray(jax.jit(lambda k: radix_perm(k, (0, 8, 16)))(key))
    ka = np.asarray(key)[pa]
    kc = np.asarray(key)[pc]
    assert (ka == kc).all(), "radix perm does not sort"
    print("radix8x3 sorts correctly")


if __name__ == "__main__":
    main()
