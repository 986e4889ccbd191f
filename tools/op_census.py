"""Op-level census of the compiled render pipeline (profiler fallback).

jax.profiler traces hang over the remote-TPU tunnel, so op-level
attribution comes from the compiled HLO instead: lower + compile the
one-wave render function, walk the optimized module, and bucket
instructions by opcode category (fusions are expanded so elementwise
work inside them is counted, tagged by the fusion kind).  On the axon
backend the text comes from the REMOTE TPU compiler — real fusion
decisions, real layout choices; on CPU it is still a faithful op census
of the traced program.

This complements tools/stage_census.py (wall-clock stage ablation):
census says WHAT the compiler built, stages say what it COSTS.

Usage: python tools/op_census.py [cornell|sanmiguel] [n_tris] [depth]
"""
from __future__ import annotations

import re
import sys
from collections import Counter

import jax
import jax.numpy as jnp

CATEGORIES = [
    ("fusion", re.compile(r"^fusion")),
    ("custom-call", re.compile(r"^custom-call")),
    ("sort", re.compile(r"^sort")),
    ("scatter", re.compile(r"^scatter")),
    ("gather", re.compile(r"^gather|^dynamic-slice")),
    ("dot", re.compile(r"^dot")),
    ("conv", re.compile(r"^convolution")),
    ("while", re.compile(r"^while")),
    ("reduce", re.compile(r"^reduce")),
    ("copy/convert", re.compile(r"^copy|^convert|^bitcast|^transpose|"
                                r"^reshape|^broadcast")),
]


def categorize(opcode: str) -> str:
    for name, rx in CATEGORIES:
        if rx.match(opcode):
            return name
    return "elementwise/other"


def census(hlo_text: str):
    """Count instructions by opcode category; returns (Counter, Counter)
    of (top-level entry ops, all ops incl. inside fusions/whiles)."""
    top = Counter()
    all_ops = Counter()
    in_entry = False
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r"ENTRY ", s)
        if m:
            in_entry = True
        if s.startswith("}"):
            in_entry = False
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = \S+ ([a-z\-]+)\(", s)
        if not m:
            continue
        op = m.group(1)
        all_ops[categorize(op)] += 1
        if in_entry:
            top[categorize(op)] += 1
    return top, all_ops


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    n_tris = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pathtracing_tpu import scenes
    from pathtracing_tpu.integrators.path import RenderConfig
    from pathtracing_tpu.integrators.render import render_tile
    from pathtracing_tpu.sensor.film import new_film

    if which == "cornell":
        scene, cam, meta = scenes.cornell_box(resolution=(512, 512))
    else:
        scene, cam, meta = scenes.sanmiguel_analog(resolution=(1920, 1080),
                                                   n_tris=n_tris)
    w, h = cam["resolution"]
    cfg = RenderConfig(spp=1, max_depth=depth, integrator="path",
                       rays_per_batch=1 << 16)
    n = 1 << 16
    pixel_idx = (h // 2) * w + jnp.arange(n, dtype=jnp.int32)
    film = new_film(cam["resolution"])

    def wave(scene, cam, film):
        return render_tile(scene, cam, meta, cfg, film, pixel_idx, 1, 0)

    print(f"lowering one wave: {which} depth={depth} "
          f"backend={jax.default_backend()}", flush=True)
    compiled = jax.jit(wave).lower(scene, cam, film).compile()
    texts = [m.to_string() for m in compiled.runtime_executable().hlo_modules()] \
        if hasattr(compiled, "runtime_executable") else [compiled.as_text()]
    text = "\n".join(texts)
    top, all_ops = census(text)
    total = sum(all_ops.values())
    print(f"{'category':20s} {'all ops':>8s} {'entry':>8s}")
    for cat, cnt in all_ops.most_common():
        print(f"{cat:20s} {cnt:8d} {top.get(cat, 0):8d}")
    print(f"{'TOTAL':20s} {total:8d} {sum(top.values()):8d}")
    # cost hints the compiler left behind (TPU backend emits these)
    for pat in ("bytes accessed", "flops"):
        hits = re.findall(rf'"{pat}":\s*"?([\d.e+]+)', text)
        if hits:
            print(f"sum {pat}: {sum(float(x) for x in hits):.3e}")


if __name__ == "__main__":
    main()
