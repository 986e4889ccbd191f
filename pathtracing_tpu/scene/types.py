"""Scene IR: static metadata + device array conventions.

The reference's recursive shared_ptr scene graph (Scene.hpp:5-37,
Primitive.hpp:17-66) is replaced by a flattened SoA "scene IR": one dict of
device arrays (geometry, material, light, medium, texture tables) plus this
hashable static `SceneMeta` that callers close over under jit.

Array schema (all float32 / int32):
  tri_v   [T,3,3]  triangle vertices        tri_n   [T,3,3] shading normals
  tri_uv  [T,3,2]  texcoords                tri_tan [T,3,3] tangents
  tri_prop[T,4]    (mat, light, medium, has_tangent)
  sph_c   [S,3]    sphere centers           sph_r   [S]     radii
  sph_prop[S,3]    (mat, light, medium)
  quad_q/u/v/n [Q,3], quad_d [Q], quad_w [Q,3], quad_prop [Q,3]
  mat_type[M], mat_base[M,3], mat_rough[M], mat_metal[M], mat_ior[M],
  mat_tex [M,5]    (base, roughness, metallic, normal, alpha) texture ids
  mat_alpha_mode[M], mat_alpha_cutoff[M]
  light_type[L], light_color[L,3], light_vec[L,3], light_shape[L,2],
  light_flags[L], light_emtex[L], light_area[L], light_power[L],
  light_cdf[L], inf_idx[LI]
  env_weights/env_cdf [NE,NC], env_total [NE], light_env_slot [L]
  med_sigma_a/s/t [D,3], med_g [D], med_le [D,3]
  tex_* (see textures.py)

Ids use -1 for "none". All tables are padded to >=1 row so gathers stay
well-formed; `SceneMeta` counts define validity.
"""
from __future__ import annotations

import dataclasses

MAT_NONE = -1

LIGHT_UNIFORM_INF = 0
LIGHT_ENV_TEX = 1
LIGHT_DISTANT = 2
LIGHT_POINT = 3
LIGHT_AREA = 4

SHAPE_TRI = 0
SHAPE_SPH = 1
SHAPE_QUAD = 2
SHAPE_ITRI = 3   # instanced triangle (runtime object-space transform)

ALPHA_OPAQUE = 0
ALPHA_BLEND = 1
ALPHA_MASK = 2


@dataclasses.dataclass(frozen=True)
class SceneMeta:
    n_tri: int = 0
    n_sph: int = 0
    n_quad: int = 0
    n_mat: int = 0
    n_lights: int = 0
    n_inf: int = 0
    n_media: int = 0
    env_nx: int = 0
    env_ny: int = 0
    n_env: int = 0              # env (TextureInfinite) lights with tables
    scene_medium: int = -1      # global medium id (Scene.hpp sceneMedium)
    camera_medium: int = -1
    has_alpha: bool = False     # any non-opaque material in scene
    light_sampler: str = "power"  # "power" | "uniform"
    accel: str = "beam"  # "pallas" | "beam" | "bvh" | "brute"
    block_k: int = 0            # beam/pallas prims-per-block (static)
    block_g: int = 16           # two-level kernel: L2 children per L1
    block_pops: int = 1         # two-level kernel: children tested per
    # drain iteration.  Fresh builds use (k2=128, g=32, pops=4): same
    # group-row width and L1 count as the old (256, 16, 1) but finer
    # child selection and one loop sync per 4 leaf tests — measured
    # bounce 205.8 -> 129.8 ms, coherent 68.3 -> 23.5 ms per 64K rays
    # at 10.5M tris (tools/bench_pops.py, v5e, 2026-08-20).  Defaults
    # here stay (16, 1) so pre-round-4 cached scenes keep the table
    # shape they were built with.
    alpha_block_k: int = 0      # >0: alpha-material triangles live in a
                                # separate pka_* table set so shadow rays
                                # any-hit the opaque set in ONE pass and
                                # only alpha-test the (small) alpha set
                                # (Primitive.cpp:6-14 single-pass analog)
    has_motion: bool = False    # any primitive with nonzero velocity
    has_light_motion: bool = False  # any light with nonzero velocity
    n_inst: int = 0             # runtime instances (TransformedPrimitive)
    n_obj_tri: int = 0          # object-space triangle count
    mats_present: tuple = (True, True, True, True)  # diffuse/diel/thin/cond
    has_tangents: bool = True   # any triangle with authored tangents
    has_normal_maps: bool = True  # any material with a normal texture
    mat_tex_present: tuple = (True, True, True, True, True)
    # static per-slot material-texture presence (base, roughness,
    # metallic, normal, alpha): False slots let resolve_material /
    # normal mapping skip whole per-lane bilinear fetches that every
    # hit previously computed and where()'d away (the faithful bench
    # scene has base+normal+alpha but no roughness/metallic textures)
    has_emissive_tex: bool = True  # any light with an emission texture:
    # False lets light L evaluation skip per-lane bilinear fetches that
    # would read texture 0 and be where()'d away (measured ~5 wasted
    # 64K-lane texture evals per bounce wave on the untextured-light
    # San-Miguel analog)
    # (all three default True so pre-round-3/4 cached metas keep the
    # old always-compute behavior; builder sets them exactly)
    analytic_alpha: bool = True  # any sphere/quad with a non-opaque
    # material.  False lets the shadow predicate test analytic prims in
    # the single opaque any-hit pass and drop them from every alpha
    # restart iteration (each iteration previously paid a full-width
    # dense test + interaction merge for prims that can never need an
    # alpha test).  Defaults True: cached metas keep chain semantics.
    alpha_cull_mask: bool = False  # the pka_* tables carry per-triangle
    # conservative alpha micro-masks in rows 9..15 (scene/alphamask.py)
    # and the kernels may test them in-traversal: definitely-transparent
    # candidates culled from closest passes, definitely-opaque shadow
    # hits collapsed any-hit-style (the reference alpha-tests inside
    # traversal, Primitive.cpp:6-14).  False on cached pre-round-5
    # scenes: their tables have zero rows there.
