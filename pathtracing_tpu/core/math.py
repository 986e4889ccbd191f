"""Vector math primitives for the TPU path tracer.

Pure-JAX, shape-polymorphic re-designs of the reference's L0 layer
(reference: Onb.hpp:3-30, Ray.hpp:14-42, Shape.hpp:35-43, Util.hpp:4-6,
Texture.hpp:13-24).  Everything here operates on arrays with a trailing
3-component axis so the same code runs per-lane inside vectorized kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

INV_PI = 1.0 / jnp.pi
SHADOW_EPS = 1e-5  # reference AABB.hpp:6 `shadowEpsilon`
BIG_F32 = 3.0e38   # stand-in for +inf that survives arithmetic


def vdot(a, b):
    """Dot product over the trailing axis, keeps leading shape."""
    return jnp.sum(a * b, axis=-1)


def vdot_k(a, b):
    """Dot product, keepdims on the trailing axis (for broadcasting)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def normalize(v, eps: float = 0.0):
    """Normalize over trailing axis. With eps>0 guards the zero vector."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    if eps:
        n2 = jnp.maximum(n2, eps)
    return v / jnp.sqrt(n2)


def safe_sqrt(x):
    """sqrt with a NaN-free gradient at and below zero (the 'double
    where' guard — required everywhere a masked lane may see x<=0,
    or reverse-mode AD poisons the whole batch).  The threshold is
    1e-24 (not 0): XLA flushes f32 denormals, so sqrt of a denormal
    would put inf/NaN partials on masked lanes."""
    pos = x > 1e-24
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def safe_normalize(v):
    """normalize(v) that passes near-zero vectors through unchanged.

    The threshold is 1e-12 on |v|^2 (not >0): the division VJP computes
    ct*v/n, and with |v| below ~1e-19 the squared denominator flushes
    to zero (TPU/XLA FTZ) giving 0/0=NaN on masked lanes."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    pos = n2 > 1e-12
    return jnp.where(pos, v / jnp.sqrt(jnp.where(pos, n2, 1.0)), v)


def safe_denom(x, eps):
    """Sign-preserving denominator clamp: |result| >= eps, same sign as x
    (sign 0 counts as +).  Use for every division whose denominator can
    legitimately pass near zero: `a / safe_denom(b, 1e-12)`.  A bare
    `jnp.where(b == 0, eps, b)` is NOT enough — b can be 1e-30, nonzero
    but so small that b*b in the division VJP flushes to 0 => 0/0 NaN."""
    mag = jnp.maximum(jnp.abs(x), eps)
    return jnp.where(x < 0, -mag, mag)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def distance(a, b):
    return length(a - b)


def offset_ray(p, n):
    """Robust ray-origin offset along the (geometric) normal.

    The reference offsets hit points by an absolute shadowEpsilon=1e-5
    (AABB.hpp:6) which falls below the f32 ULP at scene scales of a few
    hundred units and produces shadow acne (measured: ring-shaped acne on
    the 555-unit Cornell walls).  This is the integer-ULP offset of Ray
    Tracing Gems ch.6 ("A Fast and Robust Method for Avoiding
    Self-Intersection"): scale-invariant, a few ULPs at any magnitude."""
    int_scale = jnp.float32(256.0)
    float_scale = jnp.float32(1.0 / 65536.0)
    origin_bound = jnp.float32(1.0 / 32.0)
    of_i = (int_scale * n).astype(jnp.int32)
    p_i = jax.lax.bitcast_convert_type(p, jnp.int32)
    p_adj = jax.lax.bitcast_convert_type(
        jnp.where(p < 0.0, p_i - of_i, p_i + of_i), jnp.float32)
    return jnp.where(jnp.abs(p) < origin_bound,
                     p + float_scale * n, p_adj)


def reflect(i, n):
    """GLM convention: reflect incident `i` about normal `n`."""
    return i - 2.0 * vdot_k(n, i) * n


def refract(i, n, eta):
    """GLM convention refraction. Returns 0-vector on total internal
    reflection (matches glm::refract used at Material.hpp:425,460)."""
    cosi = vdot_k(n, i)
    eta = jnp.asarray(eta)[..., None] if jnp.ndim(eta) == jnp.ndim(i) - 1 else eta
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    refr = eta * i - (eta * cosi + safe_sqrt(k)) * n
    return jnp.where(k >= 0.0, refr, jnp.zeros_like(i))


def luminance(c):
    """Rec.709 luminance (reference Util.hpp:4-6)."""
    w = jnp.asarray([0.2126, 0.7152, 0.0722], dtype=c.dtype)
    return vdot(c, w)


def onb_from_normal(n):
    """Orthonormal basis from a normal, branch on |x| (Onb.hpp:5-10).

    Returns (t, b, n): axis[0], axis[1], axis[2] of the reference `onb`.
    """
    big_x = jnp.abs(n[..., 0:1]) > 0.9999
    up = jnp.where(big_x,
                   jnp.asarray([0.0, 1.0, 0.0], n.dtype),
                   jnp.asarray([1.0, 0.0, 0.0], n.dtype))
    b = safe_normalize(jnp.cross(n, up))     # axis[1]
    t = jnp.cross(b, n)                      # axis[0]
    return t, b, n


def onb_from_interaction(ns, tangent):
    """ONB from shading normal + tangent (Onb.hpp:12-16):
    axis[2]=ns, axis[0]=tangent, axis[1]=cross(ns, tangent)."""
    b = jnp.cross(ns, tangent)
    return tangent, b, ns


def to_local(t, b, n, v):
    return jnp.stack([vdot(v, t), vdot(v, b), vdot(v, n)], axis=-1)


def to_world(t, b, n, v):
    return (v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n)


def sphere_uv(p):
    """Spherical UV from a direction (Shape.hpp:35-43)."""
    p = safe_normalize(p)
    theta = jnp.arccos(jnp.clip(p[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(p[..., 2], p[..., 0])
    phi = jnp.where(phi < 0, phi + 2.0 * jnp.pi, phi)
    u = phi * (0.5 * INV_PI)
    v = theta * INV_PI
    return jnp.stack([u, v], axis=-1)


def uv_to_direction(uv):
    """Inverse of the light-sampling parameterisation used by the
    reference's infinite lights (Light.cpp:35-42): z in [-1,1] from u,
    azimuth from v."""
    z = 2.0 * uv[..., 0] - 1.0
    theta = 2.0 * jnp.pi * uv[..., 1]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), z], axis=-1)


def in_unit_disk(uv):
    """Concentric-free polar disk sample (Random.hpp:60-64)."""
    r = jnp.sqrt(uv[..., 0])
    theta = 2.0 * jnp.pi * uv[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def cosine_sample_hemisphere(uv):
    """Cosine-weighted hemisphere sample, reference's diffuse lobe
    parameterisation (Material.hpp:221-231): z = sqrt(1-u2)."""
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - uv[..., 1]))
    phi = 2.0 * jnp.pi * uv[..., 0]
    s = jnp.sqrt(jnp.maximum(0.0, uv[..., 1]))
    return jnp.stack([jnp.cos(phi) * s, jnp.sin(phi) * s, z], axis=-1)


def uniform_sample_sphere(uv):
    """Uniform direction on S2 with the reference's (z from u.x) layout
    (Light.cpp:35-41)."""
    return uv_to_direction(uv)


def srgb_to_linear(s):
    s = jnp.clip(s, 0.0, 1.0)
    return jnp.where(s <= 0.04045, s / 12.92, ((s + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(l):
    l = jnp.clip(l, 0.0, 1.0)
    return jnp.where(l < 0.0031308, 12.92 * l,
                     1.055 * jnp.maximum(l, 1e-12) ** (1.0 / 2.4) - 0.055)


# ---------------------------------------------------------------------------
# Scalarized (component-triple) geometry math
#
# TPU VPU reality: [N,3] arrays put the 3-vector on the minor (lane)
# axis, so every dot/cross/normalize lowers to cross-lane reductions and
# relayouts — measured 3.5x slower than the same math on separate x/y/z
# component arrays (each a full-width [N] vector).  Hot paths unpack
# once at the boundary, compute in components, and pack once at exit.
# Colors stay [N,3]: their math is plain elementwise, which XLA handles
# at near-full rate.
# ---------------------------------------------------------------------------

def unpack3(v):
    """[..., 3] -> (x, y, z) component arrays."""
    return v[..., 0], v[..., 1], v[..., 2]


def pack3(x, y, z):
    """(x, y, z) -> [..., 3]."""
    return jnp.stack([jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)],
                     axis=-1)


def sdot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def scross(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def ssafe_normalize(x, y, z):
    """Component form of safe_normalize (same 1e-12 flush guard)."""
    n2 = x * x + y * y + z * z
    pos = n2 > 1e-12
    inv = jnp.where(pos, 1.0 / jnp.sqrt(jnp.where(pos, n2, 1.0)), 1.0)
    return x * inv, y * inv, z * inv


def snormalize(x, y, z, eps: float = 1e-18):
    """Component form of normalize(v, eps)."""
    n2 = jnp.maximum(x * x + y * y + z * z, eps)
    inv = 1.0 / jnp.sqrt(n2)
    return x * inv, y * inv, z * inv


def sreflect(ix, iy, iz, nx, ny, nz):
    """Component form of reflect (GLM convention)."""
    d2 = 2.0 * sdot(nx, ny, nz, ix, iy, iz)
    return ix - d2 * nx, iy - d2 * ny, iz - d2 * nz


def srefract(ix, iy, iz, nx, ny, nz, eta):
    """Component form of refract; zero vector on TIR."""
    cosi = sdot(nx, ny, nz, ix, iy, iz)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    c = eta * cosi + safe_sqrt(k)
    ok = k >= 0.0
    return (jnp.where(ok, eta * ix - c * nx, 0.0),
            jnp.where(ok, eta * iy - c * ny, 0.0),
            jnp.where(ok, eta * iz - c * nz, 0.0))


def sonb_from_normal(nx, ny, nz):
    """Component form of onb_from_normal: returns (t, b) triples; the
    third axis is the normal itself.  Same |x|>0.9999 branch
    (Onb.hpp:5-10): up = (0,1,0) when |n.x| big else (1,0,0)."""
    big_x = jnp.abs(nx) > 0.9999
    ux = jnp.where(big_x, 0.0, 1.0)
    uy = jnp.where(big_x, 1.0, 0.0)
    bx, by, bz = scross(nx, ny, nz, ux, uy, jnp.zeros_like(ux))
    bx, by, bz = ssafe_normalize(bx, by, bz)
    tx, ty, tz = scross(bx, by, bz, nx, ny, nz)
    return (tx, ty, tz), (bx, by, bz)


def sto_local(t, b, n, vx, vy, vz):
    """World->frame: t/b/n are component triples."""
    return (sdot(vx, vy, vz, *t), sdot(vx, vy, vz, *b),
            sdot(vx, vy, vz, *n))


def sto_world(t, b, n, lx, ly, lz):
    """Frame->world: t/b/n are component triples."""
    return (lx * t[0] + ly * b[0] + lz * n[0],
            lx * t[1] + ly * b[1] + lz * n[1],
            lx * t[2] + ly * b[2] + lz * n[2])
