"""Primitive intersection kernels (batched, branchless).

TPU-native equivalents of the GLSL intersectors:
  * ray_tri        — Möller-Trumbore, returns (t, u, v) or 1e30 (frag.glsl:351-372)
  * ray_box        — slab test, returns entry distance or 1e30  (frag.glsl:408-419)
  * ray_ellipsoid  — stretched-sphere quadric                   (frag.glsl:373-384)

All functions broadcast over arbitrary leading batch axes: pass rays shaped
(R, 1, 3) against primitives shaped (1, T, 3) to get an (R, T) block — the
shape used by the Pallas wavefront intersector.

Parity note (PARITY.md #3): the reference's rayEllipsoid takes sqrt of a
possibly negative discriminant and can return a NEGATIVE t when the ray
origin is inside the ellipsoid (frag.glsl:377-383, no t>0 guard on the
returned root). We return the smallest strictly-positive root instead, which
makes refraction through analytic ellipsoids actually work.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MISS = np.float32(1e30)
EPSILON = np.float32(1e-10)  # frag.glsl:228


def ray_tri(o, d, v1, v2, v3):
    """Möller-Trumbore. Returns (t, u, v), each (...,); t = 1e30 on miss.

    Matches frag.glsl:351-372: |det| < 1e-10 rejected, u/v in [0,1] with
    u+v <= 1, t must exceed EPSILON.
    """
    e1 = v2 - v1
    e2 = v3 - v1
    d_cross_e2 = jnp.cross(d, e2)
    det = jnp.sum(e1 * d_cross_e2, axis=-1)
    inv_det = 1.0 / det  # may be inf; masked below
    s = o - v1
    u = jnp.sum(s * d_cross_e2, axis=-1) * inv_det
    s_cross_e1 = jnp.cross(s, e1)
    v = jnp.sum(d * s_cross_e1, axis=-1) * inv_det
    t = jnp.sum(e2 * s_cross_e1, axis=-1) * inv_det
    valid = (
        (jnp.abs(det) >= EPSILON)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > EPSILON)
    )
    t = jnp.where(valid, t, MISS)
    return t, u, v


def safe_inv_dir(d):
    """Finite reciprocal direction for slab tests. A zero (or subnormal)
    component makes 1/d infinite, and a box plane exactly on the ray then
    yields 0 * inf = NaN — the classic unguarded-slab-test bug (the
    reference's rayBox has the same UB, frag.glsl:408-419; a straight-down
    ray over a grid whose node boundary crosses the origin MISSES).
    Clamping the reciprocal to +-1e30 keeps every product finite
    (0 * 1e30 = 0, so on-plane rays count as touching)."""
    return jnp.clip(
        1.0 / jnp.where(d == 0.0, jnp.float32(1e-30), d), -1e30, 1e30
    )


def ray_box(o, d, box_min, box_max):
    """Slab test; returns entry distance (0 if origin inside), 1e30 on miss.

    frag.glsl:408-419 semantics with the axis-parallel-ray NaN fixed
    (see safe_inv_dir; PARITY.md).
    """
    inv_d = safe_inv_dir(d)
    t_min = (box_min - o) * inv_d
    t_max = (box_max - o) * inv_d
    t1 = jnp.minimum(t_min, t_max)
    t2 = jnp.maximum(t_min, t_max)
    t_near = jnp.max(t1, axis=-1)
    t_far = jnp.min(t2, axis=-1)
    hit = (t_far >= t_near) & (t_far > 0.0)
    return jnp.where(hit, jnp.maximum(t_near, 0.0), MISS)


def ray_ellipsoid(o, d, c, r, stretch):
    """Stretched sphere: f*x^2 + g*y^2 + h*z^2 = r^2 in the frame centered at
    c, where stretch = (f, g, h) (frag.glsl:373-384).

    Returns the smallest strictly positive root, 1e30 on miss (see module
    docstring for the deliberate deviation from the reference).
    """
    oc = o - c
    a = jnp.sum(stretch * d * d, axis=-1)
    b = 2.0 * jnp.sum(stretch * oc * d, axis=-1)
    cc = jnp.sum(stretch * oc * oc, axis=-1) - r * r
    disc = b * b - 4.0 * a * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_2a = 1.0 / (2.0 * a)
    t0 = (-b - sq) * inv_2a  # near root (a > 0)
    t1 = (-b + sq) * inv_2a  # far root
    t_lo, t_hi = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
    t = jnp.where(t_lo > 0.0, t_lo, t_hi)
    valid = (disc > 0.0) & (t > 0.0)
    return jnp.where(valid, t, MISS)


def compute_tangent(p1, p2, p3, uv1, uv2, uv3, normal):
    """UV-space tangent, Gram-Schmidt orthogonalized against the normal
    (frag.glsl:421-439). Used for normal mapping."""
    edge1 = p2 - p1
    edge2 = p3 - p1
    duv1 = uv2 - uv1
    duv2 = uv3 - uv1
    f = 1.0 / (duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0])
    tangent = f[..., None] * (
        duv2[..., 1:2] * edge1 - duv1[..., 1:2] * edge2
    )
    ndt = jnp.sum(normal * tangent, axis=-1, keepdims=True)
    tangent = tangent - normal * ndt
    mag = jnp.sqrt(jnp.sum(tangent * tangent, axis=-1, keepdims=True))
    return tangent / mag
