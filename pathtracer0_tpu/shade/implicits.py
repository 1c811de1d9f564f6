"""Implicit surface library + ray marcher.

The 10 hardcoded implicit functions from frag.glsl:299-349 (sphere, waves,
ellipsoid, tractor beam, golden-ratio surface, UFO pieces, solids of
revolution), the forward-difference gradient (frag.glsl:440-445), and a ray
marcher. The reference DISABLED its marcher (`rayImplicit` returns 1e30 with
the march commented out, frag.glsl:385-407); per SURVEY.md §7.5 we
reimplement it properly: fixed-count coarse march with sign-change detection
followed by bisection refinement — static shapes, jit/TPU friendly.

Scene-space mapping matches rayScene (frag.glsl:578-605): local origin
O = (o - shift)/scale, local direction D = d/scale, optional rotation into
the local frame; the returned t is in the LOCAL parameterization (the
reference compares it directly against world closest_t — a quirk we keep,
since scale is usually uniform).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_GR = 0.5 + 5.0 ** 0.5 / 2.0   # golden ratio (frag.glsl:229)
_GR2 = _GR * _GR
_NAN = np.float32("nan")


def _fx1(x2, y2, z2, x, y, z):
    return x2 + y2 + z2 - 15.0


def _fx2(x2, y2, z2, x, y, z):
    return jnp.sin(x / 2.0) + jnp.sin(z / 2.0) + y / 2.0 + 10.0


def _fx3(x2, y2, z2, x, y, z):
    return 2.0 * x2 + y2 + 2.0 * z2 - 3.0


def _fx4(x2, y2, z2, x, y, z):
    fx = jnp.where(y < -0.63, 0.2 * (y - 5.0), _NAN)  # tractor beam
    return x2 + z2 - fx * fx


def _fx5(x2, y2, z2, x, y, z):
    w = 1.0  # golden-ratio surface
    return 4.0 * (_GR2 * x2 - y2) * (_GR2 * y2 - z2) * (_GR2 * z2 - x2) - (
        1.0 + 2.0 * _GR
    ) * (x2 + y2 + z2 - w) ** 2 * w


def _fx6(x2, y2, z2, x, y, z):
    fx = jnp.where(  # ufo body
        y > -0.7417,
        jnp.where(
            y > 0.0,
            jnp.where(y < 1.3, y ** 3 - 3.0, _NAN),
            jnp.where(y > -2.0, 10.0 * jnp.sin(y + 4.7) + 7.0, _NAN),
        ),
        _NAN,
    )
    return x2 + z2 - fx * fx


def _fx7(x2, y2, z2, x, y, z):
    fx = -1.047 * jnp.sqrt(-(y - 1.25) * (y - 1.25) + 1.0)  # ufo top
    return x2 + z2 - fx * fx


def _fx8(x2, y2, z2, x, y, z):
    fx = jnp.where(  # bottle-ish solid of revolution
        (y > 7.6) | (y < 0.0),
        _NAN,
        jnp.where(
            y < 0.196,
            0.5625 * jnp.cos(17.0 * y) + 0.6875,
            0.125 + jnp.sin(0.9 * jnp.abs(y / 2.5) ** 0.6) ** 10,
        ),
    )
    return x2 + z2 - fx * fx


def _fx9(x2, y2, z2, x, y, z):
    yy = -y
    fx = jnp.where(
        (yy < 2.0) | (yy > 8.0),
        _NAN,
        jnp.where(
            yy > 7.0,
            -jnp.abs(yy - 7.0) ** 10 + 1.0,
            jnp.where(
                yy > 5.0,
                1.0,
                jnp.where(
                    yy > 4.1,
                    jnp.sin(yy - 0.27),
                    jnp.where(
                        yy > 2.5,
                        (yy + 0.9826) / 8.0,
                        jnp.where(
                            yy > 2.0,
                            jnp.sin(40.0 * yy) / 40.0 + 0.45,
                            0.0,
                        ),
                    ),
                ),
            ),
        ),
    )
    return x2 + z2 - fx * fx


def _fx10(x2, y2, z2, x, y, z):
    fx = jnp.where(
        y > 0.0,
        jnp.where(
            y < 5.488,
            -(10.0 ** (-5.0 * y)) + 1.04,
            jnp.where(
                y < 6.74,
                0.34 * jnp.sin(2.5 * y + 6.7) + 0.7,
                jnp.where(
                    y < 8.43,
                    0.36,
                    jnp.where(
                        y < 8.76,
                        -50.0 * (y - 8.6) ** 4 + 0.4,
                        jnp.where(y < 9.0, 0.36, _NAN),
                    ),
                ),
            ),
        ),
        _NAN,
    )
    return x2 + z2 - fx * fx


_BUILDERS = [_fx1, _fx2, _fx3, _fx4, _fx5, _fx6, _fx7, _fx8, _fx9, _fx10]


def funcs(p, fn, fns_present=None):
    """Evaluate implicit function `fn` (int array) at p (..., 3); the 10
    hardcoded surfaces are frag.glsl:299-349 verbatim. NaN regions mean
    'no surface here' (the reference uses sqrt(-1)).

    fns_present: optional STATIC tuple of the fn ids that can occur — the
    marcher calls this hundreds of times per query, and computing all 10
    surfaces (transcendentals included) for a scene that uses one of them
    measured ~10x the necessary cost. Selection is a where-chain, NOT
    take_along_axis (per-element selects lower to serial TPU gathers)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    x2, y2, z2 = x * x, y * y, z * z
    ids = (tuple(sorted(set(int(f) for f in fns_present)))
           if fns_present is not None else tuple(range(1, 11)))
    ids = tuple(k for k in ids if 1 <= k <= 10)
    if not ids:
        return jnp.full(x.shape, jnp.float32(1e30))
    val = _BUILDERS[ids[0] - 1](x2, y2, z2, x, y, z)
    for k in ids[1:]:
        val = jnp.where(fn == k, _BUILDERS[k - 1](x2, y2, z2, x, y, z), val)
    ok = jnp.zeros(x.shape, bool)
    for k in ids:
        ok = ok | (fn == k)
    return jnp.where(ok, val, jnp.float32(1e30))


def gradient(p, fn, h=1e-4, fns_present=None):
    """Forward differences — RAW (un-negated) partials. The reference's
    gradient() returns negated partials (frag.glsl:440-445) and rayScene
    negates again (frag.glsl:597-599), so the net surface normal is
    +normalize(df); callers here must use the gradient as-is."""
    f0 = funcs(p, fn, fns_present)
    dx = (funcs(p + jnp.array([h, 0, 0], p.dtype), fn, fns_present) - f0) / h
    dy = (funcs(p + jnp.array([0, h, 0], p.dtype), fn, fns_present) - f0) / h
    dz = (funcs(p + jnp.array([0, 0, h], p.dtype), fn, fns_present) - f0) / h
    return jnp.stack([dx, dy, dz], axis=-1)


def ray_implicit(o, d, fn, t_max=100.0, coarse_steps: int = 256,
                 bisect_iters: int = 24, fns_present=None):
    """March o + t*d for the first sign change of funcs, refine by bisection.
    Returns t or 1e30. o, d: (..., 3); fn: (...,) int32.

    Replaces the reference's disabled fixed-0.1-step marcher
    (frag.glsl:385-407) with a robust bracketed search of static shape.
    """
    dt = jnp.float32(t_max / coarse_steps)

    def coarse(i, carry):
        t_lo, t_hi, found, f_prev = carry
        t = dt * (i + 1.0)
        f = funcs(o + d * t[..., None] if t.ndim else o + d * t, fn,
                  fns_present)
        sign_change = (~found) & (f_prev * f < 0.0)
        t_lo = jnp.where(sign_change, t - dt, t_lo)
        t_hi = jnp.where(sign_change, t, t_hi)
        found = found | sign_change
        return t_lo, t_hi, found, f

    f0 = funcs(o, fn, fns_present)
    shape = f0.shape
    init = (
        jnp.zeros(shape, jnp.float32),
        jnp.full(shape, jnp.float32(t_max)),
        jnp.zeros(shape, bool),
        f0,
    )
    t_lo, t_hi, found, _ = jax.lax.fori_loop(
        0, coarse_steps, coarse, init
    )

    f_lo = funcs(o + d * t_lo[..., None], fn, fns_present)

    def bisect(_, carry):
        t_lo, t_hi, f_lo = carry
        t_mid = 0.5 * (t_lo + t_hi)
        f_mid = funcs(o + d * t_mid[..., None], fn, fns_present)
        go_left = f_lo * f_mid < 0.0
        t_hi = jnp.where(go_left, t_mid, t_hi)
        t_lo = jnp.where(go_left, t_lo, t_mid)
        f_lo = jnp.where(go_left, f_lo, f_mid)
        return t_lo, t_hi, f_lo

    t_lo, t_hi, _ = jax.lax.fori_loop(
        0, bisect_iters, bisect, (t_lo, t_hi, f_lo)
    )
    t = 0.5 * (t_lo + t_hi)
    return jnp.where(found, t, jnp.float32(1e30))
