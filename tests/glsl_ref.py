"""Scalar, pure-Python simulation of the GLSL reference semantics.

Used by the test suite as an independent oracle: these functions are written
directly from frag.glsl with sequential RNG consumption and branching, so
the vectorized/branchless TPU implementations can be checked draw-for-draw.
"""
from __future__ import annotations

import math

M32 = 0xFFFFFFFF


def next_random(state: int):
    """frag.glsl:686-691."""
    state = (state * 747796405 + 2891336453) & M32
    shift = ((state >> 28) + 4) & 31
    result = (((state >> shift) ^ state) * 277803737) & M32
    result = ((result >> 22) ^ result) & M32
    return result, state


def random(state: int):
    r, state = next_random(state)
    return r / 4294967295.0, state


def rand_normal(state: int):
    """frag.glsl:696-701."""
    u1, state = random(state)
    u2, state = random(state)
    theta = 2.0 * 3.1415926 * u1
    rho = math.sqrt(-2.0 * math.log(u2)) if u2 > 0 else float("inf")
    return rho * math.cos(theta), state


def rand_lambertian(state: int):
    x, state = rand_normal(state)
    y, state = rand_normal(state)
    z, state = rand_normal(state)
    return (x, y, z), state


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _norm(a):
    m = math.sqrt(_dot(a, a))
    return (a[0] / m, a[1] / m, a[2] / m)


def _mix(a, b, t):
    return tuple(a[i] * (1 - t) + b[i] * t for i in range(3))


def reflect(d, n):
    k = 2.0 * _dot(n, d)
    return (d[0] - k * n[0], d[1] - k * n[1], d[2] - k * n[2])


def refract(d, n, eta):
    cos_i = _dot(n, d)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    if k < 0.0:
        return (0.0, 0.0, 0.0)
    f = eta * cos_i + math.sqrt(k)
    return (eta * d[0] - f * n[0], eta * d[1] - f * n[1],
            eta * d[2] - f * n[2])


def fresnel_reflect_amount(n1, n2, normal, incidence):
    """frag.glsl:726-743."""
    r0 = (n1 - n2) / (n1 + n2)
    r0 *= r0
    cos_x = -_dot(normal, incidence)
    if n1 > n2:
        n = n1 / n2
        sin_t2 = n * n * (1.0 - cos_x * cos_x)
        if sin_t2 > 1.0:
            return 1.0
        cos_x = math.sqrt(1.0 - sin_t2)
    x = 1.0 - cos_x
    return r0 + (1.0 - r0) * x ** 5


def choose_ray(m: dict, n1, n2, N, D, state):
    """frag.glsl:745-809 with sequential draw consumption.
    m: dict with Pr, Pc, Pcr, Pm, Tr, Tf (3-tuple), illum, subsurface.
    Returns (out_dir, win_type, state)."""
    reflection_w = 1.0 - m["Pr"]
    clearcoat_w = m["Pc"]
    tf = m["Tf"]
    transmission_w = (
        m["Tr"] if m["Tr"] > 0
        else ((tf[0] + tf[1] + tf[2]) / 3.0 if tf[0] > 0 else 0.0)
    )
    eta = n1 / n2
    fresnel = 0.0
    if m["illum"] == 5 or m["illum"] == 7 or transmission_w > 0:
        fresnel = fresnel_reflect_amount(n1, n2, N, D)
        reflection_w += fresnel * m["Pr"]
        transmission_w *= 1.0 - fresnel

    diffuse_w = (1.0 - m["Pm"]) * (1.0 - transmission_w) * (1.0 - fresnel)
    total = diffuse_w + reflection_w + clearcoat_w + transmission_w
    diffuse_w /= total
    reflection_w /= total
    clearcoat_w /= total
    transmission_w /= total

    roll, state = random(state)

    if roll < reflection_w:
        lamb, state = rand_lambertian(state)
        out = _mix(reflect(D, N), _norm(
            (lamb[0] + N[0], lamb[1] + N[1], lamb[2] + N[2])), 0.0)
        return out, 1, state
    if roll < reflection_w + clearcoat_w:
        lamb, state = rand_lambertian(state)
        out = _mix(reflect(D, N), _norm(
            (lamb[0] + N[0], lamb[1] + N[1], lamb[2] + N[2])), m["Pcr"])
        return out, 2, state
    if roll < reflection_w + clearcoat_w + transmission_w:
        return refract(D, N, eta), 3, state
    if m["subsurface"] > 0:
        sub, state = random(state)
        lamb, state = rand_lambertian(state)
        out = _norm((lamb[0] + N[0], lamb[1] + N[1], lamb[2] + N[2]))
        return out, (4 if sub < m["subsurface"] else 0), state
    lamb, state = rand_lambertian(state)
    out = _norm((lamb[0] + N[0], lamb[1] + N[1], lamb[2] + N[2]))
    return out, 0, state


def rotate(p, rot):
    """GLSL rotate(p, rot) evaluated literally: p * (Mx*My*Mz) with
    column-major mat3 constructors (frag.glsl:244-283)."""
    import numpy as np

    def mat3_colmajor(vals):
        # GLSL mat3(a,b,c, d,e,f, g,h,i): columns (a,b,c),(d,e,f),(g,h,i)
        return np.array(vals, dtype=np.float64).reshape(3, 3).T

    cx, sx = math.cos(rot[0]), math.sin(rot[0])
    cy, sy = math.cos(rot[1]), math.sin(rot[1])
    cz, sz = math.cos(rot[2]), math.sin(rot[2])
    mx = mat3_colmajor([1, 0, 0, 0, cx, -sx, 0, sx, cx])
    my = mat3_colmajor([cy, 0, sy, 0, 1, 0, -sy, 0, cy])
    mz = (
        mat3_colmajor([cz, -sz, 0, sz, cz, 0, 0, 0, 1])
        if rot[2] != 0
        else np.eye(3)
    )
    rm = mx @ my @ mz
    # GLSL p * rm = row-vector times matrix
    return np.asarray(p, np.float64) @ rm


def java_vec_rotate(p, rot):
    """Java vec.rotate (dispatch.java:1157-1191), literally transcribed."""
    x, y, z = float(p[0]), float(p[1]), float(p[2])
    cx, sx = math.cos(rot[0]), math.sin(rot[0])
    y, z = cx * y - sx * z, sx * y + cx * z
    cy, sy = math.cos(rot[1]), math.sin(rot[1])
    x, z = cy * x + sy * z, -sy * x + cy * z
    cz, sz = math.cos(rot[2]), math.sin(rot[2])
    x, y = cz * x - sz * y, sz * x + cz * y
    return (x, y, z)
