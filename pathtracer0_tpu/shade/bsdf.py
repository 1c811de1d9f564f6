"""Fresnel + importance-sampled BSDF lobe selection (branchless).

Faithful port of `fresnelReflectAmount` (frag.glsl:726-743) and `chooseRay`
(frag.glsl:745-809). The GLSL version branches on a roll and consumes a
data-dependent number of RNG draws; here every candidate direction is
computed from PEEKED draws at exactly the stream offsets the corresponding
GLSL branch would read, the winner is selected with masks, and the RNG state
advances by the count the winning branch actually consumed — so per-ray
random streams stay bit-identical to the sequential version.

Draw layout per call (offsets relative to the incoming state):
  1          roll                                  (frag.glsl:768)
  2..7       lambertian vec for reflect/clearcoat/plain-diffuse branches
  2          subsurface sub-roll (only when m.subsurface > 0, frag.glsl:792)
  3..8       lambertian vec when the sub-roll path is taken
Consumed: reflect/clearcoat 7, transmission 1, diffuse 7 (or 8 with
subsurface present), max 8.

Lobe ids (winType): 0 diffuse, 1 reflect, 2 clearcoat, 3 transmission,
4 subsurface.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as vm
from ..core import rng as vrng


def fresnel_reflect_amount(n1, n2, normal, incidence):
    """Schlick with TIR (frag.glsl:726-743). All args broadcast, (B,)."""
    r0 = (n1 - n2) / (n1 + n2)
    r0 = r0 * r0
    cos_x = -vm.dot(normal, incidence)
    n = n1 / n2
    sin_t2 = n * n * (1.0 - cos_x * cos_x)
    tir = (n1 > n2) & (sin_t2 > 1.0)
    cos_x = jnp.where(n1 > n2, jnp.sqrt(jnp.maximum(1.0 - sin_t2, 0.0)),
                      cos_x)
    x = 1.0 - cos_x
    ret = r0 + (1.0 - r0) * x * x * x * x * x
    return jnp.where(tir, 1.0, ret)


class LobeChoice(NamedTuple):
    direction: jax.Array  # (B, 3)
    win_type: jax.Array   # (B,) int32
    state: jax.Array      # (B,) uint32 advanced RNG state


def choose_ray(m, n1, n2, N, D, state) -> LobeChoice:
    """chooseRay (frag.glsl:745-809). m: shade.mtl.Mtl; N flipped toward the
    incoming ray; D normalized incoming direction."""
    reflection_w = 1.0 - m.Pr
    clearcoat_w = m.Pc
    tf_mean = (m.Tf[..., 0] + m.Tf[..., 1] + m.Tf[..., 2]) / 3.0
    transmission_w = jnp.where(
        m.Tr > 0.0, m.Tr, jnp.where(m.Tf[..., 0] > 0.0, tf_mean, 0.0)
    )

    eta = n1 / n2
    do_fresnel = (m.illum == 5) | (m.illum == 7) | (transmission_w > 0.0)
    fres = fresnel_reflect_amount(n1, n2, N, D)
    fresnel = jnp.where(do_fresnel, fres, 0.0)
    reflection_w = reflection_w + fresnel * m.Pr
    transmission_w = transmission_w * (1.0 - fresnel)

    diffuse_w = (1.0 - m.Pm) * (1.0 - transmission_w) * (1.0 - fresnel)

    total = diffuse_w + reflection_w + clearcoat_w + transmission_w
    # GLSL divides unconditionally (frag.glsl:762-765); total == 0 yields
    # NaN weights and the roll comparisons all come out false -> diffuse,
    # exactly like the shader. NaN/inf propagate identically here.
    reflection_w = reflection_w / total
    clearcoat_w = clearcoat_w / total
    transmission_w = transmission_w / total

    roll = vrng.peek_uniform(state, 1)
    lamb_plain = vrng.peek_lambertian_vec(state, 1)  # draws 2..7
    sub_roll = vrng.peek_uniform(state, 2)
    lamb_sub = vrng.peek_lambertian_vec(state, 2)    # draws 3..8

    reflect_dir = vm.reflect(D, N)
    cosine_plain = vm.normalize(lamb_plain + N)
    cosine_sub = vm.normalize(lamb_sub + N)
    clearcoat_dir = vm.mix(reflect_dir, cosine_plain, m.Pcr)
    refract_dir = vm.refract(D, N, eta)

    t1 = reflection_w
    t2 = t1 + clearcoat_w
    t3 = t2 + transmission_w
    is_reflect = roll < t1
    is_clearcoat = (~is_reflect) & (roll < t2)
    is_transmission = (~is_reflect) & (~is_clearcoat) & (roll < t3)
    is_else = ~(is_reflect | is_clearcoat | is_transmission)
    has_ss = m.subsurface > 0.0
    is_subsurface = is_else & has_ss & (sub_roll < m.subsurface)
    is_diffuse = is_else & ~is_subsurface

    # diffuse draws come after the sub-roll only when subsurface is present
    else_dir = jnp.where(has_ss[..., None], cosine_sub, cosine_plain)

    win = jnp.where(
        is_reflect, 1,
        jnp.where(is_clearcoat, 2,
                  jnp.where(is_transmission, 3,
                            jnp.where(is_subsurface, 4, 0))),
    ).astype(jnp.int32)
    direction = jnp.where(
        is_reflect[..., None], reflect_dir,
        jnp.where(is_clearcoat[..., None], clearcoat_dir,
                  jnp.where(is_transmission[..., None], refract_dir,
                            else_dir)),
    )

    consumed = jnp.where(
        is_transmission, 1,
        jnp.where(is_else & has_ss, 8, 7),
    )
    state = vrng.advance_select(state, consumed, 8)
    return LobeChoice(direction=direction, win_type=win, state=state)
