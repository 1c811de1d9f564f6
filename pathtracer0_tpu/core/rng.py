"""Counted, vectorized replica of the reference's PCG-style RNG.

The GLSL renderer keeps one sequential uint32 hash stream per pixel
(frag.glsl:683-694):

    state  = state * 747796405 + 2891336453            (advance)
    result = ((state >> ((state >> 28) + 4)) ^ state) * 277803737
    result = (result >> 22) ^ result                    (extract)
    uniform = result / (2^32 - 1)

seeded with `rngState = pixelIndex + u_seed` (frag.glsl:896).  We keep the
exact same generator but hold one state PER RAY in a uint32 array, so every
draw is a fully vectorized VPU op — no sequential dependency across rays,
bit-identical streams per pixel, deterministic and resumable renders.

Because the state advance is an affine map, skipping a *data-dependent*
number of draws (needed by the branchless BSDF lobe sampler, see
shade/bsdf.py) is a select over a handful of precomputed advanced states —
`advance_select`.

All functions are pure: they take and return `state` (uint32 array).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_MUL = np.uint32(747796405)
_INC = np.uint32(2891336453)
_MIX = np.uint32(277803737)
# 1 / (2^32 - 1): GLSL divides by 4294967295.0 (frag.glsl:693), so the
# uniform range is the CLOSED interval [0, 1].
_INV = np.float32(1.0) / np.float32(4294967295.0)


def seed(pixel_index, frame_seed):
    """rngState = pixelIndex + u_seed (frag.glsl:896), wrapping uint32."""
    return (pixel_index.astype(jnp.uint32) + jnp.uint32(frame_seed)).astype(
        jnp.uint32
    )


def advance(state, n: int = 1):
    """Advance the affine state map n (static) times."""
    # Closed form: state_n = A^n * state + C * (A^{n-1} + ... + A + 1),
    # computed in Python ints mod 2^32 to avoid numpy overflow warnings.
    mask = 0xFFFFFFFF
    a, c = 1, 0
    mul, inc = int(_MUL), int(_INC)
    k = n
    while k:
        if k & 1:
            a, c = (a * mul) & mask, (c * mul + inc) & mask
        inc = ((mul + 1) * inc) & mask
        mul = (mul * mul) & mask
        k >>= 1
    return (state * np.uint32(a) + np.uint32(c)).astype(jnp.uint32)


def advance_select(state, counts, max_count: int):
    """Advance each lane's state by a per-lane draw count in [0, max_count].

    A where-chain over the (static, small) candidate count — NOT
    take_along_axis over a stacked array: per-ray selects lower to serial
    gathers on TPU and measured ~4.7 ms per 480k-ray bounce."""
    counts = counts.astype(jnp.int32)
    out = state
    for n in range(1, max_count + 1):
        out = jnp.where(counts == n, advance(state, n), out)
    return out


def _extract(state):
    """The PCG output permutation applied to an already-advanced state."""
    shift = (state >> jnp.uint32(28)) + jnp.uint32(4)
    result = ((state >> shift) ^ state) * _MIX
    result = (result >> jnp.uint32(22)) ^ result
    return result


def next_uint(state):
    """One draw: returns (uint32 result, new state). frag.glsl:686-691."""
    state = advance(state)
    return _extract(state), state


def uniform(state):
    """One draw in [0, 1] (closed; see _INV). frag.glsl:692-694."""
    bits, state = next_uint(state)
    return bits.astype(jnp.float32) * _INV, state


def peek_uniform(state, offset: int):
    """Uniform that WOULD be drawn `offset` draws ahead, without consuming.

    Enables branchless lobe sampling: compute all candidate directions from
    the same stream positions the GLSL branches would read, then advance the
    state by the count the winning branch actually consumes.
    """
    return _extract(advance(state, offset)).astype(jnp.float32) * _INV


def normal(state):
    """Box-Muller normal matching frag.glsl:696-701 (consumes 2 uniforms):
    theta = 2*3.1415926*u1 ; rho = sqrt(-2*log(u2)) ; rho*cos(theta)."""
    u1, state = uniform(state)
    u2, state = uniform(state)
    theta = jnp.float32(2.0 * 3.1415926) * u1
    rho = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u2))
    return rho * jnp.cos(theta), state


def _normal_from(u1, u2):
    theta = jnp.float32(2.0 * 3.1415926) * u1
    rho = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u2))
    return rho * jnp.cos(theta)


def lambertian_vec(state):
    """3 iid normals (consumes 6 uniforms) — `randLambertianDistVec`
    (frag.glsl:702-708). NOT normalized here; callers add N and normalize."""
    x, state = normal(state)
    y, state = normal(state)
    z, state = normal(state)
    return jnp.stack([x, y, z], axis=-1), state


def peek_lambertian_vec(state, offset: int):
    """The lambertian vec that a draw starting `offset` draws ahead would
    produce, without consuming (6 uniforms peeked)."""
    us = [peek_uniform(state, offset + i) for i in range(1, 7)]
    return jnp.stack(
        [
            _normal_from(us[0], us[1]),
            _normal_from(us[2], us[3]),
            _normal_from(us[4], us[5]),
        ],
        axis=-1,
    )


def uniform_cube_vec(state):
    """randUniformDistVec (frag.glsl:709-714): uniform in [-1,1]^3."""
    x, state = uniform(state)
    y, state = uniform(state)
    z, state = uniform(state)
    return (jnp.stack([x, y, z], axis=-1) - 0.5) * 2.0, state


def disk_sample(state, n):
    """randDiskSamplePoint (frag.glsl:715-723): point on a unit circle in the
    plane whose (unnormalized) basis is built from n x (0,1,0)."""
    u, state = uniform(state)
    v, state = uniform(state)
    uv = (jnp.stack([u, v], axis=-1) - 0.5) * 2.0
    uv = uv / jnp.sqrt(jnp.sum(uv * uv, axis=-1, keepdims=True))
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], dtype=n.dtype), n.shape)
    uvec = jnp.cross(n, up)
    vvec = jnp.cross(n, uvec)
    return uvec * uv[..., :1] + vvec * uv[..., 1:2], state
