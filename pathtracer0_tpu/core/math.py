"""Vector math and rotation conventions.

All functions operate on stacked arrays whose LAST axis is the 3-component
vector axis, so every op vectorizes over arbitrary leading batch dimensions
(the TPU-native replacement for the reference's scalar `vec` class,
dispatch.java:1067-1217, and the GLSL helpers, frag.glsl:244-297).

Rotation convention (verified against both reference implementations):
  * Java `vec.rotate(rot)` applies X-axis, then Y-axis, then Z-axis rotations
    (dispatch.java:1157-1191), i.e.  p' = Rz(rz) @ Ry(ry) @ Rx(rx) @ p.
  * GLSL `rotate(p, rot)` computes `p * (Mx*My*Mz)` with column-major mat3
    constructors (frag.glsl:244-283); expanding the column-major layout shows
    Mx = Rx^T etc., so p * (Rx^T Ry^T Rz^T) = Rz Ry Rx p — the same map.
So one `rotate` serves host geometry and device kernels.  `rotate_back`
(frag.glsl:284-297) is its inverse (transpose).
"""
from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    """Batched 3-vector dot product over the last axis."""
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a, eps=0.0):
    """GLSL-style normalize: divides by the magnitude with no epsilon guard
    (a zero vector yields NaNs, exactly like `normalize` in GLSL and the Java
    `vec.normalize`, dispatch.java:1205-1208)."""
    mag = jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True))
    if eps:
        mag = jnp.maximum(mag, eps)
    return a / mag


def distance(a, b):
    return length(a - b)


def reflect(d, n):
    """GLSL reflect(I, N) = I - 2*dot(N, I)*N."""
    return d - 2.0 * dot(n, d)[..., None] * n


def refract(d, n, eta):
    """GLSL refract(I, N, eta): returns the zero vector on total internal
    reflection (used by the transmission lobe, frag.glsl:783)."""
    cos_i = dot(n, d)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    tir = k < 0.0
    k_safe = jnp.maximum(k, 0.0)
    out = eta[..., None] * d - (eta * cos_i + jnp.sqrt(k_safe))[..., None] * n
    return jnp.where(tir[..., None], 0.0, out)


def mix(a, b, t):
    """GLSL mix: componentwise lerp, NOT renormalized (frag.glsl:775, 779)."""
    t = jnp.asarray(t)
    if t.ndim < jnp.asarray(a).ndim:
        t = t[..., None]
    return a * (1.0 - t) + b * t


def rotation_matrix(rot):
    """R = Rz(rz) @ Ry(ry) @ Rx(rx) for rot = (..., 3) Euler angles.

    Matches Java vec.rotate (dispatch.java:1157-1191) and GLSL
    rotate(p, rot) = p * rotationMatrix(rot) (frag.glsl:271-283).
    Returns (..., 3, 3) so that p' = R @ p.
    """
    rx, ry, rz = rot[..., 0], rot[..., 1], rot[..., 2]
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    # Rz @ Ry @ Rx expanded:
    r00 = cz * cy
    r01 = cz * sy * sx - sz * cx
    r02 = cz * sy * cx + sz * sx
    r10 = sz * cy
    r11 = sz * sy * sx + cz * cx
    r12 = sz * sy * cx - cz * sx
    r20 = -sy
    r21 = cy * sx
    r22 = cy * cx
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotate(p, rot):
    """Apply the scene rotation: p' = Rz Ry Rx p (see module docstring)."""
    r = rotation_matrix(rot)
    return jnp.einsum("...ij,...j->...i", r, p)


def rotate_back(p, rot):
    """Inverse rotation (GLSL rotateBack, frag.glsl:284-297): R^T p."""
    r = rotation_matrix(rot)
    return jnp.einsum("...ji,...j->...i", r, p)


def onehot_gather(table, idx):
    """Row gather expressed as a one-hot matmul: table (N, D), idx (..., ) int
    -> (..., D).

    TPU-native replacement for per-ray row gathers (XLA lowers those to slow
    serial dynamic-slices on TPU; the VPU has no hardware gather). A one-hot
    matrix contraction rides the MXU instead. With HIGHEST precision the
    result is BIT-EXACT: the only nonzero product per output is 1.0 * x, and
    the f32 split-accumulate reconstructs x exactly (1.0 splits as
    hi=1, lo=0, so x_hi + x_lo = x).

    Worth it for tables up to a few thousand rows (cost = B*N*D flops);
    larger tables should use in-kernel scalar loads instead.
    """
    import jax

    n = table.shape[0]
    oh = (idx[..., None] == jnp.arange(n, dtype=idx.dtype)).astype(
        table.dtype
    )
    return jax.lax.dot_general(
        oh, table, (((oh.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
