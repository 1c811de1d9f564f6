"""Camera model: primary ray generation + depth of field.

Replicates the reference camera exactly:
  * primary direction = rotate(((uv*2-1) * (-1, Hratio) * screenSize,
    focalLength), ROTATION)                                  (frag.glsl:894)
  * per-sample DOF: origin jittered by a rotated lambertian vec scaled by
    BLUR; the ray is re-aimed at the focal point at FOCAL_DISTANCE (or the
    autofocus distance = center-ray hit distance)            (frag.glsl:898-908)

Pixel convention: pixel (0, 0) is the BOTTOM-left (GL texCoord origin); PNG
writers flip vertically, like the reference screenshot path
(dispatch.java:828-833).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as vm
from . import rng as vrng


def pixel_centers(width: int, height: int):
    """(H*W, 2) float32 texCoord-style uv at pixel centers, and the flat
    pixel index used for RNG seeding (index = py * width + px,
    frag.glsl:885-886)."""
    px = jnp.arange(width, dtype=jnp.float32)
    py = jnp.arange(height, dtype=jnp.float32)
    u = (px + 0.5) / jnp.float32(width)
    v = (py + 0.5) / jnp.float32(height)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")  # (H, W)
    uv = jnp.stack([uu.ravel(), vv.ravel()], axis=-1)
    iy, ix = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.uint32),
        jnp.arange(width, dtype=jnp.uint32),
        indexing="ij",
    )
    index = (iy * jnp.uint32(width) + ix).ravel()
    return uv, index


def pixel_centers_soa(width: int, height: int):
    """Component-planar variant of `pixel_centers`: (uv2 (2, H*W), index).
    The transpose fuses into the iota producers under jit, so this is a
    layout convenience for the fused frame kernel, not a copy."""
    uv, index = pixel_centers(width, height)
    return uv.T, index


def primary_directions(uv, rotation, cam_size, focal_length, screen_h_ratio):
    """UNNORMALIZED primary directions, exactly as frag.glsl:894 builds them
    (normalization happens in the DOF adjustment or inside rayScene)."""
    x = (uv[..., 0] * 2.0 - 1.0) * (-1.0) * cam_size
    y = (uv[..., 1] * 2.0 - 1.0) * screen_h_ratio * cam_size
    z = jnp.full_like(x, focal_length)
    d = jnp.stack([x, y, z], axis=-1)
    return vm.rotate(d, jnp.broadcast_to(rotation, d.shape))


def dof_ray(origin, direction, rotation, blur, focal_distance, state):
    """Jitter the origin and re-aim at the focal point (frag.glsl:899-908).

    `focal_distance` is the resolved internal focal distance (caller handles
    autofocus by probing the center ray). Consumes 6 uniforms per ray.
    Returns (origin_jittered, direction_adjusted, state).
    """
    jitter, state = vrng.lambertian_vec(state)
    rot = jnp.broadcast_to(rotation, jitter.shape)
    origin_jittered = origin + vm.rotate(jitter * blur, rot)
    focal_point = origin + direction * focal_distance[..., None]
    direction_adjusted = vm.normalize(focal_point - origin_jittered)
    return origin_jittered, direction_adjusted, state


def center_probe_direction(rotation):
    """Direction of the autofocus probe ray: rotate((0,0,1), ROTATION)
    (frag.glsl:902)."""
    return vm.rotate(jnp.array([0.0, 0.0, 1.0], dtype=jnp.float32), rotation)
