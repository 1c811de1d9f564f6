"""Texture registry and TPU-friendly sampling.

The reference uses ARB bindless texture handles in an SSBO
(dispatch.java:331-379, frag.glsl:75-81). TPUs have no such thing, so all
textures live in ONE padded (K, Hmax, Wmax, 3) float32 array plus a (K, 2)
size table; sampling is a manual bilinear gather with GL_REPEAT wrap +
GL_LINEAR filtering, matching the reference's sampler state
(dispatch.java:351-354).

Row convention: row 0 = top of the image, like stb_image's default load the
reference uploads verbatim; v=0 therefore addresses the top row (the shader
flips mesh UVs with `uv.y = 1-uv.y`, frag.glsl:513 — our integrator does the
same).

Texture index 0 is the sky (equirectangular environment), as in the
reference scene setup (dispatch.java:221-222, frag.glsl:235-242).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class TextureRegistry:
    """Dedup-by-name texture store (reference: textureNames/textures lists,
    dispatch.java:95-96, registration-on-first-use at dispatch.java:1368-1375)."""

    def __init__(self):
        self.names: List[str] = []
        self.images: List[np.ndarray] = []  # (H, W, 3) float32 in [0,1]

    def __len__(self):
        return len(self.images)

    def register(self, path: str, name: Optional[str] = None) -> int:
        name = name if name is not None else path
        if name in self.names:
            return self.names.index(name)
        img = _load_image(path)
        return self.register_array(img, name)

    def register_array(self, img: np.ndarray, name: str) -> int:
        if name in self.names:
            return self.names.index(name)
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        if img.shape[-1] > 3:
            img = img[..., :3]
        self.names.append(name)
        self.images.append(np.ascontiguousarray(img))
        return len(self.images) - 1

    def pack(self) -> Tuple[np.ndarray, np.ndarray]:
        """Pad all textures to the max extent -> (data, sizes)."""
        if not self.images:
            # Fallback 1x1 mid-gray so the sky sampler always has texture 0.
            data = np.full((1, 1, 1, 3), 0.5, np.float32)
            sizes = np.ones((1, 2), np.int32)
            return data, sizes
        hmax = max(im.shape[0] for im in self.images)
        wmax = max(im.shape[1] for im in self.images)
        data = np.zeros((len(self.images), hmax, wmax, 3), np.float32)
        sizes = np.zeros((len(self.images), 2), np.int32)
        for i, im in enumerate(self.images):
            data[i, : im.shape[0], : im.shape[1]] = im
            sizes[i] = (im.shape[0], im.shape[1])
        return data, sizes


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        arr = np.asarray(im, np.float32) / 255.0
    return arr


def sample_bilinear(tex_data, tex_sizes, tex_index, uv):
    """Bilinear sample with REPEAT wrap: tex_index (...,) int32, uv (..., 2)
    GL-style (u right, v down into row 0 = top). Returns (..., 3).

    Matches GL_LINEAR/GL_REPEAT: texel centers at integer+0.5; coordinates
    wrapped per-texel so filtering is seamless across the edge.
    """
    hw = tex_sizes[tex_index]                      # (..., 2) [h, w]
    h = hw[..., 0].astype(jnp.float32)
    w = hw[..., 1].astype(jnp.float32)
    # GL: texel coordinate = uv * size - 0.5
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    hi = hw[..., 0]
    wi = hw[..., 1]
    x0i = jnp.mod(x0.astype(jnp.int32), wi)
    x1i = jnp.mod(x0.astype(jnp.int32) + 1, wi)
    y0i = jnp.mod(y0.astype(jnp.int32), hi)
    y1i = jnp.mod(y0.astype(jnp.int32) + 1, hi)

    # Flat ROW gathers, not 4-D indexing: XLA lowers multi-dim dynamic
    # indexing to a far slower serial gather (34 ms vs ~13 ms per 4-tap
    # 480k-ray sample measured on v5e). The reshape is layout-free for the
    # packed (K, H, W, 3) array and is hoisted out of the bounce loop.
    K, Hm, Wm, _ = tex_data.shape
    flat = tex_data.reshape(K * Hm * Wm, 3)
    base = tex_index * (Hm * Wm)

    def tex(yy, xx):
        return flat[base + yy * Wm + xx]

    c00 = tex(y0i, x0i)
    c01 = tex(y0i, x1i)
    c10 = tex(y1i, x0i)
    c11 = tex(y1i, x1i)
    fx = fx[..., None]
    fy = fy[..., None]
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


# Texel budget under which the sky samples via weighted one-hot matmuls on
# the MXU instead of 4-tap gathers. Measured on v5e at 3.85M rays: RANDOM
# directions gather 42 ms vs one-hot (Precision.HIGH) 13.6 ms (max abs err
# 1.2e-4); but REAL frame directions are coherent enough that the gather
# drops to ~10 ms and wins (config 3 whole-frame: 75.4 ms with gather,
# 79.2 ms with one-hot). Disabled by default — flip for workloads whose
# bounce directions are incoherent and sky-heavy.
_SKY_ONEHOT_MAX_TEXELS = 0
_SKY_CHUNK = 1 << 16


def _sky_bilinear_onehot(tex_data, tex_sizes, u, v):
    """Bilinear sample of texture 0 as two factorized weighted one-hot
    contractions: a (N, Hm) row one-hot (two adjacent nonzero weights)
    against the (Hm, Wm*3) texel matrix rides the MXU, then a (N, Wm)
    column mask reduces on the VPU. Exactly the 4-tap REPEAT/LINEAR result
    up to matmul rounding (see _SKY_ONEHOT_MAX_TEXELS)."""
    import jax

    K, Hm, Wm, _ = tex_data.shape
    h = tex_sizes[0, 0].astype(jnp.float32)
    w = tex_sizes[0, 1].astype(jnp.float32)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).ravel()
    fy = (y - y0).ravel()
    hi = tex_sizes[0, 0]
    wi = tex_sizes[0, 1]
    x0i = jnp.mod(x0.astype(jnp.int32), wi).ravel()
    x1i = jnp.mod(x0.astype(jnp.int32) + 1, wi).ravel()
    y0i = jnp.mod(y0.astype(jnp.int32), hi).ravel()
    y1i = jnp.mod(y0.astype(jnp.int32) + 1, hi).ravel()

    rows = jnp.arange(Hm, dtype=jnp.int32)
    cols = jnp.arange(Wm, dtype=jnp.int32)
    t2 = tex_data[0].reshape(Hm, Wm * 3)

    def chunk(args):
        y0c, y1c, fyc, x0c, x1c, fxc = args
        oh = ((y0c[:, None] == rows) * (1.0 - fyc[:, None])
              + (y1c[:, None] == rows) * fyc[:, None])
        rowdat = jnp.dot(oh, t2, precision=jax.lax.Precision.HIGH)
        rowdat = rowdat.reshape(-1, Wm, 3)
        cm = ((x0c[:, None] == cols) * (1.0 - fxc[:, None])
              + (x1c[:, None] == cols) * fxc[:, None])
        return jnp.sum(rowdat * cm[..., None], axis=1)

    n = fx.size
    parts = (y0i, y1i, fy, x0i, x1i, fx)
    if n <= _SKY_CHUNK:
        out = chunk(parts)
    else:
        # bound the (chunk, Wm*3) intermediate; pad to equal chunks
        nch = -(-n // _SKY_CHUNK)
        npad = nch * _SKY_CHUNK - n
        parts = tuple(
            jnp.concatenate([a, jnp.zeros((npad,), a.dtype)])
            .reshape(nch, _SKY_CHUNK) for a in parts)
        out = jax.lax.map(chunk, parts).reshape(-1, 3)[:n]
    return out.reshape(u.shape + (3,))


def sky_color_soa(tex_data, tex_sizes, dx, dy, dz):
    """SoA variant of `sky_color` for component-planar callers (the fused
    frame kernel returns (spp, 3, R) direction slabs): takes dx/dy/dz of any
    matching shape, returns (r, g, b) with that shape — no AoS transposes.
    """
    u = 0.5 + jnp.arctan2(dz, dx) / jnp.float32(2.0 * 3.14159)
    v = 0.5 - jnp.arcsin(jnp.clip(dy, -1.0, 1.0)) / jnp.float32(3.14159)
    K, Hm, Wm, _ = tex_data.shape
    if Hm * Wm <= _SKY_ONEHOT_MAX_TEXELS:
        c = _sky_bilinear_onehot(tex_data, tex_sizes, u, v)
    else:
        uv = jnp.stack([u, v], axis=-1)
        idx = jnp.zeros(dx.shape, jnp.int32)
        c = sample_bilinear(tex_data, tex_sizes, idx, uv)
    return c[..., 0], c[..., 1], c[..., 2]


def sky_color(tex_data, tex_sizes, direction):
    """Equirectangular environment lookup of texture 0 (frag.glsl:235-242):
    uv = (0.5 + atan2(z, x)/(2*3.14159), 0.5 - asin(y)/3.14159)."""
    d = direction
    u = 0.5 + jnp.arctan2(d[..., 2], d[..., 0]) / jnp.float32(2.0 * 3.14159)
    v = 0.5 - jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.float32(3.14159)
    uv = jnp.stack([u, v], axis=-1)
    idx = jnp.zeros(d.shape[:-1], jnp.int32)
    return sample_bilinear(tex_data, tex_sizes, idx, uv)
