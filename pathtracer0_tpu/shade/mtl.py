"""Device-side material decode + texture-map overrides.

Equivalent of the GLSL `mtl` struct + `newMtl` + `mapMtl`
(frag.glsl:97-225). Decode gathers one 48-float record per ray and splits it
into a NamedTuple of SoA fields; mapMtl applies per-channel texture
overrides: Ka/Kd multiply by the sample, Ks/Ke/d/Tr/Ns/Pm/Pr/Ps/Pc are
REPLACED by it (frag.glsl:210-225).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.math import onehot_gather
from ..scene.material import COL
from ..scene.texture import sample_bilinear


class Mtl(NamedTuple):
    Ka: jax.Array   # (B, 3)
    Kd: jax.Array   # (B, 3)
    Ks: jax.Array   # (B, 3)
    Ns: jax.Array   # (B,)
    d: jax.Array
    Tr: jax.Array
    Tf: jax.Array   # (B, 3)
    Ni: jax.Array
    Ke: jax.Array   # (B, 3)
    Density: jax.Array
    illum: jax.Array  # (B,) int32
    Pm: jax.Array
    Pr: jax.Array
    Ps: jax.Array
    Pc: jax.Array
    Pcr: jax.Array
    aniso: jax.Array
    anisor: jax.Array
    subsurface: jax.Array
    subsurfaceColor: jax.Array   # (B, 3)
    subsurfaceRadius: jax.Array  # (B, 3)
    map_norm: jax.Array          # (B,) int32 (for normal mapping)


def decode(materials, mat_idx):
    """newMtl (frag.glsl:170-209): gather records; mat_idx clamped to 0 so
    missing materials (-1) decode harmlessly (they are only used by rays that
    are masked out downstream).

    The record fetch is a one-hot matmul (MXU), not a gather: per-ray row
    gathers lower to serial dynamic-slices on TPU and measured ~19 ms per
    480k-ray bounce; the one-hot contraction is bit-exact and ~100x cheaper
    for material tables of any realistic size."""
    rec = onehot_gather(materials, jnp.maximum(mat_idx, 0))

    def f(name):
        return rec[..., COL[name]]

    def v3(name):
        c = COL[name]
        return rec[..., c:c + 3]

    return Mtl(
        Ka=v3("Ka"), Kd=v3("Kd"), Ks=v3("Ks"), Ns=f("Ns"), d=f("d"),
        Tr=f("Tr"), Tf=v3("Tf"), Ni=f("Ni"), Ke=v3("Ke"),
        Density=f("Density"), illum=f("illum").astype(jnp.int32),
        Pm=f("Pm"), Pr=f("Pr"), Ps=f("Ps"), Pc=f("Pc"), Pcr=f("Pcr"),
        aniso=f("aniso"), anisor=f("anisor"), subsurface=f("subsurface"),
        subsurfaceColor=v3("subsurfaceColor"),
        subsurfaceRadius=v3("subsurfaceRadius"),
        map_norm=f("map_norm").astype(jnp.int32),
    ), rec


class LegacyMat(NamedTuple):
    """The legacy 18-float `mat` record (raytrace.glsl:75-88)."""

    Ka: jax.Array            # (B, 3)
    Kd: jax.Array            # (B, 3)
    Ks: jax.Array            # (B, 3)
    alpha: jax.Array         # (B,) Phong exponent
    refl: jax.Array          # (B,) reflectivity 0-1
    trans: jax.Array         # (B,) transmission 0-1
    refr_index: jax.Array    # (B,)
    emission: jax.Array      # (B,) emission strength
    emissive_radius: jax.Array  # (B,)
    solid: jax.Array         # (B,) bool
    absorption: jax.Array    # (B,)
    texture_id: jax.Array    # (B,) int32


def decode_legacy(legacy_mats, mat_idx):
    """`newMat` (raytrace.glsl:162-178): decode DeviceScene.legacy_mats
    records (Scene.add_mat, the SSBO-6 analogue — dispatch.java:538-551).
    Field order matches the addMat packing (dispatch.java:1025-1046).

    Deviation (documented): the reference's textureID read uses stride 17
    (`MatData[17*m + 18]`, raytrace.glsl:176) — correct only for m == 0,
    off into a neighboring record otherwise. This decode reads the slot
    the host actually packed it into (column 17 of every record)."""
    rec = onehot_gather(legacy_mats, jnp.maximum(mat_idx, 0))
    return LegacyMat(
        Ka=rec[..., 0:3], Kd=rec[..., 3:6], Ks=rec[..., 6:9],
        alpha=rec[..., 9], refl=rec[..., 10], trans=rec[..., 11],
        refr_index=rec[..., 12], emission=rec[..., 13],
        emissive_radius=rec[..., 14], solid=rec[..., 15] != 0.0,
        absorption=rec[..., 16],
        texture_id=rec[..., 17].astype(jnp.int32),
    )


def apply_maps(m: Mtl, rec, uv, tex_data, tex_sizes, enable: bool = True,
               present=None):
    """mapMtl (frag.glsl:210-225). `rec` is the raw record (for map indices).
    Set enable=False to compile a texture-free fast path when the scene has
    no material maps; `present` (a static tuple of map channel names,
    StaticSceneInfo.maps_present) skips the bilinear sample of every
    channel no material in the scene maps — the reference pays all 11
    samples per bounce unconditionally."""
    if not enable:
        return m
    if present is None:
        present = ("map_Ka", "map_Kd", "map_Ks", "map_Ke", "map_d",
                   "map_Tr", "map_Ns", "map_Pm", "map_Pr", "map_Ps",
                   "map_Pc")

    def idx(name):
        return rec[..., COL[name]].astype(jnp.int32)

    def override_rgb(field, map_name, multiply):
        if map_name not in present:
            return field
        map_i = idx(map_name)
        has = map_i > -1
        tex = sample_bilinear(tex_data, tex_sizes, jnp.maximum(map_i, 0), uv)
        if multiply:
            tex = tex * field
        return jnp.where(has[..., None], tex, field)

    def override_scalar(field, map_name):
        if map_name not in present:
            return field
        map_i = idx(map_name)
        has = map_i > -1
        tex = sample_bilinear(
            tex_data, tex_sizes, jnp.maximum(map_i, 0), uv
        )[..., 0]
        return jnp.where(has, tex, field)

    return m._replace(
        Ka=override_rgb(m.Ka, "map_Ka", multiply=True),
        Kd=override_rgb(m.Kd, "map_Kd", multiply=True),
        Ks=override_rgb(m.Ks, "map_Ks", multiply=False),
        Ke=override_rgb(m.Ke, "map_Ke", multiply=False),
        d=override_scalar(m.d, "map_d"),
        Tr=override_scalar(m.Tr, "map_Tr"),
        Ns=override_scalar(m.Ns, "map_Ns"),
        Pm=override_scalar(m.Pm, "map_Pm"),
        Pr=override_scalar(m.Pr, "map_Pr"),
        Ps=override_scalar(m.Ps, "map_Ps"),
        Pc=override_scalar(m.Pc, "map_Pc"),
    )


def shading_normal(m: Mtl, geom_norm, tangent, uv, tex_data, tex_sizes,
                   enable: bool = True):
    """Tangent-space normal mapping.

    PARITY.md #5: the reference uses the RAW texture RGB as the world normal
    (frag.glsl:827 `N = sampleTexture(map_norm, uv)`) and never uses the
    tangent it computed. We do standard TBN mapping: n_ts = tex*2-1,
    N = normalize(T*n_ts.x + B*n_ts.y + N*n_ts.z)."""
    if not enable:
        return geom_norm
    has = m.map_norm > -1
    tex = sample_bilinear(
        tex_data, tex_sizes, jnp.maximum(m.map_norm, 0), uv
    )
    n_ts = tex * 2.0 - 1.0
    bitan = jnp.cross(geom_norm, tangent)
    mapped = (
        tangent * n_ts[..., 0:1]
        + bitan * n_ts[..., 1:2]
        + geom_norm * n_ts[..., 2:3]
    )
    mag = jnp.sqrt(jnp.sum(mapped * mapped, axis=-1, keepdims=True))
    mapped = mapped / jnp.maximum(mag, 1e-20)
    return jnp.where(has[..., None], mapped, geom_norm)
