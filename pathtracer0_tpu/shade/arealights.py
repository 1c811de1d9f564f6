"""Legacy Phong shading with emissive-disk area lights + soft shadows.

Port of the reference's DEAD compute-shader subsystem — `shadePoint` and
the `EmissiveData` disk lights (raytrace.glsl:676-758). The host never
loads that shader (dispatch.java:136-151), so this is an OPT-IN feature
family (RenderConfig.legacy_shading) rather than part of the active
parity surface; it replicates the legacy semantics:

  * each light is a DISK (center, radius) bound to a geometry COLLECTION
    (primitive kind + id range) — a shadow ray "reaches" the light when
    its closest hit lands on that collection (raytrace.glsl:700-736);
  * soft shadows: a (S+1)^2 grid over the disk in the (uvec, vvec) frame
    perpendicular to Nd = normalize(hit - center), keeping points within
    radius*(1 + 1/S), each shadow direction jittered (raytrace.glsl:
    712-729); S == 1 degenerates to one center ray; S == 0 means fully
    lit (raytrace.glsl:735);
  * Phong illum modes (raytrace.glsl:744-756): 0 diffuse only; 1 adds
    ambient Ka once; 2 adds Ka once + specular
    max(Ks*lightKs*pow(dot(R,V), Ns), 0);
  * EmissionStrength is the 48-float record's Density slot — the legacy
    shader decodes slot 20 as EmissionStrength (raytrace.glsl:190) where
    the active layout stores Density, and the host couples Density=|Ke|
    at parse time (dispatch.java:1357-1361). Soft-shadow intensity scales
    by it (raytrace.glsl:738) and an emissive surface returns
    Ke*EmissionStrength (raytrace.glsl:682-683). One documented fix: the
    reference gates the emissive early-return on EmissionStrength > 0,
    but Density DEFAULTS to 1 (dispatch.java:1524), so the dead shader
    would have early-returned black Ke for every default material; the
    gate here is |Ke| > 0 instead.

Light jitter uses the counted per-ray RNG (uniform cube / 2, the
raytrace.glsl:729 semantics) so renders stay deterministic/resumable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as vm
from ..core import rng as vrng
from ..kernels import traverse
from . import mtl as mtl_mod
from ..scene.texture import sky_color


def _collection_hit(hit, kind, id_start, id_end):
    """Does this closest hit land on the light's geometry collection?"""
    prim_id = jnp.where(hit.kind == 1, hit.tri, hit.prim)
    return (hit.is_hit
            & (hit.kind == kind)
            & (prim_id >= id_start)
            & (prim_id <= id_end))


def shade_point(origins, directions, state, scene, info, params,
                sample_res: int):
    """Batched legacy shadePoint. Returns ((B, 3) color, new RNG state)."""
    hit, o_n = traverse.ray_scene(
        origins, directions, scene, info, stack_depth=params.stack_depth,
        pallas=params.pallas,
    )
    surf = traverse.surface_sample(hit, o_n, directions, scene, info=info)
    m, rec = mtl_mod.decode(scene.materials, surf.mat)
    maps_on = params.use_textures and info.has_maps
    m = mtl_mod.apply_maps(m, rec, surf.uv, scene.tex_data,
                           scene.tex_sizes, enable=maps_on)

    nflip = jnp.where(vm.dot(surf.norm, directions) > 0.0, -1.0, 1.0)
    n = vm.normalize(surf.norm) * nflip[:, None]

    col = jnp.zeros_like(origins)
    did_ambient = jnp.zeros(origins.shape[0], bool)

    lights = zip(info.lights, range(len(info.lights)))
    for (kind, id_start, id_end, light_mat), _li in lights:
        center = jnp.asarray(info.light_centers[_li], jnp.float32)
        radius = jnp.float32(info.light_radii[_li])
        lm, _ = mtl_mod.decode(scene.materials,
                               jnp.full(origins.shape[:1], light_mat,
                                        jnp.int32))
        i_d = lm.Ke  # light color Id (raytrace.glsl:741)

        # disk frame (raytrace.glsl:701-703)
        nd = vm.normalize(surf.loc - center)
        uvec = vm.normalize(jnp.cross(
            nd, nd + jnp.asarray([0.1, 31.0, 1.0], jnp.float32)))
        vvec = vm.normalize(jnp.cross(nd, uvec))

        # NOTE: EmissionStrength (lm.Density) scales intensity ONLY in the
        # grid branch below — the reference's own SAMPLE_RES==1 branch
        # (raytrace.glsl:708) and SAMPLE_RES<=0 branch (:729) return raw
        # 0/1 intensity, so brightness depends on the shadow-quality knob
        # THERE TOO. Quirk preserved deliberately for parity.
        shadow_o = surf.loc + 1e-4 * n
        if sample_res <= 0:
            intensity = jnp.ones(origins.shape[0])
        elif sample_res == 1:
            jitter, state = vrng.uniform_cube_vec(state)
            shoot = vm.normalize(center - surf.loc)
            sh_hit, _ = traverse.ray_scene(
                shadow_o, vm.normalize(shoot + jitter), scene, info,
                stack_depth=params.stack_depth, pallas=params.pallas,
            )
            intensity = _collection_hit(
                sh_hit, kind, id_start, id_end).astype(jnp.float32)
        else:
            hits = jnp.zeros(origins.shape[0])
            total = 0
            for i in range(sample_res + 1):
                l_u = -1.0 + 2.0 * i / sample_res
                for j in range(sample_res + 1):
                    l_v = -1.0 + 2.0 * j / sample_res
                    r2 = l_u * l_u + l_v * l_v
                    # static point-in-disk gate (raytrace.glsl:717)
                    if r2 ** 0.5 > 1.0 + 1.0 / sample_res:
                        continue
                    total += 1
                    point = center + radius * (l_u * uvec + l_v * vvec)
                    shoot = vm.normalize(point - surf.loc)
                    jitter, state = vrng.uniform_cube_vec(state)
                    sh_hit, _ = traverse.ray_scene(
                        shadow_o, vm.normalize(shoot + jitter * 0.5),
                        scene, info, stack_depth=params.stack_depth,
                        pallas=params.pallas,
                    )
                    hits = hits + _collection_hit(
                        sh_hit, kind, id_start, id_end).astype(jnp.float32)
            # intensity = EmissionStrength * hits/total (raytrace.glsl:738);
            # strength is the light material's Density slot (see module doc)
            intensity = lm.Density * hits / max(total, 1)

        l_dir = vm.normalize(center - surf.loc)
        diffuse = (m.Kd * i_d * intensity[:, None]
                   * jnp.clip(vm.dot(n, l_dir), 0.0, 1.0)[:, None])
        v_dir = vm.normalize(-directions)
        r_dir = vm.normalize(2.0 * vm.dot(l_dir, n)[:, None] * n - l_dir)
        # Clamp the pow base: GLSL pow(x<0, fractional) is undefined and the
        # reference GPU effectively drops it; jnp would produce NaN for
        # fractional Ns (e.g. 96.078431) and NaN-poison the pixel (ADVICE r2)
        spec = jnp.maximum(
            m.Ks * lm.Ks
            * (jnp.clip(vm.dot(r_dir, v_dir), 0.0, 1.0) ** m.Ns)[:, None]
            * i_d * intensity[:, None],
            0.0,
        )
        add_amb = (~did_ambient) & (m.illum >= 1)
        contrib = (
            diffuse
            + jnp.where(add_amb[:, None], m.Ka, 0.0)
            + jnp.where((m.illum == 2)[:, None], spec, 0.0)
        )
        did_ambient = did_ambient | (m.illum >= 1)
        col = col + contrib

    # emissive surfaces return Ke * EmissionStrength (raytrace.glsl:
    # 682-683); gated on |Ke| > 0, not EmissionStrength > 0 — see the
    # module docstring for why the reference's own gate is a dead-code bug
    is_emissive = jnp.any(m.Ke > 0.0, axis=-1)
    col = jnp.where(is_emissive[:, None], m.Ke * m.Density[:, None], col)

    sky = sky_color(scene.tex_data, scene.tex_sizes, directions)
    return jnp.where(hit.is_hit[:, None], col, sky), state
