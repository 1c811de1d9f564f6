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
from .bsdf import fresnel_reflect_amount as bsdf_fresnel
from ..scene.texture import sky_color


def _collection_hit(hit, kind, id_start, id_end):
    """Does this closest hit land on the light's geometry collection?"""
    prim_id = jnp.where(hit.kind == 1, hit.tri, hit.prim)
    return (hit.is_hit
            & (hit.kind == kind)
            & (prim_id >= id_start)
            & (prim_id <= id_end))


def _query(origins, directions, scene, info, params):
    """rayScene + attribute interpolation + material decode/maps for a
    batch: the legacy shader's `raySceneResult` + `newMtl` + `mapMtl`
    prologue shared by shadePoint and pathTrace."""
    hit, o_n = traverse.ray_scene(
        origins, directions, scene, info, stack_depth=params.stack_depth,
        pallas=params.pallas,
    )
    surf = traverse.surface_sample(hit, o_n, directions, scene, info=info)
    m, rec = mtl_mod.decode(scene.materials, surf.mat)
    maps_on = params.use_textures and info.has_maps
    m = mtl_mod.apply_maps(m, rec, surf.uv, scene.tex_data,
                           scene.tex_sizes, enable=maps_on)
    return hit, surf, m


def shade_point(origins, directions, state, scene, info, params,
                sample_res: int):
    """Batched legacy shadePoint. Returns ((B, 3) color, new RNG state)."""
    hit, surf, m = _query(origins, directions, scene, info, params)
    return shade_hit(hit, surf, m, directions, state, scene, info, params,
                     sample_res)


def shade_hit(hit, surf, m, directions, state, scene, info, params,
              sample_res: int):
    """Legacy shadePoint over a precomputed closest hit
    (raytrace.glsl:676-758): Phong lighting from the disk lights, the
    emissive early-return, sky on miss. Factored out of shade_point so the
    deterministic pathTrace (raytrace.glsl:781-899) can flat-shade the
    hits it already holds."""
    origins = surf.loc  # only the shape is used below
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


def _glsl_rand(v):
    """The legacy hash rand(vec3) = fract(sin(47.57891x + y + 425z) *
    47678.786234) (raytrace.glsl:121-123), float32 like the GPU."""
    s = 47.57891 * v[..., 0] + v[..., 1] + 425.0 * v[..., 2]
    x = jnp.sin(s) * jnp.float32(47678.786234)
    return x - jnp.floor(x)


def _legacy_fresnel(n1, n2, normal, incidence, pm):
    """fresnelReflectAmount with the object-reflectivity blend folded in
    (raytrace.glsl:760-779): ret = Pm + (1-Pm)*schlick; TIR returns 1
    either way, so blending outside the shared Schlick helper is exact."""
    f = bsdf_fresnel(n1, n2, normal, incidence)
    return pm + (1.0 - pm) * f


def path_trace(origins, directions, state, scene, info, params,
               sample_res: int, max_bounces: int):
    """Legacy DETERMINISTIC Whitted-style pathTrace
    (raytrace.glsl:781-899, the dead compute shader's integrator):

      * every bounce flat-shades the hit with `shadePoint` (Phong + disk
        lights), then computes Fresnel reflect/transmit weights and
        FOLLOWS the stronger branch, single-sampling the weaker branch
        with one extra ray + shadePoint (no Monte Carlo lobe selection);
      * contributions composite with GLSL `mix(col, x, throughput)` —
        the legacy blend, NOT additive accumulation;
      * the refraction-index stack is mutated TWICE on bounces that
        sample the weaker refract branch (the reference pushes/pops once
        computing eta for the bounce and AGAIN for the sampled ray,
        raytrace.glsl:817-830 + 848-857 — so the sampled ray's eta is
        Ni/Ni = 1 on entry); quirk preserved verbatim;
      * Beer-Lambert absorption applies when a ray that WAS inside an
        object is now outside (raytrace.glsl:833-838), using MAT_FILTER
        (the entry material's Tf) — exp(-dist/Tf) componentwise;
      * glossy refraction perturbs the followed refract direction with
        the hash rand(vec3) of the hit location (raytrace.glsl:888-890),
        scaled by Pr — deterministic, no RNG stream;
      * the ONLY stochastic element is the shadow-ray jitter inside
        shadePoint; with sample_res <= 0 the whole integrator is
        deterministic (intensity = 1, zero RNG draws).

    Returns ((B, 3) color, new RNG state). Opt-in via
    RenderConfig.legacy_pathtrace; one evaluation per frame like the
    legacy dispatch (SAMPLE_RES is a shadow-quality knob, not spp)."""
    B = origins.shape[0]
    S = params.refraction_stack
    f3 = lambda v: jnp.full((B, 3), v, jnp.float32)

    def shade(hit, surf, m, d, state):
        return shade_hit(hit, surf, m, d, state, scene, info, params,
                         sample_res)

    # --- prologue (raytrace.glsl:782-799) --------------------------------
    d = directions
    hit, surf, m = _query(origins, d, scene, info, params)
    stack = jnp.zeros((B, S), jnp.float32).at[:, 0].set(1.0029)
    stack_size = jnp.ones((B,), jnp.int32)
    inside0 = hit.is_hit & (vm.dot(surf.norm, d) > 0.0)
    mat_filter = jnp.where(inside0[:, None], m.Tf, f3(1.0))
    stack = jnp.where(
        inside0[:, None],
        jnp.concatenate([m.Ni[:, None], stack[:, : S - 1]], axis=1), stack)
    stack_size = jnp.where(inside0, stack_size + 1, stack_size)
    in_obj = inside0
    was_in = inside0
    enter_loc = jnp.where(inside0[:, None], surf.loc, f3(0.0))

    col = f3(0.0)
    thr = f3(1.0)
    result = f3(0.0)
    active = jnp.ones((B,), bool)
    rays = jnp.sum(active.astype(jnp.float32))  # the prologue rayScene

    def latch(result, active, cond, value):
        """A masked GLSL `return value`."""
        fire = active & cond
        return (jnp.where(fire[:, None], value, result), active & ~fire)

    for _ in range(max_bounces):
        flat, state = shade(hit, surf, m, d, state)

        # miss terminates: return mix(col, flatShadeHit, throughput)
        result, active = latch(result, active, ~hit.is_hit,
                               vm.mix(col, flat, thr))

        d = vm.normalize(d)  # hit.dir = normalize(hit.dir), :808
        nd = vm.dot(surf.norm, d)
        nflip = jnp.where(nd > 0.0, -1.0, 1.0)
        nvec = surf.norm * nflip[:, None]
        entering = nd < 0.0
        upd = active  # stack/medium mutations apply to live rays only

        # --- eta + Fresnel with the first stack mutation (:817-830) ------
        pushed = jnp.concatenate([m.Ni[:, None], stack[:, : S - 1]], axis=1)
        popped = jnp.concatenate(
            [stack[:, 1:], jnp.zeros((B, 1), jnp.float32)], axis=1)
        eta = jnp.where(entering, pushed[:, 1] / pushed[:, 0],
                        stack[:, 0] / stack[:, 1])
        n1 = jnp.where(entering, pushed[:, 1], stack[:, 0])
        n2 = jnp.where(entering, pushed[:, 0], stack[:, 1])
        fres = jnp.where(
            (m.Pm > 0.0) | (m.Tr > 0.0),
            _legacy_fresnel(n1, n2, nvec, d, m.Pm), 0.0)
        stack = jnp.where((upd & entering)[:, None], pushed,
                          jnp.where((upd & ~entering)[:, None], popped,
                                    stack))
        stack_size = jnp.where(upd & entering, stack_size + 1,
                               jnp.where(upd & ~entering,
                                         jnp.maximum(stack_size - 1, 0),
                                         stack_size))
        mat_filter = jnp.where((upd & entering)[:, None], m.Tf, mat_filter)
        enter_loc = jnp.where((upd & entering)[:, None], surf.loc,
                              enter_loc)
        new_in_obj = jnp.where(upd, entering, in_obj)

        # --- absorption (:833-838) ---------------------------------------
        dist = vm.distance(enter_loc, surf.loc)
        absorb = jnp.exp(-dist[:, None]
                         / jnp.maximum(mat_filter, jnp.float32(1e-30)))
        exiting_obj = was_in & ~new_in_obj
        thr = jnp.where((upd & exiting_obj)[:, None], thr * absorb, thr)
        in_obj = new_in_obj

        # --- branch weights; both-zero terminates (:840-844) -------------
        refl_co = fres
        trans_co = m.Tr * (1.0 - fres)
        result, active = latch(result, active,
                               (refl_co + trans_co) == 0.0,
                               vm.mix(col, flat, thr))
        upd = active

        stronger_refl = refl_co > trans_co

        # --- weaker-branch single sample (:845-878) ----------------------
        # stronger=reflect: sampled ray is a refract with the SECOND stack
        # mutation's eta (push again entering / pop again exiting);
        # stronger=refract: sampled ray is a reflect at 1e-6 offset.
        pushed2 = jnp.concatenate([m.Ni[:, None], stack[:, : S - 1]],
                                  axis=1)
        eta2 = jnp.where(entering, pushed2[:, 1] / pushed2[:, 0],
                         stack[:, 0] / stack[:, 1])
        # the reference mutates the stack only inside `if (transCo > 0)`
        mut2 = upd & stronger_refl & (trans_co > 0.0)
        stack = jnp.where(
            (mut2 & entering)[:, None], pushed2,
            jnp.where((mut2 & ~entering)[:, None],
                      jnp.concatenate(
                          [stack[:, 1:], jnp.zeros((B, 1), jnp.float32)],
                          axis=1),
                      stack))
        stack_size = jnp.where(
            mut2 & entering, stack_size + 1,
            jnp.where(mut2 & ~entering,
                      jnp.maximum(stack_size - 1, 0), stack_size))

        refl_dir = vm.reflect(d, nvec)
        weak_dir = jnp.where(stronger_refl[:, None],
                             vm.refract(d, nvec, eta2), refl_dir)
        weak_o = jnp.where(
            stronger_refl[:, None],
            surf.loc - nvec * 1e-4, surf.loc + nvec * 1e-6)
        # Degenerate sampled refract (TIR): the reference traces the zero
        # vector, every intersection fails, and the sample shades as a
        # miss — bgCol of the zero direction (raytrace.glsl:879 + :678).
        # Dead lanes also take the harmless substitute ray; both cases'
        # shades are replaced below / masked out.
        weak_bad = vm.dot(weak_dir, weak_dir) < 1e-12
        weak_dir = jnp.where((active & ~weak_bad)[:, None], weak_dir, d)
        w_hit, w_surf, w_m = _query(weak_o, weak_dir, scene, info, params)
        w_flat, state = shade(w_hit, w_surf, w_m, weak_dir, state)
        zero_sky = sky_color(scene.tex_data, scene.tex_sizes, f3(0.0))
        w_flat = jnp.where(weak_bad[:, None], zero_sky, w_flat)
        weak_co = jnp.where(stronger_refl, trans_co, refl_co)
        inner = jnp.where((weak_co > 0.0)[:, None],
                          vm.mix(flat, w_flat, weak_co[:, None]), flat)
        col = jnp.where(upd[:, None], vm.mix(col, inner, thr), col)
        rays = rays + jnp.sum(upd.astype(jnp.float32))

        # --- follow the stronger branch (:881-895) -----------------------
        perturb = jnp.where(
            (m.Pr > 0.0)[:, None],
            m.Pr[:, None] * jnp.stack([
                _glsl_rand(surf.loc) * 2.0 - 1.0,
                _glsl_rand(surf.loc + d) * 2.0 - 1.0,
                _glsl_rand(surf.loc + 2.0 * d
                           + jnp.where(hit.kind == 1, hit.tri,
                                       hit.prim)[:, None]
                           .astype(jnp.float32)) * 2.0 - 1.0,
            ], axis=-1),
            0.0)
        refr_follow = vm.refract(d, nvec, eta) + perturb
        refr_bad = vm.dot(refr_follow, refr_follow) < 1e-12
        refr_follow = jnp.where(refr_bad[:, None],
                                d, vm.normalize(refr_follow))
        next_d = jnp.where(stronger_refl[:, None], refl_dir, refr_follow)
        next_o = jnp.where(stronger_refl[:, None],
                           surf.loc + nvec * 1e-4, surf.loc - nvec * 1e-4)
        next_d = jnp.where(active[:, None], next_d, d)
        next_o = jnp.where(active[:, None], next_o, surf.loc)
        thr = jnp.where(
            upd[:, None],
            thr * jnp.where(stronger_refl, refl_co, trans_co)[:, None],
            thr)
        was_in = jnp.where(upd, in_obj, was_in)

        d = next_d
        hit, surf, m = _query(next_o, next_d, scene, info, params)
        rays = rays + jnp.sum(active.astype(jnp.float32))

    # loop exhausted without a return: pathTrace returns col (:898)
    result = jnp.where(active[:, None], col, result)
    return result, state, rays
