"""Integrators: path `trace` and Whitted `directDiffuse`.

Faithful ports of frag.glsl:810-882 (trace) and frag.glsl:655-681
(directDiffuse), restructured as wavefront megabatch loops: every ray in the
(B,)-batch advances one bounce per `lax.while_loop` iteration, with masked
updates for finished rays; the loop exits early once every ray is done.

Per-bounce order matches the shader exactly:
  hit -> material decode + maps -> normal flip by sign(N.D) ->
  refraction-stack push (entering) / pop (exiting) to derive n1, n2 ->
  chooseRay -> transmission medium bookkeeping -> incLight += Ke*col ->
  throughput cutoff |col| < 0.1 -> Beer-Lambert absorption OR subsurface
  passthrough OR col *= (specular ? Ks : Kd); miss adds sky*col and ends.

Deliberate deviations (PARITY.md): APPLY_ABSORBTION / DISTANCE_TRAVELED /
RAY_ENTER_LOCATION are per-ray loop state initialized fresh per trace (the
GLSL globals leak across samples, frag.glsl:160-166); Whitted SSS thickness
uses the actual re-trace distance (the shader measures distance to the raw
(t,u,v) triple, frag.glsl:668).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as vm
from ..core import rng as vrng
from ..kernels import traverse
from ..shade import bsdf, mtl as mtl_mod
from ..scene.texture import sky_color

AIR_IOR = np.float32(1.0029)  # frag.glsl:816


class TraceParams(NamedTuple):
    """Static compile-time knobs for the integrators."""

    max_bounces: int
    stack_depth: int = 64
    refraction_stack: int = 10
    use_textures: bool = True
    normal_mapping: bool = True
    # "auto" | "on" | "interpret" | "off" — see kernels.traverse.ray_scene
    pallas: str = "auto"
    # fused path-trace megakernel (kernels/fused.py): the whole bounce loop
    # in one Pallas launch. "auto" = on for TPU backends when the scene is
    # eligible (VMEM-resident brute forest or analytic-only, no texture
    # maps); "on"/"interpret" force it (interpret for CPU tests); "off"
    # uses the per-bounce wavefront pipeline below.
    fused: str = "auto"
    # sort rays by direction octant between bounces (packet coherence).
    # Off by default: measured on v5e the argsort + gather + scatter-back
    # costs ~2.4x the unsorted traversal on a 480k-ray batch — packet
    # any-hit gating already tolerates incoherence for VMEM-resident
    # forests. Revisit for HBM-streamed scenes where a visit is a DMA.
    sort_rays: bool = False
    # OPT-IN legacy Phong + emissive-disk area lights (the reference's
    # dead compute-shader subsystem, shade/arealights.py); applies in
    # Whitted mode (raytracing=False) when the scene has disk lights
    legacy_shading: bool = False
    # OPT-IN legacy deterministic pathTrace (raytrace.glsl:781-899,
    # shade/arealights.path_trace); applies in raytracing mode
    legacy_pathtrace: bool = False
    # rays per on-device chunk (render/renderer.render_rays splits larger
    # frames with lax.map to bound live memory); 0 = never chunk
    ray_batch_size: int = 1 << 20
    # fold the spp loop into the ray axis (render/renderer.render_rays):
    # one megabatch of spp*N rays instead of spp sequential passes.
    # Measured SLOWER on v5e at 800x600x4spp (244 vs 180 ms/frame — the
    # bigger while_loop carry outweighs the dispatch savings), so off by
    # default; samples would also get independent RNG streams instead of
    # the reference's carried per-pixel stream (PARITY.md #13).
    fold_spp: bool = False


def _shade_setup(hit, o_nudged, d, scene, params, info=None):
    """Closest hit -> surface attrs + mapped material + flipped normal.

    The mapMtl/TBN stages are compile-time gated on the scene actually
    referencing texture maps (info.has_maps) — for map-free scenes the
    12 bilinear samples/ray/bounce vanish from the compiled program.
    """
    maps_on = params.use_textures and (info is None or info.has_maps)
    norm_on = (params.use_textures and params.normal_mapping
               and (info is None or info.has_normal_maps))
    surf = traverse.surface_sample(hit, o_nudged, d, scene, info=info)
    m, rec = mtl_mod.decode(scene.materials, surf.mat)
    m = mtl_mod.apply_maps(
        m, rec, surf.uv, scene.tex_data, scene.tex_sizes, enable=maps_on,
        present=None if info is None else getattr(info, "maps_present",
                                                  None),
    )
    n = mtl_mod.shading_normal(
        m, surf.norm, surf.tangent, surf.uv, scene.tex_data,
        scene.tex_sizes, enable=norm_on,
    )
    return surf, m, n


def trace(origins, directions, state, scene, info, params: TraceParams):
    """Path integrator over a megabatch: origins/directions (B, 3), state
    (B,) uint32 RNG. Returns (incLight (B, 3), new RNG state, rays_traced)
    where rays_traced counts scene queries issued for live rays (the
    Mrays/s accounting unit)."""
    # Fused megakernel fast path: identical semantics (bit-identical RNG
    # streams, same bounce order), whole loop in one Pallas launch.
    from ..kernels import fused as fused_mod

    use_fused = False
    fused_interp = False
    if params.fused == "auto":
        use_fused = (jax.default_backend() != "cpu"
                     and fused_mod.eligible(info, scene, params))
    elif params.fused in ("on", "interpret"):
        use_fused = fused_mod.eligible(info, scene, params)
        fused_interp = params.fused == "interpret"
        if not use_fused:
            # ADVICE r3 #4: a forced fused request must not fall through
            # silently — the caller asked for the megakernel specifically
            import warnings

            warnings.warn(
                f"params.fused={params.fused!r} requested but the scene "
                "is not fused-eligible (streamed, oversized maps/material "
                "table, or no dense tables); using the per-bounce "
                "pipeline", stacklevel=2)
    if use_fused:
        return fused_mod.trace_fused(
            origins, directions, state, scene, info, params,
            interpret=fused_interp,
        )

    B = origins.shape[0]
    f3 = lambda v: jnp.full((B, 3), v, jnp.float32)

    # Refraction index stack: (B, S) + size, initialized with air
    # (frag.glsl:815-816).
    S = params.refraction_stack
    stack0 = jnp.zeros((B, S), jnp.float32).at[:, 0].set(AIR_IOR)

    class C(NamedTuple):
        bounce: jax.Array
        alive: jax.Array
        o: jax.Array
        d: jax.Array
        col: jax.Array
        inc: jax.Array
        stack: jax.Array
        stack_size: jax.Array
        in_object: jax.Array
        enter_loc: jax.Array
        state: jax.Array
        rays: jax.Array  # scene queries issued for live rays
        missed: jax.Array    # (B,) ray terminated by a sky miss
        miss_col: jax.Array  # (B, 3) throughput at the miss

    init = C(
        bounce=jnp.int32(0),
        alive=jnp.ones((B,), bool),
        o=origins,
        d=directions,
        col=f3(1.0),
        inc=f3(0.0),
        stack=stack0,
        stack_size=jnp.ones((B,), jnp.int32),
        in_object=jnp.zeros((B,), bool),
        enter_loc=f3(0.0),
        state=state,
        rays=jnp.zeros((), jnp.float32),
        missed=jnp.zeros((B,), bool),
        miss_col=f3(0.0),
    )

    def cond(c):
        return (c.bounce < params.max_bounces) & jnp.any(c.alive)

    def body(c):
        # Octant-sorting restores packet coherence for bounce rays; the
        # sort is stable, so image-ordered primary rays stay coherent too.
        hit, o_nudged = traverse.ray_scene(
            c.o, c.d, scene, info, stack_depth=params.stack_depth,
            pallas=params.pallas, active=c.alive,
            sort_rays=params.sort_rays,
        )
        is_hit = c.alive & hit.is_hit
        is_miss = c.alive & ~hit.is_hit

        surf, m, n_raw = _shade_setup(hit, o_nudged, c.d, scene, params,
                                      info=info)
        new_o = surf.loc

        nd = vm.dot(n_raw, c.d)
        n = n_raw * jnp.where(nd > 0.0, -1.0, 1.0)[..., None]

        # --- refraction-index stack (frag.glsl:832-841) -------------------
        entering = nd < 0.0
        # push-front m.Ni when entering (bounded by stack depth)
        can_push = c.stack_size < S
        pushed = jnp.where(
            (entering & can_push)[:, None],
            jnp.concatenate([m.Ni[:, None], c.stack[:, : S - 1]], axis=1),
            c.stack,
        )
        size_after_push = jnp.where(
            entering & can_push, c.stack_size + 1, c.stack_size
        )
        n1 = jnp.where(entering, pushed[:, 1], c.stack[:, 0])
        n2 = jnp.where(entering, pushed[:, 0], c.stack[:, 1])
        # pop-front when exiting
        can_pop = c.stack_size > 0
        popped = jnp.where(
            ((~entering) & can_pop)[:, None],
            jnp.concatenate(
                [c.stack[:, 1:], jnp.zeros((B, 1), jnp.float32)], axis=1
            ),
            pushed,
        )
        new_size = jnp.where(
            (~entering) & can_pop, c.stack_size - 1, size_after_push
        )

        # --- lobe selection (frag.glsl:843-846) ---------------------------
        choice = bsdf.choose_ray(m, n1, n2, n, c.d, c.state)
        is_specular = choice.win_type == 2
        new_d = choice.direction
        # RNG advances only for rays that actually shaded this bounce
        new_state = jnp.where(is_hit, choice.state, c.state)

        # --- transmission medium bookkeeping (frag.glsl:847-863) ----------
        transmitted = choice.win_type == 3
        dist = vm.distance(c.enter_loc, new_o)
        apply_absorb = transmitted & jnp.where(
            entering, c.in_object, jnp.ones_like(c.in_object)
        )
        new_in_object = jnp.where(
            transmitted, entering, c.in_object
        )
        new_enter_loc = jnp.where(
            (transmitted & entering)[:, None], new_o, c.enter_loc
        )

        # --- light transport (frag.glsl:865-874) --------------------------
        inc = c.inc + jnp.where(is_hit[:, None], m.Ke * c.col, 0.0)
        cutoff = vm.length(c.col) < 0.1  # frag.glsl:866
        absorbed = c.col * jnp.exp(-m.Tf * dist[:, None] * m.Density[:, None])
        ks_kd = jnp.where(is_specular[:, None], m.Ks, m.Kd)
        passthrough = choice.win_type == 4  # subsurface: col unchanged
        new_col = jnp.where(
            apply_absorb[:, None],
            absorbed,
            jnp.where(passthrough[:, None], c.col, c.col * ks_kd),
        )

        # --- miss: sky (frag.glsl:875-879), DEFERRED: a missed ray
        # terminates, so its single sky contribution is recorded (direction
        # stays in c.d — masked updates never overwrite a dead ray's d) and
        # evaluated once after the loop instead of per bounce. bgCol
        # receives D unnormalized, exactly like the shader (the equirect
        # arcsin is clipped to the valid domain; GLSL leaves out-of-range
        # asin undefined).
        missed = c.missed | is_miss
        miss_col = jnp.where(is_miss[:, None], c.col, c.miss_col)

        # --- commit masked updates -----------------------------------------
        live = is_hit & ~cutoff
        upd = lambda new, old: jnp.where(is_hit[:, None], new, old)
        return C(
            bounce=c.bounce + 1,
            alive=live,
            o=upd(new_o, c.o),
            d=upd(new_d, c.d),
            col=upd(new_col, c.col),
            inc=inc,
            stack=jnp.where(is_hit[:, None], popped, c.stack),
            stack_size=jnp.where(is_hit, new_size, c.stack_size),
            in_object=jnp.where(is_hit, new_in_object, c.in_object),
            enter_loc=upd(new_enter_loc, c.enter_loc),
            state=new_state,
            rays=c.rays + jnp.sum(c.alive.astype(jnp.float32)),
            missed=missed,
            miss_col=miss_col,
        )

    final = jax.lax.while_loop(cond, body, init)
    sky = sky_color(scene.tex_data, scene.tex_sizes, final.d)
    inc = final.inc + jnp.where(
        final.missed[:, None], sky * final.miss_col, 0.0
    )
    return inc, final.state, final.rays


def direct_diffuse(origins, directions, scene, info, params: TraceParams):
    """Whitted-mode single-bounce shade (frag.glsl:655-681):
    col = Ka + 0.2*Kd + Kd*dot(up, N) + Ke, with the thickness-probe
    subsurface approximation; sky on miss."""
    hit, o_nudged = traverse.ray_scene(
        origins, directions, scene, info, stack_depth=params.stack_depth,
        pallas=params.pallas,
    )
    surf, m, n = _shade_setup(hit, o_nudged, directions, scene, params,
                              info=info)

    up_dot = n[..., 1]  # dot((0,1,0), N)
    col = m.Ka + m.Kd * 0.2 + m.Kd * up_dot[..., None] + m.Ke

    # Subsurface thickness probe: re-trace the same direction from the hit
    # point through the parent object (frag.glsl:662-676). PARITY.md #4:
    # we use the re-trace hit DISTANCE (the shader measures distance to the
    # raw (t,u,v) triple it mislabels as a location).
    #
    # On the packet path the probe queries the WHOLE forest, not just the
    # parent object (the reference restricts to the parent BVH): the result
    # differs only when another object intersects the probe segment inside
    # the parent. The per-object vmapped probe is kept for the XLA path —
    # it cannot run batched on TPU (large vmapped stack-walks fault the
    # TPU worker; observed on v5e).
    if info.num_objects > 0 or info.streamed:
        si = traverse.probe_forest_t(
            surf.loc, directions, scene, info, parent=hit.obj,
            stack_depth=params.stack_depth, pallas=params.pallas,
        )
        sigma_t = 1.0 / jnp.maximum(m.subsurfaceRadius, 1e-4)
        ss_light = jnp.exp(-sigma_t * si[..., None]) * m.subsurfaceColor
        col = jnp.where((m.subsurface > 0.0)[..., None], ss_light, col)

    sky = sky_color(scene.tex_data, scene.tex_sizes, directions)
    return jnp.where(hit.is_hit[..., None], col, sky)
