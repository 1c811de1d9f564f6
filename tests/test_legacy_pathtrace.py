"""Legacy DETERMINISTIC pathTrace (shade/arealights.path_trace — the dead
compute shader's integrator, raytrace.glsl:781-899), pinned by a scalar
float64 transcription oracle like the rest of the legacy family.

The oracle below re-implements the recursion from the GLSL directly on top
of tests/glsl_ref.py's scalar primitives (ray_scene_ellipsoids, reflect,
refract, fresnel) — an independent implementation, compared whole-image
against the batched TPU integrator. sample_res=0 keeps shadePoint fully
lit (intensity=1, raytrace.glsl:735) so both sides are deterministic and
consume zero RNG draws.

Documented deviations mirrored in the oracle (PARITY.md / module docs):
  * the emissive early-return gates on |Ke| > 0 (the reference's own
    EmissionStrength>0 gate is a dead-code bug — Density defaults to 1);
  * the Phong specular pow base is clamped to [0,1] (GLSL pow of a
    negative base with fractional exponent is undefined; jnp would NaN);
  * smallest-strictly-positive ellipsoid root (PARITY.md #3).
"""
import math

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer0_tpu import Scene, RenderConfig
from pathtracer0_tpu.core import rng as vrng
from pathtracer0_tpu.render.renderer import render_frame, _frame_params
from pathtracer0_tpu.shade import arealights

from . import glsl_ref as G

AIR = 1.0029


# --------------------------------------------------------------------------
# scalar oracle
# --------------------------------------------------------------------------

def _smix(a, b, t):
    return a * (1.0 - t) + b * t


def _vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _vscale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _shade_point_oracle(rec, d, mats, lights, sky):
    """Scalar shadePoint (raytrace.glsl:676-758) with SAMPLE_RES=0:
    every light fully lit, no shadow rays. rec = (t, N, mat, loc, uv) or
    None for a miss; lights = list of (center, light_mat_idx)."""
    if rec is None:
        return sky
    _, N, mat_idx, loc, _ = rec
    m = mats[mat_idx]
    if max(m["Ke"]) > 0.0:
        return _vscale(m["Ke"], m["Density"])
    flip = -1.0 if G._dot(N, d) > 0.0 else 1.0
    n = _vscale(G._norm(N), flip)
    col = [0.0, 0.0, 0.0]
    did_ambient = False
    for center, lmat_idx in lights:
        lm = mats[lmat_idx]
        i_d = lm["Ke"]
        intensity = 1.0  # SAMPLE_RES <= 0, raytrace.glsl:735
        l_dir = G._norm((center[0] - loc[0], center[1] - loc[1],
                         center[2] - loc[2]))
        lambert = max(0.0, min(1.0, G._dot(n, l_dir)))
        diffuse = tuple(m["Kd"][i] * i_d[i] * intensity * lambert
                        for i in range(3))
        v_dir = G._norm((-d[0], -d[1], -d[2]))
        r_dir = G._norm(_vadd(_vscale(n, 2.0 * G._dot(l_dir, n)),
                              _vscale(l_dir, -1.0)))
        base = max(0.0, min(1.0, G._dot(r_dir, v_dir)))
        spec = tuple(max(0.0, m["Ks"][i] * lm["Ks"][i]
                         * (base ** m["Ns"]) * i_d[i] * intensity)
                     for i in range(3))
        add_amb = (not did_ambient) and m["illum"] >= 1
        for i in range(3):
            col[i] += diffuse[i]
            if add_amb:
                col[i] += m["Ka"][i]
            if m["illum"] == 2:
                col[i] += spec[i]
        did_ambient = did_ambient or m["illum"] >= 1
    return tuple(col)


def _legacy_fresnel_oracle(n1, n2, normal, incidence, pm):
    f = G.fresnel_reflect_amount(n1, n2, normal, incidence)
    return pm + (1.0 - pm) * f


def _path_trace_oracle(o, d, ells, mats, lights, sky, max_bounces):
    """Scalar raytrace.glsl:781-899 on the analytic-ellipsoid scene."""
    query = lambda o_, d_: G.ray_scene_ellipsoids(o_, d_, ells)

    def shade(rec, d_):
        return _shade_point_oracle(rec, d_, mats, lights, sky)

    # prologue (:782-799)
    st = [0.0] * 10
    st[0] = AIR
    size = 1

    def push(x):
        nonlocal st, size
        st = [x] + st[:-1]
        size = min(size + 1, 10)

    def pop():
        nonlocal st, size
        st = st[1:] + [0.0]
        size = max(size - 1, 0)

    rec = query(o, d)
    mat_filter = (1.0, 1.0, 1.0)
    in_obj = was_in = False
    enter_loc = (0.0, 0.0, 0.0)
    if rec is not None and G._dot(rec[1], d) > 0.0:
        in_obj = was_in = True
        enter_loc = rec[3]
        m = mats[rec[2]]
        mat_filter = m["Tf"]
        push(m["Ni"])

    col = (0.0, 0.0, 0.0)
    thr = (1.0, 1.0, 1.0)
    for _ in range(max_bounces):
        flat = shade(rec, d)
        if rec is None:
            return tuple(_smix(col[i], flat[i], thr[i]) for i in range(3))
        d = G._norm(d)
        _, N, mat_idx, loc, _ = rec
        m = mats[mat_idx]
        nd = G._dot(N, d)
        flip = -1.0 if nd > 0.0 else 1.0
        nvec = _vscale(N, flip)
        entering = nd < 0.0

        if entering:
            in_obj = True
            mat_filter = m["Tf"]
            enter_loc = loc
            push(m["Ni"])
            eta = st[1] / st[0]
            n1, n2 = st[1], st[0]
        else:
            in_obj = False
            eta = st[0] / st[1] if st[1] != 0.0 else math.inf
            n1, n2 = st[0], st[1]
            pop()
        fres = (_legacy_fresnel_oracle(n1, n2, nvec, d, m["Pm"])
                if (m["Pm"] > 0.0 or m["Tr"] > 0.0) else 0.0)

        if was_in and not in_obj:
            dist = math.dist(enter_loc, loc)
            absorb = tuple(math.exp(-dist / max(mat_filter[i], 1e-30))
                           for i in range(3))
        else:
            absorb = (1.0, 1.0, 1.0)
        thr = tuple(thr[i] * absorb[i] for i in range(3))

        refl_co = fres
        trans_co = m["Tr"] * (1.0 - fres)
        if refl_co + trans_co == 0.0:
            return tuple(_smix(col[i], flat[i], thr[i]) for i in range(3))

        if refl_co > trans_co:
            # sample one refract ray, follow the reflect ray (:846-881)
            if trans_co > 0.0:
                if entering:
                    push(m["Ni"])
                    eta2 = st[1] / st[0]
                else:
                    eta2 = st[0] / st[1] if st[1] != 0.0 else math.inf
                    pop()
                refr = G.refract(d, nvec, eta2)
                # TIR: GLSL traces the zero vector — every intersection
                # fails, so the sample shades as a miss (bgCol)
                if refr == (0.0, 0.0, 0.0):
                    w_rec = None
                else:
                    w_rec = query(_vadd(loc, _vscale(nvec, -1e-4)), refr)
                w_flat = shade(w_rec, refr)
                inner = tuple(_smix(flat[i], w_flat[i], trans_co)
                              for i in range(3))
                col = tuple(_smix(col[i], inner[i], thr[i])
                            for i in range(3))
            else:
                col = tuple(_smix(col[i], flat[i], thr[i])
                            for i in range(3))
            refl = G.reflect(d, nvec)
            rec = query(_vadd(loc, _vscale(nvec, 1e-4)), refl)
            d = refl
            thr = _vscale(thr, refl_co)
        else:
            # sample one reflect ray, follow the refract ray (:883-895)
            if refl_co > 0.0:
                refl = G.reflect(d, nvec)
                w_rec = query(_vadd(loc, _vscale(nvec, 1e-6)), refl)
                w_flat = shade(w_rec, refl)
                inner = tuple(_smix(flat[i], w_flat[i], refl_co)
                              for i in range(3))
                col = tuple(_smix(col[i], inner[i], thr[i])
                            for i in range(3))
            else:
                col = tuple(_smix(col[i], flat[i], thr[i])
                            for i in range(3))
            refr = G._norm(G.refract(d, nvec, eta))  # Pr == 0 in tests
            rec = query(_vadd(loc, _vscale(nvec, -1e-4)), refr)
            d = refr
            thr = _vscale(thr, trans_co)
        was_in = in_obj
    return col


# --------------------------------------------------------------------------
# scene
# --------------------------------------------------------------------------

SKY = (0.18, 0.24, 0.32)


def _scene():
    sc = Scene()
    sc.set_constant_sky(SKY)
    sc.add_material("ground")          # 0: Phong diffuse, illum 2
    sc.set_last_mtl("Pr", 0.0)
    sc.set_last_mtl("Kd", (0.55, 0.5, 0.45))
    sc.set_last_mtl("Ka", (0.03, 0.03, 0.03))
    sc.set_last_mtl("Ks", (0.3, 0.3, 0.3))
    sc.set_last_mtl("Ns", 24.0)
    sc.set_last_mtl("illum", 2)
    sc.add_material("glass")           # 1: refractive with absorption
    sc.set_last_mtl("Pr", 0.0)         # Pr defaults to 1 (reference
                                       # parity) = glossy refraction; the
                                       # oracle models the sharp path
    sc.set_last_mtl("Kd", (0.1, 0.1, 0.1))
    sc.set_last_mtl("Tr", 0.92)
    sc.set_last_mtl("Ni", 1.5)
    sc.set_last_mtl("Tf", (0.9, 0.75, 0.85))
    sc.set_last_mtl("illum", 1)
    sc.add_material("metal")           # 2: Fresnel-boosted mirror
    sc.set_last_mtl("Pr", 0.0)
    sc.set_last_mtl("Kd", (0.2, 0.2, 0.25))
    sc.set_last_mtl("Ks", (0.5, 0.5, 0.5))
    sc.set_last_mtl("Ns", 64.0)
    sc.set_last_mtl("Pm", 0.7)
    sc.set_last_mtl("illum", 2)
    sc.add_material("light")           # 3: emissive
    sc.set_last_mtl("Pr", 0.0)
    sc.set_last_mtl("Ke", (4.0, 3.6, 3.0))
    sc.add_sphere((0.0, -100.6, 5.0), 100.0, m=0)
    sc.add_sphere((-0.9, 0.1, 4.0), 0.7, m=1)
    sc.add_sphere((1.0, 0.2, 5.0), 0.8, m=2)
    sc.add_emissive_sphere((0.0, 2.6, 4.5), 0.5, m=3)
    return sc


def _rays(nx=12, ny=9):
    o = np.zeros((nx * ny, 3), np.float32)
    d = np.zeros((nx * ny, 3), np.float32)
    k = 0
    for j in range(ny):
        for i in range(nx):
            x = -0.8 + 1.6 * i / (nx - 1)
            y = -0.55 + 1.1 * j / (ny - 1)
            v = np.asarray([x, y, 1.0], np.float64)
            d[k] = (v / np.linalg.norm(v)).astype(np.float32)
            k += 1
    return o, d


def test_oracle_parity():
    """Whole-batch parity: batched integrator vs the scalar transcription."""
    sc = _scene()
    cfg = RenderConfig(raytracing=True, legacy_pathtrace=True,
                       auto_focus=False, blur=0.0, max_bounces=4)
    dev, info = sc.build(cfg)
    params = _frame_params(cfg)

    o, d = _rays()
    state = vrng.seed(jnp.arange(o.shape[0], dtype=jnp.uint32),
                      jnp.uint32(7))
    col, _, rays = arealights.path_trace(
        jnp.asarray(o), jnp.asarray(d), state, dev, info, params,
        sample_res=0, max_bounces=4)
    col = np.asarray(col)
    assert np.isfinite(col).all()
    assert float(rays) > o.shape[0]  # prologue + bounce queries counted

    ells = [dict(c=tuple(map(float, np.asarray(dev.ell_c)[i])),
                 r=float(np.asarray(dev.ell_rad)[i]),
                 stretch=tuple(map(float, np.asarray(dev.ell_stretch)[i])),
                 mat=int(np.asarray(dev.ell_mat)[i]))
            for i in range(info.num_ellipsoids)]
    mats = [G.mtl_dict(m) for m in sc.materials]
    for mm, m in zip(mats, sc.materials):
        mm["Ka"] = tuple(m.Ka)
        mm["Ns"] = float(m.Ns)
    lights = [(tuple(map(float, info.light_centers[i])),
               int(info.lights[i][3])) for i in range(len(info.lights))]

    worst = 0.0
    for k in range(o.shape[0]):
        ref = _path_trace_oracle(tuple(map(float, o[k])),
                                 tuple(map(float, d[k])),
                                 ells, mats, lights, SKY, 4)
        err = max(abs(col[k][i] - ref[i]) for i in range(3))
        worst = max(worst, err)
        assert err < 3e-3, (k, tuple(col[k]), ref)
    # the scene exercises all three terminations: miss, opaque, recursion
    assert worst < 3e-3


def test_deterministic_and_renderer_integration():
    """spp acts as SAMPLE_RES; sample_res=0 frames are bit-identical, and
    the public render_frame path dispatches the legacy integrator."""
    sc = _scene()
    cfg = RenderConfig(width=24, height=18, samples_per_frame=0,
                       raytracing=True, legacy_pathtrace=True,
                       auto_focus=False, blur=0.0, max_bounces=3)
    dev, info = sc.build(cfg)
    kw = dict(info=info, params=_frame_params(cfg), width=24, height=18,
              spp=0, raytracing=True, auto_focus=False,
              cam_size=cfg.cam_size, focal_length=cfg.focal_length,
              blur=0.0, focal_distance=cfg.focal_distance)
    img1, r1 = render_frame(dev, jnp.zeros(3), jnp.zeros(3),
                            jnp.uint32(3), **kw)
    img2, _ = render_frame(dev, jnp.zeros(3), jnp.zeros(3),
                           jnp.uint32(11), **kw)  # seed must not matter
    img1, img2 = np.asarray(img1), np.asarray(img2)
    assert np.isfinite(img1).all()
    assert img1.max() > 0.05
    np.testing.assert_array_equal(img1, img2)
    assert float(r1) > 0


def test_soft_shadow_jitter_consumes_rng():
    """With sample_res >= 1 the shadow jitter draws from the counted RNG
    (the stream advances); with sample_res = 0 the integrator is draw-free
    (the determinism contract the oracle test relies on)."""
    sc = _scene()
    cfg = RenderConfig(raytracing=True, legacy_pathtrace=True,
                       auto_focus=False, blur=0.0, max_bounces=2)
    dev, info = sc.build(cfg)
    params = _frame_params(cfg)
    o, d = _rays(8, 6)
    state0 = vrng.seed(jnp.arange(o.shape[0], dtype=jnp.uint32),
                       jnp.uint32(5))
    col1, s1, _ = arealights.path_trace(
        jnp.asarray(o), jnp.asarray(d), state0, dev, info, params,
        sample_res=1, max_bounces=2)
    col0, s0, _ = arealights.path_trace(
        jnp.asarray(o), jnp.asarray(d), state0, dev, info, params,
        sample_res=0, max_bounces=2)
    assert np.isfinite(np.asarray(col1)).all()
    assert np.isfinite(np.asarray(col0)).all()
    assert not np.array_equal(np.asarray(s1), np.asarray(state0))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(state0))
