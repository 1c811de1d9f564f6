"""Fused megakernel (kernels/fused.py) parity vs the per-bounce pipeline.

The fused kernel replicates integrator.trace op-for-op: RNG streams are
bit-identical by construction (the uint32->f32 convert is an exact hi/lo
split), and geometry/shading arithmetic uses the same formulas in the same
order. Residual differences come from XLA fusion (FMA contraction) flipping
knife-edge comparisons on isolated lanes — the tests therefore require
near-total exactness (>= 99% of lanes bit-equal RNG state, tiny mean image
difference) rather than full bit-equality, matching the repo's established
knife-edge tolerance practice (tests/test_goldens.py).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer0_tpu import Scene, scenes
from pathtracer0_tpu.render.integrator import trace, TraceParams
from pathtracer0_tpu.core import camera, rng as vrng
from pathtracer0_tpu.kernels import fused


def _rays(builder, cam_key, W=40, H=30, seed=777):
    dev, info = builder().build(max_leaf=4)
    cam, rot = scenes.CAMERAS[cam_key]
    uv, index = camera.pixel_centers(W, H)
    d = camera.primary_directions(
        uv, jnp.asarray(rot, jnp.float32), 1.5, 1.0, H / W)
    o = jnp.broadcast_to(jnp.asarray(cam, jnp.float32), d.shape)
    return dev, info, o, d, vrng.seed(index, seed)


CASES = [
    ("metal_glass", scenes.metal_glass, 2),   # analytic: glass/Beer-Lambert
    ("obj_bvh", scenes.obj_bvh, 3),           # triangles + BVH + analytic
    ("full_pbr", scenes.full_pbr, 4),         # clearcoat, SSS, implicit,
                                              # rotated ellipsoid
    ("textured", scenes.textured, 6),         # in-kernel mapMtl + TBN
]


@pytest.mark.parametrize("name,builder,key", CASES, ids=[c[0] for c in CASES])
def test_trace_parity(name, builder, key):
    dev, info, o, d, state = _rays(builder, key)
    p_ref = TraceParams(max_bounces=4, fused="off", pallas="off")
    p_fus = TraceParams(max_bounces=4, fused="interpret", pallas="off")
    assert fused.eligible(info, dev, p_fus), f"{name} should be eligible"
    inc0, st0, r0 = trace(o, d, state, dev, info, p_ref)
    inc1, st1, r1 = trace(o, d, state, dev, info, p_fus)
    inc0, inc1 = np.asarray(inc0), np.asarray(inc1)
    assert np.isfinite(inc1).all()
    # RNG streams: bit-equal except knife-edge lanes
    state_eq = (np.asarray(st0) == np.asarray(st1)).mean()
    assert state_eq >= 0.99, state_eq
    # radiance: tiny mean difference; divergent lanes are isolated
    diff = np.abs(inc0 - inc1).max(axis=1)
    assert (diff < 1e-4).mean() >= 0.99, diff.max()
    assert np.abs(inc0 - inc1).mean() < 5e-3
    # ray accounting within the knife-edge budget
    assert abs(float(r0) - float(r1)) <= 0.01 * float(r0) + 16


def test_rng_helpers_bit_exact():
    """The in-kernel RNG helpers must reproduce core/rng.py exactly (they
    are closed-form affine jumps + the same extract), including the
    uint32->float conversion."""
    state = jnp.asarray(
        np.random.RandomState(3).randint(0, 2 ** 31, 4096, dtype=np.int64)
        .astype(np.uint32))
    for off in (1, 2, 5, 8):
        a, c = fused._affine_consts(off)
        ref = np.asarray(vrng.advance(state, off))
        mine = np.asarray(state * a + c)
        assert np.array_equal(ref, mine), off
        u_ref = np.asarray(vrng.peek_uniform(state, off))
        # outside pallas, bitcast == view; emulate _u32_to_f32
        bits = np.asarray(vrng._extract(vrng.advance(state, off)))
        hi = (bits >> 16).view(np.int32).astype(np.float32)
        lo = (bits & 0xFFFF).view(np.int32).astype(np.float32)
        u_mine = ((hi * np.float32(65536.0) + lo)
                  * np.float32(1.0 / 4294967295.0))
        assert np.array_equal(u_ref, u_mine), off


def test_dead_lane_padding():
    """Padding lanes (alive=0) must contribute nothing and never poison
    live lanes with NaN."""
    dev, info, o, d, state = _rays(scenes.metal_glass, 2, W=17, H=13)
    p = TraceParams(max_bounces=3, fused="interpret", pallas="off")
    inc, st, rays = trace(o, d, state, dev, info, p)
    assert np.isfinite(np.asarray(inc)).all()
    # rays counted only for real lanes: <= B * bounces
    assert float(rays) <= o.shape[0] * 3


def test_frame_kernel_parity():
    """The whole-frame megakernel (raygen + DOF + spp loop + bounce loop in
    one launch, kernels/fused.render_fused_frame) must match the per-bounce
    pipeline image within the knife-edge tolerance, with identical ray
    accounting."""
    from pathtracer0_tpu.render.renderer import render_frame, _frame_params
    from pathtracer0_tpu.config import RenderConfig

    dev, info = scenes.metal_glass().build(max_leaf=4)
    cam, rot = scenes.CAMERAS[2]

    def go(fused):
        cfg = RenderConfig(width=40, height=24, samples_per_frame=2,
                           max_bounces=4, raytracing=True, auto_focus=False,
                           blur=0.001, fused=fused)
        img, rays = render_frame(
            dev, jnp.asarray(cam, jnp.float32),
            jnp.asarray(rot, jnp.float32), jnp.uint32(1234),
            info=info, params=_frame_params(cfg), width=cfg.width,
            height=cfg.height, spp=cfg.samples_per_frame, raytracing=True,
            auto_focus=False, cam_size=cfg.cam_size,
            focal_length=cfg.focal_length, blur=cfg.blur,
            focal_distance=cfg.focal_distance)
        return np.asarray(img), float(rays)

    a, ra = go("off")
    b, rb = go("interpret")  # forces render_fused_frame in interpret mode
    d = np.abs(a - b).max(axis=-1)
    assert np.isfinite(b).all()
    assert (d < 1e-4).mean() >= 0.99, d.max()
    assert np.abs(a - b).mean() < 5e-3
    assert abs(ra - rb) <= 0.01 * ra + 16


def test_frame_chunk_scan_invariance(monkeypatch):
    """render_fused_frame's sample-axis chunking must be invisible: a frame
    rolled through the lax.scan body (many small chunks) must equal the
    single-chunk launch. The RNG stream is chunk-invariant by construction
    (each chunk starts from the previous chunk's carried state) and chunk
    sums accumulate in sample order either way, so agreement is bit-level
    up to float addition in the deferred-sky reduction."""
    from pathtracer0_tpu.kernels import fused
    from pathtracer0_tpu.render.renderer import render_frame, _frame_params
    from pathtracer0_tpu.config import RenderConfig

    dev, info = scenes.metal_glass().build(max_leaf=4)
    cam, rot = scenes.CAMERAS[2]

    def go():
        cfg = RenderConfig(width=16, height=8, samples_per_frame=8,
                           max_bounces=3, raytracing=True, auto_focus=False,
                           blur=0.001, fused="interpret")
        img, rays = render_frame(
            dev, jnp.asarray(cam, jnp.float32),
            jnp.asarray(rot, jnp.float32), jnp.uint32(4321),
            info=info, params=_frame_params(cfg), width=cfg.width,
            height=cfg.height, spp=cfg.samples_per_frame, raytracing=True,
            auto_focus=False, cam_size=cfg.cam_size,
            focal_length=cfg.focal_length, blur=cfg.blur,
            focal_distance=cfg.focal_distance)
        return np.asarray(img), float(rays)

    one, r_one = go()                       # spp=8 < chunk: single launch
    monkeypatch.setattr(fused, "SPP_CHUNK", 2)
    scanned, r_scan = go()                  # 4 full chunks -> scan path
    assert np.isfinite(scanned).all()
    np.testing.assert_allclose(scanned, one, atol=1e-6)
    assert r_scan == r_one


def test_frame_kernel_whitted_parity():
    """Whitted mode of the whole-frame kernel (one in-kernel closest-hit +
    directDiffuse shade) vs the XLA direct_diffuse path."""
    from pathtracer0_tpu.render.renderer import render_frame, _frame_params
    from pathtracer0_tpu.config import RenderConfig

    dev, info = scenes.whitted_analytic().build(max_leaf=4)
    assert not info.mat_gates[0]  # no subsurface -> whitted-kernel eligible
    cam, rot = scenes.CAMERAS[1]

    def go(fused):
        cfg = RenderConfig(width=40, height=24, samples_per_frame=2,
                           max_bounces=2, raytracing=False, auto_focus=False,
                           blur=0.001, fused=fused)
        img, rays = render_frame(
            dev, jnp.asarray(cam, jnp.float32),
            jnp.asarray(rot, jnp.float32), jnp.uint32(77),
            info=info, params=_frame_params(cfg), width=cfg.width,
            height=cfg.height, spp=cfg.samples_per_frame, raytracing=False,
            auto_focus=False, cam_size=cfg.cam_size,
            focal_length=cfg.focal_length, blur=cfg.blur,
            focal_distance=cfg.focal_distance)
        return np.asarray(img), float(rays)

    a, ra = go("off")
    b, rb = go("interpret")
    d = np.abs(a - b).max(axis=-1)
    assert np.isfinite(b).all()
    assert (d < 1e-4).mean() >= 0.99, d.max()
    assert np.abs(a - b).mean() < 5e-3
    assert rb == ra


def test_fresnel_without_transmission():
    """Regression (round-3 review finding 1): a fresnel-illum material with
    NO transmissive material in the scene (gate_fresnel without gate_trans)
    must not crash the fused path — Ni feeds the live refraction stack."""
    sc = Scene()
    sc.set_constant_sky((0.4, 0.5, 0.7))
    sc.add_material("mirror5")
    sc.set_last_mtl("illum", 5)
    sc.set_last_mtl("Pm", 1.0)
    sc.set_last_mtl("Ni", 1.4)
    sc.add_sphere((0, 0, 3), 1.0, m=0)
    dev, info = sc.build()
    assert info.mat_gates[3] and not info.mat_gates[2]  # fresnel, no trans
    p = TraceParams(max_bounces=3, fused="interpret", pallas="off")
    assert fused.eligible(info, dev, p)
    uv, index = camera.pixel_centers(16, 12)
    d = camera.primary_directions(
        uv, jnp.zeros(3, jnp.float32), 1.5, 1.0, 12 / 16)
    o = jnp.zeros_like(d)
    inc, st, rays = trace(o, d, vrng.seed(index, 5), dev, info, p)
    assert np.isfinite(np.asarray(inc)).all()


def test_tiny_triangle_scene_not_dropped():
    """Regression (round-3 review finding 2): a scene whose dense fused
    table is exactly one row (1-14 triangles) must still intersect its
    triangles — the 1-row zero placeholder sentinel used to swallow them."""
    sc = Scene()
    sc.set_constant_sky((0.0, 0.0, 0.0))
    sc.add_material("glow")
    sc.set_last_mtl("Ke", (2.0, 0.0, 0.0))
    sc.add_tri((-2, -2, 4), (2, -2, 4), (0, 2.5, 4), 0)  # facing the camera
    dev, info = sc.build()
    assert dev.fs_tris.shape[0] > 1  # real table, not the placeholder
    p_ref = TraceParams(max_bounces=2, fused="off", pallas="off")
    p_fus = TraceParams(max_bounces=2, fused="interpret", pallas="off")
    assert fused.eligible(info, dev, p_fus)
    uv, index = camera.pixel_centers(16, 12)
    d = camera.primary_directions(
        uv, jnp.zeros(3, jnp.float32), 1.5, 1.0, 12 / 16)
    o = jnp.zeros_like(d)
    inc0, _, _ = trace(o, d, vrng.seed(index, 5), dev, info, p_ref)
    inc1, _, _ = trace(o, d, vrng.seed(index, 5), dev, info, p_fus)
    assert float(jnp.mean(inc0[:, 0])) > 0.1  # the emissive tri is visible
    assert abs(float(jnp.mean(inc1[:, 0])) -
               float(jnp.mean(inc0[:, 0]))) < 1e-3


def _mapped_sphere_scene(tex_h, tex_w):
    sc = Scene()
    sc.set_constant_sky((0.5, 0.5, 0.5))
    sc.add_material("mapped")
    tex = np.random.RandomState(0).rand(tex_h, tex_w, 3).astype(np.float32)
    idx = sc.textures.register_array(tex, "checker")
    sc.set_last_mtl("map_Kd", idx)
    sc.add_sphere((0, 0, 3), 1.0, m=0)
    return sc.build()


def test_map_eligibility_by_size():
    """Material maps up to 128x128 / 32768 total texels sample IN-KERNEL
    (round-5 lifted envelope — wide image rows span rows_per_y table rows
    like the 128-wide sky); maps past the budget keep the XLA mapMtl
    path (the whole-scene demotion tools/diag_bigmap measures)."""
    p = TraceParams(max_bounces=2)
    dev, info = _mapped_sphere_scene(8, 8)
    assert info.fs_maps_ok and fused.eligible(info, dev, p)
    dev, info = _mapped_sphere_scene(64, 64)
    assert info.fs_maps_ok and fused.eligible(info, dev, p)
    dev, info = _mapped_sphere_scene(128, 160)  # W=160 > MAP_MAX_W
    assert not info.fs_maps_ok and not fused.eligible(info, dev, p)
    dev, info = _mapped_sphere_scene(192, 192)  # > MAP_TEXEL_BUDGET
    assert not info.fs_maps_ok and not fused.eligible(info, dev, p)
    # textures off -> maps ignored, still eligible either way
    p_off = TraceParams(max_bounces=2, use_textures=False)
    assert fused.eligible(info, dev, p_off)
    assert fused.active_map_bindings(info, p_off) == ()


def test_wide_map_in_kernel_parity():
    """A 64x100 map_Kd (image rows span 3 table rows, rows_per_y > 1 —
    the round-5 lifted envelope) samples in-kernel bit-consistently with
    the XLA sample_bilinear path."""
    dev, info = _mapped_sphere_scene(64, 100)
    assert info.fs_maps_ok
    uv, index = camera.pixel_centers(24, 16)
    d = camera.primary_directions(
        uv, jnp.zeros(3, jnp.float32), 1.5, 1.0, 16 / 24)
    o = jnp.zeros_like(d)
    st = vrng.seed(index, 9)
    inc0, _, _ = trace(o, d, st, dev, info,
                       TraceParams(max_bounces=3, fused="off", pallas="off"))
    inc1, _, _ = trace(o, d, st, dev, info,
                       TraceParams(max_bounces=3, fused="interpret",
                                   pallas="off"))
    diff = np.abs(np.asarray(inc0) - np.asarray(inc1)).max(axis=1)
    assert (diff < 1e-4).mean() >= 0.99, diff.max()


def test_mapped_analytic_uv_semantics():
    """A mapped material on an ellipsoid samples at uv = (-1, -1)
    (REPEAT-wrapped), exactly like the XLA path's surface_sample
    sentinel — kernel and per-bounce pipeline must agree."""
    dev, info = _mapped_sphere_scene(8, 8)
    uv, index = camera.pixel_centers(24, 16)
    d = camera.primary_directions(
        uv, jnp.zeros(3, jnp.float32), 1.5, 1.0, 16 / 24)
    o = jnp.zeros_like(d)
    st = vrng.seed(index, 9)
    inc0, _, _ = trace(o, d, st, dev, info,
                       TraceParams(max_bounces=3, fused="off", pallas="off"))
    inc1, _, _ = trace(o, d, st, dev, info,
                       TraceParams(max_bounces=3, fused="interpret",
                                   pallas="off"))
    diff = np.abs(np.asarray(inc0) - np.asarray(inc1)).max(axis=1)
    assert (diff < 1e-4).mean() >= 0.99, diff.max()


def test_textured_whitted_frame_parity():
    """Whitted in-kernel mode applies map_Ka/map_Kd/map_Ke + normal
    mapping like integrator.direct_diffuse."""
    from pathtracer0_tpu.render.renderer import render_frame, _frame_params
    from pathtracer0_tpu import RenderConfig

    dev, info = scenes.textured().build(max_leaf=4)
    cam, rot = scenes.CAMERAS[6]
    cam = jnp.asarray(cam, jnp.float32)
    rot = jnp.asarray(rot, jnp.float32)

    def frame(fused_mode):
        cfg = RenderConfig(width=48, height=32, samples_per_frame=1,
                           max_bounces=2, raytracing=False,
                           auto_focus=False, blur=0.0, fused=fused_mode)
        img, _ = render_frame(
            dev, cam, rot, jnp.uint32(5), info=info,
            params=_frame_params(cfg), width=48, height=32, spp=1,
            raytracing=False, auto_focus=False, cam_size=cfg.cam_size,
            focal_length=cfg.focal_length, blur=0.0,
            focal_distance=cfg.focal_distance)
        return np.asarray(img)

    a = frame("off")
    b = frame("interpret")
    assert np.abs(a - b).max() < 1e-4


def test_refill_bit_identical(monkeypatch):
    """The run-ahead sample-refill schedule (kernels/fused._trace_core
    refill>0, VERDICT r4 #2) must be bit-identical to the sequential
    per-sample grid: per-pixel RNG streams are lane-private and each lane
    still processes its own samples in order, so ONLY the lane<->iteration
    schedule changes. Exercised on the textured scene (maps + UV + glass —
    every lobe family live) and the mesh scene, with DOF on."""
    from pathtracer0_tpu.render.renderer import render_frame, _frame_params
    from pathtracer0_tpu import RenderConfig

    for builder, key in ((scenes.textured, 6), (scenes.obj_bvh, 3)):
        dev, info = builder().build(max_leaf=4)
        cam, rot = scenes.CAMERAS[key]
        cam = jnp.asarray(cam, jnp.float32)
        rot = jnp.asarray(rot, jnp.float32)

        def frame(refill_env):
            monkeypatch.setenv("PT0_FUSED_REFILL", refill_env)
            cfg = RenderConfig(width=32, height=16, samples_per_frame=4,
                               max_bounces=4, raytracing=True,
                               auto_focus=False, blur=0.001,
                               fused="interpret")
            img, rays = render_frame(
                dev, cam, rot, jnp.uint32(99), info=info,
                params=_frame_params(cfg), width=32, height=16, spp=4,
                raytracing=True, auto_focus=False, cam_size=cfg.cam_size,
                focal_length=cfg.focal_length, blur=cfg.blur,
                focal_distance=cfg.focal_distance)
            return np.asarray(img), float(rays)

        seq, r_seq = frame("0")
        ref, r_ref = frame("1")
        np.testing.assert_array_equal(ref, seq)
        assert r_ref == r_seq
