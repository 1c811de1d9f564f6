"""Oracle IMAGE parity (VERDICT r2 missing #1): the north-star metric is
pixel RMSE against the GLSL reference semantics at fixed spp
(BASELINE.md:22-24). tests/glsl_ref.render_image is a scalar, sequential
transcription of frag.glsl's rayScene/trace/main (plus the deviations
PARITY.md documents as deliberate), so this is an INDEPENDENT
implementation path: different language, different control flow, different
numerics (float64) — agreement here pins the whole image pipeline, not
just individual draws.

Budgets: the committed oracle golden pins the oracle itself at the 8-bit
PNG quantization floor; the renderer-vs-oracle comparison allows isolated
knife-edge pixels (f32 vs f64 flips a roll on a threshold) but requires
near-exact agreement everywhere else.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from . import glsl_ref
from pathtracer0_tpu import RenderConfig, scenes
from pathtracer0_tpu.render.renderer import render_frame, _frame_params
from pathtracer0_tpu.utils import image as img_util

W, H, SPP, BOUNCES, SEED = 64, 48, 1, 4, 4242
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "goldens", "oracle_metal_glass.png")


@pytest.fixture(scope="module")
def oracle_image():
    sc = scenes.metal_glass()
    ells = [
        dict(c=sc.ell_c[i], stretch=sc.ell_stretch[i], r=sc.ell_rad[i],
             mat=sc.ell_mat[i])
        for i in range(len(sc.ell_rad))
    ]
    assert all(not np.any(np.asarray(r)) for r in sc.ell_rot)
    mats = [glsl_ref.mtl_dict(m) for m in sc.materials]
    sky = sc.textures.images[0]
    cam, rot = scenes.CAMERAS[2]
    return glsl_ref.render_image(
        W, H, SPP, SEED, cam, rot, ells, mats, sky, BOUNCES)


@pytest.fixture(scope="module")
def renderer_image():
    dev, info = scenes.metal_glass().build(max_leaf=4)
    cam, rot = scenes.CAMERAS[2]
    cfg = RenderConfig(width=W, height=H, samples_per_frame=SPP,
                       max_bounces=BOUNCES, raytracing=True,
                       auto_focus=False, blur=0.0)
    img, _ = render_frame(
        dev, jnp.asarray(cam, jnp.float32), jnp.asarray(rot, jnp.float32),
        jnp.uint32(SEED), **{
            "info": info, "params": _frame_params(cfg), "width": W,
            "height": H, "spp": SPP, "raytracing": True,
            "auto_focus": False, "cam_size": cfg.cam_size,
            "focal_length": cfg.focal_length, "blur": 0.0,
            "focal_distance": cfg.focal_distance})
    return np.asarray(img, np.float64)


def test_oracle_pinned(oracle_image):
    """The oracle itself is pinned by a committed golden: a regression in
    the transcription (or in scenes.metal_glass) shows up here."""
    assert os.path.exists(GOLDEN), f"golden missing: {GOLDEN}"
    golden = img_util.read_png(GOLDEN)
    err = img_util.rmse(np.clip(oracle_image, 0, 1), golden)
    assert err < 0.004, err  # 8-bit quantization floor is ~0.00113


def test_renderer_matches_oracle(oracle_image, renderer_image):
    """Measured image parity: the JAX renderer vs the sequential float64
    oracle. Divergent pixels must be isolated knife-edge flips."""
    diff = np.abs(oracle_image - renderer_image).max(axis=-1)
    frac_exact = (diff < 2e-3).mean()
    assert frac_exact >= 0.98, frac_exact
    err = img_util.rmse(np.clip(oracle_image, 0, 1),
                        np.clip(renderer_image, 0, 1))
    assert err < 0.02, err


# ---------------------------------------------------------------------------
# Mesh + BVH oracle parity (VERDICT r3 #5): the same independent-path check
# for the TRIANGLE pipeline — scalar stack-walk rayBVH + Moller-Trumbore +
# smooth/flat normal interpolation vs the packet/vmapped kernels.
# ---------------------------------------------------------------------------

MW, MH = 48, 36


def _mesh_scene():
    from pathtracer0_tpu import Scene

    sc = Scene()
    sky = np.zeros((64, 128, 3), np.float32)
    for row in range(64):
        t = row / 63.0
        sky[row] = (0.35 + 0.3 * t, 0.45 + 0.25 * t, 0.9 - 0.3 * t)
    sc.set_sky(sky, "sky")
    sc.add_material("diff")
    sc.set_last_mtl("Kd", (0.75, 0.45, 0.3))
    sc.set_last_mtl("Pr", 1.0)
    sc.add_material("metal")
    sc.set_last_mtl("Pm", 1.0)
    sc.set_last_mtl("Pr", 0.05)
    sc.set_last_mtl("Ks", (0.9, 0.85, 0.7))
    sc.set_last_mtl("Kd", (0.9, 0.85, 0.7))
    sc.add_material("ground")
    sc.set_last_mtl("Kd", (0.55, 0.55, 0.55))
    sc.set_last_mtl("Pr", 1.0)

    # flat-shaded cube (12 tris, object 0)
    cx, cy, cz, h = -1.1, 0.2, 4.2, 0.6
    p = [(cx + sx * h, cy + sy * h, cz + sz * h)
         for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    faces = [(0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),
             (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),
             (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3)]
    for a, b, c in faces:
        sc.add_tri(p[a], p[b], p[c], 0)

    # smooth-shaded octahedron (8 tris, object 1, per-vertex normals)
    import numpy as _np
    ctr = _np.array([1.2, 0.5, 4.5])
    vs = _np.array([(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                    (0, 0, 1), (0, 0, -1)], _np.float64)
    overts = ctr + 0.8 * vs
    ofaces = [(0, 2, 4), (2, 1, 4), (1, 3, 4), (3, 0, 4),
              (2, 0, 5), (1, 2, 5), (3, 1, 5), (0, 3, 5)]
    v1 = overts[[f[0] for f in ofaces]]
    v2 = overts[[f[1] for f in ofaces]]
    v3 = overts[[f[2] for f in ofaces]]
    n1 = vs[[f[0] for f in ofaces]]
    n2 = vs[[f[1] for f in ofaces]]
    n3 = vs[[f[2] for f in ofaces]]
    sc.add_mesh(v1, v2, v3, 1, normals=(n1, n2, n3))

    sc.add_sphere((0.0, -100.5, 5.0), 100.0, m=2)
    return sc


MESH_CAM = ((0.0, 0.7, 0.0), (0.12, 0.04, 0.0))


@pytest.fixture(scope="module")
def oracle_mesh_image():
    sc = _mesh_scene()
    dev, info = sc.build(max_leaf=2)  # force a real multi-level forest
    scene_full = glsl_ref.scene_dicts(dev, info)
    ells = [
        dict(c=sc.ell_c[i], stretch=sc.ell_stretch[i], r=sc.ell_rad[i],
             mat=sc.ell_mat[i])
        for i in range(len(sc.ell_rad))
    ]
    mats = [glsl_ref.mtl_dict(m) for m in sc.materials]
    sky = sc.textures.images[0]
    cam, rot = MESH_CAM
    return glsl_ref.render_image(
        MW, MH, SPP, SEED, cam, rot, ells, mats, sky, BOUNCES,
        scene_full=scene_full)


@pytest.fixture(scope="module")
def renderer_mesh_image():
    dev, info = _mesh_scene().build(max_leaf=2)
    cam, rot = MESH_CAM
    cfg = RenderConfig(width=MW, height=MH, samples_per_frame=SPP,
                       max_bounces=BOUNCES, raytracing=True,
                       auto_focus=False, blur=0.0)
    img, _ = render_frame(
        dev, jnp.asarray(cam, jnp.float32), jnp.asarray(rot, jnp.float32),
        jnp.uint32(SEED), **{
            "info": info, "params": _frame_params(cfg), "width": MW,
            "height": MH, "spp": SPP, "raytracing": True,
            "auto_focus": False, "cam_size": cfg.cam_size,
            "focal_length": cfg.focal_length, "blur": 0.0,
            "focal_distance": cfg.focal_distance})
    return np.asarray(img, np.float64)


def test_mesh_renderer_matches_oracle(oracle_mesh_image,
                                      renderer_mesh_image):
    """The OBJ/BVH pipeline against the scalar stack-walk oracle: flat cube
    (face normals), smooth octahedron (interpolated normals), metal bounce
    paths, BVH pruning across two object trees + a huge ground sphere."""
    diff = np.abs(oracle_mesh_image - renderer_mesh_image).max(axis=-1)
    frac_exact = (diff < 2e-3).mean()
    assert frac_exact >= 0.98, frac_exact
    err = img_util.rmse(np.clip(oracle_mesh_image, 0, 1),
                        np.clip(renderer_mesh_image, 0, 1))
    assert err < 0.02, err


# ---------------------------------------------------------------------------
# Texture-mapped oracle parity: the mapMtl override stage
# (frag.glsl:210-225) against the scalar bilinear sampler — multiply
# semantics (map_Kd), scalar replacement (map_Pr), GL_REPEAT wrap, and the
# v-flip at hit time (frag.glsl:513). No map_norm: the ACTIVE reference
# shader computes tangents but never applies normal maps, and this test
# pins the active surface only.
# ---------------------------------------------------------------------------


def _textured_scene():
    from pathtracer0_tpu import Scene

    sc = Scene()
    sky = np.zeros((64, 128, 3), np.float32)
    for row in range(64):
        t = row / 63.0
        sky[row] = (0.35 + 0.3 * t, 0.45 + 0.25 * t, 0.9 - 0.3 * t)
    sc.set_sky(sky, "sky")

    checker = np.zeros((8, 8, 3), np.float32)
    checker[::2, ::2] = checker[1::2, 1::2] = (0.9, 0.88, 0.8)
    checker[::2, 1::2] = checker[1::2, ::2] = (0.15, 0.2, 0.45)
    checker_i = sc.textures.register_array(checker, "checker")
    rough = np.tile(np.linspace(0.05, 1.0, 8, dtype=np.float32)
                    [None, :, None], (8, 1, 3))
    rough_i = sc.textures.register_array(rough, "rough")

    sc.add_material("checkered")
    sc.set_last_mtl("Kd", (1.0, 0.9, 0.95))
    sc.set_last_mtl("Pr", 1.0)
    sc.set_last_mtl("map_Kd", checker_i)
    sc.add_material("roughmetal")
    sc.set_last_mtl("Pm", 1.0)
    sc.set_last_mtl("Ks", (0.9, 0.85, 0.7))
    sc.set_last_mtl("Kd", (0.9, 0.85, 0.7))
    sc.set_last_mtl("map_Pr", rough_i)
    sc.add_material("ground")
    sc.set_last_mtl("Kd", (0.5, 0.52, 0.5))
    sc.set_last_mtl("Pr", 1.0)

    def quad(a, b, c, d, m, uv_scale):
        a, b, c, d = (np.asarray(p, np.float64) for p in (a, b, c, d))
        uv = np.asarray([(0, 0), (uv_scale, 0), (uv_scale, uv_scale),
                         (0, uv_scale)], np.float64)
        sc.add_mesh(np.stack([a, a]), np.stack([b, c]), np.stack([c, d]),
                    m, uvs=(np.stack([uv[0], uv[0]]),
                            np.stack([uv[1], uv[2]]),
                            np.stack([uv[2], uv[3]])))

    # UV'd checkered floor quad + a tilted rough-metal wall quad
    quad((-2.5, -0.6, 2.5), (2.5, -0.6, 2.5), (2.5, -0.6, 7.5),
         (-2.5, -0.6, 7.5), 0, 3.0)
    quad((-1.8, -0.6, 6.8), (1.8, -0.6, 6.8), (1.8, 2.0, 6.2),
         (-1.8, 2.0, 6.2), 1, 1.0)
    sc.add_sphere((0.0, -100.8, 5.0), 100.0, m=2)
    return sc


TEX_CAM = ((0.0, 0.6, 0.0), (0.1, 0.0, 0.0))


@pytest.fixture(scope="module")
def oracle_textured_image():
    sc = _textured_scene()
    dev, info = sc.build(max_leaf=2)
    scene_full = glsl_ref.scene_dicts(dev, info)
    ells = [
        dict(c=sc.ell_c[i], stretch=sc.ell_stretch[i], r=sc.ell_rad[i],
             mat=sc.ell_mat[i])
        for i in range(len(sc.ell_rad))
    ]
    mats = [glsl_ref.mtl_dict(m) for m in sc.materials]
    cam, rot = TEX_CAM
    return glsl_ref.render_image(
        MW, MH, SPP, SEED, cam, rot, ells, mats, sc.textures.images[0],
        BOUNCES, scene_full=scene_full, textures=sc.textures.images)


@pytest.fixture(scope="module")
def renderer_textured_image():
    dev, info = _textured_scene().build(max_leaf=2)
    cam, rot = TEX_CAM
    cfg = RenderConfig(width=MW, height=MH, samples_per_frame=SPP,
                       max_bounces=BOUNCES, raytracing=True,
                       auto_focus=False, blur=0.0)
    img, _ = render_frame(
        dev, jnp.asarray(cam, jnp.float32), jnp.asarray(rot, jnp.float32),
        jnp.uint32(SEED), **{
            "info": info, "params": _frame_params(cfg), "width": MW,
            "height": MH, "spp": SPP, "raytracing": True,
            "auto_focus": False, "cam_size": cfg.cam_size,
            "focal_length": cfg.focal_length, "blur": 0.0,
            "focal_distance": cfg.focal_distance})
    return np.asarray(img, np.float64)


def test_textured_renderer_matches_oracle(oracle_textured_image,
                                          renderer_textured_image):
    """The texture-mapped pipeline against the scalar oracle: bilinear
    REPEAT map_Kd multiply on the checkered floor, map_Pr roughness
    replacement driving the metal lobe weights, UV interpolation + v-flip
    through the BVH hit path."""
    diff = np.abs(oracle_textured_image
                  - renderer_textured_image).max(axis=-1)
    frac_exact = (diff < 2e-3).mean()
    assert frac_exact >= 0.98, frac_exact
    err = img_util.rmse(np.clip(oracle_textured_image, 0, 1),
                        np.clip(renderer_textured_image, 0, 1))
    assert err < 0.02, err
    # sanity: the checker actually modulates the floor (not a flat image)
    floor = np.clip(renderer_textured_image, 0, 1)[:MH // 3]
    assert floor.std() > 0.02


@pytest.fixture(scope="module")
def fused_textured_image():
    """The same frame through the FUSED megakernel (interpret mode on
    CPU): the in-kernel factorized texel walk (fused._sample_map_block),
    TBN normal path, and in-kernel sky — not the XLA sample_bilinear
    middleman the fixture above exercises."""
    dev, info = _textured_scene().build(max_leaf=2)
    assert info.fs_maps_ok and info.fused_ok, (
        "textured scene must stay fused-eligible for this test")
    cam, rot = TEX_CAM
    cfg = RenderConfig(width=MW, height=MH, samples_per_frame=SPP,
                       max_bounces=BOUNCES, raytracing=True,
                       auto_focus=False, blur=0.0, fused="interpret")
    img, _ = render_frame(
        dev, jnp.asarray(cam, jnp.float32), jnp.asarray(rot, jnp.float32),
        jnp.uint32(SEED), **{
            "info": info, "params": _frame_params(cfg), "width": MW,
            "height": MH, "spp": SPP, "raytracing": True,
            "auto_focus": False, "cam_size": cfg.cam_size,
            "focal_length": cfg.focal_length, "blur": 0.0,
            "focal_distance": cfg.focal_distance})
    return np.asarray(img, np.float64)


def test_textured_fused_matches_oracle(oracle_textured_image,
                                       fused_textured_image):
    """VERDICT r4 #8: direct oracle-vs-fused textured parity — the
    in-kernel texel walk against the scalar float64 oracle with no XLA
    middleman (the analytic chain already has oracle->XLA->fused; this
    closes the transitivity gap for textures)."""
    diff = np.abs(oracle_textured_image - fused_textured_image).max(axis=-1)
    frac_exact = (diff < 2e-3).mean()
    assert frac_exact >= 0.98, frac_exact
    err = img_util.rmse(np.clip(oracle_textured_image, 0, 1),
                        np.clip(fused_textured_image, 0, 1))
    assert err < 0.02, err
