"""Legacy Phong + emissive-disk area lights (shade/arealights.py — the
reference's dead raytrace.glsl:676-758 subsystem, opt-in)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer0_tpu import Scene, RenderConfig
from pathtracer0_tpu.render.renderer import render_frame, _frame_params


def _lit_scene(illum=2, blocker=True):
    """Ground sphere + an optional blocker + one emissive sphere light."""
    sc = Scene()
    sc.set_constant_sky((0.0, 0.0, 0.0))
    sc.add_material("ground")
    sc.set_last_mtl("Kd", (0.6, 0.6, 0.6))
    sc.set_last_mtl("Ka", (0.02, 0.02, 0.02))
    sc.set_last_mtl("Ks", (0.4, 0.4, 0.4))
    sc.set_last_mtl("Ns", 16.0)
    sc.set_last_mtl("illum", illum)
    sc.add_material("blocker")
    sc.set_last_mtl("Kd", (0.4, 0.2, 0.2))
    sc.set_last_mtl("illum", 0)
    sc.add_material("light")
    sc.set_last_mtl("Ke", (4.0, 3.6, 3.0))
    sc.add_sphere((0.0, -100.5, 5.0), 100.0, m=0)       # prim 0: ground
    if blocker:
        sc.add_sphere((0.8, 0.7, 5.0), 0.8, m=1)        # prim 1: blocker
        sc.add_emissive_sphere((0.8, 2.2, 5.0), 0.5, m=2)  # prim 2 + light
    else:
        sc.add_emissive_sphere((0.8, 2.2, 5.0), 0.5, m=2)  # prim 1 + light
    return sc


def _render(sc, spp=3, legacy=True, w=64, h=48):
    cfg = RenderConfig(width=w, height=h, samples_per_frame=spp,
                       raytracing=False, legacy_shading=legacy,
                       auto_focus=False, blur=0.0)
    dev, info = sc.build(cfg)
    img, _ = render_frame(
        dev, jnp.asarray([0.0, 0.5, 0.0]), jnp.zeros(3), jnp.uint32(5),
        info=info, params=_frame_params(cfg), width=w, height=h, spp=spp,
        raytracing=False, auto_focus=False, cam_size=cfg.cam_size,
        focal_length=cfg.focal_length, blur=0.0,
        focal_distance=cfg.focal_distance)
    return np.asarray(img), info


def test_light_and_shadow():
    img, info = _render(_lit_scene())
    assert len(info.lights) == 1
    assert np.isfinite(img).all()
    # lit ground pixels exist
    bottom = img[:16]                      # ground rows (GL: row 0 bottom)
    assert bottom[..., 0].max() > 0.05
    # the blocker casts a shadow: removing it brightens the image
    img_open, _ = _render(_lit_scene(blocker=False))
    assert img_open.mean() > img.mean() * 1.03, (
        img_open.mean(), img.mean())


def test_emissive_surface_returns_ke():
    img, _ = _render(_lit_scene())
    # the emissive sphere's pixels show raw Ke (4, 3.6, 3) pre-clamp
    assert img.max() >= 2.0


def test_soft_shadow_grid_vs_point():
    """S=1 single-center-ray shadows are harder than the S=4 grid: the
    penumbra region differs while fully-lit regions agree."""
    img_hard, _ = _render(_lit_scene(), spp=1)
    img_soft, _ = _render(_lit_scene(), spp=4)
    assert np.isfinite(img_hard).all() and np.isfinite(img_soft).all()
    assert not np.allclose(img_hard, img_soft, atol=1e-3)


def test_illum0_has_no_ambient_or_specular():
    img0, _ = _render(_lit_scene(illum=0))
    img2, _ = _render(_lit_scene(illum=2))
    # illum 2 adds Ka + specular -> strictly brighter ground on average
    assert img2[:20].mean() > img0[:20].mean()


def test_sample_res_zero_fully_lit():
    img, _ = _render(_lit_scene(), spp=0)
    # no shadow rays: intensity == 1 everywhere the ground faces the light
    bottom = img[:16]
    assert (bottom[..., 0] > 0.05).mean() > 0.9
