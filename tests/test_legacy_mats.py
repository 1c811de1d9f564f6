"""Legacy 18-float material system (Scene.add_mat — the reference's OLD
`addMat`/`mats` registry, dispatch.java:1025-1046, uploaded to SSBO
binding 6 at dispatch.java:538-551 and decoded by the dormant `newMat`,
raytrace.glsl:162-178) + the EmissionStrength wiring of the legacy
Phong mode (raytrace.glsl:682-683, 738)."""
import numpy as np
import jax.numpy as jnp

from pathtracer0_tpu import Scene, RenderConfig
from pathtracer0_tpu.shade import mtl as mtl_mod

from tests.test_arealights import _lit_scene, _render


def _scene_with_legacy():
    sc = Scene()
    sc.set_constant_sky((0.1, 0.1, 0.1))
    sc.add_material("m0")
    sc.add_sphere((0.0, 0.0, 5.0), 1.0, m=0)
    # addMat argument order (dispatch.java:1025):
    # Ka(3), Kd(3), Ks(3), alpha, reflectivity, transmission, refIndex,
    # emission, emissiveRadius, solid, absorption, textureID
    sc.add_mat(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9,
               32.0, 0.25, 0.75, 1.5, 2.0, 0.33, 1.0, 0.05, 3.0)
    sc.add_mat(1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0,
               8.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, -1.0)
    return sc


def test_pack_layout_matches_addmat_order():
    """The 18 floats land in the reference's packing order
    (dispatch.java:1027-1044: Ka, Kd, Ks, alpha, refl, trans, refIndex,
    emission, emissiveRadius, solid, absorption, textureID)."""
    dev, info = _scene_with_legacy().build(RenderConfig())
    assert info.n_legacy_mats == 2
    lm = np.asarray(dev.legacy_mats)
    assert lm.shape == (2, 18)
    np.testing.assert_allclose(
        lm[0],
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9,
         32.0, 0.25, 0.75, 1.5, 2.0, 0.33, 1.0, 0.05, 3.0],
        rtol=1e-6)
    np.testing.assert_allclose(lm[1, 0:3], [1.0, 0.0, 0.0])


def test_empty_registry_packs_placeholder():
    """No add_mat calls -> one zero row (fixed pytree shape), count 0."""
    sc = Scene()
    sc.set_constant_sky((0.1, 0.1, 0.1))
    sc.add_material("m0")
    sc.add_sphere((0.0, 0.0, 5.0), 1.0, m=0)
    dev, info = sc.build(RenderConfig())
    assert info.n_legacy_mats == 0
    assert np.asarray(dev.legacy_mats).shape == (1, 18)
    assert (np.asarray(dev.legacy_mats) == 0).all()


def test_decode_legacy_fields():
    """decode_legacy mirrors newMat's field mapping (raytrace.glsl:162-178)
    with the textureID stride fix (17*m+18 in the reference reads the
    wrong record for m > 0; we read each record's own column 17)."""
    dev, _ = _scene_with_legacy().build(RenderConfig())
    m = mtl_mod.decode_legacy(dev.legacy_mats,
                              jnp.asarray([0, 1], jnp.int32))
    np.testing.assert_allclose(np.asarray(m.Ka[0]), [0.1, 0.2, 0.3],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m.Kd[0]), [0.4, 0.5, 0.6],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m.Ks[0]), [0.7, 0.8, 0.9],
                               rtol=1e-6)
    assert float(m.alpha[0]) == 32.0
    assert abs(float(m.refl[0]) - 0.25) < 1e-6
    assert abs(float(m.trans[0]) - 0.75) < 1e-6
    assert abs(float(m.refr_index[0]) - 1.5) < 1e-6
    assert float(m.emission[0]) == 2.0
    assert abs(float(m.emissive_radius[0]) - 0.33) < 1e-6
    assert bool(m.solid[0]) and not bool(m.solid[1])
    assert abs(float(m.absorption[0]) - 0.05) < 1e-6
    # the stride-bug fix: record 1's textureID is ITS column 17 (-1),
    # not a float from record 0's tail
    assert int(m.texture_id[0]) == 3
    assert int(m.texture_id[1]) == -1


def test_emission_strength_scales_legacy_shading():
    """EmissionStrength (the Density slot, raytrace.glsl:190) scales both
    the emissive early-return (Ke*strength, raytrace.glsl:682-683) and the
    grid soft-shadow intensity (raytrace.glsl:738)."""
    def lit(density):
        sc = _lit_scene(illum=0, blocker=False)
        # 'light' is the last material added by _lit_scene
        sc.set_last_mtl("Density", density)
        img, _ = _render(sc, spp=4)
        return img

    img1 = lit(1.0)
    img3 = lit(3.0)
    assert np.isfinite(img3).all()
    # emissive sphere pixels scale ~3x (Ke=(4, 3.6, 3) -> 12 max)
    assert img3.max() > img1.max() * 2.5
    # lit ground rows brighten too (intensity *= strength)
    assert img3[:16].mean() > img1[:16].mean() * 1.5
