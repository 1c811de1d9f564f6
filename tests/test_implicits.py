"""Implicit-surface rendering tests (VERDICT r1 item 8 + ADVICE r1 #1).

Covers the marcher vs analytic answers, the front-face normal orientation
(the r1 advisor found the net normal inverted), shifted/scaled/rotated local
frames, and gradient normals — none of which round 1 exercised.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer0_tpu import Scene
from pathtracer0_tpu.kernels import traverse
from pathtracer0_tpu.shade import implicits


def _scene_with_implicit(fn=1, shift=(0, 0, 0), scale=(1, 1, 1),
                         rot=(0, 0, 0)):
    sc = Scene()
    sc.set_constant_sky((0.2, 0.2, 0.2))
    sc.add_material("white")
    sc.set_last_mtl("Kd", (0.8, 0.8, 0.8))
    sc.add_implicit(fn, shift, scale, rot, 0)
    return sc.build()


def _query(dev, info, o, d):
    o = jnp.asarray([o], jnp.float32)
    d = jnp.asarray([d], jnp.float32)
    hit, o_n = traverse.ray_scene(o, d, dev, info, pallas="off")
    surf = traverse.surface_sample(hit, o_n, d, dev, info=info)
    return hit, surf


class TestImplicitSphere:
    """fn=1: x^2+y^2+z^2 = 15, radius sqrt(15) (frag.glsl:301)."""

    def test_hit_distance_analytic(self):
        dev, info = _scene_with_implicit(fn=1)
        hit, _ = _query(dev, info, (0, 0, -10), (0, 0, 1))
        r = np.sqrt(15.0)
        assert hit.kind[0] == 2
        # marcher t vs analytic: origin at z=-10, surface at z=-r
        np.testing.assert_allclose(float(hit.t[0]), 10.0 - r, atol=2e-3)

    def test_miss(self):
        dev, info = _scene_with_implicit(fn=1)
        hit, _ = _query(dev, info, (0, 20, -10), (0, 0, 1))
        assert not bool(hit.is_hit[0])

    def test_front_face_normal_points_at_ray_origin(self):
        """ADVICE r1 #1: the front face of the implicit sphere must have an
        OUTWARD normal (toward the ray origin), like the reference's net
        N = +normalize(df)."""
        dev, info = _scene_with_implicit(fn=1)
        _, surf = _query(dev, info, (0, 0, -10), (0, 0, 1))
        n = np.asarray(surf.norm[0])
        # hit point is on the -z side; outward normal ~ (0, 0, -1)
        assert n[2] < -0.99, n

    def test_normal_matches_gradient_direction(self):
        dev, info = _scene_with_implicit(fn=1)
        hit, surf = _query(dev, info, (4, 3, -10), (0, 0, 1))
        p = np.asarray(surf.loc[0])
        # for the sphere the outward normal is +p/|p|
        np.testing.assert_allclose(
            np.asarray(surf.norm[0]), p / np.linalg.norm(p), atol=1e-3
        )


class TestImplicitFrames:
    def test_shifted_sphere(self):
        dev, info = _scene_with_implicit(fn=1, shift=(5, 0, 0))
        hit, surf = _query(dev, info, (5, 0, -10), (0, 0, 1))
        assert bool(hit.is_hit[0])
        np.testing.assert_allclose(
            float(hit.t[0]), 10.0 - np.sqrt(15.0), atol=2e-3)
        n = np.asarray(surf.norm[0])
        assert n[2] < -0.99

    def test_scaled_sphere_local_t_quirk(self):
        """Reference quirk: the implicit t is in the LOCAL parameterization
        (frag.glsl:578-605) — with uniform scale s the world distance is
        s * t_local, but the raw local t is compared/world-used directly."""
        dev, info = _scene_with_implicit(fn=1, scale=(2, 2, 2))
        hit, _ = _query(dev, info, (0, 0, -10), (0, 0, 1))
        # local frame: O = (0,0,-5), |D| = 0.5 -> surface at local z=-r
        # t_local satisfies -5 + 0.5 t = -sqrt(15)
        t_expect = (5.0 - np.sqrt(15.0)) / 0.5
        np.testing.assert_allclose(float(hit.t[0]), t_expect, atol=4e-3)

    def test_rotated_ellipsoid_normal(self):
        """fn=3 (2x^2+y^2+2z^2=3) rotated 90deg about y: the long axis moves
        from y to y (symmetric) — use a 90deg z-rotation instead so the long
        axis maps x<->y."""
        rot = (0.0, 0.0, np.pi / 2)
        dev, info = _scene_with_implicit(fn=3, rot=rot)
        # along +x the rotated surface has the long-axis radius sqrt(3)
        hit, surf = _query(dev, info, (-10, 0, 0), (1, 0, 0))
        assert bool(hit.is_hit[0])
        np.testing.assert_allclose(
            float(hit.t[0]), 10.0 - np.sqrt(3.0), atol=2e-3)
        n = np.asarray(surf.norm[0])
        assert n[0] < -0.99, n


class TestImplicitRender:
    def test_whitted_render_lights_up(self):
        """A Whitted render of the implicit sphere must produce non-sky
        pixels with the upward-facing rim brighter than the downward rim
        (col = Ka + 0.2 Kd + Kd * N.y, frag.glsl:655-681) — wrong-sign
        normals invert this."""
        from pathtracer0_tpu import RenderConfig
        from pathtracer0_tpu.render.renderer import render_frame, _frame_params

        dev, info = _scene_with_implicit(fn=1, shift=(0, 0, 10))
        cfg = RenderConfig(width=64, height=64, samples_per_frame=1,
                           raytracing=False, auto_focus=False, blur=0.0)
        img, _ = render_frame(
            dev, jnp.zeros(3), jnp.zeros(3), jnp.uint32(1),
            info=info, params=_frame_params(cfg), width=64, height=64,
            spp=1, raytracing=False, auto_focus=False,
            cam_size=cfg.cam_size, focal_length=cfg.focal_length,
            blur=0.0, focal_distance=cfg.focal_distance)
        img = np.asarray(img)
        sky = 0.2
        hit_mask = np.abs(img[..., 0] - sky) > 1e-3
        assert hit_mask.sum() > 200
        rows = np.flatnonzero(hit_mask.any(axis=1))
        mid = (rows.min() + rows.max()) // 2
        # row 0 is the image BOTTOM (GL framebuffer orientation; the
        # reference flips only at screenshot readback, dispatch.java:828-833)
        world_top = img[mid:][hit_mask[mid:]].mean()
        world_bot = img[:mid][hit_mask[:mid]].mean()
        assert world_top > world_bot + 0.2, (world_top, world_bot)


def test_oversized_leaf_falls_back(tmp_path):
    """ADVICE r1 #2: >14 coincident triangles force a degenerate leaf;
    pack_scene must not crash and must disable the wavefront path."""
    obj = tmp_path / "degenerate.obj"
    lines = ["o blob"]
    for _ in range(16):
        lines += ["v 0 0 5", "v 1 0 5", "v 0 1 5", ]
    for k in range(16):
        b = 3 * k
        lines.append(f"f {b + 1} {b + 2} {b + 3}")
    obj.write_text("\n".join(lines) + "\n")
    sc = Scene()
    sc.set_constant_sky()
    sc.add_material("m")
    sc.add_object(str(obj), material=0)
    dev, info = sc.build(max_leaf=1)  # SAH cannot split coincident centroids
    assert not info.wf_ok
    assert info.max_leaf_size >= 15
    # the vmapped path still renders it
    hit, _ = traverse.ray_scene(
        jnp.asarray([[0.2, 0.2, 0.0]]), jnp.asarray([[0.0, 0.0, 1.0]]),
        dev, info, pallas="off")
    assert bool(hit.is_hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 5.0, atol=1e-3)


@pytest.mark.parametrize(
    "fn_id", sorted(__import__(
        "pathtracer0_tpu.kernels.fused", fromlist=["IMP_BOUND_RADIUS"]
    ).IMP_BOUND_RADIUS))
def test_bound_radius_conservative(fn_id):
    """ADVICE r3 #3: the fused kernel's windowed march skips all samples
    outside IMP_BOUND_RADIUS[fn] — correctness requires that NO zero
    crossing of the surface exists outside that sphere. Sample a thick
    shell just above the table radius and assert the field has constant
    nonzero sign there, so a stale radius (after editing an implicit
    formula) fails loudly."""
    from pathtracer0_tpu.kernels.fused import IMP_BOUND_RADIUS

    R = IMP_BOUND_RADIUS[fn_id]
    rs = np.random.RandomState(fn_id)
    n = 50000
    d = rs.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rad = R * (1.0 + rs.rand(n, 1) * 2.0)  # |p| in (R, 3R]
    p = (d * rad).astype(np.float32)
    x = jnp.asarray(p[:, 0])
    y = jnp.asarray(p[:, 1])
    z = jnp.asarray(p[:, 2])
    f = implicits._BUILDERS[fn_id - 1]
    vals = np.asarray(f(x * x, y * y, z * z, x, y, z))
    # NaN (out-of-domain, e.g. sqrt of a negative) can never bracket a
    # root: f_prev * f < 0 is False for NaN operands in the marcher, so
    # only FINITE values outside the sphere could produce a crossing —
    # they must all share one nonzero sign.
    fin = vals[np.isfinite(vals)]
    assert fin.size, f"fn {fn_id}: no finite samples in the test shell"
    assert (fin != 0).all(), f"root outside bound sphere for fn {fn_id}"
    assert (fin > 0).all() or (fin < 0).all(), (
        f"sign change outside bound sphere for fn {fn_id}")
