"""Pick API + debug heatmap tests (VERDICT r1 items 7 and 9)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer0_tpu import RenderConfig, Renderer, Scene
from pathtracer0_tpu.kernels import traverse
from pathtracer0_tpu.render.renderer import render_debug_frame, \
    _frame_params


class TestPick:
    def test_pick_known_sphere(self, simple_scene):
        """Center pixel looks straight at the unit sphere at (0,0,3):
        distance 2, normal -z, material 0, kind ellipsoid."""
        dev, info = simple_scene.build()
        cfg = RenderConfig(width=64, height=64, auto_focus=False)
        r = Renderer(dev, info, cfg)
        p = r.pick(32, 32)
        assert p["hit"] and p["kind"] == 3
        assert p["material"] == 0
        assert p["distance"] == pytest.approx(2.0, abs=1e-2)
        assert p["normal"][2] == pytest.approx(-1.0, abs=1e-2)

    def test_pick_miss(self, simple_scene):
        dev, info = simple_scene.build()
        cfg = RenderConfig(width=64, height=64, auto_focus=False)
        r = Renderer(dev, info, cfg)
        p = r.pick(0, 63)   # top-left corner: sky
        assert not p["hit"]

    def test_pick_triangle_object(self, table_scene):
        dev, info = table_scene.build(max_leaf=4)
        cfg = RenderConfig(width=64, height=64, auto_focus=False)
        r = Renderer(dev, info, cfg)
        hits = [r.pick(x, 32) for x in (20, 32, 44)]
        assert any(p["hit"] and p["kind"] == 1 for p in hits)


class TestHeatmap:
    def test_vmapped_formula(self, table_scene):
        """Exact frag.glsl:534 semantics on the XLA path: red channel =
        0.01*leafVisits + exp(-3), blue = exp(0.01*(box-200)), green 0."""
        dev, info = table_scene.build(max_leaf=4)
        cfg = RenderConfig(width=32, height=24, debug=True,
                           auto_focus=False)
        img = render_debug_frame(
            dev, jnp.zeros(3), jnp.zeros(3), info=info,
            params=_frame_params(cfg), width=32, height=24,
            cam_size=cfg.cam_size, focal_length=cfg.focal_length)
        img = np.asarray(img)
        assert np.isfinite(img).all()
        assert (img[..., 1] == 0).all()
        # every ray pays at least the constant red term / numObj
        assert (img[..., 0] >= np.exp(-3.0) / info.num_objects - 1e-6).all()
        # rays toward the mesh must cost more than rays toward the sky
        assert img[..., 2].max() > img[..., 2].min()

    def test_packet_counters(self, table_scene):
        """The kernel-side counters agree with the XLA path's totals at
        packet granularity: blocks containing mesh-facing rays report
        more box tests than the XLA per-ray MINIMUM and at least one
        leaf visit."""
        dev, info = table_scene.build(max_leaf=4)
        o = jnp.broadcast_to(jnp.zeros(3), (256, 3))
        d = jnp.stack([
            jnp.zeros(256), jnp.zeros(256), jnp.ones(256)
        ], axis=1)  # all rays at the mesh
        box, leaf = traverse.heat_counts(o, d, dev, info,
                                         pallas="interpret")
        assert box.shape == (256,)
        assert int(leaf[0]) >= 1
        # packet counts are shared across the block
        assert (np.asarray(box) == int(box[0])).all()


def test_heatmap_streamed(tmp_path):
    """Heatmap also works for HBM-streamed scenes (kernel counters)."""
    from tests.test_wavefront import _tri_grid_obj, _scene_from_obj

    p = tmp_path / "g.obj"
    _tri_grid_obj(str(p), 10, 10)
    dev, info = _scene_from_obj(str(p), stream_threshold=0)
    cfg = RenderConfig(width=16, height=16, debug=True, auto_focus=False,
                       stream_threshold=0)
    img = render_debug_frame(
        dev, jnp.asarray([3.0, 2.0, -6.0]), jnp.zeros(3), info=info,
        params=_frame_params(cfg), width=16, height=16,
        cam_size=cfg.cam_size, focal_length=cfg.focal_length)
    img = np.asarray(img)
    assert np.isfinite(img).all() and img[..., 2].max() > 0


def test_pick_streamed_scene():
    """pick() works through the HBM-streamed path too (watertight mesh so
    no pick ray can slip through a lattice gap)."""
    n = 12
    xs = np.linspace(0.0, 6.0, n)
    X, Z = np.meshgrid(xs, xs)
    Y = np.sin(X) * np.cos(Z) * 0.4
    P = np.stack([X, Y, Z], axis=-1)
    a = P[:-1, :-1].reshape(-1, 3)
    b = P[1:, :-1].reshape(-1, 3)
    c = P[:-1, 1:].reshape(-1, 3)
    d4 = P[1:, 1:].reshape(-1, 3)
    sc = Scene()
    sc.set_constant_sky((0.2, 0.3, 0.8))
    sc.add_material("m")
    sc.add_mesh(np.concatenate([a, d4]), np.concatenate([b, b]),
                np.concatenate([c, c]), 0)
    cfg = RenderConfig(width=32, height=32, auto_focus=False,
                       stream_threshold=10)
    dev, info = sc.build(cfg)
    assert info.streamed
    # straight down over the grid center: rx = pi/2 -> direction (0,-1,0)
    r = Renderer(dev, info, cfg, cam_pos=(3.0, 8.0, 3.0),
                 cam_rot=(np.pi / 2, 0.0, 0.0))
    hits = [r.pick(x, y) for x in (14, 16, 18) for y in (14, 16, 18)]
    good = [p for p in hits if p["hit"]]
    assert len(good) == 9 and all(p["kind"] == 1 for p in good)
    assert all(np.isfinite(p["normal"]).all() for p in good)
    assert all(4.0 < p["distance"] < 12.0 for p in good)
