"""Scene.add_mesh_indexed: indexed ingestion vs the expanded add_mesh.

The indexed path exists so a big streamed build ships shared vertices +
faces over the tunnel instead of three expanded f32 columns (VERDICT r4
#4; the 4M-tri scale config's dominant build cost). These tests pin the
contract:

  * expansion is bit-identical to add_mesh for positions, smooth normals,
    UVs, and everything derived from them (a gather of converted values
    commutes with the conversion);
  * the one deliberate deviation — FLAT normals computed on device in f32
    (packing._idx_tables_jit) instead of host f64 — stays within ~1e-7
    relative and renders within noise of the host path.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer0_tpu import RenderConfig, Scene
from pathtracer0_tpu.render.renderer import render_frame, _frame_params


def _grid(n, lift=0.0):
    """Shared-vertex terrain patch: (verts (n*n, 3), faces (2(n-1)^2, 3))
    plus the expanded columns add_mesh would receive."""
    xs = np.linspace(-3.0, 3.0, n)
    X, Z = np.meshgrid(xs, xs)
    Y = np.sin(X * 1.3) * np.cos(Z * 0.9) + lift
    P = np.stack([X, Y, Z], axis=-1)
    g = np.arange(n * n, dtype=np.int64).reshape(n, n)
    ga, gb = g[:-1, :-1].reshape(-1), g[1:, :-1].reshape(-1)
    gc, gd = g[:-1, 1:].reshape(-1), g[1:, 1:].reshape(-1)
    faces = np.concatenate([
        np.stack([ga, gb, gc], axis=1),
        np.stack([gd, gb, gc], axis=1),
    ])
    verts = P.reshape(-1, 3)
    v1, v2, v3 = (verts[faces[:, c]] for c in range(3))
    return verts, faces, v1, v2, v3


def _scene(add, *, sky=(0.5, 0.6, 0.9)):
    sc = Scene()
    sc.set_constant_sky(sky)
    sc.add_material("m")
    sc.set_last_mtl("Kd", (0.7, 0.6, 0.5))
    add(sc)
    return sc


def _render(dev, info, cfg, seed=17):
    kw = dict(
        info=info, params=_frame_params(cfg), width=cfg.width,
        height=cfg.height, spp=cfg.samples_per_frame,
        raytracing=cfg.raytracing, auto_focus=cfg.auto_focus,
        cam_size=cfg.cam_size, focal_length=cfg.focal_length,
        blur=cfg.blur, focal_distance=cfg.focal_distance,
    )
    cam = jnp.asarray([0.0, 2.5, -6.0], jnp.float32)
    rot = jnp.asarray([0.3, 0.0, 0.0], jnp.float32)
    img, _ = render_frame(dev, cam, rot, jnp.uint32(seed), **kw)
    return np.asarray(img)


class TestSmallParity:
    """Sub-threshold scenes: lazy host expansion must be bit-identical."""

    def test_fused_scene_bit_equal(self):
        verts, faces, v1, v2, v3 = _grid(9)
        cfg = RenderConfig(width=32, height=16, samples_per_frame=2,
                           max_bounces=3, auto_focus=False, blur=0.0)
        sa = _scene(lambda s: s.add_mesh(v1, v2, v3, 0))
        sb = _scene(lambda s: s.add_mesh_indexed(verts, faces, 0))
        da, ia = sa.build(cfg)
        db, ib = sb.build(cfg)
        assert ia.streamed == ib.streamed is False
        for f in ("tri_v1", "tri_v2", "tri_v3", "tri_n1", "tri_mat",
                  "fs_tris", "fs_attr", "tri_attr"):
            np.testing.assert_array_equal(
                np.asarray(getattr(da, f)), np.asarray(getattr(db, f)),
                err_msg=f)
        np.testing.assert_array_equal(_render(da, ia, cfg),
                                      _render(db, ib, cfg))

    def test_streamed_scene_bit_equal(self):
        verts, faces, v1, v2, v3 = _grid(17)
        cfg = RenderConfig(width=24, height=12, samples_per_frame=1,
                           max_bounces=2, auto_focus=False, blur=0.0,
                           stream_threshold=0)
        sa = _scene(lambda s: s.add_mesh(v1, v2, v3, 0))
        sb = _scene(lambda s: s.add_mesh_indexed(verts, faces, 0))
        da, ia = sa.build(cfg)
        db, ib = sb.build(cfg)
        assert ia.streamed and ib.streamed
        for f in ("st_tris", "st_perm", "st_sub", "st_top",
                  "tri_v1", "tri_v2", "tri_v3", "tri_attr"):
            np.testing.assert_array_equal(
                np.asarray(getattr(da, f)), np.asarray(getattr(db, f)),
                err_msg=f)
        np.testing.assert_array_equal(_render(da, ia, cfg),
                                      _render(db, ib, cfg))

    def test_smooth_uv_bit_equal(self):
        verts, faces, v1, v2, v3 = _grid(9)
        vn = np.stack([np.sin(verts[:, 0]), np.ones(len(verts)),
                       np.cos(verts[:, 2])], axis=1) + 1.5
        vuv = (verts[:, [0, 2]] + 3.0) / 6.0
        nrm = lambda a: a / np.maximum(
            np.linalg.norm(a, axis=1, keepdims=True), 1e-30)
        n_cols = tuple(vn[faces[:, c]] for c in range(3))
        uv_cols = tuple(vuv[faces[:, c]] for c in range(3))
        cfg = RenderConfig(width=24, height=12, samples_per_frame=1,
                           max_bounces=2, auto_focus=False, blur=0.0)
        sa = _scene(lambda s: s.add_mesh(v1, v2, v3, 0, normals=n_cols,
                                         uvs=uv_cols))
        sb = _scene(lambda s: s.add_mesh_indexed(verts, faces, 0,
                                                 normals=vn, uvs=vuv))
        da, ia = sa.build(cfg)
        db, ib = sb.build(cfg)
        # add_mesh normalizes expanded rows; add_mesh_indexed normalizes
        # the vertex table then gathers — identical values either way
        np.testing.assert_array_equal(np.asarray(da.tri_n1),
                                      np.asarray(db.tri_n1))
        np.testing.assert_array_equal(np.asarray(da.tri_uv1),
                                      np.asarray(db.tri_uv1))
        assert np.allclose(nrm(vn)[faces[:, 0]],
                           np.asarray(db.tri_n1)[: len(faces)], atol=1e-6)
        np.testing.assert_array_equal(_render(da, ia, cfg),
                                      _render(db, ib, cfg))


class TestBigStreamedFastPath:
    """Past ONEHOT_MAX_TRIS the indexed build takes the device-side
    attribute path (packing._idx_attr_dev): positions bit-equal, flat
    normals within f32-vs-f64 tolerance, constants exact."""

    @pytest.fixture(scope="class")
    def pair(self):
        verts, faces, v1, v2, v3 = _grid(70)  # 2*69^2 = 9522 > 8192
        cfg = RenderConfig(width=16, height=8, samples_per_frame=1,
                           max_bounces=2, auto_focus=False, blur=0.0,
                           stream_threshold=0)
        sa = _scene(lambda s: s.add_mesh(v1, v2, v3, 0))
        sb = _scene(lambda s: s.add_mesh_indexed(verts, faces, 0))
        da, ia = sa.build(cfg)
        db, ib = sb.build(cfg)
        assert ia.streamed and ib.streamed
        return da, ia, db, ib, cfg

    def test_geometry_bit_equal(self, pair):
        da, _, db, _, _ = pair
        for f in ("st_tris", "st_perm", "st_sub", "st_top",
                  "tri_v1", "tri_v2", "tri_v3"):
            np.testing.assert_array_equal(
                np.asarray(getattr(da, f)), np.asarray(getattr(db, f)),
                err_msg=f)

    def test_attribute_tables(self, pair):
        da, _, db, _, _ = pair
        n1a, n1b = np.asarray(da.tri_n1), np.asarray(db.tri_n1)
        assert n1b.shape == n1a.shape
        assert np.abs(n1a - n1b).max() < 4e-6  # f64 vs f32 flat cross
        np.testing.assert_array_equal(np.asarray(da.tri_mat),
                                      np.asarray(db.tri_mat))
        np.testing.assert_array_equal(np.asarray(da.tri_obj),
                                      np.asarray(db.tri_obj))
        np.testing.assert_array_equal(np.asarray(da.tri_has_uv),
                                      np.asarray(db.tri_has_uv))
        np.testing.assert_array_equal(np.asarray(da.tri_has_smooth),
                                      np.asarray(db.tri_has_smooth))

    def test_render_within_noise(self, pair):
        da, ia, db, ib, cfg = pair
        a = _render(da, ia, cfg)
        b = _render(db, ib, cfg)
        assert np.isfinite(b).all()
        # identical seeds + identical geometry; only flat-normal f32
        # rounding differs -> images agree to well under a ULP of display
        assert np.abs(a - b).max() < 1e-4
        assert (a == b).mean() > 0.9
