"""Pallas kernel tests (VERDICT r1 item 3): the packet-traversal kernels
run in interpreter mode on CPU and are cross-checked against the vmapped
XLA traversal on identical scenes — covering the brute-force small-scene
kernel, the stack-walk kernel, the HBM-streamed LBVH kernel, dead-lane
masking, octant sorting, multi-block grids, and the MAX_ROOTS edge.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer0_tpu import Scene, RenderConfig
from pathtracer0_tpu.kernels import traverse, wavefront


def _rand_rays(n, seed=3, center=(0.0, 0.5, 3.0), spread=4.0):
    rng = np.random.RandomState(seed)
    o = rng.randn(n, 3).astype(np.float32) * spread + np.asarray(
        center, np.float32)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _tri_grid_obj(path, nx, nz, jitter=0.3, seed=0):
    """Procedural mesh: a jittered triangle grid in one OBJ object."""
    rng = np.random.RandomState(seed)
    lines = ["o grid"]
    vid = 0
    faces = []
    for i in range(nx):
        for k in range(nz):
            bx, bz = i * 0.7, k * 0.7
            by = rng.rand() * 1.5
            p = np.array([[bx, by, bz],
                          [bx + 0.6, by + rng.randn() * jitter, bz],
                          [bx, by + rng.randn() * jitter, bz + 0.6]])
            for v in p:
                lines.append(f"v {v[0]:.5f} {v[1]:.5f} {v[2]:.5f}")
            faces.append(f"f {vid + 1} {vid + 2} {vid + 3}")
            vid += 3
    lines += faces
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _scene_from_obj(path, *, max_leaf=4, stream_threshold=10 ** 9,
                    scale=1.0, shift=(0, 0, 0)):
    sc = Scene()
    sc.set_constant_sky((0.3, 0.3, 0.3))
    sc.add_material("m")
    sc.add_object(path, material=0, scale=(scale,) * 3, shift=shift)
    cfg = RenderConfig(stream_threshold=stream_threshold,
                       max_tris_in_leaf=max_leaf)
    return sc.build(cfg)


@pytest.fixture(scope="module")
def table_scene():
    obj = "/root/reference/src/objs/table - Copy.obj"
    if not os.path.exists(obj):
        pytest.skip("reference table fixture missing")
    return _scene_from_obj(obj, scale=0.03, shift=(0, 0.2, 4.0))


@pytest.fixture(scope="module")
def grid_scene_small(tmp_path_factory):
    p = tmp_path_factory.mktemp("objs") / "grid_small.obj"
    _tri_grid_obj(str(p), 12, 12)
    return _scene_from_obj(str(p))


@pytest.fixture(scope="module")
def grid_scene_large(tmp_path_factory):
    """~1,600 tris -> several hundred wf leaf rows: exercises the STACK
    WALK kernel (beyond BRUTE_MAX_ROWS) on the wf path and multiple
    treelets on the streamed path."""
    p = tmp_path_factory.mktemp("objs") / "grid_large.obj"
    _tri_grid_obj(str(p), 40, 40)
    return _scene_from_obj(str(p), max_leaf=2)


def _assert_hits_match(hit_a, hit_b, frac=1.0):
    ta, tb = np.asarray(hit_a.t), np.asarray(hit_b.t)
    assert np.isclose(ta, tb, rtol=1e-5, atol=1e-5).mean() >= frac
    assert (np.asarray(hit_a.tri) == np.asarray(hit_b.tri)).mean() >= frac


class TestBrutePath:
    def test_parity_vs_vmapped(self, table_scene):
        dev, info = table_scene
        assert info.wf_ok
        assert dev.wf_tris.shape[0] <= wavefront.BRUTE_MAX_ROWS
        o, d = _rand_rays(1024)
        hit_p, _ = traverse.ray_scene(o, d, dev, info, pallas="interpret")
        hit_x, _ = traverse.ray_scene(o, d, dev, info, pallas="off")
        _assert_hits_match(hit_p, hit_x)

    def test_multi_block_grid(self, table_scene):
        """B > block_rows*128 so the grid has several steps."""
        dev, info = table_scene
        o, d = _rand_rays(4096)
        hit_p, _ = traverse.ray_scene(o, d, dev, info, pallas="interpret")
        hit_x, _ = traverse.ray_scene(o, d, dev, info, pallas="off")
        _assert_hits_match(hit_p, hit_x)

    def test_dead_lane_masking(self, table_scene):
        """active=False lanes must report t == 0 (their t_init) and
        tri == -1; live lanes must be unaffected by dead neighbors."""
        dev, info = table_scene
        o, d = _rand_rays(512)
        active = jnp.arange(512) % 3 != 0
        hit_m, _ = traverse.ray_scene(o, d, dev, info, pallas="interpret",
                                      active=active)
        hit_f, _ = traverse.ray_scene(o, d, dev, info, pallas="interpret")
        act = np.asarray(active)
        assert np.all(np.asarray(hit_m.t)[~act] == 0.0)
        assert np.all(np.asarray(hit_m.tri)[~act] == -1)
        np.testing.assert_allclose(
            np.asarray(hit_m.t)[act], np.asarray(hit_f.t)[act])

    def test_sort_rays_parity(self, table_scene):
        dev, info = table_scene
        o, d = _rand_rays(1024)
        hit_s, _ = traverse.ray_scene(o, d, dev, info, pallas="interpret",
                                      sort_rays=True)
        hit_u, _ = traverse.ray_scene(o, d, dev, info, pallas="interpret",
                                      sort_rays=False)
        _assert_hits_match(hit_s, hit_u)


class TestStackWalkPath:
    def test_parity_vs_vmapped(self, grid_scene_large):
        dev, info = grid_scene_large
        assert info.wf_ok
        assert dev.wf_tris.shape[0] > wavefront.BRUTE_MAX_ROWS, \
            "fixture too small to exercise the stack walk"
        o, d = _rand_rays(1024, center=(14.0, 1.0, 14.0), spread=12.0)
        hit_p, _ = traverse.ray_scene(o, d, dev, info, pallas="interpret")
        hit_x, _ = traverse.ray_scene(o, d, dev, info, pallas="off")
        _assert_hits_match(hit_p, hit_x)

    def test_leaf_cap_14_edge(self, tmp_path):
        """A leaf with exactly 14 triangles fills the 128-lane row."""
        p = tmp_path / "clump.obj"
        lines = ["o clump"]
        base = np.zeros(3)  # EXACTLY coincident centroids: SAH cannot split
        for k in range(14):
            for v in (base, base + (0.5, 0, 0), base + (0, 0.5, 0)):
                lines.append(f"v {v[0]:.6f} {v[1]:.6f} {v[2] + 5:.6f}")
        for k in range(14):
            lines.append(f"f {3 * k + 1} {3 * k + 2} {3 * k + 3}")
        p.write_text("\n".join(lines) + "\n")
        dev, info = _scene_from_obj(str(p), max_leaf=1)
        assert info.wf_ok and info.max_leaf_size == 14
        o, d = _rand_rays(256, center=(0.2, 0.2, 0.0), spread=0.5)
        hit_p, _ = traverse.ray_scene(o, d, dev, info, pallas="interpret")
        hit_x, _ = traverse.ray_scene(o, d, dev, info, pallas="off")
        _assert_hits_match(hit_p, hit_x)

    def test_max_roots_fallback(self, tmp_path):
        """33 objects exceed MAX_ROOTS -> wf_ok False, vmapped still OK."""
        p = tmp_path / "many.obj"
        lines = []
        for k in range(wavefront.MAX_ROOTS + 1):
            lines.append(f"o obj{k}")
            z = 2.0 + k * 0.1
            lines += [f"v 0 0 {z}", f"v 1 0 {z}", f"v 0 1 {z}"]
            b = 3 * k
            lines.append(f"f {b + 1} {b + 2} {b + 3}")
        p.write_text("\n".join(lines) + "\n")
        dev, info = _scene_from_obj(str(p))
        assert not info.wf_ok
        o = jnp.asarray([[0.2, 0.2, 0.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        hit, _ = traverse.ray_scene(o, d, dev, info, pallas="auto")
        np.testing.assert_allclose(float(hit.t[0]), 2.0, atol=1e-3)


class TestStreamedPath:
    def test_parity_single_treelet(self, table_scene, tmp_path):
        obj = "/root/reference/src/objs/table - Copy.obj"
        dev_s, info_s = _scene_from_obj(obj, scale=0.03, shift=(0, 0.2, 4.0),
                                        stream_threshold=0)
        assert info_s.streamed and info_s.st_n_treelets == 1
        dev_n, info_n = table_scene
        o, d = _rand_rays(2048)
        hit_s, _ = traverse.ray_scene(o, d, dev_s, info_s, pallas="auto")
        hit_n, _ = traverse.ray_scene(o, d, dev_n, info_n, pallas="off")
        _assert_hits_match(hit_s, hit_n)

    def test_parity_multi_treelet(self, tmp_path_factory):
        p = tmp_path_factory.mktemp("objs") / "grid_large2.obj"
        # enough triangles for >= 2 treelets at the current treelet size
        from pathtracer0_tpu.accel import lbvh
        n = 24   # _tri_grid_obj makes nx * nz triangles
        while n * n <= lbvh.TRIS_PER_ROW * lbvh.TREELET_ROWS:
            n += 8
        _tri_grid_obj(str(p), n, n)
        dev_s, info_s = _scene_from_obj(str(p), stream_threshold=0)
        assert info_s.streamed and info_s.st_n_treelets >= 2
        dev_n, info_n = _scene_from_obj(str(p), max_leaf=2)
        o, d = _rand_rays(2048, center=(14.0, 1.0, 14.0), spread=12.0)
        hit_s, _ = traverse.ray_scene(o, d, dev_s, info_s, pallas="auto")
        hit_n, _ = traverse.ray_scene(o, d, dev_n, info_n, pallas="off")
        _assert_hits_match(hit_s, hit_n)

    def test_dead_lanes(self, tmp_path):
        p = tmp_path / "g.obj"
        _tri_grid_obj(str(p), 8, 8)
        dev, info = _scene_from_obj(str(p), stream_threshold=0)
        o, d = _rand_rays(512, center=(3.0, 1.0, 3.0), spread=3.0)
        active = jnp.arange(512) % 2 == 0
        hit, _ = traverse.ray_scene(o, d, dev, info, active=active)
        act = np.asarray(active)
        assert np.all(np.asarray(hit.t)[~act] == 0.0)

    def test_renders_end_to_end(self, tmp_path):
        """Full path-traced frame through the streamed kernel."""
        from pathtracer0_tpu.render.renderer import (render_frame,
                                                     _frame_params)
        p = tmp_path / "g.obj"
        _tri_grid_obj(str(p), 8, 8)
        sc = Scene()
        sc.set_constant_sky((0.5, 0.6, 0.9))
        sc.add_material("m")
        sc.set_last_mtl("Kd", (0.7, 0.6, 0.5))
        sc.add_object(str(p), material=0)
        cfg = RenderConfig(width=48, height=36, samples_per_frame=1,
                           max_bounces=2, auto_focus=False, blur=0.0,
                           stream_threshold=0)
        dev, info = sc.build(cfg)
        assert info.streamed
        img, rays = render_frame(
            dev, jnp.asarray([2.5, 3.0, -4.0]), jnp.asarray([0.4, 0.0, 0.0]),
            jnp.uint32(7), info=info, params=_frame_params(cfg),
            width=48, height=36, spp=1, raytracing=True, auto_focus=False,
            cam_size=cfg.cam_size, focal_length=cfg.focal_length,
            blur=0.0, focal_distance=cfg.focal_distance)
        img = np.asarray(img)
        assert np.isfinite(img).all()
        # some rays must hit the grid (non-sky pixels)
        assert (np.abs(img[..., 2] - img[..., 0]) > 1e-3).any()


class TestSurfaceSampleGatherGates:
    """surface_sample's big-scene branch statically skips gathers whose
    columns are constant (info.any_uv / any_smooth, packing.py): the gated
    branch must agree exactly with the one-hot small-scene branch."""

    def _compare(self, dev, info, n_rays=512):
        o, d = _rand_rays(n_rays, center=(2.0, 1.0, 2.0), spread=2.0)
        hit, o_n = traverse.ray_scene(o, d, dev, info, pallas="off")
        s_small = traverse.surface_sample(hit, o_n, d, dev, info=info)
        old = traverse.ONEHOT_MAX_TRIS
        try:
            traverse.ONEHOT_MAX_TRIS = 1   # force the big-scene branch
            s_big = traverse.surface_sample(hit, o_n, d, dev, info=info)
        finally:
            traverse.ONEHOT_MAX_TRIS = old
        for name in ("loc", "norm", "tangent", "uv"):
            np.testing.assert_allclose(
                np.asarray(getattr(s_small, name)),
                np.asarray(getattr(s_big, name)), atol=1e-5,
                err_msg=name)
        np.testing.assert_array_equal(np.asarray(s_small.mat),
                                      np.asarray(s_big.mat))
        np.testing.assert_array_equal(np.asarray(s_small.has_uv),
                                      np.asarray(s_big.has_uv))

    def test_no_uv_no_smooth(self, tmp_path):
        """Flat-shaded UV-less mesh: the gated path (2 gathers)."""
        p = tmp_path / "g.obj"
        _tri_grid_obj(str(p), 8, 8)
        dev, info = _scene_from_obj(str(p))
        assert not info.any_uv and not info.any_smooth
        self._compare(dev, info)

    def test_with_uv_and_smooth(self):
        """UV'd smooth mesh: the ungated path must be unchanged."""
        sc = Scene()
        sc.set_constant_sky((0.3, 0.3, 0.3))
        sc.add_material("m")
        v = np.array([[0, 0, 3], [2, 0, 3], [2, 2, 3], [0, 2, 3]],
                     np.float64)
        uv = np.array([(0, 0), (1, 0), (1, 1), (0, 1)], np.float64)
        n = np.tile(np.array([[0.1, 0.2, -1.0]]), (4, 1))
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        idx = [(0, 1, 2), (0, 2, 3)]
        pick = lambda a, j: a[[i[j] for i in idx]]
        sc.add_mesh(pick(v, 0), pick(v, 1), pick(v, 2), 0,
                    normals=(pick(n, 0), pick(n, 1), pick(n, 2)),
                    uvs=(pick(uv, 0), pick(uv, 1), pick(uv, 2)))
        dev, info = sc.build(RenderConfig())
        assert info.any_uv and info.any_smooth
        self._compare(dev, info, n_rays=256)
