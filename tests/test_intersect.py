"""Intersection kernel + BVH builder/traversal tests."""
import numpy as np
import pytest
import jax.numpy as jnp

from pathtracer0_tpu.kernels import intersect, traverse
from pathtracer0_tpu.accel import bvh as bvh_mod


class TestRayTri:
    def test_hit_barycentrics(self):
        o = jnp.array([0.25, 0.25, -1.0])
        d = jnp.array([0.0, 0.0, 1.0])
        v1 = jnp.array([0.0, 0.0, 0.0])
        v2 = jnp.array([1.0, 0.0, 0.0])
        v3 = jnp.array([0.0, 1.0, 0.0])
        t, u, v = intersect.ray_tri(o, d, v1, v2, v3)
        assert abs(float(t) - 1.0) < 1e-6
        # u corresponds to v2's weight, v to v3's weight
        assert abs(float(u) - 0.25) < 1e-6
        assert abs(float(v) - 0.25) < 1e-6

    def test_miss_outside(self):
        o = jnp.array([2.0, 2.0, -1.0])
        d = jnp.array([0.0, 0.0, 1.0])
        t, _, _ = intersect.ray_tri(
            o, d,
            jnp.array([0.0, 0.0, 0.0]),
            jnp.array([1.0, 0.0, 0.0]),
            jnp.array([0.0, 1.0, 0.0]),
        )
        assert float(t) > 1e29

    def test_parallel_miss(self):
        o = jnp.array([0.0, 0.0, 1.0])
        d = jnp.array([1.0, 0.0, 0.0])
        t, _, _ = intersect.ray_tri(
            o, d,
            jnp.array([0.0, 0.0, 0.0]),
            jnp.array([1.0, 0.0, 0.0]),
            jnp.array([0.0, 1.0, 0.0]),
        )
        assert float(t) > 1e29

    def test_behind_origin_miss(self):
        o = jnp.array([0.25, 0.25, 1.0])
        d = jnp.array([0.0, 0.0, 1.0])
        t, _, _ = intersect.ray_tri(
            o, d,
            jnp.array([0.0, 0.0, 0.0]),
            jnp.array([1.0, 0.0, 0.0]),
            jnp.array([0.0, 1.0, 0.0]),
        )
        assert float(t) > 1e29

    def test_batched_broadcast(self):
        o = jnp.zeros((4, 1, 3)).at[:, 0, 2].set(-1.0)
        d = jnp.zeros((4, 1, 3)).at[:, 0, 2].set(1.0)
        v1 = jnp.tile(jnp.array([[-1.0, -1.0, 0.0]]), (3, 1))[None]
        v2 = jnp.tile(jnp.array([[1.0, -1.0, 0.0]]), (3, 1))[None]
        v3 = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (3, 1))[None]
        t, u, v = intersect.ray_tri(o, d, v1, v2, v3)
        assert t.shape == (4, 3)


class TestRayBox:
    def test_outside_hit(self):
        t = intersect.ray_box(
            jnp.array([0.0, 0.0, -2.0]), jnp.array([0.0, 0.0, 1.0]),
            jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
        )
        assert abs(float(t) - 1.0) < 1e-6

    def test_inside_returns_zero(self):
        t = intersect.ray_box(
            jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]),
            jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
        )
        assert float(t) == 0.0

    def test_miss(self):
        t = intersect.ray_box(
            jnp.array([0.0, 5.0, -2.0]), jnp.array([0.0, 0.0, 1.0]),
            jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
        )
        assert float(t) > 1e29

    def test_behind(self):
        t = intersect.ray_box(
            jnp.array([0.0, 0.0, 5.0]), jnp.array([0.0, 0.0, 1.0]),
            jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
        )
        assert float(t) > 1e29


class TestRayEllipsoid:
    def test_sphere_front(self):
        t = intersect.ray_ellipsoid(
            jnp.array([0.0, 0.0, -3.0]), jnp.array([0.0, 0.0, 1.0]),
            jnp.array([0.0, 0.0, 0.0]), jnp.float32(1.0),
            jnp.array([1.0, 1.0, 1.0]),
        )
        assert abs(float(t) - 2.0) < 1e-5

    def test_inside_returns_exit(self):
        """Deliberate fix over the reference (PARITY.md #3): from inside,
        return the positive exit distance, not the negative entry root."""
        t = intersect.ray_ellipsoid(
            jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]),
            jnp.zeros(3), jnp.float32(1.0), jnp.ones(3),
        )
        assert abs(float(t) - 1.0) < 1e-5

    def test_miss(self):
        t = intersect.ray_ellipsoid(
            jnp.array([0.0, 5.0, -3.0]), jnp.array([0.0, 0.0, 1.0]),
            jnp.zeros(3), jnp.float32(1.0), jnp.ones(3),
        )
        assert float(t) > 1e29

    def test_stretch(self):
        # f=4 compresses x: ellipsoid semi-axis along x is r/sqrt(f) = 0.5
        t = intersect.ray_ellipsoid(
            jnp.array([-3.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0]),
            jnp.zeros(3), jnp.float32(1.0), jnp.array([4.0, 1.0, 1.0]),
        )
        assert abs(float(t) - 2.5) < 1e-5


def _random_tris(n, rng, spread=10.0):
    base = rng.uniform(-spread, spread, (n, 1, 3))
    tri = base + rng.uniform(-1.0, 1.0, (n, 3, 3))
    return tri.astype(np.float64)


def _brute_force(o, d, tris):
    """Reference closest hit over all triangles (float32, same kernel)."""
    v1 = jnp.asarray(tris[:, 0], jnp.float32)
    v2 = jnp.asarray(tris[:, 1], jnp.float32)
    v3 = jnp.asarray(tris[:, 2], jnp.float32)
    t, u, v = intersect.ray_tri(
        jnp.asarray(o, jnp.float32)[:, None, :],
        jnp.asarray(d, jnp.float32)[:, None, :],
        v1[None], v2[None], v3[None],
    )
    best = jnp.argmin(t, axis=1)
    bt = jnp.take_along_axis(t, best[:, None], axis=1)[:, 0]
    return np.asarray(bt), np.asarray(best)


class TestBVH:
    def test_forest_invariants(self):
        rng = np.random.RandomState(3)
        tris = _random_tris(200, rng)
        forest = bvh_mod.build_forest(
            tris[:, 0], tris[:, 1], tris[:, 2], [(0, 120), (120, 200)],
            max_leaf=2,
        )
        n = forest.num_nodes
        assert len(forest.roots) == 2
        # every tri appears exactly once across leaves
        assert sorted(forest.leaf_tri_indices.tolist()) == list(range(200))
        is_leaf = (forest.left == -1) & (forest.right == -1)
        # leaves have ranges, internals have children within bounds
        for i in range(n):
            if is_leaf[i]:
                assert forest.leaf_end[i] > forest.leaf_start[i]
            else:
                assert 0 <= forest.left[i] < n
                assert 0 <= forest.right[i] < n
        # child AABBs inside parent AABBs
        for i in range(n):
            if not is_leaf[i]:
                for c in (forest.left[i], forest.right[i]):
                    assert np.all(
                        forest.node_min[c] >= forest.node_min[i] - 1e-5)
                    assert np.all(
                        forest.node_max[c] <= forest.node_max[i] + 1e-5)
        # leaf AABBs contain their tris
        for i in range(n):
            if is_leaf[i]:
                ids = forest.leaf_tri_indices[
                    forest.leaf_start[i]:forest.leaf_end[i]]
                pts = tris[ids].reshape(-1, 3)
                assert np.all(pts.min(0) >= forest.node_min[i] - 1e-4)
                assert np.all(pts.max(0) <= forest.node_max[i] + 1e-4)

    def test_traversal_matches_brute_force(self, table_scene):
        dev, info = table_scene.build()
        rng = np.random.RandomState(4)
        n_rays = 256
        o = rng.uniform(-2, 2, (n_rays, 3))
        o[:, 2] -= 3.0
        target = rng.uniform(-1, 1, (n_rays, 3))
        target[:, 2] += 3.0
        d = target - o
        d /= np.linalg.norm(d, axis=1, keepdims=True)

        hit, o_n = traverse.ray_scene(
            jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
            dev, info,
        )
        tris = np.stack(
            [np.asarray(dev.tri_v1), np.asarray(dev.tri_v2),
             np.asarray(dev.tri_v3)], axis=1,
        )
        bt, bi = _brute_force(np.asarray(o_n), d, tris)
        ht = np.asarray(hit.t)
        np.testing.assert_allclose(ht, bt, rtol=1e-4, atol=1e-5)
        # tri ids must match wherever the hit is unambiguous
        hit_mask = bt < 1e25
        agree = (np.asarray(hit.tri)[hit_mask] == bi[hit_mask])
        assert agree.mean() > 0.99

    def test_traversal_random_soup(self):
        rng = np.random.RandomState(5)
        tris = _random_tris(300, rng, spread=5.0)
        from pathtracer0_tpu.scene.packing import pack_scene
        from pathtracer0_tpu import Scene, RenderConfig

        sc = Scene()
        sc.add_material("m")
        for i in range(300):
            sc.tris.add_triangle(
                tris[i, 0], tris[i, 1], tris[i, 2],
                (0, 0, 0), (0, 0, 0), (0, 0, 0),
                (0, 0), (0, 0), (0, 0), False, 0,
            )
        sc.tris.object_ranges.append((0, 300))
        dev, info = pack_scene(sc, RenderConfig(), max_leaf=4)

        n_rays = 200
        o = rng.uniform(-8, 8, (n_rays, 3))
        d = rng.randn(n_rays, 3)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        hit, o_n = traverse.ray_scene(
            jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
            dev, info,
        )
        bt, _ = _brute_force(np.asarray(o_n), d, tris)
        np.testing.assert_allclose(np.asarray(hit.t), bt, rtol=1e-4,
                                   atol=1e-5)


class TestAxisParallelSlab:
    def test_on_plane_axis_ray_hits(self):
        """A straight-down ray whose x lies exactly on a box plane must
        still enter the box (0 * inf = NaN dropped it before the
        safe_inv_dir fix — PARITY.md #14)."""
        import jax.numpy as jnp
        from pathtracer0_tpu.kernels import intersect

        o = jnp.asarray([2.8, 8.0, 2.8])
        d = jnp.asarray([0.0, -1.0, 0.0])
        bmin = jnp.asarray([2.8, 0.0, 2.0])   # x-plane exactly at o.x
        bmax = jnp.asarray([3.5, 1.0, 3.5])
        t = intersect.ray_box(o, d, bmin, bmax)
        assert float(t) == pytest.approx(7.0, abs=1e-4)

    def test_full_traversal_on_boundary(self, table_scene):
        """End-to-end: axis-aligned rays across the scene AABB never NaN
        and match the brute-force reference on every kernel path."""
        import numpy as np
        import jax.numpy as jnp
        from pathtracer0_tpu.kernels import traverse

        dev, info = table_scene.build(max_leaf=4)
        lo = np.asarray(dev.node_min).min(axis=0)
        hi = np.asarray(dev.node_max).max(axis=0)
        xs = np.linspace(lo[0], hi[0], 16)
        zs = np.linspace(lo[2], hi[2], 16)
        X, Z = np.meshgrid(xs, zs)
        o = jnp.asarray(np.c_[X.ravel(), np.full(256, hi[1] + 1.0),
                              Z.ravel()], jnp.float32)
        d = jnp.asarray(np.tile([0.0, -1.0, 0.0], (256, 1)), jnp.float32)
        h_v, _ = traverse.ray_scene(o, d, dev, info, pallas="off")
        h_p, _ = traverse.ray_scene(o, d, dev, info, pallas="interpret")
        tv = np.asarray(h_v.t)
        tp = np.asarray(h_p.t)
        assert np.isfinite(tv[tv < 1e29]).all()
        assert np.isclose(tv, tp, rtol=1e-5, atol=1e-5).all()
