"""Native streamed-forest builder (native/streambuild.cpp) vs the NumPy
reference implementation (accel/lbvh._build_streamed_numpy): bit-exact
equivalence on every output array, so the C++ fast path can never drift
from the tested NumPy semantics (same Morton quantization, same stable
sort order, same f32 packing arithmetic)."""
import numpy as np
import pytest

from pathtracer0_tpu.accel import lbvh, native_lbvh


def _soup(t, seed, spread=37.0):
    r = np.random.RandomState(seed)
    base = (r.rand(t, 3) - 0.5) * spread
    v1 = base + r.randn(t, 3) * 0.3
    v2 = base + r.randn(t, 3) * 0.3
    v3 = base + r.randn(t, 3) * 0.3
    return v1, v2, v3


requires_native = pytest.mark.skipif(
    not native_lbvh.available(), reason="native toolchain unavailable")


@requires_native
@pytest.mark.parametrize("t,seed", [
    (50, 0),        # single treelet, mostly padding
    (1792, 1),      # exactly one full treelet (128 rows * 14 tris)
    (30000, 2),     # multiple treelets with power-of-two padding
])
def test_native_matches_numpy(t, seed):
    v1, v2, v3 = _soup(t, seed)
    a = native_lbvh.build_streamed(
        v1, v2, v3, lbvh.TRIS_PER_ROW, lbvh.TREELET_ROWS,
        lbvh.SUB_GROUP_ROWS, lbvh.MORTON_BITS)
    b = lbvh._build_streamed_numpy(v1, v2, v3)
    assert a.n_rows == b.n_rows
    assert a.n_treelets == b.n_treelets
    assert a.cut_nodes == b.cut_nodes
    assert a.leaf_depth == b.leaf_depth
    assert np.array_equal(a.row_perm, b.row_perm)
    assert np.array_equal(a.tri_rows, b.tri_rows)
    assert np.array_equal(a.ctree_f, b.ctree_f)
    assert np.array_equal(a.sub_f, b.sub_f)


@requires_native
def test_duplicate_centroids_stable_order():
    """Ties in the Morton codes must preserve input order in BOTH builders
    (NumPy kind="stable" argsort vs the LSD radix sort)."""
    t = 4000
    r = np.random.RandomState(3)
    # many triangles collapsed onto a handful of centroid cells
    cells = (r.randint(0, 4, size=(t, 3))).astype(np.float64)
    jit = r.randn(t, 3) * 1e-9
    v1, v2, v3 = cells + jit, cells + jit, cells + jit
    a = native_lbvh.build_streamed(
        v1, v2, v3, lbvh.TRIS_PER_ROW, lbvh.TREELET_ROWS,
        lbvh.SUB_GROUP_ROWS, lbvh.MORTON_BITS)
    b = lbvh._build_streamed_numpy(v1, v2, v3)
    assert np.array_equal(a.row_perm, b.row_perm)
    assert np.array_equal(a.tri_rows, b.tri_rows)


def test_prefix_upload_bit_equal():
    """pack_scene transfers only the real prefix of row_perm
    (packing._put_prefix) and materializes tri_rows/sub_f/ctree_f on
    device from the vertex columns (packing._tri_rows_device) with the
    small AABB tables uploaded packed (packing._pad_lanes_device); the
    device-resident arrays must be bit-identical to the host builder's
    full arrays."""
    from pathtracer0_tpu import Scene, RenderConfig

    v1, v2, v3 = _soup(6000, 7)  # ~429 rows -> 4 treelets padded to 8
    sc = Scene()
    sc.set_constant_sky((0.4, 0.5, 0.8))
    sc.add_material("m")
    sc.add_mesh(v1, v2, v3, 0)
    dev, info = sc.build(RenderConfig(stream_threshold=0))
    assert info.streamed
    sf = lbvh.build_streamed(v1, v2, v3)
    assert np.array_equal(np.asarray(dev.st_tris), sf.tri_rows)
    assert np.array_equal(np.asarray(dev.st_sub), sf.sub_f)
    assert np.array_equal(np.asarray(dev.st_perm), sf.row_perm)
    assert np.array_equal(np.asarray(dev.st_top), sf.ctree_f)


def test_dispatcher_uses_some_builder():
    """build_streamed must produce a sound forest regardless of which
    implementation serves it (native or NumPy fallback)."""
    v1, v2, v3 = _soup(500, 4)
    sf = lbvh.build_streamed(v1, v2, v3)
    live = sf.row_perm >= 0
    assert live.sum() == 500
    # every real triangle appears exactly once
    assert np.array_equal(np.sort(sf.row_perm[live]), np.arange(500))
    # root AABB bounds all vertices
    allv = np.concatenate([v1, v2, v3]).astype(np.float32)
    assert np.all(sf.ctree_f[0, 0:3] <= allv.min(axis=0) + 1e-4)
    assert np.all(sf.ctree_f[0, 3:6] >= allv.max(axis=0) - 1e-4)
