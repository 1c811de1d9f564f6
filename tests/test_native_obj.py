"""Native C++ OBJ tokenizer vs the line-by-line Python parser.

The native path (scene/native_obj.py + native/objparse.cpp) must produce
the SAME packed scene as objparse.parse_obj for every semantic rule:
vertex transforms, o/g object segmentation + material reset, usemtl
last-match-wins lookup, quad truncation, UV sentinel handling, flat-normal
fallback, smooth-normal normalization.
"""
import os

import numpy as np
import pytest

from pathtracer0_tpu import Scene, RenderConfig
from pathtracer0_tpu.scene import native_obj

pytestmark = pytest.mark.skipif(
    not native_obj.available(), reason="g++ unavailable"
)

TABLE_OBJ = "/root/reference/src/objs/table - Copy.obj"


def _mixed_obj(path):
    """Exercises vt/vn faces, quads, usemtl, multiple objects, the UV
    sentinel value, and missing normals."""
    lines = [
        "mtllib fake.mtl",
        "o first",
        "v 0 0 5", "v 1 0 5", "v 0 1 5", "v 1 1 5",
        "vt 0.1 0.2", "vt 0.9 0.2", "vt 0.1 0.8",
        "vn 0 0 -1", "vn 0 0.2 -1", "vn 0.1 0 -1",
        "usemtl red",
        "f 1/1/1 2/2/2 3/3/3",
        "f 1/1 2/2 3/3",            # no normals -> flat
        "f 1 2 4 3",                 # quad, no uv/vn -> truncated + flat
        "g second",                  # material resets to the default
        "v -1 0 7", "v 1 0 7", "v 0 2 7",
        "f 5 6 7",
        "usemtl blue",
        "f 5 7 6",
        "o third",
        "v 0 0 9", "v 2 0 9", "v 0 2 9",
        "vt 69.420 0.5", "vt 0.5 0.5", "vt 0.6 0.6",
        "f 8/4 9/5 10/6",            # u == sentinel -> has_uv False
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _build_both(obj_path, **add_kw):
    def build(native):
        sc = Scene()
        sc.set_constant_sky()
        sc.add_material("red")
        sc.set_last_mtl("Kd", (0.8, 0.1, 0.1))
        sc.add_material("blue")
        sc.set_last_mtl("Kd", (0.1, 0.1, 0.8))
        os.environ["PT0_NATIVE_OBJ"] = "1" if native else "0"
        try:
            sc.add_object(obj_path, **add_kw)
        finally:
            del os.environ["PT0_NATIVE_OBJ"]
        return sc.build(RenderConfig(max_tris_in_leaf=4))

    return build(False), build(True)


def _assert_scene_equal(py, nat):
    dev_p, info_p = py
    dev_n, info_n = nat
    assert info_p.num_objects == info_n.num_objects
    for field in ("tri_v1", "tri_v2", "tri_v3", "tri_n1", "tri_n2",
                  "tri_n3", "tri_uv1", "tri_uv2", "tri_uv3", "tri_has_uv",
                  "tri_has_smooth", "tri_mat", "tri_attr"):
        a = np.asarray(getattr(dev_p, field))
        b = np.asarray(getattr(dev_n, field))
        assert a.shape == b.shape, field
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=field)


def test_mixed_features_equal(tmp_path):
    p = str(tmp_path / "mixed.obj")
    _mixed_obj(p)
    _assert_scene_equal(*_build_both(p, material=0))


def test_transformed_equal(tmp_path):
    p = str(tmp_path / "mixed.obj")
    _mixed_obj(p)
    _assert_scene_equal(*_build_both(
        p, material=1, scale=(0.5, 2.0, 1.0), shift=(3.0, -1.0, 2.0),
        rot=(0.3, 0.7, 0.1)))


@pytest.mark.skipif(not os.path.exists(TABLE_OBJ),
                    reason="reference fixture missing")
def test_reference_fixture_equal():
    _assert_scene_equal(*_build_both(
        TABLE_OBJ, material=0, scale=(0.03,) * 3, shift=(0.0, 0.2, 4.0),
        rot=(0.0, 0.5, 0.0)))


def test_throughput_sanity(tmp_path):
    """The native path must tokenize a generated mesh far faster than the
    Python parser (the reason it exists)."""
    import time

    p = str(tmp_path / "big.obj")
    n = 40000
    rng = np.random.RandomState(0)
    v = rng.rand(3 * n, 3) * 10
    with open(p, "w") as f:
        f.write("o big\n")
        for row in v:
            f.write(f"v {row[0]:.5f} {row[1]:.5f} {row[2]:.5f}\n")
        for k in range(n):
            f.write(f"f {3 * k + 1} {3 * k + 2} {3 * k + 3}\n")

    t0 = time.perf_counter()
    verts, uvs, norms, faces, events = native_obj.tokenize(p)
    dt = time.perf_counter() - t0
    assert faces.shape == (n, 9)
    assert verts.shape == (3 * n, 3)
    assert dt < 2.0, f"native tokenize took {dt:.2f}s for {n} faces"
