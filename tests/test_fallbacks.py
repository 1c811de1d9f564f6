"""No silent performance cliffs (VERDICT r2 weak #3): every triangle scene
must land on a fast path — fused-brute, wavefront-packet, or HBM-streamed —
never the ~0.1 Mrays/s vmapped XLA fallback."""
import numpy as np

from pathtracer0_tpu import Scene
from pathtracer0_tpu.kernels import fused
from pathtracer0_tpu.render.integrator import TraceParams


def _grid_mesh(n):
    """(n-1)^2 * 2 triangles on a wavy grid."""
    xs = np.linspace(-10, 10, n)
    X, Z = np.meshgrid(xs, xs)
    Y = np.sin(X) * np.cos(Z)
    P = np.stack([X, Y, Z], axis=-1)
    a = P[:-1, :-1].reshape(-1, 3)
    b = P[1:, :-1].reshape(-1, 3)
    c = P[:-1, 1:].reshape(-1, 3)
    d = P[1:, 1:].reshape(-1, 3)
    return (np.concatenate([a, d]), np.concatenate([b, b]),
            np.concatenate([c, c]))


def test_midsize_leaf1_streams():
    """A ~41k-tri mesh at the parity default max_tris_in_leaf=1 exceeds the
    packet kernel's VMEM budget — it must build the streamed LBVH, not
    fall back to the vmapped path."""
    sc = Scene()
    sc.set_constant_sky((0.5, 0.5, 0.5))
    sc.add_material("m")
    v1, v2, v3 = _grid_mesh(144)  # 40898 tris
    sc.add_mesh(v1, v2, v3, 0)
    dev, info = sc.build(max_leaf=1)
    assert info.streamed or info.wf_ok, (info.streamed, info.wf_ok)


def test_many_objects_still_fast():
    """A 33-object scene exceeds the packet kernel's MAX_ROOTS=32 — it must
    stay eligible for the fused-brute kernel (dense tables ignore object
    roots entirely)."""
    sc = Scene()
    sc.set_constant_sky((0.5, 0.5, 0.5))
    sc.add_material("m")
    for k in range(33):
        x = float(k) * 0.1
        sc.add_tri((x, 0, 3), (x + 0.05, 0, 3), (x, 0.05, 3), 0)
    dev, info = sc.build()
    p = TraceParams(max_bounces=2)
    assert (info.streamed or info.wf_ok
            or fused.eligible(info, dev, p)), info


def test_small_scene_stays_sah():
    """Small scenes keep the reference-parity SAH forest (goldens depend
    on its traversal order)."""
    sc = Scene()
    sc.set_constant_sky((0.5, 0.5, 0.5))
    sc.add_material("m")
    v1, v2, v3 = _grid_mesh(12)  # 242 tris
    sc.add_mesh(v1, v2, v3, 0)
    dev, info = sc.build(max_leaf=4)
    assert not info.streamed
    assert info.wf_ok or fused.eligible(info, dev, TraceParams(max_bounces=2))
