"""Native (C++) streamed-forest build fast path.

The vectorized NumPy LBVH builder (accel/lbvh.py) is the host-side cost
of opening a multi-million-triangle scene (the reference's own 4M-tri
anecdote, /root/reference/src/Main/dispatch.java:1798): on this image's
single CPU it spends seconds materializing (T, 3) float64 intermediates
and running np.argsort. native/streambuild.cpp performs the identical
build — same Morton quantization, same stable sort order, same float32
packing arithmetic — in four streaming passes with an LSD radix sort.
Bit-exact equivalence with the NumPy builder is pinned by
tests/test_native_lbvh.py.

Compiled on first use with g++ (no pybind11 in this image) and loaded
via ctypes, mirroring scene/native_obj.py. Falls back silently to the
NumPy builder when the toolchain is unavailable
(accel/lbvh.build_streamed handles the dispatch; set PT0_NATIVE_LBVH=0
to force NumPy).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_FAILED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _load_lib():
    """Compile native/streambuild.cpp on first use (cached by mtime)."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    src = os.path.join(_repo_root(), "native", "streambuild.cpp")
    out_dir = os.path.join(_repo_root(), "native", "build")
    so = os.path.join(out_dir, "libpt0stream.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            os.makedirs(out_dir, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.pt0_build_streamed.restype = ctypes.c_int64
        lib.pt0_build_streamed.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
        _LIB = None
    return _LIB


def available() -> bool:
    return os.environ.get("PT0_NATIVE_LBVH", "1") != "0" \
        and _load_lib() is not None


def build_streamed(v1: np.ndarray, v2: np.ndarray, v3: np.ndarray,
                   tris_per_row: int, treelet_rows: int,
                   sub_group_rows: int, bits: int, mode: int = 0,
                   want_tri_rows: bool = True):
    """Native twin of lbvh._build_streamed_numpy. Returns a StreamedForest
    (imported lazily to avoid the circular module edge).

    mode 0 = Morton order (bit-exact with the NumPy builder);
    mode 1 = balanced median-split order (native-only; same layout,
    tighter node AABBs — see native/streambuild.cpp median_order).

    want_tri_rows=False skips packing the (r_pad, 128) leaf-row table
    (268 MB at 4M tris) and returns a 1-row placeholder — for callers
    that rebuild it on device (scene/packing._tri_rows_device)."""
    from . import lbvh

    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native streamed builder unavailable")
    t = int(v1.shape[0])
    v1 = np.ascontiguousarray(v1, np.float64)
    v2 = np.ascontiguousarray(v2, np.float64)
    v3 = np.ascontiguousarray(v3, np.float64)

    # Shape arithmetic identical to the NumPy builder
    n_rows = -(-t // tris_per_row)
    n_treelets = max(-(-n_rows // treelet_rows), 1)
    n_treelets = 1 << int(np.ceil(np.log2(n_treelets)))
    r_pad = n_treelets * treelet_rows
    n_groups = treelet_rows // sub_group_rows
    sub_stride = 2 * n_groups
    cut_nodes = 2 * n_treelets - 1

    tri_rows = np.zeros((r_pad if want_tri_rows else 0, 128), np.float32)
    row_perm = np.full(r_pad * tris_per_row, -1, np.int32)
    ctree_f = np.zeros((cut_nodes, 8), np.float32)
    sub_f = np.zeros((n_treelets * sub_stride, 128), np.float32)

    dp = ctypes.POINTER(ctypes.c_double)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.pt0_build_streamed(
        v1.ctypes.data_as(dp), v2.ctypes.data_as(dp), v3.ctypes.data_as(dp),
        t, tris_per_row, treelet_rows, sub_group_rows, bits, n_treelets,
        mode,
        tri_rows.ctypes.data_as(fp) if want_tri_rows else fp(),
        row_perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctree_f.ctypes.data_as(fp), sub_f.ctypes.data_as(fp),
    )
    if rc != 0:
        raise RuntimeError(f"pt0_build_streamed failed (rc={rc})")

    return lbvh.StreamedForest(
        ctree_f=ctree_f,
        sub_f=sub_f,
        tri_rows=tri_rows,
        row_perm=row_perm,
        n_rows=n_rows,
        n_treelets=n_treelets,
        cut_nodes=cut_nodes,
        leaf_depth=int(np.log2(r_pad)),
    )
