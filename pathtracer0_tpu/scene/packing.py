"""DeviceScene: the packed, device-resident scene representation.

Equivalent of the reference's SSBO uploads (dispatch.java:208-560): triangle
SoA, BVH forest, analytic primitives, 48-float material records, and the
padded texture array. A NamedTuple of arrays = a JAX pytree, so a
DeviceScene passes straight through jit/pjit and can be replicated across a
device mesh with one broadcast.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax

from ..config import RenderConfig
from ..accel import bvh as bvh_mod
from .material import pack_materials
# Module-scope kernel-constant imports: pack_scene used to import these
# lazily, which put the one-time ~1 s pallas import inside the FIRST
# scene build of a process — i.e. inside the scale bench's build_s.
# Program startup is the honest place for it (the reference's analogue is
# GL bootstrap, dispatch.java:156-189).
from ..kernels.fused import (ATTR_CAP, FUSED_MAX_TRIS, MAP_MAX_H,
                             MAP_MAX_W, MAP_TEXEL_BUDGET, SKY_TEXEL_BUDGET,
                             TRI_CAP, UVT_CAP, UVT_STRIDE)
from ..kernels.traverse import ONEHOT_MAX_TRIS
from ..kernels.wavefront import MAX_ROOTS

# Wavefront-table VMEM budget shared by the post-build wf_ok gate and the
# pre-build streaming-policy estimate (they MUST agree, or mid-size scenes
# fall into the gap between the packet and streamed paths).
WF_VMEM_BUDGET = 8 * 1024 * 1024


def _wf_vmem_bytes(n_node_rows: int, n_tri_rows: int) -> int:
    """VMEM footprint of the packet-kernel tables: node rows pad their
    8/4-float lanes to full 128-lane tiles; triangle rows are 128 wide."""
    return n_node_rows * 128 * 4 + n_tri_rows * 512


def _put_prefix(host: np.ndarray, real_rows: int, tail_row=None):
    """Device-put only the real prefix of a row-padded streamed table and
    rebuild the constant-fill tail on device.

    The streamed forest pads its slot count to a power-of-two treelet grid
    (accel/lbvh.py), so the tail past the real triangles is known constant
    fill — and the tunnel host->device link moves only ~22-97 MB/s
    (tools/diag_build4m.py). Reconstructing the tail device-side
    (broadcast + concat at HBM bandwidth) removes that wire time from
    build_s. Bit-equality with the full transfer is pinned by
    tests/test_native_lbvh.py.

    `tail_row` is the per-row constant the builder leaves in the pad
    region (defaults to zeros)."""
    import jax.numpy as jnp

    n_pad = int(host.shape[0]) - int(real_rows)
    if n_pad <= 0:
        return jax.device_put(host)
    head = jax.device_put(np.ascontiguousarray(host[:real_rows]))
    if tail_row is None:
        tail = jnp.zeros((n_pad,) + host.shape[1:], host.dtype)
    else:
        tail = jnp.broadcast_to(
            jnp.asarray(tail_row, host.dtype), (n_pad,) + host.shape[1:])
    return jnp.concatenate([head, tail], axis=0)


def _pad_lanes_device(host6: np.ndarray, lanes: int = 128):
    """Upload a small forest AABB table in PACKED 6-lane form and pad to
    the kernel's 128-lane row layout on device. sub_f at 4M tris is 134 MB
    of which 122/128 lanes are constant zero fill — the packed transfer is
    6.3 MB (tools/diag_build4m.py measured the tunnel at ~22-97 MB/s, so
    the fill was seconds of wire time for nothing)."""
    import jax.numpy as jnp

    return jnp.pad(jax.device_put(np.ascontiguousarray(host6)),
                   ((0, 0), (0, lanes - host6.shape[1])))


def _tri_rows_device(v1, v2, v3, perm, *, tris_per_row: int):
    """Materialize the streamed forest's leaf-row table (st_tris — the one
    BIG table, 268 MB at 4M tris) ON DEVICE.

    tri_rows is a pure gather+reshape of the f32 vertex columns under the
    builder's row permutation (accel/lbvh.py:158-166) — and the vertex
    columns already cross the tunnel for the shade path's attribute
    gathers, so rebuilding it device-side replaces the dominant transfer
    of a big-scene build with an HBM-bandwidth gather (~0.3 s executed vs
    ~8-12 s of wire time; tools/diag_build4m.py).

    Deliberately NOT built here: sub_f/ctree_f. Their heap-reduction graph
    measured 38 s of XLA compile (vs 0.6 s execution) at 4M tris — they go
    over the wire packed instead (_pad_lanes_device). This graph is just
    gathers/arithmetic/reshape and compiles in ~5 s once per scene shape
    (persistently cached).

    Bit-exactness with the host builders (pinned by tests/test_native_lbvh
    .py::test_prefix_upload_bit_equal): f64->f32 vertex conversion commutes
    with the gather, and the f32 edge subtraction matches the NumPy path's
    post-astype subtraction and the native builder's explicit
    convert-then-subtract (native/streambuild.cpp pass 3).

    Planar (flat per-component columns) on purpose: an AoS formulation
    over (N, 3)-minor intermediates measured 11 s at 1M tris on v5e (the
    T(8,128) minor-padding tax on materialized buffers, PERF.md)."""
    return _tri_rows_jit(v1, v2, v3, perm, tris_per_row)


def _tri_rows_impl(v1, v2, v3, perm, tris_per_row):
    import jax.numpy as jnp

    r_pad = perm.shape[0] // tris_per_row
    valid = perm >= 0
    idx = jnp.maximum(perm, 0)
    comps = [jnp.where(valid, v[:, c][idx], 0.0)
             for v in (v1, v2, v3) for c in range(3)]
    a, b, cc = comps[0:3], comps[3:6], comps[6:9]
    # leaf rows: [a, b-a, c-a] x tris_per_row in the first 126 lanes;
    # st_tris[r, 9j+k] = lane k of sorted slot r*tris_per_row+j
    lanes = (a + [b[c] - a[c] for c in range(3)]
             + [cc[c] - a[c] for c in range(3)])
    st = jnp.stack([l.reshape(r_pad, tris_per_row) for l in lanes],
                   axis=2)
    return jnp.pad(st.reshape(r_pad, 9 * tris_per_row),
                   ((0, 0), (0, 128 - 9 * tris_per_row)))


# Module-level jit: a closure jitted inside _tri_rows_device would
# recompile on EVERY build (~5.5 s at 4M tris without a persistent-cache
# hit); one shared jit object caches by argument shape in-process.
_tri_rows_jit = jax.jit(_tri_rows_impl, static_argnums=4)


def _idx_tables_impl(verts, faces, vn, vuv, mat_id, smooth, has_uv):
    """Expand an indexed mesh (Scene.add_mesh_indexed) to every
    per-triangle device table the big-scene shade path reads, in ONE
    compiled program (one compile + one dispatch per build; the tunnel
    charges ~0.5-6 ms per dispatch and small programs individually fall
    under the persistent-cache threshold).

    Positions / smooth normals / UVs are gathers of f32-converted vertex
    tables — bit-identical to the host expansion, since f64->f32
    conversion commutes with a gather. FLAT normals are the one deliberate
    deviation: computed here in f32 ((v3-v1) x (v2-v1) orientation,
    dispatch.java:398) instead of crossing the tunnel as a 48 MB (at 4M
    tris) host-f64-derived column; they agree to ~1e-6 absolute, validated
    whole-image by tests/test_indexed_mesh.py."""
    import jax.numpy as jnp

    t = faces.shape[0]
    v1 = verts[faces[:, 0]]
    v2 = verts[faces[:, 1]]
    v3 = verts[faces[:, 2]]
    if smooth:
        n1 = vn[faces[:, 0]]
        n2 = vn[faces[:, 1]]
        n3 = vn[faces[:, 2]]
    else:
        e1 = v3 - v1
        e2 = v2 - v1
        fx = e1[:, 1] * e2[:, 2] - e1[:, 2] * e2[:, 1]
        fy = e1[:, 2] * e2[:, 0] - e1[:, 0] * e2[:, 2]
        fz = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
        mag = jnp.maximum(jnp.sqrt(fx * fx + fy * fy + fz * fz),
                          jnp.float32(1e-30))
        n1 = jnp.stack([fx / mag, fy / mag, fz / mag], axis=1)
        n2 = n3 = None
    if has_uv:
        uv1 = vuv[faces[:, 0]]
        uv2 = vuv[faces[:, 1]]
        uv3 = vuv[faces[:, 2]]
    else:
        uv1 = uv2 = uv3 = None
    return dict(
        v1=v1, v2=v2, v3=v3, n1=n1, n2=n2, n3=n3,
        uv1=uv1, uv2=uv2, uv3=uv3,
        mat=jnp.full((t,), mat_id, jnp.int32),
        obj=jnp.zeros((t,), jnp.int32),
        has_uv=jnp.full((t,), has_uv, bool),
        has_smooth=jnp.full((t,), smooth, bool),
    )


_idx_tables_jit = jax.jit(_idx_tables_impl,
                          static_argnums=(4, 5, 6))


class DeviceScene(NamedTuple):
    # Triangles (SSBO binding 3, dispatch.java:383-426)
    tri_v1: jax.Array   # (T, 3) f32
    tri_v2: jax.Array
    tri_v3: jax.Array
    tri_n1: jax.Array   # (T, 3) f32 (normalized; flat normal in all slots
    tri_n2: jax.Array   #   when has_smooth is False)
    tri_n3: jax.Array
    tri_uv1: jax.Array  # (T, 2) f32
    tri_uv2: jax.Array
    tri_uv3: jax.Array
    tri_has_uv: jax.Array      # (T,) bool (replaces the 69.420 sentinel)
    tri_has_smooth: jax.Array  # (T,) bool
    tri_mat: jax.Array         # (T,) i32

    # BVH forest (SSBO bindings 10-13, dispatch.java:490-535)
    node_min: jax.Array    # (N, 3) f32
    node_max: jax.Array    # (N, 3) f32
    node_left: jax.Array   # (N,) i32
    node_right: jax.Array  # (N,) i32
    leaf_start: jax.Array  # (N,) i32
    leaf_end: jax.Array    # (N,) i32
    leaf_tri: jax.Array    # (L,) i32
    roots: jax.Array       # (O,) i32

    # Ellipsoids (SSBO binding 7, dispatch.java:459-488)
    ell_c: jax.Array        # (E, 3) f32
    ell_stretch: jax.Array  # (E, 3) f32
    ell_rot: jax.Array      # (E, 3) f32
    ell_rad: jax.Array      # (E,) f32
    ell_mat: jax.Array      # (E,) i32

    # Implicits (SSBO binding 5, dispatch.java:428-457)
    imp_fn: jax.Array     # (I,) i32
    imp_shift: jax.Array  # (I, 3) f32
    imp_scale: jax.Array  # (I, 3) f32
    imp_rot: jax.Array    # (I, 3) f32
    imp_mat: jax.Array    # (I,) i32

    # Wavefront (Pallas packet-traversal) tables — component-major SoA so
    # the large axis is the 128-lane minor dim (kernels/wavefront.py).
    wf_nodes_f: jax.Array  # (8, N) f32: min xyz, max xyz, pad, pad
    wf_nodes_i: jax.Array  # (4, N) i32: left, right, leaf_start, leaf_end
    wf_tris: jax.Array     # (9, T') f32: v1, e1, e2 in leaf order
    wf_perm: jax.Array     # (T',) i32: reordered row -> original tri index
    wf_roots: jax.Array    # (MAX_ROOTS+1,) i32: [count, root ids...]
    tri_obj: jax.Array     # (T,) i32: original tri -> object root node id

    # Combined per-triangle attribute table for one-hot (MXU) fetch at
    # shading time (kernels/traverse.surface_sample): columns are
    # 0-8 n1/n2/n3, 9-14 uv1/uv2/uv3, 15 has_uv, 16 has_smooth, 17 mat,
    # 18-26 v1/v2/v3.
    tri_attr: jax.Array    # (T, 27) f32

    # Dense fused tables (kernels/fused.py): triangles at TRI_CAP=14/row
    # and attributes at ATTR_CAP=12/row, both in leaf order — densities are
    # independent because the kernel resolves attributes by committed
    # triangle id AFTER the intersection loop (not at commit time), so the
    # two tables need not share row alignment. Built for scenes up to
    # FUSED_MAX_TRIS; a 1-row zero placeholder otherwise.
    fs_tris: jax.Array     # (Lf, 128) f32
    fs_attr: jax.Array     # (La, 128) f32
    # In-kernel texture shading (kernels/fused.py): UV + raw-tangent
    # attribute rows (UVT_CAP slots/row, leaf order) and the packed
    # material-map texel table — image row y of the map based at row b
    # occupies rows_per_y = ceil(3W/128) table rows; texel (y, x) channel
    # c sits at [b + y*rows_per_y + (3x+c)//128, (3x+c)%128] — so the
    # kernel's bilinear weight-accumulation walks rows with a dynamic
    # sublane index and static lane offsets. 1-row zero placeholders when
    # the scene has no (eligible) maps.
    fs_uvt: jax.Array      # (Lu, 128) f32
    fs_maps: jax.Array     # (Rm, 128) f32
    # The sky texture (texture 0) in the same layout, for the in-kernel
    # equirect miss shade (Whitted mode, kernels/fused._frame_kernel)
    fs_sky: jax.Array      # (Rs, 128) f32
    ell_tab: jax.Array     # (E, 17) f32: c(3), stretch(3), rad, mat, R(9)
    imp_tab: jax.Array     # (I, 17) f32: shift(3), scale(3), pad, mat, R(9)

    # HBM-streamed LBVH (accel/lbvh.py + kernels/wavefront.trace_streamed):
    # populated when the scene exceeds config.stream_threshold triangles.
    st_top: jax.Array      # (2*n_treelets - 1, 8) f32 top-tree AABBs
    st_tris: jax.Array     # (n_treelets * treelet_rows, 128) f32 rows
    st_sub: jax.Array      # (n_treelets * treelet_rows, 128) f32 subtree
    st_perm: jax.Array     # (rows * 14,) i32 slot -> original tri (-1 pad)

    # Materials (SSBO binding 14, dispatch.java:270-329)
    materials: jax.Array  # (M, 48) f32
    # Legacy 18-float materials (SSBO binding 6, dispatch.java:538-551;
    # decoded by the dormant newMat, raytrace.glsl:162-178). The leading
    # count element of the reference buffer becomes info.n_legacy_mats.
    # One zero row when none (fixed pytree shape).
    legacy_mats: jax.Array  # (max(Ml, 1), 18) f32

    # Textures (bindless handles in the reference, dispatch.java:331-379)
    tex_data: jax.Array   # (K, Hmax, Wmax, 3) f32
    tex_sizes: jax.Array  # (K, 2) i32

    @property
    def num_tris(self) -> int:
        return self.tri_v1.shape[0]

    @property
    def num_objects(self) -> int:
        return self.roots.shape[0]

    @property
    def num_ellipsoids(self) -> int:
        return self.ell_rad.shape[0]

    @property
    def num_implicits(self) -> int:
        return self.imp_fn.shape[0]

    @property
    def max_leaf_size(self) -> int:
        # static metadata for the traversal kernel (leaf loop trip count)
        sizes = np.asarray(self.leaf_end) - np.asarray(self.leaf_start)
        return int(sizes.max()) if sizes.size else 0


def _pack_texel_rows(img: np.ndarray):
    """Pack an (H, W, 3) image into kernel texel rows: image row y spans
    rows_per_y = ceil(3W/128) consecutive 128-lane rows (see
    DeviceScene.fs_maps layout). Returns ((H*rows_per_y, 128) f32, rpy)."""
    hh, ww = img.shape[0], img.shape[1]
    rpy = -(-(ww * 3) // 128)
    block = np.zeros((hh * rpy, 128), np.float32)
    flat = np.asarray(img, np.float32).reshape(hh, ww * 3)
    for y in range(hh):
        block[y * rpy:(y + 1) * rpy].reshape(-1)[: ww * 3] = flat[y]
    return block, rpy


def pack_scene(scene, config: RenderConfig,
               max_leaf: Optional[int] = None,
               _force_streamed: bool = False) -> DeviceScene:
    """Build the BVH forest and pack all host-side scene state to arrays."""
    t = scene.tris
    n_list = len(t)
    bulk = getattr(scene, "bulk_meshes", [])

    def field(name, width, dtype=np.float64):
        """Combined per-triangle column: parsed/loose rows first, then the
        bulk meshes (Scene.add_mesh) in registration order."""
        parts = []
        if n_list:
            col = getattr(t, name)
            parts.append(np.stack(col) if width else np.asarray(col))
        parts += [bm[name] for bm in bulk]
        if len(parts) == 1:
            # single-source column (one add_mesh call): zero-copy when the
            # dtype already matches — at 4M tris each concatenate+astype
            # pair was a ~100 MB copy on this box's single CPU
            return np.asarray(parts[0], dtype)
        if parts:
            return np.concatenate(parts).astype(dtype)
        return np.zeros((0, width) if width else (0,), dtype)

    object_ranges = list(t.object_ranges)
    ofs = n_list
    for bm in bulk:
        k = (bm.faces.shape[0] if getattr(bm, "faces", None) is not None
             else bm["v1"].shape[0])
        object_ranges.append((ofs, ofs + k))
        ofs += k
    n_tri = ofs

    # Indexed-mesh fast path (Scene.add_mesh_indexed): when the WHOLE
    # triangle set is one indexed mesh, the streamed upload ships compact
    # (verts, faces) and expands on device instead of moving expanded
    # columns over the tunnel (VERDICT r4 #4; see the streamed branch and
    # the attribute-table section below).
    _idx_mesh = bulk[0] if (
        n_list == 0 and len(bulk) == 1
        and getattr(bulk[0], "faces", None) is not None) else None

    def stack3(name, width=3):
        return field(name, width, np.float32)

    v1 = field("v1", 3)
    v2 = field("v2", 3)
    v3 = field("v3", 3)

    # Streaming policy (VERDICT r2 weak #3 — close the fallback cliff):
    # stream when past the size threshold, AND ALSO whenever a mid-size
    # scene would fail the wavefront-packet gates (too many object roots,
    # or estimated tables past the VMEM budget) while being too big for
    # the fused-brute kernel — those scenes used to land silently on the
    # ~0.1 Mrays/s vmapped XLA path.

    _eff_leaf = max_leaf if max_leaf is not None else config.max_tris_in_leaf
    _leaves_est = -(-n_tri // max(min(_eff_leaf, 14), 1))
    # pre-build estimate through the SAME footprint formula the post-build
    # wf_ok gate uses: nodes ~= 2 * leaves for a binary forest, and BOTH
    # node tables (f32 + i32) contribute a row per node
    _wf_would_fail = (
        len(object_ranges) > MAX_ROOTS
        or _eff_leaf > 14
        or _wf_vmem_bytes(4 * _leaves_est, _leaves_est) > WF_VMEM_BUDGET
    )
    streamed = _force_streamed or n_tri > config.stream_threshold or (
        n_tri > FUSED_MAX_TRIS and _wf_would_fail)
    empty_forest = bvh_mod.BVHArrays(
        node_min=np.zeros((0, 3), np.float32),
        node_max=np.zeros((0, 3), np.float32),
        leaf_start=np.zeros(0, np.int32),
        leaf_end=np.zeros(0, np.int32),
        left=np.zeros(0, np.int32),
        right=np.zeros(0, np.int32),
        leaf_tri_indices=np.zeros(0, np.int32),
        roots=np.zeros(0, np.int32),
    )
    if n_tri and not streamed:
        forest = bvh_mod.build_forest(
            v1, v2, v3, object_ranges,
            sah_planes=config.sah_planes,
            max_depth=config.max_bvh_depth,
            max_leaf=max_leaf if max_leaf is not None
            else config.max_tris_in_leaf,
        )
    else:
        # Large mesh: vectorized LBVH for the HBM-streamed kernel; the
        # reference-parity SAH forest is skipped entirely (its recursive
        # build is O(hours) at this scale).
        forest = empty_forest

    # Pad empty arrays to size >= 1 so device gathers always have a target;
    # empty collections are skipped at trace time via static (Python) counts,
    # so the padding is never addressed by real work.
    def pad1(a, fill=0):
        if a.shape[0]:
            return a
        shape = (1,) + a.shape[1:]
        return np.full(shape, fill, a.dtype)

    tri_pad = lambda a: pad1(np.asarray(a, np.float32))
    tex_data, tex_sizes = scene.textures.pack()

    # ---- wavefront tables (kernels/wavefront.py) -------------------------
    # Layout constraints come from Mosaic: dynamic scalar loads may only
    # index the sublane dim, so every table is row-per-entity with static
    # lane offsets; triangles pack ONE LEAF PER 128-lane ROW (v1/e1/e2 of
    # slot j at lanes [9j, 9j+9)).
    n_nodes = max(forest.node_min.shape[0], 1)
    leaf_cap = max(forest.max_leaf_size(), 1)
    # A 128-lane leaf row holds at most 14 triangles (9 floats each). A
    # degenerate SAH partition can exceed that; skip the wavefront tables
    # entirely then (ADVICE r1: the fill used to overrun the row and crash
    # before the wf_ok gate was even computed) and fall back to the vmapped
    # traversal.
    wf_feasible = leaf_cap <= 14
    wf_nodes_f = np.zeros((n_nodes, 8), np.float32)
    wf_nodes_i = np.full((n_nodes, 4), -1, np.int32)
    is_leaf_node = (forest.left == -1) & (forest.right == -1)
    leaf_ids = np.flatnonzero(is_leaf_node)
    n_leaves = max(len(leaf_ids), 1) if wf_feasible else 1
    wf_tris = np.zeros((n_leaves, 128), np.float32)
    wf_perm = np.full(n_leaves * leaf_cap, -1, np.int32)
    if forest.node_min.shape[0] and wf_feasible:
        wf_nodes_f[:, 0:3] = forest.node_min
        wf_nodes_f[:, 3:6] = forest.node_max
        wf_nodes_i[:, 0] = forest.left
        wf_nodes_i[:, 1] = forest.right
        for row, nid in enumerate(leaf_ids):
            s, e = int(forest.leaf_start[nid]), int(forest.leaf_end[nid])
            cnt = min(e - s, leaf_cap)
            wf_nodes_i[nid, 2] = row
            wf_nodes_i[nid, 3] = cnt
            ids = forest.leaf_tri_indices[s:s + cnt]
            wf_perm[row * leaf_cap: row * leaf_cap + cnt] = ids
            for j, tid in enumerate(ids):
                a = v1[tid]
                wf_tris[row, 9 * j: 9 * j + 9] = np.concatenate(
                    [a, v2[tid] - a, v3[tid] - a]
                )
    wf_roots = np.zeros(MAX_ROOTS + 1, np.int32)
    n_roots = min(len(forest.roots), MAX_ROOTS)
    wf_roots[0] = n_roots
    wf_roots[1:1 + n_roots] = forest.roots[:n_roots]

    # ---- dense fused-megakernel tables (kernels/fused.py) -----------------
    fs_dense_ok = (not streamed) and 0 < n_tri <= FUSED_MAX_TRIS \
        and forest.node_min.shape[0] > 0
    if fs_dense_ok:
        order = np.asarray(forest.leaf_tri_indices, np.int64)
        n1_all = field("n1", 3, np.float32)
        n2_all = field("n2", 3, np.float32)
        n3_all = field("n3", 3, np.float32)
        mat_all = field("mat", 0, np.float32)
        smooth_all = field("has_smooth", 0, np.float32)
        # >= 2 rows so a REAL table is distinguishable from the 1-row
        # zero placeholder (the kernels use shape[0] > 1 as the has-tris
        # sentinel; all-zero padding rows self-mask via det == 0)
        n_fs_rows = max(-(-len(order) // TRI_CAP), 2)
        n_fa_rows = max(-(-len(order) // ATTR_CAP), 2)
        fs_tris = np.zeros((n_fs_rows, 128), np.float32)
        fs_attr = np.zeros((n_fa_rows, 128), np.float32)
        for k, tid in enumerate(order):
            row, j = divmod(k, TRI_CAP)
            a = v1[tid]
            fs_tris[row, 9 * j: 9 * j + 9] = np.concatenate(
                [a, v2[tid] - a, v3[tid] - a])
            arow, aj = divmod(k, ATTR_CAP)
            ab = 10 * aj
            fs_attr[arow, ab:ab + 3] = n1_all[tid]
            fs_attr[arow, ab + 3:ab + 6] = n2_all[tid]
            fs_attr[arow, ab + 6:ab + 9] = n3_all[tid]
            # has_smooth rides the low bit so the kernel can replicate the
            # exact interp-vs-flat select of surface_sample
            fs_attr[arow, ab + 9] = 2.0 * mat_all[tid] + smooth_all[tid]
    else:
        fs_tris = np.zeros((1, 128), np.float32)
        fs_attr = np.zeros((1, 128), np.float32)

    # ---- analytic-primitive scalar tables (kernels/fused.py) --------------
    def _rotmat_np(rot):
        """NumPy twin of core.math.rotation_matrix (Rz @ Ry @ Rx)."""
        rx, ry, rz = [np.float32(v) for v in rot]
        cx, sx = np.cos(rx), np.sin(rx)
        cy, sy = np.cos(ry), np.sin(ry)
        cz, sz = np.cos(rz), np.sin(rz)
        return np.array([
            [cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx],
            [sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx],
            [-sy, cy * sx, cy * cx],
        ], np.float32)

    n_ell_real = len(scene.ell_rad)
    ell_tab = np.zeros((max(n_ell_real, 1), 17), np.float32)
    ell_rotated = []
    for e in range(n_ell_real):
        rot = np.asarray(scene.ell_rot[e], np.float32)
        ell_tab[e, 0:3] = np.asarray(scene.ell_c[e], np.float32)
        ell_tab[e, 3:6] = np.asarray(scene.ell_stretch[e], np.float32)
        ell_tab[e, 6] = np.float32(scene.ell_rad[e])
        ell_tab[e, 7] = np.float32(scene.ell_mat[e])
        ell_tab[e, 8:17] = _rotmat_np(rot).reshape(9)
        ell_rotated.append(bool(np.any(rot != 0)))

    n_imp_real = len(scene.imp_fn)
    imp_tab = np.zeros((max(n_imp_real, 1), 17), np.float32)
    imp_tab[:, 3:6] = 1.0
    imp_rotated = []
    imp_fn_ids = []
    for k in range(n_imp_real):
        rot = np.asarray(scene.imp_rot[k], np.float32)
        imp_tab[k, 0:3] = np.asarray(scene.imp_shift[k], np.float32)
        imp_tab[k, 3:6] = np.asarray(scene.imp_scale[k], np.float32)
        imp_tab[k, 7] = np.float32(scene.imp_mat[k])
        imp_tab[k, 8:17] = _rotmat_np(rot).reshape(9)
        imp_rotated.append(bool(np.any(rot != 0)))
        imp_fn_ids.append(int(scene.imp_fn[k]))

    tri_obj = np.full(max(n_tri, 1), -1, np.int32)
    if streamed:
        # streamed scenes carry the object ORDINAL (no per-object roots)
        for k, (start, end) in enumerate(object_ranges):
            tri_obj[start:end] = k
    else:
        for (start, end), root in zip(object_ranges, forest.roots):
            tri_obj[start:end] = root

    # ---- HBM-streamed LBVH (accel/lbvh.py) -------------------------------
    if streamed:
        from ..accel import lbvh

        sf = lbvh.build_streamed(v1, v2, v3, want_tri_rows=False)
        # Transfer diet for the forest (tools/diag_build4m.py): the row
        # permutation crosses the tunnel prefix-only (the -1 pad tail past
        # the real triangles is rebuilt on device, _put_prefix); the one
        # BIG table — tri_rows, 268 MB at 4M tris — is materialized ON
        # DEVICE from the vertex columns the shade path uploads anyway
        # (_tri_rows_device); the small AABB tables go over the wire
        # packed to their 6 real lanes (_pad_lanes_device). Net: ~390 MB
        # off the host->device upload at 4M tris.
        # Prefix contract (ADVICE r4): both builder orderings fill
        # row_perm's real entries as the contiguous prefix [0, n_tri) with
        # a pure -1 tail; _put_prefix silently corrupts the device table
        # if a future builder mode leaves gaps, so check the tail cheaply.
        assert n_tri >= len(sf.row_perm) or sf.row_perm[n_tri:].max(
            initial=-1) == -1, "row_perm tail past n_tri must be all -1"
        st_perm = _put_prefix(sf.row_perm, n_tri, tail_row=np.int32(-1))
        # Indexed-mesh wire fast path (VERDICT r4 #4): a scene built from
        # ONE Scene.add_mesh_indexed call ships shared vertices + faces
        # (24 + 48 MB at 4M tris) instead of the three expanded f32
        # columns (144 MB) over the ~22-97 MB/s tunnel, and expands on
        # device (_gather_rows_jit) — bit-identical columns, since f64->
        # f32 conversion commutes with the gather.
        if _idx_mesh is not None:
            _faces_d = jax.device_put(
                np.ascontiguousarray(_idx_mesh.faces, np.int32))
            _verts_d = jax.device_put(
                np.ascontiguousarray(_idx_mesh.verts, np.float32))
            _smooth = _idx_mesh.vnormals is not None
            _hasuv = _idx_mesh.vuvs is not None
            _dummy = np.zeros((1, 3), np.float32)
            _idx_tabs = _idx_tables_jit(
                _verts_d, _faces_d,
                jax.device_put(np.ascontiguousarray(
                    _idx_mesh.vnormals, np.float32))
                if _smooth else _dummy,
                jax.device_put(np.ascontiguousarray(
                    _idx_mesh.vuvs, np.float32))
                if _hasuv else _dummy[:, :2],
                _idx_mesh.mat_id, _smooth, _hasuv)
            _v1d = _idx_tabs["v1"]
            _v2d = _idx_tabs["v2"]
            _v3d = _idx_tabs["v3"]
        else:
            _v1d = jax.device_put(np.ascontiguousarray(v1, np.float32))
            _v2d = jax.device_put(np.ascontiguousarray(v2, np.float32))
            _v3d = jax.device_put(np.ascontiguousarray(v3, np.float32))
        st_tris = _tri_rows_device(_v1d, _v2d, _v3d, st_perm,
                                   tris_per_row=lbvh.TRIS_PER_ROW)
        st_sub = _pad_lanes_device(sf.sub_f[:, :6])
        st_top = jax.device_put(sf.ctree_f)  # (2*n_treelets-1, 8): tiny
        st_n_treelets = sf.n_treelets
        st_treelet_rows = lbvh.TREELET_ROWS
        st_leaf_cap = lbvh.TRIS_PER_ROW
    else:
        st_top = np.zeros((1, 8), np.float32)
        st_tris = np.zeros((1, 128), np.float32)
        st_sub = np.zeros((1, 128), np.float32)
        st_perm = np.full(1, -1, np.int32)
        st_n_treelets = 0
        st_treelet_rows = 0
        st_leaf_cap = 0

    # Static texture-map presence flags: when no material references a map,
    # the whole mapMtl stage (12 bilinear samples/ray/bounce in the
    # reference, frag.glsl:210-225) compiles away entirely.
    mats = pack_materials(scene.materials)
    # Legacy 18-float records (Scene.add_mat -> SSBO-6 analogue): the
    # reference packs [count, 18*N floats] (dispatch.java:538-551); here
    # the count is static (info.n_legacy_mats) and the rows are the array
    lm_list = getattr(scene, "legacy_mats", [])
    if lm_list:
        legacy_mats = np.asarray(lm_list, np.float32).reshape(-1, 18)
    else:
        legacy_mats = np.zeros((1, 18), np.float32)
    map_cols = [21, 22, 23, 31, 32, 33, 34, 35, 37, 38, 39, 40]  # COL map_*
    has_maps = bool(mats.shape[0]) and bool((mats[:, map_cols] >= 0).any())
    has_normal_maps = bool(mats.shape[0]) and bool((mats[:, 36] >= 0).any())
    # per-channel map presence: apply_maps skips the bilinear sample of any
    # channel no material maps (a scene with only map_Kd pays 1 sample per
    # bounce, not 11 — frag.glsl:210-225 samples all of them)
    from .material import COL as _COL
    _map_names = ("map_Ka", "map_Kd", "map_Ks", "map_Ke", "map_d",
                  "map_Tr", "map_Ns", "map_Pm", "map_Pr", "map_Ps",
                  "map_Pc")
    maps_present = tuple(
        nm for nm in _map_names
        if mats.shape[0] and bool((mats[:, _COL[nm]] >= 0).any()))

    # Static material-capability gates for the fused megakernel: a scene
    # with no subsurface / clearcoat / transmissive / fresnel-illum /
    # emissive material compiles those whole lobe families away
    # (kernels/fused._trace_core). Column indices are scene/material.COL.
    # A texture map can switch a capability ON per-texel (frag.glsl:210-225
    # replaces Tr/Pc/Ke from the sample), so a mapped channel forces its
    # lobe family live even when every base value is off.
    m = mats if mats.shape[0] else np.zeros((1, 48), np.float32)
    mat_gates = (
        bool((m[:, 41] > 0).any()),                        # subsurface
        bool((m[:, 27] > 0).any()
             or "map_Pc" in maps_present),                 # clearcoat Pc
        bool((m[:, 11] > 0).any() or (m[:, 12:15] > 0).any()
             or "map_Tr" in maps_present),                 # Tr / Tf
        bool(np.isin(m[:, 20], (5.0, 7.0)).any()),         # illum 5 / 7
        bool((m[:, 16:19] != 0).any()
             or "map_Ke" in maps_present),                 # emission Ke
    )

    # ---- in-kernel texture shading tables (kernels/fused.py) --------------
    # Small material maps sample INSIDE the megakernel (the TPU-native
    # replacement for the reference's bindless in-shader samples,
    # frag.glsl:210-225, dispatch.java:331-379): pack every map some
    # material references into fs_maps (one image row per 128-lane table
    # row) and the per-triangle UV + raw tangent into dense fs_uvt rows.
    # Maps past the kernel budget keep the XLA mapMtl path (fs_maps_ok
    # False gates kernels/fused.eligible).
    fs_map_shapes: list = []
    fs_map_bindings: list = []
    fs_maps_ok = False
    fs_uvt = np.zeros((1, 128), np.float32)
    fs_maps = np.zeros((1, 128), np.float32)
    if (has_maps or has_normal_maps) and not streamed \
            and n_tri <= FUSED_MAX_TRIS and mats.shape[0]:
        _bind_chans = _map_names + ("map_norm",)
        slot_of = {}
        bindings = []
        fits = True
        for mi in range(mats.shape[0]):
            for ch in _bind_chans:
                ti = int(mats[mi, _COL[ch]])
                if ti < 0:
                    continue
                if ti >= len(scene.textures.images):
                    fits = False
                    continue
                if ti not in slot_of:
                    img = scene.textures.images[ti]
                    hh, ww = img.shape[0], img.shape[1]
                    if hh > MAP_MAX_H or ww > MAP_MAX_W:
                        fits = False
                    slot_of[ti] = len(slot_of)
                bindings.append((ch, mi, slot_of[ti]))
        tex_order = sorted(slot_of, key=slot_of.get)
        total_texels = sum(
            scene.textures.images[ti].shape[0]
            * scene.textures.images[ti].shape[1] for ti in tex_order)
        if fits and total_texels <= MAP_TEXEL_BUDGET:
            fs_maps_ok = True
            base = 0
            rows = []
            for ti in tex_order:
                img = np.asarray(scene.textures.images[ti], np.float32)
                hh, ww = img.shape[0], img.shape[1]
                block, rpy = _pack_texel_rows(img)
                fs_map_shapes.append((hh, ww, base, rpy))
                rows.append(block)
                base += hh * rpy
            fs_maps = np.concatenate(rows) if rows else fs_maps
            fs_map_bindings = bindings
            if fs_dense_ok:
                uv1_all = field("uv1", 2, np.float32)
                uv2_all = field("uv2", 2, np.float32)
                uv3_all = field("uv3", 2, np.float32)
                huv_all = field("has_uv", 0, np.float32)
                n_uv_rows = max(-(-len(order) // UVT_CAP), 2)
                fs_uvt = np.zeros((n_uv_rows, 128), np.float32)
                for k, tid in enumerate(order):
                    row, j = divmod(k, UVT_CAP)
                    a = UVT_STRIDE * j
                    fs_uvt[row, a:a + 2] = uv1_all[tid]
                    fs_uvt[row, a + 2:a + 4] = uv2_all[tid]
                    fs_uvt[row, a + 4:a + 6] = uv3_all[tid]
                    if huv_all[tid] > 0:
                        # raw UV-space tangent (frag.glsl:421-430,
                        # kernels/intersect.compute_tangent): the per-hit
                        # Gram-Schmidt + normalize happens in-kernel
                        # against the committed shading normal
                        e1 = (v2[tid] - v1[tid]).astype(np.float32)
                        e2 = (v3[tid] - v1[tid]).astype(np.float32)
                        du1 = uv2_all[tid] - uv1_all[tid]
                        du2 = uv3_all[tid] - uv1_all[tid]
                        det = du1[0] * du2[1] - du1[1] * du2[0]
                        with np.errstate(divide="ignore", invalid="ignore"):
                            traw = (du2[1] * e1 - du1[1] * e2) / det
                        if np.all(np.isfinite(traw)):
                            fs_uvt[row, a + 6:a + 9] = traw
                        fs_uvt[row, a + 9] = 1.0

    # Combined attribute table for one-hot fetch (see DeviceScene.tri_attr).
    # Only built for scenes the one-hot path can serve (<= ONEHOT_MAX_TRIS,
    # kernels/traverse.surface_sample) — at the 4M-triangle scale it was a
    # 432 MB table that the per-array gather path never read (VERDICT r3
    # #4: superlinear-looking build cost was partly this alloc + upload).
    has_uv_col = field("has_uv", 0, bool)
    has_smooth_col = field("has_smooth", 0, bool)
    any_uv = bool(np.any(has_uv_col))
    any_smooth = bool(np.any(has_smooth_col))
    # Attribute columns the big-scene shade path statically never gathers
    # (traverse.surface_sample skips n2/n3 when nothing is smooth-shaded
    # and uv1-3 when nothing is UV-mapped) ship as 1-row placeholders: at
    # 4M tris the unread smooth+UV tables were ~200 MB of host astype
    # copies and device transfer per build.
    _big = n_tri > ONEHOT_MAX_TRIS
    _z3 = np.zeros((1, 3), np.float32)
    _z2 = np.zeros((1, 2), np.float32)
    # Indexed-mesh fast path, attribute side: a BIG streamed scene reads
    # per-triangle attributes through the per-array gather branch
    # (kernels/traverse.surface_sample), so those tables can be built ON
    # DEVICE from the already-uploaded verts/faces — no expanded host
    # columns, no wire. Small scenes read tri_attr (one-hot) instead and
    # keep the host path. Device tables built below, after the streamed
    # branch has defined _verts_d/_faces_d.
    _idx_attr_dev = streamed and _idx_mesh is not None and _big
    n1a = _z3 if _idx_attr_dev else stack3("n1")
    n2a = stack3("n2") if (not _big or (any_smooth and not
                                        _idx_attr_dev)) else _z3
    n3a = stack3("n3") if (not _big or (any_smooth and not
                                        _idx_attr_dev)) else _z3
    uv1a = stack3("uv1", 2) if (not _big or (any_uv and not
                                             _idx_attr_dev)) else _z2
    uv2a = stack3("uv2", 2) if (not _big or (any_uv and not
                                             _idx_attr_dev)) else _z2
    uv3a = stack3("uv3", 2) if (not _big or (any_uv and not
                                             _idx_attr_dev)) else _z2
    if n_tri <= ONEHOT_MAX_TRIS:
        tri_attr = np.zeros((max(n_tri, 1), 27), np.float32)
        if n_tri:
            tri_attr[:, 0:3] = n1a
            tri_attr[:, 3:6] = n2a
            tri_attr[:, 6:9] = n3a
            tri_attr[:, 9:11] = uv1a
            tri_attr[:, 11:13] = uv2a
            tri_attr[:, 13:15] = uv3a
            tri_attr[:, 15] = field("has_uv", 0, np.float32)
            tri_attr[:, 16] = field("has_smooth", 0, np.float32)
            tri_attr[:, 17] = field("mat", 0, np.float32)
            tri_attr[:, 18:21] = v1.astype(np.float32)
            tri_attr[:, 21:24] = v2.astype(np.float32)
            tri_attr[:, 24:27] = v3.astype(np.float32)
    else:
        tri_attr = np.zeros((1, 27), np.float32)

    # Sky texture table for the in-kernel equirect miss shade (Whitted
    # mode; kernels/fused._frame_kernel). The XLA deferred-sky pass costs
    # ~8 ms/frame at 800x600 (xprof round 4: AoS (N,3) tap gathers + mix
    # dominate the whitted frame, the kernel itself is 0.13 ms) — sampling
    # the small sky in-kernel with a block row window removes it entirely.
    fs_sky = np.zeros((1, 128), np.float32)
    fs_sky_shape = ()
    _sky_img = (scene.textures.images[0] if len(scene.textures.images)
                else np.full((1, 1, 3), 0.5, np.float32))
    _sh, _sw = _sky_img.shape[0], _sky_img.shape[1]
    if _sh * _sw <= SKY_TEXEL_BUDGET:
        fs_sky, _rpy = _pack_texel_rows(np.asarray(_sky_img, np.float32))
        fs_sky_shape = (_sh, _sw, _rpy)

    # ADVICE r3 #1: the pre-build streaming estimate assumes near-full
    # leaves; a degenerate SAH partition can blow past it and fail the
    # post-build wf_ok gate, landing a mid-size scene on the ~0.1 Mrays/s
    # vmapped fallback. Rebuild through the streamed LBVH path instead.
    wf_ok_post = (
        wf_feasible
        and len(forest.roots) > 0
        and len(forest.roots) <= MAX_ROOTS
        and _wf_vmem_bytes(
            wf_nodes_f.shape[0] + wf_nodes_i.shape[0],
            wf_tris.shape[0]) <= WF_VMEM_BUDGET
    )
    if not streamed and not wf_ok_post and n_tri > FUSED_MAX_TRIS:
        return pack_scene(scene, config, max_leaf, _force_streamed=True)

    if streamed:
        # reuse the vertex columns already device-put for the forest
        # materialization — they are identical to the host f32 columns
        tri_v1_a, tri_v2_a, tri_v3_a = _v1d, _v2d, _v3d
    else:
        tri_v1_a = tri_pad(v1.astype(np.float32))
        tri_v2_a = tri_pad(v2.astype(np.float32))
        tri_v3_a = tri_pad(v3.astype(np.float32))
    tri_n1_a = tri_pad(n1a)
    tri_n2_a = tri_pad(n2a)
    tri_n3_a = tri_pad(n3a)
    tri_uv1_a = tri_pad(uv1a)
    tri_uv2_a = tri_pad(uv2a)
    tri_uv3_a = tri_pad(uv3a)
    tri_has_uv_a = pad1(has_uv_col)
    tri_has_smooth_a = pad1(has_smooth_col)
    tri_mat_a = pad1(field("mat", 0, np.int32))
    tri_obj_a = tri_obj
    if _idx_attr_dev:
        # Big indexed streamed scene: per-triangle attribute tables built
        # ON DEVICE from the verts/faces already uploaded for the forest
        # (the per-array gather branch of traverse.surface_sample is the
        # only reader at this size). Positions/smooth normals/UVs are
        # bit-identical to the host expansion (gather commutes with the
        # f64->f32 conversion); FLAT normals are computed in f32 on device
        # (~1e-6 absolute difference vs the host's f64 cross — validated
        # whole-image in tests/test_indexed_mesh.py). All tables come out
        # of the ONE _idx_tables_jit dispatch issued in the streamed
        # branch above.
        tri_n1_a = _idx_tabs["n1"]
        if _idx_tabs["n2"] is not None:
            tri_n2_a = _idx_tabs["n2"]
            tri_n3_a = _idx_tabs["n3"]
        if _idx_tabs["uv1"] is not None:
            tri_uv1_a = _idx_tabs["uv1"]
            tri_uv2_a = _idx_tabs["uv2"]
            tri_uv3_a = _idx_tabs["uv3"]
        tri_has_uv_a = _idx_tabs["has_uv"]
        tri_has_smooth_a = _idx_tabs["has_smooth"]
        tri_mat_a = _idx_tabs["mat"]
        tri_obj_a = _idx_tabs["obj"]  # single mesh: ordinal 0
    dev = DeviceScene(
        tri_v1=tri_v1_a,
        tri_v2=tri_v2_a,
        tri_v3=tri_v3_a,
        tri_n1=tri_n1_a,
        tri_n2=tri_n2_a,
        tri_n3=tri_n3_a,
        tri_uv1=tri_uv1_a,
        tri_uv2=tri_uv2_a,
        tri_uv3=tri_uv3_a,
        tri_has_uv=tri_has_uv_a,
        tri_has_smooth=tri_has_smooth_a,
        tri_mat=tri_mat_a,
        node_min=pad1(forest.node_min, fill=np.float32(1e30)),
        node_max=pad1(forest.node_max, fill=np.float32(-1e30)),
        node_left=pad1(forest.left, fill=-1),
        node_right=pad1(forest.right, fill=-1),
        leaf_start=pad1(forest.leaf_start),
        leaf_end=pad1(forest.leaf_end),
        leaf_tri=pad1(forest.leaf_tri_indices),
        roots=forest.roots,
        ell_c=pad1(np.asarray(scene.ell_c, np.float32).reshape(-1, 3)),
        ell_stretch=pad1(
            np.asarray(scene.ell_stretch, np.float32).reshape(-1, 3),
            fill=1),
        ell_rot=pad1(np.asarray(scene.ell_rot, np.float32).reshape(-1, 3)),
        ell_rad=pad1(np.asarray(scene.ell_rad, np.float32)),
        ell_mat=pad1(np.asarray(scene.ell_mat, np.int32)),
        imp_fn=pad1(np.asarray(scene.imp_fn, np.int32)),
        imp_shift=pad1(np.asarray(scene.imp_shift, np.float32).reshape(-1, 3)),
        imp_scale=pad1(
            np.asarray(scene.imp_scale, np.float32).reshape(-1, 3), fill=1),
        imp_rot=pad1(np.asarray(scene.imp_rot, np.float32).reshape(-1, 3)),
        imp_mat=pad1(np.asarray(scene.imp_mat, np.int32)),
        wf_nodes_f=wf_nodes_f,
        wf_nodes_i=wf_nodes_i,
        wf_tris=wf_tris,
        wf_perm=wf_perm,
        wf_roots=wf_roots,
        tri_obj=tri_obj_a,
        tri_attr=tri_attr,
        fs_tris=fs_tris,
        fs_attr=fs_attr,
        fs_uvt=fs_uvt,
        fs_maps=fs_maps,
        fs_sky=fs_sky,
        ell_tab=ell_tab,
        imp_tab=imp_tab,
        st_top=st_top,
        st_tris=st_tris,
        st_sub=st_sub,
        st_perm=st_perm,
        materials=mats,
        legacy_mats=legacy_mats,
        tex_data=tex_data,
        tex_sizes=tex_sizes,
    )
    info = StaticSceneInfo(
        num_objects=int(forest.roots.shape[0]),
        num_ellipsoids=len(scene.ell_rad),
        num_implicits=len(scene.imp_fn),
        max_leaf_size=forest.max_leaf_size(),
        wf_ok=wf_ok_post,
        fused_ok=fs_dense_ok and len(forest.roots) > 0,
        mat_gates=mat_gates,
        ell_rotated=tuple(ell_rotated),
        imp_rotated=tuple(imp_rotated),
        imp_fn_ids=tuple(imp_fn_ids),
        has_maps=has_maps,
        has_normal_maps=has_normal_maps,
        any_uv=any_uv,
        any_smooth=any_smooth,
        maps_present=maps_present,
        fs_maps_ok=fs_maps_ok,
        fs_map_shapes=tuple(fs_map_shapes),
        fs_map_bindings=tuple(fs_map_bindings),
        fs_sky_shape=fs_sky_shape,
        has_rotated_ellipsoids=bool(
            np.any(np.abs(np.asarray(scene.ell_rot, np.float32)) > 0)
        ),
        has_rotated_implicits=bool(
            np.any(np.abs(np.asarray(scene.imp_rot, np.float32)) > 0)
        ),
        imp_fns=tuple(sorted(set(int(f) for f in scene.imp_fn))),
        streamed=streamed,
        st_n_treelets=st_n_treelets,
        st_treelet_rows=st_treelet_rows,
        st_leaf_cap=st_leaf_cap,
        num_tri_objects=len(object_ranges),
        n_legacy_mats=len(lm_list),
        lights=tuple(
            (k, s0, e0, m) for (k, s0, e0, m, _, _) in
            getattr(scene, "disk_lights", [])
        ),
        light_centers=tuple(
            c for (_, _, _, _, c, _) in getattr(scene, "disk_lights", [])
        ),
        light_radii=tuple(
            r for (_, _, _, _, _, r) in getattr(scene, "disk_lights", [])
        ),
    )
    # Device-resident pytree: one host->device transfer at build time, like
    # the reference's one-time SSBO uploads.
    dev = jax.device_put(dev)
    return dev, info


class StaticSceneInfo(NamedTuple):
    """Static (trace-time Python) counts describing a DeviceScene — these
    determine compiled control flow, like numObj/numImplicits/numEllipsoids
    do in the shader (frag.glsl:231-233). Kept OUTSIDE the pytree so jit
    sees them as compile-time constants."""

    num_objects: int
    num_ellipsoids: int
    num_implicits: int
    max_leaf_size: int
    # Wavefront (Pallas) path feasible: forest fits VMEM + root budget
    wf_ok: bool = False
    # Fused megakernel (kernels/fused.py) feasible for the triangle part:
    # dense fs_tris/fs_attr tables built (scene within FUSED_MAX_TRIS)
    fused_ok: bool = False
    # (has_subsurface, has_clearcoat, has_transmission, has_fresnel_illum,
    # has_emission) — static lobe-family gates for the fused kernel
    mat_gates: tuple = (True, True, True, True, True)
    # Per-primitive static metadata for the fused kernel's unrolled loops
    ell_rotated: tuple = ()
    imp_rotated: tuple = ()
    imp_fn_ids: tuple = ()
    # Any material references a texture map / a normal map (compile-time
    # gates for the mapMtl and TBN stages)
    has_maps: bool = True
    has_normal_maps: bool = True
    # Any triangle carries UVs / smooth normals. When False, the per-tri
    # uv/tangent (resp. n2/n3/smooth) arrays are identically sentinel/flat,
    # so surface_sample skips their gathers — at 1M+ triangles each
    # per-ray gather costs ~32 ns/row/bounce at full batch width (measured
    # round 4), and a UV-less scene was paying 10 of its 12 gathers for
    # constants.
    any_uv: bool = True
    any_smooth: bool = True
    # static set of map channels actually referenced by some material —
    # apply_maps skips the other channels' samples entirely
    maps_present: tuple = ("map_Ka", "map_Kd", "map_Ks", "map_Ke", "map_d",
                           "map_Tr", "map_Ns", "map_Pm", "map_Pr", "map_Ps",
                           "map_Pc")
    # In-kernel texture shading (kernels/fused.py): every referenced map
    # fits the kernel budget and fs_maps/fs_uvt were packed. Shapes are
    # ((H, W, base_row), ...) per packed map slot; bindings are
    # ((channel, material_id, slot), ...).
    fs_maps_ok: bool = False
    fs_map_shapes: tuple = ()
    fs_map_bindings: tuple = ()
    # (H, W, rows_per_y) of the packed fs_sky table; () when the sky is
    # too big for in-kernel sampling (falls back to the XLA deferred pass)
    fs_sky_shape: tuple = ()
    # Any analytic primitive carries a nonzero rotation (compile-time gate
    # for the per-ray rotation-matrix math in the merge/normal paths)
    has_rotated_ellipsoids: bool = True
    has_rotated_implicits: bool = True
    # Static set of implicit-function ids present (marcher fast path)
    imp_fns: tuple = ()
    # HBM-streamed LBVH statics (scene > config.stream_threshold tris):
    # triangles trace through kernels/wavefront.trace_streamed; there is
    # NO reference-parity SAH forest and no vmapped traversal for these.
    streamed: bool = False
    st_n_treelets: int = 0
    st_treelet_rows: int = 0
    st_leaf_cap: int = 0
    num_tri_objects: int = 0
    # Legacy 18-float material count (Scene.add_mat; the reference
    # buffer's leading count element, dispatch.java:540)
    n_legacy_mats: int = 0
    # Legacy emissive-disk lights (shade/arealights.py): static tuples of
    # (kind, id_start, id_end, material), centers, radii
    lights: tuple = ()
    light_centers: tuple = ()
    light_radii: tuple = ()
