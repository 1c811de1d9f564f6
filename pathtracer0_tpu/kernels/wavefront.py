"""Pallas packet-traversal kernel: the Mrays/s-critical BVH intersector.

Why this shape: the straightforward port (per-ray stack walk, vmapped —
kernels/traverse.py) bottoms out on per-lane gathers and stack scatters,
which TPUs execute catastrophically slowly (~0.1 Mrays/s measured on v5e)
— the VPU has no hardware gather. This kernel restructures traversal as
PACKET traversal with uniform control flow (Benthin-style speculative
traversal adapted to the TPU's 8x128 VPU):

  * each grid step owns a BLOCK of rays (RS x 128 lanes, SoA in VMEM);
  * ONE shared traversal stack per block lives in SMEM with a scalar stack
    pointer — control flow is uniform, so node data is loaded with SCALAR
    reads and broadcast to all lanes (no gathers);
  * a node is visited iff ANY ray in the block wants it (its AABB entry
    distance beats the ray's current closest-t); per-ray pruning masks the
    rest;
  * leaves test up to LEAF_CAP triangles, 9 scalar loads each, against the
    whole block at VPU width (the triangle table is pre-reordered into leaf
    order, so leaves are CONTIGUOUS rows — one more gather removed);
  * the whole BVH forest traverses in one launch: all object roots are
    pushed initially (closest-t pruning makes cross-object traversal
    exactly as effective as the reference's sequential object loop,
    frag.glsl:563-577).

Scene-table layout is dictated by a Mosaic constraint: dynamic scalar loads
must index the SUBLANE dimension — a dynamic lane index fails to compile
("cannot statically prove that index in dimension 1 is a multiple of 128").
So tables are row-per-entity with STATIC lane offsets:
  * nodes_f (N, 8) f32  — row n: min xyz, max xyz, pad, pad
  * nodes_i (N, 4) i32  — row n: left, right, leaf_row, leaf_tri_count
  * tris    (L, 128) f32 — ONE LEAF PER ROW: triangle j of the leaf packs
    v1/e1/e2 into lanes [9j, 9j+9); j is the (unrolled, static) leaf-loop
    index, so every lane offset is static. leaf_cap <= 14.

Coherent packets (primary rays, tiled) visit near-minimal node sets;
incoherent bounce packets degrade toward the union of per-ray node sets —
the integrator sorts rays by direction octant between bounces to keep
packets coherent.

The caller gates on table size (VMEM residency) and falls back to the XLA
path beyond.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB_GROUP_ROWS = 4  # rows per subtree leaf — must match accel/lbvh.py
MISS = np.float32(1e30)
EPSILON = np.float32(1e-10)
STACK_DEPTH = 160
MAX_ROOTS = 32
# forests at or below this many leaf rows skip the stack walk entirely
# (see _brute_kernel)
BRUTE_MAX_ROWS = 192


def _brute_kernel(
    nodes_f_ref,    # unused (kept for a uniform signature)
    tris_ref,       # (L, 128) f32 leaf-packed triangle rows
    o_ref,          # (3, RS, 128) f32
    d_ref,          # (3, RS, 128) f32
    tin_ref,        # (RS, 128) f32
    t_ref,          # out (RS, 128) f32
    u_ref,          # out
    v_ref,          # out
    idx_ref,        # out i32
    bt_ref,         # out (1, 1) i32 SMEM: AABB tests (0: no tree here)
    lf_ref,         # out (1, 1) i32 SMEM: leaf-row visits (= n_rows)
    *,
    leaf_cap: int,
    n_rows: int,
):
    """Small-scene fast path: test EVERY leaf row against the block.

    No stack, no per-node scalar loads, no vector->scalar reductions, no
    branches — the loop body is straight-line VPU work, which is exactly
    what the hardware wants. Empty slots hold zeroed triangles whose
    Moller-Trumbore determinant is 0, so they self-mask; rows are iterated
    with a fori_loop (sublane-indexed scalar loads are legal in Mosaic).

    Crossover measured on v5e: brute force beats the packet stack walk on
    the bench scene (84 packed tris) for BOTH coherent primary rays and
    incoherent bounce rays — the stack walk's serial scalar dependency
    chain (SMEM pop -> node load -> cond) costs more than testing every
    triangle at full VPU width. Use for forests under ~BRUTE_MAX_ROWS rows.
    """
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]

    t_ref[...] = tin_ref[...]
    u_ref[...] = jnp.zeros_like(u_ref)
    v_ref[...] = jnp.zeros_like(v_ref)
    idx_ref[...] = jnp.full_like(idx_ref, -1)
    gi = pl.program_id(0)
    bt_ref[gi, 0] = 0
    lf_ref[gi, 0] = n_rows

    def row_body(row, _):
        for j in range(leaf_cap):  # static unroll: lane offsets stay static
            base = 9 * j
            v1x = tris_ref[row, base + 0]
            v1y = tris_ref[row, base + 1]
            v1z = tris_ref[row, base + 2]
            e1x = tris_ref[row, base + 3]
            e1y = tris_ref[row, base + 4]
            e1z = tris_ref[row, base + 5]
            e2x = tris_ref[row, base + 6]
            e2y = tris_ref[row, base + 7]
            e2z = tris_ref[row, base + 8]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = 1.0 / det
            sx = ox - v1x
            sy = oy - v1y
            sz = oz - v1z
            u = (sx * px + sy * py + sz * pz) * inv_det
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = (
                (jnp.abs(det) >= EPSILON)
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > EPSILON)
                & (t < t_ref[...])
            )
            t_ref[...] = jnp.where(ok, t, t_ref[...])
            u_ref[...] = jnp.where(ok, u, u_ref[...])
            v_ref[...] = jnp.where(ok, v, v_ref[...])
            idx_ref[...] = jnp.where(
                ok, row * leaf_cap + j, idx_ref[...]
            )
        return 0

    jax.lax.fori_loop(0, n_rows, row_body, 0)


def _streamed_kernel(
    top_ref,        # (M_top, 8) f32 VMEM: complete-tree AABBs (heap order)
    tris_hbm_ref,   # (R_pad, 128) f32 in HBM/ANY: leaf-packed triangles
    sub_hbm_ref,    # (n_treelets * sub_stride, 128) f32 HBM: per-treelet
                    #   subtree AABBs, one node/row in heap order, where
                    #   sub_stride = 2 * (treelet_rows // SUB_GROUP_ROWS)
                    #   (accel/lbvh.py)
    o_ref,          # (3, RS, 128) f32
    d_ref,          # (3, RS, 128) f32
    tin_ref,        # (RS, 128) f32
    t_ref,          # out (RS, 128) f32
    u_ref,          # out
    v_ref,          # out
    idx_ref,        # out i32: global_row * leaf_cap + slot
    bt_ref,         # out (1, 1) i32 SMEM: AABB tests (top + subtree)
    lf_ref,         # out (1, 1) i32 SMEM: triangle-row visits
    stack_ref,      # SMEM (STACK_DEPTH,) i32: top-tree stack
    scratch_ref,    # VMEM (2, treelet_rows, 128) f32 DMA landing buffers
    sub_scratch_ref,  # VMEM (2, treelet_rows, 128) f32 subtree landing
    td_ref,         # VMEM (RS, 128) f32: closest-t DENOMINATOR scratch
    sem_ref,        # DMA semaphores (2, 2): [slot, rows/subtree]
    *,
    n_treelets: int,
    treelet_rows: int,
    leaf_cap: int,
):
    """HBM-streamed two-level traversal with SCALAR frustum gating.

    Round-2 profiling (PERF.md) showed this kernel sync-bound: every
    internal-node visit issued one vector->scalar reduction (~1-2 us) to
    decide the walk, serializing the whole loop — 0.18 Mrays/s at 1M tris.
    This version makes every traversal DECISION pure scalar-unit work:

      * ONCE per block, 12 masked vector reductions capture the block's
        ray bounds (origin box + per-axis direction range + sign purity)
        — the only vector->scalar syncs in the whole walk, plus one
        optional closest-t refresh per retired treelet;
      * every node test is a conservative INTERVAL slab test of the node
        AABB against those scalar bounds (~30 scalar ops, no vector work
        at all): axes where the block's directions share a sign give real
        frustum culling; mixed-sign axes contribute no constraint.
        Dead-padded blocks produce an empty frustum and visit nothing.
      * rays sorted by origin-Morton + direction octant (traverse.py
        enables sort_rays for streamed scenes) keep blocks sign-pure, so
        the conservative test stays tight in practice;
      * the VPU only ever runs Moller-Trumbore row tests for row GROUPS
        whose AABB passes the scalar gate — per-ray closest-t pruning
        happens inside the row test as before.

    The top of one implicit complete binary tree (children of heap node i
    are 2i+1/2i+2 — no child-pointer loads at all) lives in VMEM down to
    treelet granularity; a treelet is `treelet_rows` consecutive packed
    triangle rows in HBM plus its own group AABBs, DMA'd into
    double-buffered VMEM scratch when popped — the previous treelet is
    retired while the copies are in flight.
    """
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]

    # closest-t carried as a RATIO t_ref / td_ref (division-free
    # Moller-Trumbore, as in kernels/fused.py): one divide per treelet
    # retire (for gating) + one at the end recover real distances
    t_ref[...] = tin_ref[...]
    td_ref[...] = jnp.ones_like(td_ref)
    u_ref[...] = jnp.zeros_like(u_ref)
    v_ref[...] = jnp.zeros_like(v_ref)
    idx_ref[...] = jnp.full_like(idx_ref, -1)
    gi = pl.program_id(0)
    bt_ref[gi, 0] = 0
    lf_ref[gi, 0] = 0

    stack_ref[0] = 0

    # ---- per-ray root-slab ceiling + block ray bounds --------------------
    # (the only vector->scalar syncs in the walk)
    livev = tin_ref[...] > 0.0
    BIG = jnp.float32(3e38)

    def _inv(d):
        return jnp.clip(
            1.0 / jnp.where(d == 0.0, jnp.float32(1e-30), d), -1e30, 1e30
        )

    inv_dx = _inv(dx)
    inv_dy = _inv(dy)
    inv_dz = _inv(dz)
    rx1 = (top_ref[0, 0] - ox) * inv_dx
    rx2 = (top_ref[0, 3] - ox) * inv_dx
    ry1 = (top_ref[0, 1] - oy) * inv_dy
    ry2 = (top_ref[0, 4] - oy) * inv_dy
    rz1 = (top_ref[0, 2] - oz) * inv_dz
    rz2 = (top_ref[0, 5] - oz) * inv_dz
    root_near = jnp.maximum(
        jnp.maximum(jnp.minimum(rx1, rx2), jnp.minimum(ry1, ry2)),
        jnp.minimum(rz1, rz2))
    root_far = jnp.minimum(
        jnp.minimum(jnp.maximum(rx1, rx2), jnp.maximum(ry1, ry2)),
        jnp.maximum(rz1, rz2))
    # A ray's hits all lie inside the ROOT AABB, so its root-slab exit
    # bounds any useful entry distance; rays that miss the root entirely
    # (sky) are excluded from the BLOCK BOUNDS too — one grazing or
    # sky-bound lane would otherwise blow the frustum hull wide open.
    root_ok = (root_far >= root_near) & (root_far > 0.0) & livev
    gate_ceiling = jnp.where(root_ok, root_far * jnp.float32(1.0001),
                             jnp.float32(0.0))

    def block_tmax():
        return jnp.max(jnp.minimum(t_ref[...] / td_ref[...], gate_ceiling))

    def _mn(v):
        return jnp.min(jnp.where(root_ok, v, BIG))

    def _mx(v):
        return jnp.max(jnp.where(root_ok, v, -BIG))

    om_lo_x, om_hi_x = _mn(ox), _mx(ox)
    om_lo_y, om_hi_y = _mn(oy), _mx(oy)
    om_lo_z, om_hi_z = _mn(oz), _mx(oz)
    d_lo_x, d_hi_x = _mn(dx), _mx(dx)
    d_lo_y, d_hi_y = _mn(dy), _mx(dy)
    d_lo_z, d_hi_z = _mn(dz), _mx(dz)

    def axis_consts(d_lo, d_hi, o_lo, o_hi):
        """Per-axis scalars for the interval slab test, mapped to a
        positive-direction frame (negative-pure axes mirror)."""
        pos = d_lo >= 0.0
        neg = d_hi <= 0.0
        mixed = jnp.logical_not(jnp.logical_or(pos, neg))
        # mirrored origin bounds: x' = -x for negative-pure axes
        m_lo = jnp.where(neg, -o_hi, o_lo)
        m_hi = jnp.where(neg, -o_lo, o_hi)
        # |d| range in the positive frame (clamped away from 0)
        ad_lo = jnp.maximum(jnp.where(neg, -d_hi, d_lo), jnp.float32(1e-30))
        ad_hi = jnp.maximum(jnp.where(neg, -d_lo, d_hi), jnp.float32(1e-30))
        iv_lo = 1.0 / ad_hi   # smallest possible 1/|d|
        iv_hi = 1.0 / ad_lo   # largest possible 1/|d|
        return pos, neg, mixed, m_lo, m_hi, iv_lo, iv_hi

    ax_x = axis_consts(d_lo_x, d_hi_x, om_lo_x, om_hi_x)
    ax_y = axis_consts(d_lo_y, d_hi_y, om_lo_y, om_hi_y)
    ax_z = axis_consts(d_lo_z, d_hi_z, om_lo_z, om_hi_z)

    def axis_interval(ax, lo_w, hi_w):
        """Conservative [min possible entry, max possible exit] of the
        world-space slab [lo_w, hi_w] over every ray in the block."""
        pos, neg, mixed, m_lo, m_hi, iv_lo, iv_hi = ax
        s_lo = jnp.where(neg, -hi_w, lo_w)
        s_hi = jnp.where(neg, -lo_w, hi_w)
        vmin = s_lo - m_hi
        emin = vmin * jnp.where(vmin >= 0.0, iv_lo, iv_hi)
        wmax = s_hi - m_lo
        xmax = wmax * jnp.where(wmax >= 0.0, iv_hi, iv_lo)
        emin = jnp.where(mixed, jnp.float32(0.0), jnp.maximum(emin, 0.0))
        xmax = jnp.where(mixed, BIG, xmax)
        return emin, xmax

    def frustum_hit(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, tmax):
        """Scalar conservative block-vs-AABB test: may ANY ray in the
        block hit the box before the block's worst closest-t?"""
        ex, xx = axis_interval(ax_x, lo_x, hi_x)
        ey, xy = axis_interval(ax_y, lo_y, hi_y)
        ez, xz = axis_interval(ax_z, lo_z, hi_z)
        t_lo = jnp.maximum(jnp.maximum(ex, ey), ez)
        t_hi = jnp.minimum(jnp.minimum(xx, xy), xz)
        return (t_hi >= t_lo) & (t_hi > 0.0) & (t_lo < tmax)

    def top_hit(node, tmax):
        return frustum_hit(
            top_ref[node, 0], top_ref[node, 1], top_ref[node, 2],
            top_ref[node, 3], top_ref[node, 4], top_ref[node, 5], tmax)

    n_groups = treelet_rows // SUB_GROUP_ROWS
    sub_stride = 2 * n_groups

    def start_dmas(t_id, slot):
        row0 = t_id * treelet_rows
        rows = pltpu.make_async_copy(
            tris_hbm_ref.at[pl.ds(row0, treelet_rows), :],
            scratch_ref.at[slot],
            sem_ref.at[slot, 0],
        )
        sub = pltpu.make_async_copy(
            sub_hbm_ref.at[pl.ds(t_id * sub_stride, sub_stride), :],
            sub_scratch_ref.at[slot],
            sem_ref.at[slot, 1],
        )
        return rows, sub

    def sub_entry_vec(slot, node):
        """Per-ray slab entry distance of one group AABB (vector)."""
        tx1 = (sub_scratch_ref[slot, node, 0] - ox) * inv_dx
        tx2 = (sub_scratch_ref[slot, node, 3] - ox) * inv_dx
        ty1 = (sub_scratch_ref[slot, node, 1] - oy) * inv_dy
        ty2 = (sub_scratch_ref[slot, node, 4] - oy) * inv_dy
        tz1 = (sub_scratch_ref[slot, node, 2] - oz) * inv_dz
        tz2 = (sub_scratch_ref[slot, node, 5] - oz) * inv_dz
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx1, tx2), jnp.minimum(ty1, ty2)),
            jnp.minimum(tz1, tz2))
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx1, tx2), jnp.maximum(ty1, ty2)),
            jnp.maximum(tz1, tz2))
        hit = (t_far >= t_near) & (t_far > 0.0)
        return jnp.where(hit, jnp.maximum(t_near, 0.0), MISS)

    def test_row(t_id, slot, row):
        """14 division-free Moller-Trumbore tests of one DMA'd row vs the
        block: candidates carried as ratios (numerators in t/u/v_ref, the
        shared positive denominator |det| in td_ref), comparisons
        cross-multiplied — no per-triangle divide (kernels/fused.py
        measured ~10% of the row-test cost)."""
        row0 = t_id * treelet_rows
        for j in range(leaf_cap):
            base = 9 * j
            v1x = scratch_ref[slot, row, base + 0]
            v1y = scratch_ref[slot, row, base + 1]
            v1z = scratch_ref[slot, row, base + 2]
            e1x = scratch_ref[slot, row, base + 3]
            e1y = scratch_ref[slot, row, base + 4]
            e1z = scratch_ref[slot, row, base + 5]
            e2x = scratch_ref[slot, row, base + 6]
            e2y = scratch_ref[slot, row, base + 7]
            e2z = scratch_ref[slot, row, base + 8]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            sx = ox - v1x
            sy = oy - v1y
            sz = oz - v1z
            ur = sx * px + sy * py + sz * pz
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            vr = dx * qx + dy * qy + dz * qz
            tr = e2x * qx + e2y * qy + e2z * qz
            sg = jnp.where(det >= 0.0, jnp.float32(1.0), jnp.float32(-1.0))
            adet = det * sg
            uc = ur * sg
            vc = vr * sg
            tc = tr * sg
            ok = (
                (adet >= EPSILON)
                & (uc >= 0.0)
                & (vc >= 0.0)
                & (uc + vc <= adet)
                & (tc > EPSILON * adet)
                & (tc * td_ref[...] < t_ref[...] * adet)
            )
            t_ref[...] = jnp.where(ok, tc, t_ref[...])
            td_ref[...] = jnp.where(ok, adet, td_ref[...])
            u_ref[...] = jnp.where(ok, uc, u_ref[...])
            v_ref[...] = jnp.where(ok, vc, v_ref[...])
            idx_ref[...] = jnp.where(
                ok, (row0 + row) * leaf_cap + j, idx_ref[...]
            )

    def test_treelet(t_id, slot):
        """Retire one DMA'd treelet with PER-RAY group gating at the cost
        of ONE vector->scalar sync: every group AABB is slab-tested against
        every ray's current closest-t (clamped by its root-slab ceiling),
        the 16 per-ray want-bits pack into one i32 lane mask, and an
        OR-tree (sublane halving + lane rotates) collapses them so a single
        scalar read yields the group bitmask — per-ray closest-t pruning
        without the per-node reduction syncs that serialized round 2."""
        t_cur = jnp.minimum(t_ref[...] / td_ref[...], gate_ceiling)
        bt_ref[gi, 0] = bt_ref[gi, 0] + n_groups
        n_words = -(-n_groups // 32)
        # gbody's word select below handles exactly 1 or 2 mask words;
        # raising TREELET_ROWS/SUB_GROUP_ROWS past 64 groups needs a
        # general select or groups get gated by the wrong bit
        assert n_words <= 2, (n_groups, "extend the word select in gbody")
        words = []
        for w in range(n_words):
            # uint32 want-bit mask for groups [32w, 32w+32)
            bits_v = jnp.zeros(t_cur.shape, jnp.uint32)
            for g in range(32 * w, min(32 * (w + 1), n_groups)):
                enter = sub_entry_vec(slot, n_groups - 1 + g)
                bits_v = bits_v | (
                    (enter < t_cur).astype(jnp.uint32)
                    << jnp.uint32(g - 32 * w))
            b = bits_v
            rs = b.shape[0]
            while rs > 1:
                h = rs // 2
                b = b[:h] | b[h:rs]
                rs = h
            for sh in (1, 2, 4, 8, 16, 32, 64):
                b = b | pltpu.roll(b, sh, 1)
            # all lanes equal after the OR-tree, so a max reduction reads
            # the value; Mosaic lacks unsigned reductions, so go through
            # int32 — (bits >> g) & 1 stays correct under arithmetic shift
            words.append(jnp.max(pltpu.bitcast(b, jnp.int32)))

        def gbody(g, _):
            if n_words == 1:
                bit = (words[0] >> g) & 1
            else:
                lo = words[0] >> jnp.minimum(g, 31)
                hi = words[1] >> jnp.minimum(jnp.maximum(g - 32, 0), 31)
                bit = jnp.where(g < 32, lo, hi) & 1

            @pl.when(bit > 0)
            def _():
                for dr in range(SUB_GROUP_ROWS):
                    test_row(t_id, slot, SUB_GROUP_ROWS * g + dr)
                lf_ref[gi, 0] = lf_ref[gi, 0] + SUB_GROUP_ROWS

            return 0

        jax.lax.fori_loop(0, n_groups, gbody, 0)

    # block-dominant direction signs for near-first child ordering (scalar)
    sgn_x = (d_lo_x + d_hi_x) >= 0.0
    sgn_y = (d_lo_y + d_hi_y) >= 0.0
    sgn_z = (d_lo_z + d_hi_z) >= 0.0

    def internal_fn(carry, node):
        sp, pend_id, pend_slot, tmax = carry
        left = 2 * node + 1
        right = 2 * node + 2
        bt_ref[gi, 0] = bt_ref[gi, 0] + 2
        hit_l = top_hit(left, tmax)
        hit_r = top_hit(right, tmax)
        # near-first pop order, all scalar: order children by AABB center
        # along the axis where they differ most, signed by the block's
        # dominant direction — retiring near treelets first commits close
        # hits early, and the per-treelet tmax refresh then culls the far
        # ones (the closest-t feedback the frustum test needs)
        cdx = (top_ref[left, 0] + top_ref[left, 3]) - (
            top_ref[right, 0] + top_ref[right, 3])
        cdy = (top_ref[left, 1] + top_ref[left, 4]) - (
            top_ref[right, 1] + top_ref[right, 4])
        cdz = (top_ref[left, 2] + top_ref[left, 5]) - (
            top_ref[right, 2] + top_ref[right, 5])
        acx, acy, acz = jnp.abs(cdx), jnp.abs(cdy), jnp.abs(cdz)
        use_x = (acx >= acy) & (acx >= acz)
        use_y = (~use_x) & (acy >= acz)
        cd = jnp.where(use_x, cdx, jnp.where(use_y, cdy, cdz))
        sgn = jnp.where(use_x, sgn_x, jnp.where(use_y, sgn_y, sgn_z))
        l_near = jnp.where(sgn, cd < 0.0, cd > 0.0)
        first = jnp.where(l_near, right, left)      # far: pushed first
        second = jnp.where(l_near, left, right)     # near: popped first
        push_first = jnp.where(l_near, hit_r, hit_l)
        push_second = jnp.where(l_near, hit_l, hit_r)
        stack_ref[jnp.minimum(sp, STACK_DEPTH - 1)] = jnp.where(
            push_first, first, second)
        sp1 = sp + push_first.astype(jnp.int32)
        stack_ref[jnp.minimum(sp1, STACK_DEPTH - 1)] = second
        sp2 = sp1 + push_second.astype(jnp.int32)
        return sp2, pend_id, pend_slot, tmax

    def treelet_fn(carry, node):
        sp, pend_id, pend_slot, tmax = carry
        t_id = node - (n_treelets - 1)
        new_slot = 1 - pend_slot
        rows, sub = start_dmas(t_id, new_slot)
        rows.start()
        sub.start()

        # retire the PREVIOUS treelet while this one's DMAs are in flight
        @pl.when(pend_id >= 0)
        def _():
            prows, psub = start_dmas(pend_id, pend_slot)
            prows.wait()
            psub.wait()
            test_treelet(pend_id, pend_slot)

        # refresh the block's worst gate-t after each retired treelet
        # (ONE sync; Morton-front-to-back order shrinks it early, pruning
        # later subtrees — the "persistent closest-t" lever of PERF.md)
        new_tmax = jnp.where(pend_id >= 0, block_tmax(), tmax)
        return sp, t_id, new_slot, new_tmax

    def cond(carry):
        sp, pend_id, _, _ = carry
        return (sp > 0) | (pend_id >= 0)

    def body(carry):
        sp, pend_id, pend_slot, tmax = carry

        def drain(c):
            sp, pid, slot, tmax = c
            prows, psub = start_dmas(pid, slot)
            prows.wait()
            psub.wait()
            test_treelet(pid, slot)
            return sp, jnp.int32(-1), slot, tmax

        def step(c):
            sp, pid, slot, tmax = c
            node = stack_ref[sp - 1]
            is_treelet = node >= (n_treelets - 1)
            return jax.lax.cond(
                is_treelet, treelet_fn, internal_fn,
                (sp - 1, pid, slot, tmax), node,
            )

        return jax.lax.cond(sp == 0, drain, step, carry)

    jax.lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(-1),
                                    jnp.int32(0), block_tmax()))

    # recover real distances/barycentrics from the ratio state (ONE divide
    # per lane; no-hit lanes keep td=1, so t stays t_init exactly)
    inv_td = 1.0 / td_ref[...]
    t_ref[...] = t_ref[...] * inv_td
    u_ref[...] = u_ref[...] * inv_td
    v_ref[...] = v_ref[...] * inv_td


def _traverse_kernel(
    roots_ref,      # scalar-prefetch: (MAX_ROOTS + 1,) i32: [count, roots...]
    nodes_f_ref,    # (N, 8) f32 row: min x/y/z, max x/y/z, pad, pad
    nodes_i_ref,    # (N, 4) i32 row: left, right, leaf_row, leaf_tri_count
    tris_ref,       # (L, 128) f32 leaf-packed triangle rows
    o_ref,          # (3, RS, 128) f32 ray origins (block)
    d_ref,          # (3, RS, 128) f32 ray directions (block)
    tin_ref,        # (RS, 128) f32 initial closest-t (0 for dead rays)
    t_ref,          # out (RS, 128) f32
    u_ref,          # out (RS, 128) f32
    v_ref,          # out (RS, 128) f32
    idx_ref,        # out (RS, 128) i32 = leaf_row * leaf_cap + j
    bt_ref,         # out (1, 1) i32 SMEM: per-block AABB tests (heatmap)
    lf_ref,         # out (1, 1) i32 SMEM: per-block leaf visits
    stack_ref,      # SMEM scratch (STACK_DEPTH,) i32
    *,
    leaf_cap: int,
):
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    # finite reciprocals: a zero direction component + a node plane on the
    # ray makes 0 * inf = NaN and drops the subtree (see
    # intersect.safe_inv_dir)
    def _inv(d):
        return jnp.clip(
            1.0 / jnp.where(d == 0.0, jnp.float32(1e-30), d), -1e30, 1e30
        )

    inv_dx = _inv(dx)
    inv_dy = _inv(dy)
    inv_dz = _inv(dz)

    t_ref[...] = tin_ref[...]
    u_ref[...] = jnp.zeros_like(u_ref)
    v_ref[...] = jnp.zeros_like(v_ref)
    idx_ref[...] = jnp.full_like(idx_ref, -1)

    n_roots = roots_ref[0]

    def push_root(k, _):
        stack_ref[k] = roots_ref[k + 1]
        return 0

    jax.lax.fori_loop(0, n_roots, push_root, 0)

    # Scalar child-ordering signs: the block's dominant direction sign per
    # axis (one reduction each, ONCE per block — per-node ordering must not
    # issue vector->scalar syncs, they serialize the whole loop).
    sgn_x = jnp.sum(dx) >= 0.0
    sgn_y = jnp.sum(dy) >= 0.0
    sgn_z = jnp.sum(dz) >= 0.0

    def entry_dist(node):
        """Slab test of one node's AABB against the whole block
        (frag.glsl:408-419 semantics)."""
        tx1 = (nodes_f_ref[node, 0] - ox) * inv_dx
        tx2 = (nodes_f_ref[node, 3] - ox) * inv_dx
        ty1 = (nodes_f_ref[node, 1] - oy) * inv_dy
        ty2 = (nodes_f_ref[node, 4] - oy) * inv_dy
        tz1 = (nodes_f_ref[node, 2] - oz) * inv_dz
        tz2 = (nodes_f_ref[node, 5] - oz) * inv_dz
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx1, tx2), jnp.minimum(ty1, ty2)),
            jnp.minimum(tz1, tz2),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx1, tx2), jnp.maximum(ty1, ty2)),
            jnp.maximum(tz1, tz2),
        )
        hit = (t_far >= t_near) & (t_far > 0.0)
        return jnp.where(hit, jnp.maximum(t_near, 0.0), MISS)

    def leaf_fn(carry, node):
        sp, box, leaf = carry
        leaf_row = nodes_i_ref[node, 2]
        count = nodes_i_ref[node, 3]

        for j in range(leaf_cap):  # static unroll: lane offsets stay static
            @pl.when(j < count)
            def _(j=j):
                base = 9 * j
                v1x = tris_ref[leaf_row, base + 0]
                v1y = tris_ref[leaf_row, base + 1]
                v1z = tris_ref[leaf_row, base + 2]
                e1x = tris_ref[leaf_row, base + 3]
                e1y = tris_ref[leaf_row, base + 4]
                e1z = tris_ref[leaf_row, base + 5]
                e2x = tris_ref[leaf_row, base + 6]
                e2y = tris_ref[leaf_row, base + 7]
                e2z = tris_ref[leaf_row, base + 8]
                # Moller-Trumbore at VPU width (frag.glsl:351-372)
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = 1.0 / det
                sx = ox - v1x
                sy = oy - v1y
                sz = oz - v1z
                u = (sx * px + sy * py + sz * pz) * inv_det
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = (
                    (jnp.abs(det) >= EPSILON)
                    & (u >= 0.0)
                    & (u <= 1.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > EPSILON)
                    & (t < t_ref[...])
                )
                t_ref[...] = jnp.where(ok, t, t_ref[...])
                u_ref[...] = jnp.where(ok, u, u_ref[...])
                v_ref[...] = jnp.where(ok, v, v_ref[...])
                idx_ref[...] = jnp.where(
                    ok, leaf_row * leaf_cap + j, idx_ref[...]
                )
        return sp, box, leaf + 1

    def internal_fn(carry, node):
        sp, box, leaf = carry
        left = nodes_i_ref[node, 0]
        right = nodes_i_ref[node, 1]
        enter_l = entry_dist(left)
        enter_r = entry_dist(right)
        t_cur = t_ref[...]
        # ONE fused vector->scalar sync for both children: pack both want
        # masks into one i32 sum (lane counts fit 16 bits for block_rows
        # <= 256; separate jnp.any reductions each serialized the loop)
        packed = (enter_l < t_cur).astype(jnp.int32) + (
            (enter_r < t_cur).astype(jnp.int32) << 16
        )
        s = jnp.sum(packed)
        hit_l = (s & 0xFFFF) > 0
        hit_r = s >= (1 << 16)
        # near-first pop order WITHOUT vector reductions: order children by
        # their AABB center along the axis where they differ most, signed
        # by the block's dominant direction — all scalar math.
        cdx = (nodes_f_ref[left, 0] + nodes_f_ref[left, 3]) - (
            nodes_f_ref[right, 0] + nodes_f_ref[right, 3])
        cdy = (nodes_f_ref[left, 1] + nodes_f_ref[left, 4]) - (
            nodes_f_ref[right, 1] + nodes_f_ref[right, 4])
        cdz = (nodes_f_ref[left, 2] + nodes_f_ref[left, 5]) - (
            nodes_f_ref[right, 2] + nodes_f_ref[right, 5])
        ax, ay, az = jnp.abs(cdx), jnp.abs(cdy), jnp.abs(cdz)
        use_x = (ax >= ay) & (ax >= az)
        use_y = (~use_x) & (ay >= az)
        cd = jnp.where(use_x, cdx, jnp.where(use_y, cdy, cdz))
        sgn = jnp.where(use_x, sgn_x, jnp.where(use_y, sgn_y, sgn_z))
        # left is the near child iff its center is on the ray-entry side
        l_near = jnp.where(sgn, cd < 0.0, cd > 0.0)
        first = jnp.where(l_near, right, left)      # far child: pushed first
        second = jnp.where(l_near, left, right)     # near child: popped first
        push_first = jnp.where(l_near, hit_r, hit_l)
        push_second = jnp.where(l_near, hit_l, hit_r)
        # branch-free pushes: always write, advance sp only for real pushes
        # (garbage above sp is never read)
        stack_ref[jnp.minimum(sp, STACK_DEPTH - 1)] = jnp.where(
            push_first, first, second
        )
        sp1 = sp + push_first.astype(jnp.int32)
        stack_ref[jnp.minimum(sp1, STACK_DEPTH - 1)] = second
        sp2 = sp1 + push_second.astype(jnp.int32)
        # boxTests += 2 per internal visit (frag.glsl:523)
        return sp2, box + 2, leaf

    def cond(carry):
        return carry[0] > 0

    def body(carry):
        sp, box, leaf = carry
        node = stack_ref[sp - 1]
        is_leaf = nodes_i_ref[node, 0] == -1
        return jax.lax.cond(is_leaf, leaf_fn, internal_fn,
                            (sp - 1, box, leaf), node)

    _, box, leaf = jax.lax.while_loop(
        cond, body, (n_roots, jnp.int32(0), jnp.int32(0))
    )
    gi = pl.program_id(0)
    bt_ref[gi, 0] = box
    lf_ref[gi, 0] = leaf


@functools.partial(
    jax.jit,
    static_argnames=("leaf_cap", "block_rows", "interpret"),
)
def trace_forest(
    o3,        # (3, R) f32 ray origins, R % (block_rows*128) == 0
    d3,        # (3, R) f32 directions
    t_init,    # (R,) f32 initial closest-t (0 disables a lane)
    roots,     # (MAX_ROOTS + 1,) i32: [count, root ids..., padding]
    nodes_f,   # (N, 8) f32
    nodes_i,   # (N, 4) i32
    tris,      # (L, 128) f32 leaf-packed triangle rows
    *,
    leaf_cap: int,
    block_rows: int = 128,
    interpret: bool = False,
):
    """Closest-hit over the BVH forest for R rays.

    Returns (t, u, v, idx) each (R,); idx = leaf_row * leaf_cap + slot
    (-1 for no hit) — map through wf_perm for original triangle ids.

    Small forests (<= BRUTE_MAX_ROWS leaf rows) dispatch to _brute_kernel —
    measured faster than the stack walk for both coherent and incoherent
    rays at that size on v5e.
    """
    rb = block_rows * LANES
    r = o3.shape[1]
    assert r % rb == 0, (r, rb)
    grid = (r // rb,)
    o_b = o3.reshape(3, r // LANES, LANES)
    d_b = d3.reshape(3, r // LANES, LANES)
    t_b = t_init.reshape(r // LANES, LANES)
    shape = (r // LANES, LANES)

    n_rows = tris.shape[0]
    if n_rows <= BRUTE_MAX_ROWS:
        t, u, v, idx, bt, lf = pl.pallas_call(
            functools.partial(
                _brute_kernel, leaf_cap=leaf_cap, n_rows=n_rows
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes_f (unused)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # tris
                pl.BlockSpec((3, block_rows, LANES), lambda i: (0, i, 0)),
                pl.BlockSpec((3, block_rows, LANES), lambda i: (0, i, 0)),
                pl.BlockSpec((block_rows, LANES), lambda i: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((block_rows, LANES), lambda i: (i, 0)),
                pl.BlockSpec((block_rows, LANES), lambda i: (i, 0)),
                pl.BlockSpec((block_rows, LANES), lambda i: (i, 0)),
                pl.BlockSpec((block_rows, LANES), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(shape, jnp.float32),
                jax.ShapeDtypeStruct(shape, jnp.float32),
                jax.ShapeDtypeStruct(shape, jnp.float32),
                jax.ShapeDtypeStruct(shape, jnp.int32),
                jax.ShapeDtypeStruct((grid[0], 1), jnp.int32),
                jax.ShapeDtypeStruct((grid[0], 1), jnp.int32),
            ],
            interpret=interpret,
        )(nodes_f, tris, o_b, d_b, t_b)
        return (
            t.reshape(r), u.reshape(r), v.reshape(r), idx.reshape(r),
            bt[:, 0], lf[:, 0]
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes_f
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes_i
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tris
            pl.BlockSpec((3, block_rows, LANES), lambda i, *_: (0, i, 0)),
            pl.BlockSpec((3, block_rows, LANES), lambda i, *_: (0, i, 0)),
            pl.BlockSpec((block_rows, LANES), lambda i, *_: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, LANES), lambda i, *_: (i, 0)),
            pl.BlockSpec((block_rows, LANES), lambda i, *_: (i, 0)),
            pl.BlockSpec((block_rows, LANES), lambda i, *_: (i, 0)),
            pl.BlockSpec((block_rows, LANES), lambda i, *_: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
        ],
    )
    t, u, v, idx, bt, lf = pl.pallas_call(
        functools.partial(_traverse_kernel, leaf_cap=leaf_cap),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct((grid[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((grid[0], 1), jnp.int32),
        ],
        interpret=interpret,
    )(roots, nodes_f, nodes_i, tris, o_b, d_b, t_b)
    return (
        t.reshape(r), u.reshape(r), v.reshape(r), idx.reshape(r),
        bt[:, 0], lf[:, 0]
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_treelets", "treelet_rows", "leaf_cap", "block_rows",
                     "interpret"),
)
def trace_streamed(
    o3,        # (3, R) f32, R % (block_rows*128) == 0
    d3,        # (3, R) f32
    t_init,    # (R,) f32 (0 disables a lane)
    top_f,     # (2*n_treelets - 1, 8) f32 heap-order top-tree AABBs
    tris,      # (n_treelets * treelet_rows, 128) f32 leaf-packed rows (HBM)
    sub_f,     # (n_treelets * 2*(treelet_rows//SUB_GROUP_ROWS), 128) f32
               #   subtree AABBs (HBM; accel/lbvh.py sub_stride layout)
    *,
    n_treelets: int,
    treelet_rows: int,
    leaf_cap: int,
    block_rows: int = 128,
    interpret: bool = False,
):
    """Closest-hit over an HBM-streamed LBVH (accel/lbvh.py).

    Returns (t, u, v, idx), idx = global_row * leaf_cap + slot (-1 miss);
    map through StreamedForest.row_perm for original triangle ids.
    """
    rb = block_rows * LANES
    r = o3.shape[1]
    assert r % rb == 0, (r, rb)
    # the sublane OR-tree reduction (b = b[:h] | b[h:rs]) halves exactly
    # only for power-of-two block heights (ADVICE r3 #2)
    assert block_rows & (block_rows - 1) == 0, block_rows
    grid = (r // rb,)
    o_b = o3.reshape(3, r // LANES, LANES)
    d_b = d3.reshape(3, r // LANES, LANES)
    t_b = t_init.reshape(r // LANES, LANES)
    shape = (r // LANES, LANES)

    t, u, v, idx, bt, lf = pl.pallas_call(
        functools.partial(
            _streamed_kernel, n_treelets=n_treelets,
            treelet_rows=treelet_rows, leaf_cap=leaf_cap,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # top_f
            pl.BlockSpec(memory_space=pl.ANY),       # tris stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),       # subtree AABBs in HBM
            pl.BlockSpec((3, block_rows, LANES), lambda i: (0, i, 0)),
            pl.BlockSpec((3, block_rows, LANES), lambda i: (0, i, 0)),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct((grid[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((grid[0], 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((2, treelet_rows, LANES), jnp.float32),
            pltpu.VMEM((2, 2 * (treelet_rows // SUB_GROUP_ROWS), LANES),
                       jnp.float32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(top_f, tris, sub_f, o_b, d_b, t_b)
    return (
        t.reshape(r), u.reshape(r), v.reshape(r), idx.reshape(r),
        bt[:, 0], lf[:, 0]
    )
