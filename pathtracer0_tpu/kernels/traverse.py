"""BVH traversal + closest-hit scene query.

TPU-native replacement for the GLSL megakernel's rayBVH/rayScene
(frag.glsl:452-653). Instead of one divergent per-pixel stack walk, a scalar
traversal (fixed-size stack in a carried array, `lax.while_loop`) is vmapped
over a megabatch of rays; XLA lifts the vmapped while_loop into one batched
loop whose iteration count is the max frontier depth over the batch, with
all memory traffic expressed as vectorized gathers.

Traversal semantics match the reference:
  * traversal starts at each top-level object root, pruned by the closest
    hit found so far across objects (frag.glsl:563-565, rayBVH's
    previous_closest_t argument)
  * leaves are nodes whose children are both -1 (frag.glsl:478)
  * internal nodes push far-child-first with closest-t pruning
    (frag.glsl:523-531)
  * leaf triangles accepted when t in (0, closest_t) (frag.glsl:489)
  * ray origins are nudged o + 1e-4*d before the scene query (frag.glsl:549)

Hit attributes (normal/UV/tangent) are interpolated ONCE after the closest
hit is final, not per candidate as in the shader — identical result, less
work. PARITY.md #2: the shader's smooth-normal interpolation reads n2 twice
(frag.glsl:503) and falls back to a zero normal for flat triangles whose
face normal has any zero component (frag.glsl:501-507); we interpolate
n1/n2/n3 correctly and use the packed has_smooth mask.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as vm
from . import intersect

MISS = intersect.MISS


class Hit(NamedTuple):
    """rayScene result (raySceneResult, frag.glsl:83-96), SoA over rays."""

    t: jax.Array          # (B,) distance; 1e30 = miss
    tri: jax.Array        # (B,) triangle index, -1 if none
    u: jax.Array          # (B,) barycentric u
    v: jax.Array          # (B,) barycentric v
    obj: jax.Array        # (B,) top-level BVH root id (parentID), -1 if none
    kind: jax.Array       # (B,) 0 none, 1 tri, 2 implicit, 3 ellipsoid
    prim: jax.Array       # (B,) ellipsoid/implicit index, -1 otherwise

    @property
    def is_hit(self):
        return self.t < jnp.float32(1e25)  # frag.glsl:634


class SurfaceSample(NamedTuple):
    """Interpolated attributes at the closest hit."""

    loc: jax.Array        # (B, 3) hit location (origin + t * dir, nudged o)
    norm: jax.Array       # (B, 3) shading normal
    tangent: jax.Array    # (B, 3) UV tangent (zeros when no UVs)
    uv: jax.Array         # (B, 2) interpolated UV ((-1,-1) when none)
    mat: jax.Array        # (B,) material index
    has_uv: jax.Array     # (B,) bool


def _traverse_object(o, d, root, closest, scene, stack_depth: int,
                     leaf_cap: int):
    """Scalar single-object rayBVH (frag.glsl:452-537). Returns
    (closest_t, tri_idx, u, v, (box_tests, leaf_visits)) with
    tri_idx = -1 if no closer hit."""
    node_min = scene.node_min
    node_max = scene.node_max

    enter = intersect.ray_box(o, d, node_min[root], node_max[root])
    stack = jnp.zeros((stack_depth,), jnp.int32)
    stack = stack.at[0].set(root)
    sp = jnp.where(enter > closest, 0, 1).astype(jnp.int32)

    def cond(carry):
        return carry[0] > 0

    def body(carry):
        sp, stack, closest, tri_idx, uu, vv, box, leaf = carry
        node = stack[sp - 1]
        sp = sp - 1
        left = scene.node_left[node]
        right = scene.node_right[node]
        is_leaf = (left | right) == -1  # frag.glsl:478

        # ---- leaf path: test up to leaf_cap triangles -------------------
        start = scene.leaf_start[node]
        end = scene.leaf_end[node]

        def leaf_body(i, acc):
            closest, tri_idx, uu, vv = acc
            idx = start + i
            valid = is_leaf & (idx < end)
            tri = scene.leaf_tri[jnp.minimum(idx, scene.leaf_tri.shape[0] - 1)]
            t, u, v = intersect.ray_tri(
                o, d, scene.tri_v1[tri], scene.tri_v2[tri], scene.tri_v3[tri]
            )
            better = valid & (t > 0.0) & (t < closest)
            closest = jnp.where(better, t, closest)
            tri_idx = jnp.where(better, tri, tri_idx)
            uu = jnp.where(better, u, uu)
            vv = jnp.where(better, v, vv)
            return closest, tri_idx, uu, vv

        closest, tri_idx, uu, vv = jax.lax.fori_loop(
            0, leaf_cap, leaf_body, (closest, tri_idx, uu, vv)
        )

        # ---- internal path: test children, push far then near -----------
        lsafe = jnp.maximum(left, 0)
        rsafe = jnp.maximum(right, 0)
        ld = intersect.ray_box(o, d, node_min[lsafe], node_max[lsafe])
        rd = intersect.ray_box(o, d, node_min[rsafe], node_max[rsafe])
        swap = ld > rd
        far_id = jnp.where(swap, left, right)
        far_d = jnp.where(swap, ld, rd)
        near_id = jnp.where(swap, right, left)
        near_d = jnp.where(swap, rd, ld)

        push_far = (~is_leaf) & (far_d < closest)
        stack = stack.at[jnp.minimum(sp, stack_depth - 1)].set(
            jnp.where(push_far, far_id, stack[jnp.minimum(sp, stack_depth - 1)])
        )
        sp = sp + push_far.astype(jnp.int32)
        push_near = (~is_leaf) & (near_d < closest)
        stack = stack.at[jnp.minimum(sp, stack_depth - 1)].set(
            jnp.where(push_near, near_id,
                      stack[jnp.minimum(sp, stack_depth - 1)])
        )
        sp = sp + push_near.astype(jnp.int32)
        # boxTests += 2 per internal visit; leaf visits counted separately
        # (frag.glsl:480, 523)
        box = box + jnp.where(is_leaf, 0, 2)
        leaf = leaf + is_leaf.astype(jnp.int32)
        return sp, stack, closest, tri_idx, uu, vv, box, leaf

    init = (
        sp,
        stack,
        closest,
        jnp.int32(-1),
        jnp.float32(0.0),
        jnp.float32(0.0),
        jnp.int32(0),
        jnp.int32(0),
    )
    sp, stack, closest, tri_idx, uu, vv, box, leaf = jax.lax.while_loop(
        cond, body, init
    )
    return closest, tri_idx, uu, vv, (box, leaf)


def _ray_scene_scalar(o, d, scene, info, stack_depth: int):
    """Scalar rayScene (frag.glsl:548-653): closest hit over the BVH forest
    and the analytic ellipsoids. Returns a scalar Hit (to be vmapped)."""
    o = o + jnp.float32(1e-4) * d  # frag.glsl:549
    closest = MISS
    tri_idx = jnp.int32(-1)
    uu = vv = jnp.float32(0.0)
    obj = jnp.int32(-1)
    kind = jnp.int32(0)
    prim = jnp.int32(-1)

    leaf_cap = max(info.max_leaf_size, 1)

    if info.num_objects > 0:
        def obj_body(i, carry):
            closest, tri_idx, uu, vv, obj = carry
            root = scene.roots[i]
            new_t, new_tri, nu, nv, _ = _traverse_object(
                o, d, root, closest, scene, stack_depth, leaf_cap
            )
            better = new_tri >= 0
            obj = jnp.where(better, root, obj)
            return (
                jnp.where(better, new_t, closest),
                jnp.where(better, new_tri, tri_idx),
                jnp.where(better, nu, uu),
                jnp.where(better, nv, vv),
                obj,
            )

        closest, tri_idx, uu, vv, obj = jax.lax.fori_loop(
            0, info.num_objects, obj_body,
            (closest, tri_idx, uu, vv, obj),
        )
        kind = jnp.where(tri_idx >= 0, 1, kind)

    if info.num_implicits > 0:
        # Implicit surfaces (frag.glsl:578-605): local frame O=(o-shift)/
        # scale, D=d/scale, optionally rotated; the returned t is in the
        # LOCAL parameterization, compared directly against world closest_t
        # (reference quirk kept — see shade/implicits.py).
        from ..shade import implicits as imp_mod

        shift = scene.imp_shift
        scl = scene.imp_scale
        rot = scene.imp_rot
        O = (o - shift) / scl
        D = d / scl
        rotated = vm.length(rot) > 0.0
        Or = jnp.where(rotated[:, None], vm.rotate(O, rot), O)
        Dr = jnp.where(rotated[:, None], vm.rotate(D, rot), D)
        ts = imp_mod.ray_implicit(Or, Dr, scene.imp_fn,
                                  fns_present=info.imp_fns)
        ts = ts[: info.num_implicits]
        besti = jnp.argmin(ts)
        # min, not ts[besti]: under vmap that indexing becomes a per-ray
        # batched gather (measured 49 ms/frame on the analytic scene)
        best_ti = jnp.min(ts)
        hit_imp = best_ti < closest
        closest = jnp.where(hit_imp, best_ti, closest)
        kind = jnp.where(hit_imp, 2, kind)
        prim = jnp.where(hit_imp, besti.astype(jnp.int32), prim)
        tri_idx = jnp.where(hit_imp, -1, tri_idx)
        obj = jnp.where(hit_imp, -1, obj)

    if info.num_ellipsoids > 0:
        # Vectorized over all ellipsoids at once (frag.glsl:606-631)
        rot = scene.ell_rot
        rotated = vm.length(rot) > 0.0
        ro = jnp.where(
            rotated[:, None], vm.rotate(jnp.broadcast_to(o, rot.shape), rot), o
        )
        rd_ = jnp.where(
            rotated[:, None], vm.rotate(jnp.broadcast_to(d, rot.shape), rot), d
        )
        ts = intersect.ray_ellipsoid(
            ro, rd_, scene.ell_c, scene.ell_rad, scene.ell_stretch
        )
        n_ell = info.num_ellipsoids
        ts = ts[:n_ell]
        best = jnp.argmin(ts)
        best_t = jnp.min(ts)
        hit_ell = best_t < closest
        closest = jnp.where(hit_ell, best_t, closest)
        kind = jnp.where(hit_ell, 3, kind)
        prim = jnp.where(hit_ell, best.astype(jnp.int32), prim)
        tri_idx = jnp.where(hit_ell, -1, tri_idx)
        obj = jnp.where(hit_ell, -1, obj)

    return Hit(t=closest, tri=tri_idx, u=uu, v=vv, obj=obj, kind=kind,
               prim=prim), o


def _merge_analytic_batched(o, d, scene, info, closest, tri_idx, uu, vv,
                            obj, kind, prim):
    """Batched ellipsoid + implicit closest-hit merge for the Pallas path
    (same semantics as the scalar blocks in _ray_scene_scalar)."""
    B = o.shape[0]
    if info.num_implicits > 0:
        from ..shade import implicits as imp_mod

        ne = info.num_implicits
        shift = scene.imp_shift[:ne]
        scl = scene.imp_scale[:ne]
        rot = scene.imp_rot[:ne]
        O = (o[:, None, :] - shift[None]) / scl[None]     # (B, I, 3)
        D = d[:, None, :] / scl[None]
        if info.has_rotated_implicits:
            rotated = (vm.length(rot) > 0.0)[None, :, None]
            rotb = jnp.broadcast_to(rot[None], O.shape)
            Or = jnp.where(rotated, vm.rotate(O, rotb), O)
            Dr = jnp.where(rotated, vm.rotate(D, rotb), D)
        else:
            Or, Dr = O, D
        fnb = jnp.broadcast_to(scene.imp_fn[None, :ne], (B, ne))
        ts = imp_mod.ray_implicit(Or, Dr, fnb,
                                  fns_present=info.imp_fns)  # (B, I)
        besti = jnp.argmin(ts, axis=1)
        # min, NOT take_along_axis(argmin): per-ray selects lower to serial
        # gathers on TPU (~4.9 ms per 480k-ray bounce measured)
        best_t = jnp.min(ts, axis=1)
        hit_imp = best_t < closest
        closest = jnp.where(hit_imp, best_t, closest)
        kind = jnp.where(hit_imp, 2, kind)
        prim = jnp.where(hit_imp, besti.astype(jnp.int32), prim)
        tri_idx = jnp.where(hit_imp, -1, tri_idx)
        obj = jnp.where(hit_imp, -1, obj)

    if info.num_ellipsoids > 0:
        ne = info.num_ellipsoids
        rot = scene.ell_rot[:ne]
        ob = jnp.broadcast_to(o[:, None, :], (B, ne, 3))
        db = jnp.broadcast_to(d[:, None, :], (B, ne, 3))
        if info.has_rotated_ellipsoids:
            rotated = (vm.length(rot) > 0.0)[None, :, None]
            rotb = jnp.broadcast_to(rot[None], (B, ne, 3))
            ro = jnp.where(rotated, vm.rotate(ob, rotb), ob)
            rd = jnp.where(rotated, vm.rotate(db, rotb), db)
        else:
            ro, rd = ob, db
        ts = intersect.ray_ellipsoid(
            ro, rd, scene.ell_c[None, :ne], scene.ell_rad[None, :ne],
            scene.ell_stretch[None, :ne],
        )                                                  # (B, E)
        best = jnp.argmin(ts, axis=1)
        best_t = jnp.min(ts, axis=1)
        hit_ell = best_t < closest
        closest = jnp.where(hit_ell, best_t, closest)
        kind = jnp.where(hit_ell, 3, kind)
        prim = jnp.where(hit_ell, best.astype(jnp.int32), prim)
        tri_idx = jnp.where(hit_ell, -1, tri_idx)
        obj = jnp.where(hit_ell, -1, obj)

    return closest, tri_idx, uu, vv, obj, kind, prim


def _ray_scene_pallas(origins, directions, scene, info, active,
                      interpret: bool, sort_rays: bool = False,
                      block_rows: int = 128):
    """Packet-traversal scene query (kernels/wavefront.py) + batched
    analytic-primitive merge.

    sort_rays: reorder rays by direction octant before packetizing (stable,
    so image order is kept within a bucket) — bounce rays regain packet
    coherence; results are scattered back to original order.
    """
    from . import wavefront

    o = origins + jnp.float32(1e-4) * directions  # frag.glsl:549
    B = o.shape[0]
    rb = wavefront.LANES * block_rows
    while rb > 1024 and rb > B:
        block_rows //= 2
        rb = wavefront.LANES * block_rows
    b_pad = ((B + rb - 1) // rb) * rb
    pad = b_pad - B

    if active is None:
        t_init = jnp.full((B,), MISS)
    else:
        # dead lanes get t_init=0: they prune every node and cost nothing
        t_init = jnp.where(active, MISS, 0.0)

    o_in, d_in = o, directions
    if sort_rays:
        octant = (
            (directions[:, 0] < 0).astype(jnp.int32) * 4
            + (directions[:, 1] < 0).astype(jnp.int32) * 2
            + (directions[:, 2] < 0).astype(jnp.int32)
        )
        order = jnp.argsort(octant, stable=True)
        o_in = o[order]
        d_in = directions[order]
        t_init = t_init[order]

    o3 = jnp.concatenate([o_in, jnp.zeros((pad, 3), o.dtype)]).T
    d3 = jnp.concatenate(
        [d_in, jnp.ones((pad, 3), directions.dtype)]
    ).T
    t_init = jnp.concatenate([t_init, jnp.zeros((pad,), jnp.float32)])

    leaf_cap = max(info.max_leaf_size, 1)
    t, uu, vv, idx, _, _ = wavefront.trace_forest(
        o3, d3, t_init, scene.wf_roots, scene.wf_nodes_f,
        scene.wf_nodes_i, scene.wf_tris,
        leaf_cap=leaf_cap, block_rows=block_rows, interpret=interpret,
    )
    t, uu, vv, idx = t[:B], uu[:B], vv[:B], idx[:B]
    if sort_rays:
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(B, dtype=order.dtype)
        )
        t, uu, vv, idx = t[inv], uu[inv], vv[inv], idx[inv]
    # idx -> original tri id -> object root, as one-hot matmuls (serial
    # TPU gathers are ~ms-scale per bounce even on small tables)
    if scene.wf_perm.shape[0] <= ONEHOT_MAX_TRIS:
        perm_obj = jnp.concatenate(
            [scene.wf_perm[:, None].astype(jnp.float32),
             scene.tri_obj[jnp.maximum(scene.wf_perm, 0)][:, None]
             .astype(jnp.float32)], axis=1,
        )
        po = vm.onehot_gather(perm_obj, jnp.maximum(idx, 0))
        tri_idx = jnp.where(idx >= 0, po[:, 0].astype(jnp.int32), -1)
        obj = jnp.where(tri_idx >= 0, po[:, 1].astype(jnp.int32), -1)
    else:
        tri_idx = jnp.where(
            idx >= 0, scene.wf_perm[jnp.maximum(idx, 0)], -1
        ).astype(jnp.int32)
        obj = jnp.where(
            tri_idx >= 0, scene.tri_obj[jnp.maximum(tri_idx, 0)], -1
        ).astype(jnp.int32)
    kind = jnp.where(tri_idx >= 0, 1, 0).astype(jnp.int32)
    prim = jnp.full((B,), -1, jnp.int32)
    closest = t

    closest, tri_idx, uu, vv, obj, kind, prim = _merge_analytic_batched(
        o, directions, scene, info, closest, tri_idx, uu, vv, obj, kind,
        prim,
    )
    return Hit(t=closest, tri=tri_idx, u=uu, v=vv, obj=obj, kind=kind,
               prim=prim), o


def _morton_spread(v):  # standard 10-bit Morton spread masks
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _spatial_sort_key(o, d, scene_lo, scene_hi, o_bits: int = 5,
                      d_bits: int = 4):
    """Ray-coherence sort key, OCTANT-major: the 3 direction-sign bits
    lead, then origin Morton, then fine direction Morton.

    Octant purity is load-bearing for the streamed kernel's scalar frustum
    gating (kernels/wavefront._streamed_kernel): a block whose directions
    mix signs on an axis gets NO frustum constraint on that axis, and
    bounce batches sorted origin-first degenerated to brute-testing the
    whole scene (measured 15x worse than primary blocks on the 1M-tri
    terrain). Within one octant the origin Morton bits still cluster
    origins, and the fine direction bits tile shared-origin primary rays
    into compact square-ish footprints rather than image scanlines."""
    span = jnp.maximum(scene_hi - scene_lo, 1e-6)
    qo = jnp.clip(
        ((o - scene_lo) / span * (2 ** o_bits - 1)).astype(jnp.int32),
        0, 2 ** o_bits - 1,
    )
    dn = d / jnp.maximum(
        jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True)), 1e-20)
    qd = jnp.clip(
        ((dn * 0.5 + 0.5) * (2 ** d_bits - 1)).astype(jnp.int32),
        0, 2 ** d_bits - 1,
    )
    octant = (
        ((d[:, 0] >= 0).astype(jnp.int32) << 2)
        | ((d[:, 1] >= 0).astype(jnp.int32) << 1)
        | (d[:, 2] >= 0).astype(jnp.int32)
    )
    m_o = ((_morton_spread(qo[:, 0]) << 2)
           | (_morton_spread(qo[:, 1]) << 1) | _morton_spread(qo[:, 2]))
    m_d = ((_morton_spread(qd[:, 0]) << 2)
           | (_morton_spread(qd[:, 1]) << 1) | _morton_spread(qd[:, 2]))
    return (octant << (3 * (o_bits + d_bits))) | (m_o << (3 * d_bits)) | m_d


def _ray_scene_streamed(origins, directions, scene, info, active,
                        interpret: bool, block_rows: int = 8,
                        sort_rays: bool = True):
    """Scene query through the HBM-streamed LBVH kernel
    (kernels/wavefront.trace_streamed) + batched analytic merge. Streamed
    scenes have no SAH forest, so there is no vmapped fallback; on CPU the
    kernel runs in interpreter mode.

    sort_rays defaults ON here (unlike the VMEM-resident paths): at
    millions of triangles an incoherent block's any-hit gating degrades to
    visiting most treelets, so the argsort+scatter cost is repaid many
    times over by spatially clustered packets.

    block_rows defaults to 8 here (one (8, 128) vreg per vector op, 1024
    rays): the streamed kernel's traversal decisions are scalar frustum
    tests, so SMALL blocks cost no extra syncs while making the frustum
    ~4x tighter and every row test 4x narrower than the 32-row blocks the
    VMEM-resident paths use."""
    from . import wavefront

    o = origins + jnp.float32(1e-4) * directions  # frag.glsl:549
    B = o.shape[0]
    rb = wavefront.LANES * block_rows
    while rb > 1024 and rb > B:
        block_rows //= 2
        rb = wavefront.LANES * block_rows
    b_pad = ((B + rb - 1) // rb) * rb
    pad = b_pad - B

    if active is None:
        t_init = jnp.full((B,), MISS)
    else:
        t_init = jnp.where(active, MISS, 0.0)

    o_in, d_in = o, directions
    if sort_rays and B >= rb:
        key = _spatial_sort_key(
            o, directions, scene.st_top[0, 0:3], scene.st_top[0, 3:6]
        )
        # rays that miss the ROOT AABB cannot hit anything: sort them back
        # with the dead lanes so live blocks stay geometrically tight (the
        # kernel's per-block frustum is a hull over the block's rays)
        lo = scene.st_top[0, 0:3]
        hi = scene.st_top[0, 3:6]
        inv = intersect.safe_inv_dir(directions)
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
        t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
        root_hit = (t_far >= t_near) & (t_far > 0.0)
        key = jnp.where(root_hit, key, jnp.int32(2 ** 30))
        # dead lanes sort to the very back so live packets stay dense
        key = jnp.where(t_init > 0.0, key, jnp.int32(2 ** 30 + 1))
        order = jnp.argsort(key, stable=True)
        o_in = o[order]
        d_in = directions[order]
        t_init = t_init[order]

    o3 = jnp.concatenate([o_in, jnp.zeros((pad, 3), o.dtype)]).T
    d3 = jnp.concatenate(
        [d_in, jnp.ones((pad, 3), directions.dtype)]
    ).T
    t_init = jnp.concatenate([t_init, jnp.zeros((pad,), jnp.float32)])

    t, uu, vv, idx, _, _ = wavefront.trace_streamed(
        o3, d3, t_init, scene.st_top, scene.st_tris, scene.st_sub,
        n_treelets=info.st_n_treelets,
        treelet_rows=info.st_treelet_rows,
        leaf_cap=info.st_leaf_cap,
        block_rows=block_rows, interpret=interpret,
    )
    t, uu, vv, idx = t[:B], uu[:B], vv[:B], idx[:B]
    if sort_rays and B >= rb:
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(B, dtype=order.dtype)
        )
        t, uu, vv, idx = t[inv], uu[inv], vv[inv], idx[inv]
    tri_idx = jnp.where(
        idx >= 0, scene.st_perm[jnp.maximum(idx, 0)], -1
    ).astype(jnp.int32)
    if info.num_tri_objects == 1:
        # single-object streamed scene: the ordinal is constant — skip the
        # per-ray gather (each full-width gather costs ~32 ns/row/bounce)
        obj = jnp.where(tri_idx >= 0, 0, -1).astype(jnp.int32)
    else:
        obj = jnp.where(
            tri_idx >= 0, scene.tri_obj[jnp.maximum(tri_idx, 0)], -1
        ).astype(jnp.int32)
    kind = jnp.where(tri_idx >= 0, 1, 0).astype(jnp.int32)
    prim = jnp.full((B,), -1, jnp.int32)

    closest, tri_idx, uu, vv, obj, kind, prim = _merge_analytic_batched(
        o, directions, scene, info, t, tri_idx, uu, vv, obj, kind, prim,
    )
    return Hit(t=closest, tri=tri_idx, u=uu, v=vv, obj=obj, kind=kind,
               prim=prim), o


def heat_counts(origins, directions, scene, info, pallas: str = "auto",
                block_rows: int = 128):
    """Per-ray (box_tests, leaf_visits) through the packet kernels for the
    debug heatmap (frag.glsl:534). The kernels report per-BLOCK counters
    (a packet pays every visit in lockstep), expanded per ray here."""
    from . import wavefront

    interpret = (pallas == "interpret"
                 or jax.default_backend() == "cpu")
    o = origins + jnp.float32(1e-4) * directions
    B = o.shape[0]
    rb = wavefront.LANES * block_rows
    while rb > 1024 and rb > B:
        block_rows //= 2
        rb = wavefront.LANES * block_rows
    b_pad = ((B + rb - 1) // rb) * rb
    pad = b_pad - B
    o3 = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)]).T
    d3 = jnp.concatenate(
        [directions, jnp.ones((pad, 3), directions.dtype)]
    ).T
    t_init = jnp.concatenate(
        [jnp.full((B,), MISS), jnp.zeros((pad,), jnp.float32)]
    )
    if info.streamed:
        _, _, _, _, bt, lf = wavefront.trace_streamed(
            o3, d3, t_init, scene.st_top, scene.st_tris, scene.st_sub,
            n_treelets=info.st_n_treelets,
            treelet_rows=info.st_treelet_rows,
            leaf_cap=info.st_leaf_cap,
            block_rows=block_rows, interpret=interpret,
        )
    else:
        _, _, _, _, bt, lf = wavefront.trace_forest(
            o3, d3, t_init, scene.wf_roots, scene.wf_nodes_f,
            scene.wf_nodes_i, scene.wf_tris,
            leaf_cap=max(info.max_leaf_size, 1),
            block_rows=block_rows, interpret=interpret,
        )
    box = jnp.repeat(bt, rb)[:B]
    leaf = jnp.repeat(lf, rb)[:B]
    return box, leaf


def probe_forest_t(origins, directions, scene, info, parent,
                   stack_depth: int = 64, pallas: str = "auto"):
    """Thickness/visibility probe: closest triangle-hit distance only
    (the Whitted SSS probe, frag.glsl:662-676).

    Packet path: queries the whole forest (deviation from the reference's
    parent-only rayBVH — differs only when another object intersects the
    probe segment inside the parent; PARITY.md). XLA path: per-ray
    traversal of the `parent` root, matching the reference exactly. Large
    batched stack-walk vmaps fault the TPU worker, so the packet path is
    mandatory on TPU."""
    use_pallas = False
    interpret = False
    if pallas == "auto":
        use_pallas = info.wf_ok and jax.default_backend() != "cpu"
    elif pallas == "on":
        use_pallas = info.wf_ok
    elif pallas == "interpret":
        use_pallas = info.wf_ok
        interpret = True
    if info.streamed:
        interpret = (pallas == "interpret"
                     or jax.default_backend() == "cpu")
        hit, _ = _ray_scene_streamed(
            origins, directions, scene,
            info._replace(num_ellipsoids=0, num_implicits=0),
            None, interpret,
        )
        return hit.t
    if use_pallas and info.num_objects > 0:
        from . import wavefront

        o = origins + jnp.float32(1e-4) * directions
        B = o.shape[0]
        block_rows = 128
        rb = wavefront.LANES * block_rows
        while rb > 1024 and rb > B:
            block_rows //= 2
            rb = wavefront.LANES * block_rows
        b_pad = ((B + rb - 1) // rb) * rb
        pad = b_pad - B
        o3 = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)]).T
        d3 = jnp.concatenate(
            [directions, jnp.ones((pad, 3), directions.dtype)]
        ).T
        t_init = jnp.concatenate(
            [jnp.full((B,), MISS), jnp.zeros((pad,), jnp.float32)]
        )
        t, _, _, _, _, _ = wavefront.trace_forest(
            o3, d3, t_init, scene.wf_roots, scene.wf_nodes_f,
            scene.wf_nodes_i, scene.wf_tris,
            leaf_cap=max(info.max_leaf_size, 1), block_rows=block_rows,
            interpret=interpret,
        )
        return t[:B]

    def probe_one(o, d, root):
        root = jnp.maximum(root, 0)
        t, _, _, _, _ = _traverse_object(
            o + jnp.float32(1e-4) * d, d, root, MISS, scene,
            stack_depth, max(info.max_leaf_size, 1),
        )
        return t

    return jax.vmap(probe_one)(origins, directions, parent)


def ray_scene(origins, directions, scene, info, stack_depth: int = 64,
              pallas: str = "auto", active=None, sort_rays: bool = False):
    """Batched closest-hit query: origins/directions (B, 3).

    pallas: "auto" (packet kernel when compiled for TPU and the forest fits
    VMEM), "on", "interpret" (kernel in interpreter mode, for CPU tests),
    or "off" (vmapped XLA traversal).
    `active` optionally masks dead rays so they cost nothing (Pallas path).

    Returns (Hit, nudged_origins).
    """
    if info.streamed:
        # No SAH forest exists for streamed scenes — the kernel is the
        # only triangle path, so off-TPU it ALWAYS runs interpreted
        # (pallas="off" has no meaning here).
        interpret = (pallas == "interpret"
                     or jax.default_backend() == "cpu")
        return _ray_scene_streamed(
            origins, directions, scene, info, active, interpret,
        )
    if info.num_objects == 0:
        # Analytic-only scene: the batched ellipsoid/implicit merge IS the
        # whole query — no per-ray vmap (whose indexing ops lower to
        # serial batched gathers on TPU).
        o = origins + jnp.float32(1e-4) * directions  # frag.glsl:549
        B = o.shape[0]
        # dead lanes keep the t_init=0 contract of the packet/streamed
        # paths (ADVICE r2: they used to return real hit t here)
        if active is None:
            closest = jnp.full((B,), MISS)
        else:
            closest = jnp.where(active, MISS, 0.0)
        tri_idx = jnp.full((B,), -1, jnp.int32)
        uu = vv = jnp.zeros((B,), jnp.float32)
        obj = jnp.full((B,), -1, jnp.int32)
        kind = jnp.zeros((B,), jnp.int32)
        prim = jnp.full((B,), -1, jnp.int32)
        closest, tri_idx, uu, vv, obj, kind, prim = (
            _merge_analytic_batched(
                o, directions, scene, info, closest, tri_idx, uu, vv,
                obj, kind, prim,
            )
        )
        return Hit(t=closest, tri=tri_idx, u=uu, v=vv, obj=obj, kind=kind,
                   prim=prim), o
    use_pallas = False
    interpret = False
    if pallas == "auto":
        use_pallas = info.wf_ok and jax.default_backend() != "cpu"
    elif pallas == "on":
        use_pallas = info.wf_ok
    elif pallas == "interpret":
        use_pallas = info.wf_ok
        interpret = True
    if use_pallas and info.num_objects > 0:
        return _ray_scene_pallas(
            origins, directions, scene, info, active, interpret,
            sort_rays=sort_rays,
        )
    fn = functools.partial(
        _ray_scene_scalar, scene=scene, info=info, stack_depth=stack_depth
    )
    return jax.vmap(fn)(origins, directions)


# Combined-attribute one-hot fetch is worth it up to a few thousand rows;
# beyond that the MXU contraction cost (B x T x 27) overtakes the serial
# gather and scenes should use the HBM-streamed kernel's in-kernel
# attributes instead.
ONEHOT_MAX_TRIS = 8192


def _assemble_sample(hit: Hit, origins, directions, scene, info,
                     loc, tri_norm, uv, tangent, has_uv, tri_mat
                     ) -> SurfaceSample:
    """Shared tail of surface_sample: ellipsoid/implicit attribute
    merge and final assembly (split out so the gather-gated big-scene
    branch and the one-hot small-scene branch share it)."""
    # --- ellipsoid attributes ----------------------------------------------
    prim = jnp.maximum(hit.prim, 0)
    ell_attr = vm.onehot_gather(
        jnp.concatenate(
            [scene.ell_c, scene.ell_rot,
             scene.ell_mat[:, None].astype(jnp.float32)], axis=1,
        ),
        prim,
    )
    c = ell_attr[..., 0:3]
    rot = ell_attr[..., 3:6]
    if info is not None and not info.has_rotated_ellipsoids:
        ell_norm = vm.normalize(loc - c)
    else:
        rotated = (vm.length(rot) > 0.0)[..., None]
        # Reference: N = normalize(o + t*d - c), in the rotated frame when
        # the ellipsoid is rotated (frag.glsl:622-626).
        ro = jnp.where(rotated, vm.rotate(origins, rot), origins)
        rd = jnp.where(rotated, vm.rotate(directions, rot), directions)
        local = ro + hit.t[..., None] * rd - c
        ell_norm_rot = vm.rotate_back(vm.normalize(local), rot)
        ell_norm = jnp.where(rotated, ell_norm_rot, vm.normalize(loc - c))
    ell_mat = ell_attr[..., 6].astype(jnp.int32)

    is_tri = (hit.kind == 1)[..., None]
    is_ell = (hit.kind == 3)[..., None]
    norm = jnp.where(is_tri, tri_norm, jnp.where(is_ell, ell_norm, 0.0))
    mat = jnp.where(hit.kind == 1, tri_mat,
                    jnp.where(hit.kind == 3, ell_mat, -1))

    if info is not None and info.num_implicits > 0:
        # Implicit normals: N = -normalize(gradient) in the local frame,
        # rotated back when the implicit is rotated (frag.glsl:596-600).
        from ..shade import implicits as imp_mod

        iprim = jnp.maximum(hit.prim, 0)
        iattr = vm.onehot_gather(
            jnp.concatenate(
                [scene.imp_shift, scene.imp_scale, scene.imp_rot,
                 scene.imp_fn[:, None].astype(jnp.float32),
                 scene.imp_mat[:, None].astype(jnp.float32)], axis=1,
            ),
            iprim,
        )
        ishift = iattr[..., 0:3]
        iscale = iattr[..., 3:6]
        irot = iattr[..., 6:9]
        ifn = iattr[..., 9].astype(jnp.int32)
        imat = iattr[..., 10].astype(jnp.int32)
        O = (origins - ishift) / iscale
        D = directions / iscale
        if info.has_rotated_implicits:
            irotated = (vm.length(irot) > 0.0)[..., None]
            Or = jnp.where(irotated, vm.rotate(O, irot), O)
            Dr = jnp.where(irotated, vm.rotate(D, irot), D)
        else:
            irotated = jnp.zeros(O.shape[:-1] + (1,), bool)
            Or, Dr = O, D
        p_local = Or + hit.t[..., None] * Dr
        grad = imp_mod.gradient(p_local, ifn, fns_present=info.imp_fns)
        # Reference net normal is +normalize(df): gradient() returns negated
        # partials (frag.glsl:440-445) and rayScene negates again
        # (frag.glsl:597-599). Our gradient() returns raw partials, so no
        # extra negation here (ADVICE r1: inward normals broke in_object
        # tracking and Beer-Lambert for implicits).
        n_imp = vm.normalize(grad)
        n_imp = jnp.where(irotated, vm.rotate_back(n_imp, irot), n_imp)
        is_imp = (hit.kind == 2)[..., None]
        norm = jnp.where(is_imp, n_imp, norm)
        mat = jnp.where(hit.kind == 2, imat, mat)
        # hit location in WORLD space uses the local-t quirk consistently
        loc = jnp.where(is_imp, origins + hit.t[..., None] * directions, loc)
    uv = jnp.where(is_tri, uv, -1.0)
    tangent = jnp.where(is_tri, tangent, 0.0)
    has_uv = has_uv & (hit.kind == 1)

    return SurfaceSample(
        loc=loc, norm=norm, tangent=tangent, uv=uv,
        mat=mat.astype(jnp.int32), has_uv=has_uv,
    )


def surface_sample(hit: Hit, origins, directions, scene,
                   info=None) -> SurfaceSample:
    """Interpolate normal/UV/tangent at the final hits (frag.glsl:483-519
    leaf bookkeeping + frag.glsl:606-631 ellipsoid normals), deferred to
    once-per-ray. `origins` must be the nudged origins returned by
    ray_scene.

    Attribute rows are fetched with one-hot matmuls (bit-exact, rides the
    MXU) instead of per-ray gathers, which lower to serial dynamic-slices
    on TPU — measured ~10 ms/bounce on a 480k-ray batch even for tiny
    tables."""
    tri = jnp.maximum(hit.tri, 0)
    loc = origins + hit.t[..., None] * directions

    # --- triangle attributes ---------------------------------------------
    u = hit.u[..., None]
    v = hit.v[..., None]
    w = 1.0 - u - v
    # gate on the TRIANGLE count, not the table size: big scenes carry a
    # 1-row tri_attr placeholder (scene/packing.py) and must take the
    # per-array gather path below
    if scene.tri_v1.shape[0] <= ONEHOT_MAX_TRIS:
        attr = vm.onehot_gather(scene.tri_attr, tri)
        n1 = attr[..., 0:3]
        n2 = attr[..., 3:6]
        n3 = attr[..., 6:9]
        uv1 = attr[..., 9:11]
        uv2 = attr[..., 11:13]
        uv3 = attr[..., 13:15]
        has_uv = attr[..., 15] > 0.5
        smooth = (attr[..., 16] > 0.5)[..., None]
        tri_mat = attr[..., 17].astype(jnp.int32)
        tv1 = attr[..., 18:21]
        tv2 = attr[..., 21:24]
        tv3 = attr[..., 24:27]
    else:
        # Big-scene branch: per-array gathers cost ~32 ns/row at full batch
        # width EVERY bounce (measured, 1M rows), so gathers whose columns
        # are statically constant are skipped: a scene with no UVs anywhere
        # (info.any_uv False) has uv == -1 and tangent == 0 by
        # construction, and one with no smooth normals (info.any_smooth
        # False) has norm == n1 exactly — a UV-less flat-shaded 1M-tri
        # scene drops from 12 gathers/bounce to 2.
        any_uv = info is None or info.any_uv
        any_smooth = info is None or info.any_smooth
        B_shape = tri.shape
        n1 = scene.tri_n1[tri]
        if any_smooth:
            n2 = scene.tri_n2[tri]
            n3 = scene.tri_n3[tri]
            smooth = scene.tri_has_smooth[tri][..., None]
        else:
            n2 = n3 = n1
            smooth = jnp.zeros(B_shape + (1,), bool)
        if any_uv:
            uv1 = scene.tri_uv1[tri]
            uv2 = scene.tri_uv2[tri]
            uv3 = scene.tri_uv3[tri]
            has_uv = scene.tri_has_uv[tri]
            tv1 = scene.tri_v1[tri]
            tv2 = scene.tri_v2[tri]
            tv3 = scene.tri_v3[tri]
        else:
            has_uv = jnp.zeros(B_shape, bool)
        tri_mat = scene.tri_mat[tri]

        interp = vm.normalize(n1 * w + n2 * u + n3 * v) if any_smooth \
            else n1
        tri_norm = jnp.where(smooth, interp, n1)
        if any_uv:
            uv = uv1 * w + uv2 * u + uv3 * v
            # GL flips v for mesh UVs (frag.glsl:513)
            uv = jnp.stack([uv[..., 0], 1.0 - uv[..., 1]], axis=-1)
            uv = jnp.where(has_uv[..., None], uv, jnp.float32(-1.0))
            tangent = intersect.compute_tangent(
                tv1, tv2, tv3, uv1, uv2, uv3, tri_norm,
            )
            tangent = jnp.where(has_uv[..., None], tangent, 0.0)
        else:
            uv = jnp.full(B_shape + (2,), -1.0, jnp.float32)
            tangent = jnp.zeros(B_shape + (3,), jnp.float32)
        return _assemble_sample(
            hit, origins, directions, scene, info, loc, tri_norm, uv,
            tangent, has_uv, tri_mat)

    interp = vm.normalize(n1 * w + n2 * u + n3 * v)
    tri_norm = jnp.where(smooth, interp, n1)

    uv = uv1 * w + uv2 * u + uv3 * v
    # GL flips v for mesh UVs (frag.glsl:513)
    uv = jnp.stack([uv[..., 0], 1.0 - uv[..., 1]], axis=-1)
    uv = jnp.where(has_uv[..., None], uv, jnp.float32(-1.0))
    tangent = intersect.compute_tangent(
        tv1, tv2, tv3, uv1, uv2, uv3, tri_norm,
    )
    tangent = jnp.where(has_uv[..., None], tangent, 0.0)

    return _assemble_sample(hit, origins, directions, scene, info, loc,
                            tri_norm, uv, tangent, has_uv, tri_mat)
