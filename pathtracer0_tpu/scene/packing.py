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

    # Materials (SSBO binding 14, dispatch.java:270-329)
    materials: jax.Array  # (M, 48) f32

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


def pack_scene(scene, config: RenderConfig,
               max_leaf: Optional[int] = None) -> DeviceScene:
    """Build the BVH forest and pack all host-side scene state to arrays."""
    t = scene.tris
    n_tri = len(t)

    def stack3(lst, pad_shape):
        if lst:
            return np.stack(lst).astype(np.float32)
        return np.zeros(pad_shape, np.float32)

    if n_tri:
        v1 = np.stack(t.v1)
        v2 = np.stack(t.v2)
        v3 = np.stack(t.v3)
        forest = bvh_mod.build_forest(
            v1, v2, v3, t.object_ranges,
            sah_planes=config.sah_planes,
            max_depth=config.max_bvh_depth,
            max_leaf=max_leaf if max_leaf is not None
            else config.max_tris_in_leaf,
        )
    else:
        v1 = v2 = v3 = np.zeros((0, 3), np.float64)
        forest = bvh_mod.BVHArrays(
            node_min=np.zeros((0, 3), np.float32),
            node_max=np.zeros((0, 3), np.float32),
            leaf_start=np.zeros(0, np.int32),
            leaf_end=np.zeros(0, np.int32),
            left=np.zeros(0, np.int32),
            right=np.zeros(0, np.int32),
            leaf_tri_indices=np.zeros(0, np.int32),
            roots=np.zeros(0, np.int32),
        )

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

    dev = DeviceScene(
        tri_v1=tri_pad(v1.astype(np.float32)),
        tri_v2=tri_pad(v2.astype(np.float32)),
        tri_v3=tri_pad(v3.astype(np.float32)),
        tri_n1=tri_pad(stack3(t.n1, (0, 3))),
        tri_n2=tri_pad(stack3(t.n2, (0, 3))),
        tri_n3=tri_pad(stack3(t.n3, (0, 3))),
        tri_uv1=tri_pad(stack3(t.uv1, (0, 2))),
        tri_uv2=tri_pad(stack3(t.uv2, (0, 2))),
        tri_uv3=tri_pad(stack3(t.uv3, (0, 2))),
        tri_has_uv=pad1(np.asarray(t.has_uv, bool)),
        tri_has_smooth=pad1(np.asarray(t.has_smooth, bool)),
        tri_mat=pad1(np.asarray(t.mat, np.int32)),
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
        materials=pack_materials(scene.materials),
        tex_data=tex_data,
        tex_sizes=tex_sizes,
    )
    info = StaticSceneInfo(
        num_objects=int(forest.roots.shape[0]),
        num_ellipsoids=len(scene.ell_rad),
        num_implicits=len(scene.imp_fn),
        max_leaf_size=forest.max_leaf_size(),
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
