"""MXU-formulated Moller-Trumbore: ray x triangle tests as matmuls.

VERDICT r4's headline ask: Moller-Trumbore is BILINEAR in per-ray and
per-triangle quantities, so every candidate scalar (det, u_num, v_num,
t_num) is a dot product of a <= 16-dim per-ray feature vector with a
per-triangle coefficient vector — and a (tris x 16) @ (16 x rays) matmul
computes a whole leaf group's candidates on the MXU (the one hardware
unit the streamed path had never tried) instead of ~55 VPU ops per
broadcast row test.

Derivation (triple-product identities; frag.glsl:351-372 semantics):

  p     = d x e2
  det   = e1 . p                  = (e2 x e1) . d
  s     = o - v1
  u_num = s . p                   = e2 . (o x d) - (e2 x v1) . d
  q     = s x e1
  v_num = d . q                   = -e1 . (o x d) - (v1 x e1) . d
  t_num = e2 . q                  = n . o - n . v1,   n = e1 x e2

With the per-ray FEATURE vector (w = o x d precomputed per ray)

  f = [dx dy dz  wx wy wz  ox oy oz  1  0...] in R^16,

each quantity is f . c for a per-triangle COEFFICIENT vector c. A fifth
derived row w_num = det - u_num - v_num (coefficients subtract) makes the
inside-triangle test a pure SIGN test: a hit needs u_num, v_num, w_num,
det all the same sign, i.e. min(...) > 0 or max(...) < 0 — no
sign-folded compares on the VPU.

Conditioning: the expanded forms suffer cancellation when |o| or |v1| is
large (terms scale like |o||d||e2| while u_num scales like |o - v1|), so
both rays and triangles are RE-CENTERED by a shared scene-level offset
before features/coefficients are built; tests pin the error against the
direct f32 evaluation.

Coefficient table layout (one row group = GROUP_TRIS = 56 triangles =
SUB_GROUP_ROWS x TRIS_PER_ROW, the streamed kernel's gating quantum):

  coef (n_groups * 16, 5 * 64) f32 — group g occupies sublane rows
  [16 g, 16 g + 16); lanes [64 q, 64 q + 56) hold quantity q's
  coefficients for the group's 56 triangles (column-padded to 64 so each
  quantity block starts lane-aligned; the 8 pad columns carry det = +1,
  u_num = -1 via the constant feature, so padding self-masks exactly like
  the zeroed rows in tri_rows). Quantities: 0 det, 1 u, 2 v, 3 w, 4 t.

Kernel-side use (see tools/diag_mxu.py and kernels/wavefront.py): per
gated group, dot_general(coef_slice.T-contraction, features) on the MXU
yields (5*64, 128) candidates per ray-row; validity + winner reduction
stay on the VPU at full (56, 128) width.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

N_FEATURES = 16
QUANT_PAD = 64      # per-quantity column stride (56 real + 8 pad)
N_QUANT = 5         # det, u, v, w, t


def ray_features(o3, d3, center):
    """(16, R) f32 feature matrix for R rays, recentered by `center`.

    o3/d3 are (3, R); center is a (3,) scene-level offset shared with
    coef_table (the same shift must be applied to both or the expansion
    is wrong).
    """
    o = o3 - jnp.asarray(center, o3.dtype)[:, None]
    d = d3
    w = jnp.stack([
        o[1] * d[2] - o[2] * d[1],
        o[2] * d[0] - o[0] * d[2],
        o[0] * d[1] - o[1] * d[0],
    ])
    r = o3.shape[1]
    f = jnp.concatenate([
        d, w, o,
        jnp.ones((1, r), o3.dtype),
        jnp.zeros((N_FEATURES - 10, r), o3.dtype),
    ], axis=0)
    return f


def coef_table_np(tri_rows: np.ndarray, center, leaf_cap: int = 14,
                  group_rows: int = 4) -> np.ndarray:
    """Build the (n_groups * 16, 5 * QUANT_PAD) coefficient table from
    leaf-packed triangle rows (accel/lbvh.py layout: triangle j of a row
    packs v1/e1/e2 at lanes [9j, 9j+9)).

    NumPy reference implementation; coef_table_device is the XLA twin used
    at scene-build time (the table is 4x tri_rows' footprint, so it is
    built on device from the already-uploaded rows).
    """
    rows, _ = tri_rows.shape
    n_groups = rows // group_rows
    g_tris = group_rows * leaf_cap
    assert g_tris <= QUANT_PAD * 1  # 56 <= 64
    tr = tri_rows[:, : 9 * leaf_cap].reshape(rows * leaf_cap, 9)
    v1 = tr[:, 0:3].astype(np.float64) - np.asarray(center, np.float64)
    e1 = tr[:, 3:6].astype(np.float64)
    e2 = tr[:, 6:9].astype(np.float64)
    n = np.cross(e1, e2)
    c_det = np.cross(e2, e1)                    # . d
    c_u_d = -np.cross(e2, v1)                   # . d
    c_v_d = -np.cross(v1, e1)                   # . d
    # zero triangles (padding slots) get det=+1, u=-1 via the const
    # feature so every sign test fails
    is_pad = (np.abs(tr).max(axis=1) == 0.0)

    T = rows * leaf_cap
    coef = np.zeros((T, N_QUANT, N_FEATURES), np.float64)
    coef[:, 0, 0:3] = c_det
    coef[:, 0, 9] = np.where(is_pad, 1.0, 0.0)
    coef[:, 1, 0:3] = c_u_d
    coef[:, 1, 3:6] = e2
    coef[:, 1, 9] = np.where(is_pad, -1.0, 0.0)
    coef[:, 2, 0:3] = c_v_d
    coef[:, 2, 3:6] = -e1
    coef[:, 3] = coef[:, 0] - coef[:, 1] - coef[:, 2]   # w = det - u - v
    coef[:, 4, 6:9] = n
    coef[:, 4, 9] = -(n * v1).sum(axis=1)

    # (T, 5, 16) -> (n_groups, 16, 5, QUANT_PAD): feature-major sublanes,
    # quantity-blocked lanes
    out = np.zeros((n_groups, N_FEATURES, N_QUANT, QUANT_PAD), np.float32)
    cg = coef.reshape(n_groups, g_tris, N_QUANT, N_FEATURES)
    out[:, :, :, :g_tris] = cg.transpose(0, 3, 2, 1).astype(np.float32)
    # pad columns past the real 56: det=+1, u=-1 on the const feature
    out[:, 9, 0, g_tris:] = 1.0
    out[:, 9, 1, g_tris:] = -1.0
    return out.reshape(n_groups * N_FEATURES, N_QUANT * QUANT_PAD)


@functools.partial(jax.jit, static_argnames=("leaf_cap", "group_rows"))
def coef_table_device(tri_rows, center, leaf_cap: int = 14,
                      group_rows: int = 4):
    """XLA twin of coef_table_np (f32 arithmetic; tested against the f64
    NumPy build to ~1e-6 relative)."""
    rows = tri_rows.shape[0]
    n_groups = rows // group_rows
    g_tris = group_rows * leaf_cap
    tr = tri_rows[:, : 9 * leaf_cap].reshape(rows * leaf_cap, 9)
    v1 = tr[:, 0:3] - jnp.asarray(center, jnp.float32)[None, :]
    e1 = tr[:, 3:6]
    e2 = tr[:, 6:9]
    n = jnp.cross(e1, e2)
    is_pad = (jnp.abs(tr).max(axis=1) == 0.0)

    T = rows * leaf_cap
    coef = jnp.zeros((T, N_QUANT, N_FEATURES), jnp.float32)
    coef = coef.at[:, 0, 0:3].set(jnp.cross(e2, e1))
    coef = coef.at[:, 0, 9].set(jnp.where(is_pad, 1.0, 0.0))
    coef = coef.at[:, 1, 0:3].set(-jnp.cross(e2, v1))
    coef = coef.at[:, 1, 3:6].set(e2)
    coef = coef.at[:, 1, 9].set(jnp.where(is_pad, -1.0, 0.0))
    coef = coef.at[:, 2, 0:3].set(-jnp.cross(v1, e1))
    coef = coef.at[:, 2, 3:6].set(-e1)
    coef = coef.at[:, 3].set(coef[:, 0] - coef[:, 1] - coef[:, 2])
    coef = coef.at[:, 4, 6:9].set(n)
    coef = coef.at[:, 4, 9].set(-(n * v1).sum(axis=1))

    out = jnp.zeros((n_groups, N_FEATURES, N_QUANT, QUANT_PAD), jnp.float32)
    cg = coef.reshape(n_groups, g_tris, N_QUANT, N_FEATURES)
    out = out.at[:, :, :, :g_tris].set(cg.transpose(0, 3, 2, 1))
    out = out.at[:, 9, 0, g_tris:].set(1.0)
    out = out.at[:, 9, 1, g_tris:].set(-1.0)
    return out.reshape(n_groups * N_FEATURES, N_QUANT * QUANT_PAD)


def candidates_np(tri_rows, o, d, center, leaf_cap=14):
    """f64 NumPy oracle: (det, u_num, v_num, t_num) per (ray, tri) via the
    DIRECT Moller-Trumbore forms, for validating the expansion."""
    tr = tri_rows[:, : 9 * leaf_cap].reshape(-1, 9).astype(np.float64)
    v1, e1, e2 = tr[:, 0:3], tr[:, 3:6], tr[:, 6:9]
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    p = np.cross(d[:, None, :], e2[None, :, :])
    det = (e1[None] * p).sum(-1)
    s = o[:, None, :] - v1[None, :, :]
    u = (s * p).sum(-1)
    q = np.cross(s, e1[None, :, :])
    v = (d[:, None, :] * q).sum(-1)
    t = (e2[None] * q).sum(-1)
    return det, u, v, t
