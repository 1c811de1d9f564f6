"""Microbenchmark: VPU broadcast row test vs MXU-formulated group test.

VERDICT r4 #1: measure Moller-Trumbore as matmuls (kernels/mxu_tri.py) on
the actual hardware before integrating. Two Pallas kernels with identical
semantics — closest-hit of a 1024-ray block against G gated groups of 56
leaf-packed triangles:

  A (vpu):  the production _streamed_kernel test_row path — 9 scalar
            broadcast loads + ~55 VPU ops per triangle, ratio-carried t.
  B (mxu):  per ray-row (16-feature) x (coef 16 x 320) dot_general on the
            MXU + sign-test validity + winner reduction on the VPU.

Reports us/group/block for each at several rep counts, plus max |dt| and
idx mismatch fraction for correctness.

Run: python tools/diag_mxu.py [n_groups] [reps]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer0_tpu.kernels import mxu_tri

EPS = np.float32(1e-10)
BIG = np.float32(1e33)
LANES = 128


def _vpu_kernel(tris_ref, o_ref, d_ref, tin_ref,
                t_ref, u_ref, v_ref, idx_ref, td_ref,
                *, n_groups, reps, leaf_cap=14, group_rows=4):
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    t_ref[...] = tin_ref[...]
    td_ref[...] = jnp.ones_like(td_ref)
    u_ref[...] = jnp.zeros_like(u_ref)
    v_ref[...] = jnp.zeros_like(v_ref)
    idx_ref[...] = jnp.full_like(idx_ref, -1)

    def test_row(row):
        for j in range(leaf_cap):
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
                (adet >= EPS)
                & (uc >= 0.0)
                & (vc >= 0.0)
                & (uc + vc <= adet)
                & (tc > EPS * adet)
                & (tc * td_ref[...] < t_ref[...] * adet)
            )
            t_ref[...] = jnp.where(ok, tc, t_ref[...])
            td_ref[...] = jnp.where(ok, adet, td_ref[...])
            u_ref[...] = jnp.where(ok, uc, u_ref[...])
            v_ref[...] = jnp.where(ok, vc, v_ref[...])
            idx_ref[...] = jnp.where(ok, row * leaf_cap + j, idx_ref[...])

    def rep_body(r, _):
        def g_body(g, _):
            for dr in range(group_rows):
                test_row(group_rows * g + dr)
            return 0
        jax.lax.fori_loop(0, n_groups, g_body, 0)
        return 0

    jax.lax.fori_loop(0, reps, rep_body, 0)
    inv = 1.0 / td_ref[...]
    t_ref[...] = t_ref[...] * inv
    u_ref[...] = u_ref[...] * inv
    v_ref[...] = v_ref[...] * inv


def _mxu_big_kernel(coef_ref, f_ref, tin_ref,
                    t_ref, u_ref, v_ref, idx_ref,
                    *, n_groups, reps, precision=None, mm_only=False,
                    leaf_cap=14, group_rows=4):
    """Single (16, 5*QP) x (16, 1024) dot_general per group; ray state
    carried in LANE layout (1, 1024) rows — one matmul dispatch instead
    of 8, commit at (56, 1024) width. mm_only=True skips validity/commit
    (sums the candidates) to isolate the matmul cost."""
    QP = mxu_tri.QUANT_PAD
    NF = mxu_tri.N_FEATURES
    g_tris = group_rows * leaf_cap
    R = f_ref.shape[1]
    t_ref[0] = tin_ref[0]
    u_ref[0] = jnp.zeros_like(u_ref[0])
    v_ref[0] = jnp.zeros_like(v_ref[0])
    idx_ref[0] = jnp.full_like(idx_ref[0], -1)
    ji = jax.lax.broadcasted_iota(jnp.int32, (g_tris, R), 0)
    feats = f_ref[...]

    def do_group(g):
        coef = coef_ref[pl.ds(g * NF, NF), :]        # (16, 5*QP)
        out = jax.lax.dot_general(
            coef, feats, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                      # (5*QP, R)
        if mm_only:
            t_ref[0] = t_ref[0] + out[0:1, :]
            return
        D = out[0 * QP:0 * QP + g_tris]
        U = out[1 * QP:1 * QP + g_tris]
        V = out[2 * QP:2 * QP + g_tris]
        W = out[3 * QP:3 * QP + g_tris]
        Tn = out[4 * QP:4 * QP + g_tris]
        mn = jnp.minimum(jnp.minimum(D, U), jnp.minimum(V, W))
        mx = jnp.maximum(jnp.maximum(D, U), jnp.maximum(V, W))
        oksign = (mn > 0.0) | (mx < 0.0)
        aD = jnp.abs(D)
        rD = 1.0 / jnp.where(D == 0.0, jnp.float32(1.0), D)
        tval = Tn * rD
        tb = t_ref[0]                                 # (1, R)
        ok = oksign & (aD >= EPS) & (tval > EPS) & (tval < tb)
        tsel = jnp.where(ok, tval, BIG)
        wt = jnp.min(tsel, axis=0, keepdims=True)
        upd = wt < tb
        match = ok & (tsel <= wt)
        wj = jnp.min(jnp.where(match, ji, jnp.int32(1 << 30)),
                     axis=0, keepdims=True)
        sel = match & (ji == wj)
        wu = jnp.min(jnp.where(sel, U * rD, BIG), axis=0, keepdims=True)
        wv = jnp.min(jnp.where(sel, V * rD, BIG), axis=0, keepdims=True)
        t_ref[0] = jnp.where(upd, wt, tb)
        u_ref[0] = jnp.where(upd, wu, u_ref[0])
        v_ref[0] = jnp.where(upd, wv, v_ref[0])
        idx_ref[0] = jnp.where(upd, wj + g * g_tris, idx_ref[0])

    def rep_body(r, _):
        def g_body(g, _):
            do_group(g)
            return 0
        jax.lax.fori_loop(0, n_groups, g_body, 0)
        return 0

    jax.lax.fori_loop(0, reps, rep_body, 0)


def _mxu_split3_kernel(ch_ref, cl_ref, fh_ref, fl_ref, tin_ref,
                       t_ref, u_ref, v_ref, idx_ref,
                       *, n_groups, reps, leaf_cap=14, group_rows=4):
    """Manual 3-pass bf16 decomposition: coef = ch + cl, feats = fh + fl
    (each bf16); out ~= ch@fh + ch@fl + cl@fh at DEFAULT (single-pass)
    precision — ~16-bit effective mantissa, 3 passes instead of HIGHEST's
    6. The middle point of the precision-performance frontier."""
    QP = mxu_tri.QUANT_PAD
    NF = mxu_tri.N_FEATURES
    g_tris = group_rows * leaf_cap
    R = fh_ref.shape[1]
    t_ref[0] = tin_ref[0]
    u_ref[0] = jnp.zeros_like(u_ref[0])
    v_ref[0] = jnp.zeros_like(v_ref[0])
    idx_ref[0] = jnp.full_like(idx_ref[0], -1)
    ji = jax.lax.broadcasted_iota(jnp.int32, (g_tris, R), 0)
    fh = fh_ref[...]
    fl = fl_ref[...]

    def do_group(g):
        ch = ch_ref[pl.ds(g * NF, NF), :]
        cl = cl_ref[pl.ds(g * NF, NF), :]
        dn = (((0,), (0,)), ((), ()))
        out = (jax.lax.dot_general(ch, fh, dn,
                                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(ch, fl, dn,
                                     preferred_element_type=jnp.float32)
               + jax.lax.dot_general(cl, fh, dn,
                                     preferred_element_type=jnp.float32))
        D = out[0 * QP:0 * QP + g_tris]
        U = out[1 * QP:1 * QP + g_tris]
        V = out[2 * QP:2 * QP + g_tris]
        W = out[3 * QP:3 * QP + g_tris]
        Tn = out[4 * QP:4 * QP + g_tris]
        mn = jnp.minimum(jnp.minimum(D, U), jnp.minimum(V, W))
        mx = jnp.maximum(jnp.maximum(D, U), jnp.maximum(V, W))
        oksign = (mn > 0.0) | (mx < 0.0)
        aD = jnp.abs(D)
        rD = 1.0 / jnp.where(D == 0.0, jnp.float32(1.0), D)
        tval = Tn * rD
        tb = t_ref[0]
        ok = oksign & (aD >= EPS) & (tval > EPS) & (tval < tb)
        tsel = jnp.where(ok, tval, BIG)
        wt = jnp.min(tsel, axis=0, keepdims=True)
        upd = wt < tb
        match = ok & (tsel <= wt)
        wj = jnp.min(jnp.where(match, ji, jnp.int32(1 << 30)),
                     axis=0, keepdims=True)
        sel = match & (ji == wj)
        wu = jnp.min(jnp.where(sel, U * rD, BIG), axis=0, keepdims=True)
        wv = jnp.min(jnp.where(sel, V * rD, BIG), axis=0, keepdims=True)
        t_ref[0] = jnp.where(upd, wt, tb)
        u_ref[0] = jnp.where(upd, wu, u_ref[0])
        v_ref[0] = jnp.where(upd, wv, v_ref[0])
        idx_ref[0] = jnp.where(upd, wj + g * g_tris, idx_ref[0])

    def rep_body(r, _):
        def g_body(g, _):
            do_group(g)
            return 0
        jax.lax.fori_loop(0, n_groups, g_body, 0)
        return 0

    jax.lax.fori_loop(0, reps, rep_body, 0)


def _prefilter_kernel(ch_ref, ca_ref, tris_ref, f_ref, fa_ref,
                      o_ref, d_ref, tin_ref,
                      t_ref, u_ref, v_ref, idx_ref, td_ref,
                      *, n_groups, reps, leaf_cap=14, group_rows=4):
    """VERDICT r4 #1's fallback composition: single-pass bf16 matmul as a
    CONSERVATIVE group prefilter (error margins from a second magnitude
    matmul |coef| @ |f|), with the PRODUCTION (8, 128)-layout VPU row test
    run only for surviving groups. Costs one vector->scalar sync per gated
    group — the quantity the r4 design-4 ledger prices at ~0.65 us."""
    QP = mxu_tri.QUANT_PAD
    NF = mxu_tri.N_FEATURES
    g_tris = group_rows * leaf_cap
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    t_ref[...] = tin_ref[...]
    td_ref[...] = jnp.ones_like(td_ref)
    u_ref[...] = jnp.zeros_like(u_ref)
    v_ref[...] = jnp.zeros_like(v_ref)
    idx_ref[...] = jnp.full_like(idx_ref, -1)
    fh = f_ref[...].astype(jnp.bfloat16)
    fa = fa_ref[...].astype(jnp.bfloat16)
    MARGIN = jnp.float32(2.0 ** -6)   # >= bf16 eps * dot-length slack

    def test_row(row):
        for j in range(leaf_cap):
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
                (adet >= EPS)
                & (uc >= 0.0)
                & (vc >= 0.0)
                & (uc + vc <= adet)
                & (tc > EPS * adet)
                & (tc * td_ref[...] < t_ref[...] * adet)
            )
            t_ref[...] = jnp.where(ok, tc, t_ref[...])
            td_ref[...] = jnp.where(ok, adet, td_ref[...])
            u_ref[...] = jnp.where(ok, uc, u_ref[...])
            v_ref[...] = jnp.where(ok, vc, v_ref[...])
            idx_ref[...] = jnp.where(ok, row * leaf_cap + j, idx_ref[...])

    def do_group(g):
        ch = ch_ref[pl.ds(g * NF, NF), :]
        ca = ca_ref[pl.ds(g * NF, NF), :]
        dn = (((0,), (0,)), ((), ()))
        out = jax.lax.dot_general(
            ch, fh, dn, preferred_element_type=jnp.float32)
        mag = jax.lax.dot_general(
            ca, fa, dn, preferred_element_type=jnp.float32)
        D = out[0 * QP:0 * QP + g_tris]
        U = out[1 * QP:1 * QP + g_tris]
        V = out[2 * QP:2 * QP + g_tris]
        W = out[3 * QP:3 * QP + g_tris]
        mD = mag[0 * QP:0 * QP + g_tris] * MARGIN
        mU = mag[1 * QP:1 * QP + g_tris] * MARGIN
        mV = mag[2 * QP:2 * QP + g_tris] * MARGIN
        mW = mag[3 * QP:3 * QP + g_tris] * MARGIN
        # conservative "all four could share a sign" test
        pos_ok = ((D > -mD) & (U > -mU) & (V > -mV) & (W > -mW))
        neg_ok = ((D < mD) & (U < mU) & (V < mV) & (W < mW))
        plausible = pos_ok | neg_ok
        want = jnp.max(plausible.astype(jnp.int32))

        @pl.when(want > 0)
        def _():
            for dr in range(group_rows):
                test_row(group_rows * g + dr)

    def rep_body(r, _):
        def g_body(g, _):
            do_group(g)
            return 0
        jax.lax.fori_loop(0, n_groups, g_body, 0)
        return 0

    jax.lax.fori_loop(0, reps, rep_body, 0)
    inv = 1.0 / td_ref[...]
    t_ref[...] = t_ref[...] * inv
    u_ref[...] = u_ref[...] * inv
    v_ref[...] = v_ref[...] * inv


@functools.partial(jax.jit, static_argnames=("n_groups", "reps"))
def run_prefilter(coef, tris, feats, o_b, d_b, t_b, *, n_groups, reps):
    ch = coef.astype(jnp.bfloat16)
    ca = jnp.abs(coef).astype(jnp.bfloat16)
    fa = jnp.abs(feats)
    nb = o_b.shape[1] // 8
    shape = (o_b.shape[1], LANES)
    t, u, v, idx = pl.pallas_call(
        functools.partial(_prefilter_kernel, n_groups=n_groups, reps=reps),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((mxu_tri.N_FEATURES, 8 * LANES), lambda i: (0, i)),
            pl.BlockSpec((mxu_tri.N_FEATURES, 8 * LANES), lambda i: (0, i)),
            pl.BlockSpec((3, 8, LANES), lambda i: (0, i, 0)),
            pl.BlockSpec((3, 8, LANES), lambda i: (0, i, 0)),
            pl.BlockSpec((8, LANES), lambda i: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((8, LANES), lambda i: (i, 0))] * 4,
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((8, LANES), jnp.float32)],
    )(ch, ca, tris, feats, fa, o_b, d_b, t_b)
    return t, u, v, idx


def _split_bf16(x):
    """x (f32) -> (hi, lo) bf16 with hi + lo ~= x (16-bit mantissa)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


@functools.partial(jax.jit, static_argnames=("n_groups", "reps"))
def run_mxu_split3(coef, feats, t_b1, *, n_groups, reps):
    ch, cl = _split_bf16(coef)
    fh, fl = _split_bf16(feats)
    nb = t_b1.shape[0]
    shape = (nb, 1, 8 * LANES)
    t, u, v, idx = pl.pallas_call(
        functools.partial(_mxu_split3_kernel, n_groups=n_groups,
                          reps=reps),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((mxu_tri.N_FEATURES, 8 * LANES), lambda i: (0, i)),
            pl.BlockSpec((mxu_tri.N_FEATURES, 8 * LANES), lambda i: (0, i)),
            pl.BlockSpec((1, 1, 8 * LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, 1, 8 * LANES),
                                lambda i: (i, 0, 0))] * 4,
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
        ],
    )(ch, cl, fh, fl, t_b1)
    return t, u, v, idx


def _mxu_kernel(coef_ref, f_ref, tin_ref,
                t_ref, u_ref, v_ref, idx_ref,
                *, n_groups, reps, block_rows=8, precision=None,
                leaf_cap=14, group_rows=4):
    QP = mxu_tri.QUANT_PAD
    NF = mxu_tri.N_FEATURES
    g_tris = group_rows * leaf_cap
    t_ref[...] = tin_ref[...]
    u_ref[...] = jnp.zeros_like(u_ref)
    v_ref[...] = jnp.zeros_like(v_ref)
    idx_ref[...] = jnp.full_like(idx_ref, -1)
    ji = jax.lax.broadcasted_iota(jnp.int32, (g_tris, LANES), 0)

    def do_group(g):
        coef = coef_ref[pl.ds(g * NF, NF), :]        # (16, 5*QP)
        for s in range(block_rows):
            fs = f_ref[:, 128 * s:128 * (s + 1)]     # (16, 128)
            out = jax.lax.dot_general(
                coef, fs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)                  # (5*QP, 128)
            D = out[0 * QP:0 * QP + g_tris]
            U = out[1 * QP:1 * QP + g_tris]
            V = out[2 * QP:2 * QP + g_tris]
            W = out[3 * QP:3 * QP + g_tris]
            Tn = out[4 * QP:4 * QP + g_tris]
            mn = jnp.minimum(jnp.minimum(D, U), jnp.minimum(V, W))
            mx = jnp.maximum(jnp.maximum(D, U), jnp.maximum(V, W))
            oksign = (mn > 0.0) | (mx < 0.0)
            aD = jnp.abs(D)
            rD = 1.0 / jnp.where(D == 0.0, jnp.float32(1.0), D)
            tval = Tn * rD
            tb = t_ref[s:s + 1, :]                    # (1, 128)
            ok = oksign & (aD >= EPS) & (tval > EPS) & (tval < tb)
            tsel = jnp.where(ok, tval, BIG)
            wt = jnp.min(tsel, axis=0, keepdims=True)
            upd = wt < tb
            match = ok & (tsel <= wt)
            wj = jnp.min(jnp.where(match, ji, jnp.int32(1 << 30)),
                         axis=0, keepdims=True)
            sel = match & (ji == wj)
            wu = jnp.min(jnp.where(sel, U * rD, BIG), axis=0, keepdims=True)
            wv = jnp.min(jnp.where(sel, V * rD, BIG), axis=0, keepdims=True)
            t_ref[s:s + 1, :] = jnp.where(upd, wt, tb)
            u_ref[s:s + 1, :] = jnp.where(upd, wu, u_ref[s:s + 1, :])
            v_ref[s:s + 1, :] = jnp.where(upd, wv, v_ref[s:s + 1, :])
            idx_ref[s:s + 1, :] = jnp.where(
                upd, wj + g * g_tris, idx_ref[s:s + 1, :])

    def rep_body(r, _):
        def g_body(g, _):
            do_group(g)
            return 0
        jax.lax.fori_loop(0, n_groups, g_body, 0)
        return 0

    jax.lax.fori_loop(0, reps, rep_body, 0)


@functools.partial(jax.jit, static_argnames=("n_groups", "reps"))
def run_vpu(tris, o_b, d_b, t_b, *, n_groups, reps):
    nb = o_b.shape[1] // 8
    shape = (o_b.shape[1], LANES)
    t, u, v, idx = pl.pallas_call(
        functools.partial(_vpu_kernel, n_groups=n_groups, reps=reps),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 8, LANES), lambda i: (0, i, 0)),
            pl.BlockSpec((3, 8, LANES), lambda i: (0, i, 0)),
            pl.BlockSpec((8, LANES), lambda i: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((8, LANES), lambda i: (i, 0))] * 4,
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((8, LANES), jnp.float32)],
    )(tris, o_b, d_b, t_b)
    return t, u, v, idx


@functools.partial(jax.jit,
                   static_argnames=("n_groups", "reps", "prec", "mm_only"))
def run_mxu_big(coef, feats, t_b1, *, n_groups, reps, prec=None,
                mm_only=False):
    """Lane-layout state: t_b1 is (n_blocks, 1, 1024)."""
    nb = t_b1.shape[0]
    shape = (nb, 1, 8 * LANES)
    t, u, v, idx = pl.pallas_call(
        functools.partial(_mxu_big_kernel, n_groups=n_groups, reps=reps,
                          precision=prec, mm_only=mm_only),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((mxu_tri.N_FEATURES, 8 * LANES), lambda i: (0, i)),
            pl.BlockSpec((1, 1, 8 * LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, 1, 8 * LANES), lambda i: (i, 0, 0))] * 4,
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
        ],
    )(coef, feats, t_b1)
    return t, u, v, idx


@functools.partial(jax.jit, static_argnames=("n_groups", "reps", "prec"))
def run_mxu(coef, feats, t_b, *, n_groups, reps, prec=None):
    nb = t_b.shape[0] // 8
    shape = (t_b.shape[0], LANES)
    t, u, v, idx = pl.pallas_call(
        functools.partial(_mxu_kernel, n_groups=n_groups, reps=reps,
                          precision=prec),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((mxu_tri.N_FEATURES, 8 * LANES), lambda i: (0, i)),
            pl.BlockSpec((8, LANES), lambda i: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((8, LANES), lambda i: (i, 0))] * 4,
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
        ],
    )(coef, feats, t_b)
    return t, u, v, idx


def main():
    n_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_blocks = 16
    rng = np.random.RandomState(0)
    rows = n_groups * 4
    # terrain-ish triangles in a [0,100]^3 world, offset from origin
    v1 = rng.uniform(100, 200, (rows * 14, 3)).astype(np.float32)
    e1 = rng.uniform(-2, 2, (rows * 14, 3)).astype(np.float32)
    e2 = rng.uniform(-2, 2, (rows * 14, 3)).astype(np.float32)
    tri = np.concatenate([v1, e1, e2], 1)
    tri[::37] = 0.0   # sprinkle padding slots
    tris = np.zeros((rows, 128), np.float32)
    tris[:, :126] = tri.reshape(rows, 126)

    B = n_blocks * 1024
    o = rng.uniform(100, 200, (B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o3, d3 = o.T.copy(), d.T.copy()
    t_init = np.full(B, 1e30, np.float32)

    center = np.array([150.0, 150.0, 150.0], np.float32)
    coef = mxu_tri.coef_table_np(tris, center)
    feats = np.asarray(mxu_tri.ray_features(
        jnp.asarray(o3), jnp.asarray(d3), center))

    o_b = o3.reshape(3, B // LANES, LANES)
    d_b = d3.reshape(3, B // LANES, LANES)
    t_b = t_init.reshape(B // LANES, LANES)

    salt = [0.0]

    def bench(fn, label):
        """Difference-method timing (reps vs 4*reps) with a fresh t_init
        scale per call: the axon tunnel caches (program, args) -> result
        across calls, so identical args return without executing, and the
        ~39 ms fetch round trip swamps single dispatches (PERF.md)."""
        def timed(r):
            ts = []
            outs = fn(r, 1.0)
            _ = float(jnp.sum(outs[0]))
            for _i in range(3):
                salt[0] += 1e-6
                sc = 1.0 + salt[0]
                t0 = time.perf_counter()
                outs = fn(r, sc)
                _ = float(jnp.sum(outs[0]))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        d1 = timed(reps)
        d4 = timed(reps * 4)
        per_group = (d4 - d1) / (3 * reps) / (n_blocks * n_groups) * 1e6
        print(f"{label:28s} marginal={d4-d1:8.3f} s  "
              f"us/group/block={per_group:7.3f}")
        return fn(reps, 1.0)

    a = bench(lambda r, sc: run_vpu(tris, o_b, d_b, t_b * np.float32(sc),
                                    n_groups=n_groups, reps=r),
              "A vpu rows")
    def check(b, reorder=False):
        ta, tb_ = np.asarray(a[0]), np.asarray(b[0])
        ia, ib = np.asarray(a[3]), np.asarray(b[3])
        if reorder:   # lane-layout (nb, 1024) -> (nb*8, 128) row layout
            tb_ = tb_.reshape(n_blocks, 8, LANES).reshape(-1, LANES)
            ib = ib.reshape(n_blocks, 8, LANES).reshape(-1, LANES)
        hit = ia >= 0
        dt_ = np.abs(ta - tb_)[hit & (ib >= 0)]
        mism = (ia != ib).mean()
        print(f"   hits A={hit.mean()*100:.1f}%  idx mismatch="
              f"{mism*100:.3f}%  max|dt| on common hits="
              f"{dt_.max() if dt_.size else 0:.3e}")

    t_b1 = t_init.reshape(n_blocks, 1, 8 * LANES)
    # Mosaic supports only DEFAULT (1-pass bf16) and HIGHEST (bf16x6)
    for prec in (jax.lax.Precision.HIGHEST, None):
        b = bench(lambda r, sc: run_mxu(coef, feats, t_b * np.float32(sc),
                                        n_groups=n_groups, reps=r,
                                        prec=prec),
                  f"B mxu rows8 ({prec})")
        check(b)
        bench(lambda r, sc: run_mxu_big(coef, feats, t_b1 * np.float32(sc),
                                        n_groups=n_groups,
                                        reps=r, prec=prec, mm_only=True),
              f"C mxu big mm-only ({prec})")
        c = bench(lambda r, sc: run_mxu_big(coef, feats,
                                            t_b1 * np.float32(sc),
                                            n_groups=n_groups, reps=r,
                                            prec=prec),
                  f"C mxu big ({prec})")
        check(c, reorder=True)

    d = bench(lambda r, sc: run_mxu_split3(coef, feats,
                                           t_b1 * np.float32(sc),
                                           n_groups=n_groups, reps=r),
              "D mxu split3 (manual bf16x3)")
    check(d, reorder=True)

    # E needs the triangle table in the recentered frame the features use
    tris_c = tris.copy()
    for j in range(14):
        tris_c[:, 9 * j:9 * j + 3] -= center[None, :]
    o_bc = (o3 - center[:, None]).reshape(3, B // LANES, LANES)
    e = bench(lambda r, sc: run_prefilter(coef, tris_c, feats, o_bc, d_b,
                                          t_b * np.float32(sc),
                                          n_groups=n_groups, reps=r),
              "E bf16 prefilter + vpu")
    check(e)


if __name__ == "__main__":
    main()
