"""Fused path-trace megakernel: the whole bounce loop in ONE Pallas launch.

Round-2 profiling (PERF.md) showed the per-bounce pipeline spending ~65 ms
of a 130 ms frame in ~1,700 small XLA elementwise fusions (lobe sampling,
refraction-stack shifts, transport wheres) plus ~15 ms of layout glue, while
the Pallas traversal kernel idled at ~505 Mrays/s raw. The fix is
architectural: run the ENTIRE `trace` loop (frag.glsl:810-882) inside the
traversal kernel, so all per-bounce state lives in registers/VMEM and HBM
sees only primary rays in and radiance out.

Per grid step (one ray block, RS x 128 lanes):
  while bounce < MAX_BOUNCES and any ray in the block is alive:
    1. traversal: brute leaf-row loop (kernels/wavefront._brute_kernel
       shape) that commits t AND the interpolated shading normal + material
       id at hit time -- the attribute row (10 floats/tri: n1,n2,n3,mat) is
       scalar-loaded next to the geometry row, so no post-hoc gather is
       needed. Flat triangles store the face normal in all three slots, so
       interpolation reproduces it exactly (w+u+v = 1).
    2. analytic primitives: ellipsoid quadrics and implicit-marcher merges
       with per-primitive scalar parameters (rotation matrices precomputed
       host-side); implicit fn ids are STATIC per slot, so each scene
       compiles only its own surfaces (frag.glsl:578-631 semantics).
    3. material decode: select-chain over the (M, 48) record table --
       the TPU-native replacement for newMtl's per-ray fetch
       (frag.glsl:170-209); M is small and static.
    4. shade/sample: normal flip, refraction-index stack push/pop
       (frag.glsl:832-841), Schlick Fresnel + branchless chooseRay
       (frag.glsl:726-809) with the counted PCG RNG advanced in-kernel
       (bit-exact vs core/rng.py: the uint32->f32 conversion is done as an
       exact hi/lo 16-bit split because Mosaic lacks the direct cast),
       Beer-Lambert absorption and throughput/emission bookkeeping
       (frag.glsl:847-874).
  Sky on miss is DEFERRED: the kernel returns each ray's final direction
  and its throughput at miss time; the caller evaluates the equirect sky
  texture once per sample outside (textures are the one thing a TPU kernel
  cannot gather).

Termination is per BLOCK: the TPU grid runs blocks sequentially, so a block
whose rays all died skips its remaining bounces entirely -- this replaces
explicit alive-ray compaction (SURVEY.md §7) with zero data movement.

The per-sample loop stays outside (render/renderer.render_rays): per-pixel
RNG streams carry through the kernel boundary, so draw sequences stay
bit-identical to the reference's per-pixel stream (frag.glsl:896).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..shade.implicits import _BUILDERS

LANES = 128
# Sample-axis chunk of the whole-frame path (render_fused_frame): bounds
# the per-launch miss-slab HBM footprint; full chunks roll through one
# lax.scan body so program size is O(1) in samples_per_frame
SPP_CHUNK = 32
# Chunk cap for the run-ahead refill schedule: the refill kernel keeps the
# whole chunk's miss banks resident in VMEM and writes them by unrolled
# per-sample masks, so bank count trades against per-iteration mask cost
REFILL_SPP_CHUNK = 16
MISS = np.float32(1e30)
EPSILON = np.float32(1e-10)
AIR_IOR = np.float32(1.0029)  # frag.glsl:816
_INV32 = np.float32(1.0) / np.float32(4294967295.0)  # frag.glsl:693
# attribute row layout: 10 floats per tri slot (n1 xyz, n2 xyz, n3 xyz, mat)
ATTR_STRIDE = 10
# UV/tangent row layout (texture-mapped scenes only): uv1, uv2, uv3 (2 each),
# raw UV-space tangent (3), has_uv flag — resolved by committed id like attrs
UVT_STRIDE = 10
UVT_CAP = 12
# In-kernel material-map limits. Image rows wider than 42 texels
# (3 channels x 128 lanes) span rows_per_y table rows — the same packing
# the 128-wide sky already walks — so the cap is the per-bounce
# weight-accumulation COST (O(W) vector ops per windowed row), not the
# layout. Measured on-chip (tools/diag_bigmap, PERF.md round-5): the
# factorized walk beats the ~4.5 Mrays/s whole-scene XLA demotion by
# 3-10x up to 128x128 maps; past the budget the XLA mapMtl path
# (scene/texture.sample_bilinear) takes over.
MAP_MAX_H = 128
MAP_MAX_W = 128
MAP_TEXEL_BUDGET = 32768
# The sky table may be wider (image rows span several table rows) and is
# sampled once per MISS, not per material channel — a larger budget holds.
# 16384 texels = a 64x256 or 128x128 equirect map, 192 KB of VMEM.
SKY_TEXEL_BUDGET = 16384

# dense fused-table packing (scene/packing.py): triangles at 14/row
# (9 floats each), attributes at 12/row (ATTR_STRIDE floats each) — the
# two tables have independent densities because attributes resolve by
# committed triangle id AFTER the intersection loop, not at commit time
TRI_CAP = 14
ATTR_CAP = 12
# Largest triangle count that takes the fused-brute path: the kernel tests
# every triangle against every ray block per bounce, so the cutoff is a
# compute budget, not a VMEM one (2048 tris = 147 rows = ~9.4 KB VMEM).
# Bigger scenes traverse the packet/streamed BVH kernels instead.
FUSED_MAX_TRIS = 2048

# Conservative LOCAL-frame bounding radii of the bounded implicit surfaces
# (shade/implicits.py formulas): the fused marcher skips whole ray blocks
# whose rays all miss the bounding sphere — one vector->scalar sync buys
# skipping a ~6k-op march (measured 36% of the config-4 frame). Unbounded
# surfaces (2 waves, 4 tractor beam, 5 golden-ratio) march unconditionally.
IMP_BOUND_RADIUS = {1: 4.0, 3: 2.0, 6: 18.0, 7: 2.6, 8: 8.0, 9: 8.5,
                    10: 9.5}

_MASK = 0xFFFFFFFF
_MUL = 747796405
_INC = 2891336453
_MIX = np.uint32(277803737)


def _affine_consts(n: int):
    """(A, C) with state_n = A*state + C mod 2^32 (core/rng.advance)."""
    a, c = 1, 0
    mul, inc = _MUL, _INC
    k = n
    while k:
        if k & 1:
            a, c = (a * mul) & _MASK, (c * mul + inc) & _MASK
        inc = ((mul + 1) * inc) & _MASK
        mul = (mul * mul) & _MASK
        k >>= 1
    return np.uint32(a), np.uint32(c)


def _advance(state, n: int):
    a, c = _affine_consts(n)
    return state * a + c


def _extract(state):
    """PCG output permutation (core/rng._extract, frag.glsl:686-691)."""
    shift = (state >> jnp.uint32(28)) + jnp.uint32(4)
    result = ((state >> shift) ^ state) * _MIX
    return (result >> jnp.uint32(22)) ^ result


def _u32_to_f32(bits):
    """Bit-exact uint32 -> float32 (Mosaic lacks the cast). Split into two
    exact 16-bit halves; hi*65536 is exact (16-bit mantissa scaled by a
    power of two), so the single rounding happens in the final add --
    identical to the IEEE round-to-nearest convert XLA emits."""
    hi = pltpu.bitcast(bits >> jnp.uint32(16), jnp.int32).astype(jnp.float32)
    lo = pltpu.bitcast(bits & jnp.uint32(0xFFFF), jnp.int32).astype(
        jnp.float32)
    return hi * jnp.float32(65536.0) + lo


def _peek_u(state, off: int):
    """Uniform `off` draws ahead without consuming (core/rng.peek_uniform)."""
    return _u32_to_f32(_extract(_advance(state, off))) * _INV32


def _normal_from(u1, u2):
    """Box-Muller (frag.glsl:696-701)."""
    theta = jnp.float32(2.0 * 3.1415926) * u1
    rho = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u2))
    return rho * jnp.cos(theta)


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _mat_field(mats_ref, n_mats, shape, mat, col):
    """newMtl select-chain over the static material count
    (frag.glsl:170-209); mat is a f32 id at VPU block shape."""
    v = jnp.full(shape, mats_ref[0, col])
    for m in range(1, n_mats):
        v = jnp.where(mat == jnp.float32(m), mats_ref[m, col], v)
    return v


# Which Mtl field a mapped channel overrides and whether the sample
# multiplies the base value (Ka/Kd) or replaces it (frag.glsl:210-225)
_MAP_RGB = {"map_Ka": ("Ka", True), "map_Kd": ("Kd", True),
            "map_Ks": ("Ks", False), "map_Ke": ("Ke", False)}
_MAP_SCALAR = {"map_Tr": "Tr", "map_Pm": "Pm", "map_Pr": "Pr",
               "map_Pc": "Pc"}


def _sample_map_block(maps_ref, H, W, base, rows_per_y, channels,
                      tu, tv, need):
    """Bilinear GL_REPEAT/GL_LINEAR sample of ONE packed texel table for
    every lane of the block, as a factorized weight accumulation: per-lane
    wrapped tap coordinates (x0,x1,y0,y1 + fractions) turn into per-column
    weights wx[j] (two nonzero per lane) and per-row weights wy, and the
    texel loop accumulates wy*wx[j]*texel — exactly the 4-tap bilinear
    result (all other texels contribute wy*wx == 0.0), just without a
    per-lane gather, which Mosaic cannot do. The row loop's trip count
    drops to 0 when NO lane in the block needs this map (`need`), so
    blocks away from mapped materials skip the whole texel walk — one
    scalar sync, same trick as the windowed implicit march. Image row y
    spans `rows_per_y` table rows (scene/packing._pack_texel_rows), so
    maps wider than 42 texels (e.g. the 128-wide sky) address row
    base + y*rows_per_y + (3x+c)//128, lane (3x+c)%128 — all static but y.

    Equivalent of scene/texture.sample_bilinear (frag.glsl:79-81) up to
    summation order. channels=1 accumulates only R (scalar-channel maps)."""
    shape = tu.shape
    f0 = jnp.zeros(shape, jnp.float32)
    n_want = jnp.sum(need.astype(jnp.int32))
    Wf = jnp.float32(W)
    Hf = jnp.float32(H)
    x = tu * Wf - 0.5
    y = tv * Hf - 0.5
    x0 = jnp.floor(x)
    fx = x - x0
    y0 = jnp.floor(y)
    fy = y - y0
    # mod-to-[0,W) in f32: exact for tap indices < 2^23 / extent
    x0w = x0 - jnp.floor(x0 / Wf) * Wf
    x1w = x0w + 1.0
    x1w = jnp.where(x1w >= Wf, x1w - Wf, x1w)
    y0w = y0 - jnp.floor(y0 / Hf) * Hf
    y1w = y0w + 1.0
    y1w = jnp.where(y1w >= Hf, y1w - Hf, y1w)
    wx = []
    for jx in range(W):
        jf = jnp.float32(jx)
        wx.append(jnp.where(x0w == jf, 1.0 - fx, f0)
                  + jnp.where(x1w == jf, fx, f0))
    # Row window: only rows some lane actually taps contribute. A coherent
    # (e.g. primary) block covers a small v-range, so [lo, hi) is a few
    # rows of even a 32-row map; incoherent blocks degrade to the full
    # range. Wrapped tap pairs (y1 < y0 across the seam) force min..max to
    # span the seam — still correct, just unwindowed. 2 scalar syncs, same
    # pattern as the windowed implicit march.
    BIG = jnp.float32(1e9)
    ymin = jnp.min(jnp.where(need, jnp.minimum(y0w, y1w), BIG))
    ymax = jnp.max(jnp.where(need, jnp.maximum(y0w, y1w), -1.0))
    lo = jnp.maximum(jnp.where(n_want > 0, ymin, 0.0),
                     0.0).astype(jnp.int32)
    hi = (jnp.minimum(jnp.where(n_want > 0, ymax, -1.0),
                      jnp.float32(H - 1)) + 1.0).astype(jnp.int32)

    def yrow(yi, acc):
        ar, ag, ab = acc
        yf = yi.astype(jnp.float32)
        wy = (jnp.where(y0w == yf, 1.0 - fy, f0)
              + jnp.where(y1w == yf, fy, f0))
        row = base + yi * rows_per_y
        for jx in range(W):
            wxy = wy * wx[jx]
            o_r = 3 * jx
            ar = ar + wxy * maps_ref[row + o_r // 128, o_r % 128]
            if channels == 3:
                ag = ag + wxy * maps_ref[row + (o_r + 1) // 128,
                                         (o_r + 1) % 128]
                ab = ab + wxy * maps_ref[row + (o_r + 2) // 128,
                                         (o_r + 2) % 128]
        return ar, ag, ab

    ar, ag, ab = jax.lax.fori_loop(lo, hi, yrow, (f0, f0, f0))
    return ar, ag, ab


def _arcsin_poly(x):
    """arcsin for x in [-1, 1] (Mosaic has no asin primitive):
    Abramowitz-Stegun 4.4.45, |err| <= 6.8e-5 rad — ~4e-3 texel on a
    64-row sky, far below the knife-edge golden tolerance."""
    ax = jnp.abs(x)
    p = (jnp.float32(1.5707288)
         + ax * (jnp.float32(-0.2121144)
                 + ax * (jnp.float32(0.0742610)
                         + ax * jnp.float32(-0.0187293))))
    r = jnp.float32(1.5707963) - jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x < 0.0, -r, r)


def _arctan2_poly(z, x):
    """atan2(z, x) in (-pi, pi] via the octant-folded A-S 4.4.49 odd
    polynomial on the [0, 1] ratio, |err| ~ 1e-5 rad. atan2(0, 0) -> 0
    like XLA's."""
    az = jnp.abs(z)
    ax = jnp.abs(x)
    mn = jnp.minimum(az, ax)
    mx = jnp.maximum(az, ax)
    r = mn / jnp.maximum(mx, jnp.float32(1e-30))
    r2 = r * r
    t = r * (jnp.float32(0.9998660)
             + r2 * (jnp.float32(-0.3302995)
                     + r2 * (jnp.float32(0.1801410)
                             + r2 * (jnp.float32(-0.0851330)
                                     + r2 * jnp.float32(0.0208351)))))
    t = jnp.where(az > ax, jnp.float32(1.5707963) - t, t)
    t = jnp.where(x < 0.0, jnp.float32(3.1415927) - t, t)
    return jnp.where(z < 0.0, -t, t)


def _sky_in_kernel(sky_ref, sky_shape, dx, dy, dz, need):
    """Equirect sky sample (frag.glsl:235-242; scene/texture.sky_color
    uv convention, incl. its 3.14159 constants) of the packed fs_sky
    table, windowed + block-gated like every in-kernel map."""
    h, w, rpy = sky_shape
    u = 0.5 + _arctan2_poly(dz, dx) * jnp.float32(1.0 / (2.0 * 3.14159))
    v = 0.5 - _arcsin_poly(jnp.clip(dy, -1.0, 1.0)) * jnp.float32(
        1.0 / 3.14159)
    return _sample_map_block(sky_ref, h, w, 0, rpy, 3, u, v, need)


def _apply_maps_kernel(maps_ref, map_shapes, map_bindings, used, mat,
                       is_hit, texinfo, fields, normal):
    """In-kernel mapMtl + TBN normal mapping (frag.glsl:210-225 +
    shade/mtl.apply_maps/shading_normal semantics). `fields` maps field
    names ("Kd", "Tr", ...) to block arrays (rgb tuples or scalars) — only
    the fields the calling integrator actually reads need be present;
    `used` is the static set of map channels to honor. Samples each
    needed map slot once and applies per-material overrides by the
    committed material id. Returns (fields, normal) updated."""
    tu, tv, twx, twy, twz, uvok = texinfo
    shape = tu.shape
    f0 = jnp.zeros(shape, jnp.float32)
    act = [b for b in map_bindings if b[0] in used]
    if not act:
        return fields, normal
    slot_ch = {}
    for ch, mid, slot in act:
        c = 3 if (ch in _MAP_RGB or ch == "map_norm") else 1
        slot_ch[slot] = max(slot_ch.get(slot, 1), c)
    samples = {}
    for slot in sorted(slot_ch):
        need = jnp.zeros(shape, bool)
        for ch, mid, s2 in act:
            if s2 == slot:
                need = need | (mat == jnp.float32(mid))
        need = need & is_hit
        h, w, base, rpy = map_shapes[slot]
        samples[slot] = _sample_map_block(
            maps_ref, h, w, base, rpy, slot_ch[slot], tu, tv, need)
    fields = dict(fields)
    for ch, mid, slot in act:
        sr, sg, sb = samples[slot]
        meq = mat == jnp.float32(mid)
        if ch in _MAP_RGB:
            name, multiply = _MAP_RGB[ch]
            fr, fg, fb = fields[name]
            if multiply:
                fields[name] = (jnp.where(meq, fr * sr, fr),
                                jnp.where(meq, fg * sg, fg),
                                jnp.where(meq, fb * sb, fb))
            else:
                fields[name] = (jnp.where(meq, sr, fr),
                                jnp.where(meq, sg, fg),
                                jnp.where(meq, sb, fb))
        elif ch in _MAP_SCALAR:
            name = _MAP_SCALAR[ch]
            fields[name] = jnp.where(meq, sr, fields[name])
    norm_binds = [b for b in act if b[0] == "map_norm"]
    if norm_binds:
        nx, ny, nz = normal
        # Gram-Schmidt the raw UV tangent against the committed shading
        # normal + normalize (kernels/intersect.compute_tangent), zeroed
        # for non-UV hits exactly like traverse.surface_sample
        ndt = twx * nx + twy * ny + twz * nz
        gx = twx - nx * ndt
        gy = twy - ny * ndt
        gz = twz - nz * ndt
        gm = jnp.sqrt(gx * gx + gy * gy + gz * gz)
        gx = jnp.where(uvok, gx / gm, f0)
        gy = jnp.where(uvok, gy / gm, f0)
        gz = jnp.where(uvok, gz / gm, f0)
        bx = ny * gz - nz * gy
        by = nz * gx - nx * gz
        bz = nx * gy - ny * gx
        for ch, mid, slot in norm_binds:
            sr, sg, sb = samples[slot]
            ax = sr * 2.0 - 1.0
            ay = sg * 2.0 - 1.0
            az = sb * 2.0 - 1.0
            mx = gx * ax + bx * ay + nx * az
            my = gy * ax + by * ay + ny * az
            mz = gz * ax + bz * ay + nz * az
            mm = jnp.maximum(
                jnp.sqrt(mx * mx + my * my + mz * mz),
                jnp.float32(1e-20))
            meq = mat == jnp.float32(mid)
            nx = jnp.where(meq, mx / mm, nx)
            ny = jnp.where(meq, my / mm, ny)
            nz = jnp.where(meq, mz / mm, nz)
        normal = (nx, ny, nz)
    return fields, normal


def _closest_hit(
    tris_ref, attr_ref, uvt_ref, ell_ref, imp_ref,
    onx, ony, onz, dx, dy, dz, alive,
    *,
    n_rows: int,
    n_attr_rows: int,
    n_ell: int,
    n_imp: int,
    ell_rotated: tuple,
    imp_rotated: tuple,
    imp_fn_ids: tuple,
    march_steps: int,
    bisect_iters: int,
    march_tmax: float,
    n_uvt_rows: int = 0,
    textured: bool = False,
):
    """Closest hit over the dense fused triangle rows + analytic
    primitives, at VPU block shape. Returns (t, nx, ny, nz, mat f32,
    is_hit, texinfo) — the shared scene query of the path (_trace_core)
    and Whitted (_frame_kernel whitted mode) in-kernel integrators.
    texinfo is None unless `textured`, else (tu, tv, twx, twy, twz, uvok):
    the flipped GL uv (-1 for non-triangle / no-UV hits, matching
    traverse.surface_sample), raw UV tangent, and the has-UV mask."""
    shape = alive.shape
    f0 = jnp.zeros(shape, jnp.float32)
    nx = f0
    ny = f0
    nz = f0
    # material id carried as f32 (Mosaic lacks f32<->i32 vector/scalar
    # truncation on this target); select-chains compare against f32
    mat = f0
    kind = f0  # 1 tri, 2 implicit, 3 ellipsoid (frag.glsl:640 'type')
    tur = f0
    tvr = f0
    twx = f0
    twy = f0
    twz = f0
    huv = f0

    if n_rows > 0:
        # Division-free Moller-Trumbore over the DENSE fs_tris rows
        # (TRI_CAP=14 tris/row, scene/packing.py): the candidate t is
        # carried as a RATIO (tn / td with td = |det| > 0), so the
        # per-triangle division disappears — comparisons cross-multiply
        # (both denominators positive) and ONE reciprocal after the
        # loop recovers t, u, v. Commits carry only (tn, td, un, vn,
        # hid); attributes resolve in a second, much cheaper pass.
        tn = jnp.where(alive > 0, MISS, 0.0)
        td = jnp.ones(shape, jnp.float32)
        un = f0
        vn = f0
        hid = jnp.full(shape, -1.0)

        def row_body(row, carry):
            tn, td, un, vn, hid = carry
            for j in range(TRI_CAP):
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
                sx = onx - v1x
                sy = ony - v1y
                sz = onz - v1z
                ur = sx * px + sy * py + sz * pz
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                vr = dx * qx + dy * qy + dz * qz
                tr = e2x * qx + e2y * qy + e2z * qz
                sg = jnp.where(det >= 0.0, jnp.float32(1.0),
                               jnp.float32(-1.0))
                adet = det * sg
                uc = ur * sg
                vc = vr * sg
                tc = tr * sg
                # u <= 1 is implied by u >= 0, v >= 0, u + v <= det;
                # t > EPS and t_new < t_old cross-multiplied by the
                # (positive) denominators
                ok = (
                    (adet >= EPSILON)
                    & (uc >= 0.0)
                    & (vc >= 0.0)
                    & (uc + vc <= adet)
                    & (tc > EPSILON * adet)
                    & (tc * td < tn * adet)
                )
                tn = jnp.where(ok, tc, tn)
                td = jnp.where(ok, adet, td)
                un = jnp.where(ok, uc, un)
                vn = jnp.where(ok, vc, vn)
                hid = jnp.where(ok, jnp.float32(row * TRI_CAP + j), hid)
            return tn, td, un, vn, hid

        tn, td, un, vn, hid = jax.lax.fori_loop(
            0, n_rows, row_body, (tn, td, un, vn, hid))
        invd = 1.0 / td
        t = tn * invd
        u = un * invd
        v = vn * invd

        # attribute resolve by committed triangle id over the dense
        # attr rows (ATTR_CAP=12 slots/row): 11 VPU ops per slot vs
        # ~24 for capture-at-commit — and the interp/normalize happens
        # ONCE instead of per candidate.
        a1x = f0
        a1y = f0
        a1z = f0
        a2x = f0
        a2y = f0
        a2z = f0
        a3x = f0
        a3y = f0
        a3z = f0
        amc = f0

        def attr_body(row, carry):
            a1x, a1y, a1z, a2x, a2y, a2z, a3x, a3y, a3z, amc = carry
            for j in range(ATTR_CAP):
                a = ATTR_STRIDE * j
                eq = hid == jnp.float32(row * ATTR_CAP + j)
                a1x = jnp.where(eq, attr_ref[row, a + 0], a1x)
                a1y = jnp.where(eq, attr_ref[row, a + 1], a1y)
                a1z = jnp.where(eq, attr_ref[row, a + 2], a1z)
                a2x = jnp.where(eq, attr_ref[row, a + 3], a2x)
                a2y = jnp.where(eq, attr_ref[row, a + 4], a2y)
                a2z = jnp.where(eq, attr_ref[row, a + 5], a2z)
                a3x = jnp.where(eq, attr_ref[row, a + 6], a3x)
                a3y = jnp.where(eq, attr_ref[row, a + 7], a3y)
                a3z = jnp.where(eq, attr_ref[row, a + 8], a3z)
                amc = jnp.where(eq, attr_ref[row, a + 9], amc)
            return (a1x, a1y, a1z, a2x, a2y, a2z, a3x, a3y, a3z, amc)

        (a1x, a1y, a1z, a2x, a2y, a2z, a3x, a3y, a3z, amc) = (
            jax.lax.fori_loop(
                0, n_attr_rows, attr_body,
                (a1x, a1y, a1z, a2x, a2y, a2z, a3x, a3y, a3z, amc)))
        # interp-vs-flat select, exactly like traverse.surface_sample:
        # smooth normals normalize the interp; flat tris use n1 as-is.
        # amc arrives as 2*mat+smooth (f32; values small, so exact)
        half = jnp.floor(amc * 0.5)
        smooth = (amc - 2.0 * half) > 0.5
        mat = half
        w = 1.0 - u - v
        nix = a1x * w + a2x * u + a3x * v
        niy = a1y * w + a2y * u + a3y * v
        niz = a1z * w + a2z * u + a3z * v
        mag = jnp.sqrt(nix * nix + niy * niy + niz * niz)
        nx = jnp.where(smooth, nix / mag, a1x)
        ny = jnp.where(smooth, niy / mag, a1y)
        nz = jnp.where(smooth, niz / mag, a1z)
        if textured:
            kind = jnp.where(hid >= 0.0, jnp.float32(1.0), f0)
            # UV + raw-tangent resolve by committed id over the dense
            # fs_uvt rows (UVT_CAP slots/row) — only compiled for scenes
            # with in-kernel maps, so untextured scenes pay nothing
            u1x = f0
            u1y = f0
            u2x = f0
            u2y = f0
            u3x = f0
            u3y = f0

            def uvt_body(row, carry):
                u1x, u1y, u2x, u2y, u3x, u3y, twx, twy, twz, huv = carry
                for j in range(UVT_CAP):
                    a = UVT_STRIDE * j
                    eq = hid == jnp.float32(row * UVT_CAP + j)
                    u1x = jnp.where(eq, uvt_ref[row, a + 0], u1x)
                    u1y = jnp.where(eq, uvt_ref[row, a + 1], u1y)
                    u2x = jnp.where(eq, uvt_ref[row, a + 2], u2x)
                    u2y = jnp.where(eq, uvt_ref[row, a + 3], u2y)
                    u3x = jnp.where(eq, uvt_ref[row, a + 4], u3x)
                    u3y = jnp.where(eq, uvt_ref[row, a + 5], u3y)
                    twx = jnp.where(eq, uvt_ref[row, a + 6], twx)
                    twy = jnp.where(eq, uvt_ref[row, a + 7], twy)
                    twz = jnp.where(eq, uvt_ref[row, a + 8], twz)
                    huv = jnp.where(eq, uvt_ref[row, a + 9], huv)
                return (u1x, u1y, u2x, u2y, u3x, u3y, twx, twy, twz, huv)

            (u1x, u1y, u2x, u2y, u3x, u3y, twx, twy, twz, huv) = (
                jax.lax.fori_loop(
                    0, n_uvt_rows, uvt_body,
                    (u1x, u1y, u2x, u2y, u3x, u3y, twx, twy, twz, huv)))
            tur = u1x * w + u2x * u + u3x * v
            tvr = u1y * w + u2y * u + u3y * v
    else:
        t = jnp.where(alive > 0, MISS, 0.0)

    # ---- implicit surfaces (frag.glsl:578-605; bracketed marcher) ----
    for k in range(n_imp):
        shx = imp_ref[k, 0]
        shy = imp_ref[k, 1]
        shz = imp_ref[k, 2]
        scx = imp_ref[k, 3]
        scy = imp_ref[k, 4]
        scz = imp_ref[k, 5]
        Ox = (onx - shx) / scx
        Oy = (ony - shy) / scy
        Oz = (onz - shz) / scz
        Dx = dx / scx
        Dy = dy / scy
        Dz = dz / scz
        if imp_rotated[k]:
            r00, r01, r02 = imp_ref[k, 8], imp_ref[k, 9], imp_ref[k, 10]
            r10, r11, r12 = imp_ref[k, 11], imp_ref[k, 12], imp_ref[k, 13]
            r20, r21, r22 = imp_ref[k, 14], imp_ref[k, 15], imp_ref[k, 16]
            Ox, Oy, Oz = (
                r00 * Ox + r01 * Oy + r02 * Oz,
                r10 * Ox + r11 * Oy + r12 * Oz,
                r20 * Ox + r21 * Oy + r22 * Oz,
            )
            Dx, Dy, Dz = (
                r00 * Dx + r01 * Dy + r02 * Dz,
                r10 * Dx + r11 * Dy + r12 * Dz,
                r20 * Dx + r21 * Dy + r22 * Dz,
            )
        fimp = _BUILDERS[imp_fn_ids[k] - 1]

        def feval(px, py, pz):
            return fimp(px * px, py * py, pz * pz, px, py, pz)

        dt = jnp.float32(march_tmax / march_steps)
        bound_r = IMP_BOUND_RADIUS.get(imp_fn_ids[k])
        if bound_r is not None:
            # Windowed march over the block's bounding-sphere chord: every
            # zero crossing of a BOUNDED surface (continuous or not) needs
            # |p_local| <= R, so only lattice samples inside the block's
            # conservative [entry, exit] window can bracket a root. The
            # window SNAPS to the original 0-based sample lattice (floor/
            # ceil to step indices, one pair of margin steps), so detection
            # is bit-identical to the full 0..march_tmax march — just
            # without the provably-rootless steps. Blocks whose rays all
            # miss the sphere skip marching entirely. 3 scalar syncs.
            sa = Dx * Dx + Dy * Dy + Dz * Dz
            sb = 2.0 * (Ox * Dx + Oy * Dy + Oz * Dz)
            scq = (Ox * Ox + Oy * Oy + Oz * Oz
                   - jnp.float32(bound_r * bound_r))
            sdisc = sb * sb - 4.0 * sa * scq
            sqd = jnp.sqrt(jnp.maximum(sdisc, 0.0))
            s_enter = (-sb - sqd) / (2.0 * sa)
            s_exit = (-sb + sqd) / (2.0 * sa)
            s_hit = (sdisc > 0.0) & (s_exit > 0.0) & (alive > 0)
            n_want = jnp.sum(s_hit.astype(jnp.int32))
            BIGT = jnp.float32(3e38)
            min_enter = jnp.min(jnp.where(
                s_hit, jnp.maximum(s_enter, 0.0), BIGT))
            max_exit = jnp.max(jnp.where(s_hit, s_exit, 0.0))
            start_idx = jnp.maximum(
                jnp.floor(min_enter / dt) - 1.0, 0.0)
            end_idx = jnp.minimum(jnp.ceil(max_exit / dt) + 1.0,
                                  jnp.float32(march_steps))
            eff_steps = jnp.where(
                n_want > 0,
                jnp.maximum(end_idx - start_idx, 0.0), 0.0
            ).astype(jnp.int32)
            eff_bisect = jnp.where(n_want > 0, bisect_iters, 0)
            base_t = start_idx * dt
        else:
            eff_steps = march_steps
            eff_bisect = bisect_iters
            base_t = jnp.float32(0.0)

        fprev = feval(Ox + Dx * base_t, Oy + Dy * base_t,
                      Oz + Dz * base_t)

        def coarse(i, carry):
            t_lo, t_hi, found, f_prev = carry
            tc = base_t + dt * (i + 1.0)
            f = feval(Ox + Dx * tc, Oy + Dy * tc, Oz + Dz * tc)
            sc = (found == 0) & (f_prev * f < 0.0)
            t_lo = jnp.where(sc, tc - dt, t_lo)
            t_hi = jnp.where(sc, tc, t_hi)
            found = found | sc.astype(jnp.int32)
            return t_lo, t_hi, found, f

        t_lo, t_hi, found, _ = jax.lax.fori_loop(
            0, eff_steps, coarse,
            (f0, jnp.full(shape, jnp.float32(march_tmax)),
             jnp.zeros(shape, jnp.int32), fprev),
        )
        f_lo = feval(Ox + Dx * t_lo, Oy + Dy * t_lo, Oz + Dz * t_lo)

        def bisect(_, carry):
            t_lo, t_hi, f_lo = carry
            t_mid = 0.5 * (t_lo + t_hi)
            f_mid = feval(Ox + Dx * t_mid, Oy + Dy * t_mid,
                          Oz + Dz * t_mid)
            go_left = f_lo * f_mid < 0.0
            t_hi = jnp.where(go_left, t_mid, t_hi)
            t_lo = jnp.where(go_left, t_lo, t_mid)
            f_lo = jnp.where(go_left, f_lo, f_mid)
            return t_lo, t_hi, f_lo

        t_lo, t_hi, _ = jax.lax.fori_loop(
            0, eff_bisect, bisect, (t_lo, t_hi, f_lo))
        tk = 0.5 * (t_lo + t_hi)
        ok = (found > 0) & (tk < t)
        # normal = +normalize(raw forward-difference gradient), rotated
        # back (frag.glsl:440-445, 596-600; see shade/implicits.gradient)
        h = jnp.float32(1e-4)
        plx = Ox + Dx * tk
        ply = Oy + Dy * tk
        plz = Oz + Dz * tk
        fc = feval(plx, ply, plz)
        gx = (feval(plx + h, ply, plz) - fc) / h
        gy = (feval(plx, ply + h, plz) - fc) / h
        gz = (feval(plx, ply, plz + h) - fc) / h
        gm = jnp.sqrt(gx * gx + gy * gy + gz * gz)
        gx, gy, gz = gx / gm, gy / gm, gz / gm
        if imp_rotated[k]:
            gx, gy, gz = (
                r00 * gx + r10 * gy + r20 * gz,
                r01 * gx + r11 * gy + r21 * gz,
                r02 * gx + r12 * gy + r22 * gz,
            )
        t = jnp.where(ok, tk, t)
        nx = jnp.where(ok, gx, nx)
        ny = jnp.where(ok, gy, ny)
        nz = jnp.where(ok, gz, nz)
        mat = jnp.where(ok, imp_ref[k, 7], mat)
        if textured:
            kind = jnp.where(ok, jnp.float32(2.0), kind)

    # ---- ellipsoids (frag.glsl:606-631) ------------------------------
    for e in range(n_ell):
        cx = ell_ref[e, 0]
        cy = ell_ref[e, 1]
        cz = ell_ref[e, 2]
        fx = ell_ref[e, 3]
        fy = ell_ref[e, 4]
        fz = ell_ref[e, 5]
        rad = ell_ref[e, 6]
        if ell_rotated[e]:
            r00, r01, r02 = ell_ref[e, 8], ell_ref[e, 9], ell_ref[e, 10]
            r10, r11, r12 = ell_ref[e, 11], ell_ref[e, 12], ell_ref[e, 13]
            r20, r21, r22 = ell_ref[e, 14], ell_ref[e, 15], ell_ref[e, 16]
            rox = r00 * onx + r01 * ony + r02 * onz
            roy = r10 * onx + r11 * ony + r12 * onz
            roz = r20 * onx + r21 * ony + r22 * onz
            rdx = r00 * dx + r01 * dy + r02 * dz
            rdy = r10 * dx + r11 * dy + r12 * dz
            rdz = r20 * dx + r21 * dy + r22 * dz
        else:
            rox, roy, roz = onx, ony, onz
            rdx, rdy, rdz = dx, dy, dz
        ocx = rox - cx
        ocy = roy - cy
        ocz = roz - cz
        a = fx * rdx * rdx + fy * rdy * rdy + fz * rdz * rdz
        b = 2.0 * (fx * ocx * rdx + fy * ocy * rdy + fz * ocz * rdz)
        cc = (fx * ocx * ocx + fy * ocy * ocy + fz * ocz * ocz
              - rad * rad)
        disc = b * b - 4.0 * a * cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        inv_2a = 1.0 / (2.0 * a)
        t0r = (-b - sq) * inv_2a
        t1r = (-b + sq) * inv_2a
        t_lo = jnp.minimum(t0r, t1r)
        t_hi = jnp.maximum(t0r, t1r)
        te = jnp.where(t_lo > 0.0, t_lo, t_hi)
        ok = (disc > 0.0) & (te > 0.0) & (te < t)
        # N = normalize(ro + t*rd - c) in the (rotated) local frame,
        # rotated back (frag.glsl:622-626)
        lx = rox + te * rdx - cx
        ly = roy + te * rdy - cy
        lz = roz + te * rdz - cz
        lm = jnp.sqrt(lx * lx + ly * ly + lz * lz)
        lx, ly, lz = lx / lm, ly / lm, lz / lm
        if ell_rotated[e]:
            lx, ly, lz = (
                r00 * lx + r10 * ly + r20 * lz,
                r01 * lx + r11 * ly + r21 * lz,
                r02 * lx + r12 * ly + r22 * lz,
            )
        t = jnp.where(ok, te, t)
        nx = jnp.where(ok, lx, nx)
        ny = jnp.where(ok, ly, ny)
        nz = jnp.where(ok, lz, nz)
        mat = jnp.where(ok, ell_ref[e, 7], mat)
        if textured:
            kind = jnp.where(ok, jnp.float32(3.0), kind)

    is_hit = (alive > 0) & (t < jnp.float32(1e25))
    if textured:
        # GL flips v for mesh UVs (frag.glsl:513); non-triangle and no-UV
        # hits carry uv = -1 and a zero tangent, exactly like
        # traverse.surface_sample (REPEAT wrap still samples at -1)
        uvok = (kind == 1.0) & (huv > 0.5)
        neg1 = jnp.full(shape, jnp.float32(-1.0))
        tu = jnp.where(uvok, tur, neg1)
        tv = jnp.where(uvok, 1.0 - tvr, neg1)
        texinfo = (tu, tv, twx, twy, twz, uvok)
    else:
        texinfo = None
    return t, nx, ny, nz, mat, is_hit, texinfo


def _trace_core(
    mats_ref, ell_ref, imp_ref, tris_ref, attr_ref, uvt_ref, maps_ref,
    ox0, oy0, oz0, dx0, dy0, dz0, alive0, state0,
    *,
    max_bounces: int,
    n_rows: int,
    n_attr_rows: int,
    n_mats: int,
    n_ell: int,
    n_imp: int,
    ell_rotated: tuple,
    imp_rotated: tuple,
    imp_fn_ids: tuple,
    stack_size: int,
    march_steps: int,
    bisect_iters: int,
    march_tmax: float,
    gate_ss: bool = True,
    gate_cc: bool = True,
    gate_trans: bool = True,
    gate_fresnel: bool = True,
    gate_emit: bool = True,
    n_uvt_rows: int = 0,
    map_shapes: tuple = (),
    map_bindings: tuple = (),
    refill: int = 0,
    mc_ref=None,
    dout_ref=None,
    regen=None,
):
    """The in-kernel bounce loop shared by the per-sample megakernel
    (`_fused_kernel`) and the whole-frame kernel (`_frame_kernel`).

    Takes SoA ray components + alive (i32) + RNG state at VPU block shape;
    returns (inc rgb, miss rgb, final dir xyz, state, missed, rays).

    refill > 0 turns on the run-ahead sample refill (VERDICT r4 #2): the
    loop covers ALL `refill` samples of the chunk in one pass, and a lane
    whose ray ends (miss / throughput cutoff / bounce cap) immediately
    regenerates its NEXT sample's primary+DOF ray in-loop instead of
    idling until the block's longest-lived ray dies. Per-pixel RNG streams
    are lane-private and carried across samples (frag.glsl:896-913), and
    each lane still processes its own samples in order, so results are
    bit-identical to the sequential per-sample grid — only the lane<->
    iteration schedule changes. Miss records (throughput + direction for
    the deferred sky) land in per-sample banks `mc_ref`/`dout_ref`
    ((refill, 3) + block shape), written by unrolled sample-index masks
    (at most one miss per (lane, sample), so each bank slot is written
    once). `regen` carries (pdx, pdy, pdz, cam xyz, rotmat, ifd, blur)
    for the in-loop raygen (frag.glsl:894-908)."""
    shape = alive0.shape
    f0 = jnp.zeros(shape, jnp.float32)
    use_stack = gate_trans or gate_fresnel
    # stack state exists only when something reads n1/n2 (see body)
    S = stack_size if use_stack else 1

    # material field decode: miss lanes hold mat 0, matching the XLA
    # decode's clamp (shade/mtl.decode)
    def field(mat, col: int):
        return _mat_field(mats_ref, n_mats, shape, mat, col)

    def cond(c):
        if refill:
            # per-lane bounce caps + sample exhaustion are folded into
            # `alive`; the loop runs while ANY lane still has work
            return c[1] > 0
        return (c[0] < max_bounces) & (c[1] > 0)

    def body(c):
        if refill:
            (bcnt, live, rays,
             ox, oy, oz, dx, dy, dz,
             cr, cg, cb, ir, ig, ib,
             stack, ssize, inobj, ex, ey, ez,
             state, alive, sctr) = c
        else:
            (bounce, live, rays,
             ox, oy, oz, dx, dy, dz,
             cr, cg, cb, ir, ig, ib,
             stack, ssize, inobj, ex, ey, ez,
             state, alive, missed, mr, mg, mb) = c

        rays = rays + live.astype(jnp.float32)

        # nudged origin (frag.glsl:549)
        onx = ox + jnp.float32(1e-4) * dx
        ony = oy + jnp.float32(1e-4) * dy
        onz = oz + jnp.float32(1e-4) * dz

        # ---- closest hit: t + committed shading normal + material -------
        t, nx, ny, nz, mat, is_hit, texinfo = _closest_hit(
            tris_ref, attr_ref, uvt_ref, ell_ref, imp_ref,
            onx, ony, onz, dx, dy, dz, alive,
            n_rows=n_rows, n_attr_rows=n_attr_rows, n_ell=n_ell,
            n_imp=n_imp, ell_rotated=ell_rotated,
            imp_rotated=imp_rotated, imp_fn_ids=imp_fn_ids,
            march_steps=march_steps, bisect_iters=bisect_iters,
            march_tmax=march_tmax,
            n_uvt_rows=n_uvt_rows, textured=bool(map_bindings),
        )
        is_miss = (alive > 0) & ~is_hit

        # hit location (uniform o + t*d for all primitive kinds, matching
        # traverse.surface_sample incl. the implicit local-t quirk)
        hx = onx + t * dx
        hy = ony + t * dy
        hz = onz + t * dz

        # ---- material fields (newMtl select-chain) ------------------------
        # Static capability gates (scene/packing.py scans the material
        # table): a scene with no transmissive / clearcoat / subsurface /
        # emissive material compiles those stages away entirely — same
        # trick as the XLA path's has_maps gate, applied per lobe family.
        Kdr, Kdg, Kdb = field(mat, 3), field(mat, 4), field(mat, 5)
        if gate_cc:
            Ksr, Ksg, Ksb = field(mat, 6), field(mat, 7), field(mat, 8)
        if gate_trans:
            Tr = field(mat, 11)
            Tfr, Tfg, Tfb = field(mat, 12), field(mat, 13), field(mat, 14)
            Density = field(mat, 19)
        if use_stack:
            # Ni feeds the refraction-index stack push, which is live for
            # fresnel-illum scenes even without any transmissive material
            Ni = field(mat, 15)
        if gate_emit:
            Ker, Keg, Keb = field(mat, 16), field(mat, 17), field(mat, 18)
        if gate_fresnel:
            illum = field(mat, 20)
        Pm = field(mat, 24)
        Pr = field(mat, 25)
        if gate_cc:
            Pc = field(mat, 27)
            Pcr = field(mat, 28)
        if gate_ss:
            subsurface = field(mat, 41)

        # ---- in-kernel mapMtl + normal mapping (frag.glsl:210-225) -------
        # Only channels this integrator reads are honored; the XLA path
        # samples-and-discards the others, so outputs agree.
        if map_bindings:
            used = {"map_Kd", "map_Pm", "map_Pr", "map_norm"}
            flds = {"Kd": (Kdr, Kdg, Kdb), "Pm": Pm, "Pr": Pr}
            if gate_cc:
                used |= {"map_Ks", "map_Pc"}
                flds["Ks"] = (Ksr, Ksg, Ksb)
                flds["Pc"] = Pc
            if gate_trans:
                used.add("map_Tr")
                flds["Tr"] = Tr
            if gate_emit:
                used.add("map_Ke")
                flds["Ke"] = (Ker, Keg, Keb)
            flds, (nx, ny, nz) = _apply_maps_kernel(
                maps_ref, map_shapes, map_bindings, used, mat, is_hit,
                texinfo, flds, (nx, ny, nz))
            Kdr, Kdg, Kdb = flds["Kd"]
            Pm = flds["Pm"]
            Pr = flds["Pr"]
            if gate_cc:
                Ksr, Ksg, Ksb = flds["Ks"]
                Pc = flds["Pc"]
            if gate_trans:
                Tr = flds["Tr"]
            if gate_emit:
                Ker, Keg, Keb = flds["Ke"]

        # ---- normal flip by sign(N.D) (frag.glsl:829-830) ----------------
        nd = _dot3(nx, ny, nz, dx, dy, dz)
        flip = jnp.where(nd > 0.0, jnp.float32(-1.0), jnp.float32(1.0))
        nx = nx * flip
        ny = ny * flip
        nz = nz * flip

        # ---- refraction-index stack (frag.glsl:832-841) ------------------
        # With no transmissive or fresnel-illum material in the scene the
        # stack is write-only state: n1/n2 feed only eta and fresnel, so
        # the whole (B, S) structure compiles away (use_stack False).
        entering = nd < 0.0
        if use_stack:
            can_push = ssize < S
            do_push = entering & can_push
            pushed = [jnp.where(do_push, Ni, stack[0])]
            for i in range(1, S):
                pushed.append(jnp.where(do_push, stack[i - 1], stack[i]))
            size_push = jnp.where(do_push, ssize + 1, ssize)
            n1 = jnp.where(entering, pushed[1], stack[0])
            n2 = jnp.where(entering, pushed[0], stack[1])
            can_pop = ssize > 0
            do_pop = (~entering) & can_pop
            popped = []
            for i in range(S - 1):
                popped.append(jnp.where(do_pop, pushed[i + 1], pushed[i]))
            popped.append(jnp.where(do_pop, f0, pushed[S - 1]))
            new_size = jnp.where(do_pop, ssize - 1, size_push)
        else:
            popped = stack
            new_size = ssize

        # ---- chooseRay (frag.glsl:745-809; shade/bsdf.choose_ray) --------
        reflection_w = 1.0 - Pr
        if gate_trans:
            tf_mean = (Tfr + Tfg + Tfb) / 3.0
            transmission_w = jnp.where(
                Tr > 0.0, Tr, jnp.where(Tfr > 0.0, tf_mean, f0))
            eta = n1 / n2
        else:
            transmission_w = f0
        if use_stack:
            if gate_fresnel:
                do_fresnel = ((illum == 5.0) | (illum == 7.0)
                              | (transmission_w > 0.0))
            else:
                do_fresnel = transmission_w > 0.0
            # fresnelReflectAmount (frag.glsl:726-743)
            r0 = (n1 - n2) / (n1 + n2)
            r0 = r0 * r0
            cos_x = -_dot3(nx, ny, nz, dx, dy, dz)
            rn = n1 / n2
            sin_t2 = rn * rn * (1.0 - cos_x * cos_x)
            tir = (n1 > n2) & (sin_t2 > 1.0)
            cos_x = jnp.where(n1 > n2,
                              jnp.sqrt(jnp.maximum(1.0 - sin_t2, 0.0)),
                              cos_x)
            xf = 1.0 - cos_x
            fres = r0 + (1.0 - r0) * xf * xf * xf * xf * xf
            fres = jnp.where(tir, jnp.float32(1.0), fres)
            fresnel = jnp.where(do_fresnel, fres, f0)
            reflection_w = reflection_w + fresnel * Pr
            transmission_w = transmission_w * (1.0 - fresnel)
            diffuse_w = (1.0 - Pm) * (1.0 - transmission_w) * (1.0 - fresnel)
        else:
            fresnel = f0
            diffuse_w = 1.0 - Pm
        clearcoat_w = Pc if gate_cc else 0.0
        total = diffuse_w + reflection_w + clearcoat_w + transmission_w
        rw = reflection_w / total
        cw = clearcoat_w / total if gate_cc else f0
        tw = transmission_w / total if gate_trans else f0

        # peeked draws at the exact GLSL stream offsets (shade/bsdf.py):
        # roll=1, plain lambertian 2..7, sub-roll 2, sub lambertian 3..8
        p = [_peek_u(state, off)
             for off in range(1, 9 if gate_ss else 8)]
        roll = p[0]
        lpx = _normal_from(p[1], p[2])
        lpy = _normal_from(p[3], p[4])
        lpz = _normal_from(p[5], p[6])
        if gate_ss:
            sub_roll = p[1]
            lsx = _normal_from(p[2], p[3])
            lsy = _normal_from(p[4], p[5])
            lsz = _normal_from(p[6], p[7])

        # reflect(D, N) with the flipped normal
        dn = _dot3(nx, ny, nz, dx, dy, dz)
        refx = dx - 2.0 * dn * nx
        refy = dy - 2.0 * dn * ny
        refz = dz - 2.0 * dn * nz
        # cosine lobes: normalize(lambertian + N)
        cpx = lpx + nx
        cpy = lpy + ny
        cpz = lpz + nz
        cpm = jnp.sqrt(cpx * cpx + cpy * cpy + cpz * cpz)
        cpx, cpy, cpz = cpx / cpm, cpy / cpm, cpz / cpm
        if gate_ss:
            csx = lsx + nx
            csy = lsy + ny
            csz = lsz + nz
            csm = jnp.sqrt(csx * csx + csy * csy + csz * csz)
            csx, csy, csz = csx / csm, csy / csm, csz / csm
        if gate_cc:
            # clearcoat = mix(reflect, cosine, Pcr) (frag.glsl:779)
            ccx = refx * (1.0 - Pcr) + cpx * Pcr
            ccy = refy * (1.0 - Pcr) + cpy * Pcr
            ccz = refz * (1.0 - Pcr) + cpz * Pcr
        if gate_trans:
            # refract(D, N, eta), TIR -> zero vector (core/math.refract)
            kk = 1.0 - eta * eta * (1.0 - dn * dn)
            tir2 = kk < 0.0
            ksq = jnp.sqrt(jnp.maximum(kk, 0.0))
            rfx = eta * dx - (eta * dn + ksq) * nx
            rfy = eta * dy - (eta * dn + ksq) * ny
            rfz = eta * dz - (eta * dn + ksq) * nz
            rfx = jnp.where(tir2, f0, rfx)
            rfy = jnp.where(tir2, f0, rfy)
            rfz = jnp.where(tir2, f0, rfz)

        t1 = rw
        t2 = t1 + cw if gate_cc else t1
        t3 = t2 + tw if gate_trans else t2
        is_reflect = roll < t1
        f_false = jnp.zeros(shape, bool)
        is_cc = ((~is_reflect) & (roll < t2)) if gate_cc else f_false
        is_tr = ((~is_reflect) & (~is_cc) & (roll < t3)) if gate_trans \
            else f_false
        is_else = ~(is_reflect | is_cc | is_tr)
        if gate_ss:
            has_ss = subsurface > 0.0
            is_sub = is_else & has_ss & (sub_roll < subsurface)
            elx = jnp.where(has_ss, csx, cpx)
            ely = jnp.where(has_ss, csy, cpy)
            elz = jnp.where(has_ss, csz, cpz)
        else:
            is_sub = f_false
            elx, ely, elz = cpx, cpy, cpz

        win = jnp.where(
            is_reflect, 1,
            jnp.where(is_cc, 2,
                      jnp.where(is_tr, 3,
                                jnp.where(is_sub, 4, 0)))).astype(jnp.int32)
        ndx = jnp.where(is_reflect, refx, elx)
        ndy = jnp.where(is_reflect, refy, ely)
        ndz = jnp.where(is_reflect, refz, elz)
        if gate_cc:
            ndx = jnp.where(is_cc, ccx, ndx)
            ndy = jnp.where(is_cc, ccy, ndy)
            ndz = jnp.where(is_cc, ccz, ndz)
        if gate_trans:
            ndx = jnp.where(is_tr, rfx, ndx)
            ndy = jnp.where(is_tr, rfy, ndy)
            ndz = jnp.where(is_tr, rfz, ndz)

        # consumed draws: transmission 1, diffuse-with-subsurface 8, else 7
        st7 = _advance(state, 7)
        new_state = st7
        if gate_ss:
            st8 = _advance(state, 8)
            new_state = jnp.where(is_else & has_ss, st8, new_state)
        if gate_trans:
            st1 = _advance(state, 1)
            new_state = jnp.where(is_tr, st1, new_state)

        # ---- transport (frag.glsl:847-874) --------------------------------
        if gate_trans:
            transmitted = win == 3
            ddx = ex - hx
            ddy = ey - hy
            ddz = ez - hz
            dist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
            # where(entering, in_object, True) as pure boolean algebra (a
            # bool scalar inside jnp.where fails Mosaic's i1 broadcast)
            apply_absorb = transmitted & ((~entering) | (inobj > 0))
            new_inobj = jnp.where(transmitted, entering.astype(jnp.int32),
                                  inobj)
            enter_now = transmitted & entering
            nex = jnp.where(enter_now, hx, ex)
            ney = jnp.where(enter_now, hy, ey)
            nez = jnp.where(enter_now, hz, ez)
        else:
            new_inobj = inobj
            nex, ney, nez = ex, ey, ez

        hitf = is_hit
        if gate_emit:
            ir = ir + jnp.where(hitf, Ker * cr, f0)
            ig = ig + jnp.where(hitf, Keg * cg, f0)
            ib = ib + jnp.where(hitf, Keb * cb, f0)
        cutoff = jnp.sqrt(cr * cr + cg * cg + cb * cb) < 0.1  # frag.glsl:866
        if gate_cc:
            spec = win == 2
            kkr = jnp.where(spec, Ksr, Kdr)
            kkg = jnp.where(spec, Ksg, Kdg)
            kkb = jnp.where(spec, Ksb, Kdb)
        else:
            kkr, kkg, kkb = Kdr, Kdg, Kdb
        ncr = cr * kkr
        ncg = cg * kkg
        ncb = cb * kkb
        if gate_ss:
            passthrough = win == 4
            ncr = jnp.where(passthrough, cr, ncr)
            ncg = jnp.where(passthrough, cg, ncg)
            ncb = jnp.where(passthrough, cb, ncb)
        if gate_trans:
            abr = cr * jnp.exp(-Tfr * dist * Density)
            abg = cg * jnp.exp(-Tfg * dist * Density)
            abb = cb * jnp.exp(-Tfb * dist * Density)
            ncr = jnp.where(apply_absorb, abr, ncr)
            ncg = jnp.where(apply_absorb, abg, ncg)
            ncb = jnp.where(apply_absorb, abb, ncb)

        # ---- commit masked updates ---------------------------------------
        def upd(new, old):
            return jnp.where(hitf, new, old)

        if refill:
            # ---- miss: bank the deferred-sky record at the lane's OWN
            # sample index. At most one miss per (lane, sample) — the miss
            # ends the sample — so each bank slot is written once; cr/dx
            # still hold the at-miss throughput/direction here (the hitf-
            # masked updates happen only in the return below).
            for sb in range(refill):
                msk = is_miss & (sctr == sb)
                mc_ref[sb, 0] = jnp.where(msk, cr, mc_ref[sb, 0])
                mc_ref[sb, 1] = jnp.where(msk, cg, mc_ref[sb, 1])
                mc_ref[sb, 2] = jnp.where(msk, cb, mc_ref[sb, 2])
                dout_ref[sb, 0] = jnp.where(msk, dx, dout_ref[sb, 0])
                dout_ref[sb, 1] = jnp.where(msk, dy, dout_ref[sb, 1])
                dout_ref[sb, 2] = jnp.where(msk, dz, dout_ref[sb, 2])

            # ---- run-ahead refill: lanes whose sample just ended start
            # their next sample immediately (same 6-draw DOF consumption
            # and raygen as the sequential per-sample grid, so the lane's
            # RNG stream and results are bit-identical)
            alive_b = alive > 0
            ray_on = hitf & (~cutoff) & ((bcnt + 1) < max_bounces)
            ended = alive_b & (~ray_on)
            sel = ended & (sctr < (refill - 1))
            st_post = jnp.where(hitf, new_state, state)
            (pdx, pdy, pdz, cx, cy, cz,
             r00, r01, r02, r10, r11, r12, r20, r21, r22,
             ifd, blur) = regen
            if blur != 0.0:
                q = [_peek_u(st_post, off) for off in range(1, 7)]
                jxx = _normal_from(q[0], q[1]) * jnp.float32(blur)
                jyy = _normal_from(q[2], q[3]) * jnp.float32(blur)
                jzz = _normal_from(q[4], q[5]) * jnp.float32(blur)
                rox = cx + (r00 * jxx + r01 * jyy + r02 * jzz)
                roy = cy + (r10 * jxx + r11 * jyy + r12 * jzz)
                roz = cz + (r20 * jxx + r21 * jyy + r22 * jzz)
            else:
                rox = cx + f0
                roy = cy + f0
                roz = cz + f0
            st_regen = _advance(st_post, 6)
            rdx = (cx + pdx * ifd) - rox
            rdy = (cy + pdy * ifd) - roy
            rdz = (cz + pdz * ifd) - roz
            rmag = jnp.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)
            rdx, rdy, rdz = rdx / rmag, rdy / rmag, rdz / rmag

            one = jnp.ones(shape, jnp.float32)
            i0 = jnp.zeros(shape, jnp.int32)
            new_alive = (ray_on | sel).astype(jnp.int32)
            new_stack = tuple(
                jnp.where(sel,
                          jnp.full(shape, AIR_IOR) if i == 0 else f0,
                          jnp.where(hitf, popped[i], stack[i]))
                for i in range(S))
            return (
                jnp.where(sel, i0, bcnt + alive),
                jnp.sum(new_alive), rays,
                jnp.where(sel, rox, upd(hx, ox)),
                jnp.where(sel, roy, upd(hy, oy)),
                jnp.where(sel, roz, upd(hz, oz)),
                jnp.where(sel, rdx, upd(ndx, dx)),
                jnp.where(sel, rdy, upd(ndy, dy)),
                jnp.where(sel, rdz, upd(ndz, dz)),
                jnp.where(sel, one, upd(ncr, cr)),
                jnp.where(sel, one, upd(ncg, cg)),
                jnp.where(sel, one, upd(ncb, cb)),
                ir, ig, ib,
                new_stack,
                jnp.where(sel, i0 + 1, jnp.where(hitf, new_size, ssize)),
                jnp.where(sel, i0, jnp.where(hitf, new_inobj, inobj)),
                jnp.where(sel, f0, upd(nex, ex)),
                jnp.where(sel, f0, upd(ney, ey)),
                jnp.where(sel, f0, upd(nez, ez)),
                jnp.where(sel, st_regen, st_post),
                new_alive,
                jnp.where(sel, sctr + 1, sctr),
            )

        # ---- miss: record throughput for the deferred sky ----------------
        new_missed = missed | is_miss.astype(jnp.int32)
        mr = jnp.where(is_miss, cr, mr)
        mg = jnp.where(is_miss, cg, mg)
        mb = jnp.where(is_miss, cb, mb)

        new_alive = (hitf & ~cutoff).astype(jnp.int32)
        new_live = jnp.sum(new_alive)
        new_stack = tuple(
            jnp.where(hitf, popped[i], stack[i]) for i in range(S))
        return (
            bounce + 1, new_live, rays,
            upd(hx, ox), upd(hy, oy), upd(hz, oz),
            upd(ndx, dx), upd(ndy, dy), upd(ndz, dz),
            upd(ncr, cr), upd(ncg, cg), upd(ncb, cb),
            ir, ig, ib,
            new_stack,
            jnp.where(hitf, new_size, ssize),
            jnp.where(hitf, new_inobj, inobj),
            upd(nex, ex), upd(ney, ey), upd(nez, ez),
            jnp.where(hitf, new_state, state),
            new_alive, new_missed,
            mr, mg, mb,
        )

    stack0 = tuple(
        [jnp.full(shape, AIR_IOR)] + [f0 for _ in range(S - 1)])
    live0 = jnp.sum(alive0)
    if refill:
        # zero the miss banks once per block; unmissed dout slots stay
        # unit +z so the masked-out sky pass never sees a zero direction
        for sb in range(refill):
            mc_ref[sb, 0] = f0
            mc_ref[sb, 1] = f0
            mc_ref[sb, 2] = f0
            dout_ref[sb, 0] = f0
            dout_ref[sb, 1] = f0
            dout_ref[sb, 2] = jnp.ones(shape, jnp.float32)
        init = (
            jnp.zeros(shape, jnp.int32), live0, jnp.float32(0.0),
            ox0, oy0, oz0, dx0, dy0, dz0,
            jnp.ones(shape, jnp.float32), jnp.ones(shape, jnp.float32),
            jnp.ones(shape, jnp.float32),
            f0, f0, f0,
            stack0,
            jnp.ones(shape, jnp.int32),
            jnp.zeros(shape, jnp.int32),
            f0, f0, f0,
            state0,
            alive0, jnp.zeros(shape, jnp.int32),
        )
        final = jax.lax.while_loop(cond, body, init)
        return ((final[12], final[13], final[14]), None, None,
                final[21], final[2])
    init = (
        jnp.int32(0), live0, jnp.float32(0.0),
        ox0, oy0, oz0, dx0, dy0, dz0,
        jnp.ones(shape, jnp.float32), jnp.ones(shape, jnp.float32),
        jnp.ones(shape, jnp.float32),
        f0, f0, f0,
        stack0,
        jnp.ones(shape, jnp.int32),
        jnp.zeros(shape, jnp.int32),
        f0, f0, f0,
        state0,
        alive0, jnp.zeros(shape, jnp.int32),
        f0, f0, f0,
    )
    # (measured: unrolling 2 bounces/iteration to halve the loop-cond
    # syncs is a net LOSS — 95.6 vs 99.9 Mrays/s on config 3 — the wasted
    # half-pairs on freshly-dead blocks outweigh the saved syncs)
    final = jax.lax.while_loop(cond, body, init)
    (_, _, rays,
     _, _, _, fdx, fdy, fdz,
     _, _, _, ir, ig, ib,
     _, _, _, _, _, _,
     state, _, missed, mr, mg, mb) = final

    missf = missed > 0
    return (
        (ir, ig, ib),
        (jnp.where(missf, mr, f0), jnp.where(missf, mg, f0),
         jnp.where(missf, mb, f0)),
        (fdx, fdy, fdz),
        state, rays,
    )


def _fused_kernel(
    mats_ref,       # (M, 48) f32 material records (scene/material.COL)
    ell_ref,        # (E, 17) f32: c(3), stretch(3), rad, mat, rotmat(9)
    imp_ref,        # (I, 17) f32: shift(3), scale(3), pad, mat, rotmat(9)
    tris_ref,       # (L, 128) f32 leaf-packed v1/e1/e2 rows (wavefront fmt)
    attr_ref,       # (L, 128) f32 attr rows: slot j at [10j, 10j+10)
    uvt_ref,        # (Lu, 128) f32 uv/tangent rows (textured scenes)
    maps_ref,       # (Rm, 128) f32 packed material-map texel rows
    o_ref,          # (3, RS, 128) f32 primary origins
    d_ref,          # (3, RS, 128) f32 primary directions (normalized)
    alive_ref,      # (RS, 128) f32: 1 live, 0 padding
    state_ref,      # (RS, 128) uint32 per-pixel RNG state
    inc_ref,        # out (3, RS, 128) f32 accumulated radiance (no sky)
    mc_ref,         # out (3, RS, 128) f32 throughput at miss (0 if none)
    dout_ref,       # out (3, RS, 128) f32 final direction (for sky)
    sout_ref,       # out (RS, 128) uint32 advanced RNG state
    rays_ref,       # out (G, 1) f32 SMEM: live scene queries this block
    **consts,
):
    alive0 = (alive_ref[...] > 0.0).astype(jnp.int32)
    (ir, ig, ib), (mr, mg, mb), (fdx, fdy, fdz), state, rays = _trace_core(
        mats_ref, ell_ref, imp_ref, tris_ref, attr_ref, uvt_ref, maps_ref,
        o_ref[0], o_ref[1], o_ref[2], d_ref[0], d_ref[1], d_ref[2],
        alive0, state_ref[...], **consts,
    )
    inc_ref[0] = ir
    inc_ref[1] = ig
    inc_ref[2] = ib
    mc_ref[0] = mr
    mc_ref[1] = mg
    mc_ref[2] = mb
    dout_ref[0] = fdx
    dout_ref[1] = fdy
    dout_ref[2] = fdz
    sout_ref[...] = state
    rays_ref[pl.program_id(0), 0] = rays


@functools.partial(
    jax.jit,
    static_argnames=("max_bounces", "stack_size", "block_rows",
                     "ell_rotated", "imp_rotated", "imp_fn_ids",
                     "march_steps", "bisect_iters", "march_tmax", "gates",
                     "map_shapes", "map_bindings", "interpret"),
)
def trace_block(
    o3,        # (3, R) f32, R % (block_rows*128) == 0
    d3,        # (3, R) f32 normalized directions
    alive,     # (R,) f32: 1 live, 0 padding
    state,     # (R,) uint32
    mats,      # (M, 48) f32
    ell_tab,   # (E, 17) f32
    imp_tab,   # (I, 17) f32
    tris,      # (Lf, 128) f32 DENSE fused rows (TRI_CAP tris/row);
               #   1 zero row when the scene has no triangles
    attr,      # (La, 128) f32 DENSE attr rows (ATTR_CAP slots/row)
    uvt,       # (Lu, 128) f32 uv/tangent rows (1 zero row if untextured)
    maps,      # (Rm, 128) f32 packed map texel rows (1 zero row if none)
    *,
    max_bounces: int,
    stack_size: int,
    block_rows: int,
    ell_rotated: tuple,
    imp_rotated: tuple,
    imp_fn_ids: tuple,
    march_steps: int = 256,
    bisect_iters: int = 24,
    march_tmax: float = 100.0,
    gates: tuple = (True, True, True, True, True),
    map_shapes: tuple = (),
    map_bindings: tuple = (),
    interpret: bool = False,
):
    """One fused megakernel launch over R rays (one sample's megabatch).

    Returns (inc (3,R), miss_col (3,R), d_out (3,R), state (R,), rays ()).
    `tris.shape[0] <= 1` disables the triangle loop (analytic-only scenes
    pass the 1-row zero padding from scene/packing.py).
    """
    rb = block_rows * LANES
    r = o3.shape[1]
    assert r % rb == 0, (r, rb)
    grid = (r // rb,)
    shape = (r // LANES, LANES)
    n_rows = tris.shape[0] if tris.shape[0] > 1 else 0
    n_attr_rows = attr.shape[0] if n_rows else 0
    n_uvt_rows = uvt.shape[0] if (n_rows and map_bindings) else 0

    gate_ss, gate_cc, gate_trans, gate_fresnel, gate_emit = gates
    kern = functools.partial(
        _fused_kernel,
        max_bounces=max_bounces,
        n_rows=n_rows,
        n_attr_rows=n_attr_rows,
        n_mats=mats.shape[0],
        n_ell=len(ell_rotated),
        n_imp=len(imp_rotated),
        ell_rotated=ell_rotated,
        imp_rotated=imp_rotated,
        imp_fn_ids=imp_fn_ids,
        stack_size=stack_size,
        march_steps=march_steps,
        bisect_iters=bisect_iters,
        march_tmax=march_tmax,
        gate_ss=gate_ss, gate_cc=gate_cc, gate_trans=gate_trans,
        gate_fresnel=gate_fresnel, gate_emit=gate_emit,
        n_uvt_rows=n_uvt_rows,
        map_shapes=map_shapes, map_bindings=map_bindings,
    )
    vec3 = pl.BlockSpec((3, block_rows, LANES), lambda i: (0, i, 0))
    vec1 = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0))
    inc, mc, dout, sout, rays = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mats
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ell_tab
            pl.BlockSpec(memory_space=pltpu.VMEM),  # imp_tab
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tris
            pl.BlockSpec(memory_space=pltpu.VMEM),  # attr
            pl.BlockSpec(memory_space=pltpu.VMEM),  # uvt
            pl.BlockSpec(memory_space=pltpu.VMEM),  # maps
            vec3, vec3, vec1, vec1,
        ],
        out_specs=[
            vec3, vec3, vec3, vec1,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3,) + shape, jnp.float32),
            jax.ShapeDtypeStruct((3,) + shape, jnp.float32),
            jax.ShapeDtypeStruct((3,) + shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.uint32),
            jax.ShapeDtypeStruct((grid[0], 1), jnp.float32),
        ],
        interpret=interpret,
    )(mats, ell_tab, imp_tab, tris, attr, uvt, maps,
      o3.reshape(3, *shape), d3.reshape(3, *shape),
      alive.reshape(shape), state.reshape(shape))
    return (
        inc.reshape(3, r), mc.reshape(3, r), dout.reshape(3, r),
        sout.reshape(r), jnp.sum(rays),
    )


def _frame_kernel(
    mats_ref,       # (M, 48) f32 material records
    ell_ref,        # (E, 17) f32 ellipsoid table
    imp_ref,        # (I, 17) f32 implicit table
    tris_ref,       # (L, 128) f32 leaf-packed triangle rows
    attr_ref,       # (L, 128) f32 attribute rows
    uvt_ref,        # (Lu, 128) f32 uv/tangent rows (textured scenes)
    maps_ref,       # (Rm, 128) f32 packed material-map texel rows
    sky_ref,        # (Rs, 128) f32 packed sky texel rows (whitted mode)
    scal_ref,       # (16,) f32 SMEM: cam_pos(3), rotmat(9) row-major, ifd
    uv_ref,         # (2, RS, 128) f32 pixel-center uv (texCoord convention)
    alive_ref,      # (RS, 128) f32: 1 real pixel, 0 padding
    seed_ref,       # (RS, 128) uint32 per-pixel seeded RNG state
    inc_ref,        # out (3, RS, 128) f32: radiance SUMMED over spp (no sky)
    state_ref,      # out (RS, 128) uint32: RNG state carried across samples
    mc_ref,         # out (1, 3, RS, 128) f32: throughput at miss, sample s
    dout_ref,       # out (1, 3, RS, 128) f32: final direction, sample s
    rays_ref,       # out (G, S) f32 SMEM: live scene queries per (block, s)
    *,
    cam_size: float,
    focal_length: float,
    h_ratio: float,
    blur: float,
    whitted: bool = False,
    sky_shape: tuple = (),
    **consts,
):
    """Whole-frame megakernel: grid = (pixel blocks, samples).

    whitted=True runs the directDiffuse integrator (frag.glsl:655-681)
    instead of the path-trace bounce loop: one closest-hit + the
    Ka + 0.2*Kd + Kd*dot(up,N) + Ke shade, sky deferred via a unit miss
    throughput. (Eligibility excludes subsurface materials — the SSS
    thickness probe stays on the XLA path.)

    Per grid step, ONE sample of one block runs end to end in-kernel:
    primary-ray generation (frag.glsl:894), the DOF origin jitter + re-aim
    (frag.glsl:899-908, consuming the same 6 RNG draws as camera.dof_ray),
    and the whole bounce loop (_trace_core). The RNG state carries across
    samples through `state_ref` — the reference keeps ONE stream per pixel
    through all SAMPLE_RES samples (frag.glsl:896-913), and the sample grid
    dimension is innermost, so consecutive grid steps revisit the same
    block with the same VMEM-resident state/accumulator buffers.

    This removes the per-sample XLA glue the per-sample kernel left behind
    (measured ~4.8 ms/sample at 480k rays: dof_ray + (N,3)->(3,N)
    transposes + padding concats). Only the sky stays outside: per-sample
    miss throughput/direction slabs come back for one batched equirect
    pass over all spp*R rays.
    """
    refill_n = consts.get("refill", 0)
    if refill_n:
        # run-ahead refill: 1-D grid (blocks only) — all samples of this
        # block complete inside ONE _trace_core loop, so the RNG state
        # starts straight from the seed and outputs are written once
        state = seed_ref[...]
    else:
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            state_ref[...] = seed_ref[...]
            inc_ref[...] = jnp.zeros_like(inc_ref)

        state = state_ref[...]
    shape = alive_ref.shape

    cx = scal_ref[0]
    cy = scal_ref[1]
    cz = scal_ref[2]
    r00, r01, r02 = scal_ref[3], scal_ref[4], scal_ref[5]
    r10, r11, r12 = scal_ref[6], scal_ref[7], scal_ref[8]
    r20, r21, r22 = scal_ref[9], scal_ref[10], scal_ref[11]
    ifd = scal_ref[12]

    # primary direction (frag.glsl:894; core/camera.primary_directions)
    xs = (uv_ref[0] * 2.0 - 1.0) * jnp.float32(-cam_size)
    ys = (uv_ref[1] * 2.0 - 1.0) * jnp.float32(h_ratio * cam_size)
    zs = jnp.float32(focal_length)
    pdx = r00 * xs + r01 * ys + r02 * zs
    pdy = r10 * xs + r11 * ys + r12 * zs
    pdz = r20 * xs + r21 * ys + r22 * zs

    # DOF (frag.glsl:899-908; core/camera.dof_ray): 6 draws ALWAYS consumed
    # (the reference draws its jitter vec unconditionally)
    if blur != 0.0:
        p = [_peek_u(state, off) for off in range(1, 7)]
        jx = _normal_from(p[0], p[1]) * jnp.float32(blur)
        jy = _normal_from(p[2], p[3]) * jnp.float32(blur)
        jz = _normal_from(p[4], p[5]) * jnp.float32(blur)
        ox = cx + (r00 * jx + r01 * jy + r02 * jz)
        oy = cy + (r10 * jx + r11 * jy + r12 * jz)
        oz = cz + (r20 * jx + r21 * jy + r22 * jz)
    else:
        f0 = jnp.zeros(shape, jnp.float32)
        ox = cx + f0
        oy = cy + f0
        oz = cz + f0
    state = _advance(state, 6)
    # re-aim at the focal point: d = normalize(cam + pd*ifd - o)
    ddx = (cx + pdx * ifd) - ox
    ddy = (cy + pdy * ifd) - oy
    ddz = (cz + pdz * ifd) - oz
    mag = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
    dx = ddx / mag
    dy = ddy / mag
    dz = ddz / mag

    alive0 = (alive_ref[...] > 0.0).astype(jnp.int32)
    if whitted:
        map_bindings = consts.get("map_bindings", ())
        onx = ox + jnp.float32(1e-4) * dx
        ony = oy + jnp.float32(1e-4) * dy
        onz = oz + jnp.float32(1e-4) * dz
        _t, nxv, nyv, nzv, mat, is_hit, texinfo = _closest_hit(
            tris_ref, attr_ref, uvt_ref, ell_ref, imp_ref,
            onx, ony, onz, dx, dy, dz, alive0,
            n_rows=consts["n_rows"],
            n_attr_rows=consts["n_attr_rows"], n_ell=consts["n_ell"],
            n_imp=consts["n_imp"], ell_rotated=consts["ell_rotated"],
            imp_rotated=consts["imp_rotated"],
            imp_fn_ids=consts["imp_fn_ids"],
            march_steps=consts["march_steps"],
            bisect_iters=consts["bisect_iters"],
            march_tmax=consts["march_tmax"],
            n_uvt_rows=consts.get("n_uvt_rows", 0),
            textured=bool(map_bindings),
        )
        n_mats = consts["n_mats"]

        def fld(col):
            return _mat_field(mats_ref, n_mats, shape, mat, col)

        # col = Ka + 0.2*Kd + Kd*dot(up, N) + Ke (frag.glsl:655-661);
        # the shading normal is NOT flipped in Whitted mode
        f0 = jnp.zeros(shape, jnp.float32)
        Kar, Kag, Kab = fld(0), fld(1), fld(2)
        Kdr, Kdg, Kdb = fld(3), fld(4), fld(5)
        Ker, Keg, Keb = fld(16), fld(17), fld(18)
        if map_bindings:
            flds = {"Ka": (Kar, Kag, Kab), "Kd": (Kdr, Kdg, Kdb),
                    "Ke": (Ker, Keg, Keb)}
            flds, (nxv, nyv, nzv) = _apply_maps_kernel(
                maps_ref, consts["map_shapes"], map_bindings,
                {"map_Ka", "map_Kd", "map_Ke", "map_norm"}, mat, is_hit,
                texinfo, flds, (nxv, nyv, nzv))
            Kar, Kag, Kab = flds["Ka"]
            Kdr, Kdg, Kdb = flds["Kd"]
            Ker, Keg, Keb = flds["Ke"]
        ir = jnp.where(is_hit, Kar + Kdr * (0.2 + nyv) + Ker, f0)
        ig = jnp.where(is_hit, Kag + Kdg * (0.2 + nyv) + Keg, f0)
        ib = jnp.where(is_hit, Kab + Kdb * (0.2 + nyv) + Keb, f0)
        is_miss = (alive0 > 0) & ~is_hit
        if sky_shape:
            # in-kernel equirect miss shade: whitted miss directions are
            # the (coherent) primary directions, so the sky row window is
            # a few rows per block — this removes the whole ~8 ms/frame
            # XLA deferred-sky pass (round-4 xprof; VERDICT r3 #3)
            sr, sg, sb = _sky_in_kernel(
                sky_ref, sky_shape, dx, dy, dz, is_miss)
            ir = ir + jnp.where(is_miss, sr, f0)
            ig = ig + jnp.where(is_miss, sg, f0)
            ib = ib + jnp.where(is_miss, sb, f0)
            mr = f0
            mg = f0
            mb = f0
        else:
            one = jnp.ones(shape, jnp.float32)
            mr = jnp.where(is_miss, one, f0)
            mg = mr
            mb = mr
        fdx, fdy, fdz = dx, dy, dz
        rays = jnp.sum(alive0).astype(jnp.float32)
    elif refill_n:
        regen = (pdx, pdy, pdz, cx, cy, cz,
                 r00, r01, r02, r10, r11, r12, r20, r21, r22,
                 ifd, blur)
        (ir, ig, ib), _, _, state, rays = _trace_core(
            mats_ref, ell_ref, imp_ref, tris_ref, attr_ref,
            uvt_ref, maps_ref,
            ox, oy, oz, dx, dy, dz, alive0, state,
            mc_ref=mc_ref, dout_ref=dout_ref, regen=regen, **consts,
        )
        inc_ref[0] = ir
        inc_ref[1] = ig
        inc_ref[2] = ib
        state_ref[...] = state
        rays_ref[pl.program_id(0), 0] = rays
        return
    else:
        (ir, ig, ib), (mr, mg, mb), (fdx, fdy, fdz), state, rays = \
            _trace_core(
                mats_ref, ell_ref, imp_ref, tris_ref, attr_ref,
                uvt_ref, maps_ref,
                ox, oy, oz, dx, dy, dz, alive0, state, **consts,
            )

    inc_ref[0] = inc_ref[0] + ir
    inc_ref[1] = inc_ref[1] + ig
    inc_ref[2] = inc_ref[2] + ib
    mc_ref[0, 0] = mr
    mc_ref[0, 1] = mg
    mc_ref[0, 2] = mb
    dout_ref[0, 0] = fdx
    dout_ref[0, 1] = fdy
    dout_ref[0, 2] = fdz
    state_ref[...] = state
    rays_ref[pl.program_id(0), s] = rays


@functools.partial(
    jax.jit,
    static_argnames=("spp", "max_bounces", "stack_size",
                     "block_rows", "ell_rotated", "imp_rotated",
                     "imp_fn_ids", "cam_size", "focal_length", "h_ratio",
                     "blur", "march_steps", "bisect_iters", "march_tmax",
                     "gates", "map_shapes", "map_bindings", "sky_shape",
                     "whitted", "refill", "interpret"),
)
def trace_frame(
    uv2,       # (2, R) f32, R % (block_rows*128) == 0
    alive,     # (R,) f32: 1 real pixel, 0 padding
    seed,      # (R,) uint32 per-pixel seeded state
    scal,      # (16,) f32: cam_pos(3), rotmat(9), ifd, pad
    mats, ell_tab, imp_tab, tris, attr, uvt, maps, sky,
    *,
    spp: int,
    max_bounces: int,
    stack_size: int,
    block_rows: int,
    ell_rotated: tuple,
    imp_rotated: tuple,
    imp_fn_ids: tuple,
    cam_size: float,
    focal_length: float,
    h_ratio: float,
    blur: float,
    march_steps: int = 256,
    bisect_iters: int = 24,
    march_tmax: float = 100.0,
    gates: tuple = (True, True, True, True, True),
    map_shapes: tuple = (),
    map_bindings: tuple = (),
    sky_shape: tuple = (),
    whitted: bool = False,
    refill: bool = False,
    interpret: bool = False,
):
    """All spp samples of a whole frame in ONE kernel launch.

    Returns (inc (3, R) radiance summed over spp WITHOUT sky,
    miss_col (spp, 3, R), d_out (spp, 3, R), state (R,), rays ()).

    refill=True (path mode only) switches to the run-ahead sample-refill
    schedule: grid = (blocks,) and each lane rolls through all spp samples
    inside one bounce loop, regenerating its next primary ray the moment
    its ray dies instead of idling until the block's longest-lived ray
    finishes (see _trace_core). Outputs are identical bit-for-bit — the
    per-(lane, sample) miss records land in the same (spp, 3, R) slab
    positions via in-kernel banks.
    """
    rb = block_rows * LANES
    r = uv2.shape[1]
    assert r % rb == 0, (r, rb)
    nb = r // rb
    shape = (r // LANES, LANES)
    # sky_ref is only read when the in-kernel sky is on (whitted +
    # sky_shape); otherwise ship a 1-row placeholder instead of the full
    # packed table (up to ~196 KB of dead VMEM in the budgeted megakernel)
    if not (whitted and sky_shape):
        sky = jnp.zeros((1, LANES), jnp.float32)
    # ...and when the sky IS resolved in-kernel, the deferred-miss slabs
    # (mc/dout) are discarded by the caller — collapse their HBM footprint
    # from (spp, 3, R) to a single (1, 3, R) slab every sample overwrites
    # refill needs >= 2 samples to overlap and never applies to whitted
    # (one segment per sample — nothing to refill)
    refill = bool(refill) and (not whitted) and spp >= 2
    defer_sky = not (whitted and sky_shape)
    miss_spp = spp if defer_sky else 1
    if refill:
        miss_map = lambda b: (0, 0, b, 0)          # noqa: E731
    else:
        miss_map = ((lambda b, s: (s, 0, b, 0)) if defer_sky
                    else (lambda b, s: (0, 0, b, 0)))
    n_rows = tris.shape[0] if tris.shape[0] > 1 else 0
    n_attr_rows = attr.shape[0] if n_rows else 0
    n_uvt_rows = uvt.shape[0] if (n_rows and map_bindings) else 0

    gate_ss, gate_cc, gate_trans, gate_fresnel, gate_emit = gates
    kern = functools.partial(
        _frame_kernel,
        cam_size=cam_size,
        focal_length=focal_length,
        h_ratio=h_ratio,
        blur=blur,
        max_bounces=max_bounces,
        n_rows=n_rows,
        n_attr_rows=n_attr_rows,
        n_mats=mats.shape[0],
        n_ell=len(ell_rotated),
        n_imp=len(imp_rotated),
        ell_rotated=ell_rotated,
        imp_rotated=imp_rotated,
        imp_fn_ids=imp_fn_ids,
        stack_size=stack_size,
        march_steps=march_steps,
        bisect_iters=bisect_iters,
        march_tmax=march_tmax,
        gate_ss=gate_ss, gate_cc=gate_cc, gate_trans=gate_trans,
        gate_fresnel=gate_fresnel, gate_emit=gate_emit,
        n_uvt_rows=n_uvt_rows,
        map_shapes=map_shapes, map_bindings=map_bindings,
        sky_shape=sky_shape if whitted else (),
        whitted=whitted,
        refill=spp if refill else 0,
    )
    if refill:
        vec2 = pl.BlockSpec((2, block_rows, LANES), lambda b: (0, b, 0))
        vec1 = pl.BlockSpec((block_rows, LANES), lambda b: (b, 0))
        inc_spec = pl.BlockSpec((3, block_rows, LANES), lambda b: (0, b, 0))
        miss_spec = pl.BlockSpec((miss_spp, 3, block_rows, LANES), miss_map)
        grid = (nb,)
        rays_shape = (nb, 1)
    else:
        vec2 = pl.BlockSpec((2, block_rows, LANES), lambda b, s: (0, b, 0))
        vec1 = pl.BlockSpec((block_rows, LANES), lambda b, s: (b, 0))
        inc_spec = pl.BlockSpec((3, block_rows, LANES),
                                lambda b, s: (0, b, 0))
        miss_spec = pl.BlockSpec((1, 3, block_rows, LANES), miss_map)
        grid = (nb, spp)
        rays_shape = (nb, spp)
    inc, state, mc, dout, rays = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mats
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ell_tab
            pl.BlockSpec(memory_space=pltpu.VMEM),  # imp_tab
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tris
            pl.BlockSpec(memory_space=pltpu.VMEM),  # attr
            pl.BlockSpec(memory_space=pltpu.VMEM),  # uvt
            pl.BlockSpec(memory_space=pltpu.VMEM),  # maps
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sky
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
            vec2, vec1, vec1,
        ],
        out_specs=[
            inc_spec,
            vec1,
            miss_spec,
            miss_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3,) + shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.uint32),
            jax.ShapeDtypeStruct((miss_spp, 3) + shape, jnp.float32),
            jax.ShapeDtypeStruct((miss_spp, 3) + shape, jnp.float32),
            jax.ShapeDtypeStruct(rays_shape, jnp.float32),
        ],
        interpret=interpret,
    )(mats, ell_tab, imp_tab, tris, attr, uvt, maps, sky, scal,
      uv2.reshape(2, *shape), alive.reshape(shape), seed.reshape(shape))
    return (
        inc.reshape(3, r),
        mc.reshape(miss_spp, 3, r), dout.reshape(miss_spp, 3, r),
        state.reshape(r), jnp.sum(rays),
    )


def active_map_bindings(info, params) -> tuple:
    """The static (channel, material, slot) bindings the kernel honors for
    this render: empty when textures are off; map_norm bindings drop when
    normal mapping is off (mirrors integrator._shade_setup's gates)."""
    maps_on = params.use_textures and info.has_maps
    norm_on = (params.use_textures and params.normal_mapping
               and info.has_normal_maps)
    out = []
    for b in getattr(info, "fs_map_bindings", ()):
        if b[0] == "map_norm":
            if norm_on:
                out.append(b)
        elif maps_on:
            out.append(b)
    return tuple(out)


def eligible(info, scene, params) -> bool:
    """Static gate for the fused megakernel path (integrator.trace):
    dense fused triangle tables present (or analytic-only scene), texture
    maps either absent or small enough for in-kernel sampling
    (scene/packing.py fs_maps), and a small static material table."""
    if info.streamed:
        return False
    maps_on = params.use_textures and info.has_maps
    norm_on = (params.use_textures and params.normal_mapping
               and info.has_normal_maps)
    if (maps_on or norm_on) and not getattr(info, "fs_maps_ok", False):
        return False
    if scene.materials.shape[0] < 1 or scene.materials.shape[0] > 32:
        return False
    if info.num_objects > 0 and not getattr(info, "fused_ok", False):
        return False
    return True


def render_fused_frame(scene, info, params, cam_pos, cam_rot, frame_seed,
                       ifd, *, width: int, height: int, spp: int,
                       cam_size: float, focal_length: float, blur: float,
                       whitted: bool = False,
                       interpret: bool = False, block_rows: int = 32):
    """One full frame (all pixels x spp samples) through the whole-frame
    megakernel + one batched sky pass. Returns (col (H*W, 3) mean over spp,
    rays traced). Bit-compatible RNG semantics with the per-sample path:
    per-pixel stream seeded index+frame_seed, 6 DOF draws then the trace
    draws per sample, carried across samples (frag.glsl:896-913)."""
    from ..core import camera, math as vm, rng as vrng
    from ..scene.texture import sky_color_soa

    n = width * height
    rb = LANES * block_rows
    while rb > 1024 and rb > n:
        block_rows //= 2
        rb = LANES * block_rows
    n_pad = ((n + rb - 1) // rb) * rb
    pad = n_pad - n

    uv2, index = camera.pixel_centers_soa(width, height)
    uv2 = jnp.concatenate(
        [uv2, jnp.zeros((2, pad), jnp.float32)], axis=1)
    alive = jnp.concatenate(
        [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)])
    seed = jnp.concatenate(
        [vrng.seed(index, frame_seed), jnp.zeros((pad,), jnp.uint32)])
    rmat = vm.rotation_matrix(jnp.asarray(cam_rot, jnp.float32))
    scal = jnp.concatenate([
        jnp.asarray(cam_pos, jnp.float32).reshape(3),
        rmat.reshape(9),
        jnp.reshape(ifd, (1,)).astype(jnp.float32),
        jnp.zeros((3,), jnp.float32),
    ])

    # The per-sample miss slabs (mc + dout) cost 2 * spp * 3 * R floats of
    # HBM; chunk the sample axis so deferral stays O(chunk * R) at any
    # samples_per_frame. The RNG stream is chunk-invariant: each chunk's
    # input state is the previous chunk's output state, exactly the
    # carried per-pixel stream of an unchunked launch.
    ir = jnp.zeros((n_pad,), jnp.float32)
    ig = jnp.zeros((n_pad,), jnp.float32)
    ib = jnp.zeros((n_pad,), jnp.float32)
    rays = jnp.zeros((), jnp.float32)
    state = seed
    # whitted miss shading samples the sky IN-KERNEL when the sky texture
    # fits the packed table (fs_sky_shape non-empty) — the XLA deferred
    # pass below compiles away entirely then (round-4 xprof: it was ~8 of
    # the 8.9 ms whitted frame; the kernel itself is 0.13 ms)
    sky_shape = getattr(info, "fs_sky_shape", ()) if whitted else ()

    # Run-ahead sample refill (VERDICT r4 #2): lanes whose ray dies start
    # their next sample immediately instead of idling until the block's
    # longest-lived ray finishes. MEASURED NEUTRAL on-chip (config 6:
    # 60.2 vs 59.9 Mrays/s, +0.5% — within frame noise): ray survival is
    # spatially CORRELATED per pixel (a glass pixel is long-lived every
    # sample), so the block's longest lane is the same lane each sample
    # and run-ahead reclaims almost no schedule slack, while the unrolled
    # per-sample miss-bank masks add per-iteration cost (PERF.md round-5).
    # Opt-in via PT0_FUSED_REFILL=1; results are bit-identical either way.
    use_refill = (not whitted
                  and os.environ.get("PT0_FUSED_REFILL", "0") == "1")

    def _chunk(state, k):
        """One k-sample chunk: kernel launch + deferred-sky resolve.
        Returns the chunk's (r, g, b) contribution, new RNG state, rays."""
        inc, mc, dout, state, r = trace_frame(
            uv2, alive, state, scal,
            scene.materials, scene.ell_tab, scene.imp_tab,
            scene.fs_tris, scene.fs_attr, scene.fs_uvt, scene.fs_maps,
            scene.fs_sky,
            spp=k,
            max_bounces=params.max_bounces,
            stack_size=params.refraction_stack,
            block_rows=block_rows,
            ell_rotated=info.ell_rotated[: info.num_ellipsoids],
            imp_rotated=info.imp_rotated[: info.num_implicits],
            imp_fn_ids=info.imp_fn_ids[: info.num_implicits],
            cam_size=cam_size,
            focal_length=focal_length,
            h_ratio=height / float(width),
            blur=blur,
            gates=getattr(info, "mat_gates", (True,) * 5),
            map_shapes=getattr(info, "fs_map_shapes", ()),
            map_bindings=active_map_bindings(info, params),
            sky_shape=sky_shape,
            whitted=whitted,
            refill=use_refill,
            interpret=interpret,
        )
        if sky_shape:
            return (inc[0], inc[1], inc[2]), state, r
        # deferred sky over this chunk's (k, R) miss records in one
        # batched pass, where-masked per channel like trace_fused
        sr, sg, sb = sky_color_soa(
            scene.tex_data, scene.tex_sizes,
            dout[:, 0], dout[:, 1], dout[:, 2])
        return (
            inc[0] + jnp.sum(
                jnp.where(mc[:, 0] > 0.0, sr * mc[:, 0], 0.0), 0),
            inc[1] + jnp.sum(
                jnp.where(mc[:, 1] > 0.0, sg * mc[:, 1], 0.0), 0),
            inc[2] + jnp.sum(
                jnp.where(mc[:, 2] > 0.0, sb * mc[:, 2], 0.0), 0),
        ), state, r

    # Full chunks roll through ONE compiled body via lax.scan (a 4096-spp
    # hero frame would otherwise inline 128 kernel launches into the jit
    # program — VERDICT r3 weak #8); small frames (the common spp <= 2
    # chunks) stay unrolled, scan adds nothing there. The refill schedule
    # caps the chunk at REFILL_SPP_CHUNK: its miss banks are written by
    # unrolled per-sample masks each iteration, so the bank count trades
    # against per-iteration cost (and VMEM for the resident slabs).
    chunk_n = min(SPP_CHUNK, REFILL_SPP_CHUNK) if use_refill else SPP_CHUNK
    n_full, rem = divmod(spp, chunk_n)
    if n_full >= 2:
        def _body(carry, _):
            cr, cg, cb, crays, cstate = carry
            (dr, dg, db), cstate, r = _chunk(cstate, chunk_n)
            return (cr + dr, cg + dg, cb + db, crays + r, cstate), None
        (ir, ig, ib, rays, state), _ = jax.lax.scan(
            _body, (ir, ig, ib, rays, state), None, length=n_full)
    else:
        for _ in range(n_full):
            (dr, dg, db), state, r = _chunk(state, chunk_n)
            ir, ig, ib, rays = ir + dr, ig + dg, ib + db, rays + r
    if rem:
        (dr, dg, db), state, r = _chunk(state, rem)
        ir, ig, ib, rays = ir + dr, ig + dg, ib + db, rays + r
    col = jnp.stack([ir, ig, ib], axis=-1)[:n] / jnp.float32(spp)
    return col, rays


def trace_fused(origins, directions, state, scene, info, params,
                interpret: bool = False, block_rows: int = 32):
    """Drop-in replacement for integrator.trace on eligible scenes: same
    signature, same RNG stream semantics, same return values."""
    from ..scene.texture import sky_color

    B = origins.shape[0]
    rb = LANES * block_rows
    while rb > 1024 and rb > B:
        block_rows //= 2
        rb = LANES * block_rows
    b_pad = ((B + rb - 1) // rb) * rb
    pad = b_pad - B

    o3 = jnp.concatenate(
        [origins, jnp.zeros((pad, 3), origins.dtype)]).T
    d3 = jnp.concatenate(
        [directions, jnp.ones((pad, 3), directions.dtype)]).T
    alive = jnp.concatenate(
        [jnp.ones((B,), jnp.float32), jnp.zeros((pad,), jnp.float32)])
    st = jnp.concatenate(
        [state.astype(jnp.uint32), jnp.zeros((pad,), jnp.uint32)])

    inc, mc, dout, sout, rays = trace_block(
        o3, d3, alive, st,
        scene.materials, scene.ell_tab, scene.imp_tab,
        scene.fs_tris, scene.fs_attr, scene.fs_uvt, scene.fs_maps,
        max_bounces=params.max_bounces,
        stack_size=params.refraction_stack,
        block_rows=block_rows,
        ell_rotated=info.ell_rotated[: info.num_ellipsoids],
        imp_rotated=info.imp_rotated[: info.num_implicits],
        imp_fn_ids=info.imp_fn_ids[: info.num_implicits],
        gates=getattr(info, "mat_gates", (True,) * 5),
        map_shapes=getattr(info, "fs_map_shapes", ()),
        map_bindings=active_map_bindings(info, params),
        interpret=interpret,
    )
    inc = inc.T[:B]
    mc = mc.T[:B]
    dout = dout.T[:B]
    # deferred sky: one equirect sample per ray at its final direction,
    # weighted by the throughput recorded at miss time (frag.glsl:875-879).
    # The where-mask (not a bare multiply) keeps a non-missed lane's
    # sky(NaN direction) * 0 from poisoning inc — the XLA integrator masks
    # with where(missed, ...) identically.
    sky = sky_color(scene.tex_data, scene.tex_sizes, dout)
    inc = inc + jnp.where(mc > 0.0, sky * mc, 0.0)
    return inc, sout[:B], rays
