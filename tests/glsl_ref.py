"""Scalar, pure-Python simulation of the GLSL reference semantics.

Used by the test suite as an independent oracle: these functions are written
directly from frag.glsl with sequential RNG consumption and branching, so
the vectorized/branchless TPU implementations can be checked draw-for-draw.
"""
from __future__ import annotations

import math

M32 = 0xFFFFFFFF


def next_random(state: int):
    """frag.glsl:686-691."""
    state = (state * 747796405 + 2891336453) & M32
    shift = ((state >> 28) + 4) & 31
    result = (((state >> shift) ^ state) * 277803737) & M32
    result = ((result >> 22) ^ result) & M32
    return result, state


def random(state: int):
    r, state = next_random(state)
    return r / 4294967295.0, state


def rand_normal(state: int):
    """frag.glsl:696-701."""
    u1, state = random(state)
    u2, state = random(state)
    theta = 2.0 * 3.1415926 * u1
    rho = math.sqrt(-2.0 * math.log(u2)) if u2 > 0 else float("inf")
    return rho * math.cos(theta), state


def rand_lambertian(state: int):
    x, state = rand_normal(state)
    y, state = rand_normal(state)
    z, state = rand_normal(state)
    return (x, y, z), state


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _norm(a):
    m = math.sqrt(_dot(a, a))
    return (a[0] / m, a[1] / m, a[2] / m)


def _mix(a, b, t):
    return tuple(a[i] * (1 - t) + b[i] * t for i in range(3))


def reflect(d, n):
    k = 2.0 * _dot(n, d)
    return (d[0] - k * n[0], d[1] - k * n[1], d[2] - k * n[2])


def refract(d, n, eta):
    cos_i = _dot(n, d)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    if k < 0.0:
        return (0.0, 0.0, 0.0)
    f = eta * cos_i + math.sqrt(k)
    return (eta * d[0] - f * n[0], eta * d[1] - f * n[1],
            eta * d[2] - f * n[2])


def fresnel_reflect_amount(n1, n2, normal, incidence):
    """frag.glsl:726-743."""
    r0 = (n1 - n2) / (n1 + n2)
    r0 *= r0
    cos_x = -_dot(normal, incidence)
    if n1 > n2:
        n = n1 / n2
        sin_t2 = n * n * (1.0 - cos_x * cos_x)
        if sin_t2 > 1.0:
            return 1.0
        cos_x = math.sqrt(1.0 - sin_t2)
    x = 1.0 - cos_x
    return r0 + (1.0 - r0) * x ** 5


def choose_ray(m: dict, n1, n2, N, D, state):
    """frag.glsl:745-809 with sequential draw consumption.
    m: dict with Pr, Pc, Pcr, Pm, Tr, Tf (3-tuple), illum, subsurface.
    Returns (out_dir, win_type, state)."""
    reflection_w = 1.0 - m["Pr"]
    clearcoat_w = m["Pc"]
    tf = m["Tf"]
    transmission_w = (
        m["Tr"] if m["Tr"] > 0
        else ((tf[0] + tf[1] + tf[2]) / 3.0 if tf[0] > 0 else 0.0)
    )
    # n2 == 0 happens on a backface hit with an air-only stack (pop leaves
    # the zero-init slot); GLSL's n1/0.0 is IEEE inf, Python traps — match
    # the IEEE result (eta only feeds refract, which TIRs out on inf)
    eta = n1 / n2 if n2 != 0.0 else math.copysign(math.inf, n1)
    fresnel = 0.0
    if m["illum"] == 5 or m["illum"] == 7 or transmission_w > 0:
        fresnel = fresnel_reflect_amount(n1, n2, N, D)
        reflection_w += fresnel * m["Pr"]
        transmission_w *= 1.0 - fresnel

    diffuse_w = (1.0 - m["Pm"]) * (1.0 - transmission_w) * (1.0 - fresnel)
    total = diffuse_w + reflection_w + clearcoat_w + transmission_w
    diffuse_w /= total
    reflection_w /= total
    clearcoat_w /= total
    transmission_w /= total

    roll, state = random(state)

    if roll < reflection_w:
        lamb, state = rand_lambertian(state)
        out = _mix(reflect(D, N), _norm(
            (lamb[0] + N[0], lamb[1] + N[1], lamb[2] + N[2])), 0.0)
        return out, 1, state
    if roll < reflection_w + clearcoat_w:
        lamb, state = rand_lambertian(state)
        out = _mix(reflect(D, N), _norm(
            (lamb[0] + N[0], lamb[1] + N[1], lamb[2] + N[2])), m["Pcr"])
        return out, 2, state
    if roll < reflection_w + clearcoat_w + transmission_w:
        return refract(D, N, eta), 3, state
    if m["subsurface"] > 0:
        sub, state = random(state)
        lamb, state = rand_lambertian(state)
        out = _norm((lamb[0] + N[0], lamb[1] + N[1], lamb[2] + N[2]))
        return out, (4 if sub < m["subsurface"] else 0), state
    lamb, state = rand_lambertian(state)
    out = _norm((lamb[0] + N[0], lamb[1] + N[1], lamb[2] + N[2]))
    return out, 0, state


# ---------------------------------------------------------------------------
# Whole-image oracle: scene query + trace loop + pixel main, transcribed
# from frag.glsl:548-653 (rayScene, analytic ellipsoids), 810-882 (trace),
# and 884-913 (main) with sequential draw consumption. Where the repo
# documents a DELIBERATE deviation from the GLSL (PARITY.md), the oracle
# follows the documented deviation — those deviations ARE the renderer's
# spec; everything else is literal.
# ---------------------------------------------------------------------------

def ray_ellipsoid(o, d, c, r, f, g, h):
    """frag.glsl:373-384, with the PARITY.md #3 deviation: return the
    smallest STRICTLY POSITIVE root (the GLSL returns min(t, tAlt) which is
    negative for rays starting inside — refraction could never exit)."""
    oc = (o[0] - c[0], o[1] - c[1], o[2] - c[2])
    a = f * d[0] * d[0] + g * d[1] * d[1] + h * d[2] * d[2]
    b = 2.0 * (f * oc[0] * d[0] + g * oc[1] * d[1] + h * oc[2] * d[2])
    C = f * oc[0] ** 2 + g * oc[1] ** 2 + h * oc[2] ** 2 - r * r
    disc = b * b - 4.0 * a * C
    if disc <= 0.0:
        return 1e30
    sq = math.sqrt(disc)
    t_hi = (sq - b) / (2.0 * a)
    t_lo = (-b - sq) / (2.0 * a)
    t = t_lo if t_lo > 0.0 else t_hi
    return t if t > 0.0 else 1e30


def sample_texture(img, u, v):
    """GL_LINEAR + GL_REPEAT bilinear sample of an (H, W, 3) array
    (dispatch.java:351-354 sampler state; texel centers at integer+0.5)."""
    H, W = img.shape[0], img.shape[1]
    x = u * W - 0.5
    y = v * H - 0.5
    x0 = math.floor(x)
    y0 = math.floor(y)
    fx = x - x0
    fy = y - y0
    x0i, x1i = int(x0) % W, (int(x0) + 1) % W
    y0i, y1i = int(y0) % H, (int(y0) + 1) % H
    c00 = img[y0i, x0i]
    c01 = img[y0i, x1i]
    c10 = img[y1i, x0i]
    c11 = img[y1i, x1i]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return tuple(float(v) for v in (top * (1 - fy) + bot * fy))


def bg_col(sky_img, d):
    """frag.glsl:235-242 equirect lookup (asin clamped like the renderer —
    GLSL leaves out-of-domain asin undefined)."""
    u = 0.5 + math.atan2(d[2], d[0]) / (2.0 * 3.14159)
    v = 0.5 - math.asin(max(-1.0, min(1.0, d[1]))) / 3.14159
    return sample_texture(sky_img, u, v)


def ray_scene_ellipsoids(o, d, ells):
    """frag.glsl:548-631 restricted to unrotated analytic ellipsoids.
    Returns (closest_t, N, mat, loc) or None on miss."""
    o = (o[0] + 1e-4 * d[0], o[1] + 1e-4 * d[1], o[2] + 1e-4 * d[2])
    closest = 1e30
    N = (0.0, 0.0, 0.0)
    mat = -1
    for e in ells:
        t = ray_ellipsoid(o, d, e["c"], e["r"], *e["stretch"])
        if t < closest:
            closest = t
            mat = e["mat"]
            hit = (o[0] + t * d[0], o[1] + t * d[1], o[2] + t * d[2])
            N = _norm((hit[0] - e["c"][0], hit[1] - e["c"][1],
                       hit[2] - e["c"][2]))
    if closest < 1e25:
        loc = (o[0] + closest * d[0], o[1] + closest * d[1],
               o[2] + closest * d[2])
        return closest, N, mat, loc, (-1.0, -1.0)
    return None


def trace(o, d, state, ells, mats, sky_img, max_bounces, scene_full=None,
          textures=None):
    """frag.glsl:810-882 with sequential draw consumption. mats: list of
    dicts (see mtl_dict). scene_full, when given, is (bvh, tris, roots)
    from scene_dicts() — the query then covers object BVHs too (the
    triangle/BVH oracle below). textures, when given, enables the mapMtl
    override stage (frag.glsl:826 -> map_mtl above) using the hit's
    barycentric UV. Returns (incLight 3-tuple, state)."""
    O, D = tuple(o), tuple(d)
    col = [1.0, 1.0, 1.0]
    inc = [0.0, 0.0, 0.0]
    # refraction-index stack (frag.glsl:136-158): fixed 10-slot array +
    # size; out-of-size reads see the 0.0 the GLSL zero-init leaves
    st = [0.0] * 10
    size = 0

    def add(x):
        nonlocal size
        if size < 10:
            for i in range(size, 0, -1):
                st[i] = st[i - 1]
            st[0] = x
            size += 1

    def rem():
        nonlocal size
        if size > 0:
            for i in range(size - 1):
                st[i] = st[i + 1]
            size -= 1

    add(1.0029)
    ray_in_object = False
    apply_absorbtion = False
    distance_traveled = 0.0
    enter_loc = (0.0, 0.0, 0.0)
    bounce = 0
    while bounce < max_bounces:
        bounce += 1
        if scene_full is not None:
            hit = ray_scene_full(O, D, scene_full[0], scene_full[1],
                                 scene_full[2], ells)
        else:
            hit = ray_scene_ellipsoids(O, D, ells)
        if hit is not None:
            _t, N, mat_i, loc, uv = hit
            O = loc
            m = mats[mat_i]
            if textures is not None:
                m = map_mtl(m, uv, textures)
            ND = _dot(N, D)
            if ND > 0:
                N = (-N[0], -N[1], -N[2])
            if ND < 0:
                add(m["Ni"])
                n1, n2 = st[1], st[0]
            else:
                n1, n2 = st[0], st[1]
                rem()
            out, win, state = choose_ray(m, n1, n2, N, D, state)
            D = tuple(out)
            if win == 3:
                if ND < 0:
                    if ray_in_object:
                        distance_traveled = math.dist(enter_loc, O)
                        apply_absorbtion = True
                    ray_in_object = True
                    enter_loc = O
                else:
                    ray_in_object = False
                    distance_traveled = math.dist(enter_loc, O)
                    apply_absorbtion = True
            for k in range(3):
                inc[k] += m["Ke"][k] * col[k]
            if math.sqrt(_dot(col, col)) < 0.1:
                return tuple(inc), state
            if apply_absorbtion:
                for k in range(3):
                    col[k] *= math.exp(
                        -m["Tf"][k] * distance_traveled * m["Density"])
                apply_absorbtion = False
            elif win == 4:
                pass
            else:
                kk = m["Ks"] if win == 2 else m["Kd"]
                for k in range(3):
                    col[k] *= kk[k]
        else:
            bg = bg_col(sky_img, D)
            for k in range(3):
                inc[k] += bg[k] * col[k]
            break
    return tuple(inc), state


def mtl_dict(m):
    """Material (scene/material.Material) -> the dict trace/choose_ray use."""
    return dict(
        Kd=tuple(m.Kd), Ks=tuple(m.Ks), Ke=tuple(m.Ke), Tf=tuple(m.Tf),
        Tr=float(m.Tr), Ni=float(m.Ni), Density=float(m.Density),
        illum=int(m.illum), Pm=float(m.Pm), Pr=float(m.Pr),
        Pc=float(m.Pc), Pcr=float(m.Pcr), subsurface=float(m.subsurface),
        map_Kd=int(m.map_Kd), map_Ks=int(m.map_Ks), map_Ke=int(m.map_Ke),
        map_Tr=int(m.map_Tr), map_Pm=int(m.map_Pm), map_Pr=int(m.map_Pr),
        map_Pc=int(m.map_Pc),
    )


def map_mtl(m, uv, textures):
    """frag.glsl:210-225 mapMtl restricted to the fields trace/choose_ray
    consume: map_Kd MULTIPLIES Kd; map_Ks/map_Ke REPLACE their vec3;
    map_Tr/map_Pm/map_Pr/map_Pc REPLACE the scalar with the sample's .r.
    (map_Ka/map_d/map_Ns/map_Ps also exist in the shader but never reach
    the path integrator's arithmetic.) textures: list of (H, W, 3) arrays
    indexed like the registry."""
    out = dict(m)
    u, v = uv
    if m.get("map_Kd", -1) > -1:
        s = sample_texture(textures[m["map_Kd"]], u, v)
        out["Kd"] = tuple(m["Kd"][k] * s[k] for k in range(3))
    if m.get("map_Ks", -1) > -1:
        out["Ks"] = sample_texture(textures[m["map_Ks"]], u, v)
    if m.get("map_Ke", -1) > -1:
        out["Ke"] = sample_texture(textures[m["map_Ke"]], u, v)
    for ch, field in (("map_Tr", "Tr"), ("map_Pm", "Pm"),
                      ("map_Pr", "Pr"), ("map_Pc", "Pc")):
        if m.get(ch, -1) > -1:
            out[field] = sample_texture(textures[m[ch]], u, v)[0]
    return out


def render_image(width, height, spp, frame_seed, cam, rot, ells, mats,
                 sky_img, max_bounces, cam_size=1.5, focal_length=1.0,
                 blur=0.0, focal_distance=1.0, scene_full=None,
                 textures=None):
    """frag.glsl:884-913 (path mode, autofocus off): per-pixel stream
    seeded index + u_seed, DOF draws consumed every sample, one image
    (H, W, 3) float64."""
    import numpy as np

    img = np.zeros((height, width, 3), np.float64)
    for iy in range(height):
        for ix in range(width):
            index = (iy * width + ix + frame_seed) & M32
            state = index
            u = (ix + 0.5) / width
            v = (iy + 0.5) / height
            direction = rotate(
                ((u * 2.0 - 1.0) * -1.0 * cam_size,
                 (v * 2.0 - 1.0) * (height / width) * cam_size,
                 focal_length), rot)
            col = np.zeros(3)
            for _s in range(spp):
                lamb, state = rand_lambertian(state)
                oj = tuple(
                    cam[k] + rotate(
                        (lamb[0] * blur, lamb[1] * blur, lamb[2] * blur),
                        rot)[k]
                    for k in range(3))
                focal = tuple(cam[k] + direction[k] * focal_distance
                              for k in range(3))
                dadj = _norm(tuple(focal[k] - oj[k] for k in range(3)))
                c, state = trace(oj, dadj, state, ells, mats, sky_img,
                                 max_bounces, scene_full=scene_full,
                                 textures=textures)
                col += np.asarray(c)
            img[iy, ix] = col / spp
    return img


def rotate(p, rot):
    """GLSL rotate(p, rot) evaluated literally: p * (Mx*My*Mz) with
    column-major mat3 constructors (frag.glsl:244-283)."""
    import numpy as np

    def mat3_colmajor(vals):
        # GLSL mat3(a,b,c, d,e,f, g,h,i): columns (a,b,c),(d,e,f),(g,h,i)
        return np.array(vals, dtype=np.float64).reshape(3, 3).T

    cx, sx = math.cos(rot[0]), math.sin(rot[0])
    cy, sy = math.cos(rot[1]), math.sin(rot[1])
    cz, sz = math.cos(rot[2]), math.sin(rot[2])
    mx = mat3_colmajor([1, 0, 0, 0, cx, -sx, 0, sx, cx])
    my = mat3_colmajor([cy, 0, sy, 0, 1, 0, -sy, 0, cy])
    mz = (
        mat3_colmajor([cz, -sz, 0, sz, cz, 0, 0, 0, 1])
        if rot[2] != 0
        else np.eye(3)
    )
    rm = mx @ my @ mz
    # GLSL p * rm = row-vector times matrix
    return np.asarray(p, np.float64) @ rm


def java_vec_rotate(p, rot):
    """Java vec.rotate (dispatch.java:1157-1191), literally transcribed."""
    x, y, z = float(p[0]), float(p[1]), float(p[2])
    cx, sx = math.cos(rot[0]), math.sin(rot[0])
    y, z = cx * y - sx * z, sx * y + cx * z
    cy, sy = math.cos(rot[1]), math.sin(rot[1])
    x, z = cy * x + sy * z, -sy * x + cy * z
    cz, sz = math.cos(rot[2]), math.sin(rot[2])
    x, y = cz * x - sz * y, sz * x + cz * y
    return (x, y, z)


# ---------------------------------------------------------------------------
# Triangle + BVH oracle (VERDICT r3 #5): rayTri (frag.glsl:351-372), rayBox
# (frag.glsl:408-419, with the repo's documented safe-inverse fix —
# PARITY.md: an axis-parallel ray over an on-plane box boundary is UB in
# the GLSL), and the iterative stack-walk rayBVH (frag.glsl:452-537) over
# the repo's flattened forest arrays, with the PARITY.md flat/smooth-normal
# deviations (face normal in all three slots + has_smooth mask; interp
# reads n3 from the n3 slot, not n2). Sequential and scalar throughout —
# an independent implementation of everything the packet/fused kernels do.
# ---------------------------------------------------------------------------

EPSILON = 1e-10  # frag.glsl:228


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def ray_tri(o, d, v1, v2, v3):
    """frag.glsl:351-372 Moller-Trumbore; (t, u, v) or None."""
    e1 = tuple(v2[k] - v1[k] for k in range(3))
    e2 = tuple(v3[k] - v1[k] for k in range(3))
    p = _cross(d, e2)
    det = _dot(e1, p)
    if abs(det) < EPSILON:
        return None
    inv = 1.0 / det
    s = tuple(o[k] - v1[k] for k in range(3))
    u = _dot(s, p) * inv
    if u < 0.0 or u > 1.0:
        return None
    q = _cross(s, e1)
    v = _dot(d, q) * inv
    if v < 0.0 or u + v > 1.0:
        return None
    t = _dot(e2, q) * inv
    return (t, u, v) if t > EPSILON else None


def ray_box(o, d, mn, mx):
    """frag.glsl:408-419 slab test with the safe-inverse deviation
    (kernels/intersect.safe_inv_dir): entry distance, 0 inside, 1e30 miss."""
    t_near = -math.inf
    t_far = math.inf
    for k in range(3):
        dk = d[k] if d[k] != 0.0 else 1e-30
        inv = max(-1e30, min(1e30, 1.0 / dk))
        a = (mn[k] - o[k]) * inv
        b = (mx[k] - o[k]) * inv
        t_near = max(t_near, min(a, b))
        t_far = min(t_far, max(a, b))
    if t_far >= t_near and t_far > 0.0:
        return t_near if t_near > 0.0 else 0.0
    return 1e30


def ray_bvh(o, d, root, closest_t, bvh, tris):
    """frag.glsl:452-537: 64-deep stack walk of ONE object tree, far child
    pushed first, closest-t pruning. bvh: dict of flattened arrays
    (node_min, node_max, left, right, leaf_start, leaf_end, leaf_tri);
    tris: dict of per-triangle arrays (v1, v2, v3, n1, n2, n3, has_smooth,
    uv1, uv2, uv3, has_uv, mat). Returns (closest_t, hit dict or None)."""
    nm, nx = bvh["node_min"], bvh["node_max"]
    left, right = bvh["left"], bvh["right"]
    ls, le, lt = bvh["leaf_start"], bvh["leaf_end"], bvh["leaf_tri"]
    best = None
    if ray_box(o, d, nm[root], nx[root]) > closest_t:
        return closest_t, None
    stack = [root]
    while stack:
        node = stack.pop()
        lc, rc = int(left[node]), int(right[node])
        if lc == -1 and rc == -1:
            for i in range(int(ls[node]), int(le[node])):
                ti = int(lt[i])
                hit = ray_tri(o, d, tris["v1"][ti], tris["v2"][ti],
                              tris["v3"][ti])
                if hit is not None and 0.0 < hit[0] < closest_t:
                    t, u, v = hit
                    closest_t = t
                    if tris["has_smooth"][ti]:
                        n1, n2, n3 = (tris["n1"][ti], tris["n2"][ti],
                                      tris["n3"][ti])
                        norm = _norm(tuple(
                            n2[k] * u + n3[k] * v + (1.0 - u - v) * n1[k]
                            for k in range(3)))
                    else:
                        norm = tuple(tris["n1"][ti])
                    if tris["has_uv"][ti]:
                        u1, u2, u3 = (tris["uv1"][ti], tris["uv2"][ti],
                                      tris["uv3"][ti])
                        uvs = tuple(
                            u2[k] * u + u3[k] * v + (1.0 - u - v) * u1[k]
                            for k in range(2))
                        uvs = (uvs[0], 1.0 - uvs[1])
                    else:
                        uvs = (-1.0, -1.0)
                    best = dict(t=t, norm=norm, mat=int(tris["mat"][ti]),
                                uv=uvs, tri=ti)
        else:
            ld = ray_box(o, d, nm[max(0, lc)], nx[max(0, lc)])
            rd = ray_box(o, d, nm[max(0, rc)], nx[max(0, rc)])
            if ld > rd:
                if ld < closest_t:
                    stack.append(lc)
                if rd < closest_t:
                    stack.append(rc)
            else:
                if rd < closest_t:
                    stack.append(rc)
                if ld < closest_t:
                    stack.append(lc)
    return closest_t, best


def ray_scene_full(o, d, bvh, tris, roots, ells):
    """frag.glsl:548-653 closest hit over object BVHs (closest-t carried
    across roots) + analytic ellipsoids. Returns (t, N, mat, loc) or None."""
    o = (o[0] + 1e-4 * d[0], o[1] + 1e-4 * d[1], o[2] + 1e-4 * d[2])
    closest = 1e30
    best = None
    for root in roots:
        closest, hit = ray_bvh(o, d, int(root), closest, bvh, tris)
        if hit is not None:
            best = hit
    for e in ells:
        t = ray_ellipsoid(o, d, e["c"], e["r"], *e["stretch"])
        if t < closest:
            closest = t
            hitp = (o[0] + t * d[0], o[1] + t * d[1], o[2] + t * d[2])
            best = dict(t=t, norm=_norm((
                hitp[0] - e["c"][0], hitp[1] - e["c"][1],
                hitp[2] - e["c"][2])), mat=e["mat"], uv=(-1.0, -1.0))
    if best is None:
        return None
    loc = (o[0] + closest * d[0], o[1] + closest * d[1],
           o[2] + closest * d[2])
    return (closest, best["norm"], best["mat"], loc,
            best.get("uv", (-1.0, -1.0)))


def scene_dicts(dev, info):
    """DeviceScene -> the plain-python arrays the oracle walks."""
    import numpy as np

    bvh = dict(
        node_min=np.asarray(dev.node_min, np.float64),
        node_max=np.asarray(dev.node_max, np.float64),
        left=np.asarray(dev.node_left),
        right=np.asarray(dev.node_right),
        leaf_start=np.asarray(dev.leaf_start),
        leaf_end=np.asarray(dev.leaf_end),
        leaf_tri=np.asarray(dev.leaf_tri),
    )
    tris = dict(
        v1=np.asarray(dev.tri_v1, np.float64),
        v2=np.asarray(dev.tri_v2, np.float64),
        v3=np.asarray(dev.tri_v3, np.float64),
        n1=np.asarray(dev.tri_n1, np.float64),
        n2=np.asarray(dev.tri_n2, np.float64),
        n3=np.asarray(dev.tri_n3, np.float64),
        uv1=np.asarray(dev.tri_uv1, np.float64),
        uv2=np.asarray(dev.tri_uv2, np.float64),
        uv3=np.asarray(dev.tri_uv3, np.float64),
        has_uv=np.asarray(dev.tri_has_uv),
        has_smooth=np.asarray(dev.tri_has_smooth),
        mat=np.asarray(dev.tri_mat),
    )
    roots = [int(r) for r in np.asarray(dev.roots)]
    return bvh, tris, roots
