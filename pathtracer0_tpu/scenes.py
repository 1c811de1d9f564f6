"""Built-in demo/benchmark scenes.

The reference ships one hardcoded demo scene block (dispatch.java:216-265:
skybox + two inline materials + one OBJ). These five scenes cover the
BASELINE benchmark matrix (BASELINE.md:26-35) and every material feature
family: Whitted analytic, metal+glass path tracing, OBJ+BVH, the full PBR
stack (clearcoat, density filtering, rough SSS), and the progressive hero
(same scene as #3 at 1080p).
"""
from __future__ import annotations

import os

import numpy as np

from . import Scene

TABLE_OBJ = "/root/reference/src/objs/table - Copy.obj"


def _gradient_sky(sc: Scene):
    sky = np.zeros((64, 128, 3), np.float32)
    for row in range(64):
        t = row / 63.0
        sky[row] = (0.35 + 0.3 * t, 0.45 + 0.25 * t, 0.9 - 0.3 * t)
    sc.set_sky(sky, "sky")


def whitted_analytic() -> Scene:
    """Config #1: Whitted raytrace over an analytic sphere/plane scene —
    exercises camera, ellipsoid intersectors, directDiffuse, sky."""
    sc = Scene()
    _gradient_sky(sc)
    sc.add_material("ground")
    sc.set_last_mtl("Kd", (0.55, 0.53, 0.5))
    sc.add_material("red")
    sc.set_last_mtl("Kd", (0.8, 0.25, 0.2))
    sc.set_last_mtl("Ka", (0.05, 0.0, 0.0))
    sc.add_material("green")
    sc.set_last_mtl("Kd", (0.2, 0.7, 0.3))
    sc.add_material("glow")
    sc.set_last_mtl("Ke", (0.4, 0.35, 0.2))
    sc.add_sphere((0.0, -100.5, 5.0), 100.0, m=0)   # "plane"
    sc.add_sphere((-1.3, 0.3, 4.5), 0.8, m=1)
    sc.add_ellipsoid((1.2, 0.2, 5.2), (1.4, 0.8, 1.0), (0.0, 0.4, 0.0),
                     0.7, m=2)
    sc.add_sphere((0.0, 1.6, 6.5), 0.5, m=3)
    return sc


def metal_glass() -> Scene:
    """Config #2: path-traced metal + glass (refraction, transmission
    filtering, Beer-Lambert) on the analytic scene."""
    sc = Scene()
    _gradient_sky(sc)
    sc.add_material("ground")
    sc.set_last_mtl("Kd", (0.55, 0.55, 0.55))
    sc.set_last_mtl("Pr", 1.0)
    sc.add_material("metal")
    sc.set_last_mtl("Pm", 1.0)
    sc.set_last_mtl("Pr", 0.05)
    sc.set_last_mtl("Ks", (0.9, 0.85, 0.7))
    sc.set_last_mtl("Kd", (0.9, 0.85, 0.7))
    sc.add_material("glass")
    sc.set_last_mtl("Tr", 0.92)
    sc.set_last_mtl("Ni", 1.5)
    sc.set_last_mtl("illum", 7)
    sc.set_last_mtl("Tf", (0.05, 0.22, 0.25))
    sc.set_last_mtl("Density", 0.8)
    sc.set_last_mtl("Kd", (1.0, 1.0, 1.0))
    sc.add_sphere((0.0, -100.5, 5.0), 100.0, m=0)
    sc.add_sphere((-1.1, 0.35, 4.6), 0.85, m=1)
    sc.add_sphere((1.1, 0.3, 4.2), 0.8, m=2)
    return sc


def obj_bvh() -> Scene:
    """Config #3: OBJ mesh (the reference's table fixture) + BVH traversal,
    diffuse + roughness, plus analytic spheres."""
    sc = Scene()
    _gradient_sky(sc)
    sc.add_material("gray")
    sc.set_last_mtl("Kd", (0.7, 0.68, 0.62))
    sc.set_last_mtl("Pr", 1.0)
    sc.add_material("metal")
    sc.set_last_mtl("Pr", 0.05)
    sc.set_last_mtl("Pm", 1.0)
    sc.set_last_mtl("Ks", (0.9, 0.85, 0.7))
    sc.add_material("glass")
    sc.set_last_mtl("Tr", 0.9)
    sc.set_last_mtl("Ni", 1.5)
    sc.set_last_mtl("illum", 7)
    sc.set_last_mtl("Tf", (0.12, 0.02, 0.1))
    sc.set_last_mtl("Density", 0.6)
    sc.add_material("ground")
    sc.set_last_mtl("Kd", (0.55, 0.55, 0.55))
    sc.set_last_mtl("Pr", 1.0)
    if os.path.exists(TABLE_OBJ):
        sc.add_object(TABLE_OBJ, material=0, scale=(0.03, 0.03, 0.03),
                      shift=(0.0, 0.2, 4.0), rot=(0.0, 0.5, 0.0))
    sc.add_sphere((-1.2, 0.4, 3.2), 0.55, m=1)
    sc.add_sphere((1.2, 0.4, 3.2), 0.55, m=2)
    sc.add_sphere((0.0, -100.0, 4.0), 100.0, m=3)
    return sc


def full_pbr() -> Scene:
    """Config #4: the full PBR stack — clearcoat (Pc/Pcr), density-filtered
    transmission, rough subsurface scattering, an implicit surface, and a
    rotated ellipsoid."""
    sc = Scene()
    _gradient_sky(sc)
    sc.add_material("ground")
    sc.set_last_mtl("Kd", (0.5, 0.5, 0.52))
    sc.set_last_mtl("Pr", 1.0)
    sc.add_material("clearcoat")
    sc.set_last_mtl("Kd", (0.6, 0.1, 0.1))
    sc.set_last_mtl("Pc", 0.7)
    sc.set_last_mtl("Pcr", 0.15)
    sc.set_last_mtl("Pr", 0.9)
    sc.add_material("denseglass")
    sc.set_last_mtl("Tr", 0.95)
    sc.set_last_mtl("Ni", 1.45)
    sc.set_last_mtl("illum", 7)
    sc.set_last_mtl("Tf", (0.3, 0.05, 0.28))
    sc.set_last_mtl("Density", 2.0)
    sc.add_material("sss")
    sc.set_last_mtl("Kd", (0.9, 0.75, 0.6))
    sc.set_last_mtl("subsurface", 0.8)
    sc.set_last_mtl("subsurfaceColor", (0.9, 0.5, 0.35))
    sc.set_last_mtl("subsurfaceRadius", (0.6, 0.3, 0.2))
    sc.set_last_mtl("Pr", 0.8)
    sc.add_material("implicit")
    sc.set_last_mtl("Kd", (0.3, 0.5, 0.8))
    sc.set_last_mtl("Pr", 1.0)
    sc.add_sphere((0.0, -100.5, 5.0), 100.0, m=0)
    sc.add_sphere((-1.6, 0.25, 4.6), 0.75, m=1)
    sc.add_sphere((0.0, 0.3, 4.0), 0.75, m=2)
    sc.add_ellipsoid((1.7, 0.25, 4.8), (1.0, 1.3, 0.9), (0.2, 0.0, 0.3),
                     0.7, m=3)
    sc.add_implicit(1, (0.0, 2.3, 7.0), (0.18, 0.18, 0.18),
                    (0.0, 0.0, 0.0), 4)
    return sc


def textured() -> Scene:
    """Config #6: texture-mapped materials (VERDICT r2 #5) — checkerboard
    `map_Kd` + gradient `map_Pr` + tangent-space `map_norm` on UV'd meshes,
    the shape of the reference demo (skybox + textured OBJ materials,
    dispatch.java:221-265; map registration-on-first-use at
    dispatch.java:1368-1375). Exercises the full mapMtl override stage
    (frag.glsl:210-225) and the TBN normal-mapping path, which the other
    bench scenes compile away (`has_maps` static gate)."""
    sc = Scene()
    _gradient_sky(sc)

    checker = np.zeros((8, 8, 3), np.float32)
    checker[::2, ::2] = checker[1::2, 1::2] = (0.92, 0.9, 0.85)
    checker[::2, 1::2] = checker[1::2, ::2] = (0.15, 0.2, 0.42)
    checker_i = sc.textures.register_array(checker, "checker")

    rough = np.tile(
        np.linspace(0.02, 1.0, 16, dtype=np.float32)[None, :, None],
        (16, 1, 3))
    rough_i = sc.textures.register_array(rough, "roughgrad")

    # tangent-space bump field: n = normalize(-dh/du, -dh/dv, 1) of a
    # sinusoidal height field, encoded 0.5 + 0.5 n
    k = np.arange(32, dtype=np.float32)
    uu, vv = np.meshgrid(k / 32.0, k / 32.0, indexing="xy")
    dhdu = 0.8 * np.cos(2 * np.pi * 3 * uu) * 2 * np.pi * 3 / 32.0 * 8
    dhdv = 0.8 * np.cos(2 * np.pi * 2 * vv) * 2 * np.pi * 2 / 32.0 * 8
    nm = np.stack([-dhdu, -dhdv, np.ones_like(dhdu)], axis=-1)
    nm = nm / np.linalg.norm(nm, axis=-1, keepdims=True)
    nm_img = (0.5 + 0.5 * nm).astype(np.float32)
    norm_i = sc.textures.register_array(nm_img, "bumps")

    sc.add_material("checkered")
    sc.set_last_mtl("Kd", (1.0, 1.0, 1.0))
    sc.set_last_mtl("Pr", 1.0)
    sc.set_last_mtl("map_Kd", checker_i)
    sc.add_material("bumpmetal")
    sc.set_last_mtl("Kd", (0.85, 0.8, 0.7))
    sc.set_last_mtl("Ks", (0.9, 0.85, 0.7))
    sc.set_last_mtl("Pm", 1.0)
    sc.set_last_mtl("Pr", 0.1)
    sc.set_last_mtl("map_Pr", rough_i)
    sc.set_last_mtl("map_norm", norm_i)
    sc.add_material("glass")
    sc.set_last_mtl("Tr", 0.9)
    sc.set_last_mtl("Ni", 1.5)
    sc.set_last_mtl("illum", 7)
    sc.set_last_mtl("Tf", (0.08, 0.03, 0.1))
    sc.set_last_mtl("Density", 0.5)

    up = np.array([[0.0, 1.0, 0.0]])

    def quad(sc, a, b, c, d, m, uv_scale, normal):
        # two UV'd triangles a-b-c / a-c-d with per-vertex normals
        v = np.array([a, b, c, d], np.float64)
        uv = np.array([(0, 0), (uv_scale, 0), (uv_scale, uv_scale),
                       (0, uv_scale)], np.float64)
        n = np.repeat(np.asarray(normal, np.float64).reshape(1, 3), 4, 0)
        idx = [(0, 1, 2), (0, 2, 3)]
        v1 = v[[i[0] for i in idx]]
        v2 = v[[i[1] for i in idx]]
        v3 = v[[i[2] for i in idx]]
        sc.add_mesh(
            v1, v2, v3, m,
            normals=(n[[0, 0]], n[[0, 0]], n[[0, 0]]),
            uvs=(uv[[i[0] for i in idx]], uv[[i[1] for i in idx]],
                 uv[[i[2] for i in idx]]),
        )

    # checkered floor (REPEAT wrap: UVs span 0..3)
    quad(sc, (-3.5, 0.0, 1.5), (3.5, 0.0, 1.5), (3.5, 0.0, 8.5),
         (-3.5, 0.0, 8.5), 0, 3.0, up)
    # normal-mapped metal back wall
    quad(sc, (-3.5, 0.0, 8.5), (3.5, 0.0, 8.5), (3.5, 3.5, 8.5),
         (-3.5, 3.5, 8.5), 1, 2.0, (0.0, 0.0, -1.0))
    sc.add_sphere((0.0, 0.8, 5.0), 0.8, m=2)
    return sc


# Camera poses per config: (position, rotation)
CAMERAS = {
    1: ((0.0, 0.6, 0.0), (0.08, 0.0, 0.0)),
    2: ((0.0, 0.6, 0.0), (0.05, 0.0, 0.0)),
    3: ((0.0, 1.2, 0.0), (0.25, 0.0, 0.0)),
    4: ((0.0, 0.8, 0.0), (0.1, 0.0, 0.0)),
    5: ((0.0, 1.2, 0.0), (0.25, 0.0, 0.0)),
    6: ((0.0, 1.1, 0.0), (0.12, 0.0, 0.0)),
}

BUILDERS = {1: whitted_analytic, 2: metal_glass, 3: obj_bvh, 4: full_pbr,
            5: obj_bvh, 6: textured}
