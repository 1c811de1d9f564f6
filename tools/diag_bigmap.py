"""Measure the big-texture cliff (VERDICT r4 #7): a scene whose maps
exceed the in-kernel envelope (MAP_MAX_H/W, MAP_TEXEL_BUDGET in
kernels/fused.py; scene/packing.py fs_maps_ok gate) demotes the WHOLE
scene to the per-bounce XLA pipeline. The reference samples any-size
textures through bindless TMU handles for free (frag.glsl:210-225,
dispatch.java:331-379); this chip has no sampling hardware. The
factorized texel walk is O(W) vector ops per windowed row, so it DOES
slow with map size — but round-5 measurement with this diag showed it
beats the XLA demotion by 3-20x up to 128x128 maps, which is why the
envelope was lifted from 42x64/4096 texels to 128x128/32768 (PERF.md
round-5 "in-kernel map envelope" section has the before/after table).
This diag keeps the regime and its boundary VISIBLE: same scene,
checker map swept across the budget boundary (256x256 still demotes).

Run: python -m tools.diag_bigmap        (TPU, ~2 min warm)
"""
import random
import time

import numpy as np
import jax.numpy as jnp

from tools.diag_config6 import _setup_cache


def build_with_checker(size):
    """diag_config6's textured scene with an (size x size) checker floor
    map; the rough (16x16) + normal (32x32) maps stay, so total texels =
    size^2 + 1280 and the in-kernel budget (4096) is crossed between
    size=48 (3584: packs) and size=64 (5376: demotes)."""
    from pathtracer0_tpu import Scene
    from pathtracer0_tpu import scenes as S
    import tools.diag_config6 as d6

    # same construction as diag_config6.build_variant, checker resized
    sc = Scene()
    S._gradient_sky(sc)
    checker = np.zeros((size, size, 3), np.float32)
    checker[::2, ::2] = checker[1::2, 1::2] = (0.92, 0.9, 0.85)
    checker[::2, 1::2] = checker[1::2, ::2] = (0.15, 0.2, 0.42)
    checker_i = sc.textures.register_array(checker, "checker")
    rough = np.tile(
        np.linspace(0.02, 1.0, 16, dtype=np.float32)[None, :, None],
        (16, 1, 3))
    rough_i = sc.textures.register_array(rough, "roughgrad")
    k = np.arange(32, dtype=np.float32)
    uu, vv = np.meshgrid(k / 32.0, k / 32.0, indexing="xy")
    dhdu = 0.8 * np.cos(2 * np.pi * 3 * uu) * 2 * np.pi * 3 / 32.0 * 8
    dhdv = 0.8 * np.cos(2 * np.pi * 2 * vv) * 2 * np.pi * 2 / 32.0 * 8
    nm = np.stack([-dhdu, -dhdv, np.ones_like(dhdu)], axis=-1)
    nm = nm / np.linalg.norm(nm, axis=-1, keepdims=True)
    norm_i = sc.textures.register_array(
        (0.5 + 0.5 * nm).astype(np.float32), "bumps")

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

    def quad(a, b, c, d, m, uv_scale, normal):
        v = np.array([a, b, c, d], np.float64)
        uv = np.array([(0, 0), (uv_scale, 0), (uv_scale, uv_scale),
                       (0, uv_scale)], np.float64)
        n = np.repeat(np.asarray(normal, np.float64).reshape(1, 3), 4, 0)
        idx = [(0, 1, 2), (0, 2, 3)]
        v1 = v[[i[0] for i in idx]]
        v2 = v[[i[1] for i in idx]]
        v3 = v[[i[2] for i in idx]]
        sc.add_mesh(v1, v2, v3, m,
                    normals=(n[[0, 0]], n[[0, 0]], n[[0, 0]]),
                    uvs=(uv[[i[0] for i in idx]], uv[[i[1] for i in idx]],
                         uv[[i[2] for i in idx]]))

    quad((-3.5, 0.0, 1.5), (3.5, 0.0, 1.5), (3.5, 0.0, 8.5),
         (-3.5, 0.0, 8.5), 0, 3.0, up)
    quad((-3.5, 0.0, 8.5), (3.5, 0.0, 8.5), (3.5, 3.5, 8.5),
         (-3.5, 3.5, 8.5), 1, 2.0, (0.0, 0.0, -1.0))
    sc.add_sphere((0.0, 0.8, 5.0), 0.8, m=2)
    return sc


def main():
    _setup_cache()
    import bench
    from pathtracer0_tpu import RenderConfig
    from pathtracer0_tpu.render.renderer import render_frame

    rng = random.Random(99)
    cam = jnp.asarray((0.0, 1.1, 0.0), jnp.float32)
    rot = jnp.asarray((0.12, 0.0, 0.0), jnp.float32)
    for size in (8, 48, 64, 128, 256):
        sc = build_with_checker(size)
        dev, info = sc.build(max_leaf=4)
        texels = size * size + 16 * 16 + 32 * 32
        path = "in-kernel" if getattr(info, "fs_maps_ok", False) else "XLA"
        spp = 16 if info.fs_maps_ok else 4
        cfg = RenderConfig(width=800, height=600, samples_per_frame=spp,
                           max_bounces=6, auto_focus=False, blur=0.0)
        fkw = bench._frame_kwargs(cfg, info)
        img, r = render_frame(dev, cam, rot,
                              jnp.uint32(rng.randrange(1, 2 ** 31)), **fkw)
        _ = float(r)
        times, rays = [], 0.0
        for _i in range(3):
            t0 = time.perf_counter()
            img, r = render_frame(dev, cam, rot,
                                  jnp.uint32(rng.randrange(1, 2 ** 31)),
                                  **fkw)
            rays = float(r)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"checker {size:3d}x{size:<3d} ({texels:6d} texels, {path:9s}"
              f" path): {dt*1e3:8.1f} ms @ {spp}spp  "
              f"{rays/dt/1e6:6.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
