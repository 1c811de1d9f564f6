"""Config-6 base-path attribution: time the textured scene with features
toggled (maps / UVs / glass) to find what holds the base path at 77
Mrays/s while config 3 runs 102. Run: python -m tools.diag_config6
"""
import os
import random
import time

import numpy as np
import jax
import jax.numpy as jnp


def _setup_cache():
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def build_variant(maps=True, uvs=True, glass=True):
    from pathtracer0_tpu import Scene
    from pathtracer0_tpu import scenes as S

    sc = Scene()
    S._gradient_sky(sc)
    checker = np.zeros((8, 8, 3), np.float32)
    checker[::2, ::2] = checker[1::2, 1::2] = (0.92, 0.9, 0.85)
    checker[::2, 1::2] = checker[1::2, ::2] = (0.15, 0.2, 0.42)
    checker_i = sc.textures.register_array(checker, "checker")
    rough = np.tile(np.linspace(0.02, 1.0, 16, dtype=np.float32)[None, :, None],
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
    if maps:
        sc.set_last_mtl("map_Kd", checker_i)
    sc.add_material("bumpmetal")
    sc.set_last_mtl("Kd", (0.85, 0.8, 0.7))
    sc.set_last_mtl("Ks", (0.9, 0.85, 0.7))
    sc.set_last_mtl("Pm", 1.0)
    sc.set_last_mtl("Pr", 0.1)
    if maps:
        sc.set_last_mtl("map_Pr", rough_i)
        sc.set_last_mtl("map_norm", norm_i)
    sc.add_material("glass")
    if glass:
        sc.set_last_mtl("Tr", 0.9)
        sc.set_last_mtl("Ni", 1.5)
        sc.set_last_mtl("illum", 7)
        sc.set_last_mtl("Tf", (0.08, 0.03, 0.1))
        sc.set_last_mtl("Density", 0.5)
    else:
        sc.set_last_mtl("Kd", (0.6, 0.6, 0.6))
        sc.set_last_mtl("Pr", 1.0)

    up = np.array([[0.0, 1.0, 0.0]])

    def quad(sc, a, b, c, d, m, uv_scale, normal):
        v = np.array([a, b, c, d], np.float64)
        uv = np.array([(0, 0), (uv_scale, 0), (uv_scale, uv_scale),
                       (0, uv_scale)], np.float64)
        n = np.repeat(np.asarray(normal, np.float64).reshape(1, 3), 4, 0)
        idx = [(0, 1, 2), (0, 2, 3)]
        v1 = v[[i[0] for i in idx]]
        v2 = v[[i[1] for i in idx]]
        v3 = v[[i[2] for i in idx]]
        kw = dict(normals=(n[[0, 0]], n[[0, 0]], n[[0, 0]]))
        if uvs:
            kw["uvs"] = (uv[[i[0] for i in idx]], uv[[i[1] for i in idx]],
                         uv[[i[2] for i in idx]])
        sc.add_mesh(v1, v2, v3, m, **kw)

    quad(sc, (-3.5, 0.0, 1.5), (3.5, 0.0, 1.5), (3.5, 0.0, 8.5),
         (-3.5, 0.0, 8.5), 0, 3.0, up)
    quad(sc, (-3.5, 0.0, 8.5), (3.5, 0.0, 8.5), (3.5, 3.5, 8.5),
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
    for label, kw in (
        ("full (maps+uv+glass)", dict()),
        ("no maps", dict(maps=False)),
        ("no maps, no uvs", dict(maps=False, uvs=False)),
        ("no maps/uvs/glass", dict(maps=False, uvs=False, glass=False)),
        ("no glass (maps+uv)", dict(glass=False)),
    ):
        sc = build_variant(**kw)
        dev, info = sc.build(max_leaf=4)
        cfg = RenderConfig(width=800, height=600, samples_per_frame=16,
                           max_bounces=6, auto_focus=False, blur=0.0)
        fkw = bench._frame_kwargs(cfg, info)
        img, r = render_frame(dev, cam, rot,
                              jnp.uint32(rng.randrange(1, 2 ** 31)), **fkw)
        _ = float(r)
        times, rays = [], 0.0
        for _i in range(4):
            t0 = time.perf_counter()
            img, r = render_frame(dev, cam, rot,
                                  jnp.uint32(rng.randrange(1, 2 ** 31)),
                                  **fkw)
            rays = float(r)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"{label:22s}: {dt*1e3:7.1f} ms  {rays/dt/1e6:6.1f} Mrays/s "
              f"(live rays {rays/1e6:.2f}M)", flush=True)


if __name__ == "__main__":
    main()
