"""Per-bounce attribution for the 1M-tri scale frame: time the production
frame at max_bounces 1/2/3 and spp 1/2 — differences attribute wall-clock
to each bounce launch. Run: python -m tools.diag_scale_frame
"""
import os
import random
import time

import numpy as np
import jax
import jax.numpy as jnp

from pathtracer0_tpu import Scene, RenderConfig
from pathtracer0_tpu.render.renderer import render_frame


def _setup_cache():
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    _setup_cache()
    import bench
    rng = random.Random(1234)
    n = 708
    ext = 50.0 * (n / 708.0)
    xs = np.linspace(-ext, ext, n)
    X, Z = np.meshgrid(xs, xs)
    Y = (np.sin(X * 0.35) * np.cos(Z * 0.28) * 1.8
         + np.sin(X * 0.09 + 1.3) * 4.0
         + np.random.RandomState(0).rand(n, n) * 0.15)
    P = np.stack([X, Y, Z], axis=-1)
    a = P[:-1, :-1].reshape(-1, 3)
    b = P[1:, :-1].reshape(-1, 3)
    c = P[:-1, 1:].reshape(-1, 3)
    d4 = P[1:, 1:].reshape(-1, 3)
    sc = Scene()
    sc.set_constant_sky((0.5, 0.6, 0.9))
    sc.add_material("terrain")
    sc.set_last_mtl("Kd", (0.45, 0.52, 0.38))
    sc.set_last_mtl("Pr", 1.0)
    sc.add_mesh(np.concatenate([a, d4]), np.concatenate([b, b]),
                np.concatenate([c, c]), 0)
    dev, info = sc.build(RenderConfig())
    cam = jnp.asarray([0.0, 14.0, -ext * 1.16], jnp.float32)
    rot = jnp.asarray([0.25, 0.0, 0.0], jnp.float32)

    for spp in (1, 2):
        for bounces in (1, 2, 3):
            cfg = RenderConfig(width=800, height=600,
                               samples_per_frame=spp,
                               max_bounces=bounces, auto_focus=False,
                               blur=0.0)
            kw = bench._frame_kwargs(cfg, info)
            img, r = render_frame(
                dev, cam, rot, jnp.uint32(rng.randrange(1, 2 ** 31)), **kw)
            _ = float(r)
            times = []
            for _i in range(3):
                t0 = time.perf_counter()
                img, r = render_frame(
                    dev, cam, rot,
                    jnp.uint32(rng.randrange(1, 2 ** 31)), **kw)
                rr = float(r)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            print(f"spp={spp} bounces={bounces}: {dt*1e3:7.1f} ms "
                  f"live_rays={rr/1e6:.2f}M  {rr/dt/1e6:5.2f} Mrays/s",
                  flush=True)


if __name__ == "__main__":
    main()
