"""EXPERIMENT: can the in-kernel map envelope stretch to 256x256?

The round-5 lift (kernels/fused.py MAP_MAX_* = 128, budget 32768) left
256x256 maps on the demoted whole-scene XLA path at 1.2 Mrays/s
(tools/diag_bigmap). The texel walk's measured size trend (53 -> 44 ->
41 -> 26 Mrays/s from 8x8 to 128x128) extrapolates a 256x256 in-kernel
rate of ~10-15 Mrays/s — ~10x the demotion — but the walk unrolls W
statically (kernels/fused._sample_map_block wx list), so W=256 doubles
program size and the per-row MAC count; round 4 measured program bloat
REGRESSING an unrelated config (248 -> 122) when the walk grew traced
branches. This diag patches the envelope constants (packing's module
globals) to 256/73728, builds the diag_bigmap 256-checker scene
in-kernel, and reports compile time + steady rate, WITHOUT changing the
shipped envelope. Decision by measurement.

Run: python -m tools.diag_map256        (TPU, ~3 min)
"""
import random
import time

import jax.numpy as jnp

from tools.diag_config6 import _setup_cache


def main():
    _setup_cache()
    import bench
    from pathtracer0_tpu import RenderConfig
    from pathtracer0_tpu.render.renderer import render_frame
    from pathtracer0_tpu.scene import packing
    from tools.diag_bigmap import build_with_checker

    packing.MAP_MAX_H = 256
    packing.MAP_MAX_W = 256
    packing.MAP_TEXEL_BUDGET = 256 * 256 + 8192

    rng = random.Random(7)
    cam = jnp.asarray((0.0, 1.1, 0.0), jnp.float32)
    rot = jnp.asarray((0.12, 0.0, 0.0), jnp.float32)
    for size in (192, 256):
        sc = build_with_checker(size)
        dev, info = sc.build(max_leaf=4)
        assert info.fs_maps_ok, f"{size}: expected in-kernel under patch"
        cfg = RenderConfig(width=800, height=600, samples_per_frame=16,
                           max_bounces=6, auto_focus=False, blur=0.0)
        fkw = bench._frame_kwargs(cfg, info)
        t0 = time.perf_counter()
        img, r = render_frame(dev, cam, rot,
                              jnp.uint32(rng.randrange(1, 2 ** 31)), **fkw)
        _ = float(r)
        compile_s = time.perf_counter() - t0
        times, rays = [], 0.0
        for _i in range(3):
            t1 = time.perf_counter()
            img, r = render_frame(dev, cam, rot,
                                  jnp.uint32(rng.randrange(1, 2 ** 31)),
                                  **fkw)
            rays = float(r)
            times.append(time.perf_counter() - t1)
        dt = min(times)
        print(f"checker {size}x{size} in-kernel (patched envelope): "
              f"compile {compile_s:6.1f} s, frame {dt*1e3:8.1f} ms @16spp, "
              f"{rays/dt/1e6:6.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
