"""Decompose the 4M-tri scale-scene build_s: native forest build vs
host packing vs tunnel transfer, and per-array transfer rates.

Usage: python tools/diag_build4m.py [n]   (n=1416 -> ~4M tris)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1416
    import jax
    import jax.numpy as jnp
    from pathtracer0_tpu import Scene, RenderConfig

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

    t0 = time.perf_counter()
    dev, info = sc.build(RenderConfig())
    jax.block_until_ready(dev)
    total = time.perf_counter() - t0
    print(f"total build_s = {total:.2f}")

    # per-array sizes + standalone transfer timing
    tot_mb = 0.0
    for name in dev._fields:
        arr = getattr(dev, name)
        mb = arr.size * arr.dtype.itemsize / 1e6
        tot_mb += mb
        if mb < 4:
            continue
        host = np.asarray(arr)
        t0 = time.perf_counter()
        d = jax.device_put(host)
        jax.block_until_ready(d)
        dt = time.perf_counter() - t0
        print(f"  {name:12s} {str(arr.shape):>18s} {mb:8.1f} MB  "
              f"put {dt:6.2f} s  ({mb / dt:6.1f} MB/s)")
    print(f"total device bytes = {tot_mb:.0f} MB")


if __name__ == "__main__":
    main()
