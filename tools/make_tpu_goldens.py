"""Render TPU golden frames for the bench configs (VERDICT r3 weak #7).

The committed CPU goldens (tests/goldens/config{N}.png) pin the renderer
on the per-bounce CPU path; comparing a TPU fused-kernel render against
them floors at ~0.009 RMSE of knife-edge divergence, hiding subtler
shading regressions. This script renders the SAME golden frames (fixed
seed, bench.GOLDEN_* geometry) on the real chip through the default
(fused) path and commits them as config{N}_tpu.png; bench.py then reports
rmse_vs_tpu_golden, whose floor is the 8-bit PNG quantization (~0.001) —
any larger drift means the TPU compute path changed behavior.

Usage: python tools/make_tpu_goldens.py   (on the TPU machine)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import numpy as np
    import jax.numpy as jnp
    import bench
    from pathtracer0_tpu import RenderConfig, scenes
    from pathtracer0_tpu.render.renderer import render_frame
    from pathtracer0_tpu.utils import image as img_util

    assert jax.default_backend() != "cpu", (
        "TPU goldens must be rendered on the chip (the point is pinning "
        "the TPU compute path)")
    for n, (w, h, spp, bounces, raytracing) in bench.BENCH_PARAMS.items():
        dev, info = scenes.BUILDERS[n]().build(max_leaf=4)
        cam, rot = scenes.CAMERAS[n]
        gcfg = RenderConfig(width=bench.GOLDEN_W, height=bench.GOLDEN_H,
                            samples_per_frame=bench.GOLDEN_SPP,
                            max_bounces=bounces, raytracing=raytracing,
                            auto_focus=False, blur=0.0)
        img, _ = render_frame(
            dev, jnp.asarray(cam, jnp.float32), jnp.asarray(rot, jnp.float32),
            jnp.uint32(bench.GOLDEN_SEED), **bench._frame_kwargs(gcfg, info))
        path = os.path.join(bench.GOLDEN_DIR, f"config{n}_tpu.png")
        img_util.write_png(path, np.clip(np.asarray(img), 0.0, 1.0))
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
