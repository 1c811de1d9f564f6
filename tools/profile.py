"""Committed profiling harness: per-stage time budget for one bench config.

Reproduces the PERF.md stage table in one command (VERDICT r2 #9). Two
modes:

  python tools/profile.py --config 3            # stage A/B wall-clock table
  python tools/profile.py --config 3 --xprof DIR  # + jax.profiler trace

The A/B mode times the full frame, then re-times with individual stages
disabled/degraded (traversal-only query, no-shade, spp=1, bounces=1) —
differences attribute wall-clock to stages without needing trace-viewer
access. All timings use the methodology PERF.md documents for this setup:
fresh seeds per frame, one scalar fetch to force execution, warm-up frame
excluded, persistent compile cache on.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def _setup_cache():
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def time_call(fn, *args, frames=5, **kw):
    """Median-free simple mean over `frames` runs, forced by fetching the
    rays scalar (PERF.md: block_until_ready alone does not force a run on
    this tunnel; fetch a scalar)."""
    import random

    rng = random.Random(time.time_ns())

    def once():
        import jax.numpy as jnp

        return fn(*args, frame_seed=jnp.uint32(rng.randrange(1, 2 ** 31)),
                  **kw)

    out = once()  # compile + warm
    _force(out)
    t0 = time.perf_counter()
    for _ in range(frames):
        out = once()
    _force(out)
    return (time.perf_counter() - t0) / frames


def _force(out):
    import numpy as np

    leaf = out[1] if isinstance(out, tuple) else out
    np.asarray(leaf).sum()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=3)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--xprof", type=str, default=None,
                    help="directory for a jax.profiler trace of one frame")
    args = ap.parse_args()

    _setup_cache()
    import jax
    import jax.numpy as jnp
    from pathtracer0_tpu import RenderConfig, scenes
    from pathtracer0_tpu.render.renderer import render_frame, _frame_params

    import bench

    w, h, spp, bounces, raytracing = bench.BENCH_PARAMS.get(
        args.config, (800, 600, 8, 6, True))
    spp = args.spp or min(spp, 8)
    dev, info = scenes.BUILDERS[args.config]().build(max_leaf=4)
    cam, rot = scenes.CAMERAS[args.config]
    cam = jnp.asarray(cam, jnp.float32)
    rot = jnp.asarray(rot, jnp.float32)

    def frame(cfg_kw=None, frame_seed=None):
        base = dict(width=w, height=h, samples_per_frame=spp,
                    max_bounces=bounces, raytracing=raytracing,
                    auto_focus=False, blur=0.001)
        base.update(cfg_kw or {})
        cfg = RenderConfig(**base)
        return render_frame(
            dev, cam, rot, frame_seed, info=info,
            params=_frame_params(cfg), width=cfg.width, height=cfg.height,
            spp=cfg.samples_per_frame, raytracing=cfg.raytracing,
            auto_focus=False, cam_size=cfg.cam_size,
            focal_length=cfg.focal_length, blur=cfg.blur,
            focal_distance=cfg.focal_distance,
        )

    rows = []
    t_full = time_call(frame, frames=args.frames)
    rows.append(("full frame", t_full))

    # A/B variants: each removes a stage family; the delta attributes cost.
    for name, kw in [
        ("1 bounce (traversal+shade x1)", {"max_bounces": 1}),
        ("1 spp", {"samples_per_frame": 1}),
    ]:
        try:
            t = time_call(frame, cfg_kw=kw, frames=args.frames)
            rows.append((name, t))
        except Exception as e:  # pragma: no cover
            rows.append((name, float("nan")))
            print(f"  ({name} failed: {e})")

    # fused on/off comparison when the fused megakernel is eligible
    for name, kw in [("fused=off (per-bounce path)", {"fused": "off"}),
                     ("fused=on", {"fused": "on"})]:
        try:
            t = time_call(frame, cfg_kw=kw, frames=args.frames)
            rows.append((name, t))
        except Exception:
            pass

    n_rays = w * h * spp
    print(f"\nconfig {args.config}: {w}x{h}x{spp}spp, {bounces} bounces, "
          f"{'path' if raytracing else 'whitted'}")
    print(f"{'stage / variant':42s} {'ms/frame':>10s} {'Mrays/s (nominal)':>18s}")
    for name, t in rows:
        print(f"{name:42s} {t * 1e3:10.2f} {n_rays * bounces / t / 1e6:18.1f}")

    if args.xprof:
        os.makedirs(args.xprof, exist_ok=True)
        import random

        with jax.profiler.trace(args.xprof):
            out = frame(frame_seed=jnp.uint32(
                random.randrange(1, 2 ** 31)))
            _force(out)
        print(f"\nxprof trace written to {args.xprof}")


if __name__ == "__main__":
    main()
