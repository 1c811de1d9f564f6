"""Run the hero config (BASELINE config 5) to the ACTUAL 4096-spp target
once, end-to-end — not the per-frame estimate bench.py extrapolates from
(VERDICT r4 #5; reference: dispatch.java:49-55, 594-602).

The run goes through the interactive Driver so the render-anomaly
watchdog is live the whole time, checkpoints the accumulation every
--ckpt-every frames (SURVEY.md §5), auto-screenshots the final image,
and then renders an INDEPENDENT second 4096-spp accumulation (seed=1) so
"final RMSE vs converged" is measured, not estimated: for two
independent unbiased accumulations rmse(a, b) = sqrt(2) * sigma, so the
per-image residual noise is rmse / sqrt(2).

Writes HERO_RUN.json at the repo root; bench.py picks it up and reports
`measured_time_to_4096spp_s` next to the estimate.

Run: python -m tools.run_hero_full            (~6 min on the chip)
"""
import argparse
import json
import os
import time

import numpy as np


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _setup_cache():
    import jax
    d = os.path.join(ROOT, ".jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def run(target_spp=4096, ckpt_every=64, chunk=16, seed=0):
    from pathtracer0_tpu import RenderConfig, scenes
    from pathtracer0_tpu.render.driver import FrameLoopDriver as Driver

    cfg = RenderConfig(width=1920, height=1080, samples_per_frame=8,
                       max_bounces=6, auto_focus=False, blur=0.001)
    n_frames = target_spp // cfg.samples_per_frame

    t0 = time.perf_counter()
    dev, info = scenes.BUILDERS[5]().build(max_leaf=4)
    build_s = time.perf_counter() - t0

    cam, rot = scenes.CAMERAS[5]
    drv = Driver(dev, info, cfg, cam_pos=cam, cam_rot=rot,
                 log=lambda m: print(m, flush=True))
    # warm up the EXACT chunked program the loop dispatches (a K-frame
    # scan compiles per distinct K; persistent cache makes re-runs cheap),
    # plus the watchdog's stats fetch, then reset the accumulation
    drv.renderer.render(frames=chunk, chunk=chunk)
    drv._watchdog_check()
    drv.renderer.reset_accumulation()
    drv.frames_still = 0
    compile_s = time.perf_counter() - t0 - build_s

    ckpt_path = os.path.join(ROOT, "screenshots", "hero_ckpt.npz")
    per_ckpt = []
    t0 = time.perf_counter()
    done = 0
    while done < n_frames:
        k = min(chunk, n_frames - done)
        # Driver.tick renders one frame per call with the watchdog wired
        # in; chunked renders amortize the ~24 ms tunnel dispatch the way
        # a real session's scan does, so tick the watchdog-bearing frames
        # and bulk-render the rest of each chunk.
        drv.renderer.render(frames=k, chunk=chunk)
        drv.frames_still += k
        drv._watchdog_check()
        if drv.anomaly:
            raise RuntimeError(f"watchdog tripped: {drv.anomaly}")
        done += k
        if done % ckpt_every == 0 or done == n_frames:
            tc = time.perf_counter()
            drv.renderer.save_checkpoint(ckpt_path)
            per_ckpt.append(round(time.perf_counter() - tc, 3))
    # display_image() host-syncs: the clock stops when the image is real
    img_a = np.clip(np.asarray(drv.renderer.display_image()), 0.0, 1.0)
    wall_s = time.perf_counter() - t0
    assert drv.renderer._count == n_frames
    shot = drv.renderer.screenshot(directory=os.path.join(ROOT,
                                                          "screenshots"))

    # ---- independent accumulation for the measured residual noise ------
    from pathtracer0_tpu import Renderer
    r2 = Renderer(dev, info, cfg,
                  cam_pos=np.asarray(cam, np.float32),
                  cam_rot=np.asarray(rot, np.float32),
                  seed=seed + 1)
    t0 = time.perf_counter()
    r2.render(frames=n_frames, chunk=chunk)
    img_b = np.clip(np.asarray(r2.display_image()), 0.0, 1.0)
    wall_b = time.perf_counter() - t0
    rmse_pair = float(np.sqrt(np.mean((img_a - img_b) ** 2)))

    out = {
        "metric": "config5 hero run to 4096 spp (measured, not estimated)",
        "target_spp": target_spp,
        "frames": n_frames,
        "time_to_4096spp_s": round(wall_s, 1),
        "time_to_4096spp_s_second_run": round(wall_b, 1),
        "samples_per_s": round(1920 * 1080 * target_spp / wall_s, 0),
        "build_s": round(build_s, 2),
        "compile_s": round(compile_s, 2),
        "ckpt_every_frames": ckpt_every,
        "ckpt_save_s": per_ckpt[:4],
        "rmse_between_independent_4096spp": round(rmse_pair, 6),
        "residual_noise_per_image": round(rmse_pair / np.sqrt(2), 6),
        "screenshot": os.path.basename(shot),
        "watchdog": "active (checked every chunk)",
    }
    with open(os.path.join(ROOT, "HERO_RUN.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=4096)
    ap.add_argument("--ckpt-every", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=16)
    args = ap.parse_args()
    _setup_cache()
    run(target_spp=args.spp, ckpt_every=args.ckpt_every, chunk=args.chunk)
