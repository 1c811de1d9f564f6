"""Benchmark suite: the five BASELINE.md configs on one chip.

Prints one JSON line per config (Mrays/s, samples/s, RMSE vs the committed
golden) and ends with THE driver line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}
(the last line is the headline config-#3 throughput; vs_baseline is
relative to the 100 Mrays/s/chip north star, BASELINE.md:22-24).

Timing methodology notes (all measured on this v5e setup):
  * fresh random seeds per frame — the TPU tunnel caches (program, args)
    result pairs, so fixed-seed reruns would measure the cache;
  * a scalar is fetched per frame to force execution (dispatch is lazy);
  * rays are counted exactly: one ray = one live scene query inside the
    bounce loop (integrator.trace carries the counter).

Goldens: tests/goldens/config{N}.png, rendered at GOLDEN_* resolution with
seed GOLDEN_SEED (tests/test_goldens.py pins the same images on CPU).
"""
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GOLDEN_W, GOLDEN_H, GOLDEN_SPP = 160, 120, 4
GOLDEN_SEED = 1234
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tests", "goldens")

# (width, height, spp, bounces, raytracing)
BENCH_PARAMS = {
    1: (800, 600, 1, 6, False),
    2: (800, 600, 64, 6, True),
    3: (800, 600, 128, 6, True),
    4: (800, 600, 256, 6, True),
    # texture-mapped workload (map_Kd/map_Pr/map_norm active — the mapMtl
    # stage the other configs compile away; VERDICT r2 #5)
    6: (800, 600, 64, 6, True),
}
HERO_SPP_TARGET = 4096


def build_scene():
    """Kept for profiling scripts: the config-#3 scene."""
    from pathtracer0_tpu import scenes
    return scenes.obj_bvh().build(max_leaf=4)


def _frame_kwargs(cfg, info):
    from pathtracer0_tpu.render.renderer import _frame_params

    return dict(
        info=info, params=_frame_params(cfg), width=cfg.width,
        height=cfg.height, spp=cfg.samples_per_frame,
        raytracing=cfg.raytracing, auto_focus=False,
        cam_size=cfg.cam_size, focal_length=cfg.focal_length,
        blur=cfg.blur, focal_distance=cfg.focal_distance,
    )


def run_config(n, rng, n_frames):
    import jax.numpy as jnp
    from pathtracer0_tpu import RenderConfig, scenes
    from pathtracer0_tpu.render.renderer import render_frame
    from pathtracer0_tpu.utils import image as img_util

    w, h, spp, bounces, raytracing = BENCH_PARAMS[n]
    dev, info = scenes.BUILDERS[n]().build(max_leaf=4)
    cam, rot = scenes.CAMERAS[n]
    cam = jnp.asarray(cam, jnp.float32)
    rot = jnp.asarray(rot, jnp.float32)

    # --- golden RMSE (fixed seed, small frame) --------------------------
    gcfg = RenderConfig(width=GOLDEN_W, height=GOLDEN_H,
                        samples_per_frame=GOLDEN_SPP, max_bounces=bounces,
                        raytracing=raytracing, auto_focus=False, blur=0.0)
    gimg, _ = render_frame(dev, cam, rot, jnp.uint32(GOLDEN_SEED),
                           **_frame_kwargs(gcfg, info))
    import numpy as np
    gimg = np.asarray(gimg)
    gpath = os.path.join(GOLDEN_DIR, f"config{n}.png")
    if os.path.exists(gpath):
        golden = img_util.read_png(gpath)
        rmse = img_util.rmse(np.clip(gimg, 0, 1), golden)
    else:
        rmse = None
    # TPU-rendered golden (tools/make_tpu_goldens.py): same compute path
    # as this run, so its floor is PNG quantization (~0.001), not the
    # ~0.009 CPU-vs-fused knife-edge — catches subtle shading regressions
    # the CPU golden cannot (VERDICT r3 weak #7)
    tpath = os.path.join(GOLDEN_DIR, f"config{n}_tpu.png")
    if os.path.exists(tpath):
        tgolden = img_util.read_png(tpath)
        rmse_tpu = img_util.rmse(np.clip(gimg, 0, 1), tgolden)
    else:
        rmse_tpu = None

    # --- throughput (full config, random seeds) -------------------------
    # spp is capped per frame for timing (16 amortizes fixed per-frame
    # costs the way the real 64-256 spp configs do; rays/s is otherwise
    # spp-independent)
    time_spp = min(spp, 16)
    cfg = RenderConfig(width=w, height=h, samples_per_frame=time_spp,
                       max_bounces=bounces, raytracing=raytracing,
                       auto_focus=False, blur=0.001)
    kw = _frame_kwargs(cfg, info)
    # n_frames accumulation frames in ONE dispatch (render_frames_accum):
    # the TPU tunnel costs ~24 ms per dispatch even pipelined (PERF.md), so
    # per-frame dispatch would measure the tunnel, not the chip. Fresh
    # seeds per run (the tunnel caches (program, args) -> result).
    from pathtracer0_tpu.render.renderer import render_frames_accum

    def seeds():
        import numpy as np
        return jnp.asarray(
            [rng.randrange(1, 2 ** 31) for _ in range(n_frames)],
            jnp.uint32)

    # config 1 is a ~9 ms whitted frame: amortize the ~24 ms tunnel
    # dispatch over more accumulation frames, like a real progressive
    # session does (the other configs are 10x longer per frame)
    if n == 1:
        n_frames = n_frames * 4
    sum0 = jnp.zeros((h, w, 3), jnp.float32)
    rays0 = jnp.zeros((), jnp.float32)
    _, r = render_frames_accum(dev, cam, rot, seeds(), sum0, rays0, **kw)
    _ = float(r)  # compile + warm
    t0 = time.perf_counter()
    img, r = render_frames_accum(dev, cam, rot, seeds(), sum0, rays0, **kw)
    tot = float(r)
    dt = (time.perf_counter() - t0) / n_frames
    mrays = tot / n_frames / dt / 1e6
    samples_s = w * h * time_spp / dt
    full_frame_s = dt * (spp / time_spp)
    return {
        "metric": f"config{n}: {w}x{h}x{spp}spp "
                  + ("path" if raytracing else "whitted"),
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "samples_per_s": round(samples_s, 0),
        "rmse_vs_golden": None if rmse is None else round(rmse, 5),
        "rmse_vs_tpu_golden": None if rmse_tpu is None
        else round(rmse_tpu, 5),
        "est_full_frame_s": round(full_frame_s, 3),
        # amortization regime (ADVICE r3 #5): dispatch overhead is spread
        # over n_frames accumulation frames; throughput timed at time_spp
        "n_frames": n_frames,
        "time_spp": time_spp,
        "vs_baseline": round(mrays / 100.0, 4),
    }


def run_hero(rng, frames):
    """Config #5: progressive 1080p accumulation loop with checkpointing
    semantics (Renderer), reporting samples/s and estimated time to the
    4096-spp target."""
    import numpy as np
    import jax.numpy as jnp
    from pathtracer0_tpu import RenderConfig, Renderer, scenes

    dev, info = scenes.BUILDERS[5]().build(max_leaf=4)
    cam, rot = scenes.CAMERAS[5]
    cfg = RenderConfig(width=1920, height=1080, samples_per_frame=8,
                       max_bounces=6, auto_focus=False, blur=0.001)
    r = Renderer(dev, info, cfg, cam_pos=np.asarray(cam, np.float32),
                 cam_rot=np.asarray(rot, np.float32))
    r.render(frames=frames, chunk=frames)  # warm up + compile
    rays0 = r.rays_traced  # host-syncs: pipeline empty at t0
    t0 = time.perf_counter()
    r.render(frames=frames, chunk=frames)  # ONE dispatch for all frames
    rays1 = r.rays_traced  # single sync drains the dispatch
    dt = (time.perf_counter() - t0) / frames
    mrays = (rays1 - rays0) / frames / dt / 1e6
    samples_s = cfg.width * cfg.height * cfg.samples_per_frame / dt
    t_target = HERO_SPP_TARGET / cfg.samples_per_frame * dt

    # --- time-to-target-RMSE (BASELINE.md config 5) ---------------------
    # Converged reference: keep accumulating the warm renderer; tracked
    # run: a FRESH accumulation (independent seed stream) measured
    # frame-by-frame against the reference in display space ([0,1] clip,
    # like the golden RMSE). Wall time uses the dispatch-amortized dt from
    # the throughput phase; if the target is not crossed within the
    # tracked window, extrapolate with the 1/sqrt(n) MC convergence law.
    target_rmse = 0.01
    ref_frames = int(os.environ.get("BENCH_HERO_REF_FRAMES", "48"))
    track_frames = int(os.environ.get("BENCH_HERO_TRACK_FRAMES", "16"))
    r.render(frames=max(ref_frames - 2 * frames, 1), chunk=16)
    ref_img = np.clip(np.asarray(r.display_image()), 0.0, 1.0)
    r2 = Renderer(dev, info, cfg, cam_pos=np.asarray(cam, np.float32),
                  cam_rot=np.asarray(rot, np.float32), seed=1)
    n_cross = None
    rmse_n = None
    for nf in range(1, track_frames + 1):
        img = np.clip(np.asarray(r2.render(frames=1)), 0.0, 1.0)
        rmse_n = float(np.sqrt(np.mean((img - ref_img) ** 2)))
        if rmse_n <= target_rmse:
            n_cross = nf
            break
    if n_cross is not None:
        t_rmse = n_cross * dt
        measured = True
    else:
        n_est = track_frames * (rmse_n / target_rmse) ** 2
        t_rmse = n_est * dt
        measured = False
    # measured end-to-end 4096-spp run (tools/run_hero_full.py writes
    # HERO_RUN.json: wall time, checkpoint cadence, residual noise) — the
    # estimate stays for cross-checking the extrapolation (VERDICT r4 #5)
    hero_run = None
    hero_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "HERO_RUN.json")
    if os.path.exists(hero_path):
        with open(hero_path) as f:
            hero_run = json.load(f)
    return {
        "metric": "config5: progressive 1920x1080 hero, 8spp/frame",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "samples_per_s": round(samples_s, 0),
        "est_time_to_4096spp_s": round(t_target, 1),
        "measured_time_to_4096spp_s": None if hero_run is None
        else hero_run["time_to_4096spp_s"],
        "measured_residual_noise_at_4096spp": None if hero_run is None
        else hero_run["residual_noise_per_image"],
        "time_to_rmse_0.01_s": round(t_rmse, 1),
        "rmse_track": {"frames": track_frames if n_cross is None
                       else n_cross,
                       "rmse": round(rmse_n, 5), "measured": measured,
                       "ref_frames": ref_frames},
        "n_frames": frames,
        "vs_baseline": round(mrays / 100.0, 4),
    }


def run_scale(rng, n=708, tag="scale", frames=None, spp=2):
    """Procedural terrain through the HBM-streamed LBVH (accel/lbvh.py):
    reports build time and frame throughput. n=708 -> ~1.0M triangles;
    n=1416 -> ~4.0M, the scale the reference itself attempted
    (dispatch.java:1798 \"im attemping to raytrace a 4000000 tri scene\")."""
    import numpy as np
    import jax.numpy as jnp
    from pathtracer0_tpu import Scene, RenderConfig
    from pathtracer0_tpu.render.renderer import render_frame

    ext = 50.0 * (n / 708.0)  # constant triangle density at any n
    xs = np.linspace(-ext, ext, n)
    X, Z = np.meshgrid(xs, xs)
    Y = (np.sin(X * 0.35) * np.cos(Z * 0.28) * 1.8
         + np.sin(X * 0.09 + 1.3) * 4.0
         + np.random.RandomState(0).rand(n, n) * 0.15)
    P = np.stack([X, Y, Z], axis=-1)
    # indexed form (Scene.add_mesh_indexed): same triangles/vertex VALUES
    # as the expanded grid corners, but the build ships ~n^2 shared
    # vertices + faces instead of three expanded 4M-row f32 columns —
    # the 4M-tri ingest's dominant cost was that ~200 MB tunnel transfer
    # (PERF.md round-5 ingest lever)
    g = np.arange(n * n, dtype=np.int64).reshape(n, n)
    ga = g[:-1, :-1].reshape(-1)
    gb = g[1:, :-1].reshape(-1)
    gc = g[:-1, 1:].reshape(-1)
    gd = g[1:, 1:].reshape(-1)
    faces = np.concatenate([
        np.stack([ga, gb, gc], axis=1),
        np.stack([gd, gb, gc], axis=1),
    ])
    sc = Scene()
    sc.set_constant_sky((0.5, 0.6, 0.9))
    sc.add_material("terrain")
    sc.set_last_mtl("Kd", (0.45, 0.52, 0.38))
    sc.set_last_mtl("Pr", 1.0)
    sc.add_mesh_indexed(P.reshape(-1, 3), faces, 0)
    t0 = time.perf_counter()
    dev, info = sc.build(RenderConfig())
    build_s = time.perf_counter() - t0
    n_tris = dev.num_tris

    cfg = RenderConfig(width=800, height=600, samples_per_frame=spp,
                       max_bounces=3, auto_focus=False, blur=0.0)
    kw = _frame_kwargs(cfg, info)
    scale = 50.0 * (n / 708.0)  # keep terrain feature density constant
    cam = jnp.asarray([0.0, 14.0, -scale * 1.16], jnp.float32)
    rot = jnp.asarray([0.25, 0.0, 0.0], jnp.float32)
    img, r = render_frame(dev, cam, rot,
                          jnp.uint32(rng.randrange(1, 2 ** 31)), **kw)
    _ = float(r)
    if frames is None:
        frames = int(os.environ.get("BENCH_SCALE_FRAMES", "5"))
    # Per-frame timing with a forcing scalar fetch per frame (PERF.md
    # measurement pitfalls): this path varies +-40% with host CPU/tunnel
    # contention, so report min AND median over >= several frames instead
    # of one aggregate (VERDICT r4 #4 bench hygiene).
    rates, times = [], []
    for _k in range(frames):
        t1 = time.perf_counter()
        img, r = render_frame(dev, cam, rot,
                              jnp.uint32(rng.randrange(1, 2 ** 31)), **kw)
        r = float(r)  # forces the frame (lazy execution otherwise)
        dt = time.perf_counter() - t1
        times.append(dt)
        rates.append(r / dt / 1e6)
    rates.sort()
    times.sort()
    med_rate = rates[len(rates) // 2]
    return {
        "metric": f"{tag}: {n_tris} tris (HBM-streamed LBVH), "
                  f"800x600x{spp}spp path",
        "value": round(med_rate, 3),
        "unit": "Mrays/s",
        "build_s": round(build_s, 1),
        "frame_s": round(times[len(times) // 2], 2),
        "frame_s_min": round(times[0], 2),
        "frame_s_max": round(times[-1], 2),
        "n_frames": frames,
        "mrays_best": round(rates[-1], 3),
        "note": "median over per-frame timings; spread = host CPU/tunnel "
                "contention (PERF.md)",
        "vs_baseline": round(med_rate / 100.0, 4),
    }


def run_bigtex(rng):
    """Big-texture regime (VERDICT r4 #7): the config-6-class scene with
    a 128x128 checker floor map — the top of the round-5 lifted in-kernel
    envelope (kernels/fused.py MAP_TEXEL_BUDGET; PERF.md "in-kernel map
    envelope" table). Keeps the large-map regime visible in BENCH json:
    under the round-4 envelope this scene demoted to the ~4.5 Mrays/s
    whole-scene XLA path. Reference analogue: any-size bindless textures,
    frag.glsl:210-225."""
    import jax.numpy as jnp
    from pathtracer0_tpu import RenderConfig
    from pathtracer0_tpu.render.renderer import render_frame
    from tools.diag_bigmap import build_with_checker

    sc = build_with_checker(128)
    dev, info = sc.build(max_leaf=4)
    in_kernel = bool(getattr(info, "fs_maps_ok", False))
    cam = jnp.asarray((0.0, 1.1, 0.0), jnp.float32)
    rot = jnp.asarray((0.12, 0.0, 0.0), jnp.float32)
    cfg = RenderConfig(width=800, height=600, samples_per_frame=16,
                       max_bounces=6, auto_focus=False, blur=0.0)
    kw = _frame_kwargs(cfg, info)
    img, r = render_frame(dev, cam, rot,
                          jnp.uint32(rng.randrange(1, 2 ** 31)), **kw)
    _ = float(r)  # compile + warm
    rates = []
    for _k in range(3):
        t0 = time.perf_counter()
        img, r = render_frame(dev, cam, rot,
                              jnp.uint32(rng.randrange(1, 2 ** 31)), **kw)
        rays = float(r)
        rates.append(rays / (time.perf_counter() - t0) / 1e6)
    rates.sort()
    med = rates[len(rates) // 2]
    return {
        "metric": "bigtex: 128x128 map_Kd (17664 texels), 800x600x16spp "
                  "path",
        "value": round(med, 3),
        "unit": "Mrays/s",
        "map_path": "in-kernel" if in_kernel else "XLA",
        "mrays_best": round(rates[-1], 3),
        "n_frames": 3,
        "note": "top of the lifted in-kernel map envelope; was ~4.5 "
                "Mrays/s (XLA demotion) under the round-4 envelope",
        "vs_baseline": round(med / 100.0, 4),
    }


def main():
    import jax
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # 0: persist even sub-second programs — the scale builds dispatch a
    # handful of small device-expansion jits whose per-process recompiles
    # (~0.5 s each) otherwise land in build_s (PERF.md round-5)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    rng = random.Random(time.time_ns())
    n_frames = int(os.environ.get("BENCH_FRAMES", "5"))
    hero_frames = int(os.environ.get("BENCH_HERO_FRAMES", "2"))
    only = os.environ.get("BENCH_ONLY")

    results = {}
    # the 1M-tri scale config runs FIRST: its scene build (~20 s incl. the
    # LBVH and the ~0.6 GB table upload) must not contend with pending
    # async work from the other configs
    if (not only or only == "scale") and os.environ.get(
            "BENCH_SCALE", "1") != "0":
        print(json.dumps(run_scale(rng)), flush=True)
    # 4M-triangle demonstration (the reference's own scale anecdote,
    # dispatch.java:1798): build + render one frame
    if (not only or only == "4m") and os.environ.get(
            "BENCH_4M", "1") != "0":
        print(json.dumps(run_scale(rng, n=1416, tag="scale4m", frames=3,
                                   spp=1)), flush=True)
    for n in (1, 2, 3, 4, 6):
        if only and str(n) != only:
            continue
        results[n] = run_config(n, rng, n_frames)
        print(json.dumps(results[n]), flush=True)
    if not only or only == "5":
        results[5] = run_hero(rng, hero_frames)
        print(json.dumps(results[5]), flush=True)
    # big-texture regime (lifted in-kernel envelope, PERF.md round-5)
    if (not only or only == "bigtex") and os.environ.get(
            "BENCH_BIGTEX", "1") != "0":
        print(json.dumps(run_bigtex(rng)), flush=True)

    # THE driver line (last): headline config-#3 throughput
    if not results:
        return
    head = results.get(3) or next(iter(results.values()))
    print(json.dumps({
        "metric": "path-trace throughput, OBJ+BVH scene (config 3), "
                  "single chip",
        "value": head["value"],
        "unit": "Mrays/s",
        "vs_baseline": head["vs_baseline"],
    }), flush=True)


if __name__ == "__main__":
    main()
