"""Stage-by-stage timing on the real chip: where does the frame time go?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
import numpy as np
from bench import build_scene
from pathtracer0_tpu import RenderConfig
from pathtracer0_tpu.render.renderer import render_frame, _frame_params
from pathtracer0_tpu.render import integrator
from pathtracer0_tpu.kernels import traverse, wavefront
from pathtracer0_tpu.core import camera, rng as vrng

dev, info = build_scene()
print("wf_ok:", info.wf_ok, "num_objects:", info.num_objects,
      "max_leaf:", info.max_leaf_size, "nodes:", dev.wf_nodes_f.shape,
      "tris rows:", dev.wf_tris.shape, file=sys.stderr)

cfg = RenderConfig(width=800, height=600, samples_per_frame=4,
                   max_bounces=6, auto_focus=False, blur=0.001)
params = _frame_params(cfg)
B = 800 * 600
uv, index = camera.pixel_centers(800, 600)
cam = jnp.asarray([0.0, 1.2, 0.0], jnp.float32)
rot = jnp.asarray([0.25, 0.0, 0.0], jnp.float32)
d = camera.primary_directions(uv, rot, cfg.cam_size, cfg.focal_length, 600/800.)
o = jnp.broadcast_to(cam, d.shape)
state = vrng.seed(index, jnp.uint32(7))

def timeit(name, fn, *args, n=5, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:45s} {dt*1e3:10.2f} ms   {B/dt/1e6:8.2f} Mrays/s")
    return r

# 1. Pallas traversal alone (no sort)
f = jax.jit(lambda o, d: traverse.ray_scene(o, d, dev, info, pallas="on",
                                            sort_rays=False))
timeit("ray_scene pallas (no sort)", f, o, d)

# 1b. with octant sort
f2 = jax.jit(lambda o, d: traverse.ray_scene(o, d, dev, info, pallas="on",
                                             sort_rays=True))
timeit("ray_scene pallas (sorted)", f2, o, d)

# 1c. XLA vmapped fallback
f3 = jax.jit(lambda o, d: traverse.ray_scene(o, d, dev, info, pallas="off"))
# timeit("ray_scene XLA vmapped", f3, o, d, n=1)  # faults the TPU!

# 2. raw wavefront kernel alone (just the pallas_call, no merge/perm)
rb = wavefront.LANES * 256
b_pad = ((B + rb - 1) // rb) * rb
o3 = jnp.concatenate([o, jnp.zeros((b_pad - B, 3))]).T
d3 = jnp.concatenate([d, jnp.ones((b_pad - B, 3))]).T
t_init = jnp.concatenate([jnp.full((B,), wavefront.MISS),
                          jnp.zeros((b_pad - B,))])
g = jax.jit(lambda o3, d3, t: wavefront.trace_forest(
    o3, d3, t, dev.wf_roots, dev.wf_nodes_f, dev.wf_nodes_i, dev.wf_tris,
    leaf_cap=max(info.max_leaf_size, 1), block_rows=256))
timeit("raw trace_forest kernel", g, o3, d3, t_init)

# 3. surface_sample + material decode + maps (shading setup)
hit, o_n = f(o, d)
jax.block_until_ready(hit)
h = jax.jit(lambda hit, o_n, d: integrator._shade_setup(
    hit, o_n, d, dev, params, info=info))
timeit("shade_setup (surface+mtl+maps)", h, hit, o_n, d)

# 4. choose_ray
from pathtracer0_tpu.shade import bsdf, mtl as mtl_mod
surf, m, n = h(hit, o_n, d)
jax.block_until_ready(n)
n1 = jnp.full((B,), 1.0029); n2 = m.Ni
cr = jax.jit(lambda m, n1, n2, n, d, s: bsdf.choose_ray(m, n1, n2, n, d, s))
timeit("choose_ray", cr, m, n1, n2, n, d, state)

# 5. sky
from pathtracer0_tpu.scene.texture import sky_color
sk = jax.jit(lambda d: sky_color(dev.tex_data, dev.tex_sizes, d))
timeit("sky_color", sk, d)

# 6. argsort alone
srt = jax.jit(lambda d: jnp.argsort(
    (d[:, 0] < 0).astype(jnp.int32) * 4 + (d[:, 1] < 0).astype(jnp.int32) * 2
    + (d[:, 2] < 0).astype(jnp.int32), stable=True))
timeit("octant argsort", srt, d)

# 7. one full trace (6 bounces, 1 spp)
tr = jax.jit(lambda o, d, s: integrator.trace(o, d, s, dev, info, params))
timeit("integrator.trace 6-bounce 1spp", tr, o, d, state, n=2)

# 8. full frame (4 spp)
kw = dict(info=info, params=params, width=800, height=600, spp=4,
          raytracing=True, auto_focus=False, cam_size=cfg.cam_size,
          focal_length=cfg.focal_length, blur=cfg.blur,
          focal_distance=cfg.focal_distance)
fr = lambda: render_frame(dev, cam, rot, jnp.uint32(3), **kw)
timeit("render_frame 800x600x4spp", fr, n=1)
