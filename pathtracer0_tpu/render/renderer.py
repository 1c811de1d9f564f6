"""Progressive renderer: the frame loop, accumulation, and screenshots.

TPU-native replacement for the reference's dispatch/frame machinery
(dispatch.java:593-713 + frag.glsl:884-933):
  * render_frame — one full frame (all pixels x samples_per_frame), jitted
  * Renderer     — progressive accumulation state (sum image + frame count,
    the reference's rgba32f FRAME image + u_frameCount, frag.glsl:924-933),
    reset-on-change (dispatch.java:646-691, resetTexture 732-735),
    screenshots (dispatch.java:804-851), checkpoint/resume, telemetry.

Per-sample semantics match the shader main() (frag.glsl:884-915): one RNG
stream per pixel seeded index + frame_seed, carried across the frame's
samples; DOF origin jitter per sample; autofocus = center-ray hit distance
(probed once per frame — it is pixel-independent, frag.glsl:901-906).
"""
from __future__ import annotations

import dataclasses
import datetime
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..core import camera, rng as vrng
from ..kernels import traverse
from ..scene.packing import DeviceScene, StaticSceneInfo
from . import integrator
from .integrator import TraceParams


def _frame_params(config: RenderConfig):
    return TraceParams(
        max_bounces=config.max_bounces,
        stack_depth=config.traversal_stack_depth,
        refraction_stack=config.refraction_stack_depth,
        pallas=config.pallas,
        fused=config.fused,
        ray_batch_size=config.ray_batch_size,
        legacy_shading=config.legacy_shading,
        legacy_pathtrace=config.legacy_pathtrace,
    )


def render_rays(
    scene: DeviceScene,
    uv,
    index,
    cam_pos,
    cam_rot,
    frame_seed,
    ifd,
    *,
    info: StaticSceneInfo,
    params: TraceParams,
    spp: int,
    raytracing: bool,
    cam_size: float,
    focal_length: float,
    screen_h_ratio: float,
    blur: float,
):
    """Core wavefront step over a FLAT ray batch: uv (N, 2), index (N,).
    Returns (color (N, 3), rays_traced scalar). This is the unit that
    shards over a device mesh (dist/mesh.py) — pixels are independent, the
    scene is replicated, so no collectives are needed until image assembly.

    Batches beyond params.ray_batch_size are split into chunks scanned
    sequentially on-device (lax.map) so a frame's live-state footprint
    (~30 arrays x chunk) stays inside a fixed memory envelope regardless
    of resolution x spp; per-pixel RNG streams are chunk-invariant, so
    results are identical to the unchunked path.

    When params.fold_spp is set the spp samples are folded into the ray
    axis (one batch of spp*N rays) instead of looping sequentially.
    Sample k seeds its RNG as if it were pixel index + k*stride of a
    taller image (PARITY.md #13: the reference carries ONE stream per
    pixel through all its samples; folding gives each sample an
    independent stream — a different but equally unbiased estimator; set
    fold_spp=False for draw-for-draw stream parity)."""
    n = uv.shape[0]
    cb = params.ray_batch_size
    if cb and n > cb:
        n_chunks = -(-n // cb)
        # minimal padding: even chunks, rounded to the 128-lane packet
        cb_eff = -(-(-(-n // n_chunks)) // 128) * 128
        n_pad = n_chunks * cb_eff
        uv_p = jnp.concatenate(
            [uv, jnp.broadcast_to(uv[-1:], (n_pad - n, 2))])
        idx_p = jnp.concatenate(
            [index, jnp.broadcast_to(index[-1:], (n_pad - n,))])

        def chunk_fn(args):
            uv_c, idx_c = args
            return render_rays(
                scene, uv_c, idx_c, cam_pos, cam_rot, frame_seed, ifd,
                info=info, params=params._replace(ray_batch_size=0),
                spp=spp, raytracing=raytracing, cam_size=cam_size,
                focal_length=focal_length, screen_h_ratio=screen_h_ratio,
                blur=blur,
            )

        cols, rays = jax.lax.map(
            chunk_fn,
            (uv_p.reshape(n_chunks, cb_eff, 2),
             idx_p.reshape(n_chunks, cb_eff)),
        )
        return cols.reshape(n_pad, 3)[:n], jnp.sum(rays)

    direction = camera.primary_directions(
        uv, cam_rot, cam_size, focal_length, screen_h_ratio
    )
    origin = jnp.broadcast_to(cam_pos, direction.shape)
    ifd_b = jnp.broadcast_to(ifd, direction.shape[:-1])
    n = uv.shape[0]

    if params.fold_spp and spp > 1:
        # sample-stream stride: a shard-invariant odd constant (NOT the
        # local pixel count — tiled multi-chip rendering must produce the
        # same streams as single-device)
        stride = jnp.uint32(2654435769)  # 2^32 / golden ratio
        idx_f = (
            index[None, :].astype(jnp.uint32)
            + (jnp.arange(spp, dtype=jnp.uint32) * stride)[:, None]
        ).reshape(-1)
        state = vrng.seed(idx_f, frame_seed)
        dir_f = jnp.tile(direction, (spp, 1))
        org_f = jnp.tile(origin, (spp, 1))
        ifd_f = jnp.tile(ifd_b, (spp,))
        o_j, d_j, state = camera.dof_ray(
            org_f, dir_f, cam_rot, jnp.float32(blur), ifd_f, state
        )
        if raytracing:
            col, state, rays = integrator.trace(
                o_j, d_j, state, scene, info, params
            )
        else:
            col = integrator.direct_diffuse(o_j, d_j, scene, info, params)
            rays = jnp.float32(spp * n)
        return col.reshape(spp, n, 3).mean(axis=0), rays

    state = vrng.seed(index, frame_seed)

    if raytracing and params.legacy_pathtrace:
        # Legacy deterministic pathTrace (raytrace.glsl:781-899): one
        # evaluation per frame, SAMPLE_RES = spp (shadow-quality knob)
        from ..shade import arealights

        o_j, d_j, state = camera.dof_ray(
            origin, direction, cam_rot, jnp.float32(blur), ifd_b, state
        )
        col, state, rays = arealights.path_trace(
            o_j, d_j, state, scene, info, params, sample_res=spp,
            max_bounces=params.max_bounces,
        )
        return col, rays

    if (not raytracing) and params.legacy_shading and info.lights:
        # Legacy Phong + disk lights: SAMPLE_RES is the shadow grid
        # resolution (raytrace.glsl:712), not a per-pixel sample count —
        # one evaluation per frame, like the legacy compute dispatch.
        from ..shade import arealights

        o_j, d_j, state = camera.dof_ray(
            origin, direction, cam_rot, jnp.float32(blur), ifd_b, state
        )
        col, state = arealights.shade_point(
            o_j, d_j, state, scene, info, params, sample_res=spp
        )
        return col, jnp.float32(n)

    def sample_body(_, carry):
        col_sum, state, rays = carry
        o_j, d_j, state = camera.dof_ray(
            origin, direction, cam_rot, jnp.float32(blur), ifd_b, state
        )
        if raytracing:
            col, state, r = integrator.trace(
                o_j, d_j, state, scene, info, params
            )
        else:
            col = integrator.direct_diffuse(o_j, d_j, scene, info, params)
            r = jnp.float32(uv.shape[0])
        return col_sum + col, state, rays + r

    col_sum, state, rays = jax.lax.fori_loop(
        0, spp, sample_body,
        (jnp.zeros(uv.shape[:-1] + (3,), jnp.float32), state,
         jnp.zeros((), jnp.float32)),
    )
    return col_sum / jnp.float32(spp), rays


def autofocus_distance(scene, cam_pos, cam_rot, focal_distance, *, info,
                       params, auto_focus: bool):
    """Resolve the internal focal distance: the center-ray hit distance when
    autofocus is on (frag.glsl:901-906), else the configured value."""
    ifd = jnp.float32(focal_distance)
    if auto_focus:
        probe_d = camera.center_probe_direction(cam_rot)
        # single probe ray: the vmapped path is cheaper than a padded
        # 1024-lane packet launch
        probe_hit, _ = traverse.ray_scene(
            cam_pos[None], probe_d[None], scene, info,
            stack_depth=params.stack_depth, pallas="off",
        )
        mid = jnp.where(probe_hit.is_hit[0], probe_hit.t[0], -1.0)
        ifd = jnp.where(mid > 0.0, mid, ifd)
    return ifd


def _render_frame_impl(
    scene: DeviceScene,
    cam_pos,
    cam_rot,
    frame_seed,
    *,
    info: StaticSceneInfo,
    params: TraceParams,
    width: int,
    height: int,
    spp: int,
    raytracing: bool,
    auto_focus: bool,
    cam_size: float,
    focal_length: float,
    blur: float,
    focal_distance: float,
):
    ifd = autofocus_distance(
        scene, cam_pos, cam_rot, focal_distance,
        info=info, params=params, auto_focus=auto_focus,
    )

    # Whole-frame megakernel fast path (kernels/fused.render_fused_frame):
    # raygen + DOF + all spp samples + the bounce loop in ONE launch; only
    # the sky pass stays outside. Same RNG streams as the loop below.
    from ..kernels import fused as fused_mod

    # Whitted mode also runs in-kernel (directDiffuse, one closest-hit)
    # unless a subsurface material needs the XLA thickness probe
    whitted_ok = (not raytracing
                  and not getattr(info, "mat_gates", (True,) * 5)[0])
    use_frame = (
        (raytracing or whitted_ok)
        and not params.legacy_shading
        and not params.legacy_pathtrace
        and not params.fold_spp
        and params.fused in ("auto", "on", "interpret")
        and (params.fused != "auto" or jax.default_backend() != "cpu")
        and fused_mod.eligible(info, scene, params)
    )
    if use_frame:
        col, rays = fused_mod.render_fused_frame(
            scene, info, params, cam_pos, cam_rot, frame_seed, ifd,
            width=width, height=height, spp=spp, cam_size=cam_size,
            focal_length=focal_length, blur=blur,
            whitted=not raytracing,
            interpret=(params.fused == "interpret"),
        )
        return col.reshape(height, width, 3), rays

    uv, index = camera.pixel_centers(width, height)
    col, rays = render_rays(
        scene, uv, index, cam_pos, cam_rot, frame_seed, ifd,
        info=info, params=params, spp=spp, raytracing=raytracing,
        cam_size=cam_size, focal_length=focal_length,
        screen_h_ratio=height / float(width), blur=blur,
    )
    return col.reshape(height, width, 3), rays


_FRAME_STATICS = ("info", "params", "width", "height", "spp", "raytracing",
                  "auto_focus", "cam_size", "focal_length", "blur",
                  "focal_distance")


@functools.partial(jax.jit, static_argnames=_FRAME_STATICS)
def render_frame(scene, cam_pos, cam_rot, frame_seed, **kw):
    """One frame: ((H, W, 3) float32 mean of `spp` samples, rays traced)."""
    return _render_frame_impl(scene, cam_pos, cam_rot, frame_seed, **kw)


@functools.partial(jax.jit, static_argnames=_FRAME_STATICS)
def render_frames_accum(scene, cam_pos, cam_rot, frame_seeds, sum0, rays0,
                        **kw):
    """K accumulation frames in ONE dispatch: frame_seeds (K,) uint32;
    returns (sum0 + sum of frames, rays0 + rays). One dispatch matters on
    this setup: per-dispatch overhead is ~24 ms through the TPU tunnel
    (PERF.md), so per-frame op-level accumulation would double-pay it."""

    def step(carry, seed):
        s, r = carry
        img, rays = _render_frame_impl(scene, cam_pos, cam_rot, seed, **kw)
        return (s + img, r + rays), None

    (s, r), _ = jax.lax.scan(step, (sum0, rays0), frame_seeds)
    return s, r


def _heat_color(box, leaf):
    """The exact frag.glsl:534 formula: 0.01 red per visited leaf (the
    0.1 per-leaf term scaled by the final *0.1), blue exp(0.01*(box-200)),
    and red exp(0.02*(tri-150)) — where the reference NEVER increments
    triTests, so the red exp term is the constant exp(-3)."""
    box = box.astype(jnp.float32)
    leaf = leaf.astype(jnp.float32)
    red = 0.01 * leaf + jnp.float32(np.exp(0.02 * (0.0 - 150.0)))
    blue = jnp.exp(0.01 * (box - 200.0))
    return jnp.stack([red, jnp.zeros_like(red), blue], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("info", "params", "width", "height",
                     "cam_size", "focal_length"),
)
def render_debug_frame(scene, cam_pos, cam_rot, *, info, params,
                       width, height, cam_size, focal_length):
    """DEBUG mode: BVH traversal-cost heatmap (frag.glsl:534, 539-547).

    XLA path (CPU / small batches): exact per-object semantics — the heat
    color is computed per object and averaged, like debugRayScene.

    Packet paths (TPU wf/streamed): the kernels traverse the whole forest
    in one launch and report PER-BLOCK box/leaf counters (every lane in a
    packet pays every visit, so the block count IS the per-ray cost);
    the color is computed from the forest totals divided by the object
    count — same scale, per-block granularity."""
    uv, _ = camera.pixel_centers(width, height)
    h_ratio = height / float(width)
    d = camera.primary_directions(uv, cam_rot, cam_size, focal_length,
                                  h_ratio)
    o = jnp.broadcast_to(cam_pos, d.shape)

    use_packet = (info.streamed
                  or (info.wf_ok and jax.default_backend() != "cpu"))
    if info.num_objects == 0 and not info.streamed:
        return jnp.zeros((height, width, 3), jnp.float32)

    if use_packet:
        box, leaf = traverse.heat_counts(o, d, scene, info,
                                         pallas=params.pallas)
        n_obj = max(info.num_objects, info.num_tri_objects, 1)
        img = _heat_color(box, leaf) / jnp.float32(n_obj)
        return img.reshape(height, width, 3)

    leaf_cap = max(info.max_leaf_size, 1)

    def probe(o1, d1):
        total = jnp.zeros(3, jnp.float32)
        for i in range(info.num_objects):
            root = scene.roots[i]
            _, _, _, _, (box, lf) = traverse._traverse_object(
                o1 + 1e-4 * d1, d1, root, traverse.MISS, scene,
                params.stack_depth, leaf_cap,
            )
            total = total + _heat_color(box, lf) / max(info.num_objects, 1)
        return total

    img = jax.vmap(probe)(o, d)
    return img.reshape(height, width, 3)


@dataclasses.dataclass
class Renderer:
    """Progressive accumulation driver (the reference's FRAME image +
    FRAMES_STILL counter + reset-on-change, dispatch.java:593-713)."""

    scene: DeviceScene
    info: StaticSceneInfo
    config: RenderConfig
    cam_pos: np.ndarray = None
    cam_rot: np.ndarray = None
    seed: int = 0

    def __post_init__(self):
        if self.cam_pos is None:
            self.cam_pos = np.zeros(3, np.float32)
        if self.cam_rot is None:
            self.cam_rot = np.zeros(3, np.float32)
        self.cam_pos = jnp.asarray(self.cam_pos, jnp.float32)
        self.cam_rot = jnp.asarray(self.cam_rot, jnp.float32)
        self._sum = jnp.zeros(
            (self.config.height, self.config.width, 3), jnp.float32
        )
        self._count = 0
        self._frame_index = 0
        # ray counter accumulated ON DEVICE: fetching it per frame would
        # host-sync the pipeline (~39 ms round trip on this setup, PERF.md)
        # — the reference never syncs per frame either (glFinish only on
        # screenshot, dispatch.java:794)
        self._rays_dev = jnp.zeros((), jnp.float32)
        self._rng = np.random.RandomState(self.seed)
        # frame seeds actually drawn from self._rng (≠ _frame_index when
        # callers pass explicit seeds) — the bit-identical-resume contract
        # needs the true draw count (ADVICE r2)
        self._seed_draws = 0

    @property
    def rays_traced(self) -> float:
        """Total live scene queries so far. Fetching forces a host sync —
        read it for reporting, not inside the frame loop."""
        return float(self._rays_dev)

    # -- state ----------------------------------------------------------
    def reset_accumulation(self):
        """resetTexture (dispatch.java:732-735): clears the running sum."""
        self._sum = jnp.zeros_like(self._sum)
        self._count = 0

    def move_camera(self, pos=None, rot=None):
        """Camera motion resets accumulation (dispatch.java:646-667)."""
        if pos is not None:
            self.cam_pos = jnp.asarray(pos, jnp.float32)
        if rot is not None:
            self.cam_rot = jnp.asarray(rot, jnp.float32)
        self.reset_accumulation()

    # -- rendering --------------------------------------------------------
    def step(self, frame_seed: Optional[int] = None) -> jax.Array:
        """Render one frame and fold it into the accumulation; returns the
        current display image (sum / count, frag.glsl:924-933)."""
        cfg = self.config
        if frame_seed is None:
            # u_seed = random int each frame (dispatch.java:698)
            frame_seed = int(self._rng.randint(0, 10000))
            self._seed_draws += 1
        if cfg.debug:
            frame = render_debug_frame(
                self.scene, self.cam_pos, self.cam_rot,
                info=self.info, params=_frame_params(cfg),
                width=cfg.width, height=cfg.height,
                cam_size=cfg.cam_size, focal_length=cfg.focal_length,
            )
            self._sum = self._sum + frame
        else:
            self._accum_frames([frame_seed])
        self._count += 1
        self._frame_index += 1
        return self.display_image()

    def _accum_frames(self, seeds):
        """Fold len(seeds) frames into the accumulation in ONE dispatch."""
        cfg = self.config
        self._sum, self._rays_dev = render_frames_accum(
            self.scene, self.cam_pos, self.cam_rot,
            jnp.asarray(seeds, jnp.uint32), self._sum, self._rays_dev,
            info=self.info, params=_frame_params(cfg),
            width=cfg.width, height=cfg.height,
            spp=cfg.samples_per_frame, raytracing=cfg.raytracing,
            auto_focus=cfg.auto_focus, cam_size=cfg.cam_size,
            focal_length=cfg.focal_length, blur=cfg.blur,
            focal_distance=cfg.focal_distance,
        )

    def render(self, frames: int = 1, chunk: int = 8) -> jax.Array:
        """Accumulate `frames` frames, dispatching up to `chunk` frames per
        device call (a scan over seeds — bounds the number of distinct
        compiled K values while amortizing per-dispatch overhead)."""
        if self.config.debug:
            for _ in range(frames):
                self.step()
            return self.display_image()
        left = frames
        while left > 0:
            k = min(chunk, left)
            seeds = [int(self._rng.randint(0, 10000)) for _ in range(k)]
            self._seed_draws += k
            self._accum_frames(seeds)
            self._count += k
            self._frame_index += k
            left -= k
        return self.display_image()

    def display_image(self) -> jax.Array:
        return self._sum / jnp.float32(max(self._count, 1))

    # -- I/O ----------------------------------------------------------------
    def screenshot(self, filename: Optional[str] = None,
                   directory: str = "screenshots") -> str:
        """PNG of the current display image, vertically flipped like the
        reference readback (dispatch.java:804-851)."""
        from ..utils import image as img_util

        os.makedirs(directory, exist_ok=True)
        if filename is None:
            filename = "GLSL_render.png"  # dispatch.java:795
        path = os.path.join(directory, filename)
        img_util.write_png(path, np.asarray(self.display_image()))
        return path

    def auto_screenshot(self) -> str:
        """autoScreenshot_<frames>_<timestamp>.png (dispatch.java:595-599)."""
        stamp = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M")
        return self.screenshot(
            f"autoScreenshot_{self._count}_{stamp}.png"
        )

    def pick(self, px: int, py: int):
        """Headless mouse inspector (frag.glsl:888-893): probe the scene
        through pixel (px, py) — (0, 0) is bottom-left, GL convention —
        and return a dict with the surface normal, material index, hit
        distance, object id, and primitive kind (0 none, 1 tri, 2
        implicit, 3 ellipsoid). The reference renders mouse_scene.norm
        under the cursor; this returns the full probe record."""
        cfg = self.config
        u = (px + 0.5) / float(cfg.width)
        v = (py + 0.5) / float(cfg.height)
        uv = jnp.asarray([[u, v]], jnp.float32)
        d = camera.primary_directions(
            uv, self.cam_rot, cfg.cam_size, cfg.focal_length,
            cfg.screen_h_ratio,
        )
        o = jnp.broadcast_to(self.cam_pos, d.shape)
        hit, o_n = traverse.ray_scene(
            o, d, self.scene, self.info,
            stack_depth=cfg.traversal_stack_depth, pallas=cfg.pallas,
        )
        surf = traverse.surface_sample(hit, o_n, d, self.scene,
                                       info=self.info)
        return {
            "normal": np.asarray(surf.norm[0]),
            "material": int(surf.mat[0]),
            "distance": float(hit.t[0]),
            "obj": int(hit.obj[0]),
            "kind": int(hit.kind[0]),
            "hit": bool(hit.is_hit[0]),
            "loc": np.asarray(surf.loc[0]),
        }

    def display_image_with_pick(self, px: int, py: int,
                                radius: float = 0.005) -> np.ndarray:
        """In-image mouse-inspector overlay (frag.glsl:888-893): pixels
        whose texCoord lies within `radius` (texture-coordinate units,
        the reference's 0.5%) of the cursor display the surface normal
        under the cursor instead of the render — the visual-parity twin
        of `pick`, which returns the probe record."""
        rec = self.pick(px, py)
        cfg = self.config
        u = (np.arange(cfg.width, dtype=np.float32) + 0.5) / cfg.width
        v = (np.arange(cfg.height, dtype=np.float32) + 0.5) / cfg.height
        cu = (px + 0.5) / cfg.width
        cv = (py + 0.5) / cfg.height
        du = (u - cu)[None, :]
        dv = (v - cv)[:, None]
        mask = du * du + dv * dv < radius * radius
        out = np.asarray(self.display_image()).copy()
        out[mask] = rec["normal"]
        return out

    def telemetry(self) -> str:
        """The stdin `telemetry` command (dispatch.java:785-792)."""
        p = np.asarray(self.cam_pos)
        r = np.asarray(self.cam_rot)
        return (
            f"Camera Position: \n({p[0]},{p[1]},{p[2]})\n"
            f"Rotation:\n({r[0]},{r[1]},{r[2]})"
        )

    # -- checkpoint/resume ---------------------------------------------------
    def save_checkpoint(self, path: str):
        """Persist (sum, count, seed state) — the accumulation buffer IS the
        render checkpoint (SURVEY.md §5); resuming continues adding frames
        with identical RNG streams."""
        np.savez(
            path,
            sum=np.asarray(self._sum),
            count=self._count,
            frame_index=self._frame_index,
            seed_draws=self._seed_draws,
            cam_pos=np.asarray(self.cam_pos),
            cam_rot=np.asarray(self.cam_rot),
        )
        # The RNG stream position is recovered from seed_draws + seed.

    def load_checkpoint(self, path: str):
        data = np.load(path, allow_pickle=False)
        self._sum = jnp.asarray(data["sum"])
        self._count = int(data["count"])
        self._frame_index = int(data["frame_index"])
        self.cam_pos = jnp.asarray(data["cam_pos"])
        self.cam_rot = jnp.asarray(data["cam_rot"])
        self._rng = np.random.RandomState(self.seed)
        # Fast-forward by the draws actually consumed (older checkpoints
        # without the counter fall back to frame_index).
        self._seed_draws = int(data["seed_draws"]) if "seed_draws" in data \
            else self._frame_index
        for _ in range(self._seed_draws):
            self._rng.randint(0, 10000)
