"""Render configuration.

TPU-native replacement for the reference's compile-time constant block and the
runtime-mutable 12-float params SSBO (reference: dispatch.java:42-74,
dispatch.java:191-211). One dataclass carries both: the static render settings
and the per-frame-adjustable quality parameters (the reference rewrites the
params SSBO for adaptive preview quality, dispatch.java:646-691).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """All parameters the GLSL renderer receives via the params SSBO + host consts.

    Field order / meaning mirrors the params block (frag.glsl:39-52):
      screenSize, focalLength, resolution, screenHratio, SAMPLE_RES, MAX_BOUNCES,
      GAMMA, BLUR, FOCAL_DISTANCE, RAYTRACING, DEBUG, AUTO_FOCUS
    plus host-side constants (dispatch.java:45-61).
    """

    # Image geometry (dispatch.java:49-51, 75)
    width: int = 800
    height: int = 600

    # Camera screen plane (dispatch.java:60-61; frag.glsl:894 uses them directly)
    cam_size: float = 1.5          # `camSize` / `screenSize`
    focal_length: float = 1.0

    # Sampling (dispatch.java:54-55)
    samples_per_frame: int = 8      # SAMPLE_RESOLUTION
    max_bounces: int = 6            # MAX_BOUNCES

    # Depth of field (dispatch.java:57-59; frag.glsl:898-908)
    blur: float = 0.001             # BLUR_STRENGTH: aperture jitter scale
    focal_distance: float = 1.0     # FOCAL_DISTANCE
    auto_focus: bool = True         # AUTO_FOCUS

    # Modes (dispatch.java:52-53; frag.glsl:897-917)
    raytracing: bool = True         # True = path trace, False = Whitted directDiffuse
    debug: bool = False             # True = BVH traversal-cost heatmap
    # Opt-in legacy Phong + emissive-disk area lights (the reference's
    # dead raytrace.glsl subsystem) in Whitted mode
    legacy_shading: bool = False
    # Opt-in legacy DETERMINISTIC pathTrace (raytrace.glsl:781-899):
    # Fresnel-weighted reflect/refract recursion following the stronger
    # branch, single-sampling the weaker; applies in raytracing mode
    legacy_pathtrace: bool = False

    gamma: float = 0.0              # NEGATIVE_GAMMA (unused by the active shader)

    # BVH build parameters (dispatch.java:45-47)
    max_bvh_depth: int = 256        # MAX_BVH_BRANCHES
    max_tris_in_leaf: int = 1       # MAX_TRIS_IN_BVH_LEAF (reference parity value)
    sah_planes: int = 5             # OPTIMIZATION_LEVEL: candidate planes per axis

    # TPU-specific execution knobs (no reference equivalent)
    pallas: str = "auto"            # packet-traversal kernel mode
    fused: str = "auto"             # fused bounce-loop megakernel mode
    ray_batch_size: int = 1 << 20   # rays per on-device chunk (0 = off)
    traversal_stack_depth: int = 64  # frag.glsl:465 `int stack[64]`
    refraction_stack_depth: int = 10  # frag.glsl:136 MAX_REFRACTIONSTACK
    # Meshes above this many triangles skip the reference-parity SAH
    # builder (Python-recursive, hours at millions of tris) and build the
    # vectorized Morton/complete-tree LBVH traced by the HBM-streamed
    # kernel instead (accel/lbvh.py, kernels/wavefront.trace_streamed).
    stream_threshold: int = 65536

    @property
    def screen_h_ratio(self) -> float:
        # dispatch.java:75  screenHratio = HEIGHT / WIDTH
        return self.height / float(self.width)

    @property
    def resolution(self) -> Tuple[int, int]:
        return (self.width, self.height)

    def preview(self) -> "RenderConfig":
        """Adaptive interactive quality: the reference drops to 500px wide,
        4 spp, 2 bounces while the camera moves (dispatch.java:649-662)."""
        w = 500
        h = int(round(500 * self.screen_h_ratio))
        return dataclasses.replace(
            self, width=w, height=h, samples_per_frame=4, max_bounces=2
        )
