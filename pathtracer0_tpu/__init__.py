"""pathtracer0_tpu — a TPU-native (JAX/XLA/Pallas) wavefront path tracer.

A ground-up rebuild of focksss/pathtracer-0 (Java + GLSL progressive path
tracer; reference mounted at /root/reference) designed for TPUs: SoA
megabatches of rays flow through jitted wavefront stages (raygen ->
BVH-traverse/intersect -> shade/sample -> accumulate), with counted,
per-ray PCG random streams and pjit/shard_map scaling over a device mesh.

Quick start:

    from pathtracer0_tpu import Scene, RenderConfig, Renderer

    sc = Scene()
    sc.set_constant_sky((0.6, 0.7, 0.9))
    m = sc.add_material("red")
    m.set("Kd", (0.8, 0.2, 0.2))
    sc.add_sphere((0, 0, 3), 1.0, m=0)
    dev, info = sc.build()

    cfg = RenderConfig(width=800, height=600, samples_per_frame=1)
    r = Renderer(dev, info, cfg)
    r.step()
    r.screenshot("out.png")
"""

from .config import RenderConfig
from .scene.scene import Scene
from .scene.packing import DeviceScene, StaticSceneInfo
from .scene.material import Material
from .render.renderer import Renderer, render_frame
from .render.integrator import TraceParams

__all__ = [
    "RenderConfig",
    "Scene",
    "DeviceScene",
    "StaticSceneInfo",
    "Material",
    "Renderer",
    "render_frame",
    "TraceParams",
]

__version__ = "0.1.0"
