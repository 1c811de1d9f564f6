"""Worker for tests/test_dist.py::test_two_process_multihost.

Runs as one of two REAL processes wired through jax.distributed with a
local coordinator (VERDICT r3 #7): exercises multihost.initialize()'s
multi-process branch, per-process row-slab rendering over the process's
local virtual-CPU mesh, and the real cross-process `process_allgather`
assembly (the analogue of the reference's single glReadPixels readback,
dispatch.java:813). Process 0 writes the assembled image to argv[4].

Usage: python multihost_worker.py <coordinator> <num_procs> <pid> <out.npy>
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def build_scene():
    from pathtracer0_tpu import Scene

    sc = Scene()
    sc.set_constant_sky((0.4, 0.5, 0.8))
    sc.add_material("ground")
    sc.set_last_mtl("Kd", (0.6, 0.55, 0.5))
    sc.add_material("red")
    sc.set_last_mtl("Kd", (0.8, 0.2, 0.2))
    sc.add_sphere((0.0, -100.5, 5.0), 100.0, m=0)
    sc.add_sphere((0.0, 0.3, 4.0), 0.8, m=1)
    return sc.build()


def main():
    coordinator, n_procs, pid, out = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    from pathtracer0_tpu.dist import multihost

    ok = multihost.initialize(coordinator_address=coordinator,
                              num_processes=n_procs, process_id=pid)
    assert ok, "initialize() must take the multi-process branch"
    rpid, rn = multihost.process_info()
    assert (rpid, rn) == (pid, n_procs), (rpid, rn)

    from pathtracer0_tpu import RenderConfig
    from pathtracer0_tpu.render.renderer import _frame_params

    dev, info = build_scene()
    W, H = 48, 36
    cfg = RenderConfig(width=W, height=H, samples_per_frame=2,
                       max_bounces=2, auto_focus=False, blur=0.0)
    mesh = multihost.local_mesh()
    import jax.numpy as jnp

    slab, rays = multihost.render_local_slab(
        dev, jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.uint32(321), mesh,
        info=info, params=_frame_params(cfg), width=W, height=H,
        spp=cfg.samples_per_frame, raytracing=cfg.raytracing,
        auto_focus=False, cam_size=cfg.cam_size,
        focal_length=cfg.focal_length, blur=0.0,
        focal_distance=cfg.focal_distance)
    start, stop = multihost.local_rows(H)
    assert np.asarray(slab).shape == (stop - start, W, 3)
    full = multihost.assemble_image(slab, H)
    assert full.shape == (H, W, 3), full.shape
    if rpid == 0:
        np.save(out, full)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
