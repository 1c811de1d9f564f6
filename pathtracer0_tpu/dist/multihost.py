"""Multi-host distribution skeleton (SURVEY.md §7 step 7; VERDICT r2 #8).

Scaling model across hosts, matching the single-host design in
dist/mesh.py:

  * `initialize()` wires `jax.distributed` once per process (coordinator
    address + process count from args or PT0_* env vars) and degrades to a
    no-op in a single-process run — all downstream code works unchanged.
  * the scene pytree is REPLICATED to every device of every host (one
    broadcast at build time, the SSBO-upload analogue);
  * the pixel axis is sharded hierarchically: each PROCESS owns a
    contiguous row slab of the image (`local_rows`), and renders it over
    its LOCAL devices with dist/mesh.render_frame_tiled — so all per-frame
    traffic rides ICI inside a host and NOTHING crosses DCN during
    rendering (pixel tiles are independent, SURVEY.md §2.3);
  * the only DCN crossing is the final image assembly: ONE
    `process_allgather` of the finished row slabs per readback
    (`assemble_image`), the analogue of the reference's single
    glReadPixels (dispatch.java:813). Progressive accumulation keeps the
    running sum device-local between readbacks, so a K-frame accumulation
    pays the DCN gather once, not K times.

A true multi-host run needs one process per host:

    PT0_COORDINATOR=host0:1234 PT0_NUM_PROCESSES=4 PT0_PROCESS_ID=k \\
        python -m pathtracer0_tpu ...

Everything here is exercised single-process by tests/test_dist.py; the
driver's dryrun validates the sharded step compiles + executes on a
virtual 8-device mesh (__graft_entry__.dryrun_multichip).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when configured; no-op otherwise.

    Resolution order: explicit args, then PT0_COORDINATOR /
    PT0_NUM_PROCESSES / PT0_PROCESS_ID env vars. Returns True iff a
    multi-process runtime was initialized."""
    coordinator_address = coordinator_address or os.environ.get(
        "PT0_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("PT0_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("PT0_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if not coordinator_address or not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_info() -> tuple:
    """(process_index, process_count) — (0, 1) when not distributed."""
    return jax.process_index(), jax.process_count()


def local_rows(height: int) -> tuple:
    """This process's contiguous image row slab [start, stop): near-equal
    split of `height` over the process count, remainder to the low ids."""
    pid, n = process_info()
    base = height // n
    rem = height % n
    start = pid * base + min(pid, rem)
    stop = start + base + (1 if pid < rem else 0)
    return start, stop


def local_mesh():
    """1-D mesh over THIS process's local devices (per-host ICI domain)."""
    from .mesh import make_mesh

    return make_mesh(devices=jax.local_devices())


def render_local_slab(scene, cam_pos, cam_rot, frame_seed, mesh, *,
                      info, params, width: int, height: int, spp: int,
                      raytracing: bool, auto_focus: bool, cam_size: float,
                      focal_length: float, blur: float,
                      focal_distance: float):
    """Render this process's row slab of the full image over its local
    mesh. Returns ((rows, W, 3) slab, rays). The camera model is evaluated
    for the FULL image; only the rows in [start, stop) are traced, with
    per-pixel RNG streams identical to a single-process render (the seed
    index is the global pixel index)."""
    from .mesh import render_frame_tiled

    start, stop = local_rows(height)
    img, rays = render_frame_tiled(
        scene, cam_pos, cam_rot, frame_seed, mesh,
        info=info, params=params, width=width, height=height, spp=spp,
        raytracing=raytracing, auto_focus=auto_focus, cam_size=cam_size,
        focal_length=focal_length, blur=blur,
        focal_distance=focal_distance,
        row_range=(start, stop),
    )
    return img, rays


def assemble_image(local_slab, height: int):
    """DCN tile assembly: all-gather every process's row slab into the full
    (H, W, 3) image — the ONE cross-host transfer per readback. Slabs may
    differ by one row; each is padded to the max slab height for the
    fixed-shape allgather and trimmed after."""
    pid, n = process_info()
    if n == 1:
        return np.asarray(local_slab)
    from jax.experimental import multihost_utils

    base = height // n
    rem = height % n
    max_rows = base + (1 if rem else 0)
    slab = np.asarray(local_slab)
    pad = max_rows - slab.shape[0]
    if pad:
        slab = np.concatenate(
            [slab, np.zeros((pad,) + slab.shape[1:], slab.dtype)])
    gathered = multihost_utils.process_allgather(slab)  # (n, max_rows, W, 3)
    rows = []
    for p in range(n):
        cnt = base + (1 if p < rem else 0)
        rows.append(np.asarray(gathered[p])[:cnt])
    return np.concatenate(rows, axis=0)
