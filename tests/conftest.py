"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX trick for exercising multi-chip sharding without
hardware (SURVEY.md §4). Note: this environment's sitecustomize registers
the 'axon' TPU backend and force-sets jax_platforms='axon,cpu' in EVERY
process, so setting the env var is not enough — we override the config back
to cpu after import, before any backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def simple_scene():
    """Analytic scene: two spheres + constant sky (BASELINE config #1)."""
    from pathtracer0_tpu import Scene

    sc = Scene()
    sc.set_constant_sky((0.6, 0.7, 0.9))
    sc.add_material("diffuse_red")
    sc.set_last_mtl("Kd", (0.8, 0.2, 0.2))
    sc.set_last_mtl("Pr", 1.0)
    sc.add_material("floorish")
    sc.set_last_mtl("Kd", (0.7, 0.7, 0.7))
    sc.set_last_mtl("Pr", 1.0)
    sc.add_sphere((0.0, 0.0, 3.0), 1.0, m=0)
    sc.add_ellipsoid((0.0, -101.0, 3.0), (1, 1, 1), (0, 0, 0), 100.0, m=1)
    return sc


@pytest.fixture(scope="session")
def table_scene():
    """The reference's OBJ fixture (multi-object, v-only faces)."""
    from pathtracer0_tpu import Scene

    sc = Scene()
    sc.set_constant_sky((0.3, 0.4, 0.6))
    sc.add_material("default")
    sc.set_last_mtl("Kd", (0.75, 0.7, 0.6))
    sc.set_last_mtl("Pr", 1.0)
    sc.add_object(
        "/root/reference/src/objs/table - Copy.obj",
        material=0,
        scale=(0.02, 0.02, 0.02),
        shift=(0.0, 0.0, 3.0),
        rot=(0.3, 0.7, 0.0),
    )
    return sc


@pytest.fixture(scope="session")
def rng_batch():
    return np.arange(4096, dtype=np.uint32) * 7919 + 12345
