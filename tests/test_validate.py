"""Build-time scene validation (SURVEY.md §5 failure detection;
VERDICT r2 next #10): malformed input fails at build() with the offending
entity named, not inside a jitted trace."""
import numpy as np
import pytest

from pathtracer0_tpu import Scene
from pathtracer0_tpu.scene.validate import SceneValidationError


def _base():
    sc = Scene()
    sc.set_constant_sky((0.5, 0.5, 0.5))
    sc.add_material("m")
    return sc


def test_bad_material_index():
    sc = _base()
    sc.add_sphere((0, 0, 3), 1.0, m=4)  # only material 0 exists
    with pytest.raises(SceneValidationError, match="material 4"):
        sc.build()


def test_nan_vertex():
    sc = _base()
    sc.add_tri((0, 0, 3), (1, np.nan, 3), (0, 1, 3), 0)
    with pytest.raises(SceneValidationError, match="non-finite"):
        sc.build()


def test_nan_mesh_vertex():
    sc = _base()
    v = np.zeros((2, 3))
    v2 = np.ones((2, 3))
    v3 = np.ones((2, 3)) * 2
    v2[1, 1] = np.inf
    sc.add_mesh(v, v2, v3, 0)
    with pytest.raises(SceneValidationError, match="non-finite"):
        sc.build()


def test_zero_radius_ellipsoid():
    sc = _base()
    sc.add_ellipsoid((0, 0, 3), (1, 1, 1), (0, 0, 0), 0.0, m=0)
    with pytest.raises(SceneValidationError, match="radius"):
        sc.build()


def test_bad_implicit_fn():
    sc = _base()
    sc.add_implicit(11, (0, 0, 3), (1, 1, 1), (0, 0, 0), 0)
    with pytest.raises(SceneValidationError, match="function id"):
        sc.build()


def test_bad_map_index():
    sc = _base()
    sc.set_last_mtl("map_Kd", 7)  # no texture 7 registered
    sc.add_sphere((0, 0, 3), 1.0, m=0)
    with pytest.raises(SceneValidationError, match="map_Kd"):
        sc.build()


def test_valid_scene_builds():
    sc = _base()
    sc.add_sphere((0, 0, 3), 1.0, m=0)
    dev, info = sc.build()
    assert dev.num_tris >= 0


def test_validation_can_be_skipped():
    sc = _base()
    sc.add_sphere((0, 0, 3), 1.0, m=0)
    dev, info = sc.build(validate=False)
    assert info is not None
