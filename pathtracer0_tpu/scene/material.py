"""Material model: MTL + PBR extension + custom fields, packed 48-float records.

Mirrors the reference `material` class (dispatch.java:1279-1576) and the
48-float MTL record layout consumed by the GLSL `newMtl` decoder
(dispatch.java:270-324 packing; frag.glsl:168-209 decode).

Record layout (0-based column in the packed (M, 48) array; the reference
prepends the stride as element 0 of a flat buffer, we keep a 2-D array):

  0-2 Ka | 3-5 Kd | 6-8 Ks | 9 Ns | 10 d | 11 Tr | 12-14 Tf | 15 Ni
  | 16-18 Ke | 19 Density | 20 illum | 21 map_Ka | 22 map_Kd | 23 map_Ks
  | 24 Pm | 25 Pr | 26 Ps | 27 Pc | 28 Pcr | 29 aniso | 30 anisor
  | 31 map_Pm | 32 map_Pr | 33 map_Ps | 34 map_Pc | 35 map_Pcr
  | 36 map_norm | 37 map_d | 38 map_Tr | 39 map_Ns | 40 map_Ke
  | 41 subsurface | 42-44 subsurfaceColor | 45-47 subsurfaceRadius
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Tuple

import numpy as np

NUM_MATERIAL_PARAMETERS = 48  # dispatch.java:97

# Column indices, importable by the device-side decoder (shade/mtl.py).
COL = {
    "Ka": 0, "Kd": 3, "Ks": 6, "Ns": 9, "d": 10, "Tr": 11, "Tf": 12,
    "Ni": 15, "Ke": 16, "Density": 19, "illum": 20, "map_Ka": 21,
    "map_Kd": 22, "map_Ks": 23, "Pm": 24, "Pr": 25, "Ps": 26, "Pc": 27,
    "Pcr": 28, "aniso": 29, "anisor": 30, "map_Pm": 31, "map_Pr": 32,
    "map_Ps": 33, "map_Pc": 34, "map_Pcr": 35, "map_norm": 36, "map_d": 37,
    "map_Tr": 38, "map_Ns": 39, "map_Ke": 40, "subsurface": 41,
    "subsurfaceColor": 42, "subsurfaceRadius": 45,
}

_VEC3_FIELDS = {"Ka", "Kd", "Ks", "Tf", "Ke", "subsurfaceColor",
                "subsurfaceRadius"}


@dataclasses.dataclass
class Material:
    """Defaults match the reference material() ctor (dispatch.java:1514-1550)."""

    name: str = ""
    Ka: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    Kd: Tuple[float, float, float] = (0.8, 0.8, 0.8)
    Ks: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    Ns: float = 10.0
    d: float = 0.0
    Tr: float = 0.0
    Tf: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    Ni: float = 1.0
    Ke: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    Density: float = 1.0
    illum: int = 0
    map_Ka: int = -1
    map_Kd: int = -1
    map_Ks: int = -1
    Pm: float = 0.0
    Pr: float = 1.0
    Ps: float = 0.0
    Pc: float = 0.0
    Pcr: float = 0.0
    aniso: float = 0.0
    anisor: float = 0.0
    map_Pm: int = -1
    map_Pr: int = -1
    map_Ps: int = -1
    map_Pc: int = -1
    map_Pcr: int = -1
    map_norm: int = -1   # map_bump in the host code (dispatch.java:311)
    map_d: int = -1
    map_Tr: int = -1
    map_Ns: int = -1
    map_Ke: int = -1
    subsurface: float = 0.0
    subsurfaceColor: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    subsurfaceRadius: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    def set(self, prop: str, value):
        """Reflection-style setter replacing `scene.setLastMtl`
        (dispatch.java:1054-1062). Accepts scalars or 3-sequences."""
        if not hasattr(self, prop):
            raise AttributeError(f"Not a valid material property: {prop}")
        if prop in _VEC3_FIELDS:
            if np.isscalar(value):
                value = (float(value),) * 3
            else:
                value = tuple(float(x) for x in value)
                if len(value) != 3:
                    raise ValueError(f"{prop} needs 3 components")
        setattr(self, prop, value)

    def pack(self) -> np.ndarray:
        """One 48-float record (dispatch.java:270-324 column order)."""
        out = np.zeros(NUM_MATERIAL_PARAMETERS, np.float32)
        for field, col in COL.items():
            val = getattr(self, field)
            if field in _VEC3_FIELDS:
                out[col:col + 3] = val
            else:
                out[col] = float(val)
        return out


def pack_materials(materials: List[Material]) -> np.ndarray:
    """(M, 48) float32 record array; at least one row (the device decoder
    gathers unconditionally, missing-material index -1 wraps harmlessly)."""
    if not materials:
        return np.zeros((1, NUM_MATERIAL_PARAMETERS), np.float32)
    return np.stack([m.pack() for m in materials])


# MTL keys that register a texture on first use (dispatch.java:1368-1492).
_MAP_KEYS = {
    "map_Ka": "map_Ka", "map_Kd": "map_Kd", "map_Ks": "map_Ks",
    "map_Pm": "map_Pm", "map_Pr": "map_Pr", "refl": "map_Pr",
    "map_Ps": "map_Ps", "map_Pc": "map_Pc", "map_Pcr": "map_Pcr",
    "map_Bump": "map_norm", "bump": "map_norm", "map_bump": "map_norm",
    "map_d": "map_d", "map_Tr": "map_Tr", "map_Ns": "map_Ns",
    "map_Ke": "map_Ke",
}


def parse_mtl(path: str, parent_dir: str, materials: List[Material],
              texture_registry) -> None:
    """Parse a .mtl file, appending to `materials` (dispatch.java:1319-1512).

    Material names are namespaced with the parent directory, matching the
    reference's `name + parentDirectory` lookup key (dispatch.java:1328, 924).
    `texture_registry` is a scene.TextureRegistry: map_* keys register the
    texture image on first use and store its index.
    """
    with open(path, "r", errors="replace") as f:
        lines = iter(f.read().splitlines())
    for line in lines:
        if not line.startswith("newmtl "):
            continue
        mat = Material(name=line.split()[1].strip() + parent_dir)
        # Inner loop: read properties until a blank line (dispatch.java:1329)
        for line in lines:
            if line == "":
                break
            vals = line.split()
            if not vals:
                continue
            key = vals[0]
            try:
                if key == "Ka":
                    mat.Ka = (float(vals[1]), float(vals[2]), float(vals[3]))
                elif key == "Kd":
                    mat.Kd = (float(vals[1]), float(vals[2]), float(vals[3]))
                elif key == "Ks":
                    mat.Ks = (float(vals[1]), float(vals[2]), float(vals[3]))
                elif key == "Ns":
                    mat.Ns = float(vals[1])
                elif key == "d":
                    mat.d = float(vals[1])
                    mat.Tr = 1.0 - mat.d  # dispatch.java:1346
                elif key == "Tr":
                    mat.Tr = float(vals[1])
                    mat.d = 1.0 - mat.Tr  # dispatch.java:1350
                elif key == "Tf":
                    mat.Tf = (float(vals[1]), float(vals[2]), float(vals[3]))
                elif key == "Ni":
                    mat.Ni = float(vals[1])
                elif key == "Ke":
                    ke = (float(vals[1]), float(vals[2]), float(vals[3]))
                    mat.Ke = ke
                    # Ke also sets Density = |Ke| (dispatch.java:1357-1361)
                    mat.Density = float(np.linalg.norm(ke))
                elif key == "Density":
                    mat.Density = float(vals[1])
                elif key == "illum":
                    mat.illum = int(vals[1])
                elif key == "Pm":
                    mat.Pm = float(vals[1])
                elif key == "Pr":
                    mat.Pr = float(vals[1])
                elif key == "Ps":
                    mat.Ps = float(vals[1])
                elif key == "Pc":
                    mat.Pc = float(vals[1])
                elif key == "Pcr":
                    mat.Pcr = float(vals[1])
                elif key == "aniso":
                    mat.aniso = float(vals[1])
                elif key == "anisor":
                    mat.anisor = float(vals[1])
                elif key == "subsurface":
                    mat.subsurface = float(vals[1])
                elif key == "subsurfaceColor":
                    mat.subsurfaceColor = (
                        float(vals[1]), float(vals[2]), float(vals[3]))
                elif key == "subsurfaceRadius":
                    mat.subsurfaceRadius = (
                        float(vals[1]), float(vals[2]), float(vals[3]))
                elif key in _MAP_KEYS or key.startswith("refl"):
                    field = _MAP_KEYS.get(key, "map_Pr")
                    tex_name = vals[1].replace("\\", "/").strip()
                    idx = texture_registry.register(
                        os.path.join(parent_dir, tex_name), tex_name
                    )
                    setattr(mat, field, idx)
            except (IndexError, ValueError):
                # Malformed property line: skip, like a missed startsWith
                continue
        materials.append(mat)
