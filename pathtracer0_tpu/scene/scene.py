"""Scene builder: the host-side API mirroring the reference `scene` class.

Reference API (dispatch.java:866-1064):
    scene.addObject(path, mtl, scale, shift, rot)   -> add_object
    scene.addTri(v1, v2, v3, m)                     -> add_tri
    scene.addEllipsoid(c, stretch, rot, radius, m)  -> add_ellipsoid
    scene.addImplicit(fn, shift, scale, rot, m)     -> add_implicit
    scene.addMaterial(name) / setLastMtl(prop, val) -> add_material /
                                                       set_last_mtl
plus texture-0-is-the-sky (dispatch.java:221-222) via set_sky().

`build()` packs everything into a DeviceScene (scene/packing.py) — the
TPU-resident equivalent of the reference's 12 SSBO uploads.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Union

import numpy as np

from ..config import RenderConfig
from .material import Material, parse_mtl
from .objparse import TriangleSoA, parse_obj
from .texture import TextureRegistry
from . import packing


class _IndexedMesh(dict):
    """Bulk-mesh entry stored in indexed form (Scene.add_mesh_indexed).

    Quacks like the expanded add_mesh dict — per-triangle columns
    ("v1".."v3", "n1".."n3", "uv1".."uv3", "has_uv", "has_smooth", "mat")
    materialize lazily on first access and are cached — while exposing the
    compact (verts, faces) payload for the streamed device-upload fast
    path (scene/packing.py). Expansion matches add_mesh bit-for-bit for
    positions, smooth normals, and UVs (a gather of f64 values commutes
    with everything downstream); flat normals expand host-side here in
    f64 exactly like add_mesh, but the streamed fast path recomputes them
    on device in f32 (see packing._idx_tables_jit)."""

    def __init__(self, verts, faces, mat: int, vnormals=None, vuvs=None):
        super().__init__()
        self.verts = verts          # (V, 3) f64
        self.faces = faces          # (T, 3) i64
        self.mat_id = mat
        self.vnormals = vnormals    # (V, 3) f64 normalized, or None
        self.vuvs = vuvs            # (V, 2) f64, or None

    def __missing__(self, key):
        t = self.faces.shape[0]
        if key in ("v1", "v2", "v3"):
            c = ("v1", "v2", "v3").index(key)
            val = self.verts[self.faces[:, c]]
        elif key in ("n1", "n2", "n3"):
            if self.vnormals is not None:
                c = ("n1", "n2", "n3").index(key)
                val = self.vnormals[self.faces[:, c]]
            else:
                # flat normal, add_mesh convention (dispatch.java:398
                # orientation): (v3-v1) x (v2-v1), normalized, shared by
                # all three slots
                v1, v2, v3 = self["v1"], self["v2"], self["v3"]
                fn = np.cross(v3 - v1, v2 - v1)
                fn = fn / np.maximum(
                    np.linalg.norm(fn, axis=1, keepdims=True), 1e-30)
                self["n1"] = self["n2"] = self["n3"] = fn
                return fn
        elif key in ("uv1", "uv2", "uv3"):
            if self.vuvs is not None:
                c = ("uv1", "uv2", "uv3").index(key)
                val = self.vuvs[self.faces[:, c]]
            else:
                val = np.zeros((t, 2))
        elif key == "has_uv":
            val = np.full(t, self.vuvs is not None, bool)
        elif key == "has_smooth":
            val = np.full(t, self.vnormals is not None, bool)
        elif key == "mat":
            val = np.full(t, self.mat_id, np.int32)
        else:
            raise KeyError(key)
        self[key] = val
        return val


class Scene:
    def __init__(self):
        self.materials: List[Material] = []
        self.textures = TextureRegistry()
        self.tris = TriangleSoA()
        # Implicits (dispatch.java:107-111)
        self.imp_fn: List[int] = []
        self.imp_shift: List[Sequence[float]] = []
        self.imp_scale: List[Sequence[float]] = []
        self.imp_rot: List[Sequence[float]] = []
        self.imp_mat: List[int] = []
        # Ellipsoids (dispatch.java:114-118)
        self.ell_c: List[Sequence[float]] = []
        self.ell_stretch: List[Sequence[float]] = []
        self.ell_rot: List[Sequence[float]] = []
        self.ell_rad: List[float] = []
        self.ell_mat: List[int] = []
        # Bulk meshes (add_mesh): list of dicts of (T, ...) arrays, packed
        # as one object each after all parsed/loose triangles.
        self.bulk_meshes: List[dict] = []
        # Legacy emissive-disk area lights (raytrace.glsl EmissiveData):
        # (kind, id_start, id_end, material, center, radius)
        self.disk_lights: List[tuple] = []
        # Legacy 18-float materials (addMat, dispatch.java:1025-1046 ->
        # SSBO binding 6): the reference's OLD material system, kept
        # alongside the 48-float records exactly as the host does
        # (dispatch.java:94-98 keeps both lists)
        self.legacy_mats: List[tuple] = []

    # -- sky ---------------------------------------------------------------
    def set_sky(self, image: Union[str, np.ndarray], name: str = "sky"):
        """Register the equirect sky as texture 0 (dispatch.java:221-222).
        Must be called before any other texture registration."""
        if len(self.textures):
            raise RuntimeError("set_sky must register texture index 0")
        if isinstance(image, str):
            self.textures.register(image, name)
        else:
            self.textures.register_array(image, name)

    def set_constant_sky(self, color=(0.5, 0.5, 0.5)):
        self.set_sky(np.full((1, 1, 3), 0.0, np.float32) + np.asarray(
            color, np.float32), "sky")

    # -- materials ----------------------------------------------------------
    def add_material(self, name: str) -> Material:
        mat = Material(name=name)
        self.materials.append(mat)
        return mat

    def set_last_mtl(self, prop: str, value):
        if not self.materials:
            raise RuntimeError("no material added yet")
        self.materials[-1].set(prop, value)

    def add_mat(self, KaR, KaG, KaB, KdR, KdG, KdB, KsR, KsG, KsB,
                alpha, reflectivity, transmission, ref_index, emission,
                emissive_radius, solid, absorption, texture_id):
        """Legacy 18-float material (`addMat`, dispatch.java:1025-1046) —
        the reference's OLD material system, uploaded to SSBO binding 6
        (dispatch.java:538-551) and decoded by the legacy compute shader's
        `newMat` (raytrace.glsl:162-178). The active renderer never reads
        these records (frag.glsl has no MatData block; even the legacy
        shader defines newMat but never calls it), so like the reference
        this is a stored-but-dormant registry: packed into
        DeviceScene.legacy_mats and decodable via shade/mtl.decode_legacy.
        Argument order matches the reference signature exactly."""
        self.legacy_mats.append(tuple(float(v) for v in (
            KaR, KaG, KaB, KdR, KdG, KdB, KsR, KsG, KsB,
            alpha, reflectivity, transmission, ref_index, emission,
            emissive_radius, solid, absorption, texture_id)))

    @property
    def _material_names(self) -> List[str]:
        return [m.name for m in self.materials]

    # -- geometry -----------------------------------------------------------
    # OBJ files above this size route to the native C++ tokenizer
    # (scene/native_obj.py): the line-by-line Python parser is the one
    # host path that cannot be vectorized, ~50x slower.
    NATIVE_OBJ_THRESHOLD = 4 << 20  # bytes

    def _parse_obj(self, path: str, material, scale, shift, rot,
                   parent_dir: str):
        from . import native_obj

        force = os.environ.get("PT0_NATIVE_OBJ")
        use_native = (
            force == "1"
            or (force != "0"
                and os.path.getsize(path) > self.NATIVE_OBJ_THRESHOLD)
        )
        if use_native and native_obj.available():
            native_obj.parse_obj_bulk(
                path, self, material, scale, shift, rot,
                self._material_names, parent_dir,
            )
        else:
            parse_obj(path, self.tris, material, scale, shift, rot,
                      self._material_names, parent_dir)

    def add_object(self, filepath: str, material: int = 0,
                   scale=(1.0, 1.0, 1.0), shift=(0.0, 0.0, 0.0),
                   rot=(0.0, 0.0, 0.0)):
        """Directory mode parses all .mtl then all .obj inside; single-file
        mode parses one .obj (dispatch.java:867-886). Large files route to
        the native tokenizer (see _parse_obj)."""
        if os.path.isdir(filepath):
            entries = sorted(os.listdir(filepath))
            mtls = [e for e in entries if e.lower().endswith(".mtl")]
            objs = [e for e in entries if e.lower().endswith(".obj")]
            if not objs:
                print("no obj files found in the directory.")
                return
            for m in mtls:
                parse_mtl(os.path.join(filepath, m), filepath,
                          self.materials, self.textures)
            for o in objs:
                self._parse_obj(os.path.join(filepath, o), material,
                                scale, shift, rot, filepath)
        elif os.path.isfile(filepath) and filepath.lower().endswith(".obj"):
            self._parse_obj(filepath, material, scale, shift, rot, "")
        else:
            raise FileNotFoundError(filepath)

    def add_tri(self, v1, v2, v3, m: int):
        """Single triangle, flat-shaded, no UVs (dispatch.java:1013-1015).
        Its own single-node BVH object (the reference's loose tris never get
        a BVH and are unreachable by the shader — PARITY.md #6; here every
        triangle is traceable)."""
        start = len(self.tris)
        self.tris.add_triangle(
            v1, v2, v3,
            (0, 0, 0), (0, 0, 0), (0, 0, 0),
            (0, 0), (0, 0), (0, 0), False, m,
        )
        self.tris.object_ranges.append((start, start + 1))

    def add_mesh(self, v1, v2, v3, m: int, normals=None, uvs=None):
        """Bulk triangle mesh from arrays — the scalable ingestion path for
        procedural or pre-parsed geometry (per-triangle Python appends are
        O(minutes) at the reference's 4M-triangle scale anecdote,
        dispatch.java:1798).

        v1/v2/v3: (T, 3) float arrays. normals: optional (3, T, 3) or tuple
        of three (T, 3) per-vertex normals (smooth shading); None = flat.
        uvs: optional tuple of three (T, 2) arrays. The mesh packs as ONE
        object after all parsed/loose triangles (object order between
        add_object and add_mesh is not interleaved)."""
        v1 = np.asarray(v1, np.float64).reshape(-1, 3)
        v2 = np.asarray(v2, np.float64).reshape(-1, 3)
        v3 = np.asarray(v3, np.float64).reshape(-1, 3)
        t = v1.shape[0]
        if normals is not None:
            n1, n2, n3 = (np.asarray(n, np.float64).reshape(-1, 3)
                          for n in normals)
            mag = lambda n: np.maximum(
                np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
            n1, n2, n3 = n1 / mag(n1), n2 / mag(n2), n3 / mag(n3)
            has_smooth = np.ones(t, bool)
        else:
            fn = np.cross(v3 - v1, v2 - v1)  # dispatch.java:398 orientation
            fn = fn / np.maximum(
                np.linalg.norm(fn, axis=1, keepdims=True), 1e-30)
            n1 = n2 = n3 = fn
            has_smooth = np.zeros(t, bool)
        if uvs is not None:
            uv1, uv2, uv3 = (np.asarray(u, np.float64).reshape(-1, 2)
                             for u in uvs)
            has_uv = np.ones(t, bool)
        else:
            uv1 = uv2 = uv3 = np.zeros((t, 2))
            has_uv = np.zeros(t, bool)
        self.bulk_meshes.append(dict(
            v1=v1, v2=v2, v3=v3, n1=n1, n2=n2, n3=n3,
            uv1=uv1, uv2=uv2, uv3=uv3, has_uv=has_uv,
            has_smooth=has_smooth,
            mat=np.full(t, int(m), np.int32),
        ))

    def add_mesh_indexed(self, verts, faces, m: int, normals=None,
                         uvs=None):
        """Bulk triangle mesh in INDEXED form: shared vertices + faces.

        verts: (V, 3) float vertex positions. faces: (T, 3) int vertex
        indices (v1, v2, v3 per triangle). normals: optional (V, 3)
        per-vertex normals indexed by the same faces (smooth shading);
        None = flat. uvs: optional (V, 2) per-vertex UVs.

        Semantically identical to
        ``add_mesh(verts[faces[:,0]], verts[faces[:,1]], verts[faces[:,2]],
        m, ...)`` — per-triangle columns expand lazily when a consumer
        needs them — but a streamed build (scene past
        RenderConfig.stream_threshold) ships the COMPACT form to the
        device and expands there: at the reference's 4M-triangle scale
        anecdote (dispatch.java:1798) the expanded f32 vertex columns are
        144 MB of host->device transfer on a ~22-97 MB/s link, vs ~24 MB
        of shared vertices + faces (scene/packing.py)."""
        verts = np.asarray(verts, np.float64).reshape(-1, 3)
        faces = np.asarray(faces, np.int64).reshape(-1, 3)
        if faces.size and (faces.min() < 0 or faces.max() >= len(verts)):
            raise ValueError("face index out of range")
        vn = None
        if normals is not None:
            vn = np.asarray(normals, np.float64).reshape(-1, 3)
            if vn.shape[0] != verts.shape[0]:
                raise ValueError("normals must be per-vertex (V, 3)")
            vn = vn / np.maximum(
                np.linalg.norm(vn, axis=1, keepdims=True), 1e-30)
        vuv = None
        if uvs is not None:
            vuv = np.asarray(uvs, np.float64).reshape(-1, 2)
            if vuv.shape[0] != verts.shape[0]:
                raise ValueError("uvs must be per-vertex (V, 2)")
        self.bulk_meshes.append(_IndexedMesh(verts, faces, int(m),
                                             vn, vuv))

    def add_ellipsoid(self, c, stretch, rot, radius: float, m: int):
        self.ell_c.append(tuple(c))
        self.ell_stretch.append(tuple(stretch))
        self.ell_rot.append(tuple(rot))
        self.ell_rad.append(float(radius))
        self.ell_mat.append(int(m))

    def add_sphere(self, center, radius: float, m: int):
        """Convenience: unit-stretch ellipsoid."""
        self.add_ellipsoid(center, (1.0, 1.0, 1.0), (0.0, 0.0, 0.0),
                           radius, m)

    def add_disk_light(self, center, radius: float, m: int,
                       kind: int = 3, id_start: int = 0, id_end: int = 0):
        """Legacy emissive-disk area light (raytrace.glsl EmissiveData,
        used by the opt-in RenderConfig.legacy_shading mode): a disk at
        `center` with `radius`, emitting material m's Ke, bound to the
        geometry collection (kind: 1 tri / 3 ellipsoid, primitive id
        range) that shadow rays must reach."""
        self.disk_lights.append((int(kind), int(id_start), int(id_end),
                                 int(m), tuple(float(c) for c in center),
                                 float(radius)))

    def add_emissive_sphere(self, center, radius: float, m: int):
        """Convenience: an emissive sphere + its matching disk light."""
        idx = len(self.ell_rad)
        self.add_sphere(center, radius, m)
        self.add_disk_light(center, radius, m, kind=3, id_start=idx,
                            id_end=idx)

    def add_implicit(self, fn: int, shift, scale, rot, m: int):
        self.imp_fn.append(int(fn))
        self.imp_shift.append(tuple(shift))
        self.imp_scale.append(tuple(scale))
        self.imp_rot.append(tuple(rot))
        self.imp_mat.append(int(m))

    # -- packing -------------------------------------------------------------
    def build(self, config: Optional[RenderConfig] = None,
              max_leaf: Optional[int] = None, validate: bool = True):
        """Returns (DeviceScene pytree, StaticSceneInfo).

        validate=True (default) runs cheap structural checks first (scene/
        validate.py): bad material/texture indices, non-finite geometry,
        degenerate primitives fail HERE with the entity named, not inside
        a jitted trace."""
        config = config or RenderConfig()
        if validate:
            from .validate import validate_scene

            validate_scene(self)
        return packing.pack_scene(self, config, max_leaf=max_leaf)
