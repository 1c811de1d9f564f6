"""Scene layer tests: OBJ/MTL parsing, material packing, textures."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer0_tpu.scene.material import (
    COL, Material, pack_materials, parse_mtl,
)
from pathtracer0_tpu.scene.objparse import TriangleSoA, parse_obj
from pathtracer0_tpu.scene.texture import (
    TextureRegistry, sample_bilinear, sky_color,
)
from pathtracer0_tpu import Scene


class TestOBJ:
    def test_table_fixture(self):
        """The reference's fixture: 5 objects, 60 tris, v-only faces
        (no vt/vn), exercising flat normals and no-UV paths."""
        soa = TriangleSoA()
        parse_obj(
            "/root/reference/src/objs/table - Copy.obj", soa,
            material=3, scale=(1, 1, 1), shift=(0, 0, 0), rot=(0, 0, 0),
        )
        assert len(soa) == 60
        assert len(soa.object_ranges) == 5
        assert soa.object_ranges[0] == (0, 12)
        assert all(not h for h in soa.has_uv)
        assert all(not s for s in soa.has_smooth)
        assert all(m == 3 for m in soa.mat)
        # flat normals are unit length and identical across slots
        for i in range(60):
            assert abs(np.linalg.norm(soa.n1[i]) - 1.0) < 1e-12
            np.testing.assert_array_equal(soa.n1[i], soa.n2[i])

    def test_transform_order(self, tmp_path):
        """Vertex transform = scale -> rotate(Rz Ry Rx) -> shift
        (dispatch.java:938)."""
        p = tmp_path / "t.obj"
        p.write_text("o x\nv 1 0 0\nv 0 1 0\nv 0 0 1\nf 1 2 3\n")
        soa = TriangleSoA()
        parse_obj(str(p), soa, 0, scale=(2, 2, 2),
                  shift=(1, 0, 0), rot=(0, np.pi / 2, 0))
        # v1=(1,0,0): scale->(2,0,0), rotY(pi/2): x->(cos)x+(sin)z= 0,
        # z -> -(sin)x = -2; then shift -> (1, 0, -2)
        np.testing.assert_allclose(soa.v1[0], [1, 0, -2], atol=1e-12)

    def test_quad_drops_fourth_vertex(self, tmp_path):
        p = tmp_path / "q.obj"
        p.write_text("o x\nv 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
        soa = TriangleSoA()
        parse_obj(str(p), soa, 0, (1, 1, 1), (0, 0, 0), (0, 0, 0))
        assert len(soa) == 1  # one tri from the first 3 verts

    def test_usemtl_last_match_wins(self, tmp_path):
        p = tmp_path / "m.obj"
        p.write_text(
            "o x\nusemtl foo\nv 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
        )
        soa = TriangleSoA()
        parse_obj(str(p), soa, 0, (1, 1, 1), (0, 0, 0), (0, 0, 0),
                  material_names=["foo", "bar", "foo"], parent_dir="")
        assert soa.mat[0] == 2


class TestMTL:
    def _parse(self, tmp_path, text):
        p = tmp_path / "test.mtl"
        p.write_text(text)
        mats = []
        reg = TextureRegistry()
        parse_mtl(str(p), str(tmp_path), mats, reg)
        return mats, reg

    def test_basic_fields(self, tmp_path):
        mats, _ = self._parse(
            tmp_path,
            "newmtl glass\nKd 0.1 0.2 0.3\nNs 250\nNi 1.45\nillum 7\n"
            "Tf 0.9 0.8 0.7\nPr 0.05\nPm 0.1\nPc 0.5\nPcr 0.25\n",
        )
        m = mats[0]
        assert m.name == "glass" + str(tmp_path)
        assert m.Kd == (0.1, 0.2, 0.3)
        assert m.Ns == 250 and m.Ni == 1.45 and m.illum == 7
        assert m.Tf == (0.9, 0.8, 0.7)
        assert (m.Pr, m.Pm, m.Pc, m.Pcr) == (0.05, 0.1, 0.5, 0.25)

    def test_d_tr_complement(self, tmp_path):
        mats, _ = self._parse(tmp_path, "newmtl a\nd 0.3\n\nnewmtl b\nTr 0.2\n")
        assert abs(mats[0].Tr - 0.7) < 1e-12
        assert abs(mats[1].d - 0.8) < 1e-12

    def test_ke_sets_density(self, tmp_path):
        """Ke also sets Density = |Ke| (dispatch.java:1357-1361)."""
        mats, _ = self._parse(tmp_path, "newmtl e\nKe 3 0 4\n")
        assert abs(mats[0].Density - 5.0) < 1e-12

    def test_custom_subsurface(self, tmp_path):
        mats, _ = self._parse(
            tmp_path,
            "newmtl s\nsubsurface 0.5\nsubsurfaceColor 1 0.5 0.2\n"
            "subsurfaceRadius 1 2 3\nDensity 0.7\n",
        )
        m = mats[0]
        assert m.subsurface == 0.5
        assert m.subsurfaceColor == (1.0, 0.5, 0.2)
        assert m.subsurfaceRadius == (1.0, 2.0, 3.0)
        assert m.Density == 0.7

    def test_map_registration(self, tmp_path):
        from PIL import Image

        img = Image.fromarray(
            (np.random.RandomState(0).rand(4, 4, 3) * 255).astype(np.uint8))
        img.save(tmp_path / "albedo.png")
        img.save(tmp_path / "rough.png")
        mats, reg = self._parse(
            tmp_path,
            "newmtl t\nmap_Kd albedo.png\nmap_Pr rough.png\n"
            "map_Ke albedo.png\n",
        )
        m = mats[0]
        assert m.map_Kd == 0 and m.map_Pr == 1
        assert m.map_Ke == 0  # deduped by name
        assert len(reg) == 2

    def test_defaults_match_reference(self):
        m = Material()
        assert m.Kd == (0.8, 0.8, 0.8) and m.Ks == (0.5, 0.5, 0.5)
        assert m.Ns == 10 and m.Ni == 1 and m.Pr == 1 and m.Density == 1
        assert m.map_Kd == -1 and m.illum == 0


class TestPacking:
    def test_record_layout(self):
        m = Material(Ka=(1, 2, 3), Kd=(4, 5, 6), Ks=(7, 8, 9), Ns=10,
                     d=11, Tr=12, Tf=(13, 14, 15), Ni=16, Ke=(17, 18, 19),
                     Density=20, illum=21)
        rec = m.pack()
        assert rec.shape == (48,)
        # Layout mirrors the GLSL decode order (frag.glsl:172-207)
        np.testing.assert_array_equal(rec[0:3], [1, 2, 3])
        np.testing.assert_array_equal(rec[3:6], [4, 5, 6])
        np.testing.assert_array_equal(rec[6:9], [7, 8, 9])
        assert rec[COL["Ns"]] == 10 and rec[COL["d"]] == 11
        assert rec[COL["Tr"]] == 12
        np.testing.assert_array_equal(rec[COL["Tf"]:COL["Tf"] + 3],
                                      [13, 14, 15])
        assert rec[COL["Ni"]] == 16
        np.testing.assert_array_equal(rec[COL["Ke"]:COL["Ke"] + 3],
                                      [17, 18, 19])
        assert rec[COL["Density"]] == 20 and rec[COL["illum"]] == 21
        assert rec[COL["map_Kd"]] == -1

    def test_decode_roundtrip(self):
        from pathtracer0_tpu.shade import mtl as mtl_mod

        m = Material(Kd=(0.1, 0.2, 0.3), Ni=1.45, Pr=0.07, illum=7,
                     subsurfaceRadius=(1, 2, 3))
        packed = jnp.asarray(pack_materials([Material(), m]))
        dec, _ = mtl_mod.decode(packed, jnp.array([1, 0]))
        np.testing.assert_allclose(np.asarray(dec.Kd[0]), [0.1, 0.2, 0.3],
                                   rtol=1e-6)
        assert abs(float(dec.Ni[0]) - 1.45) < 1e-6
        assert int(dec.illum[0]) == 7
        np.testing.assert_allclose(np.asarray(dec.subsurfaceRadius[0]),
                                   [1, 2, 3])
        # row 1 decodes the defaults
        np.testing.assert_allclose(np.asarray(dec.Kd[1]), [0.8, 0.8, 0.8])


class TestTextures:
    def test_bilinear_center_exact(self):
        reg = TextureRegistry()
        img = np.arange(12, dtype=np.float32).reshape(2, 2, 3) / 12.0
        reg.register_array(img, "t")
        data, sizes = reg.pack()
        # texel centers: uv = (0.25, 0.25) -> texel (0, 0)
        out = sample_bilinear(
            jnp.asarray(data), jnp.asarray(sizes),
            jnp.zeros((1,), jnp.int32), jnp.array([[0.25, 0.25]]),
        )
        np.testing.assert_allclose(np.asarray(out)[0], img[0, 0], atol=1e-6)

    def test_bilinear_midpoint(self):
        reg = TextureRegistry()
        img = np.zeros((1, 2, 3), np.float32)
        img[0, 1] = 1.0
        reg.register_array(img, "t")
        data, sizes = reg.pack()
        out = sample_bilinear(
            jnp.asarray(data), jnp.asarray(sizes),
            jnp.zeros((1,), jnp.int32), jnp.array([[0.5, 0.5]]),
        )
        np.testing.assert_allclose(np.asarray(out)[0], [0.5] * 3, atol=1e-6)

    def test_repeat_wrap(self):
        reg = TextureRegistry()
        img = np.zeros((1, 2, 3), np.float32)
        img[0, 1] = 1.0
        reg.register_array(img, "t")
        data, sizes = reg.pack()
        for u in (-0.75, 0.25, 1.25, 2.25):
            out = sample_bilinear(
                jnp.asarray(data), jnp.asarray(sizes),
                jnp.zeros((1,), jnp.int32),
                jnp.array([[u, 0.5]], jnp.float32),
            )
            np.testing.assert_allclose(np.asarray(out)[0], [0.0] * 3,
                                       atol=1e-5, err_msg=str(u))

    def test_sky_hemispheres(self):
        """Equirect mapping: v=0 is the top row (up). Sampled away from the
        exact poles because GL_REPEAT bilinear wraps across the seam there
        (the reference uses REPEAT too, dispatch.java:353-354)."""
        reg = TextureRegistry()
        img = np.zeros((4, 4, 3), np.float32)
        img[:2] = [1, 0, 0]  # upper hemisphere = red
        img[2:] = [0, 0, 1]  # lower hemisphere = blue
        reg.register_array(img, "sky")
        data, sizes = reg.pack()
        s = float(np.sin(np.pi / 4))
        up = sky_color(jnp.asarray(data), jnp.asarray(sizes),
                       jnp.array([[0.0, s, s]]))    # v = 0.25
        down = sky_color(jnp.asarray(data), jnp.asarray(sizes),
                         jnp.array([[0.0, -s, s]]))  # v = 0.75
        assert np.asarray(up)[0, 0] > 0.9 and np.asarray(up)[0, 2] < 0.1
        assert np.asarray(down)[0, 2] > 0.9 and np.asarray(down)[0, 0] < 0.1


class TestSceneBuild:
    def test_directory_mode(self, tmp_path):
        """Directory objects: all .mtl parsed first, then all .obj
        (dispatch.java:867-886)."""
        (tmp_path / "a.mtl").write_text(
            "newmtl red\nKd 1 0 0\n\nnewmtl blue\nKd 0 0 1\n")
        (tmp_path / "b.obj").write_text(
            "o x\nusemtl blue\nv 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        sc = Scene()
        sc.set_constant_sky()
        sc.add_object(str(tmp_path))
        assert len(sc.materials) == 2
        assert sc.tris.mat[0] == 1  # "blue" + dir
        dev, info = sc.build()
        assert info.num_objects == 1
