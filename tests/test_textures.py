"""Textured OBJ IO + texture sampling + lighting (utils/textures.py) --
the rebuilt equivalents of the reference's load_textures /
create_texture_image CUDA kernels and lighting.py."""
import numpy as np
import pytest

from chore_tpu.utils import textures as T


@pytest.fixture
def quad_obj(tmp_path):
    """Unit quad in the z=2 plane, textured left-half red / right-half
    green, written as OBJ + MTL + png."""
    import cv2

    tex = np.zeros((8, 8, 3), np.float32)
    tex[:, :4] = [1, 0, 0]
    tex[:, 4:] = [0, 1, 0]
    cv2.imwrite(str(tmp_path / "quad.png"),
                (tex[..., ::-1] * 255).astype(np.uint8))
    (tmp_path / "quad.mtl").write_text(
        "newmtl material_1\nmap_Kd quad.png\n")
    # v-up OBJ uvs; quad from (-.5,-.5) to (.5,.5) at z=2
    (tmp_path / "quad.obj").write_text("\n".join([
        "mtllib quad.mtl",
        "v -0.5 -0.5 2", "v 0.5 -0.5 2", "v 0.5 0.5 2", "v -0.5 0.5 2",
        "vt 0 0", "vt 1 0", "vt 1 1", "vt 0 1",
        "usemtl material_1",
        "f 1/1 2/2 3/3 4/4",  # quad -> fan-triangulated
    ]) + "\n")
    return str(tmp_path / "quad.obj")


class TestObjIO:
    def test_load(self, quad_obj):
        m = T.load_obj_textured(quad_obj)
        assert m["verts"].shape == (4, 3)
        assert m["faces"].shape == (2, 3)  # quad triangulated
        assert m["uv_faces"].shape == (2, 3, 2)
        assert m["texture"].shape == (8, 8, 3)
        # OBJ vt (0,0) is bottom-left -> image coords (0, 1)
        np.testing.assert_allclose(m["uv_faces"][0, 0], [0, 1], atol=1e-6)

    def test_save_load_roundtrip(self, quad_obj, tmp_path):
        m = T.load_obj_textured(quad_obj)
        out = str(tmp_path / "rt" / "mesh.obj")
        import os

        os.makedirs(os.path.dirname(out))
        T.save_obj_textured(out, m["verts"], m["faces"], m["uv_faces"],
                            m["texture"])
        m2 = T.load_obj_textured(out)
        np.testing.assert_allclose(m2["verts"], m["verts"], atol=1e-6)
        np.testing.assert_array_equal(m2["faces"], m["faces"])
        np.testing.assert_allclose(m2["uv_faces"], m["uv_faces"], atol=1e-6)
        np.testing.assert_allclose(m2["texture"], m["texture"],
                                   atol=1.0 / 255)


class TestFaceTextures:
    def test_sample_colors(self, quad_obj):
        m = T.load_obj_textured(quad_obj)
        ft = np.asarray(T.sample_face_textures(m["texture"], m["uv_faces"],
                                               texture_size=4))
        assert ft.shape == (2, 4, 4, 3)
        # face 0 spans uv (0,1)-(1,1)-(1,0): lattice b1=1 corner (j=3, i=0)
        # sits at image u=1 -> green; b1=0 corner -> red
        np.testing.assert_allclose(ft[0, 0, 0], [1, 0, 0], atol=1e-5)
        np.testing.assert_allclose(ft[0, 0, 3], [0, 1, 0], atol=1e-5)

    def test_degenerate_1px_texture(self):
        """1-pixel-wide/tall textures must not NaN (division by W-1=0)."""
        uv_faces = np.array([[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]],
                            np.float32)
        for shape in ((1, 1, 3), (1, 5, 3), (5, 1, 3)):
            tex = np.full(shape, 0.25, np.float32)
            ft = np.asarray(T.sample_face_textures(tex, uv_faces,
                                                   texture_size=2))
            assert np.isfinite(ft).all(), shape
            np.testing.assert_allclose(ft, 0.25, atol=1e-6)

    def test_atlas_roundtrip(self):
        """create_texture_image inverse: pack patches, re-sample, recover."""
        rng = np.random.RandomState(0)
        ts, F = 6, 5
        face_tex = rng.rand(F, ts, ts, 3).astype(np.float32)
        atlas, uv = T.atlas_from_face_textures(face_tex)
        back = np.asarray(T.sample_face_textures(atlas, uv, ts))
        # exact on the valid (lower-left) triangle of the lattice
        i, j = np.meshgrid(np.arange(ts), np.arange(ts), indexing="ij")
        tri = (i + j) <= (ts - 1)
        np.testing.assert_allclose(back[:, tri], face_tex[:, tri], atol=1e-5)


class TestLighting:
    def test_ambient_plus_directional(self):
        n = np.array([[0, 1, 0], [0, -1, 0], [1, 0, 0]], np.float32)
        inten = T.lighting(n, light_dir=(0, 1, 0), ambient=0.3,
                           directional=0.7, two_sided=False)
        np.testing.assert_allclose(inten, [1.0, 0.3, 0.3], atol=1e-6)
        inten2 = T.lighting(n, light_dir=(0, 1, 0), ambient=0.3,
                            directional=0.7, two_sided=True)
        np.testing.assert_allclose(inten2, [1.0, 1.0, 0.3], atol=1e-6)


class TestRenderTextured:
    def test_quad_colors_on_screen(self, quad_obj):
        m = T.load_obj_textured(quad_obj)
        K = np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32)
        img, mask = T.render_textured(
            m["verts"], m["faces"], m["uv_faces"], m["texture"], K,
            image_size=64, ambient=1.0, directional=0.0)
        assert mask.any()
        ys, xs = np.nonzero(mask)
        left = img[ys[xs < xs.mean()], xs[xs < xs.mean()]]
        right = img[ys[xs > xs.mean()], xs[xs > xs.mean()]]
        # quad x<0 maps to texture u<0.5 = red, x>0 -> green
        assert left[:, 0].mean() > 0.8 and left[:, 1].mean() < 0.2
        assert right[:, 1].mean() > 0.8 and right[:, 0].mean() < 0.2

    def test_mask_matches_geometry(self, quad_obj):
        m = T.load_obj_textured(quad_obj)
        K = np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32)
        _, mask = T.render_textured(
            m["verts"], m["faces"], m["uv_faces"], m["texture"], K,
            image_size=64)
        # quad spans +-0.5 at z=2 -> +-0.25 in unit coords -> half the image
        frac = mask.mean()
        assert 0.15 < frac < 0.35


class TestRenderMeshesTextured:
    def test_mixed_flat_and_textured(self, quad_obj):
        """render_meshes: one flat mesh + one textured mesh, single
        z-buffer pass (the demo overlay path)."""
        from chore_tpu.utils.render import render_meshes

        m = T.load_obj_textured(quad_obj)
        # second quad: same geometry shifted left and farther away (flat)
        v2 = m["verts"] + np.array([-1.2, 0, 1.0], np.float32)
        K = np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32)
        img, mask = render_meshes(
            [(v2, m["faces"]), (m["verts"], m["faces"])],
            colors=[(0.0, 0.0, 1.0), (1.0, 1.0, 1.0)],
            image_size=64, K=K,
            textures=[None, (m["uv_faces"], m["texture"])],
            ambient=1.0, directional=0.0,
        )
        assert mask.any()
        on = img[mask]
        # textured quad contributes red+green pixels, flat quad blue ones
        assert (on[:, 0] > 0.8).any() and (on[:, 1] > 0.8).any()
        assert (on[:, 2] > 0.8).any()
