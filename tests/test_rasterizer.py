"""Rasterizer tests: analytic coverage of known triangles, gradient flow,
depth ordering, projection conventions."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chore_tpu.ops.rasterizer import (
    hard_rasterize,
    project_unit_k,
    soft_silhouette,
)


def square_mesh(z=2.0, half=0.5, cx=0.0, cy=0.0):
    """Two triangles covering a square in NDC at depth z."""
    v = np.array(
        [
            [cx - half, cy - half, z],
            [cx + half, cy - half, z],
            [cx + half, cy + half, z],
            [cx - half, cy + half, z],
        ],
        np.float32,
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return v, f


class TestProjection:
    def test_unit_k_center(self):
        # a point on the optical axis lands at NDC (2cx-1, 2cy-1)
        K = jnp.array([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]]])
        verts = jnp.array([[[0.0, 0.0, 2.0]]])
        ndc = project_unit_k(verts, K)
        assert np.allclose(ndc[0, 0, :2], 0.0, atol=1e-6)
        assert np.allclose(ndc[0, 0, 2], 2.0)

    def test_photo_orientation(self):
        # +y in camera space goes DOWN in the image; our rasterizers put
        # ndc v=-1 at row 0, so v must INCREASE with camera y for rendered
        # images to match the photo / net-input masks. (NMR flips v in
        # projection but also reverses output rows -- the two cancel;
        # projection.py:39 + rasterize.py:319-331.)
        K = jnp.array([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]]])
        up = project_unit_k(jnp.array([[[0.0, -0.1, 1.0]]]), K)
        down = project_unit_k(jnp.array([[[0.0, 0.1, 1.0]]]), K)
        assert float(down[0, 0, 1]) > float(up[0, 0, 1])

    def test_matches_model_camera(self):
        # project_unit_k with the full-image kinect K must agree with
        # PerspectiveCamera.project_points (no crop): one projection
        # convention across the whole stack
        from chore_tpu.ops.camera import PerspectiveCamera

        cam = PerspectiveCamera()
        K = jnp.array([[[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy],
                        [0, 0, 1.0]]])
        pts = jnp.array([[[0.1, -0.2, 2.0], [-0.3, 0.4, 3.1],
                          [0.0, 0.0, 2.2]]])
        ndc_k = project_unit_k(pts, K)
        ndc_cam = cam.project_points(pts)
        # project_points normalizes y by height (0.75*width): rescale
        np.testing.assert_allclose(
            np.asarray(ndc_k[..., 0]), np.asarray(ndc_cam[..., 0]),
            atol=1e-5)
        vk = np.asarray(ndc_k[..., 1])
        vc = np.asarray(ndc_cam[..., 1])
        np.testing.assert_allclose((vk + 1.0), (vc + 1.0) * 0.75, atol=1e-5)


class TestSoftSilhouette:
    def test_coverage_fraction(self):
        v, f = square_mesh(half=0.5)
        # square spans NDC [-0.5, 0.5]^2 -> quarter of the image area
        sil = soft_silhouette(jnp.asarray(v)[None], jnp.asarray(f),
                              image_size=64, face_tile=2)
        frac = float(jnp.mean(sil))
        assert abs(frac - 0.25) < 0.02

    def test_silhouette_range_and_interior(self):
        v, f = square_mesh(half=0.8)
        sil = np.asarray(
            soft_silhouette(jnp.asarray(v)[None], jnp.asarray(f),
                            image_size=32, face_tile=2)[0]
        )
        assert sil.min() >= 0 and sil.max() <= 1
        assert sil[16, 16] > 0.99  # deep interior
        assert sil[0, 0] < 0.01  # far exterior

    def test_behind_camera_culled(self):
        v, f = square_mesh(z=-1.0)
        sil = soft_silhouette(jnp.asarray(v)[None], jnp.asarray(f),
                              image_size=32, face_tile=2)
        assert float(jnp.max(sil)) < 1e-6

    def test_gradient_moves_silhouette(self):
        v, f = square_mesh(half=0.3)
        target_shift = 0.2

        def loss(dx):
            verts = jnp.asarray(v)[None].at[..., 0].add(dx)
            sil = soft_silhouette(verts, jnp.asarray(f), image_size=32,
                                  face_tile=2)
            ref_v = jnp.asarray(v)[None].at[..., 0].add(target_shift)
            ref = soft_silhouette(ref_v, jnp.asarray(f), image_size=32,
                                  face_tile=2)
            return jnp.sum((sil - jax.lax.stop_gradient(ref)) ** 2)

        g = jax.grad(loss)(0.0)
        assert np.isfinite(g)
        # moving toward the target must reduce the loss -> negative gradient
        assert g < 0

    def test_winding_invariant(self):
        v, f = square_mesh()
        f_flipped = f[:, ::-1].copy()
        s1 = soft_silhouette(jnp.asarray(v)[None], jnp.asarray(f),
                             image_size=32, face_tile=2)
        s2 = soft_silhouette(jnp.asarray(v)[None], jnp.asarray(f_flipped),
                             image_size=32, face_tile=2)
        assert np.allclose(s1, s2, atol=1e-5)


class TestHardRasterize:
    def test_depth_ordering(self):
        vn, f = square_mesh(z=1.0, half=0.4)
        vf, _ = square_mesh(z=3.0, half=0.9)
        verts = np.concatenate([vn, vf], 0)
        faces = np.concatenate([f, f + 4], 0).astype(np.int32)
        fi, z, w = hard_rasterize(jnp.asarray(verts)[None], jnp.asarray(faces),
                                  image_size=64, face_tile=2)
        fi = np.asarray(fi[0]); z = np.asarray(z[0])
        # center pixel: near square (faces 0/1) wins
        assert fi[32, 32] in (0, 1)
        assert abs(z[32, 32] - 1.0) < 1e-3
        # corner: far square only
        assert fi[5, 5] in (2, 3)
        assert abs(z[5, 5] - 3.0) < 1e-3
        # outside everything: background
        assert fi[0, 63] == -1

    def test_barycentric_sums_to_one(self):
        v, f = square_mesh()
        fi, z, w = hard_rasterize(jnp.asarray(v)[None], jnp.asarray(f),
                                  image_size=32, face_tile=2)
        covered = np.asarray(fi[0]) >= 0
        sums = np.asarray(w[0]).sum(-1)[covered]
        assert np.allclose(sums, 1.0, atol=1e-4)


class TestDegenerateFaces:
    def test_zero_area_face_does_not_flood_image(self):
        """A zero-area (repeated-vertex) face must contribute nothing, not
        sigmoid(0)=0.5 coverage over the whole image."""
        import jax.numpy as jnp
        from chore_tpu.ops.rasterizer import soft_silhouette

        # one real triangle near the center + one degenerate (all-same) face
        verts = jnp.asarray([
            [-0.2, -0.2, 2.0], [0.2, -0.2, 2.0], [0.0, 0.2, 2.0],
            [0.5, 0.5, 2.0],
        ])[None]
        faces = jnp.asarray([[0, 1, 2], [3, 3, 3]], jnp.int32)
        sil = soft_silhouette(verts, faces, image_size=64)
        cov = float(jnp.mean(sil > 0.4))
        assert 0.0 < cov < 0.3, cov  # triangle only, not the full image
