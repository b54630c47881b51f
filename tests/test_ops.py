"""Golden-value and property tests for the core math ops.

Oracles: hand-computed fixtures, numpy reference implementations, and -- for
the ops whose semantics are defined by torch (grid_sample) -- torch CPU
itself.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chore_tpu.ops import (
    OrthographicCamera,
    PerspectiveCamera,
    align_points,
    axis_angle_to_matrix,
    bilinear_sample,
    chamfer_eval,
    init_object_orientation,
    masked_chamfer_sq,
    nn_sqdist,
    point_mesh_udf,
    project_so3,
    similarity_transform,
)


class TestCamera:
    def test_project_center_point(self):
        cam = PerspectiveCamera()
        # A point on the optical axis projects to the principal point.
        pts = jnp.array([[[0.0, 0.0, 2.2]]])
        px, py = cam.project_screen(pts)
        assert np.allclose(px, 1018.952, atol=1e-3)
        assert np.allclose(py, 779.486, atol=1e-3)

    def test_pinhole_formula(self, rng):
        cam = PerspectiveCamera()
        pts = rng.randn(2, 5, 3).astype(np.float32)
        pts[..., 2] = np.abs(pts[..., 2]) + 1.0
        px, py = cam.project_screen(jnp.asarray(pts))
        exp_px = 979.7844 * pts[..., 0] / pts[..., 2] + 1018.952
        assert np.allclose(px[..., 0], exp_px, rtol=1e-5)

    def test_crop_normalization(self):
        cam = PerspectiveCamera(crop_size=1200)
        # A point projecting exactly onto the crop center must map to (0, 0).
        z = 2.2
        px_target, py_target = 800.0, 600.0
        x = (px_target - cam.cx_px) * z / cam.fx_px
        y = (py_target - cam.cy_px) * z / cam.fy_px
        pts = jnp.array([[[x, y, z]]])
        crop_center = jnp.array([[px_target, py_target]])
        out = cam.project_points(pts, crop_center)
        assert np.allclose(out[0, 0, :2], 0.0, atol=1e-5)
        assert np.allclose(out[0, 0, 2], z)
        # A point projecting crop_size/2 to the right maps to nx = +1.
        x2 = (px_target + 600.0 - cam.cx_px) * z / cam.fx_px
        out2 = cam.project_points(jnp.array([[[x2, y, z]]]), crop_center)
        assert np.allclose(out2[0, 0, 0], 1.0, atol=1e-5)

    def test_orthographic_identity(self, rng):
        # KinectOrthCamera (reference: model/camera.py:91-99) projects
        # SMPL-centered points by identity; crop_center is ignored.
        cam = OrthographicCamera()
        assert cam.load_size == 512 and cam.scale == 0.75
        pts = rng.randn(2, 7, 3).astype(np.float32)
        out = cam.project_points(jnp.asarray(pts),
                                 crop_center=jnp.zeros((2, 2)))
        assert np.allclose(out, pts)


class TestBilinearSample:
    def test_exact_pixel_centers(self):
        # align_corners=True: uv=-1 hits pixel 0, uv=+1 hits pixel W-1.
        feat = jnp.arange(12.0).reshape(1, 3, 4, 1)  # B,H,W,C
        uv = jnp.array([[[-1.0, -1.0], [1.0, 1.0], [1.0, -1.0]]])
        out = bilinear_sample(feat, uv)
        assert np.allclose(out[0, :, 0], [0.0, 11.0, 3.0])

    def test_interpolation_midpoint(self):
        feat = jnp.array([[[[0.0], [2.0]], [[4.0], [6.0]]]])  # 1,2,2,1
        uv = jnp.array([[[0.0, 0.0]]])  # center of the 2x2 grid
        out = bilinear_sample(feat, uv)
        assert np.allclose(out[0, 0, 0], 3.0)

    def test_matches_torch_grid_sample(self, rng):
        torch = pytest.importorskip("torch")
        feat = rng.randn(2, 8, 8, 5).astype(np.float32)
        uv = (rng.rand(2, 64, 2).astype(np.float32) - 0.5) * 2.6  # incl. OOB
        ours = bilinear_sample(jnp.asarray(feat), jnp.asarray(uv))
        t_feat = torch.tensor(feat).permute(0, 3, 1, 2)
        t_uv = torch.tensor(uv).unsqueeze(2)  # (B, N, 1, 2)
        theirs = torch.nn.functional.grid_sample(
            t_feat, t_uv, mode="bilinear", padding_mode="zeros",
            align_corners=True,
        )[..., 0].permute(0, 2, 1)  # (B, N, C)
        assert np.allclose(ours, theirs.numpy(), atol=1e-5)

    def test_gradients_flow(self):
        feat = jnp.ones((1, 4, 4, 2))
        uv = jnp.zeros((1, 3, 2))
        g = jax.grad(lambda u: bilinear_sample(feat, u).sum())(uv)
        assert g.shape == uv.shape


class TestBilinearSampleFrozen:
    """The corner-saving custom-VJP sampler used by the fitting/generation
    loops (frozen features, gradients only w.r.t. uv)."""

    def test_forward_identical(self, rng):
        from chore_tpu.ops.grid_sample import bilinear_sample_frozen
        feat = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
        uv = jnp.asarray(
            ((rng.rand(2, 64, 2) - 0.5) * 2.6).astype(np.float32))  # incl OOB
        a = bilinear_sample(feat, uv)
        b = bilinear_sample_frozen(feat, uv)
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_uv_gradient_matches_autodiff(self, rng):
        from chore_tpu.ops.grid_sample import bilinear_sample_frozen
        feat = jnp.asarray(rng.randn(1, 16, 16, 7).astype(np.float32))
        # keep points strictly interior & away from pixel-center kinks
        uv = jnp.asarray(
            ((rng.rand(1, 128, 2) - 0.5) * 1.8).astype(np.float32))
        ct = jnp.asarray(rng.randn(1, 128, 7).astype(np.float32))

        def loss_ref(u):
            return jnp.sum(bilinear_sample(feat, u) * ct)

        def loss_frozen(u):
            return jnp.sum(bilinear_sample_frozen(feat, u) * ct)

        g_ref = jax.grad(loss_ref)(uv)
        g_frz = jax.grad(loss_frozen)(uv)
        np.testing.assert_allclose(np.asarray(g_frz), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_uv_gradient_oob_points(self, rng):
        # out-of-bounds corners are masked: grads must agree there too
        from chore_tpu.ops.grid_sample import bilinear_sample_frozen
        feat = jnp.asarray(rng.randn(1, 6, 6, 3).astype(np.float32))
        uv = jnp.asarray(
            ((rng.rand(1, 64, 2) - 0.5) * 3.5).astype(np.float32))
        g_ref = jax.grad(lambda u: bilinear_sample(feat, u).sum())(uv)
        g_frz = jax.grad(
            lambda u: bilinear_sample_frozen(feat, u).sum())(uv)
        np.testing.assert_allclose(np.asarray(g_frz), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_feat_cotangent_is_zero(self, rng):
        # documented contract: frozen sampler yields zero feature grads
        from chore_tpu.ops.grid_sample import bilinear_sample_frozen
        feat = jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
        uv = jnp.zeros((1, 3, 2))
        g = jax.grad(lambda f: bilinear_sample_frozen(f, uv).sum())(feat)
        assert np.all(np.asarray(g) == 0.0)

    def test_model_query_frozen_matches(self, rng):
        # end-to-end through CHOREField.query: same forward, same point
        # gradients as the default sampler
        from chore_tpu.models import CHOREField, FieldConfig
        cfg = FieldConfig(num_stack=2, net_img_size=64)
        model = CHOREField(cfg=cfg)
        images = jnp.asarray(rng.rand(1, 64, 64, 5).astype(np.float32))
        points = jnp.asarray(
            (rng.rand(1, 50, 3) * [2, 2, 0.5] + [-1, -1, 1.95]
             ).astype(np.float32))
        cc = jnp.asarray(np.array([[1018.0, 779.0]], np.float32))
        params = model.init(jax.random.PRNGKey(0), images, points, cc,
                            train=False)
        feats, tmpx = model.apply(params, images, train=False,
                                  method="encode")

        def df_sum(pts, frozen):
            preds = model.apply(params, feats, tmpx, pts, cc,
                                frozen_features=frozen, method="query")
            return preds[-1]["df"].sum(), preds[-1]

        (v0, p0), g0 = jax.value_and_grad(
            lambda p: df_sum(p, False), has_aux=True)(points)
        (v1, p1), g1 = jax.value_and_grad(
            lambda p: df_sum(p, True), has_aux=True)(points)
        np.testing.assert_array_equal(np.asarray(p0["df"]),
                                      np.asarray(p1["df"]))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-4, atol=1e-6)


class TestRotation:
    def test_project_so3_is_rotation(self, rng):
        m = jnp.asarray(rng.randn(4, 3, 3).astype(np.float32))
        r = project_so3(m)
        eye = jnp.swapaxes(r, -1, -2) @ r
        assert np.allclose(eye, np.eye(3), atol=1e-5)
        assert np.allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-5)

    def test_project_so3_identity_on_rotations(self):
        theta = 0.7
        rot = np.array(
            [[np.cos(theta), -np.sin(theta), 0],
             [np.sin(theta), np.cos(theta), 0],
             [0, 0, 1]], dtype=np.float32)
        out = project_so3(jnp.asarray(rot[None]))
        assert np.allclose(out[0], rot, atol=1e-6)

    def test_axis_angle_golden(self):
        # 90 degrees about z.
        aa = jnp.array([[0.0, 0.0, np.pi / 2]])
        r = axis_angle_to_matrix(aa)
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        assert np.allclose(r[0], expected, atol=1e-6)

    def test_axis_angle_zero(self):
        r = axis_angle_to_matrix(jnp.zeros((2, 3)))
        assert np.allclose(r, np.eye(3), atol=1e-6)

    def test_init_object_orientation(self, rng):
        # With orthonormal source axes, recovers the relative rotation.
        from scipy.spatial.transform import Rotation

        r_src = Rotation.random(random_state=0).as_matrix().astype(np.float32)
        r_rel = Rotation.random(random_state=1).as_matrix().astype(np.float32)
        tgt = (r_src @ r_rel).astype(np.float32)
        out = init_object_orientation(jnp.asarray(tgt[None]), jnp.asarray(r_src[None]))
        assert np.allclose(out[0], r_rel, atol=1e-4)


class TestProcrustes:
    def test_recovers_known_transform(self, rng):
        from scipy.spatial.transform import Rotation

        src = rng.randn(100, 3).astype(np.float32)
        r_true = Rotation.random(random_state=3).as_matrix().astype(np.float32)
        s_true, t_true = 1.7, np.array([0.3, -1.0, 2.0], dtype=np.float32)
        ref = s_true * src @ r_true.T + t_true
        r, t, s = similarity_transform(jnp.asarray(src), jnp.asarray(ref))
        assert np.allclose(s[0, 0], s_true, rtol=1e-4)
        assert np.allclose(r, r_true, atol=1e-4)
        aligned = align_points(jnp.asarray(src), jnp.asarray(ref))
        assert np.allclose(aligned, ref, atol=1e-3)

    def test_batched(self, rng):
        src = jnp.asarray(rng.randn(4, 50, 3).astype(np.float32))
        aligned = align_points(src, src)
        assert np.allclose(aligned, src, atol=1e-4)


class TestChamfer:
    def test_nn_identity(self, rng):
        x = jnp.asarray(rng.randn(100, 3).astype(np.float32))
        d, idx = nn_sqdist(x, x, tile=32)
        assert np.allclose(d, 0.0, atol=1e-5)
        assert np.array_equal(idx, np.arange(100))

    def test_chamfer_matches_numpy_bruteforce(self, rng):
        x = rng.randn(120, 3).astype(np.float32)
        y = rng.randn(75, 3).astype(np.float32)
        ours = chamfer_eval(jnp.asarray(x), jnp.asarray(y), tile=64)
        d = np.linalg.norm(x[:, None] - y[None], axis=-1)
        expected = d.min(1).mean() + d.min(0).mean()
        assert np.allclose(ours, expected, rtol=1e-4)

    def test_masked_chamfer(self, rng):
        x = rng.randn(30, 3).astype(np.float32)
        y = rng.randn(20, 3).astype(np.float32)
        xm = np.zeros(30, bool); xm[:10] = True
        ym = np.zeros(20, bool); ym[:5] = True
        ours = masked_chamfer_sq(jnp.asarray(x), jnp.asarray(y),
                                 jnp.asarray(xm), jnp.asarray(ym))
        d = np.sum((x[:10, None] - y[None, :5]) ** 2, -1)
        expected = d.min(1).mean() + d.min(0).mean()
        assert np.allclose(ours, expected, rtol=1e-4)

    def test_masked_chamfer_empty_is_zero(self, rng):
        x = jnp.asarray(rng.randn(10, 3).astype(np.float32))
        y = jnp.asarray(rng.randn(10, 3).astype(np.float32))
        zero = masked_chamfer_sq(x, y, jnp.zeros(10, bool), jnp.ones(10, bool))
        assert float(zero) == 0.0


class TestPointMesh:
    def test_distance_to_single_triangle(self):
        verts = jnp.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
        faces = jnp.array([[0, 1, 2]])
        pts = jnp.array([
            [0.25, 0.25, 1.0],   # above interior -> dist 1
            [0.25, 0.25, 0.0],   # on the face -> 0
            [-1.0, 0.0, 0.0],    # nearest vertex A -> 1
            [0.5, -2.0, 0.0],    # nearest edge AB -> 2
            [2.0, 2.0, 0.0],     # nearest edge BC
        ])
        udf, vidx = point_mesh_udf(pts, verts, faces, tile=8)
        exp_bc = np.linalg.norm([2.0 - 0.5, 2.0 - 0.5, 0.0])
        assert np.allclose(udf, [1.0, 0.0, 1.0, 2.0, exp_bc], atol=1e-5)
        assert vidx[2] == 0

    def test_udf_nonnegative_and_zero_on_verts(self, rng):
        verts = jnp.asarray(rng.randn(20, 3).astype(np.float32))
        faces = jnp.asarray(rng.randint(0, 20, (30, 3)))
        udf, _ = point_mesh_udf(verts, verts, faces, tile=16)
        assert np.all(np.asarray(udf) >= 0)
        assert np.allclose(udf, 0.0, atol=1e-5)
