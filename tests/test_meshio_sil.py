"""Mesh IO roundtrips, surface sampling, PCA, and the silhouette ROI loss."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chore_tpu.utils.meshio import (
    load_obj,
    load_ply,
    pca_axes,
    sample_surface,
    save_obj,
    save_ply,
)
from tests.test_fitting import octasphere


class TestMeshIO:
    def test_ply_roundtrip(self, tmp_path):
        v, f = octasphere(radius=0.3, subdiv=1)
        p = str(tmp_path / "m.ply")
        save_ply(p, v, f)
        v2, f2 = load_ply(p)
        assert np.allclose(v, v2, atol=1e-5)
        assert np.array_equal(f, f2)

    def test_obj_roundtrip(self, tmp_path):
        v, f = octasphere(radius=0.3, subdiv=1)
        p = str(tmp_path / "m.obj")
        save_obj(p, v, f)
        v2, f2 = load_obj(p)
        assert np.allclose(v, v2, atol=1e-5)
        assert np.array_equal(f, f2)

    def test_binary_ply(self, tmp_path):
        # emit a binary little-endian ply by hand and parse it
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        f = np.array([[0, 1, 2]], np.int32)
        p = tmp_path / "b.ply"
        with open(p, "wb") as fh:
            fh.write(b"ply\nformat binary_little_endian 1.0\n")
            fh.write(b"element vertex 3\n")
            fh.write(b"property float x\nproperty float y\nproperty float z\n")
            fh.write(b"element face 1\n")
            fh.write(b"property list uchar int vertex_indices\nend_header\n")
            fh.write(v.tobytes())
            fh.write(bytes([3]) + f.tobytes())
        v2, f2 = load_ply(str(p))
        assert np.allclose(v, v2)
        assert np.array_equal(f, f2)

    def test_sample_surface_on_sphere(self):
        v, f = octasphere(radius=0.5, subdiv=3)
        pts = sample_surface(v, f, 2000)
        r = np.linalg.norm(pts, axis=1)
        assert abs(r.mean() - 0.5) < 0.01

    def test_pca_axes_orthonormal_and_ordered(self, rng):
        pts = rng.randn(500, 3) * np.array([3.0, 1.0, 0.2])
        ax = pca_axes(pts.astype(np.float32))
        assert np.allclose(ax @ ax.T, np.eye(3), atol=1e-4)
        # first axis dominated by x
        assert abs(ax[0, 0]) > 0.95


class TestSilhouetteROI:
    def test_perfect_pose_has_low_loss(self):
        """Render the template at a known pose into the reference mask via
        our own rasterizer; the loss at the true pose must be much lower
        than at a shifted pose."""
        from chore_tpu.ops.rasterizer import project_unit_k, soft_silhouette
        from chore_tpu.recon.silhouette import SilhouetteLossROI

        tv, tf = octasphere(radius=0.15, subdiv=2)
        true_t = np.array([[0.1, -0.1, 2.2]], np.float32)
        # build a fake "net-input" object mask by rendering with the kinect
        # camera into the 512 net-input crop: use the sil module itself to
        # render after constructing with a synthetic mask; first make the
        # mask by projecting coarse points
        from chore_tpu.ops.camera import PerspectiveCamera

        cam = PerspectiveCamera()
        cc = np.array([[1018.0, 779.0]], np.float32)
        pts = tv[None] + true_t[:, None]
        xyz = np.asarray(cam.project_points(jnp.asarray(pts), jnp.asarray(cc)))
        # map [-1,1] crop coords to 512 net-input pixels
        uv = ((xyz[0, :, :2] + 1) / 2 * 511).astype(int)
        mask = np.zeros((512, 512), np.float32)
        import cv2

        hull = cv2.convexHull(uv.astype(np.int32))
        cv2.fillConvexPoly(mask, hull, 1.0)

        sil = SilhouetteLossROI(
            person_masks=np.zeros((1, 512, 512), np.float32),
            obj_masks=mask[None],
            template_verts=tv,
            template_faces=tf,
            crop_centers=cc,
        )
        R = jnp.eye(3)[None]
        s = jnp.ones(1)
        loss_true, img = sil(R, jnp.asarray(true_t), s)
        loss_shift, _ = sil(R, jnp.asarray(true_t + [[0.3, 0.0, 0.0]]), s)
        assert float(loss_true) < 0.25 * float(loss_shift)
        # rendered image overlaps the reference strongly
        inter = float(jnp.sum((img > 0.5) & (sil.image_ref > 0.5)))
        union = float(jnp.sum((img > 0.5) | (sil.image_ref > 0.5)))
        assert inter / union > 0.7

    def test_gradient_direction(self):
        from chore_tpu.recon.silhouette import SilhouetteLossROI

        tv, tf = octasphere(radius=0.15, subdiv=1)
        mask = np.zeros((512, 512), np.float32)
        mask[200:300, 200:300] = 1.0
        sil = SilhouetteLossROI(
            person_masks=np.zeros((1, 512, 512), np.float32),
            obj_masks=mask[None],
            template_verts=tv,
            template_faces=tf,
            crop_centers=np.array([[1018.0, 779.0]], np.float32),
        )

        def loss(t):
            return sil(jnp.eye(3)[None], t, jnp.ones(1))[0]

        g = jax.grad(loss)(jnp.asarray([[0.0, 0.0, 2.2]]))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0


class TestEmptyMask:
    def test_empty_object_mask_neutralized(self):
        """A frame with an all-zero object mask must yield a zero silhouette
        loss contribution instead of raising."""
        import numpy as np
        import jax.numpy as jnp
        from chore_tpu.recon.silhouette import SilhouetteLossROI
        from chore_tpu.utils.meshio import octasphere

        tv, tf = octasphere(radius=0.15, subdiv=1)
        masks = np.zeros((1, 64, 64), np.float32)
        sil = SilhouetteLossROI(
            person_masks=masks, obj_masks=masks,
            template_verts=tv, template_faces=tf,
            crop_centers=np.array([[1018.0, 779.0]], np.float32),
            rend_size=32,
        )
        loss, img = sil(jnp.eye(3)[None],
                        jnp.asarray([[0.0, 0.0, 2.2]]), jnp.ones(1))
        assert float(loss) == 0.0


@pytest.mark.slow  # two sil-phase fits (~5 min)
class TestOffscreenGuard:
    """Opt-in offscreen-degeneracy penalty (silhouette.offscreen_loss,
    equivalent of the reference's defined-but-unwired
    compute_offscreen_loss, obj_pose_roi.py:179-199)."""

    def _sil(self):
        from chore_tpu.recon.silhouette import SilhouetteLossROI

        tv, tf = octasphere(radius=0.15, subdiv=1)
        mask = np.zeros((512, 512), np.float32)
        mask[200:300, 200:300] = 1.0
        sil = SilhouetteLossROI(
            person_masks=np.zeros((1, 512, 512), np.float32),
            obj_masks=mask[None],
            template_verts=tv,
            template_faces=tf,
            crop_centers=np.array([[1018.0, 779.0]], np.float32),
        )
        return sil, tv

    def test_zero_on_screen_positive_off_screen(self):
        from chore_tpu.recon.silhouette import offscreen_loss

        sil, tv = self._sil()
        R = jnp.eye(3)[None]
        s = jnp.ones(1)
        on = offscreen_loss(sil.data, tv, R, jnp.asarray([[0.0, 0.0, 2.2]]),
                            s)
        off = offscreen_loss(sil.data, tv, R,
                             jnp.asarray([[3.0, 0.0, 2.2]]), s)
        assert float(on) == 0.0
        assert float(off) > 1.0

    def test_off_roi_init_pulled_back(self):
        """A degenerate init outside the ROI sits on a mask-L2 plateau
        (rendered silhouette empty -> zero mask gradient); the sil phase
        WITH the guard pulls it back into the frustum, WITHOUT it the
        object stays lost."""
        from chore_tpu.recon import losses as L
        from chore_tpu.recon.optimize import PhaseSpec, run_phase
        from chore_tpu.recon.silhouette import offscreen_loss, silhouette_loss

        sil, tv = self._sil()
        _, tf = octasphere(radius=0.15, subdiv=1)
        t_bad = jnp.asarray([[1.5, 0.0, 2.2]])  # far outside the ROI

        def make_loss(guard):
            def loss_fn(p, it, key):
                ld = {}
                R = jnp.eye(3)[None]
                ld["mask"], _ = silhouette_loss(
                    sil.data, tv, tf, R, p["t"], p["s"])
                ld["trans"] = jnp.mean((p["t"] - t_bad) ** 2) * 0.0
                if guard:
                    ld["offscreen"] = offscreen_loss(
                        sil.data, tv, R, p["t"], p["s"])
                return L.weighted_sum(ld, L.COCO_WEIGHTS, it + 1.0), ld

            return loss_fn

        # Adam moves ~lr per step per coordinate; pulling x from 1.5 back
        # into the narrow ROI frustum (boundary ~x=0.15 at z=2.2) needs
        # ~1.4 m of travel, so the unit test runs a hotter lr than the
        # production sil phase (0.02 * 300 steps = 6 m of budget)
        spec = PhaseSpec(lr=0.02, n_iters=30, steps_per_iter=10)

        def in_frustum(t):
            from chore_tpu.ops.rasterizer import project_unit_k

            ndc = project_unit_k(
                jnp.asarray(tv)[None] + t[:, None], sil.data["k_rois"])
            return bool(jnp.all(jnp.abs(ndc[..., :2]) <= 1.0))

        p0 = {"t": t_bad, "s": jnp.ones(1)}
        out_guard, _, _ = run_phase(make_loss(True), p0, spec)
        out_plain, _, _ = run_phase(make_loss(False), p0, spec)
        assert in_frustum(out_guard["t"]), np.asarray(out_guard["t"])
        assert not in_frustum(out_plain["t"]), np.asarray(out_plain["t"])
