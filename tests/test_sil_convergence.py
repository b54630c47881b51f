"""Silhouette-phase target-consistency + recovery regression tests.

Reduced in-suite version of tools/sil_convergence.py (full study results:
BASELINE.md "Sil-phase convergence study"). The GT-pose anchor would have
caught BOTH round-4 rasterizer bugs (sliver-slab coverage and far-field
sigmoid tail accumulation — see ops/rasterizer._signed_distance and
COVERAGE_CUTOFF): with either present, the render at the exact GT pose
does not match the ROI-cropped target and the optimizer can find poses
with LOWER loss than GT.

Reference for the phase being guarded: recon/recon_fit_behave.py:121-163
('sil' phase), recon/obj_pose_roi.py:159-172 (SilLossROI forward).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chore_tpu.ops.camera import PerspectiveCamera
from chore_tpu.ops.rasterizer import hard_rasterize
from chore_tpu.recon.silhouette import SilhouetteLossROI, silhouette_loss
from chore_tpu.utils.meshio import chair_mesh


def _rot_axis(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.deg2rad(deg)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return (np.eye(3) + np.sin(a) * K
            + (1 - np.cos(a)) * K @ K).astype(np.float32)


@pytest.fixture(scope="module")
def chair_scene():
    """GT chair mask in net-input space + its silhouette ROI data."""
    chair_v, chair_f = chair_mesh(1)  # 288 faces: CI-sized, still slivered
    R_gt = _rot_axis([0.2, 1.0, 0.1], 25.0)
    t_gt = np.array([0.10, -0.10, 2.30], np.float32)
    cc = np.array([[1018.0, 779.0]], np.float32)
    cam = PerspectiveCamera()
    world = (chair_v @ R_gt + t_gt)
    ndc = cam.project_points(jnp.asarray(world[None]), jnp.asarray(cc))
    fid, _, _ = hard_rasterize(ndc, jnp.asarray(chair_f), image_size=512)
    obj_mask = (np.asarray(fid[0]) >= 0).astype(np.float32)
    per_mask = np.zeros_like(obj_mask)
    sil = SilhouetteLossROI(per_mask[None], obj_mask[None], chair_v,
                            chair_f, cc, rend_size=128)
    return chair_v, chair_f, R_gt, t_gt, sil


class TestGtAnchor:
    def test_render_at_gt_matches_target(self, chair_scene):
        """The soft render at the exact GT pose must match image_ref: a
        coordinate-convention or coverage bug shows up here as a gross
        IoU drop (0.66 with the round-4 sliver-slab bug; ~0.9 healthy —
        mask-resolution thinning of 1-2 px parts bounds it)."""
        chair_v, chair_f, R_gt, t_gt, sil = chair_scene
        _, img = silhouette_loss(
            sil.data, chair_v, chair_f, jnp.asarray(R_gt[None]),
            jnp.asarray(t_gt[None]), jnp.asarray([1.0], jnp.float32), 128)
        img = np.asarray(img[0]) > 0.5
        ref = sil.data["image_ref"][0] > 0.5
        inter = (img & ref).sum()
        union = (img | ref).sum()
        assert union > 500  # scene is actually on screen
        assert inter / union > 0.82

    def test_background_is_empty(self, chair_scene):
        """Far-field coverage must be exactly zero: thousands of sigmoid
        tails (or a sliver's unbounded edge-line wedge) summing into the
        background breaks the mask L2 target."""
        chair_v, chair_f, R_gt, t_gt, sil = chair_scene
        _, img = silhouette_loss(
            sil.data, chair_v, chair_f, jnp.asarray(R_gt[None]),
            jnp.asarray(t_gt[None]), jnp.asarray([1.0], jnp.float32), 128)
        img = np.asarray(img[0])
        ref = sil.data["image_ref"][0] > 0.5
        # dilate ref by ~the coverage support and demand silence outside
        import cv2

        near = cv2.dilate(ref.astype(np.uint8),
                          np.ones((21, 21), np.uint8)) > 0
        assert img[~near].max() < 0.05

    def test_gt_is_near_minimum(self, chair_scene):
        """Loss at GT must not be beatable by a visibly wrong pose (the
        signature of a misaligned target)."""
        chair_v, chair_f, R_gt, t_gt, sil = chair_scene
        s1 = jnp.asarray([1.0], jnp.float32)

        def loss_at(R, t):
            l, _ = silhouette_loss(sil.data, chair_v, chair_f,
                                   jnp.asarray(R[None]),
                                   jnp.asarray(t[None]), s1, 128)
            return float(l)

        l_gt = loss_at(R_gt, t_gt)
        for deg, dt in ((20, 0.1), (40, 0.15)):
            R = (R_gt @ _rot_axis([1, 0.3, 0.2], deg)).astype(np.float32)
            t = t_gt + np.float32(dt)
            assert loss_at(R, t) > l_gt * 1.5
