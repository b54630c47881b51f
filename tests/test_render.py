"""Overlay rendering tests (utils/render.py): projection placement,
shading, side view, and un-crop alignment."""
import numpy as np
import pytest

from chore_tpu.utils.meshio import octasphere
from chore_tpu.utils.render import (
    align_to_input,
    kinect_unit_k,
    look_at_side,
    render_meshes,
)


class TestRenderMeshes:
    def test_sphere_lands_at_projection(self):
        """A sphere at camera center +z must render around the principal
        point (unit-K coords scaled to the square image)."""
        v, f = octasphere(radius=0.3, center=(0.0, 0.0, 2.2), subdiv=2)
        img, mask = render_meshes([(v, f)], [(1.0, 0.2, 0.2)],
                                  image_size=256)
        assert mask.any()
        ys, xs = np.where(mask)
        k = kinect_unit_k()
        cx, cy = k[0, 2] * 256, k[1, 2] * 256
        assert abs(xs.mean() - cx) < 10
        assert abs(ys.mean() - cy) < 10
        # shaded color is a scaled version of the base color
        px = img[mask]
        assert (px[:, 0] > px[:, 1]).all()  # red dominates
        assert px.max() <= 1.0 and px.min() >= 0.0

    def test_two_meshes_zbuffer(self):
        """The nearer mesh must win the z-buffer where they overlap."""
        near, f1 = octasphere(radius=0.2, center=(0, 0, 1.8), subdiv=2)
        far, f2 = octasphere(radius=0.2, center=(0, 0, 2.6), subdiv=2)
        img, mask = render_meshes(
            [(far, f2), (near, f1)], [(0, 0, 1.0), (1.0, 0, 0)],
            image_size=256,
        )
        ys, xs = np.where(mask)
        center_px = img[int(ys.mean()), int(xs.mean())]
        assert center_px[0] > center_px[2]  # red (near) in front

    def test_side_view_rotates(self):
        v, _ = octasphere(radius=0.2, center=(0.5, 0, 2.2), subdiv=1)
        rot = look_at_side(v, 90.0, center=np.array([0, 0, 2.2]))
        # 90 deg about y through (0,0,2.2): x -> z - 2.2 (orbit)
        assert not np.allclose(rot, v)
        np.testing.assert_allclose(
            np.linalg.norm(rot - [0, 0, 2.2], axis=1),
            np.linalg.norm(v - [0, 0, 2.2], axis=1), atol=1e-5,
        )


class TestAlignToInput:
    def test_identity_scale_placement(self):
        """With resize_scale mapping the photo to 2048-wide and no
        restaging, a mask at render position (u,v) must land at
        (u/s, v/s) in the photo."""
        S = 256
        render = np.zeros((S, S, 3), np.float32)
        mask = np.zeros((S, S), bool)
        mask[64:80, 100:116] = True
        render[mask] = 1.0
        orig = np.zeros((768, 1024, 3), np.uint8)
        info = {"resize_scale": 2.0, "crop_center": np.array([0.0, 0.0])}
        out = align_to_input(render, mask, orig, info, alpha=1.0)
        ys, xs = np.where(out[..., 0] > 128)
        assert len(xs) > 0
        # render square pixel -> 2048-space (x8) -> photo (/2)
        assert abs(xs.mean() - (108 * 8 / 2)) < 8
        assert abs(ys.mean() - (72 * 6 / 2)) < 8

    def test_mean_center_shift(self):
        S = 256
        render = np.zeros((S, S, 3), np.float32)
        mask = np.zeros((S, S), bool)
        mask[120:136, 120:136] = True
        render[mask] = 1.0
        orig = np.zeros((1536, 2048, 3), np.uint8)
        base = {"resize_scale": 1.0, "crop_center": np.array([1008.0, 995.0])}
        out0 = align_to_input(render, mask, orig, base,
                              use_mean_center=True, alpha=1.0)
        shifted = {"resize_scale": 1.0,
                   "crop_center": np.array([1208.0, 995.0])}
        out1 = align_to_input(render, mask, orig, shifted,
                              use_mean_center=True, alpha=1.0)
        x0 = np.where(out0[..., 0] > 128)[1].mean()
        x1 = np.where(out1[..., 0] > 128)[1].mean()
        assert abs((x1 - x0) - 200.0) < 6  # shifted by crop-center delta
