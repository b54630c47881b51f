"""BEHAVE on-disk reader tests against a fully synthetic sequence
(chore_tpu/behave/readers.py)."""
import json
import pickle

import cv2
import numpy as np
import pytest

from chore_tpu.behave.readers import (
    FrameDataReader,
    KinectCalib,
    KinectTransform,
    SeqInfo,
    load_kinect_poses,
    load_kinect_poses_back,
)
from chore_tpu.utils.meshio import octasphere, save_ply


@pytest.fixture()
def seq(tmp_path):
    """Synthetic 2-kinect BEHAVE sequence: 2 complete frames + 1 incomplete,
    calibration dirs, mocap, GT fits, masks, keypoints."""
    root = tmp_path / "behave"
    seq = root / "Date09_Sub09_chairwood"
    calib = root / "calibs"
    intrinsic = calib / "intrinsics"
    config = calib / "config"

    for k in range(2):
        (intrinsic / str(k)).mkdir(parents=True)
        with open(intrinsic / str(k) / "calibration.json", "w") as f:
            json.dump({"color": {
                "width": 64, "height": 48, "fx": 50.0, "fy": 50.0,
                "cx": 32.0, "cy": 24.0,
                "opencv": [50.0, 50.0, 32.0, 24.0] + [0.0] * 8,
            }}, f)
        # pc_table[y, x] = ((x - cx) / fx, (y - cy) / fy)
        ys, xs = np.mgrid[0:48, 0:64]
        table = np.dstack([(xs - 32.0) / 50.0, (ys - 24.0) / 50.0])
        np.save(intrinsic / str(k) / "pointcloud_table.npy", table)

        (config / str(k)).mkdir(parents=True)
        theta = 0.3 * (k + 1)
        rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                        [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
        with open(config / str(k) / "config.json", "w") as f:
            json.dump({"rotation": rot.reshape(-1).tolist(),
                       "translation": [0.1 * k, 0.2, 0.0]}, f)

    seq.mkdir(parents=True)
    with open(seq / "info.json", "w") as f:
        json.dump({
            "cat": "chairwood", "gender": "female",
            "config": "../calibs/config",
            "intrinsic": "../calibs/intrinsics",
            "empty": None, "kinects": [0, 1], "beta": [0.1] * 10,
        }, f)

    color = np.full((48, 64, 3), 80, np.uint8)
    depth = np.full((48, 64), 2200, np.uint16)  # 2.2 m in mm
    mask = np.zeros((48, 64), np.uint8)
    mask[8:40, 8:56] = 255
    sv, sf = octasphere(radius=0.4, center=(0, 0, 2.2), subdiv=2)

    for t, complete in (("t0001.000", True), ("t0002.000", True),
                        ("t0003.000", False)):
        frame = seq / t
        frame.mkdir()
        kids = range(2) if complete else range(1)  # incomplete misses k1
        for k in kids:
            cv2.imwrite(str(frame / f"k{k}.color.jpg"), color)
            cv2.imwrite(str(frame / f"k{k}.depth.png"), depth)
        cv2.imwrite(str(frame / "k1.person_mask.jpg"), mask)
        cv2.imwrite(str(frame / "k1.obj_rend_mask.jpg"), mask)
        cv2.imwrite(str(frame / "k1.obj_rend_full.jpg"), mask)
        with open(frame / "k1.mocap.json", "w") as f:
            json.dump({"pose": [0.01] * 72, "betas": [0.2] * 10}, f)
        save_ply(str(frame / "k1.mocap.ply"), sv, sf)
        with open(frame / "k1.color.json", "w") as f:
            json.dump({"body_joints": [10.0, 20.0, 0.9] * 25}, f)
        (frame / "person" / "fit02").mkdir(parents=True)
        save_ply(str(frame / "person" / "fit02" / "person_fit.ply"), sv, sf)
        (frame / "chairwood" / "fit01").mkdir(parents=True)
        save_ply(str(frame / "chairwood" / "fit01" / "chairwood_fit.ply"),
                 sv, sf)
        with open(frame / "chairwood" / "fit01" / "chairwood_fit.pkl",
                  "wb") as f:
            pickle.dump({"angle": np.array([0.1, 0.2, 0.3]),
                         "trans": np.array([0.5, 0, 2.0])}, f)
    return str(seq)


class TestSeqInfo:
    def test_fields(self, seq):
        info = SeqInfo(seq)
        assert info.get_obj_name() == "chairwood"
        assert info.get_gender() == "female"
        assert info.kinect_count() == 2
        assert info.kids == [0, 1]
        assert info.get_intrinsic().endswith("intrinsics")


class TestFrameReader:
    def test_discovery_skips_incomplete(self, seq):
        reader = FrameDataReader(seq)
        assert reader.frames == ["t0001.000", "t0002.000"]
        reader_all = FrameDataReader(seq, check_image=False)
        assert len(reader_all) == 3

    def test_images(self, seq):
        reader = FrameDataReader(seq)
        colors = reader.get_color_images(0, [0, 1])
        assert colors[0].shape == (48, 64, 3)
        depths = reader.get_depth_images(0, [1])
        assert depths[0].dtype == np.uint16
        assert int(depths[0][0, 0]) == 2200

    def test_gt_and_mocap(self, seq):
        reader = FrameDataReader(seq)
        pose, betas = reader.get_mocap_params(0)
        assert pose.shape == (72,) and betas.shape == (10,)
        v, f = reader.get_smplfit(0, "fit02")
        assert v.shape[1] == 3 and f.shape[1] == 3
        v2, _ = reader.get_objfit(0, "fit01")
        assert len(v2) == len(v)
        angle, trans = reader.get_objfit_params(0, "fit01")
        np.testing.assert_allclose(trans, [0.5, 0, 2.0])
        assert reader.get_smplfit(0, None) is None

    def test_masks_and_kpts(self, seq):
        reader = FrameDataReader(seq)
        m = reader.get_mask(0, 1, "person")
        assert m.dtype == bool and m[20, 20]
        assert reader.get_mask(0, 0, "person") is None  # only k1 written
        full = reader.get_mask_full(0, 1)
        assert full.sum() == m.sum()
        kpts = reader.get_body_kpts(0, 1)
        assert kpts.shape == (25, 3)
        # low-confidence zeroing
        kpts_strict = reader.get_body_kpts(0, 1, tol=0.95)
        assert (kpts_strict[:, 2] == 0).all()


class TestCalibTransform:
    def test_project_points_pinhole(self, seq):
        t = KinectTransform(seq)
        calib = t.intrinsics[0]
        pts = np.array([[0.0, 0.0, 2.0], [0.2, -0.1, 1.0]])
        proj = calib.project_points(pts)
        want = np.stack([50.0 * pts[:, 0] / pts[:, 2] + 32.0,
                         50.0 * pts[:, 1] / pts[:, 2] + 24.0], 1)
        np.testing.assert_allclose(proj, want, atol=1e-6)

    def test_dmap2pc(self, seq):
        t = KinectTransform(seq)
        depth = np.zeros((48, 64), np.uint16)
        depth[24, 32] = 1500  # principal point, 1.5 m
        pc = t.intrinsics[0].dmap2pc(depth)
        assert pc.shape == (1, 3)
        np.testing.assert_allclose(pc[0], [0, 0, 1.5], atol=1e-9)

    def test_world_local_roundtrip(self, seq):
        t = KinectTransform(seq)
        rng = np.random.RandomState(0)
        pts = rng.randn(100, 3)
        for k in range(2):
            back = t.local2world(t.world2local(pts, k), k)
            np.testing.assert_allclose(back, pts, atol=1e-10)

    def test_poses_inverse(self, seq):
        info = SeqInfo(seq)
        rots, trans = load_kinect_poses(info.get_config(), [0, 1])
        rb, tb = load_kinect_poses_back(info.get_config(), [0, 1])
        for r, t_, ri, ti in zip(rots, trans, rb, tb):
            m = np.eye(4)
            m[:3, :3] = r
            m[:3, 3] = t_
            mi = np.eye(4)
            mi[:3, :3] = ri
            mi[:3, 3] = ti
            np.testing.assert_allclose(m @ mi, np.eye(4), atol=1e-12)

    def test_flip_verts(self, seq):
        v = np.array([[1.0, 2.0, 3.0]])
        flipped = KinectTransform.flip_verts(v)
        np.testing.assert_allclose(flipped, [[-1.0, 2.0, 3.0]])


class TestDepthUtils:
    """Background removal + depth<->color mappings added for full L3
    coverage (reference: sync_frame.py:107-154, kinect_calib.py:90-181)."""

    def _calib(self, seq, d2c_t=(0.05, 0.0, 0.0)):
        """Calib with a nontrivial depth->color extrinsic."""
        t = KinectTransform(seq)
        calib = t.intrinsics[0]
        calib.depth2color_t = np.asarray(d2c_t, np.float64)
        calib.color2depth_t = -calib.depth2color_t
        return calib

    def test_background_removal(self, seq, tmp_path):
        from chore_tpu.behave.readers import (KinectFrameReader,
                                              get_seq_bkg,
                                              remove_background)

        # empty-room sequence: 2 frames of flat 3000 mm depth
        empty = tmp_path / "empty"
        for t in ("t0001.000", "t0002.000"):
            (empty / t).mkdir(parents=True)
            for k in range(2):
                cv2.imwrite(str(empty / t / f"k{k}.depth.png"),
                            np.full((48, 64), 3000, np.uint16))
        bkg = get_seq_bkg(str(empty), 0)
        np.testing.assert_allclose(bkg, 3000.0)

        depth = np.full((48, 64), 3000, np.uint16)
        depth[10:20, 10:20] = 2200  # a person 0.8 m in front
        depth[30, 30] = 2950        # within tol: background jitter
        out = remove_background(depth, bkg, tol=100)
        assert (out[10:20, 10:20] == 2200).all()
        assert out[30, 30] == 0
        assert out[0, 0] == 0

        reader = KinectFrameReader(seq, kinect_count=2, empty=str(empty))
        bkgs = reader.prepare_bkgs()
        assert len(bkgs) == 2
        np.testing.assert_allclose(bkgs[0], 3000.0)
        assert KinectFrameReader(seq, kinect_count=2).prepare_bkgs() is None

        # the GT reader forwards the empty-room sequence to the base class
        # (reference: frame_data.py:20-22), so background removal is
        # reachable from the production reader too
        from chore_tpu.behave.readers import FrameDataReader

        gt_reader = FrameDataReader(seq, empty=str(empty))
        gt_bkgs = gt_reader.prepare_bkgs()
        assert gt_bkgs is not None
        np.testing.assert_allclose(gt_bkgs[0], 3000.0)

    def test_interpolate_depth_fills_holes(self, seq):
        calib = self._calib(seq)
        depth = np.full((8, 8), 2.0)
        depth[3, 3] = 0.0
        depth[5, 6] = 0.0
        out = calib.interpolate_depth(depth)
        assert (out > 0).all()
        np.testing.assert_allclose(out, 2.0)

    def test_pc2color_roundtrip(self, seq):
        """dmap2pc -> pc2color -> color_to_pc recovers the 3D points."""
        calib = self._calib(seq)
        depth = np.zeros((48, 64), np.uint16)
        depth[10:40:3, 10:60:3] = 2000
        pc, mask = calib.dmap2pc(depth, return_mask=True)
        assert mask.sum() == len(pc)

        pix = calib.pc2color(pc)
        assert pix.shape == (len(pc), 2)
        # offset camera shifts pixels by fx*tx/z = 50*0.05/2 = 1.25
        base = calib.project_points(pc)
        np.testing.assert_allclose(pix[:, 0] - base[:, 0], 1.25, atol=1e-6)

        recovered = calib.color_to_pc(pix, pc, k=1)
        np.testing.assert_allclose(recovered, pc, atol=1e-9)

    def test_pc2color_valid_filters(self, seq):
        calib = self._calib(seq)
        pts = np.array([[0.0, 0.0, 2.0],     # center: valid
                        [10.0, 0.0, 2.0]])   # far off-image
        pix, kept = calib.pc2color_valid(pts)
        assert len(pix) == 1 and len(kept) == 1
        np.testing.assert_allclose(kept[0], pts[0])

    def test_get_pc_colors(self, seq):
        calib = self._calib(seq, d2c_t=(0.0, 0.0, 0.0))
        img = np.zeros((48, 64, 3), np.uint8)
        img[:, :, 0] = np.linspace(0, 255, 64, dtype=np.uint8)[None, :]
        pts = np.array([[0.0, 0.0, 2.0]])  # projects to (32, 24)
        colors = calib.get_pc_colors(pts, img)
        assert colors.shape == (1, 3)
        assert abs(colors[0, 0] - img[24, 32, 0] / 255.0) < 0.02
        assert colors[0, 1] == 0.0 and colors[0, 2] == 0.0

    def test_pc2dmap_and_dmap2colorpc(self, seq):
        calib = self._calib(seq, d2c_t=(0.0, 0.0, 0.0))
        depth = np.zeros((48, 64), np.uint16)
        depth[20:30, 25:40] = 1800
        pc = calib.dmap2pc(depth)
        dmap = calib.pc2dmap(pc)
        assert dmap.shape == (48, 64)
        # nearest-grid reprojection restores the depth where points exist
        np.testing.assert_allclose(dmap[24, 30], 1.8, atol=1e-6)

        color = np.full((48, 64, 3), 120, np.uint8)
        d2 = np.zeros((48, 64), np.uint16)
        d2[24, 32] = 1500
        pts, cols = calib.dmap2colorpc(color, d2)
        assert pts.shape == (1, 3) and cols.shape == (1, 3)
        assert (cols == 120).all()
