"""Preprocessing + evaluation tests on synthetic scenes with known GT."""
import json
import os
import pickle

import numpy as np
import pytest

from chore_tpu.preprocess import BoundarySampler, flip_part_labels
from chore_tpu.recon.evaluate import ReconEvaluator, ReconDataReader
from chore_tpu.utils.meshio import save_ply
from tests.test_fitting import octasphere


class TestBoundarySampler:
    def test_udf_correct_on_spheres(self):
        """Human = sphere r=.5 at origin-ish; object = sphere r=.2 offset.
        The sampled UDFs must match the analytic sphere distance."""
        sv, sf = octasphere(radius=0.5, center=(0, 0, 2.2), subdiv=3)
        ov, of = octasphere(radius=0.2, center=(0.8, 0, 2.2), subdiv=3)
        # pad human mesh to 6890 verts so part-label transfer works:
        # append far-away dummy verts (never nearest)
        pad = 6890 - len(sv)
        dummy = np.full((pad, 3), 50.0, np.float32)
        smpl_v = np.concatenate([sv, dummy], 0)
        sampler = BoundarySampler(seed=0)
        out = sampler.boundary_sample_all(
            smpl_v, sf, ov, of, sigmas=[0.02], ratios=[1.0],
            sample_num=2000, min_samples=1000,
        )
        pts = out["points"]["sigma0.02"]
        dh = out["dist_h"]["sigma0.02"]
        do = out["dist_o"]["sigma0.02"]
        # analytic: distance to sphere surfaces (faceted -> small tolerance)
        c_h = np.array([0, 0, 2.2])
        ana_h = np.abs(np.linalg.norm(pts - c_h, axis=1) - 0.5)
        c_o = np.array([0.8, 0, 2.2])
        ana_o = np.abs(np.linalg.norm(pts - c_o, axis=1) - 0.2)
        assert np.abs(dh - ana_h).mean() < 0.01
        assert np.abs(do - ana_o).mean() < 0.01
        assert out["obj_center"] == pytest.approx(ov.mean(0), abs=1e-5)
        assert out["pca_axis"].shape == (3, 3)

    def test_flip_part_labels_involution(self):
        parts = np.arange(14)
        flipped = flip_part_labels(parts)
        assert np.array_equal(flip_part_labels(flipped), parts)
        assert flipped[1] == 6 and flipped[6] == 1
        assert flipped[0] == 0 and flipped[11] == 11  # head/torso unchanged


def _make_fake_recon_tree(tmp_path, offset, scale=1.0):
    """Build SEQ + RECON dirs: GT = two spheres; recon = transformed copy."""
    seq = tmp_path / "Date01_Sub01_basketball"
    frame = seq / "t0003.000"
    recon = tmp_path / "recon"
    (frame / "person" / "fit02").mkdir(parents=True)
    (frame / "basketball" / "fit01").mkdir(parents=True)
    (seq / "t0003.000").mkdir(exist_ok=True)
    with open(seq / "info.json", "w") as f:
        json.dump({"cat": "basketball", "gender": "male", "config": None,
                   "intrinsic": None, "empty": None, "kinects": [0, 1]}, f)
    sv, sf = octasphere(radius=0.5, center=(0, 0.2, 2.2), subdiv=3)
    ov, of = octasphere(radius=0.2, center=(0.7, 0, 2.2), subdiv=3)
    save_ply(str(frame / "person" / "fit02" / "person_fit.ply"), sv, sf)
    save_ply(str(frame / "basketball" / "fit01" / "basketball_fit.ply"), ov, of)
    # masks for the occlusion gate
    import cv2
    m = np.zeros((100, 100), np.uint8)
    m[10:90, 10:90] = 255
    cv2.imwrite(str(frame / "k1.obj_rend_mask.jpg"), m)
    cv2.imwrite(str(frame / "k1.obj_rend_full.jpg"), m)
    # recon: same meshes, rigidly moved (Procrustes must undo this)
    out = recon / "Date01_Sub01_basketball" / "t0003.000" / "test-sn"
    out.mkdir(parents=True)
    save_ply(str(out / "k1.smpl.ply"), sv * scale + offset, sf)
    save_ply(str(out / "k1.object.ply"), ov * scale + offset, of)
    return str(seq), str(recon)


class TestEvaluator:
    def test_perfect_recon_after_alignment(self, tmp_path):
        seq, recon = _make_fake_recon_tree(
            tmp_path, offset=np.array([0.5, -0.3, 1.0]), scale=1.3
        )
        ev = ReconEvaluator(recon, str(tmp_path), sample_num=2000,
                            outdir=str(tmp_path / "results"))
        result = ev.eval_seqs([seq], "test-sn", tid=1)
        assert result is not None
        # rigid+scale offset must be removed by Procrustes down to the
        # 2000-sample chamfer floor (~0.04 = 2 directional means of ~NN
        # spacing); the raw offset is ~1.16m
        assert result["smpl"]["mean"] < 6e-2
        assert result["obj"]["mean"] < 6e-2
        assert result["total"] == 1
        assert "basketball" in result
        # JSON written
        files = os.listdir(tmp_path / "results")
        assert len(files) == 1

    def test_occlusion_gate_skips(self, tmp_path):
        seq, recon = _make_fake_recon_tree(tmp_path, offset=np.zeros(3))
        # shrink visible mask below 30% of full
        import cv2
        frame = os.path.join(seq, "t0003.000")
        m = np.zeros((100, 100), np.uint8)
        m[10:20, 10:20] = 255
        cv2.imwrite(os.path.join(frame, "k1.obj_rend_mask.jpg"), m)
        ev = ReconEvaluator(recon, str(tmp_path), sample_num=500,
                            outdir=str(tmp_path / "results"))
        result = ev.eval_seqs([seq], "test-sn", tid=1)
        assert result is None  # every frame gated out


class TestProcessScaleSeq:
    def test_full_sequence_preprocessing(self, tmp_path):
        """cli.preprocess's engine end-to-end on a synthetic BEHAVE
        sequence: world->kinect transform, 2.2/z depth scaling, boundary
        sampling, npz layout (reference: preprocess_scale.py:29-129)."""
        import sys

        from chore_tpu.preprocess import process_scale_seq
        from chore_tpu.smpl import SMPLH, synthetic_smplh
        from chore_tpu.smpl.model import init_params

        # reuse the synthetic BEHAVE tree from the reader tests
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from tests.test_readers import seq as seq_fixture

        seq_dir = seq_fixture.__wrapped__(tmp_path)

        # replace the sphere person fits with a real-sized body: the
        # depth scaling regresses the pelvis from 6890 verts
        import jax.numpy as jnp
        smplh = SMPLH(synthetic_smplh())
        sp = init_params(jnp.zeros((1, 72)), jnp.zeros((1, 10)),
                         jnp.zeros((1, 3)))
        sv = np.asarray(smplh.verts(sp))[0]
        pelvis = np.asarray(smplh.pelvis(sp))[0]
        sv = sv + (np.array([0, 0, 2.0]) - pelvis)  # z=2.0 -> scale 1.1
        for t in ("t0001.000", "t0002.000", "t0003.000"):
            f = os.path.join(seq_dir, t, "person", "fit02",
                             "person_fit.ply")
            if os.path.isfile(f):
                save_ply(f, sv, smplh.faces)

        out = process_scale_seq(seq_dir, str(tmp_path / "proc"),
                                sample_num=2000, kids=[0, 1])
        # 2 complete frames x 2 kinects (the incomplete frame has fits
        # too, so it also processes -- frames discovery already dropped
        # nothing here because fits exist; count what came back)
        assert len(out) >= 4
        data = np.load(out[0], allow_pickle=True)
        for key in ("points", "dist_h", "dist_o", "parts", "pca_axis",
                    "smpl_center", "obj_center", "image_file", "sigmas"):
            assert key in data, key
        # depth normalization: smpl center at the fixed depth
        assert abs(float(data["smpl_center"][2]) - 2.2) < 1e-3
        # idempotent re-run (is-done skip)
        out2 = process_scale_seq(seq_dir, str(tmp_path / "proc"),
                                 sample_num=2000, kids=[0, 1])
        assert out2 == out
