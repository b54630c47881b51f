"""Turnkey parity-runbook smoke test (README "Chamfer parity runbook").

Drives the EXACT command chain a user runs to check Chamfer parity against
the reference's released weights, on a synthetic BEHAVE-format sequence so
no external data is needed:

  torch ``checkpoint_*.tar``  ->  tools/import_torch.py
  ->  chore_tpu.cli.recon.recon_fit (load checkpoint, fit every frame)
  ->  ReconEvaluator (Procrustes + bidirectional sqrt chamfer, JSON out)

With the real BEHAVE dataset + released weights the same chain yields the
paper's Table-1 comparison (reference protocol: recon/evaluate.py:133-203,
README.md:90). Here the net is random, so only the plumbing is asserted:
the imported weights reach the fitter, outputs land where the evaluator
looks, and the JSON carries finite numbers.
"""
import importlib.util
import json
import os

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from chore_tpu.cli.common import build_model  # noqa: E402
from chore_tpu.cli.recon import recon_fit  # noqa: E402
from chore_tpu.config import ChoreConfig  # noqa: E402
from chore_tpu.data.test_data import TestImagePrep as ImagePrep  # noqa: E402
from chore_tpu.recon.evaluate import ReconEvaluator  # noqa: E402
from chore_tpu.recon.fitter import FitConfig  # noqa: E402
from chore_tpu.recon.generator import SamplerConfig  # noqa: E402
from chore_tpu.smpl import SMPLH, synthetic_smplh  # noqa: E402
from chore_tpu.smpl.assets import load_landmark_regressors  # noqa: E402
from chore_tpu.smpl.model import init_params  # noqa: E402
from chore_tpu.utils.meshio import octasphere, save_ply  # noqa: E402
from tests.test_torch_import import _synth_torch_sd  # noqa: E402

CFG = ChoreConfig(exp_name="tiny-parity", num_stack=1, num_hourglass=1,
                  net_img_size=(64, 64), precision="float32")
FIT = FitConfig(iter_betas=1, iter_pose=1, iter_kpts_max=2, iter_obj=1,
                iter_sil=1, iter_joint_max=2, steps_per_iter=2,
                obj_samples=128, net_in_size=64, sil_rend_size=32)
SAMP = SamplerConfig(num_steps=2, sample_num=256, num_rounds=2,
                     num_points=128)


def _load_import_tool():
    spec = importlib.util.spec_from_file_location(
        "import_torch",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "import_torch.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_sequence(root):
    """One-frame BEHAVE-format sequence with GT fit meshes."""
    import cv2

    seq = root / "Date99_Sub99_basketball"
    frame = seq / "t0005.000"
    frame.mkdir(parents=True)
    with open(seq / "info.json", "w") as f:
        json.dump({"cat": "basketball", "gender": "male", "config": None,
                   "intrinsic": None, "empty": None, "kinects": [0, 1]}, f)

    smplh = SMPLH(synthetic_smplh())
    pose = np.zeros((1, 72), np.float32)
    sp = init_params(pose, np.zeros((1, 10)), np.zeros((1, 3)))
    sv = np.asarray(smplh.verts(sp))[0]
    pelvis = np.asarray(smplh.pelvis(sp))[0]
    sv = sv + (np.array([0, 0, 2.2]) - pelvis)
    ov, of = octasphere(radius=0.18, center=(0.45, 0.1, 2.25), subdiv=2)

    # GT fits for the evaluator
    (frame / "person" / "fit02").mkdir(parents=True)
    (frame / "basketball" / "fit01").mkdir(parents=True)
    save_ply(str(frame / "person" / "fit02" / "person_fit.ply"),
             sv, smplh.faces)
    save_ply(str(frame / "basketball" / "fit01" / "basketball_fit.ply"),
             ov, of)

    # camera-projected bboxes -> masks / keypoints consistent at z0 = 2.2
    prep = ImagePrep(image_size=(64, 64))

    def mask_from(verts):
        p = prep.persp_proj(verts)[:, :2]
        m = np.zeros((1536, 2048), np.uint8)
        x1, y1 = np.floor(p.min(0)).astype(int)
        x2, y2 = np.ceil(p.max(0)).astype(int)
        m[max(y1, 0):y2, max(x1, 0):x2] = 255
        return m

    img = np.full((1536, 2048, 3), 70, np.uint8)
    cv2.imwrite(str(frame / "k1.color.jpg"), img)
    cv2.imwrite(str(frame / "k1.person_mask.jpg"), mask_from(sv))
    om = mask_from(ov)
    cv2.imwrite(str(frame / "k1.obj_rend_mask.jpg"), om)
    cv2.imwrite(str(frame / "k1.obj_rend_full.jpg"), om)

    # openpose keypoints = projected body25 joints (-> crop scale 1.0)
    reg = load_landmark_regressors(None)["body25"]
    j2d = prep.persp_proj(reg @ sv)
    j2d[:, 2] = 1.0  # confidence
    with open(frame / "k1.color.json", "w") as f:
        json.dump({"body_joints": j2d.reshape(-1).tolist()}, f)

    save_ply(str(frame / "k1.mocap.ply"), sv, smplh.faces)
    with open(frame / "k1.mocap.json", "w") as f:
        json.dump({"pose": pose[0].tolist(),
                   "betas": np.zeros(10).tolist()}, f)
    return seq


@pytest.mark.slow  # tar->recon->eval e2e (~1 min)
class TestParityRunbook:
    def test_tar_to_eval_json(self, tmp_path):
        rng = np.random.RandomState(0)
        model, template = build_model(CFG)

        # 1. a reference-format .tar (DDP-prefixed model_state_dict)
        sd = _synth_torch_sd(template, rng)
        tar = tmp_path / "checkpoint_0h:0m:10s_10.0.tar"
        torch.save({"model_state_dict":
                    {f"module.{k}": torch.tensor(v) for k, v in sd.items()},
                    "epoch": 80}, str(tar))

        # 2. import into a chore_tpu experiment
        exp_root = str(tmp_path / "experiments")
        tool = _load_import_tool()
        ck = tool.import_checkpoint(str(tar), "tiny-parity", exp_root,
                                    cfg=CFG)
        assert os.path.isfile(ck)

        # the recon CLI's loading path must pick up the imported weights
        from chore_tpu.cli.common import load_trained
        _, loaded = load_trained(CFG, exp_root=exp_root)
        stem = np.asarray(
            jax.tree_util.tree_leaves(loaded)[0])
        assert not np.allclose(
            stem, np.asarray(jax.tree_util.tree_leaves(template)[0]))

        # 3. reconstruct the sequence
        seq = _build_sequence(tmp_path)
        outpath = str(tmp_path / "recon")
        recon_fit(CFG, str(seq), "parityrun", outpath=outpath,
                  exp_root=exp_root, fit_cfg=FIT, sampler_cfg=SAMP,
                  use_silhouette=False)
        out_dir = os.path.join(outpath, seq.name, "t0005.000", "parityrun")
        assert os.path.isfile(os.path.join(out_dir, "k1.smpl.ply"))
        assert os.path.isfile(os.path.join(out_dir, "k1.object.ply"))

        # 4. evaluate with the reference protocol
        ev = ReconEvaluator(outpath, str(tmp_path), sample_num=500,
                            outdir=str(tmp_path / "results"))
        result = ev.eval_seqs([str(seq)], "parityrun", tid=1)
        assert result is not None
        assert np.isfinite(result["smpl"]["mean"])
        assert np.isfinite(result["obj"]["mean"])
        files = os.listdir(tmp_path / "results")
        assert len(files) == 1  # timestamped JSON written


@pytest.mark.slow  # recon CLI over mesh (~1.5 min)
class TestDataParallelRecon:
    def test_recon_cli_over_mesh(self, tmp_path):
        """The --data-parallel recon path: batch padded to the device
        count, frames sharded over the 8-device mesh, outputs written for
        the real frames only."""
        seq = _build_sequence(tmp_path)
        outpath = str(tmp_path / "recon_dp")
        recon_fit(CFG, str(seq), "dprun", outpath=outpath,
                  exp_root=str(tmp_path / "none"), fit_cfg=FIT,
                  sampler_cfg=SAMP, use_silhouette=False,
                  data_parallel=True)
        out_dir = os.path.join(outpath, seq.name, "t0005.000", "dprun")
        assert os.path.isfile(os.path.join(out_dir, "k1.smpl.ply"))
        assert os.path.isfile(os.path.join(out_dir, "k1.object.ply"))
        # exactly one frame of outputs despite the padded batch of 8
        frames = os.listdir(os.path.join(outpath, seq.name))
        assert frames == ["t0005.000"]
