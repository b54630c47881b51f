"""Library-facade test: Reconstructor one-call reconstruction on a
synthetic frame (chore_tpu/api.py)."""
import os

import numpy as np
import pytest

from chore_tpu.config import ChoreConfig
from chore_tpu.recon.fitter import FitConfig
from chore_tpu.recon.generator import SamplerConfig

CFG = ChoreConfig(exp_name="tiny-api", num_stack=1, num_hourglass=1,
                  net_img_size=(64, 64), precision="float32")
FIT = FitConfig(iter_betas=1, iter_pose=1, iter_kpts_max=2, iter_obj=1,
                iter_sil=1, iter_joint_max=2, steps_per_iter=2,
                obj_samples=128, net_in_size=64, sil_rend_size=32)
SAMP = SamplerConfig(num_steps=2, sample_num=256, num_rounds=2,
                     num_points=128)


@pytest.fixture(scope="module")
def frame_dir(tmp_path_factory):
    from tests.test_parity_runbook import _build_sequence

    root = tmp_path_factory.mktemp("api_seq")
    seq = _build_sequence(root)
    return os.path.join(str(seq), "t0005.000")


@pytest.mark.slow  # full fit pipeline x2 (~6 min)
class TestReconstructor:
    def test_one_call_and_save(self, frame_dir, tmp_path):
        from chore_tpu.api import Reconstructor

        rec = Reconstructor(CFG, obj_name="basketball",
                            exp_root=str(tmp_path / "none"),
                            fit_cfg=FIT, sampler_cfg=SAMP,
                            crop_info_dir=str(tmp_path))
        rgb = os.path.join(frame_dir, "k1.color.jpg")
        out = rec.reconstruct(rgb, use_silhouette=False)
        assert out["smpl_verts"].shape == (1, 6890, 3)
        assert np.isfinite(out["smpl_verts"]).all()
        assert np.isfinite(out["obj_verts"]).all()
        R = out["obj_R"][0]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)

        dirs = rec.save(out, str(tmp_path / "res"))
        assert os.path.isfile(os.path.join(dirs[0], "smpl.ply"))
        assert os.path.isfile(os.path.join(dirs[0], "object.ply"))
        assert os.path.isfile(os.path.join(dirs[0], "overlay.jpg"))

    def test_list_input_batches(self, frame_dir, tmp_path):
        from chore_tpu.api import Reconstructor

        rec = Reconstructor(CFG, obj_name="basketball",
                            exp_root=str(tmp_path / "none"),
                            fit_cfg=FIT, sampler_cfg=SAMP,
                            crop_info_dir=str(tmp_path))
        rgb = os.path.join(frame_dir, "k1.color.jpg")
        out = rec.reconstruct([rgb, rgb], use_silhouette=False)
        assert out["smpl_verts"].shape[0] == 2
        # identical inputs, shared key path -> both frames finite
        assert np.isfinite(out["obj_verts"]).all()
