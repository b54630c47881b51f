"""Demo-path integration test on the BUNDLED REAL example.

SURVEY §4 test-strategy item (3): a CPU-runnable end-to-end demo test on
/root/reference/example/000000117377/ — the real photo, masks, openpose
keypoints and mocap. Drives cli.demo.run_demo (the reference demo.py:19-84
workflow: mean-center prep -> coco-weight fitting -> ply outputs -> un-crop
overlay) with a tiny model/schedule, asserting every artifact lands.
"""
import os

import numpy as np
import pytest

from chore_tpu.config import ChoreConfig
from chore_tpu.recon.fitter import FitConfig
from chore_tpu.recon.generator import SamplerConfig

EXAMPLE = "/root/reference/example"
RGB = os.path.join(EXAMPLE, "000000117377", "k1.color.jpg")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(RGB),
    reason="bundled reference example not available",
)


@pytest.mark.slow  # demo CLI e2e (~1.5 min)
def test_run_demo_on_real_example(tmp_path):
    from chore_tpu.cli.demo import run_demo

    cfg = ChoreConfig(exp_name="tiny-demo", num_stack=1, num_hourglass=1,
                      net_img_size=(64, 64))
    fit_cfg = FitConfig(iter_betas=1, iter_pose=1, iter_kpts_max=2,
                        iter_obj=1, iter_sil=1, iter_joint_max=2,
                        steps_per_iter=2, obj_samples=128, net_in_size=64,
                        sil_rend_size=32)
    samp = SamplerConfig(num_steps=2, sample_num=256, num_rounds=2,
                         num_points=128)
    out = str(tmp_path / "demo_out")
    run_demo(cfg, EXAMPLE, "basketball", outpath=out, max_frames=1,
             fit_cfg=fit_cfg, sampler_cfg=samp, render_size=64,
             exp_root=str(tmp_path / "no_experiments"))

    frame = os.path.join(out, "000000117377", "demo")
    for f in ["smpl.ply", "object.ply", "human_pc.ply", "object_pc.ply",
              "overlay.jpg", "side.jpg"]:
        path = os.path.join(frame, f)
        assert os.path.isfile(path), f
        assert os.path.getsize(path) > 0, f

    # the overlay must be the ORIGINAL photo's size (un-cropped alignment,
    # reference demo.py:37-53) and actually contain the photo
    import cv2

    overlay = cv2.imread(os.path.join(frame, "overlay.jpg"))
    orig = cv2.imread(RGB)
    assert overlay.shape == orig.shape
    assert float(np.abs(overlay.astype(int) - orig.astype(int)).mean()) < 120
