"""FitMonitor debug visualization (utils/viewer.py) -- the headless-safe
equivalent of the reference's MeshViewer/cv2 debug loops
(recon_fit_base.py:442-511)."""
import pytest

import json
import os

import numpy as np

import jax

from chore_tpu.utils.meshio import octasphere
from chore_tpu.utils.viewer import FitMonitor


class TestFitMonitor:
    @pytest.mark.slow  # full fit with monitor (~1 min)
    def test_snapshot_writes_frames_and_losses(self, tmp_path):
        mon = FitMonitor(str(tmp_path))
        sv, sf = octasphere(radius=0.3, center=(0, 0, 2.2), subdiv=2)
        rng = np.random.RandomState(0)
        pts = (rng.rand(500, 3) * 0.4 + [0.3, 0, 2.0]).astype(np.float32)
        f1 = mon.snapshot("pclouds", pclouds={"object": pts})
        f2 = mon.snapshot("smpl", meshes=[(sv, sf, mon.SMPL_COLOR)],
                          losses={"df_h": 0.5})
        assert f1 is not None and f2 is not None
        assert f1.shape == (512, 1024, 3)  # front + side, side by side
        files = sorted(os.listdir(tmp_path))
        assert "00_pclouds.jpg" in files and "01_smpl.jpg" in files
        with open(tmp_path / "losses.jsonl") as f:
            rec = json.loads(f.read().strip())
        assert rec["stage"] == "smpl" and rec["df_h"] == 0.5
        # the sphere must actually appear in the render
        assert (f2 > 30).any()

    def test_empty_snapshot_is_noop(self, tmp_path):
        mon = FitMonitor(str(tmp_path))
        assert mon.snapshot("nothing") is None
        assert os.listdir(tmp_path) == []

    @pytest.mark.slow  # full fit with monitor (~1 min)
    def test_fit_batch_monitor_hook(self):
        """fit_batch(monitor=...) snapshots pclouds, smpl and object."""
        import jax.numpy as jnp

        from chore_tpu.models import CHOREField
        from chore_tpu.recon.fitter import ReconFitter
        from chore_tpu.smpl import SMPLH, synthetic_smplh
        from tests.test_fit_e2e import FIT, SAMP, TINY, _batch

        model = CHOREField(cfg=TINY)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
            jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)))
        smplh = SMPLH(synthetic_smplh())
        tv, tf = octasphere(radius=0.15, subdiv=2)
        fitter = ReconFitter(model, params, smplh, tv, tf, cfg=FIT,
                             sampler_cfg=SAMP)

        class Recorder(FitMonitor):
            def __init__(self):
                super().__init__(outdir=None)
                self.stages = []

            def snapshot(self, stage, **kw):
                self.stages.append(stage)

        rec = Recorder()
        images, cc, poses, betas, kpts = _batch()
        fitter.fit_batch(images, cc, poses, betas, kpts,
                         use_silhouette=False, monitor=rec)
        assert rec.stages == ["pclouds", "smpl", "object"]
