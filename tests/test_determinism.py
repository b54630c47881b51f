"""Determinism audit: same seeds -> bit-identical results.

The reference's nondeterminism sources (SURVEY §5: atomicInc face binning,
urandom worker seeding, dataset retry resampling, random SVD jitter) are
all either eliminated by design here (XLA kernels are deterministic; the
SVD jitter and sampler noise are threaded PRNG keys) or made reproducible.
This suite pins that property -- the closest thing to a race detector a
single-host test can be: any data race or nondeterministic reduction in
the jitted stages would break bitwise equality.
"""
import pytest

import numpy as np

import jax
import jax.numpy as jnp

from chore_tpu.models import CHOREField, FieldConfig
from chore_tpu.recon.fitter import ReconFitter
from chore_tpu.smpl import SMPLH, synthetic_smplh
from chore_tpu.utils.meshio import octasphere
from tests.test_fit_e2e import FIT, SAMP, TINY, _batch


def _tree_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow  # two full fits (~1.5 min)
class TestFitDeterminism:
    def test_fit_batch_bitwise_reproducible(self):
        model = CHOREField(cfg=TINY)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
            jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)))
        smplh = SMPLH(synthetic_smplh())
        tv, tf = octasphere(radius=0.15, subdiv=2)
        fitter = ReconFitter(model, params, smplh, tv, tf, cfg=FIT,
                             sampler_cfg=SAMP)
        images, cc, poses, betas, kpts = _batch()
        r1 = fitter.fit_batch(images, cc, poses, betas, kpts,
                              key=jax.random.PRNGKey(7),
                              use_silhouette=False)
        r2 = fitter.fit_batch(images, cc, poses, betas, kpts,
                              key=jax.random.PRNGKey(7),
                              use_silhouette=False)
        _tree_equal(r1["smpl_params"], r2["smpl_params"])
        _tree_equal(r1["obj_params"], r2["obj_params"])
        _tree_equal(r1["pclouds"]["object"]["points"],
                    r2["pclouds"]["object"]["points"])


@pytest.mark.slow  # two train compiles (~1.2 min)
class TestTrainDeterminism:
    def test_train_step_bitwise_reproducible(self, tmp_path):
        from chore_tpu.train.trainer import Trainer

        cfg = FieldConfig(num_stack=1, num_hourglass=1, net_img_size=32)
        model = CHOREField(cfg=cfg)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 5)),
            jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)))
        rng = np.random.RandomState(0)
        B, N = 8, 64  # divisible by the 8-device test mesh
        batch = {
            "images": rng.rand(B, 32, 32, 5).astype(np.float32),
            "points": (rng.rand(B, N, 3) * [2, 2, 0.5]
                       + [-1, -1, 1.95]).astype(np.float32),
            "crop_center": np.tile([[1018.0, 779.0]], (B, 1)).astype(np.float32),
            "df_h": np.abs(rng.randn(B, N)).astype(np.float32) * 0.05,
            "df_o": np.abs(rng.randn(B, N)).astype(np.float32) * 0.05,
            "parts": rng.randint(0, 14, (B, N)).astype(np.int32),
            "pca": np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1)),
            "body_center": np.tile([[0.0, 0, 2.2]], (B, 1)).astype(np.float32),
            "obj_center": np.tile([[0.3, 0, 0.0]], (B, 1)).astype(np.float32),
        }

        losses = []
        for run in range(2):
            tr = Trainer(model, params, str(tmp_path / f"exp{run}"),
                         ck_period_min=1e9)
            run_losses = [float(tr.train_step(dict(batch))[0])
                          for _ in range(3)]
            losses.append(run_losses)
        assert losses[0] == losses[1]

    def test_loader_epoch_order_reproducible(self, tmp_path):
        """Shuffled batch order depends only on the epoch seed
        (DistributedSampler.set_epoch semantics, base_data.py:49-69)."""
        from chore_tpu.data.loader import DataLoader

        class Items:
            def __len__(self):
                return 17

            def __getitem__(self, i):
                return {"i": np.asarray(i)}

        def order(epoch):
            dl = DataLoader(Items(), batch_size=4, shuffle=True,
                            num_workers=0, drop_last=False)
            dl.set_epoch(epoch)
            return [int(x) for b in dl for x in b["i"]]

        assert order(3) == order(3)
        assert order(3) != order(4)
