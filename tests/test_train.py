"""Trainer + checkpoint + multi-device sharding tests (8-dev CPU mesh)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chore_tpu.models import CHOREField, FieldConfig
from chore_tpu.parallel import make_mesh, shard_batch
from chore_tpu.train import Trainer, multistep_lr, update_val_min, find_checkpoint

TINY = FieldConfig(num_stack=1, num_hourglass=2, net_img_size=32)


def make_batch(rng, B=8, N=32, img=32):
    return {
        "images": rng.rand(B, img, img, 5).astype(np.float32),
        "points": (rng.rand(B, N, 3) * [2, 2, 0.5] + [-1, -1, 1.95]).astype(np.float32),
        "crop_center": np.tile([[1018.0, 779.0]], (B, 1)).astype(np.float32),
        "df_h": np.abs(rng.randn(B, N)).astype(np.float32) * 0.05,
        "df_o": np.abs(rng.randn(B, N)).astype(np.float32) * 0.05,
        "parts": rng.randint(0, 14, (B, N)).astype(np.int32),
        "pca": np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1)),
        "body_center": np.tile([[0.0, 0, 2.2]], (B, 1)).astype(np.float32),
        "obj_center": np.tile([[0.3, 0, 0.0]], (B, 1)).astype(np.float32),
    }


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    model = CHOREField(cfg=TINY)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 5)),
        jnp.zeros((1, 8, 3)),
        jnp.zeros((1, 2)),
    )
    exp_dir = str(tmp_path_factory.mktemp("exp"))
    return Trainer(model, params, exp_dir, mesh=make_mesh(), ck_period_min=1e9)


class TestMultistepLR:
    def test_schedule(self):
        lr = multistep_lr(1e-3, (15, 25), 0.3)
        assert np.isclose(lr(0), 1e-3)
        assert np.isclose(lr(15), 3e-4)
        assert np.isclose(lr(25), 9e-5)


class TestTrainer:
    def test_uses_all_8_devices(self, trainer):
        assert len(jax.devices()) == 8
        assert trainer.mesh.devices.size == 8

    def test_loss_decreases(self, trainer, rng):
        batch = make_batch(rng)
        losses = [float(trainer.train_step(batch)[0]) for _ in range(8)]
        assert losses[-1] < losses[0]

    def test_val_loss_handles_partial_batches(self, trainer, rng):
        """A val batch not divisible by the 8-device mesh (the trailing
        drop_last=False remainder) must wrap-pad instead of crashing
        shard_batch, and the batch average must weight by REAL size: a
        divisible batch plus itself wrap-padded from a 2-sample prefix
        gives the exact per-batch losses to compare against."""
        b8 = make_batch(rng, B=8)
        b2 = {k: v[:2] for k, v in b8.items()}
        l8 = trainer.compute_val_loss([b8])
        l2 = trainer.compute_val_loss([b2])  # wrap-pads 2 -> 8, exact
        combined = trainer.compute_val_loss([b8, b2])
        assert np.isfinite(l8) and np.isfinite(l2)
        np.testing.assert_allclose(combined, (8 * l8 + 2 * l2) / 10,
                                   rtol=1e-6)

    def test_sharded_matches_replicated_semantics(self, rng):
        # the loss on a sharded batch equals the loss computed single-device
        model = CHOREField(cfg=TINY)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 5)),
            jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)))
        batch = make_batch(rng)
        from chore_tpu.models import chore_losses

        def loss_fn(params, batch):
            preds = model.apply(params, batch["images"], batch["points"],
                                batch["crop_center"])
            return chore_losses(preds, batch, TINY)[0]

        single = float(loss_fn(params, jax.tree_util.tree_map(jnp.asarray, batch)))
        mesh = make_mesh()
        sharded_batch = shard_batch(batch, mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        f = jax.jit(loss_fn,
                    in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))))
        from chore_tpu.parallel import replicate

        sharded = float(f(replicate(params, mesh), sharded_batch))
        assert np.isclose(single, sharded, rtol=1e-4)

    def test_checkpoint_roundtrip(self, trainer, rng):
        trainer.training_time = 42.0
        trainer.epoch = 3
        name = trainer.save()
        assert name is not None
        p0 = jax.device_get(trainer.params)
        trainer.epoch = 0
        assert trainer.load()
        assert trainer.epoch == 3
        p1 = jax.device_get(trainer.params)
        chex = [np.allclose(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1))]
        assert all(chex)

    def test_resume_best_vs_latest(self, rng, tmp_path):
        """resume='best' rolls back to the val_min checkpoint (reference
        trainer.py:219-230); resume='latest' keeps the newest (our
        default, PARITY.md-documented deviation now behind a flag)."""
        model = CHOREField(cfg=TINY)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 5)),
            jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)))
        tr = Trainer(model, params, str(tmp_path), mesh=make_mesh(),
                     ck_period_min=1e9)
        tr.epoch, tr.training_time = 2, 100.0
        best_name = tr.save()
        update_val_min(str(tmp_path), 2, 1.0, best_name)
        # train further, save a later (worse-val) checkpoint
        tr.train_step(make_batch(rng, img=32))
        tr.epoch, tr.training_time = 5, 200.0
        tr.save()

        assert tr.load(resume="best")
        assert tr.epoch == 2
        assert tr.load(resume="latest")
        assert tr.epoch == 5
        with pytest.raises(ValueError):
            tr.load(resume="newest")

    def test_resume_restores_global_step(self, rng, tmp_path):
        """global_step survives save/load: a resumed run must continue the
        metrics timeline (and not re-trigger the one-shot profiler trace)
        instead of folding the step counter back to 0."""
        model = CHOREField(cfg=TINY)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 5)),
            jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)))
        tr = Trainer(model, params, str(tmp_path), mesh=make_mesh(),
                     ck_period_min=1e9)
        tr.train_step(make_batch(rng, img=32))
        tr.train_step(make_batch(rng, img=32))
        assert tr.global_step == 2
        tr.save()
        tr.global_step = 0
        assert tr.load()
        assert tr.global_step == 2

    def test_load_checkpoint_without_global_step(self, tmp_path):
        """Checkpoints written before global_step entered the payload
        still load (global_step falls back to 0)."""
        from flax import serialization

        from chore_tpu.train.checkpoints import (checkpoint_name,
                                                 load_checkpoint)

        state = {"w": np.arange(3, dtype=np.float32)}
        legacy = {"state": state, "epoch": np.asarray(7),
                  "training_time": np.asarray(33.0)}
        path = str(tmp_path / checkpoint_name(33.0))
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(legacy))
        got, epoch, t, step = load_checkpoint(
            path, {"w": np.zeros(3, np.float32)})
        assert epoch == 7 and t == 33.0 and step == 0
        assert np.allclose(got["w"], state["w"])

    def test_val_min_pointer(self, tmp_path):
        d = str(tmp_path)
        assert update_val_min(d, 1, 10.0, "ck1")
        assert update_val_min(d, 2, 10.5, "ck2")  # within +1.0 tolerance
        assert not update_val_min(d, 3, 99.0, "ck3")  # rejected
        files = os.listdir(d)
        assert any(f.startswith("val_min=2") for f in files)


class TestShardingScaling:
    """Per-device batch math at every mesh width (companion to
    tools/scaling_curve.py, which measures the timing trend)."""

    @pytest.mark.parametrize("width", [1, 2, 4, 8])
    def test_per_device_batch(self, rng, width):
        mesh = make_mesh(devices=jax.devices()[:width])
        B = 8
        batch = make_batch(rng, B=B)
        sharded = shard_batch(batch, mesh)
        for k, v in sharded.items():
            shards = v.addressable_shards
            assert len(shards) == width, k
            for s in shards:
                assert s.data.shape[0] == B // width, (k, s.data.shape)
        # the global loss must not depend on the mesh width
        model = CHOREField(cfg=TINY)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 5)),
            jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)))
        from jax.sharding import NamedSharding, PartitionSpec as P

        from chore_tpu.models import chore_losses
        from chore_tpu.parallel import replicate

        def loss_fn(p, b):
            preds = model.apply(p, b["images"], b["points"],
                                b["crop_center"])
            return chore_losses(preds, b, TINY)[0]

        f = jax.jit(loss_fn, in_shardings=(NamedSharding(mesh, P()),
                                           NamedSharding(mesh, P("data"))))
        loss = float(f(replicate(params, mesh), sharded))
        if not hasattr(type(self), "_ref_loss"):
            type(self)._ref_loss = loss
        assert np.isclose(loss, type(self)._ref_loss, rtol=1e-4)


class TestGraftEntry:
    @pytest.mark.slow  # ~3 min; the driver runs this exact check
    # itself every round (fast lane keeps the cheap entry checks)
    def test_dryrun_multichip_8(self):
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    @pytest.mark.slow  # ~2 min; driver-duplicated, see above
    def test_dryrun_subprocess_fallback(self):
        """A parent seeing fewer than n devices must re-exec the payload in
        a forced-CPU subprocess (the MULTICHIP_r01/r02 failure mode: an
        in-process platform swap after backend init silently no-ops)."""
        import re
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {**os.environ}
        # parent child: 1 CPU device only -> must take the subprocess path
        env["XLA_FLAGS"] = re.sub(
            r"--xla_force_host_platform_device_count=\d+", "",
            env.get("XLA_FLAGS", "")).strip()
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms', 'cpu'); "
             "assert len(jax.devices()) < 8; "
             "import __graft_entry__ as g; g.dryrun_multichip(8)"],
            capture_output=True, text=True, timeout=600, cwd=repo, env=env)
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "OK" in proc.stdout


class TestFlopsEstimate:
    """Analytic MXU FLOP counter (utils/profiling.py flops_estimate)."""

    def test_matmul(self):
        import jax.numpy as jnp
        from chore_tpu.utils.profiling import flops_estimate

        a = jnp.zeros((16, 32))
        b = jnp.zeros((32, 8))
        got = flops_estimate(lambda x, y: x @ y, a, b)
        assert got == 2 * 16 * 32 * 8

    def test_conv_and_scan(self):
        import jax
        import jax.numpy as jnp
        from chore_tpu.utils.profiling import flops_estimate

        x = jnp.zeros((2, 8, 8, 3))
        k = jnp.zeros((3, 3, 3, 4))

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        want = 2 * (2 * 8 * 8 * 4) * (3 * 3 * 3)
        assert flops_estimate(conv, x, k) == want

        k2 = jnp.zeros((3, 3, 3, 3))  # channel-preserving: stable carry
        want2 = 2 * (2 * 8 * 8 * 3) * (3 * 3 * 3)

        def scanned(x, k):
            def body(c, _):
                return conv(c, k), ()
            out, _ = jax.lax.scan(body, x, None, length=5)
            return out

        assert flops_estimate(scanned, x, k2) == 5 * want2
