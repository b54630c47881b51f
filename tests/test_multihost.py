"""Multi-host branch tests under a mocked process topology.

jax.process_count() is always 1 in a test run, so the multi-host branches
(local-shard assembly, broadcast-synced decisions, rank gating) would
otherwise be dead code under test. parallel/mesh.py routes all topology
queries through module-level process_count()/process_index(), which these
tests monkeypatch -- and because a single host addresses the WHOLE mesh,
the real multi-host primitives (make_array_from_process_local_data,
broadcast_one_to_all) still execute end-to-end with local == global data.
Reference analog: utils/dist_utils.py:12-75 (never testable off-cluster).
"""
import numpy as np

import jax
import jax.numpy as jnp

import chore_tpu.parallel.mesh as mesh_mod
from chore_tpu.parallel import (
    is_main_process,
    local_batch_slice,
    make_mesh,
    shard_batch,
    sync_decision,
)


class TestShardBatchAssembly:
    def test_process_local_path_matches_device_put(self, monkeypatch):
        """The make_array_from_process_local_data branch must build the same
        sharded global array the single-host device_put branch does."""
        m = make_mesh()
        batch = {
            "x": np.arange(64, dtype=np.float32).reshape(8, 8),
            "n": {"y": np.arange(8, dtype=np.int32)},
        }
        single = shard_batch(batch, m)
        monkeypatch.setattr(mesh_mod, "process_count", lambda: 2)
        multi = shard_batch(batch, m)
        for a, b in zip(jax.tree_util.tree_leaves(single),
                        jax.tree_util.tree_leaves(multi)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert b.sharding.is_equivalent_to(a.sharding, a.ndim)

    def test_assembled_array_feeds_jit(self, monkeypatch):
        monkeypatch.setattr(mesh_mod, "process_count", lambda: 4)
        m = make_mesh()
        batch = shard_batch({"x": np.ones((8, 3), np.float32)}, m)
        total = jax.jit(lambda b: jnp.sum(b["x"]))(batch)
        assert float(total) == 24.0


class TestLocalBatchSlice:
    def test_partition_is_disjoint_and_complete(self):
        N, count = 24, 3
        covered = []
        for rank in range(count):
            s = local_batch_slice(N, count=count, index=rank)
            covered.extend(range(N)[s])
        assert covered == list(range(N))

    def test_defaults_to_live_topology(self, monkeypatch):
        monkeypatch.setattr(mesh_mod, "process_count", lambda: 4)
        monkeypatch.setattr(mesh_mod, "process_index", lambda: 2)
        assert local_batch_slice(16) == slice(8, 12)


class TestSyncDecision:
    def test_single_host_passthrough(self):
        assert sync_decision(True) is True
        assert sync_decision(False) is False

    def test_multi_host_branch_broadcasts(self, monkeypatch):
        """Faked count > 1 executes the real broadcast_one_to_all (a no-op
        collective with one real process) -- the trainer's checkpoint-gate
        sync path."""
        monkeypatch.setattr(mesh_mod, "process_count", lambda: 2)
        assert sync_decision(True) is True
        assert sync_decision(False) is False


class TestRankGating:
    def test_non_main_process(self, monkeypatch):
        monkeypatch.setattr(mesh_mod, "process_index", lambda: 3)
        assert not is_main_process()

    def test_trainer_save_and_logging_gate(self, monkeypatch, tmp_path):
        """A non-main rank must neither checkpoint nor log (reference:
        trainer.py:196-202 rank-0-only writes)."""
        monkeypatch.setattr(mesh_mod, "process_index", lambda: 1)
        from chore_tpu.models import CHOREField, FieldConfig
        from chore_tpu.train.trainer import Trainer

        cfg = FieldConfig(num_stack=1, num_hourglass=1, net_img_size=32)
        model = CHOREField(cfg=cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 5)),
                            jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)))
        tr = Trainer(model, params, str(tmp_path / "exp"), ck_period_min=1e9)
        assert tr.save() is None
        tr.logger.log(0, loss=1.0)
        assert not (tmp_path / "exp" / "metrics.jsonl").exists()
