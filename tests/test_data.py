"""Data pipeline tests: image ops on synthetic data, the loader, and --
when the bundled reference example is present -- the full test-time prep on
a real image."""
import json
import time
import os

import numpy as np
import pytest

from chore_tpu.data import BehaveTrainData, DataLoader, collate
from chore_tpu.data import TestImagePrep as ImagePrep
from chore_tpu.data import image_ops as iops

EXAMPLE = "/root/reference/example/000000117377/k1.color.jpg"


class TestImageOps:
    def test_masks2bbox(self):
        m1 = np.zeros((100, 120), np.uint8)
        m1[20:40, 30:50] = 255
        m2 = np.zeros_like(m1)
        m2[35:60, 45:80] = 255
        bmin, bmax = iops.masks2bbox([m1, m2])
        assert tuple(bmin) == (30, 20)
        assert tuple(bmax) == (80, 60)

    def test_crop_pads_at_borders(self):
        img = np.arange(100, dtype=np.float32).reshape(10, 10)
        out = iops.crop(img, np.array([0, 0]), np.array([6, 6]))
        assert out.shape == (6, 6)
        assert out[0, 0] == 0  # padded corner

    def test_compose_rgbm3_removes_background(self):
        rgb = np.ones((8, 8, 3), np.float32)
        pm = np.zeros((8, 8), np.float32)
        om = np.zeros((8, 8), np.float32)
        pm[2:4, 2:4] = 1.0
        out = iops.compose_rgbm3(om, pm, rgb)
        assert out.shape == (8, 8, 5)
        assert out[0, 0, 0] == 0.0  # background removed
        assert out[2, 2, 0] == 1.0
        assert out[2, 2, 3] == 1.0  # person channel

    def test_compose_rgbm3_u8_matches_float_path(self):
        """uint8 transport is bitwise-lossless: normalizing the uint8
        composition reproduces the float composition of the /255 inputs
        exactly, including fractional (resized) mask edges around the
        0.5 threshold."""
        rng = np.random.RandomState(3)
        rgb = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        pm = rng.randint(0, 256, (16, 16)).astype(np.uint8)
        om = rng.randint(0, 256, (16, 16)).astype(np.uint8)
        pm[0, 0], pm[0, 1] = 127, 128  # straddle the threshold
        want = iops.compose_rgbm3(om / 255.0, pm / 255.0, rgb / 255.0)
        got = iops.compose_rgbm3_u8(om, pm, rgb)
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(
            got.astype(np.float32) / np.float32(255.0), want)

    def test_resize_checks_aspect(self):
        img = np.zeros((10, 20), np.float32)
        with pytest.raises(AssertionError):
            iops.resize(img, (64, 64))


class _ToyDataset:
    def __init__(self, n=23):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32), "path": f"p{i}"}


class TestLoader:
    def test_batching_and_drop_last(self):
        loader = DataLoader(_ToyDataset(23), batch_size=4, shuffle=False,
                            num_workers=2)
        batches = list(loader)
        assert len(batches) == 5  # 23 // 4
        assert batches[0]["x"].shape == (4, 3)
        assert batches[0]["path"] == ["p0", "p1", "p2", "p3"]

    def test_sharding_partitions(self):
        a = DataLoader(_ToyDataset(16), batch_size=2, shuffle=False,
                       shard_index=0, shard_count=2, num_workers=1)
        b = DataLoader(_ToyDataset(16), batch_size=2, shuffle=False,
                       shard_index=1, shard_count=2, num_workers=1)
        xa = np.concatenate([bt["x"][:, 0] for bt in a])
        xb = np.concatenate([bt["x"][:, 0] for bt in b])
        assert len(set(xa) & set(xb)) == 0
        assert len(set(xa) | set(xb)) == 16

    def test_dataset_error_propagates(self):
        """A dataset exception must surface at the consumer, not kill the
        producer thread and leave the consumer blocked on the queue."""

        class _Broken(_ToyDataset):
            def __getitem__(self, i):
                if i == 5:
                    raise FileNotFoundError("mask missing")
                return super().__getitem__(i)

        loader = DataLoader(_Broken(23), batch_size=4, shuffle=False,
                            num_workers=2)
        with pytest.raises(FileNotFoundError, match="mask missing"):
            list(loader)

    def test_consumer_abandonment_unblocks_producer(self):
        """Breaking out of iteration mid-epoch must not leave the producer
        thread parked forever on a full queue."""
        import threading

        before = threading.active_count()
        loader = DataLoader(_ToyDataset(64), batch_size=4, shuffle=False,
                            num_workers=1, prefetch=1)
        it = iter(loader)
        next(it)
        it.close()  # generator finally sets the stop event
        deadline = time.time() + 10.0
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before, "producer thread leaked"

    def test_epoch_shuffling_differs(self):
        loader = DataLoader(_ToyDataset(16), batch_size=16, shuffle=True,
                            num_workers=1)
        loader.set_epoch(0)
        x0 = next(iter(loader))["x"][:, 0]
        loader.set_epoch(1)
        x1 = next(iter(loader))["x"][:, 0]
        assert not np.array_equal(x0, x1)


@pytest.mark.skipif(not os.path.isfile(EXAMPLE),
                    reason="bundled reference example not available")
class TestExampleImagePrep:
    def test_full_prep(self, tmp_path):
        prep = ImagePrep(use_mean_center=True,
                             crop_info_dir=str(tmp_path))
        item = prep.prepare(EXAMPLE)
        assert item["images"].shape == (512, 512, 5)
        assert item["images"].min() >= 0 and item["images"].max() <= 1.0
        # person and object masks non-empty in the crop
        assert item["images"][..., 3].sum() > 100
        assert item["images"][..., 4].sum() > 100
        assert item["mocap_pose"].shape == (72,)
        assert item["mocap_betas"].shape == (10,)
        assert 0.3 < item["crop_scale"] < 3.0
        # keypoints with confidence land inside the net input
        k = item["kpts"]
        conf = k[:, 2] > 0.3
        assert conf.sum() >= 10
        assert (k[conf, :2] >= -50).all() and (k[conf, :2] <= 562).all()
        # crop info persisted to the redirect dir
        assert os.path.isfile(
            tmp_path / "k1.crop_info.pkl"
        )

    def test_collated_batch(self, tmp_path):
        prep = ImagePrep(use_mean_center=True,
                             crop_info_dir=str(tmp_path))
        item = prep.prepare(EXAMPLE)
        batch = collate([item, item])
        assert batch["images"].shape == (2, 512, 512, 5)
        assert batch["kpts"].shape == (2, 25, 3)


class _RangeDataset:
    """Module-level (picklable) dataset for process-worker tests."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((4,), i, np.float32), "idx": i}


class TestProcessWorkers:
    def test_process_pool_loads_all(self):
        from chore_tpu.data.loader import DataLoader

        ds = _RangeDataset(17)
        loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2,
                            drop_last=False, worker_type="process")
        seen = []
        for batch in loader:
            seen.extend(batch["idx"].tolist() if hasattr(batch["idx"], "tolist")
                        else batch["idx"])
            assert batch["x"].shape[1] == 4
        assert sorted(seen) == list(range(17))
        # pool persists across epochs, then closes cleanly
        n2 = sum(len(b["idx"]) for b in loader)
        assert n2 == 17
        loader.close()


class TestPrefetchToDevice:
    def test_stages_and_preserves_order(self):
        import jax

        from chore_tpu.data.loader import prefetch_to_device

        batches = [{"x": np.full((2, 3), i, np.float32)} for i in range(5)]
        out = list(prefetch_to_device(iter(batches), size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            assert isinstance(b["x"], jax.Array)
            assert float(b["x"][0, 0]) == i

    def test_custom_transfer_and_error_propagation(self):
        from chore_tpu.data.loader import prefetch_to_device

        calls = []

        def transfer(b):
            calls.append(b)
            return b * 2

        out = list(prefetch_to_device(iter([1, 2, 3]), transfer=transfer))
        assert out == [2, 4, 6] and calls == [1, 2, 3]

        def bad(_):
            raise RuntimeError("boom")

        it = prefetch_to_device(iter([1]), transfer=bad)
        with pytest.raises(RuntimeError, match="boom"):
            next(it)

    def test_abandoned_consumer_unblocks_producer(self):
        """A consumer that closes the generator mid-stream (exception in
        the training loop) must release the producer thread even while the
        queue is full — otherwise it parks in q.put forever, pinning the
        staged batches and the source loader's workers."""
        import threading
        import time

        from chore_tpu.data.loader import prefetch_to_device

        produced = []
        producer_thread = []

        def transfer(b):
            producer_thread.append(threading.current_thread())
            produced.append(b)
            return b

        it = prefetch_to_device(iter(range(100)), size=2, transfer=transfer)
        assert next(it) == 0
        it.close()  # consumer abandons; queue is full at this point
        deadline = time.time() + 5.0
        t = producer_thread[0]
        while t.is_alive() and time.time() < deadline:
            time.sleep(0.05)
        assert not t.is_alive(), "producer thread still blocked after close"
        assert len(produced) < 100  # it stopped early, not after draining
