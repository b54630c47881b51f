"""Host-side batched prefetching loader.

Replaces torch DataLoader + DistributedSampler (reference:
data/base_data.py:49-69): a thread pool maps the dataset's __getitem__,
batches are collated to numpy, and a small prefetch queue overlaps host IO
with device compute. Multi-host sharding = each process iterates its own
index slice (parallel.local_batch_slice); per-epoch shuffling is seeded by
epoch like DistributedSampler.set_epoch.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def collate(items):
    """List of dicts -> dict of stacked arrays (non-array values listed)."""
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray) or (
            np.isscalar(vals[0]) and not isinstance(vals[0], str)
        ):
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals
    return out


class DataLoader:
    def __init__(self, dataset, batch_size, shuffle=True, num_workers=8,
                 drop_last=True, seed=0, prefetch=2,
                 shard_index=0, shard_count=1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-process shard (DistributedSampler equivalent)
        idx = idx[self.shard_index::self.shard_count]
        if self.drop_last:
            idx = idx[: len(idx) - len(idx) % self.batch_size]
        return idx

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        idx = self._indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    items = list(pool.map(self.dataset.__getitem__, b))
                    q.put(collate(items))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
