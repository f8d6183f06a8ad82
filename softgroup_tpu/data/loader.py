"""Host-side data loader: background-thread prefetch over a process pool.

Replaces torch's DataLoader + DistributedSampler (`softgroup/data/
__init__.py:29-54`) with a small native pipeline: samples are materialised by
worker processes while the TPU executes the previous step, and sharding
across data-parallel hosts is an index stride (`rank::world`).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ProcessPoolExecutor

import numpy as np


class EpochSampler:
    """Deterministic per-epoch shuffling + rank sharding, semantics of
    torch's DistributedSampler (shuffle + drop_last for train)."""

    def __init__(self, n: int, rank: int = 0, world: int = 1,
                 shuffle: bool = True, drop_last: bool = False):
        self.n = n
        self.rank = rank
        self.world = world
        self.shuffle = shuffle
        self.drop_last = drop_last

    def indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(self.n)
        if self.shuffle:
            idx = np.random.RandomState(epoch).permutation(self.n)
        if self.world > 1:
            if self.drop_last:
                per = self.n // self.world
                idx = idx[:per * self.world]
            else:
                pad = (-len(idx)) % self.world
                idx = np.concatenate([idx, idx[:pad]])
            idx = idx[self.rank::self.world]
        return idx


class DataLoader:
    """Iterates collated batches with background prefetch.

    Args:
      dataset: object with __len__/__getitem__/collate_fn.
      batch_size, num_workers, prefetch: pipeline knobs.
      post: optional callable applied to each collated batch in the prefetch
        thread (e.g. build_scene_batch → device arrays).
    """

    def __init__(self, dataset, batch_size: int = 1, num_workers: int = 0,
                 rank: int = 0, world: int = 1, shuffle: bool = False,
                 drop_last: bool = False, prefetch: int = 2, post=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.sampler = EpochSampler(len(dataset), rank, world, shuffle,
                                    drop_last)
        self.prefetch = prefetch
        self.post = post
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.sampler.indices(0))
        if self.sampler.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        idx = self.sampler.indices(self.epoch)
        n = len(self)
        for b in range(n):
            yield idx[b * self.batch_size:(b + 1) * self.batch_size]

    def __iter__(self):
        if self.num_workers <= 0:
            for batch_idx in self._batches():
                samples = [self.dataset[i] for i in batch_idx]
                batch = self.dataset.collate_fn(samples)
                yield self.post(batch) if self.post else batch
            return
        yield from self._iter_workers()

    def _iter_workers(self):
        q: queue.Queue = queue.Queue(self.prefetch)
        stop = object()

        def produce():
            try:
                with ProcessPoolExecutor(self.num_workers) as pool:
                    futures = [
                        pool.submit(_fetch_many, self.dataset, list(bi))
                        for bi in self._batches()
                    ]
                    for f in futures:
                        samples = f.result()
                        batch = self.dataset.collate_fn(samples)
                        q.put(self.post(batch) if self.post else batch)
            except BaseException as e:  # surface worker errors to consumer
                q.put(e)
            q.put(stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


def _fetch_many(dataset, indices):
    return [dataset[i] for i in indices]
