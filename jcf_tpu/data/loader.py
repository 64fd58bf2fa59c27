"""Threaded prefetching data loader.

Replaces the reference's ``jittor.dataset.DataLoader`` (8 worker
processes, ``ood.py:1094``) with a thread-pool prefetcher: PIL decode and
resampling release the GIL in the hot paths, and a bounded prefetch queue
keeps the TPU fed while the host decodes ahead. Deterministic order —
randomness lives in the per-sample seeded transforms, not in worker
scheduling.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence

import numpy as np


def _stack_batch(samples: Sequence):
    """Collate: numpy arrays stack; ints become arrays; strings stay lists."""
    first = samples[0]
    if isinstance(first, tuple):
        return tuple(_stack_batch([s[i] for s in samples]) for i in range(len(first)))
    if isinstance(first, np.ndarray):
        return np.stack(samples)
    if isinstance(first, (int, np.integer)):
        return np.asarray(samples, np.int32)
    if isinstance(first, float):
        return np.asarray(samples, np.float32)
    return list(samples)


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        num_workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _batches(self) -> List[List[int]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(np.random.SeedSequence([self.seed, self.epoch]))
            rng.shuffle(order)
        batches = [
            list(order[i : i + self.batch_size])
            for i in range(0, n, self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        batches = self._batches()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                try:
                    for idxs in batches:
                        # decode one batch in parallel; the bounded queue
                        # provides backpressure across batches
                        samples = list(pool.map(self.dataset.__getitem__, idxs))
                        out_q.put(_stack_batch(samples))
                finally:
                    out_q.put(sentinel)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        while True:
            item = out_q.get()
            if item is sentinel:
                break
            yield item
        thread.join()
