"""Minimal threaded data loader producing NHWC numpy batches.

Replaces the reference's torch DataLoader (base_trainer.py:74-80) with a
background-thread prefetcher: batches are assembled on host threads while the
TPU runs the previous step.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 1,
                 prefetch: int = 4, seed: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = max(prefetch, 1)
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            batch = order[start:start + self.batch_size]
            if self.drop_last and len(batch) < self.batch_size:
                return
            yield batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for idxs in self._batch_indices():
                    samples = [self.dataset[int(i)] for i in idxs]
                    batch = {
                        k: np.stack([s[k] for s in samples])
                        for k in samples[0]
                    }
                    q.put(batch)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def cycle(loader: DataLoader, start_iter: int, end_iter: int):
    """Infinite-cycling generator yielding (iter, batch)
    (reference base_trainer.py:120-129)."""
    it = iter(loader)
    for i in range(start_iter, end_iter):
        try:
            data = next(it)
        except StopIteration:
            it = iter(loader)
            data = next(it)
        yield i + 1, data
