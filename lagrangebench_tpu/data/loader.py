"""Torch-free data loader with background prefetching.

Replaces the reference's torch DataLoader (reference
lagrangebench/train/trainer.py:170-186) with a small threaded prefetcher:
h5py reads release the GIL, so a single worker thread overlaps host IO with
device compute — the right trade on TPU hosts where the step itself runs on
the accelerator.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from .stats import numpy_collate


class DataLoader:
    """Iterable over collated numpy batches of a map-style dataset.

    Args:
        dataset: object with ``__len__`` and ``__getitem__ -> pytree of np``.
        batch_size: samples per batch.
        shuffle: reshuffle indices at the start of every epoch.
        drop_last: drop the trailing partial batch.
        rng: numpy Generator driving the shuffle (seeded by the caller).
        num_prefetch: max batches buffered ahead of the consumer.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        rng: Optional[np.random.Generator] = None,
        num_prefetch: int = 2,
    ):
        assert batch_size >= 1
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = rng if rng is not None else np.random.default_rng(0)
        self.num_prefetch = num_prefetch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_batches(self) -> Iterator[np.ndarray]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        stop = len(order) - (len(order) % self.batch_size) if self.drop_last else len(order)
        for start in range(0, stop, self.batch_size):
            idxs = order[start : start + self.batch_size]
            yield numpy_collate([self.dataset[int(i)] for i in idxs])

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.num_prefetch)
        sentinel = object()

        def producer():
            try:
                for batch in self._epoch_batches():
                    q.put(batch)
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, Exception):
                raise item
            yield item


def cycle(loader: DataLoader) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Endless epoch-respecting iterator (reshuffles between epochs)."""
    while True:
        yield from loader
