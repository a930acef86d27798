"""Batching + background prefetch (host side).

Replaces torch DataLoader + DistributedSampler (train_dist.py:244-259): a
thread prefetches numpy batches while the device computes; under the 1-D
mesh the global batch is simply sharded on its leading axis by the trainer
(every host sees the full table — single-controller JAX).
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def collate(samples) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class BatchLoader:
    """Iterate batches of a dataset exposing ``get(idx, epoch)``/``__len__``.

    drop_last=True mirrors the reference train loader (train_dist.py:251).
    """

    def __init__(self, dataset, batch_size: int, *, drop_last: bool = True,
                 prefetch: int = 2, num_workers: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.prefetch = prefetch
        # patch extraction (radius query + pad/shuffle) is numpy/C++ and
        # releases the GIL, so a thread pool parallelizes it like the
        # reference's DataLoader worker processes (train_dist.py:245-259)
        self.num_workers = max(1, int(num_workers))

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def _indices(self):
        n = len(self.dataset)
        usable = (n // self.batch_size) * self.batch_size if self.drop_last \
            else n
        for s in range(0, usable, self.batch_size):
            yield range(s, min(s + self.batch_size, n))

    def epoch_iter(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                if self.num_workers > 1:
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(self.num_workers) as pool:
                        for idxs in self._indices():
                            samples = list(pool.map(
                                lambda i: self.dataset.get(i, epoch), idxs))
                            q.put(collate(samples))
                else:
                    for idxs in self._indices():
                        q.put(collate([self.dataset.get(i, epoch)
                                       for i in idxs]))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item

    def __iter__(self):
        return self.epoch_iter(getattr(self.dataset, "epoch", 0))


def chunk_batches(iterator, size: int):
    """Stack `size` consecutive batches into (S, B, ...) arrays for the
    scan-based multi-step dispatch (Trainer.train_chunk): one H2D transfer
    carries S steps of data.  A ragged final chunk yields with its smaller
    S (one extra compile for that shape, cached persistently)."""
    buf = []
    for b in iterator:
        buf.append(b)
        if len(buf) == size:
            yield {k: np.stack([x[k] for x in buf]) for k in buf[0]}
            buf = []
    if buf:
        yield {k: np.stack([x[k] for x in buf]) for k in buf[0]}


def device_prefetch(iterator, sharding=None, size: int = 2):
    """Overlap host->device copies with device compute (the TPU analogue of
    torch's pin_memory + non_blocking copies, train_dist.py:257,317-320).

    Eagerly ``device_put``s up to ``size`` upcoming batches (JAX transfers
    are async, so this just keeps the copy engine ahead of the compute
    stream) and yields them in order.  ``sharding`` may be a Sharding (or
    pytree of them) passed to device_put, or a callable batch -> placed
    batch (e.g. ``Trainer.shard_batch``, which picks per-leaf shardings).
    """
    import collections

    import jax

    place = sharding if callable(sharding) \
        else (lambda item: jax.device_put(item, sharding))
    buf = collections.deque()
    for item in iterator:
        buf.append(place(item))
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
