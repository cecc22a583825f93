"""Infinite shuffled index stream + a simple prefetching loader.

Replaces torch DataLoader(InfiniteSampler, num_workers=3) (reference
misc.py:113-147, training_loop.py:179-180): rank/num_replicas sharding with
a shuffle window, plus a thread pool that keeps the next device batches
ready while the TPU computes.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class InfiniteSampler:
    """(misc.InfiniteSampler) — deterministic, shardable, windowed shuffle."""

    def __init__(self, dataset_size: int, rank: int = 0, num_replicas: int = 1,
                 shuffle: bool = True, seed: int = 0, window_size: float = 0.5):
        assert dataset_size > 0
        self.size = dataset_size
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed
        self.window_size = window_size

    def __iter__(self) -> Iterator[int]:
        order = np.arange(self.size)
        rnd = None
        window = 0
        if self.shuffle:
            rnd = np.random.RandomState(self.seed)
            rnd.shuffle(order)
            window = int(np.rint(order.size * self.window_size))

        idx = 0
        while True:
            i = idx % order.size
            if idx % self.num_replicas == self.rank:
                yield int(order[i])
            if window >= 2:
                j = (i - rnd.randint(window)) % order.size
                order[i], order[j] = order[j], order[i]
            idx += 1


class PrefetchLoader:
    """Pulls items from a dataset via a worker thread pool, collates fixed
    batches, and keeps ``prefetch`` batches ready."""

    def __init__(self, dataset, batch_size: int, collate_fn: Callable,
                 sampler: Optional[InfiniteSampler] = None, num_workers: int = 3,
                 prefetch: int = 2, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.sampler = sampler or InfiniteSampler(len(dataset), seed=seed)
        self.num_workers = max(num_workers, 1)
        self.q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        from concurrent.futures import ThreadPoolExecutor

        it = iter(self.sampler)
        with ThreadPoolExecutor(self.num_workers) as pool:
            while not self._stop.is_set():
                idxs = [next(it) for _ in range(self.batch_size)]
                # queue raw numpy ITEMS; collate runs on the CONSUMER
                # thread (__next__) because it device-puts (jnp.asarray)
                # — on the remote-dispatch axon platform, loader threads
                # transferring over the tunnel concurrently with
                # main-thread compiles wedged the connection for good
                # (r5 lifecycle artifact: both ends in blocked reads)
                self.q.put(list(pool.map(self.dataset.__getitem__, idxs)))

    def __iter__(self):
        return self

    def __next__(self):
        return self.collate_fn(self.q.get())

    def close(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
