"""Multiprocess host data loader with device prefetch.

Replaces the reference's torch DataLoader (8 workers,
``tools/train_rcnn.py:66-92``) without the torch dependency: worker
processes run ``dataset[i]`` + collate, a background thread keeps a small
queue of ready batches, so host preprocessing overlaps device compute.
"""

from __future__ import annotations

import itertools
import queue
import threading
from concurrent.futures import ProcessPoolExecutor
from typing import Iterator, Optional

import numpy as np

_WORKER_DS = None


def _init_worker(dataset):
    global _WORKER_DS
    _WORKER_DS = dataset


def _seed_for(seed: int, epoch: int, index: int) -> int:
    return (seed * 1000003 + epoch * 8191 + index) % (1 << 32)


def _fetch(indices, seed=None, epoch=0):
    return _fetch_from(_WORKER_DS, indices, seed, epoch)


def _fetch_from(ds, indices, seed, epoch):
    """Per-sample reseed of the global numpy RNG: augmentation draws become
    a pure function of (seed, epoch, sample index), so runs are reproducible
    regardless of worker count/scheduling. (The reference left worker RNG
    unseeded — train runs were unrepeatable.)"""
    out = []
    for i in indices:
        if seed is not None:
            np.random.seed(_seed_for(seed, epoch, i))
        out.append(ds[i])
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 0, drop_last: bool = True,
                 seed: int = 0, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0
        self._pool = None
        if num_workers > 0:
            import multiprocessing

            # spawn: fork is unsafe once JAX threads exist in the parent
            self._pool = ProcessPoolExecutor(
                max_workers=num_workers, initializer=_init_worker,
                initargs=(dataset,),
                mp_context=multiprocessing.get_context('spawn'))

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
            if len(chunk):
                yield chunk.tolist()

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        collate = self.dataset.collate_batch
        if self._pool is None:
            for chunk in self._index_batches():
                yield collate(_fetch_from(self.dataset, chunk, self.seed,
                                          self._epoch))
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def producer():
            futures = []
            for chunk in self._index_batches():
                futures.append(self._pool.submit(_fetch, chunk, self.seed,
                                                 self._epoch))
                while len(futures) > self.prefetch:
                    q.put(futures.pop(0).result())
            for f in futures:
                q.put(f.result())
            q.put(SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            yield collate(item)
        t.join()

    def close(self):
        if self._pool is not None:
            self._pool.shutdown()
