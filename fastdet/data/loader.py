"""Prefetching host data loader: threads + bounded queue, padded batches.

Replaces torch DataLoader worker processes (reference train.py:40-58)
with a thread pool — cv2's imread/resize release the GIL, so threads
saturate host cores without multiprocess serialization overhead — and a
bounded prefetch queue that keeps batches ready while the TPU computes
(host/device overlap is the double-buffering that matters here).

Batches are fixed-shape: (B,H,W,3) uint8 images plus (B, max_labels, 5)
padded labels + (B, max_labels) mask (the static-shape contract of the
dense loss; see fastdet/train/targets.py).
"""

from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np

from fastdet.data.dataset import DarknetDataset
from fastdet.train.targets import pack_labels


class DataLoader:
    def __init__(self, dataset: DarknetDataset, batch_size: int,
                 shuffle: bool = False, drop_last: bool = False,
                 max_labels: int = 100, num_workers: int = 8,
                 prefetch: int = 4, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.max_labels = max_labels
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._rng = random.Random(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            self._rng.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i:i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def _load_batch(self, pool: ThreadPoolExecutor, chunk):
        samples = list(pool.map(self.dataset.__getitem__, chunk))
        images = np.stack([s[0] for s in samples])
        labels, mask = pack_labels([s[1] for s in samples],
                                   self.max_labels)
        return images, labels, mask

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def producer():
            try:
                for chunk in self._batch_indices():
                    q.put(self._load_batch(pool, chunk))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            pool.shutdown(wait=False)
