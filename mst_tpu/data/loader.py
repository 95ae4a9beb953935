"""Threaded prefetching batch loader.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers, fork,
prefetch_factor=2)`` (ref: train.py:496-519) with a thread-pool prefetcher:
audio decode releases the GIL in numpy/ffmpeg, and batches are assembled
ahead of the device step so the TPU never starves.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class PrefetchLoader:
    """Iterate ``dataset`` in shuffled batches with background prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn,
        indices=None,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 42,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.indices = np.asarray(
            indices if indices is not None else np.arange(len(dataset))
        )
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self):
        order = self.indices.copy()
        if self.shuffle:
            self.rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            chunk = order[i : i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_checked(obj) -> bool:
            # never block indefinitely: the consumer may have stopped while
            # the queue is full (e.g. --max_steps breaking mid-epoch)
            while not stop.is_set():
                try:
                    q.put(obj, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for chunk in self._batches():
                    if stop.is_set():
                        return
                    items = []
                    for item in pool.map(self._get, chunk):
                        if item is not None:
                            items.append(item)
                    if items and not put_checked(self.collate_fn(items)):
                        return
                put_checked(None)

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

    def _get(self, idx):
        # per-item failure tolerance (ref: data.py:419-440)
        try:
            return self.dataset[int(idx)]
        except Exception as e:  # noqa: BLE001
            print(f"[PrefetchLoader] skipping item {idx}: {e}")
            return None
