"""Threaded prefetching data loader.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=16)``
(/root/reference/src/train_image_to_video.py:546-554).  Decode/preprocess
runs in a pool of Python threads (OpenCV releases the GIL during decode) and
batches are assembled into pinned numpy arrays ready for device put.  A
native C++ decode path can be plugged in via ``i2v_adapter_tpu.data.native``
when built (csrc/).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


def default_collate(samples: Sequence[dict]) -> dict:
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = list(vals)
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        collate_fn: Callable = default_collate,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.collate_fn = collate_fn
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1

        batches = [
            order[i : i + self.batch_size]
            for i in range(0, n - (self.batch_size - 1 if self.drop_last else 0),
                           self.batch_size)
        ]
        if not batches:
            return iter(())

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        idx_q: "queue.Queue" = queue.Queue()
        for bi, b in enumerate(batches):
            idx_q.put((bi, b))
        results: dict = {}
        results_lock = threading.Lock()
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    bi, idxs = idx_q.get_nowait()
                except queue.Empty:
                    return
                batch = self.collate_fn([self.dataset[int(i)] for i in idxs])
                with results_lock:
                    results[bi] = batch

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        def emitter():
            next_bi = 0
            try:
                while next_bi < len(batches) and not stop.is_set():
                    with results_lock:
                        batch = results.pop(next_bi, None)
                    if batch is None:
                        stop.wait(0.005)
                        continue
                    out_q.put(batch)
                    next_bi += 1
            finally:
                out_q.put(None)

        threading.Thread(target=emitter, daemon=True).start()

        def gen():
            try:
                while True:
                    item = out_q.get()
                    if item is None:
                        return
                    yield item
            finally:
                stop.set()

        return gen()


class ShardedBatcher:
    """Wraps a DataLoader to emit per-host shards of a global batch for
    multi-host training (process i takes rows [i*b_local, (i+1)*b_local) —
    the role Accelerate's implicit rank split plays in the reference)."""

    def __init__(self, loader: DataLoader, process_index: int, process_count: int):
        if loader.batch_size % process_count != 0:
            raise ValueError("global batch not divisible by process count")
        self.loader = loader
        self.process_index = process_index
        self.process_count = process_count

    def __iter__(self):
        b = self.loader.batch_size // self.process_count
        lo = self.process_index * b
        for batch in self.loader:
            yield {
                k: (v[lo : lo + b] if isinstance(v, np.ndarray) else v[lo : lo + b])
                for k, v in batch.items()
            }
