"""Threaded batch loader: the host-side data engine.

Replaces torch DataLoader workers + the CUDA-stream PrefetchLoader
(mafed/data/loader.py:40-80). Image decode (PIL, releases the GIL in its C
core) runs on a thread pool; batches are assembled ahead of the consumer in
a bounded queue. Device transfer overlap lives in prefetch.DevicePrefetcher.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np


class BatchLoader:
    """Iterable over collated numpy batches with background workers.

    shuffle uses a seeded numpy Generator so epoch order is reproducible
    (reference uses pl.seed_everything + RandomSampler).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate: Callable[[List[Dict]], Dict],
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 4,
        drop_last: bool = False,
        prefetch_batches: int = 4,
        infinite: bool = False,
        shard_id: int = 0,
        num_shards: int = 1,
    ) -> None:
        """shard_id/num_shards: per-host data sharding for multi-host SPMD —
        each host iterates its interleaved slice of the (shared, seeded)
        epoch order; the TPU-native replacement for DistributedSampler
        (reference replay.py:46-49, distillation.py:195-198)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch_batches = prefetch_batches
        self.infinite = infinite
        self.shard_id = shard_id
        self.num_shards = max(1, num_shards)
        self._epoch = 0
        self._start_batch = 0

    def set_epoch(self, epoch: int, start_batch: int = 0) -> None:
        """start_batch: skip the first N batches of THIS epoch's seeded order
        (preemption resume, trainer/runner.py fit); later epochs of an
        infinite iteration start from 0. Skipping happens at the index level
        — no decode/collate work is paid for skipped batches."""
        self._epoch = epoch
        self._start_batch = start_batch

    def _index_batches(self, epoch: int) -> List[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(order)
        if self.num_shards > 1:
            if self.drop_last:
                # every process must see the SAME number of batches (SPMD
                # steps are collective); truncate to a global-batch multiple
                keep = len(order) - len(order) % (self.num_shards * self.batch_size)
                order = order[:keep]
            order = order[self.shard_id :: self.num_shards]
        batches = []
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                continue
            batches.append(idx)
        return batches

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards if self.num_shards > 1 else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()
        error: List[BaseException] = []

        def produce():
            epoch = self._epoch
            skip = self._start_batch
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    while not stop.is_set():
                        for idx in self._index_batches(epoch)[skip:]:
                            if stop.is_set():
                                return
                            items = list(pool.map(self.dataset.__getitem__, idx))
                            out_q.put(self.collate(items))
                        epoch += 1
                        skip = 0
                        if not self.infinite:
                            break
            except BaseException as exc:  # propagate to the consumer: a
                # swallowed collate/dataset error would silently end the
                # epoch early (e.g. the collate_train label_tail guard MUST
                # hard-fail, not truncate training data)
                error.append(exc)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    if error:
                        raise error[0]
                    break
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while True:
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
