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
        if infinite and len(dataset) < self.num_shards:
            # a shard's epoch slice would be empty -> the stream could never
            # fill a batch (e.g. a replay memory smaller than the pod's
            # process count)
            raise ValueError(
                f"infinite BatchLoader needs >= {self.num_shards} samples "
                f"(one per shard); dataset has {len(dataset)}"
            )
        self._epoch = 0
        self._start_batch = 0
        self._start_index = 0  # infinite mode: index offset into epoch order

    def set_epoch(self, epoch: int, start_batch: int = 0) -> None:
        """start_batch: skip the first N batches of THIS epoch's seeded order
        (preemption resume, trainer/runner.py fit). Skipping happens at the
        index level — no decode/collate work is paid for skipped batches.
        Finite (fit-loop) loaders only; infinite streams position with
        set_draws."""
        self._epoch = epoch
        self._start_batch = start_batch
        self._start_index = 0

    def _shard_len(self) -> int:
        """Per-shard index count of one epoch of the infinite stream."""
        n = len(self.dataset)
        if self.num_shards > 1:
            n -= n % self.num_shards
        return n // self.num_shards

    def set_draws(self, n_draws: int) -> None:
        """Position an INFINITE stream just past its first n_draws batches
        (preemption resume of replay/distill memory streams). The stream is
        batch_size-chunks of concat(perm_0, perm_1, ...) of the per-shard
        epoch orders, so draw n starts at flat index n*batch_size."""
        assert self.infinite, "set_draws is for infinite streams; use set_epoch"
        flat = n_draws * self.batch_size
        per_epoch = self._shard_len()
        self._epoch = flat // per_epoch
        self._start_index = flat % per_epoch
        self._start_batch = 0

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(order)
        return order

    def _index_batches(self, epoch: int) -> List[np.ndarray]:
        order = self._epoch_order(epoch)
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

    def _shard_order(self, epoch: int) -> np.ndarray:
        """One epoch of the infinite stream's per-shard index order: the
        seeded permutation truncated to a num_shards multiple (equal shard
        lengths keep SPMD batch counts collective-safe), interleave-sliced."""
        order = self._epoch_order(epoch)
        if self.num_shards > 1:
            keep = len(order) - len(order) % self.num_shards
            order = order[:keep][self.shard_id :: self.num_shards]
        return order

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
                    if self.infinite:
                        # persistent shuffled stream: batch_size-chunks of
                        # concat(perm_0, perm_1, ...) — the remainder of one
                        # epoch's order CARRIES into the next, so batches are
                        # always full even when the dataset is smaller than
                        # the batch (e.g. a tiny replay memory; the torch
                        # reference would yield a partial batch there, which
                        # static XLA shapes can't — cycling permutations keeps
                        # the same per-sample draw frequency instead). The
                        # pre-carry behavior dropped each epoch's remainder,
                        # which spun forever when len(dataset) < batch_size.
                        start_index = self._start_index
                        buf = np.empty((0,), dtype=np.int64)
                        while not stop.is_set():
                            buf = np.concatenate([buf, self._shard_order(epoch)[start_index:]])
                            start_index = 0
                            epoch += 1
                            while len(buf) >= self.batch_size:
                                if stop.is_set():
                                    return
                                idx, buf = buf[: self.batch_size], buf[self.batch_size :]
                                items = list(pool.map(self.dataset.__getitem__, idx))
                                out_q.put(self.collate(items))
                        return
                    for idx in self._index_batches(epoch)[skip:]:
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__, idx))
                        out_q.put(self.collate(items))
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
