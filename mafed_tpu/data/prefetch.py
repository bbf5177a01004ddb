"""Host->device prefetch: the TPU replacement for CUDA-stream overlap.

The reference overlaps H2D copy with compute on a side CUDA stream
(mafed/data/loader.py:40-80). On TPU, jax.device_put is asynchronous —
enqueueing the NEXT batch's transfer while the current step executes gives
the same overlap. DevicePrefetcher keeps `depth` batches in flight, placed
with the mesh's batch sharding so per-host shards land directly on their
devices.
"""

from __future__ import annotations

import collections
from typing import Dict, Iterable, Iterator, Optional

import jax
import numpy as np


class DevicePrefetcher:
    def __init__(self, iterable: Iterable[Dict], sharding=None, depth: int = 2, device_keys=("input_ids", "attention_mask", "labels", "pixels", "patches", "patch_idx", "t_hs", "t_idx")) -> None:
        self.iterable = iterable
        self.sharding = sharding
        self.depth = max(1, depth)
        self.device_keys = set(device_keys)

    def _put(self, batch: Dict) -> Dict:
        multiproc = self.sharding is not None and jax.process_count() > 1
        out = {}
        for k, v in batch.items():
            if k in self.device_keys and isinstance(v, np.ndarray):
                if multiproc:
                    # v is this process's shard of the global batch (the
                    # loader iterates its interleaved slice); assemble the
                    # global sharded array without gathering to one host
                    out[k] = jax.make_array_from_process_local_data(self.sharding, v)
                elif self.sharding is not None:
                    out[k] = jax.device_put(v, self.sharding)
                else:
                    out[k] = jax.device_put(v)
            else:
                out[k] = v
        return out

    def __iter__(self) -> Iterator[Dict]:
        it = iter(self.iterable)
        try:
            buf = collections.deque()
            try:
                for _ in range(self.depth):
                    buf.append(self._put(next(it)))
            except StopIteration:
                pass
            while buf:
                out = buf.popleft()
                try:
                    buf.append(self._put(next(it)))
                except StopIteration:
                    pass
                yield out
        finally:
            # propagate early termination (close/GeneratorExit) upstream so
            # the BatchLoader producer thread unblocks and exits
            close = getattr(it, "close", None)
            if close:
                close()
