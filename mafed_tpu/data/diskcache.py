"""Shared disk-cache machinery for the vision-feature and teacher-state
caches (data/vision_cache.py, data/teacher_cache.py).

One .npy (uint16-viewed bfloat16) of a FIXED expected shape per key, under
sha1-sharded subdirectories. Writes are atomic (tmp + os.replace), so
concurrent writers — multi-process pods priming one shared dir — race
benignly. `load` returns None on miss (callers fall back to recompute).

Staleness guard: both caches memoize functions of model parameters (frozen
tower features, frozen teacher hidden states), so a cache directory is only
valid for the parameters that filled it. `set_fingerprint` stamps the dir
with a digest of those parameters and WIPES it when the stamp differs —
re-running in the same output_dir with different weights (new seed, new
pretrained base, changed hyperparameters upstream of the teacher) silently
re-primes instead of silently serving stale arrays.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Optional

import numpy as np

try:
    import ml_dtypes

    _BF16 = ml_dtypes.bfloat16
except Exception:  # pragma: no cover - ml_dtypes ships with jax
    _BF16 = np.float32

_FINGERPRINT_FILE = "fingerprint.json"


class ArrayDiskCache:
    def __init__(self, cache_dir: str, expected_shape) -> None:
        self.cache_dir = cache_dir
        self.expected_shape = tuple(expected_shape)
        os.makedirs(cache_dir, exist_ok=True)

    def _path(self, key: str) -> str:
        h = hashlib.sha1(key.encode()).hexdigest()
        return os.path.join(self.cache_dir, h[:2], f"{h}.npy")

    def has(self, key: str) -> bool:
        return os.path.exists(self._path(key))

    def load(self, key: str) -> Optional[np.ndarray]:
        """-> bf16 array of expected_shape (f32 under the ml_dtypes-less
        fallback), or None on miss / shape mismatch (callers recompute)."""
        path = self._path(key)
        try:
            arr = np.load(path)
        except FileNotFoundError:
            return None
        if arr.dtype == np.uint16:
            if _BF16 is np.float32:
                # entry written WITH ml_dtypes, read without: widen the bf16
                # bit pattern to f32 exactly (a raw .view(f32) would pair
                # adjacent uint16s into garbage at half the last dim)
                arr = (arr.astype(np.uint32) << 16).view(np.float32)
            else:
                arr = arr.view(_BF16)
        if tuple(arr.shape) != self.expected_shape:
            return None  # stale layout (shape is part of the stamp; belt+braces)
        return arr

    def save(self, key: str, arr: np.ndarray) -> None:
        if tuple(arr.shape) != self.expected_shape:
            raise ValueError(f"cached array shape {arr.shape} != {self.expected_shape}")
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if _BF16 is np.float32:  # ml_dtypes unavailable: store f32 natively
            out = np.asarray(arr, np.float32)
        else:
            out = np.asarray(arr).astype(_BF16).view(np.uint16)
        tmp = f"{path}.{os.getpid()}.tmp.npy"
        with open(tmp, "wb") as f:
            np.save(f, out)
        os.replace(tmp, path)

    def set_fingerprint(self, fingerprint: str) -> bool:
        """Bind the cache dir to the parameters it memoizes.

        Stamps `fingerprint` into the dir; if a DIFFERENT stamp (or unstamped
        legacy content) is present, wipes the dir first — entries computed
        from other weights must not be served. Returns True when a wipe
        happened. Multi-process: every process derives the same fingerprint
        from the same (replicated) params, so concurrent calls converge; the
        stamp write is atomic and priming happens only afterwards.
        """
        # the stored arrays' layout is part of the cache's identity: the same
        # weights under a different config (select_feature patch -> cls_patch,
        # a different text pad) produce differently-shaped entries that must
        # not be served either
        fingerprint = f"{fingerprint}|shape={self.expected_shape}"
        stamp_path = os.path.join(self.cache_dir, _FINGERPRINT_FILE)
        current = None
        try:
            with open(stamp_path) as f:
                current = json.load(f).get("fingerprint")
        except (FileNotFoundError, ValueError):
            pass
        wiped = False
        if current != fingerprint:
            has_entries = any(
                name != _FINGERPRINT_FILE for name in os.listdir(self.cache_dir)
            )
            if current is not None or has_entries:
                shutil.rmtree(self.cache_dir, ignore_errors=True)
                wiped = True
            os.makedirs(self.cache_dir, exist_ok=True)
            tmp = f"{stamp_path}.{os.getpid()}.tmp"
            with open(tmp, "w") as f:
                json.dump({"fingerprint": fingerprint}, f)
            os.replace(tmp, stamp_path)
        return wiped


def set_fingerprint_coordinated(cache: ArrayDiskCache, fingerprint: str) -> bool:
    """Multi-process-safe set_fingerprint over a SHARED cache dir.

    A stale dir must be wiped by exactly one process: concurrent rmtrees can
    delete a peer's freshly-created shard directory between its makedirs and
    os.replace, crashing priming. Process 0 stamps (wiping if stale), everyone
    barriers, then the rest stamp idempotently (same fingerprint -> no wipe).
    """
    import jax

    if jax.process_count() == 1:
        return cache.set_fingerprint(fingerprint)
    from jax.experimental import multihost_utils

    wiped = False
    if jax.process_index() == 0:
        wiped = cache.set_fingerprint(fingerprint)
    multihost_utils.sync_global_devices(f"diskcache_stamp:{os.path.basename(cache.cache_dir)}")
    if jax.process_index() != 0:
        cache.set_fingerprint(fingerprint)
    return wiped


def shard_owner(key, n_shards: int) -> int:
    """Stable owner process for a cache key (multi-process priming).

    Pods shard priming work so each miss is computed by exactly ONE process.
    Ownership must be a pure function of the KEY: partitioning by list
    position would mis-cover when peers' atomic writes land mid-scan and
    processes see differently-sized todo lists. Python's builtin hash() is
    salted per process, so use sha1.
    """
    return int(hashlib.sha1(str(key).encode()).hexdigest()[:8], 16) % n_shards


def params_fingerprint(tree) -> str:
    """Cheap content digest of a param pytree (host numpy or jax.Arrays).

    Per-leaf (path, shape, dtype) plus two f32 reductions (sum, sum-of-
    squares) — one traced pass, no full device->host transfer, identical on
    every process of a pod (the reductions are SPMD over global arrays).
    Deterministic per backend; a backend change conservatively reads as a
    parameter change (callers re-prime, which is always safe).
    """
    import jax
    import jax.numpy as jnp

    leaves = jax.tree.leaves_with_path(tree)

    def _sums(ls):
        return [
            (jnp.sum(x.astype(jnp.float32)), jnp.sum(jnp.square(x.astype(jnp.float32))))
            for x in ls
        ]

    arrs = [leaf for _, leaf in leaves]
    sums = jax.jit(_sums)(arrs) if arrs else []
    h = hashlib.sha1()
    for (path, leaf), (s, sq) in zip(leaves, np.asarray(jax.device_get(sums), np.float64) if sums else []):
        h.update(
            f"{jax.tree_util.keystr(path)}|{tuple(leaf.shape)}|{leaf.dtype}|{s:.6e}|{sq:.6e};".encode()
        )
    return h.hexdigest()
