"""Device-resident vision-feature table: patch features as an HBM lookup.

The vision cache (data/vision_cache.py) removes the frozen EVA-02 tower from
the steady-state step, but the cached features still stream host->device on
EVERY batch — ~0.5 MB per example, re-shipped for each of the ~3 questions
per image on each of the 15 epochs per task (the reference pays the same
traffic as raw pixels plus a full tower forward, vl_pythia.py:267,
data/loader.py:61-76). Within a task the image set is FIXED, so the
idiomatic TPU layout is an embedding-style table: ship the unique features
to HBM once per task, have the loader emit int32 row indices (4 bytes vs
~0.5 MB), and gather inside the compiled program.

Policy (trainer/continual.py _refresh_vision_table):
  * per task, all-or-nothing: the table covers the task's train images plus
    every replay-memory image (memory examples come from previous tasks'
    train sets, all primed into the same disk cache), so every batch a
    window can stack has the same structure — mixed patch_idx/patches
    batches would break the fused window's jax.tree.map(stack);
  * capacity-gated: if the task's unique-image footprint exceeds
    config.device_vision_table_mb the task falls back to streaming patches
    (large production tasks; the transfer then hides under prefetch);
  * swapped between tasks only — memory iterators are lazy (BatchLoader /
    DevicePrefetcher start producing at the first draw, inside the next
    task's fit), so no in-flight batch can carry indices into a stale table.

The gather output shards like its indices (the table is replicated over the
mesh), so DP batch sharding is preserved under pjit on pods.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, List, Optional

import numpy as np


def image_key_of(dataset, index: int) -> Optional[str]:
    """Image identity of example `index`, through Subset/Concat/view nesting
    (the image_key analog of vqa_dataset.question_id_of)."""
    fn = getattr(dataset, "image_key", None)
    if fn is not None:
        return fn(index)
    if hasattr(dataset, "datasets"):  # ConcatDataset
        offsets = np.cumsum([0] + [len(d) for d in dataset.datasets])
        ds_idx = int(np.searchsorted(offsets, index, side="right") - 1)
        return image_key_of(dataset.datasets[ds_idx], index - int(offsets[ds_idx]))
    if hasattr(dataset, "indices"):  # Subset
        return image_key_of(dataset.dataset, dataset.indices[index])
    if hasattr(dataset, "dataset"):  # TeacherStateView-style wrapper
        return image_key_of(dataset.dataset, index)
    return None


def iter_image_keys(datasets: Iterable) -> Iterator[str]:
    """Every example's image key across the given datasets (with repeats —
    callers dedupe)."""
    for ds in datasets:
        for i in range(len(ds)):
            key = image_key_of(ds, i)
            if key is not None:
                yield key


class DeviceVisionTable:
    """Replicated [n_images, n_patches, dim] bf16 feature table + key->row map.

    `resolve` turns a batch's `patch_idx` rows back into `patches` with one
    on-device gather (jit-compiled once; output sharding follows the index
    sharding). `resolve_host` is the host-side variant for non-SPMD
    consumers (teacher-cache priming dispatches per-process local work)."""

    def __init__(self, feats: np.ndarray, key_to_idx: Dict[str, int], mesh=None) -> None:
        import jax
        import jax.numpy as jnp

        self.key_to_idx = key_to_idx
        self.nbytes = int(feats.nbytes)
        self.host = feats
        if mesh is not None:
            sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            # every process holds the identical host array (shared cache dir),
            # so each one materializes its addressable replicas locally
            self.table = jax.make_array_from_callback(
                feats.shape, sharding, lambda idx: feats[idx]
            )
        else:
            self.table = jax.device_put(feats)
        self._gather = jax.jit(lambda table, idx: jnp.take(table, idx, axis=0))
        # lazily-placed per-process copy for non-collective dispatch (eval
        # decode on multi-process pods) — see resolve_local
        self._local = None
        self._local_sharding = None

    def __len__(self) -> int:
        return len(self.key_to_idx)

    def index(self, key: str) -> Optional[int]:
        return self.key_to_idx.get(key)

    def resolve(self, batch: Dict) -> Dict:
        if "patch_idx" not in batch:
            return batch
        out = dict(batch)
        out["patches"] = self._gather(self.table, out.pop("patch_idx"))
        return out

    def resolve_host(self, batch: Dict) -> Dict:
        if "patch_idx" not in batch:
            return batch
        out = dict(batch)
        out["patches"] = self.host[np.asarray(out.pop("patch_idx"))]
        return out

    def resolve_local(self, batch: Dict, sharding) -> Dict:
        """Per-process gather for non-collective dispatch (eval decode on
        multi-process pods, where each process decodes its own unequal batch
        count): the table is re-placed ONCE onto the given process-local
        sharding, mirroring validate.localize_params, so the gather never
        becomes a collective over the global mesh."""
        if "patch_idx" not in batch:
            return batch
        import jax

        if self._local_sharding is not sharding:
            self._local = jax.device_put(self.host, sharding)
            self._local_sharding = sharding
        out = dict(batch)
        out["patches"] = self._gather(self._local, out.pop("patch_idx"))
        return out


def table_nbytes(n_keys: int, n_patches: int, dim: int) -> int:
    return n_keys * n_patches * dim * 2  # bf16


def build_table(cache, keys: List[str], mesh=None) -> DeviceVisionTable:
    """Assemble the device table from a warm disk cache (priming precedes
    table construction, so a miss is a hard bug, not a fallback)."""
    key_to_idx = {k: i for i, k in enumerate(keys)}
    if not keys:
        raise ValueError("empty vision table")
    first = cache.load(keys[0])
    if first is None:
        raise RuntimeError(f"vision table: cache miss for {keys[0]!r} (prime first)")
    feats = np.empty((len(keys),) + first.shape, dtype=first.dtype)
    feats[0] = first
    for i, k in enumerate(keys[1:], start=1):
        arr = cache.load(k)
        if arr is None:
            raise RuntimeError(f"vision table: cache miss for {k!r} (prime first)")
        feats[i] = arr
    return DeviceVisionTable(feats, key_to_idx, mesh=mesh)


def attach(datasets: Iterable, table: Optional[DeviceVisionTable]) -> List:
    """Set/clear the `vision_table` handle on every leaf dataset; returns the
    leaves touched (the trainer detaches the previous task's set)."""
    from mafed_tpu.data.vision_cache import leaf_datasets

    leaves = []
    for ds in datasets:
        for leaf in leaf_datasets(ds):
            if hasattr(leaf, "image_key"):
                leaf.vision_table = table
                leaves.append(leaf)
    return leaves
