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


def _quantize_rows(feats: np.ndarray):
    """Symmetric per-(image, patch) int8 quantization: q = round(x/s),
    s = absmax/127 along the feature dim. Keeps each patch vector's dynamic
    range; dequant is one fused multiply in the gather jit."""
    f32 = feats.astype(np.float32)
    scale = np.abs(f32).max(axis=-1, keepdims=True) / 127.0  # [n, p, 1]
    scale = np.where(scale == 0, 1.0, scale).astype(np.float32)
    q = np.clip(np.rint(f32 / scale), -127, 127).astype(np.int8)
    return q, scale


class DeviceVisionTable:
    """Replicated [n_images, n_patches, dim] feature table + key->row map.

    Rows are stored bf16 (default — value-identical to the features collate
    would have stacked) or int8 with a per-(image, patch) f32 scale
    (--vision_table_dtype int8, VERDICT r3 #4b): ~2x rows per MB of HBM
    budget and ~2x less gather traffic, at a bounded quantization error
    (<=0.8% per element; the features feed a trainable projector). Dequant
    runs inside the gather jit.

    `resolve` turns a batch's `patch_idx` rows back into `patches` with one
    on-device gather (jit-compiled once; output sharding follows the index
    sharding). `resolve_host` is the host-side variant for non-SPMD
    consumers (teacher-cache priming dispatches per-process local work)."""

    def __init__(self, feats: np.ndarray, key_to_idx: Dict[str, int], mesh=None, dtype: str = "bfloat16") -> None:
        import jax
        import jax.numpy as jnp

        self.key_to_idx = key_to_idx
        self.dtype = dtype
        if dtype == "int8":
            q, scale = _quantize_rows(feats)
            self.host = (q, scale)
            self.nbytes = int(q.nbytes + scale.nbytes)

            def _place(arr):
                if mesh is None:
                    return jax.device_put(arr)
                sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
                return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])

            self.table = (_place(q), _place(scale))

            @jax.jit
            def gather(table, idx):
                tq, ts = table
                rows = jnp.take(tq, idx, axis=0).astype(jnp.bfloat16)
                s = jnp.take(ts, idx, axis=0).astype(jnp.bfloat16)
                return rows * s

            self._gather = gather
        elif dtype == "bfloat16":
            self.host = feats
            self.nbytes = int(feats.nbytes)
            if mesh is not None:
                sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
                # every process holds the identical host array (shared cache
                # dir), so each one materializes its addressable replicas
                # locally
                self.table = jax.make_array_from_callback(
                    feats.shape, sharding, lambda idx: feats[idx]
                )
            else:
                self.table = jax.device_put(feats)
            self._gather = jax.jit(lambda table, idx: jnp.take(table, idx, axis=0))
        else:
            raise ValueError(f"vision_table_dtype must be bfloat16 or int8, got {dtype!r}")
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
        idx = np.asarray(out.pop("patch_idx"))
        if self.dtype == "int8":
            q, scale = self.host
            import ml_dtypes

            out["patches"] = (
                (q[idx].astype(np.float32) * scale[idx]).astype(ml_dtypes.bfloat16)
            )
        else:
            out["patches"] = self.host[idx]
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
            if self.dtype == "int8":
                self._local = tuple(jax.device_put(a, sharding) for a in self.host)
            else:
                self._local = jax.device_put(self.host, sharding)
            self._local_sharding = sharding
        out = dict(batch)
        out["patches"] = self._gather(self._local, out.pop("patch_idx"))
        return out


def table_nbytes(n_keys: int, n_patches: int, dim: int, dtype: str = "bfloat16") -> int:
    if dtype == "int8":
        return n_keys * n_patches * (dim + 4)  # int8 rows + f32 scale/patch
    return n_keys * n_patches * dim * 2  # bf16


def build_table(cache, keys: List[str], mesh=None, dtype: str = "bfloat16") -> DeviceVisionTable:
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
    return DeviceVisionTable(feats, key_to_idx, mesh=mesh, dtype=dtype)


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
