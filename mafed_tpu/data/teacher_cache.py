"""Disk-backed cache of the distillation teacher's hidden states.

The MAFED teacher is FROZEN for the duration of a task (a copy of the
previous task's best model, mafed/methods/distillation.py:75-79) and the
replay memory it is evaluated on is a FIXED set sampled once per task
(:182-209). Collation is static-shape (one fixed text bucket, left-pad), so
a memory example's teacher hidden states never change within a task — yet
the reference recomputes the full teacher forward for every draw of every
epoch (distillation.py:218-224), and so did this build's fused window step.

Like the vision cache (data/vision_cache.py), this removes the redundant
work instead of making it faster: after the teacher updates at a task
transition, ONE priming pass computes hidden states per memory example
(batched, jitted, early-exited past the deepest distilled tap); steady-state
distill steps consume them from the batch ("t_hs", [B, L, T, H] bf16) and
the teacher forward leaves the compiled step entirely (measured 99.8 ->
103.8 ex/s/chip on the MAFED window at 410M on v5e).

Cost: n_states x seq_len x hidden bf16 per example (~15.8 MB at 410M /
seq=336) — ~63 GB for the canonical 4000-example memory, bounded to ONE
teacher generation (the previous generation's directory is deleted at each
task transition), and ~410 MB/s/chip of sustained disk+PCIe streaming at
canonical shapes. OPT-IN via --teacher_state_cache: the in-step
early-exited teacher is only ~4% of the window, so the cache is a net win
only on hosts with that bandwidth to spare (measured: integrated epochs
collapse 12x through a ~30 MB/s transport — docs/ARCHITECTURE.md design
decision 8). Writes are atomic; multi-process pods prime COOPERATIVELY —
each miss is owned by exactly one process (stable key hash,
diskcache.shard_owner) and an end-of-priming barrier orders priming before
consumption, same contract as the vision cache.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List

import numpy as np

from mafed_tpu.data.diskcache import ArrayDiskCache


def resolve_teacher_cache_mode(value) -> str:
    """Normalize --teacher_state_cache to one of "off"/"auto"/"on".

    The flag predates the HBM table tier as a bool (True = prime + stream),
    so bools and their string spellings stay valid: True/"1"/"true" mean
    "on", False/"0"/"false"/"" mean "off"."""
    if isinstance(value, bool):
        return "on" if value else "off"
    mode = str(value).strip().lower()
    if mode in ("1", "true", "yes"):
        return "on"
    if mode in ("0", "false", "no", "none", ""):
        return "off"
    if mode not in ("off", "auto", "on"):
        raise ValueError(f"teacher_state_cache must be off/auto/on, got {value!r}")
    return mode


class TeacherStateCache(ArrayDiskCache):
    """One .npy of [n_states, seq_len, hidden] (seq = vision ++ text) per
    (teacher generation, question_id), under base_dir/gen{g}/. The generation
    dir is additionally fingerprint-stamped against the teacher params at
    priming (diskcache.set_fingerprint), so a fresh run reusing an old
    output_dir re-primes instead of serving another run's teacher states."""

    def __init__(self, base_dir: str, generation: int, n_states: int, seq_len: int, hidden: int) -> None:
        super().__init__(os.path.join(base_dir, f"gen{generation}"), (n_states, seq_len, hidden))
        self.dir = self.cache_dir
        self.base_dir = base_dir
        self.generation = generation
        self.n_states = n_states
        self.seq_len = seq_len
        self.hidden = hidden

    # question_ids may be ints (VQA-v2) — key on their string form
    def has(self, qid) -> bool:
        return super().has(str(qid))

    def load(self, qid):
        return super().load(str(qid))

    def save(self, qid, states: np.ndarray) -> None:
        super().save(str(qid), states)

    def drop_older_generations(self) -> None:
        """Bound disk use to the live teacher: delete gen dirs < generation."""
        if not os.path.isdir(self.base_dir):
            return
        for name in os.listdir(self.base_dir):
            if name.startswith("gen"):
                try:
                    g = int(name[3:])
                except ValueError:
                    continue
                if g < self.generation:
                    shutil.rmtree(os.path.join(self.base_dir, name), ignore_errors=True)


class DeviceTeacherTable:
    """HBM-resident teacher-state table: [n_mem, n_states, seq, hidden] bf16.

    The vision-table design (data/vision_table.py) applied to the teacher
    states (VERDICT r3 #4a): the memory set is FIXED per task and the
    teacher frozen, so when the whole set's states fit the
    --device_teacher_table_mb budget they ship to HBM ONCE per task
    transition and memory batches carry 4-byte `t_idx` rows instead of
    ~15.8 MB/example `t_hs` streams — the +4% step win of the teacher-state
    cache WITHOUT its ~410 MB/s/chip transport tax (the reason the
    streaming tier is opt-in, docs/ARCHITECTURE.md design decision 8).
    Tasks over budget fall back to the streaming TeacherStateView."""

    def __init__(self, states: np.ndarray, key_to_idx: Dict[str, int], mesh=None) -> None:
        import jax
        import jax.numpy as jnp

        import ml_dtypes

        self.key_to_idx = key_to_idx
        states = states.astype(ml_dtypes.bfloat16)
        self.nbytes = int(states.nbytes)
        if mesh is not None:
            sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            # every process holds the identical host array (shared cache dir)
            self.table = jax.make_array_from_callback(
                states.shape, sharding, lambda idx: states[idx]
            )
        else:
            self.table = jax.device_put(states)
        self._gather = jax.jit(lambda table, idx: jnp.take(table, idx, axis=0))

    def __len__(self) -> int:
        return len(self.key_to_idx)

    def index(self, qid) -> int:
        return self.key_to_idx[str(qid)]

    def resolve(self, batch: Dict) -> Dict:
        """t_idx -> t_hs with one on-device gather (output sharding follows
        the index sharding, so DP batch sharding is preserved)."""
        if "t_idx" not in batch:
            return batch
        out = dict(batch)
        out["t_hs"] = self._gather(self.table, out.pop("t_idx"))
        return out


def teacher_table_nbytes(n_mem: int, n_states: int, seq_len: int, hidden: int) -> int:
    return n_mem * n_states * seq_len * hidden * 2  # bf16


def build_teacher_table(cache: TeacherStateCache, qids: List, mesh=None) -> DeviceTeacherTable:
    """Assemble the device table from a warm disk cache (priming precedes
    table construction, so a miss is a hard bug, not a fallback)."""
    if not qids:
        raise ValueError("empty teacher table")
    import ml_dtypes

    key_to_idx = {str(q): i for i, q in enumerate(qids)}
    first = cache.load(qids[0])
    if first is None:
        raise RuntimeError(f"teacher table: cache miss for {qids[0]!r} (prime first)")
    # stage directly in bf16: the f32 disk entries halve on assignment and
    # the table never holds a transient f32 copy of a multi-GB memory set
    states = np.empty((len(qids),) + first.shape, dtype=ml_dtypes.bfloat16)
    states[0] = first
    for i, q in enumerate(qids[1:], start=1):
        arr = cache.load(q)
        if arr is None:
            raise RuntimeError(f"teacher table: cache miss for {q!r} (prime first)")
        states[i] = arr
    return DeviceTeacherTable(states, key_to_idx, mesh=mesh)


class TeacherIndexView:
    """Wrap a memory dataset so items carry their table row (`t_idx`) instead
    of streamed states — the loader-side half of DeviceTeacherTable."""

    def __init__(self, dataset, table: DeviceTeacherTable) -> None:
        self.dataset = dataset
        self.table = table

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, index: int) -> Dict:
        item = self.dataset[index]
        item["t_idx"] = self.table.index(item.get("question_id"))
        return item

    def question_id(self, index: int):
        from mafed_tpu.data.vqa_dataset import question_id_of

        return question_id_of(self.dataset, index)


class TeacherStateView:
    """Wrap a memory dataset so items carry their cached teacher states.

    Applied per task transition (a NEW cache generation per teacher) on top
    of the raw memory Subsets — the underlying datasets are shared with the
    strategy's membership bookkeeping and stay unmodified."""

    def __init__(self, dataset, cache: TeacherStateCache) -> None:
        self.dataset = dataset
        self.cache = cache

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, index: int) -> Dict:
        item = self.dataset[index]
        t_hs = self.cache.load(item.get("question_id"))
        if t_hs is not None:
            item["t_hs"] = t_hs
        return item

    def question_id(self, index: int):
        from mafed_tpu.data.vqa_dataset import question_id_of

        return question_id_of(self.dataset, index)


def teacher_seq_len(model_cfg, text_len: int) -> int:
    """Hidden-state sequence length of the VL forward whose taps we cache:
    vision tokens (vl_pythia.n_vision_tokens) ++ text tokens."""
    from mafed_tpu.models.vl_pythia import n_vision_tokens

    return n_vision_tokens(model_cfg) + text_len


def teacher_fingerprint(teacher_trainable, frozen) -> str:
    """Digest binding a cache generation to the exact teacher (trainable copy
    + frozen tower/embeddings) whose states it holds."""
    from mafed_tpu.data.diskcache import params_fingerprint

    return "teacher:" + params_fingerprint({"teacher": teacher_trainable, "frozen": frozen})


def prime_teacher_cache(
    cache: TeacherStateCache,
    dataset,
    teacher_trainable,
    frozen,
    model_cfg,
    collate,
    deepest_tap: int,
    batch_size: int = 16,
    vision_table=None,
) -> int:
    """Compute + store teacher hidden states for every uncached memory
    example. ONE jitted early-exit teacher forward per batch; the partial
    final batch is padded to the compiled size. Returns examples computed
    BY THIS PROCESS. Safe to re-run; multi-process pods shard the work by
    key ownership and barrier at the end (atomic writes converge the
    shared dir)."""
    import jax
    import jax.numpy as jnp

    from mafed_tpu.data.images import prep_pixels
    from mafed_tpu.models import vl_pythia
    from mafed_tpu.training.train_state import merge_params

    from mafed_tpu.data.vqa_dataset import question_id_of

    # Canonicalize to the compute dtype BEFORE fingerprinting (same reason as
    # prime_vision_cache): an uninterrupted run's task transition passes
    # state.frozen (bf16, cast at runner.init_state) while a preemption
    # restart's skipped-task transition passes frozen reloaded from
    # safetensors (f32 — save_reference_safetensors upcasts on write).
    # Fingerprinting the raw leaves would read the SAME weights as different
    # teachers and wipe + fully re-prime the warm cache (~GBs of teacher
    # forwards) on every restart. The cast also pins the stored states to the
    # exact bf16 tree the in-step (uncached) teacher consumes.
    @jax.jit
    def _canonical(t):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, t
        )

    teacher_trainable = _canonical(jax.tree.map(jnp.asarray, teacher_trainable))
    frozen = _canonical(jax.tree.map(jnp.asarray, frozen))

    # staleness guard BEFORE the membership scan: cached states are a
    # function of the teacher params; a generation dir primed by a previous
    # run's teacher (same output_dir, same task index, different weights)
    # is wiped and re-primed. Coordinated: exactly one process wipes
    # (diskcache.set_fingerprint_coordinated).
    from mafed_tpu.data.diskcache import set_fingerprint_coordinated

    set_fingerprint_coordinated(cache, teacher_fingerprint(teacher_trainable, frozen))

    todo: List[int] = []
    qids: List = []
    seen: set = set()
    for i in range(len(dataset)):
        # metadata-only membership scan: no image decode / feature load for
        # already-cached examples (question_id_of, vqa_dataset.py)
        qid = question_id_of(dataset, i)
        if qid is None:
            raise ValueError(
                "teacher-state cache requires a question_id per memory "
                "example; annotations without ids would all collapse onto "
                "one cache entry (disable --teacher_state_cache)"
            )
        if str(qid) in seen:
            raise ValueError(
                f"duplicate question_id {qid!r} in the memory set: ids must "
                "be unique across tasks or cached teacher states would be "
                "served across examples (disable --teacher_state_cache)"
            )
        seen.add(str(qid))
        if not cache.has(qid):
            todo.append(i)
            qids.append(qid)

    n_proc = jax.process_count()
    if n_proc > 1:
        # cooperative pod priming: each miss is owned by exactly one process
        # (stable key-hash ownership — list positions diverge when peers'
        # atomic writes land mid-scan); the barrier at the end orders priming
        # before any process's distill steps consume the shared dir
        from mafed_tpu.data.diskcache import shard_owner

        proc = jax.process_index()
        mine = [j for j, q in enumerate(qids) if shard_owner(q, n_proc) == proc]
        todo = [todo[j] for j in mine]
        qids = [qids[j] for j in mine]
    if not todo:
        if n_proc > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("teacher_cache_primed")
        return 0

    params = merge_params(teacher_trainable, frozen)
    if jax.process_count() > 1:
        # every process scans the SHARED dir, so dispatch counts can diverge
        # across processes (a faster peer's atomic writes land mid-scan) —
        # the priming fn must therefore consume process-LOCAL arrays, never
        # globally-sharded ones (whose computations must be launched
        # collectively, in lockstep, by all processes)
        from mafed_tpu.evaluation.validate import localize_params

        params = localize_params(
            params, jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        )

    # params as ARGUMENTS (closure-captured device arrays bake into the
    # program; oversized compile payloads on remote-compile TPU tunnels)
    @jax.jit
    def t_fwd(p, input_ids, attention_mask, patches):
        return vl_pythia.forward(
            p, model_cfg, input_ids, None, attention_mask, None,
            patch_embeddings=patches, output_hidden_states=True,
            dtype=jnp.bfloat16, attn_impl="xla", need_logits=False,
            num_layers=deepest_tap,
        ).hidden_states

    @jax.jit
    def t_fwd_px(p, input_ids, attention_mask, pixels):
        px = prep_pixels({"pixels": pixels}, model_cfg.vision, jnp.bfloat16)
        return vl_pythia.forward(
            p, model_cfg, input_ids, px, attention_mask, None,
            output_hidden_states=True,
            dtype=jnp.bfloat16, attn_impl="xla", need_logits=False,
            num_layers=deepest_tap,
        ).hidden_states

    n_done = 0
    for start in range(0, len(todo), batch_size):
        idxs = todo[start : start + batch_size]
        items = [dataset[i] for i in idxs]
        n_real = len(items)
        while len(items) < batch_size:  # pad to the compiled batch size
            items.append(items[-1])
        batch = collate(items)
        if "patch_idx" in batch:
            # memory leaves carry the trainer's device vision table; priming
            # dispatches process-LOCAL work (see localize_params above), so
            # resolve rows on host rather than gathering from the global array
            if vision_table is None:
                raise RuntimeError(
                    "memory batch carries vision-table rows but no table was "
                    "passed to prime_teacher_cache"
                )
            batch = vision_table.resolve_host(batch)
        if "patches" in batch:
            hs = t_fwd(params, batch["input_ids"], batch["attention_mask"],
                       jnp.asarray(batch["patches"], jnp.bfloat16))
        else:
            hs = t_fwd_px(params, batch["input_ids"], batch["attention_mask"], batch["pixels"])
        hs_np = np.asarray(jnp.moveaxis(hs, 0, 1).astype(jnp.float32))  # [B, L, T, H]
        for j in range(n_real):
            cache.save(qids[start + j], hs_np[j])
            n_done += 1
    if n_proc > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("teacher_cache_primed")
    return n_done
