"""Generative VQA validation loop.

Parity: mafed/utils/eval_utils.py:161-195 (validate_pythia_vqa) — greedy
generation of up to 10 tokens, decoded continuations scored with the VQA-v2
soft metric; emits valid/acc, valid/ex_per_s, valid/n_ex. The decode itself
is the cached jitted decoder (evaluation/decode.py). Short final batches are
padded to the compiled batch size and the padding rows discarded.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from mafed_tpu.core.logging import LOGGER
from mafed_tpu.evaluation.vqa_metrics import VQAGenerativeAccuracy, normalize_answer, vqa_v2_score


_DECODE_KEYS = ("input_ids", "attention_mask", "pixels", "patches", "patch_idx")


def gather_to_replicated(params):
    """Collectively reshard every TP-sharded leaf of a global param tree to
    fully-replicated ON ITS OWN MESH (one jitted identity = one XLA
    all-gather program). All processes of the mesh must call this together —
    it is the once-per-eval-round step that makes a TP-trained model's
    params addressable from every process, so the per-process decode path
    (and np.asarray) works at every scale (VERDICT r3 #5; reference
    capability: eval after every task, train.py:43-70)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    def _is_tp(x):
        return (
            hasattr(x, "is_fully_replicated")
            and not x.is_fully_replicated
            and isinstance(getattr(x, "sharding", None), NamedSharding)
        )

    tp_leaves = [x for x in jax.tree.leaves(params) if _is_tp(x)]
    if not tp_leaves:
        return params
    mesh = tp_leaves[0].sharding.mesh
    repl = NamedSharding(mesh, PartitionSpec())
    gather = jax.jit(lambda t: t, out_shardings=repl)
    return gather(params)


def localize_params(params, sharding):
    """Re-place a (possibly globally-sharded) param tree onto a PROCESS-LOCAL
    sharding — the step before any per-process, non-collective dispatch
    (multi-process eval decode, teacher-cache priming). TP-sharded leaves
    are first gathered to replicated collectively (gather_to_replicated —
    every process joins), after which each process re-places its own full
    copy."""
    import jax

    def _needs_gather(x):
        return (
            hasattr(x, "is_fully_replicated")
            and not x.is_fully_replicated
            and not x.is_fully_addressable
        )

    if any(_needs_gather(x) for x in jax.tree.leaves(params)):
        params = gather_to_replicated(params)

    def _localize(x):
        try:
            return jax.device_put(x, sharding)
        except (ValueError, RuntimeError):
            pass
        return jax.device_put(np.asarray(x), sharding)

    return jax.tree.map(_localize, params)


def _pad_batch(batch: Dict, batch_size: int) -> Tuple[Dict, int]:
    n = batch["input_ids"].shape[0]
    if n == batch_size:
        return batch, n
    out = dict(batch)
    for k in _DECODE_KEYS:
        if k not in batch:
            continue
        v = batch[k]
        reps = np.concatenate([v, np.repeat(v[-1:], batch_size - n, axis=0)], axis=0)
        out[k] = reps
    return out, n


def validate_vqa(
    params,
    decoder: Callable,
    val_loader,
    tokenizer,
    batch_size: int,
    max_batches: Optional[int] = None,
    sharding=None,
    param_sharding=None,
    resolve: Optional[Callable] = None,
) -> Tuple[Dict, Dict]:
    """Generative VQA eval. With `sharding` the decode batch is placed with
    the mesh's batch sharding, so generation runs SPMD over the data axis;
    each process scores its own shard host-side and (score_sum, n_ex) are
    summed across processes afterwards — the TPU-native replacement for the
    reference metric's dist_sync_on_step NCCL all_reduce
    (eval_utils.py:83-104,135-138).

    Multi-process pods pass a process-LOCAL `sharding` (decode is per-process,
    not collective — shards have unequal batch counts) plus `param_sharding`,
    a local replicated sharding: params are DP-replicated globally, so each
    process re-places one local copy and decode fans out over all of its
    local chips instead of idling all but the first."""
    import jax

    if param_sharding is not None:
        params = localize_params(params, param_sharding)

    n_ex = 0
    start = time.time()
    results: Dict = {}
    metric = VQAGenerativeAccuracy()

    def score(toks_dev, batch, n_valid):
        nonlocal n_ex
        # the host sync point: materialize the (already dispatched) tokens
        toks = np.asarray(toks_dev)[:n_valid]
        predictions = tokenizer.batch_decode(toks, skip_special_tokens=True)
        answers = batch["answers"][:n_valid]
        metric(predictions, answers)
        from collections import Counter

        for qid, pred, gts in zip(batch["qids"][:n_valid], predictions, answers):
            pred_norm = normalize_answer(pred)
            results[qid] = {
                "answer": pred_norm,
                "acc": vqa_v2_score(Counter(gts).get(pred_norm, 0)),
            }
        n_ex += n_valid

    # Decode dispatch is async: batch i+1's generation is enqueued on the
    # device BEFORE batch i's tokens are pulled to the host for scoring, so
    # tokenizer decode + metric work overlap device compute (the reference
    # loop syncs every batch, eval_utils.py:170-179).
    pending = None
    for i, batch in enumerate(val_loader):
        if max_batches is not None and i >= max_batches:
            break
        padded, n_valid = _pad_batch(batch, batch_size)
        dec_batch = {k: padded[k] for k in _DECODE_KEYS if k in padded}
        if sharding is not None:
            dec_batch = {k: jax.device_put(v, sharding) for k, v in dec_batch.items()}
        if resolve is not None:
            # vision-table rows -> patches (runner.eval_resolve): an on-device
            # gather instead of re-streaming ~0.5 MB of features per example
            dec_batch = resolve(dec_batch)
        toks_dev = decoder(params, dec_batch)
        if pending is not None:
            score(*pending)
        pending = (toks_dev, batch, n_valid)
    if pending is not None:
        score(*pending)

    tot_time = max(time.time() - start, 1e-9)
    # multi-process DP eval: every process scored its shard; reduce sums.
    # valid/ex_per_s is SYSTEM throughput: processes run their shards
    # concurrently over (approximately) the same wall clock, so global
    # examples / local wall time is the aggregate rate (per-chip rate is
    # this divided by process_count).
    from mafed_tpu.core.dist import process_reduce_sum

    score_sum, total = process_reduce_sum(metric.accuracy, float(metric.total))
    n_ex_global = int(total) if total else n_ex
    val_acc = score_sum / max(total, 1.0)
    LOGGER.info("Tested %d samples", n_ex_global)
    LOGGER.info("validation finished in %d seconds, score: %.2f", int(tot_time), val_acc * 100)
    return (
        {"valid/acc": val_acc, "valid/ex_per_s": n_ex_global / tot_time, "valid/n_ex": n_ex_global},
        results,
    )
