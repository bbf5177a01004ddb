"""Batch collation with static shapes for jit.

The reference left-pads to the longest sequence in the batch
(vl_pythia_vqa_dataset.py:128-158, _pad_sequence utils/vl_pythia.py:155-171),
which is fine under eager torch but would retrigger XLA compilation per
length. Here every batch is left-padded to ONE fixed text length so the
train step compiles exactly once. Padding ids are 0 with attention 0 and
labels -100 — identical loss/attention semantics to the reference.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from mafed_tpu.constants import IGNORE_INDEX


def _left_pad(rows: Sequence[np.ndarray], length: int, pad_value: int) -> np.ndarray:
    out = np.full((len(rows), length), pad_value, dtype=np.int32)
    for i, row in enumerate(rows):
        row = row[-length:] if len(row) > length else row
        if len(row):
            out[i, length - len(row):] = row
    return out


def collate_train(items: List[Dict], text_len: int, label_tail: Optional[int] = None) -> Dict[str, np.ndarray]:
    input_ids = _left_pad([it["input_ids"] for it in items], text_len, 0)
    labels = _left_pad([it["labels"] for it in items], text_len, IGNORE_INDEX)
    if label_tail and label_tail < text_len:
        # the train step restricts lm_head + CE to the last label_tail
        # positions (models/vl_pythia.py label_tail); that is loss-identical
        # ONLY if every supervised label sits in the last label_tail-1
        # positions — left padding puts answer⊕EOS at the very end, so this
        # only trips on pathologically long answers
        head = labels[:, : text_len - (label_tail - 1)]
        if (head != IGNORE_INDEX).any():
            raise ValueError(
                f"supervised labels outside the last {label_tail - 1} positions; "
                f"raise --label_tail (or set it to 0 to disable)"
            )
    attention_mask = np.zeros_like(input_ids)
    for i, it in enumerate(items):
        n = min(len(it["input_ids"]), text_len)
        attention_mask[i, text_len - n:] = 1
    out = {
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "labels": labels,
    }
    out.update(_collate_vision(items))
    has_ths = ["t_hs" in it for it in items]
    if all(has_ths):
        # teacher-state cache steady state (data/teacher_cache.py):
        # [B, n_states, seq, hidden] — the distill step skips the teacher
        out["t_hs"] = np.stack([it["t_hs"] for it in items])
    elif any(has_ths):
        raise ValueError(
            "batch mixes cached teacher states and misses; prime the teacher "
            "cache over the full memory set before training"
        )
    has_tidx = ["t_idx" in it for it in items]
    if all(has_tidx):
        # device teacher-state table (teacher_cache.DeviceTeacherTable):
        # 4-byte rows; the runner gathers t_hs in HBM before the step
        out["t_idx"] = np.asarray([it["t_idx"] for it in items], np.int32)
    elif any(has_tidx):
        raise ValueError(
            "batch mixes teacher-table rows and misses; the table must cover "
            "the full memory set"
        )
    return out


def _collate_vision(items: List[Dict]) -> Dict[str, np.ndarray]:
    """Stack the batch's vision input: device-table row indices when the
    trainer attached a vision table (data/vision_table.py), cached patch
    features when present (vision_cache steady state), raw uint8 pixels
    otherwise. Mixed batches indicate a partially-primed cache or a
    partially-attached table — fail loudly rather than compile a second step
    signature mid-epoch."""
    has_idx = ["patch_idx" in it for it in items]
    if all(has_idx):
        return {"patch_idx": np.asarray([it["patch_idx"] for it in items], np.int32)}
    if any(has_idx):
        raise ValueError(
            "batch mixes vision-table indices and streamed vision input; "
            "the vision table must cover every dataset the task draws from"
        )
    has_patches = ["patches" in it for it in items]
    if all(has_patches):
        return {"patches": np.stack([it["patches"] for it in items])}
    if any(has_patches):
        raise ValueError(
            "batch mixes cached vision features and raw pixels; prime the "
            "vision cache over the full dataset before training"
        )
    return {"pixels": np.stack([it["pixels"] for it in items])}


def collate_val(items: List[Dict], text_len: int) -> Dict:
    input_ids = _left_pad([it["input_ids"] for it in items], text_len, 0)
    attention_mask = np.zeros_like(input_ids)
    for i, it in enumerate(items):
        n = min(len(it["input_ids"]), text_len)
        attention_mask[i, text_len - n:] = 1
    out = {
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "answers": [it["answers"] for it in items],
        "qids": [it["question_id"] for it in items],
    }
    out.update(_collate_vision(items))
    return out
