"""Shared test fixtures: tiny model config + synthetic ContVQA-style data."""

from __future__ import annotations

import json
import os

import numpy as np

from mafed_tpu.core.config import ModelConfig, TrainConfig, VisionConfig


def tiny_model_cfg() -> ModelConfig:
    vision = VisionConfig(
        img_size=28,
        patch_size=14,  # 2x2 = 4 patches
        embed_dim=32,
        depth=2,
        num_heads=2,
        mlp_ratio=2.0,
    )
    return ModelConfig(
        vocab_size=512,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=2,
        intermediate_size=64,
        rotary_pct=0.25,
        vision=vision,
        vision_encoder_name="tiny-eva",
    )


QUESTIONS = [
    ("what color is the ball", "red"),
    ("how many dogs are there", "two"),
    ("what is the person doing", "running"),
    ("is it raining", "yes"),
    ("what animal is shown", "cat"),
    ("what room is this", "kitchen"),
]


def synthetic_config(root: str, tasks=("taskA", "taskB")) -> TrainConfig:
    """The TrainConfig matching write_synthetic_vqa's on-disk layout, without
    touching the filesystem (multi-process workers rebuild it against data a
    parent already wrote)."""
    return TrainConfig(
        output_dir=os.path.join(root, "out"),
        data_dir=root,
        question_task_ids=os.path.join(root, "contvqa"),
        exp="tiny",
        tasks=list(tasks),
        train_img_dirs=["unused"],
        val_img_dirs=["unused"],
        batch_size=4,
        val_batch_size=4,
        accumulate_grad_batches=1,
        epochs=[1, 1],
        max_txt_len=24,
        n_workers=2,
        val_num_workers=2,
        learning_rate=1e-3,
        optim="adamw",
        weight_decay=0.01,
        text_pad_multiple=8,
        mesh_shape=[1, 1],
        log_every=1,
        seed=42,
        allow_tokenizer_fallback=True,  # synthetic data; offline test env
    )


def write_synthetic_vqa(root: str, tasks=("taskA", "taskB"), n_train: int = 24, n_val: int = 8) -> TrainConfig:
    """Create {split}_annotations.json + split files shaped like the real data."""
    os.makedirs(os.path.join(root, "contvqa", "tiny"), exist_ok=True)
    rng = np.random.default_rng(0)

    def make_records(prefix, n):
        recs = {}
        for i in range(n):
            q, a = QUESTIONS[i % len(QUESTIONS)]
            qid = f"{prefix}{i}"
            recs[qid] = {
                "image_id": i,
                "id": qid,
                "question_id": qid,
                "question": q,
                "img_fname": f"synthetic_{i}",
                "multiple_choice_answer": a,
                "answers": [{"answer": a, "answer_confidence": "yes", "answer_id": j} for j in range(10)],
                "answer_type": "other",
            }
        return recs

    train_recs, val_recs = {}, {}
    train_split, val_split = {}, {}
    for t_i, task in enumerate(tasks):
        tr = make_records(f"{task}_tr", n_train)
        va = make_records(f"{task}_va", n_val)
        train_recs.update(tr)
        val_recs.update(va)
        train_split[task] = list(tr.keys())
        val_split[task] = list(va.keys())

    with open(os.path.join(root, "train_annotations.json"), "w") as f:
        json.dump(train_recs, f)
    with open(os.path.join(root, "val_annotations.json"), "w") as f:
        json.dump(val_recs, f)
    with open(os.path.join(root, "contvqa", "tiny", "train_question_ids.json"), "w") as f:
        json.dump(train_split, f)
    with open(os.path.join(root, "contvqa", "tiny", "valid_question_ids.json"), "w") as f:
        json.dump(val_split, f)

    return synthetic_config(root, tasks)
