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


LEARNABLE_QUESTION = "what do you see"

# hue classes (task "hue") and luminance classes (task "light"): the answer
# is a pure function of the image pixels, so a model that looks at the image
# can score ~1.0 and a model that ignores it cannot beat the class prior.
# Both tasks share the SAME question string, so sequential finetuning on
# "light" directly interferes with "hue"'s conditional — the forgetting the
# CL methods exist to prevent (reference train.py:61-67 measures it as BWT).
HUE_CLASSES = {
    "red": (200, 30, 30),
    "green": (30, 200, 30),
    "blue": (30, 30, 200),
    "yellow": (200, 200, 30),
}
LIGHT_CLASSES = {"bright": (235, 235, 235), "dark": (20, 20, 20)}
LEARNABLE_TASKS = {"hue": HUE_CLASSES, "light": LIGHT_CLASSES}


def write_learnable_vqa(
    root: str,
    tasks=("hue", "light"),
    n_train: int = 48,
    n_val: int = 16,
) -> TrainConfig:
    """A deterministic, LEARNABLE 2-task ContVQA fixture: real image files
    whose pixels determine the answer (VERDICT r3 #1 — the learning-signal
    oracle synthetic noise images cannot provide)."""
    from PIL import Image

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "contvqa", "tiny"), exist_ok=True)
    rng = np.random.default_rng(0)

    def make_records(task, prefix, n):
        classes = list(LEARNABLE_TASKS[task].items())
        recs = {}
        for i in range(n):
            answer, base = classes[i % len(classes)]
            fname = f"{prefix}{i}.png"
            # solid class color + small deterministic noise so every image is
            # unique but trivially classifiable
            pix = np.clip(
                np.asarray(base, np.int16)[None, None, :]
                + rng.integers(-12, 13, size=(28, 28, 3), dtype=np.int16),
                0, 255,
            ).astype(np.uint8)
            Image.fromarray(pix).save(os.path.join(img_dir, fname))
            qid = f"{prefix}{i}"
            recs[qid] = {
                "image_id": i,
                "id": qid,
                "question_id": qid,
                "question": LEARNABLE_QUESTION,
                "img_fname": fname,
                "multiple_choice_answer": answer,
                "answers": [
                    {"answer": answer, "answer_confidence": "yes", "answer_id": j}
                    for j in range(10)
                ],
                "answer_type": "other",
            }
        return recs

    train_recs, val_recs = {}, {}
    train_split, val_split = {}, {}
    for task in tasks:
        tr = make_records(task, f"{task}_tr", n_train)
        va = make_records(task, f"{task}_va", n_val)
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

    cfg = synthetic_config(root, tasks)
    return cfg.replace(
        train_img_dirs=[img_dir],
        val_img_dirs=[img_dir],
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
