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


def _half_image(bright_half: str) -> np.ndarray:
    """28x28 image, one half near-white (220) the other mid-gray (100)."""
    img = np.full((28, 28, 3), 100, np.uint8)
    if bright_half == "left":
        img[:, :14] = 220
    elif bright_half == "right":
        img[:, 14:] = 220
    elif bright_half == "up":
        img[:14, :] = 220
    elif bright_half == "down":
        img[14:, :] = 220
    return img


# Learnable visual tasks: the answer is a pure function of the image pixels,
# so a model that looks at the image can score ~1.0 and a model that ignores
# it cannot beat the class prior. All visual tasks share the SAME question
# string by default, so sequential finetuning on a later task directly
# interferes with earlier tasks' conditionals — the forgetting the CL methods
# exist to prevent (reference train.py:61-67 measures it as BWT). Class
# values are either a solid RGB base or a full 28x28x3 base image; answer
# vocabularies are disjoint across tasks (reference ContVQA protocol has 5
# tasks per order, scripts/run_seed42.sh:6).
HUE_CLASSES = {
    "red": (200, 30, 30),
    "green": (30, 200, 30),
    "blue": (30, 30, 200),
    "yellow": (200, 200, 30),
}
LIGHT_CLASSES = {"bright": (235, 235, 235), "dark": (20, 20, 20)}
SIDE_CLASSES = {"left": _half_image("left"), "right": _half_image("right")}
VERT_CLASSES = {"up": _half_image("up"), "down": _half_image("down")}
TONE_CLASSES = {"warm": (230, 140, 20), "cool": (20, 150, 170)}
# "echo" is TEXT-informative: the answer is spelled out in the question and
# every image is the same mid-gray — the complement of the visual tasks, used
# to test that adaptive modality weighting orders vision vs text correctly
# (reference distillation_loss_weights.py:91-146).
ECHO_CLASSES = {w: (128, 128, 128) for w in ("alpha", "beta", "delta", "omega")}
LEARNABLE_TASKS = {
    "hue": HUE_CLASSES,
    "light": LIGHT_CLASSES,
    "side": SIDE_CLASSES,
    "vert": VERT_CLASSES,
    "tone": TONE_CLASSES,
    "echo": ECHO_CLASSES,
}
# Per-task question strings for the distinct-question variant (disjoint
# informative parameters — the interference regime diagonal-Fisher EWC can
# plausibly counter, unlike the shared-question/disjoint-answer regime).
TASK_QUESTIONS = {
    "hue": "what color is it",
    "light": "how bright is it",
    "side": "which side is lit",
    "vert": "is it lit on top",
    "tone": "is the tint warm",
}


def _task_question(task: str, answer: str, distinct: bool) -> str:
    if task == "echo":
        return f"say {answer}"
    if distinct:
        return TASK_QUESTIONS[task]
    return LEARNABLE_QUESTION


def write_learnable_vqa(
    root: str,
    tasks=("hue", "light"),
    n_train: int = 48,
    n_val: int = 16,
    distinct_questions: bool = False,
) -> TrainConfig:
    """A deterministic, LEARNABLE ContVQA fixture: real image files whose
    pixels (or, for "echo", whose question text) determine the answer
    (VERDICT r3 #1 — the learning-signal oracle synthetic noise images cannot
    provide). `distinct_questions=True` gives each task its own question
    string (disjoint informative parameters — the EWC-friendly regime)."""
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
            # class base image (solid color or structured array) + small
            # deterministic noise so every image is unique but trivially
            # classifiable
            base_img = (
                np.asarray(base, np.int16)[None, None, :]
                if not isinstance(base, np.ndarray)
                else base.astype(np.int16)
            )
            pix = np.clip(
                base_img + rng.integers(-12, 13, size=(28, 28, 3), dtype=np.int16),
                0, 255,
            ).astype(np.uint8)
            Image.fromarray(pix).save(os.path.join(img_dir, fname))
            qid = f"{prefix}{i}"
            recs[qid] = {
                "image_id": i,
                "id": qid,
                "question_id": qid,
                "question": _task_question(task, answer, distinct_questions),
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
