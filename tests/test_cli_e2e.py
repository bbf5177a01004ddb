"""CLI end-to-end: python -m mafed_tpu.train main() with REAL image files.

Exercises the argparse+JSON config path (core/config.py parity with
mafed/train.py:304-478) and the real image pipeline (get_image_path COCO
mapping + C++/PIL decode + resize), which the other e2e tests bypass with
synthetic in-memory images.
"""

import json
import os

import numpy as np
import pytest

from tests.helpers import QUESTIONS, tiny_model_cfg


def _write_dataset_with_real_images(root, tasks=("taskA", "taskB"), n_train=8, n_val=4):
    from PIL import Image

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "contvqa", "tiny"), exist_ok=True)
    rng = np.random.default_rng(0)

    def make_records(prefix, n):
        recs = {}
        for i in range(n):
            q, a = QUESTIONS[i % len(QUESTIONS)]
            qid = f"{prefix}{i}"
            img_id = abs(hash(qid)) % 10**8
            # COCO-style db fname; the loader maps it to COCO_train2014_*.jpg
            fname = f"coco_train2014_{img_id:012d}.npz"
            disk = os.path.join(img_dir, f"COCO_train2014_{img_id:012d}.jpg")
            if not os.path.exists(disk):
                Image.fromarray(rng.integers(0, 255, (32, 40, 3), dtype=np.uint8).astype(np.uint8)).save(disk)
            recs[qid] = {
                "image_id": img_id,
                "question_id": qid,
                "question": q,
                "img_fname": fname,
                "multiple_choice_answer": a,
                "answers": [{"answer": a, "answer_confidence": "yes", "answer_id": j} for j in range(10)],
                "answer_type": "other",
            }
        return recs

    train_recs, val_recs, train_split, val_split = {}, {}, {}, {}
    for task in tasks:
        tr, va = make_records(f"{task}_tr", n_train), make_records(f"{task}_va", n_val)
        train_recs.update(tr)
        val_recs.update(va)
        train_split[task] = list(tr.keys())
        val_split[task] = list(va.keys())
    for name, data in (("train_annotations.json", train_recs), ("val_annotations.json", val_recs)):
        with open(os.path.join(root, name), "w") as f:
            json.dump(data, f)
    for name, data in (("train_question_ids.json", train_split), ("valid_question_ids.json", val_split)):
        with open(os.path.join(root, "contvqa", "tiny", name), "w") as f:
            json.dump(data, f)
    return img_dir


@pytest.mark.slow
def test_cli_train_main_real_images(tmp_path):
    root = str(tmp_path)
    img_dir = _write_dataset_with_real_images(root)

    model_cfg_path = os.path.join(root, "model_config.json")
    with open(model_cfg_path, "w") as f:
        json.dump(tiny_model_cfg().to_dict(), f)

    cli_cfg = {
        "data_dir": root,
        "question_task_ids": os.path.join(root, "contvqa"),
        "exp": "tiny",
        "tasks": ["taskA", "taskB"],
        "train_img_dirs": [img_dir],
        "val_img_dirs": [img_dir],
        "batch_size": 4,
        "val_batch_size": 4,
        "accumulate_grad_batches": 2,
        "epochs": [1, 1],
        "max_txt_len": 24,
        "n_workers": 2,
        "val_num_workers": 2,
        "learning_rate": 1e-3,
        "optim": "adamw",
        "weight_decay": 0.01,
        "text_pad_multiple": 8,
        "mesh_shape": [1, 1],
        "log_every": 1,
        "seed": 42,
        "allow_tokenizer_fallback": True,
    }
    cfg_path = os.path.join(root, "cli.json")
    with open(cfg_path, "w") as f:
        json.dump(cli_cfg, f)

    from mafed_tpu.train import main

    result = main(
        [
            "--config", cfg_path,
            "--model_config", model_cfg_path,
            "--output_dir", os.path.join(root, "out"),
            "--cl_method", "replay",
            "--cl_memory", "4",
            "--replay_interval", "2",
        ]
    )
    acc = np.asarray(result["accuracy_matrix"])
    assert acc.shape == (2, 2) and np.isfinite(acc).all()
    assert os.path.exists(os.path.join(root, "out", "ckpt", "taskB_best.safetensors"))
    assert os.path.exists(os.path.join(root, "out", "log", "hps.json"))
