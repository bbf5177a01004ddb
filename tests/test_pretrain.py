"""Pretraining pipeline: dataset/collate semantics + trainer with resume."""

import json
import os

import numpy as np
import pytest

from mafed_tpu.constants import IGNORE_INDEX
from mafed_tpu.data.tokenizer import ByteTokenizer
from mafed_tpu.pretrain.dataset import CaptionRecord, PretrainDataset, collate_pretrain
from mafed_tpu.pretrain.trainer import PretrainConfig, PretrainTrainer
from tests.helpers import tiny_model_cfg


def make_dataset(n=16):
    cfg = tiny_model_cfg()
    tok = ByteTokenizer(model_max_length=32)
    records = [
        CaptionRecord(image=f"img{i}", caption=f"a photo of thing {i}", source="coco")
        for i in range(n)
    ]
    return PretrainDataset(tok, cfg.vision, records=records, model_max_length=32, synthetic_images=True), cfg


def test_pretrain_item_semantics():
    ds, _ = make_dataset()
    item = ds[0]
    # caption formatted: capitalized + fullstop; labels == input_ids
    assert item["raw"]["caption"] == "A photo of thing 0."
    np.testing.assert_array_equal(item["input_ids"], item["labels"])
    assert item["pixels"].dtype == np.uint8


def test_collate_pretrain_right_pad():
    ds, _ = make_dataset()
    batch = collate_pretrain([ds[0], ds[1]], text_len=24, pad_token_id=0)
    n0 = len(ds[0]["input_ids"])
    assert batch["input_ids"].shape == (2, 24)
    assert (batch["attention_mask"][0][:n0] == 1).all()
    assert (batch["attention_mask"][0][n0:] == 0).all()
    assert (batch["labels"][0][n0:] == IGNORE_INDEX).all()


@pytest.mark.slow
def test_pretrain_trainer_and_resume(tmp_path):
    ds, model_cfg = make_dataset(16)
    eval_ds, _ = make_dataset(8)
    args = PretrainConfig(
        output_dir=str(tmp_path / "pre"),
        per_device_train_batch_size=4,
        per_device_eval_batch_size=4,
        num_train_epochs=1,
        learning_rate=1e-3,
        save_steps=0.5,
        eval_steps=0.5,
        model_max_length=32,
        logging_steps=1,
    )
    trainer = PretrainTrainer(model_cfg, args, ds, eval_ds, tokenizer=ByteTokenizer())
    state = trainer.train()
    final = os.path.join(args.output_dir, "checkpoint-final")
    assert os.path.exists(os.path.join(final, "model.safetensors"))
    assert os.path.exists(os.path.join(final, "trainer_state.json"))

    # resume from the final checkpoint: should run epoch-complete and finish
    trainer2 = PretrainTrainer(model_cfg, args, ds, eval_ds, tokenizer=ByteTokenizer())
    state2 = trainer2.train(resume_from_checkpoint=final)
    assert int(state2.step) >= int(state.step)
