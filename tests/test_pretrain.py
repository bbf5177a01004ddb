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


@pytest.mark.slow
def test_pretrain_midepoch_resume_matches_uninterrupted(tmp_path):
    """A run resumed from a MID-EPOCH checkpoint must finish bit-identical to
    the uninterrupted run: the epoch shuffle order is a pure function of
    (seed, epoch), so skip_batches replays exactly the batches the original
    epoch already consumed (regression: the epoch seed used to be drawn from
    the mutable RNG, whose post-draw saved state made the resumed epoch
    shuffle with the NEXT epoch's seed)."""
    import jax

    ds, model_cfg = make_dataset(16)

    def make_args(out):
        return PretrainConfig(
            output_dir=str(tmp_path / out),
            per_device_train_batch_size=4,
            num_train_epochs=2,
            learning_rate=1e-3,
            # 4 steps/epoch x 2 epochs = 8 total; save_every = 2 -> the
            # step-2 checkpoint lands mid-epoch 0 (batch_idx 1)
            save_steps=0.3,
            eval_steps=10.0,
            model_max_length=32,
            logging_steps=1,
            load_best_model_at_end=False,
            save_total_limit=10,
        )

    args1 = make_args("uninterrupted")
    state1 = PretrainTrainer(model_cfg, args1, ds, tokenizer=ByteTokenizer()).train()
    mid = os.path.join(args1.output_dir, "checkpoint-2")
    with open(os.path.join(mid, "trainer_state.json")) as f:
        meta = json.load(f)
    assert meta["epoch"] == 0 and meta["batch_idx"] < 3, "checkpoint must be mid-epoch"

    args2 = make_args("resumed")
    state2 = PretrainTrainer(model_cfg, args2, ds, tokenizer=ByteTokenizer()).train(
        resume_from_checkpoint=mid
    )
    assert int(state2.step) == int(state1.step)
    flat1 = jax.tree.leaves(state1.trainable)
    flat2 = jax.tree.leaves(state2.trainable)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_pretrain_dp8_matches_single_device(tmp_path):
    """SPMD pretraining (HF world_size batch semantics): a dp8 mesh with
    per_device_batch=1 and a single-device run with per_device_batch=8 train
    on the SAME global batches — losses and the final checkpoint must match
    (DP is a layout change only)."""
    import jax

    from mafed_tpu.core.mesh import make_mesh

    ds, model_cfg = make_dataset(32)
    eval_ds, _ = make_dataset(8)

    def run(out, mesh, per_device):
        args = PretrainConfig(
            output_dir=str(tmp_path / out),
            per_device_train_batch_size=per_device,
            per_device_eval_batch_size=per_device,
            num_train_epochs=1,
            learning_rate=1e-3,
            save_steps=1.0,
            eval_steps=0.5,
            model_max_length=32,
            logging_steps=1,
        )
        trainer = PretrainTrainer(
            model_cfg, args, ds, eval_ds, tokenizer=ByteTokenizer(), mesh=mesh
        )
        trainer.train()
        with open(os.path.join(args.output_dir, "metrics.jsonl")) as f:
            losses = [
                json.loads(l)["train/loss"] for l in f if "train/loss" in json.loads(l)
            ]
        from safetensors.numpy import load_file

        final = load_file(os.path.join(args.output_dir, "checkpoint-final", "model.safetensors"))
        return losses, final

    mesh8 = make_mesh((8, 1), ("data", "model"))
    l_dp, f_dp = run("dp8", mesh8, per_device=1)
    l_sd, f_sd = run("sd", None, per_device=8)
    assert len(l_dp) == len(l_sd) > 0
    np.testing.assert_allclose(l_dp, l_sd, atol=5e-4)
    assert f_dp.keys() == f_sd.keys()
    # Adam normalizes by sqrt(nu): early steps amplify the f32
    # reduction-order difference between an 8-way psum and a single-device
    # batch sum up to ~lr scale — equivalence is at optimizer-step
    # granularity, not bitwise
    for k in f_dp:
        np.testing.assert_allclose(
            f_dp[k].astype(np.float32), f_sd[k].astype(np.float32), atol=5e-3, err_msg=k
        )
