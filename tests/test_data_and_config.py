"""Collation, formatting, schedule, and config-merge semantics."""

import json
import os

import numpy as np
import pytest

from mafed_tpu.constants import IGNORE_INDEX
from mafed_tpu.core.config import ModelConfig, TrainConfig, build_arg_parser, parse_with_config
from mafed_tpu.data.collate import collate_train, collate_val
from mafed_tpu.data.images import get_image_path
from mafed_tpu.data.tokenizer import ByteTokenizer
from mafed_tpu.data.vqa_dataset import format_text
from mafed_tpu.optim.sched import linear_warmup_schedule, warmup_linear_lr


def test_format_text():
    # strip/capitalize/fullstop (vl_pythia_vqa_dataset.py:107-125)
    assert format_text("  what color is it ") == "What color is it."
    assert format_text("is it red?") == "Is it red?"
    assert format_text("red", capitalize=False) == "red."
    assert format_text("go!") == "Go!"


def test_collate_train_left_pad():
    items = [
        {"input_ids": np.array([5, 6, 7]), "labels": np.array([-100, 6, 7]), "pixels": np.zeros((4, 4, 3), np.uint8)},
        {"input_ids": np.array([9]), "labels": np.array([9]), "pixels": np.zeros((4, 4, 3), np.uint8)},
    ]
    out = collate_train(items, text_len=5)
    np.testing.assert_array_equal(out["input_ids"][0], [0, 0, 5, 6, 7])
    np.testing.assert_array_equal(out["input_ids"][1], [0, 0, 0, 0, 9])
    np.testing.assert_array_equal(out["attention_mask"][0], [0, 0, 1, 1, 1])
    np.testing.assert_array_equal(out["attention_mask"][1], [0, 0, 0, 0, 1])
    np.testing.assert_array_equal(out["labels"][0], [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 6, 7])
    assert out["pixels"].shape == (2, 4, 4, 3)


def test_collate_truncates_overlong_from_left():
    items = [{"input_ids": np.arange(1, 9), "labels": np.arange(1, 9), "pixels": np.zeros((2, 2, 3), np.uint8)}]
    out = collate_train(items, text_len=4)
    np.testing.assert_array_equal(out["input_ids"][0], [5, 6, 7, 8])


def test_build_tokenizer_hard_fails_without_optin(monkeypatch):
    """Real runs must not silently train on a different vocabulary
    (VERDICT r1 #4): no real tokenizer available => RuntimeError unless the
    caller explicitly opts into the byte fallback.

    Uses a guaranteed-nonexistent name so the test is deterministic even on
    machines whose HF cache holds the real Pythia tokenizer."""
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    from mafed_tpu.data.tokenizer import build_tokenizer

    name = "mafed-tpu-test/definitely-not-a-tokenizer"
    with pytest.raises(RuntimeError, match="allow_tokenizer_fallback"):
        build_tokenizer(name)
    tok = build_tokenizer(name, allow_fallback=True)
    assert getattr(tok, "is_byte_fallback", False)


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    ids = tok("What color?").input_ids
    assert tok.decode(ids) == "What color?"
    assert tok.eos_token_id == 0
    assert tok.batch_decode([ids + [0, 0]])[0] == "What color?"


def test_image_path_mapping():
    # vl_pythia_vqa_dataset.py:15-27
    assert get_image_path("/d", "coco_train2014_000000123456.npz") == "/d/COCO_train2014_000000123456.jpg"
    assert get_image_path("/d", "abstract_v002_train2015_000000007.npz") == "/d/abstract_v002_train2015_000000007.png"
    assert get_image_path("/d", "VizWiz_train_000000000.npz") == "/d/VizWiz_train_000000000.jpg"
    assert get_image_path("/d", "plain.jpg") == "/d/plain.jpg"


def test_linear_warmup_schedule():
    sched = linear_warmup_schedule(1.0, warmup_steps=10, total_steps=110)
    assert abs(float(sched(0)) - 0.0) < 1e-9
    assert abs(float(sched(5)) - 0.5) < 1e-6
    assert abs(float(sched(10)) - 1.0) < 1e-6
    assert abs(float(sched(60)) - 0.5) < 1e-6
    assert abs(float(sched(110)) - 0.0) < 1e-6
    # host-side variant with floor
    assert warmup_linear_lr(1.0, 200, 10, 110) == 1e-8


def test_parse_with_config_cli_wins(tmp_path):
    # JSON fills keys not explicitly passed; CLI wins per-key (misc.py:26-35)
    cfg_file = tmp_path / "c.json"
    cfg_file.write_text(json.dumps({"batch_size": 64, "learning_rate": 1e-3, "seed": 7}))
    parser = build_arg_parser()
    cfg = parse_with_config(parser, ["--config", str(cfg_file), "--batch_size", "16"])
    assert cfg.batch_size == 16  # CLI wins
    assert cfg.learning_rate == 1e-3  # JSON fills
    assert cfg.seed == 7


def test_model_config_from_reference_json(tmp_path):
    data = {
        "hidden_size": 1024, "intermediate_size": 4096, "num_attention_heads": 16,
        "num_hidden_layers": 24, "rotary_pct": 0.25, "rotary_emb_base": 10000,
        "use_parallel_residual": True, "vocab_size": 50304,
        "layer_norm_eps": 1e-05, "select_feature": "patch", "select_layer": -2,
        "vision_encoder_name": "timm/eva02_large_patch14_clip_224",
        "max_position_embeddings": 2048, "tie_word_embeddings": False,
        "unknown_hf_field": "ignored",
    }
    p = tmp_path / "m.json"
    p.write_text(json.dumps(data))
    cfg = ModelConfig.from_json(str(p))
    assert cfg.hidden_size == 1024
    assert cfg.rotary_ndims == int(64 * 0.25)
    assert cfg.vision.num_patches == 256


@pytest.mark.parametrize(
    "preset,json_name,target_params",
    [("160m", "vlpythia-160m.json", 162e6), ("410m", "vlpythia-base.json", 405e6), ("1b", "vlpythia-1b.json", 1.01e9)],
)
def test_model_scale_configs(preset, json_name, target_params):
    """The three reference scales (download_models.py:6-24, Pythia dims):
    the shipped JSON config equals the code preset, and the DECODER param
    count (shape-only, jax.eval_shape — no allocation) lands on the scale's
    nameplate size."""
    import os

    import jax

    from mafed_tpu.core.config import ModelConfig, model_config_for_preset
    from mafed_tpu.models import vl_pythia

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_json = ModelConfig.from_json(os.path.join(repo, "config", json_name))
    cfg_preset = model_config_for_preset(preset)
    for f in ("hidden_size", "num_hidden_layers", "num_attention_heads", "intermediate_size", "vocab_size", "rotary_pct"):
        assert getattr(cfg_json, f) == getattr(cfg_preset, f), f

    shapes = jax.eval_shape(lambda k: vl_pythia.init_params(cfg_json, k), jax.random.PRNGKey(0))
    n_decoder = sum(
        int(np.prod(leaf.shape))
        for path, leaf in jax.tree_util.tree_leaves_with_path(shapes["decoder"])
    ) + int(np.prod(shapes["embed_out"]["weight"].shape) if isinstance(shapes.get("embed_out"), dict) else 0)
    assert abs(n_decoder - target_params) / target_params < 0.08, n_decoder
