"""Checkpoint interop: params -> reference-named safetensors -> params, and
the key-name surface the reference loader expects (vl_pythia.py:408-414)."""

import os

import numpy as np
import pytest

import jax

from mafed_tpu.models import vl_pythia
from mafed_tpu.models.weights import (
    convert_vl_state_dict,
    params_to_reference_state_dict,
    save_reference_safetensors,
)
from mafed_tpu.utils.checkpoint import load_task_checkpoint, save_task_checkpoint
from tests.helpers import tiny_model_cfg


def test_roundtrip_preserves_values(tmp_path):
    cfg = tiny_model_cfg()
    params = vl_pythia.init_params(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt" / "taskA_best.safetensors")
    save_task_checkpoint(params, cfg, path)
    restored = load_task_checkpoint(path, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(
        ("/".join(str(k) for k in p), v) for p, v in jax.tree_util.tree_leaves_with_path(restored)
    )
    for key_path, leaf in flat_a:
        key = "/".join(str(k) for k in key_path)
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(flat_b[key], np.float32),
            atol=0, rtol=0, err_msg=key,
        )


def test_reference_key_names(tmp_path):
    cfg = tiny_model_cfg()
    params = vl_pythia.init_params(cfg, jax.random.PRNGKey(0))
    sd = params_to_reference_state_dict(params, cfg)
    keys = set(sd)
    # decoder names as HF GPTNeoX expects
    assert "gpt_neox.embed_in.weight" in keys
    assert "embed_out.weight" in keys
    assert "gpt_neox.layers.0.attention.query_key_value.weight" in keys
    assert "gpt_neox.layers.0.mlp.dense_4h_to_h.bias" in keys
    assert f"gpt_neox.layers.{cfg.num_hidden_layers - 1}.input_layernorm.weight" in keys
    # projector as a torch Sequential (Linear, GELU, Linear)
    assert "vision_embed_tokens.0.weight" in keys
    assert "vision_embed_tokens.2.bias" in keys
    # vision encoder under timm Eva names
    assert "vision_encoder.patch_embed.proj.weight" in keys
    assert "vision_encoder.blocks.0.attn.q_proj.weight" in keys
    assert "vision_encoder.blocks.0.mlp.fc1_g.weight" in keys
    assert "vision_encoder.norm.weight" in keys
    # torch layout: linear weights are [out, in]
    w = sd["gpt_neox.layers.0.attention.query_key_value.weight"]
    assert w.shape == (3 * cfg.hidden_size, cfg.hidden_size)
    conv = sd["vision_encoder.patch_embed.proj.weight"]
    assert conv.shape == (cfg.vision.embed_dim, 3, cfg.vision.patch_size, cfg.vision.patch_size)


def test_convert_accepts_pl_prefixed_state_dict(tmp_path):
    """PL checkpoints carry 'model.'-prefixed keys (checkpoint.py:16-29)."""
    cfg = tiny_model_cfg()
    params = vl_pythia.init_params(cfg, jax.random.PRNGKey(0))
    sd = params_to_reference_state_dict(params, cfg)
    restored = convert_vl_state_dict(sd, cfg)
    ref = np.asarray(params["decoder"]["embed_in"]["weight"])
    got = np.asarray(restored["decoder"]["embed_in"]["weight"])
    np.testing.assert_allclose(got, ref)
