"""Greedy decoding: KV-cache jitted decoder must equal the naive
recompute-everything greedy loop (the reference uses use_cache=False;
greedy is cache-invariant, eval_utils.py:170-177)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mafed_tpu.evaluation.decode import make_greedy_decoder
from mafed_tpu.models import vl_pythia
from tests.helpers import tiny_model_cfg


def naive_greedy(params, cfg, batch, max_new_tokens, eos_id=0):
    """Recompute the full forward for every generated token (no cache)."""
    from mafed_tpu.data.images import prep_pixels

    input_ids = np.asarray(batch["input_ids"]).copy()
    attention_mask = np.asarray(batch["attention_mask"]).copy()
    pixels = prep_pixels(batch, cfg.vision, jnp.float32)
    b = input_ids.shape[0]
    finished = np.zeros((b,), bool)
    out_tokens = []
    for _ in range(max_new_tokens):
        res = vl_pythia.forward(
            params, cfg,
            jnp.asarray(input_ids), pixels, jnp.asarray(attention_mask),
            dtype=jnp.float32, attn_impl="xla",
        )
        logits = np.asarray(res.logits.astype(jnp.float32))[:, -1]
        tok = logits.argmax(-1).astype(np.int32)
        tok = np.where(finished, eos_id, tok)
        out_tokens.append(tok)
        finished |= tok == eos_id
        input_ids = np.concatenate([input_ids, tok[:, None]], axis=1)
        attention_mask = np.concatenate([attention_mask, np.ones((b, 1), attention_mask.dtype)], axis=1)
    return np.stack(out_tokens, axis=1)


def test_cached_decoder_matches_naive_greedy():
    cfg = tiny_model_cfg()
    params = vl_pythia.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, t = 2, 8
    batch = {
        "input_ids": rng.integers(1, 200, size=(b, t)).astype(np.int32),
        "attention_mask": np.ones((b, t), np.int32),
        "pixels": rng.integers(0, 256, size=(b, cfg.vision.img_size, cfg.vision.img_size, 3)).astype(np.uint8),
    }
    batch["attention_mask"][0, :3] = 0  # left padding

    decoder = make_greedy_decoder(cfg, max_new_tokens=6, eos_token_id=0, dtype=jnp.float32, attn_impl="xla")
    cached = np.asarray(decoder(params, batch))
    naive = naive_greedy(params, cfg, batch, max_new_tokens=6)
    np.testing.assert_array_equal(cached, naive)


def test_eos_padding_after_first_eos():
    """Once EOS appears, remaining positions must be EOS (pad)."""
    cfg = tiny_model_cfg()
    params = vl_pythia.init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    batch = {
        "input_ids": rng.integers(1, 200, size=(2, 6)).astype(np.int32),
        "attention_mask": np.ones((2, 6), np.int32),
        "pixels": rng.integers(0, 256, size=(2, 28, 28, 3)).astype(np.uint8),
    }
    decoder = make_greedy_decoder(cfg, max_new_tokens=8, eos_token_id=0, dtype=jnp.float32, attn_impl="xla")
    toks = np.asarray(decoder(params, batch))
    for row in toks:
        eos_positions = np.nonzero(row == 0)[0]
        if len(eos_positions):
            assert (row[eos_positions[0]:] == 0).all()
