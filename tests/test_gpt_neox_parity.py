"""Numerical parity of the JAX GPT-NeoX decoder vs HF torch (SURVEY.md §4).

Random small configs, fp32, exercising partial rotary (rotary_pct=0.25),
parallel residual on/off, and left-padded attention masks.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mafed_tpu.core.config import ModelConfig
from mafed_tpu.models import gpt_neox
from mafed_tpu.models.weights import convert_decoder_state_dict

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def make_pair(parallel_residual=True, rotary_pct=0.25, seed=0):
    from transformers import GPTNeoXConfig, GPTNeoXModel

    torch.manual_seed(seed)
    hf_cfg = GPTNeoXConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=112,
        rotary_pct=rotary_pct,
        use_parallel_residual=parallel_residual,
        layer_norm_eps=1e-5,
        attn_implementation="eager",
    )
    hf = GPTNeoXModel(hf_cfg).eval()
    cfg = ModelConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=112,
        rotary_pct=rotary_pct,
        use_parallel_residual=parallel_residual,
    )
    params = convert_decoder_state_dict(hf.state_dict(), cfg, prefix="")
    return hf, cfg, params


@pytest.mark.parametrize("parallel_residual", [True, False])
def test_last_hidden_parity(parallel_residual):
    hf, cfg, params = make_pair(parallel_residual=parallel_residual)
    rng = np.random.default_rng(0)
    b, t, h = 2, 11, cfg.hidden_size
    embeds = rng.normal(size=(b, t, h)).astype(np.float32)
    # left padding on sample 0
    mask = np.ones((b, t), dtype=np.int64)
    mask[0, :3] = 0

    with torch.no_grad():
        ref = hf(
            inputs_embeds=torch.tensor(embeds),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()

    out = gpt_neox.apply(
        params, cfg, jnp.asarray(embeds),
        attention_mask=jnp.asarray(mask),
        dtype=jnp.float32, attn_impl="xla",
    )["last_hidden_state"]
    got = np.asarray(out)
    # padded rows are garbage-but-defined in both; compare only valid rows
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], atol=2e-4, rtol=1e-3)


def test_hidden_states_match_hf_tuple():
    hf, cfg, params = make_pair()
    rng = np.random.default_rng(1)
    b, t, h = 2, 7, cfg.hidden_size
    embeds = rng.normal(size=(b, t, h)).astype(np.float32)

    with torch.no_grad():
        ref = hf(inputs_embeds=torch.tensor(embeds), output_hidden_states=True).hidden_states
    out = gpt_neox.apply(
        params, cfg, jnp.asarray(embeds),
        output_hidden_states=True, dtype=jnp.float32, attn_impl="xla",
    )["hidden_states"]
    assert out.shape[0] == len(ref) == cfg.num_hidden_layers + 1
    for i, r in enumerate(ref):
        np.testing.assert_allclose(np.asarray(out[i]), r.numpy(), atol=2e-4, rtol=1e-3)


def test_logits_parity_with_lm_head():
    hf, cfg, params = make_pair()
    rng = np.random.default_rng(2)
    lm_w = rng.normal(size=(cfg.vocab_size, cfg.hidden_size)).astype(np.float32) * 0.02
    params["embed_out"] = {"weight": jnp.asarray(lm_w)}
    embeds = rng.normal(size=(1, 5, cfg.hidden_size)).astype(np.float32)
    with torch.no_grad():
        hidden = hf(inputs_embeds=torch.tensor(embeds)).last_hidden_state
        ref = (hidden @ torch.tensor(lm_w).T).numpy()
    out = gpt_neox.apply(params, cfg, jnp.asarray(embeds), dtype=jnp.float32, attn_impl="xla")
    got = np.asarray(gpt_neox.logits(params, out["last_hidden_state"], dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_kv_cache_matches_full_forward():
    """Prefill+decode through the cache equals the no-cache forward."""
    _, cfg, params = make_pair()
    rng = np.random.default_rng(3)
    b, t = 2, 9
    embeds = rng.normal(size=(b, t, cfg.hidden_size)).astype(np.float32)
    mask = np.ones((b, t), dtype=np.int32)
    mask[1, :2] = 0

    full = gpt_neox.apply(
        params, cfg, jnp.asarray(embeds), attention_mask=jnp.asarray(mask),
        dtype=jnp.float32, attn_impl="xla",
    )["last_hidden_state"]

    max_len = 12
    cache = gpt_neox.KVCache.create(cfg, b, max_len, dtype=jnp.float32)
    buf_mask = np.zeros((b, max_len), np.int32)
    buf_mask[:, :t] = mask
    # prefill first 6, then 3 single steps
    out = gpt_neox.apply(
        params, cfg, jnp.asarray(embeds[:, :6]),
        attention_mask=jnp.asarray(buf_mask), cache=cache,
        dtype=jnp.float32, attn_impl="xla",
    )
    cache = out["cache"]
    pieces = [np.asarray(out["last_hidden_state"])]
    for i in range(6, t):
        out = gpt_neox.apply(
            params, cfg, jnp.asarray(embeds[:, i : i + 1]),
            attention_mask=jnp.asarray(buf_mask), cache=cache,
            dtype=jnp.float32, attn_impl="xla",
        )
        cache = out["cache"]
        pieces.append(np.asarray(out["last_hidden_state"]))
    step = np.concatenate(pieces, axis=1)
    valid = mask.astype(bool)
    np.testing.assert_allclose(step[valid], np.asarray(full)[valid], atol=2e-4, rtol=1e-3)


def test_num_layers_truncation_matches_full_prefix():
    """Teacher early exit: hs[0..k] of a k-layer truncated run equal the full
    run's prefix (the post-final-LN overwrite only touches the full run's
    last entry, which truncation never reaches)."""
    import jax

    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=48,
    )
    params = gpt_neox.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.normal(size=(2, 7, 32)).astype(np.float32))
    mask = jnp.asarray(np.ones((2, 7), np.int32))

    full = gpt_neox.apply(
        params, cfg, embeds, attention_mask=mask, output_hidden_states=True,
        dtype=jnp.float32, attn_impl="xla",
    )["hidden_states"]
    k = 2
    trunc = gpt_neox.apply(
        params, cfg, embeds, attention_mask=mask, output_hidden_states=True,
        dtype=jnp.float32, attn_impl="xla", num_layers=k,
    )["hidden_states"]
    assert trunc.shape[0] == k + 1
    np.testing.assert_allclose(np.asarray(trunc), np.asarray(full[: k + 1]), atol=1e-6)
