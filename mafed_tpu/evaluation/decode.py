"""Jitted greedy decoding with a KV cache.

The reference generates VQA answers with HF greedy search, max_new_tokens=10
and use_cache=False — every new token recomputes the full 256+T prefix
(mafed/utils/eval_utils.py:161-195, the dominant eval cost; SURVEY.md §3.4).
Greedy decoding is cache-invariant, so the TPU build uses a KV cache: one
prefill over the prefix, then 10 single-token steps — all inside ONE jit
region via lax.scan (static shapes: cache length = prefix + max_new_tokens).

EOS semantics match HF: once a sequence emits EOS, subsequent positions are
filled with pad (= eos for Pythia), so decoded text is identical.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from mafed_tpu.constants import MAX_NEW_TOKENS
from mafed_tpu.core.config import ModelConfig
from mafed_tpu.data.images import prep_pixels
from mafed_tpu.models import gpt_neox, vl_pythia


def make_greedy_decoder(
    model_cfg: ModelConfig,
    *,
    max_new_tokens: int = MAX_NEW_TOKENS,
    eos_token_id: int = 0,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
) -> Callable:
    """Returns jitted fn(params, batch) -> [B, max_new_tokens] token ids."""

    @jax.jit
    def decode(params, batch: Dict[str, jax.Array]) -> jax.Array:
        input_ids = batch["input_ids"]
        attention_mask = batch["attention_mask"]
        b, txt_len = input_ids.shape
        patches = batch.get("patches")  # vision-cache steady state
        if patches is not None:
            patches = patches.astype(dtype)
            pixel_values = None
        else:
            pixel_values = prep_pixels(batch, model_cfg.vision, dtype)

        inputs_embeds, full_mask = vl_pythia.build_inputs(
            params, model_cfg, input_ids, pixel_values, attention_mask,
            patch_embeddings=patches,
            dtype=dtype, attn_impl=attn_impl,
            # inference-only vision pass: XLA fused attention is fastest here
            vision_attn_impl="xla" if attn_impl == "auto" else attn_impl,
        )
        prefix_len = inputs_embeds.shape[1]  # n_vision_tokens + txt_len
        max_len = prefix_len + max_new_tokens

        # key-padding mask over the whole cache buffer: generated positions
        # are always valid
        buf_mask = jnp.concatenate(
            [full_mask, jnp.ones((b, max_new_tokens), full_mask.dtype)], axis=1
        )

        cache = gpt_neox.KVCache.create(model_cfg, b, max_len, dtype=dtype)
        out = gpt_neox.apply(
            params["decoder"], model_cfg, inputs_embeds,
            attention_mask=buf_mask, cache=cache, dtype=dtype, attn_impl=attn_impl,
        )
        cache = out["cache"]
        last_logits = gpt_neox.logits(
            params["decoder"], out["last_hidden_state"][:, -1:], dtype=dtype
        )[:, 0].astype(jnp.float32)
        first_tok = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)

        def scan_step(carry, _):
            cache, tok, finished = carry
            emit = jnp.where(finished, jnp.int32(eos_token_id), tok)
            embeds = gpt_neox.embed(params["decoder"], emit[:, None], dtype=dtype)
            out = gpt_neox.apply(
                params["decoder"], model_cfg, embeds,
                attention_mask=buf_mask, cache=cache, dtype=dtype, attn_impl=attn_impl,
            )
            logits = gpt_neox.logits(
                params["decoder"], out["last_hidden_state"], dtype=dtype
            )[:, 0].astype(jnp.float32)
            next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            finished = finished | (emit == eos_token_id)
            return (out["cache"], next_tok, finished), emit

        finished0 = jnp.zeros((b,), bool)
        (_, last_tok, finished), toks = jax.lax.scan(
            scan_step, (cache, first_tok, finished0), None, length=max_new_tokens - 1
        )
        last_emit = jnp.where(finished, jnp.int32(eos_token_id), last_tok)
        toks = jnp.concatenate([toks.T, last_emit[:, None]], axis=1)  # [B, max_new]
        return toks

    return decode
