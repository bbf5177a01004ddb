"""GPT-NeoX (Pythia) decoder — pure-functional JAX, TPU-first.

Numerical semantics match HF ``GPTNeoXModel`` (the decoder used by the
reference at mafed/model/vl_pythia.py:212,298-308): partial rotary
(rotary_pct of head_dim, rotate-half convention), parallel residual,
biased QKV in HF's per-head-interleaved fused layout, untied ``embed_out``.

TPU-first choices:
  * layer params are stacked along a leading [L, ...] axis and the layer
    stack runs under ``lax.scan`` — O(1) compile time in depth, and the
    per-layer hidden states needed by feature distillation fall out of the
    scan's ys without Python-level hooks.
  * layernorms in float32; matmuls in the caller-chosen compute dtype
    (bf16 on TPU); attention via the Pallas flash kernel.
  * KV cache as a preallocated [L, B, H, Tmax, D] buffer updated with
    dynamic_update_slice — static shapes under jit for greedy decode.

Weights are stored in jax layout ([in, out] for matmul right-operands);
the safetensors loader transposes from torch layout.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mafed_tpu.core.config import ModelConfig
from mafed_tpu.kernels.attention import dot_product_attention


class KVCache(NamedTuple):
    k: jax.Array  # [L, B, H, Tmax, D]
    v: jax.Array  # [L, B, H, Tmax, D]
    length: jax.Array  # scalar int32: number of valid positions

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_hidden_layers, batch, cfg.num_attention_heads, max_len, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32))


def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    """Random init mirroring HF's normal(0, initializer_range)."""
    h, l = cfg.hidden_size, cfg.num_hidden_layers
    inter = cfg.intermediate_size
    std = cfg.initializer_range
    keys = jax.random.split(key, 8)

    def normal(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    def stacked_normal(k, shape):
        return (jax.random.normal(k, (l, *shape)) * std).astype(dtype)

    zeros = lambda shape: jnp.zeros((l, *shape), dtype)
    ones = lambda shape: jnp.ones((l, *shape), dtype)

    return {
        "embed_in": {"weight": normal(keys[0], (cfg.vocab_size, h))},
        "layers": {
            "input_layernorm": {"weight": ones((h,)), "bias": zeros((h,))},
            "post_attention_layernorm": {"weight": ones((h,)), "bias": zeros((h,))},
            "attention": {
                "query_key_value": {"weight": stacked_normal(keys[1], (h, 3 * h)), "bias": zeros((3 * h,))},
                "dense": {"weight": stacked_normal(keys[2], (h, h)), "bias": zeros((h,))},
            },
            "mlp": {
                "dense_h_to_4h": {"weight": stacked_normal(keys[3], (h, inter)), "bias": zeros((inter,))},
                "dense_4h_to_h": {"weight": stacked_normal(keys[4], (inter, h)), "bias": zeros((h,))},
            },
        },
        "final_layer_norm": {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
        "embed_out": {"weight": normal(keys[5], (cfg.vocab_size, h))},
    }


def _layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def rotary_tables(cfg: ModelConfig, positions: jax.Array) -> tuple:
    """cos/sin tables for partial rotary. positions: [B, T] -> [B, T, rot]."""
    rot = cfg.rotary_ndims
    inv_freq = 1.0 / (cfg.rotary_emb_base ** (jnp.arange(0, rot, 2, dtype=jnp.float32) / rot))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [B, T, rot/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [B, T, rot]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_rotary(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array, rot: int) -> tuple:
    """Partial rotary on the first `rot` dims. q/k: [B, H, T, D]; cos/sin [B, T, rot]."""
    cos = cos[:, None].astype(q.dtype)
    sin = sin[:, None].astype(q.dtype)
    q_rot, q_pass = q[..., :rot], q[..., rot:]
    k_rot, k_pass = k[..., :rot], k[..., rot:]
    q_rot = q_rot * cos + _rotate_half(q_rot) * sin
    k_rot = k_rot * cos + _rotate_half(k_rot) * sin
    return (
        jnp.concatenate([q_rot, q_pass], axis=-1),
        jnp.concatenate([k_rot, k_pass], axis=-1),
    )


def apply(
    params: Dict[str, Any],
    cfg: ModelConfig,
    inputs_embeds: jax.Array,  # [B, T, H]
    *,
    attention_mask: Optional[jax.Array] = None,  # [B, T] 1=keep
    position_ids: Optional[jax.Array] = None,  # [B, T]
    output_hidden_states: bool = False,
    cache: Optional[KVCache] = None,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    layer_perturbation: Optional[jax.Array] = None,
    num_layers: Optional[int] = None,
    remat: bool = False,
    remat_policy=None,
) -> Dict[str, Any]:
    """Run the decoder stack over precomputed input embeddings.

    remat=True (no-cache path): per-layer rematerialization — the scan saves
    only each layer's carry ([L, B, T, H] bf16) and recomputes the layer's
    internals (qkv/attention/MLP activations, ~20x larger) during the
    backward pass, trading ~1 extra decoder forward for the residual memory.
    This is what makes fused accumulation windows (large effective batch)
    fit in HBM.

    remat_policy (with remat=True): a jax.checkpoint policy — e.g.
    save_only_these_names over the checkpoint_name tags 'qkv', 'attn_out',
    'mlp_up' below — that keeps SELECTED layer intermediates instead of
    recomputing everything, spending measured HBM headroom to cut the remat
    recompute FLOPs (see training/step.resolve_remat_policy).

    Returns {"last_hidden_state", "hidden_states" (optional, [L+1, B, T, H]
    matching HF's tuple: embeddings, per-layer outputs, final post-LN),
    "cache" (updated KVCache when one was passed)}.

    With a cache: inputs_embeds holds only the new positions; they are
    written at cache.length and attention covers the full cache buffer with
    positions >= the new length masked out.

    layer_perturbation ([L-1, B, T, H], no-cache path only): entry i is
    added to the output of layer i+1's residual stream — i.e. to HF's
    hidden_states[i+1]. Differentiating the loss w.r.t. a zero perturbation
    yields d(loss)/d(hidden_states[i+1]), the quantity the reference gets
    via torch.autograd.grad (distillation_loss_weights.py:122-131).

    num_layers (no-cache path only): run only the first num_layers blocks —
    an early exit for consumers that never read the deeper layers, e.g. the
    distillation teacher, whose hidden_states[0..L-2] are the only outputs
    used (methods/distillation.py:105-122 via train.py:133). When truncated,
    the final layer norm is skipped: hidden_states are raw residual-stream
    taps hs[0..num_layers] and last_hidden_state is the unnormalized carry.
    """
    batch, t_new, hidden = inputs_embeds.shape
    n_heads, head_dim, rot = cfg.num_attention_heads, cfg.head_dim, cfg.rotary_ndims
    eps = cfg.layer_norm_eps

    past = cache.length if cache is not None else jnp.zeros((), jnp.int32)
    if position_ids is None:
        # HF GPTNeoX default: absolute arange including left padding
        position_ids = past + jnp.arange(t_new, dtype=jnp.int32)[None, :]
        position_ids = jnp.broadcast_to(position_ids, (batch, t_new))
    cos, sin = rotary_tables(cfg, position_ids)

    if cache is not None:
        max_len = cache.k.shape[3]
        # key padding over the full cache buffer
        valid = jnp.arange(max_len)[None, :] < (past + t_new)
        if attention_mask is not None:
            key_mask = (valid & (attention_mask > 0)).astype(jnp.int32)
        else:
            key_mask = valid.astype(jnp.int32)
    else:
        key_mask = attention_mask.astype(jnp.int32) if attention_mask is not None else None

    h = inputs_embeds.astype(dtype)

    layer_params = params["layers"]
    truncated = num_layers is not None and num_layers < cfg.num_hidden_layers
    if truncated:
        if num_layers < 0:
            raise ValueError(f"num_layers must be >= 0, got {num_layers}")
        if cache is not None or layer_perturbation is not None:
            raise ValueError("num_layers truncation is for the plain forward path")
        layer_params = jax.tree.map(lambda x: x[:num_layers], layer_params)

    def _finish_layer(h, attn_out, lp, pert, new_cache):
        if cfg.use_parallel_residual:
            ln2 = _layer_norm(h, lp["post_attention_layernorm"]["weight"], lp["post_attention_layernorm"]["bias"], eps)
            mlp_in = ln2
        else:
            h = h + attn_out
            ln2 = _layer_norm(h, lp["post_attention_layernorm"]["weight"], lp["post_attention_layernorm"]["bias"], eps)
            mlp_in = ln2
        up = mlp_in @ lp["mlp"]["dense_h_to_4h"]["weight"].astype(dtype) + lp["mlp"]["dense_h_to_4h"]["bias"].astype(dtype)
        up = checkpoint_name(up, "mlp_up")
        act = jax.nn.gelu(up, approximate=False)
        down = act @ lp["mlp"]["dense_4h_to_h"]["weight"].astype(dtype) + lp["mlp"]["dense_4h_to_h"]["bias"].astype(dtype)

        if cfg.use_parallel_residual:
            h_new = h + attn_out + down
        else:
            h_new = h + down
        if pert is not None:
            h_new = h_new + pert.astype(h_new.dtype)
        return h_new, (h_new, new_cache)

    from jax.ad_checkpoint import checkpoint_name

    def layer_fn(carry, xs):
        h = carry
        lp, layer_cache, pert = xs
        ln1 = _layer_norm(h, lp["input_layernorm"]["weight"], lp["input_layernorm"]["bias"], eps)
        qkv = ln1 @ lp["attention"]["query_key_value"]["weight"].astype(dtype)
        qkv = qkv + lp["attention"]["query_key_value"]["bias"].astype(dtype)
        # identity outside a policy'd jax.checkpoint; saveable tap inside
        qkv = checkpoint_name(qkv, "qkv")
        # HF fused layout: [..., heads, 3*head_dim]
        qkv = qkv.reshape(batch, t_new, n_heads, 3 * head_dim)
        # NOTE: a BTHD fast path (skipping these transposes via
        # kernels.attention.xla_attention_bthd) was measured at +0.5%
        # step time but ~3x XLA compile time — not worth it; see
        # docs/ARCHITECTURE.md negative results.
        q = qkv[..., :head_dim].transpose(0, 2, 1, 3)
        k = qkv[..., head_dim : 2 * head_dim].transpose(0, 2, 1, 3)
        v = qkv[..., 2 * head_dim :].transpose(0, 2, 1, 3)
        q, k = _apply_rotary(q, k, cos, sin, rot)

        if layer_cache is not None:
            ck, cv = layer_cache
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, past, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, past, 0))
            attn_out = dot_product_attention(
                q, ck.astype(dtype), cv.astype(dtype),
                key_padding_mask=key_mask, causal=True, causal_offset=past,
                impl=attn_impl,
            )
            new_cache = (ck, cv)
        else:
            attn_out = dot_product_attention(
                q, k, v, key_padding_mask=key_mask, causal=True, impl=attn_impl,
            )
            new_cache = None

        attn_out = attn_out.transpose(0, 2, 1, 3).reshape(batch, t_new, hidden)
        attn_out = attn_out @ lp["attention"]["dense"]["weight"].astype(dtype)
        attn_out = attn_out + lp["attention"]["dense"]["bias"].astype(dtype)
        attn_out = checkpoint_name(attn_out, "attn_out")
        return _finish_layer(h, attn_out, lp, pert, new_cache)

    if cache is not None:
        def layer_fn_cached(carry, xs):
            lp, layer_cache = xs
            return layer_fn(carry, (lp, layer_cache, None))

        xs = (layer_params, (cache.k, cache.v))
        h_final, (layer_outs, new_caches) = jax.lax.scan(layer_fn_cached, h, xs)
        new_cache = KVCache(new_caches[0], new_caches[1], past + t_new)
    else:
        if layer_perturbation is not None:
            # pad: the last layer's output (pre-final-LN) gets no perturbation
            pert_full = jnp.concatenate(
                [layer_perturbation, jnp.zeros_like(layer_perturbation[:1])], axis=0
            )

            def layer_fn_pert(carry, xs):
                lp, pert = xs
                return layer_fn(carry, (lp, None, pert))

            h_final, (layer_outs, _) = jax.lax.scan(layer_fn_pert, h, (layer_params, pert_full))
        else:
            def layer_fn_nocache(carry, lp):
                return layer_fn(carry, (lp, None, None))

            if remat:
                # prevent_cse is safe (and needed for speed) under scan
                layer_fn_nocache = jax.checkpoint(
                    layer_fn_nocache, prevent_cse=False, policy=remat_policy
                )
            h_final, (layer_outs, _) = jax.lax.scan(layer_fn_nocache, h, layer_params)
        new_cache = None

    if truncated:
        out: Dict[str, Any] = {"last_hidden_state": h_final, "cache": new_cache}
        if output_hidden_states:
            out["hidden_states"] = jnp.concatenate([h[None], layer_outs], axis=0)
        return out

    last = _layer_norm(h_final, params["final_layer_norm"]["weight"], params["final_layer_norm"]["bias"], eps)

    out: Dict[str, Any] = {"last_hidden_state": last, "cache": new_cache}
    if output_hidden_states:
        # HF tuple: [embeddings, out_1..out_{L-1}, final_layer_norm(out_L)]
        hs = jnp.concatenate([h[None], layer_outs], axis=0)
        hs = hs.at[-1].set(last)
        out["hidden_states"] = hs
    return out


def logits(params: Dict[str, Any], hidden: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """embed_out projection (untied; vl_pythia.py:213,310)."""
    return hidden.astype(dtype) @ params["embed_out"]["weight"].astype(dtype).T


def embed(params: Dict[str, Any], input_ids: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return params["embed_in"]["weight"].astype(dtype)[input_ids]
