"""VL-Pythia: frozen EVA-02 encoder + MLP projector + GPT-NeoX decoder.

Combinator semantics follow mafed/model/vl_pythia.py:204-326:
  * vision features = EVA-02 forward_features with CLS dropped
    ("patch" feature select, :463-475) -> 256 tokens
  * 2-layer MLP projector Linear-GELU-Linear (:226-234)
  * inputs_embeds = concat([projected vision, embed_in(input_ids)], axis=1)
    — vision FIRST (:281-292); attention_mask gets 256 leading ones
  * logits = embed_out(hidden); loss = length-normalized CE (:44-96):
    slice logits to the labels' length, shift, per-sample mean over valid
    (non -100) positions, then mean over the batch.

The vision encoder is frozen in every reference config
(vqa_cont_learner.py:201-203), so its params are held in bf16 behind
stop_gradient and the whole vision+projector+decoder forward is one jit
region.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mafed_tpu.constants import IGNORE_INDEX, NUM_VISION_TOKENS
from mafed_tpu.core.config import ModelConfig
from mafed_tpu.models import eva02, gpt_neox


def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.float32, vision_dtype=jnp.bfloat16) -> Dict[str, Any]:
    k_dec, k_vis, k_p1, k_p2 = jax.random.split(key, 4)
    d_vis, h = cfg.vision.embed_dim, cfg.hidden_size
    std = cfg.initializer_range
    return {
        "decoder": gpt_neox.init_params(cfg, k_dec, dtype=dtype),
        "vision": eva02.init_params(cfg.vision, k_vis, dtype=vision_dtype),
        "projector": {
            "fc1": {
                "weight": (jax.random.normal(k_p1, (d_vis, h)) * std).astype(dtype),
                "bias": jnp.zeros((h,), dtype),
            },
            "fc2": {
                "weight": (jax.random.normal(k_p2, (h, h)) * std).astype(dtype),
                "bias": jnp.zeros((h,), dtype),
            },
        },
    }


def trainable_mask(params: Dict[str, Any]) -> Dict[str, Any]:
    """Pytree of bools: vision encoder frozen, everything else trainable."""
    def mark(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        return "vision" not in names

    return jax.tree_util.tree_map_with_path(mark, params)


def masked_mean(vector: jax.Array, mask: jax.Array, axis: int) -> jax.Array:
    """AllenNLP-style masked mean (vl_pythia.py:44-61): sum/clamped-count."""
    vector = jnp.where(mask, vector, 0.0)
    value_sum = jnp.sum(vector, axis=axis)
    value_count = jnp.sum(mask, axis=axis).astype(jnp.float32)
    return value_sum / jnp.maximum(value_count, 1e-13)


def average_task_loss(labels: jax.Array, logits: jax.Array) -> jax.Array:
    """Per-sample length-normalized CE, then batch mean (vl_pythia.py:64-83)."""
    logits32 = logits.astype(jnp.float32)
    mask = labels != IGNORE_INDEX
    safe_labels = jnp.where(mask, labels, 0)
    logprobs = jax.nn.log_softmax(logits32, axis=-1)
    tok_loss = -jnp.take_along_axis(logprobs, safe_labels[..., None], axis=-1)[..., 0]
    per_sample = masked_mean(tok_loss, mask, axis=-1)
    return jnp.mean(per_sample)


def compute_loss(labels: jax.Array, logits: jax.Array) -> jax.Array:
    """Slice logits to label length, shift, average (vl_pythia.py:86-96)."""
    label_len = labels.shape[1]
    logits = logits[:, -label_len:, :]
    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    return average_task_loss(shift_labels, shift_logits)


class VLPythiaOutput(NamedTuple):
    loss: Optional[jax.Array]
    logits: jax.Array
    # [L+1, B, 256+T, H] when requested (last entry post-final-LN, HF-style);
    # [num_layers+1, ...] raw residual taps when forward() truncated the stack
    hidden_states: Optional[jax.Array]
    cache: Optional[gpt_neox.KVCache]


def get_patch_embeddings(
    params: Dict[str, Any],
    cfg: ModelConfig,
    pixel_values: jax.Array,
    *,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
) -> jax.Array:
    """Frozen vision features with CLS dropped -> [B, N, d_vis].

    EVA-02 uses forward_features output; CLIP backbones select
    hidden_states[select_layer] like the reference (vl_pythia.py:453-475).
    """
    if cfg.vision.backbone == "clip":
        from mafed_tpu.models import clip_vit

        hs = clip_vit.forward_hidden_states(
            params["vision"], cfg.vision, pixel_values, dtype=dtype, attn_impl=attn_impl
        )
        feats = hs[cfg.select_layer]
    else:
        feats = eva02.forward_features(params["vision"], cfg.vision, pixel_values, dtype=dtype, attn_impl=attn_impl)
    if cfg.select_feature == "patch":
        feats = feats[:, 1:]
    elif cfg.select_feature != "cls_patch":
        raise ValueError(f"Unexpected select feature: {cfg.select_feature}")
    return jax.lax.stop_gradient(feats)


def n_vision_tokens(cfg: ModelConfig) -> int:
    """Sequence length of the vision prefix: num_patches, plus the CLS token
    unless select_feature == "patch" drops it (get_patch_embeddings above).
    The ONE derivation — cache shapes (teacher_cache.teacher_seq_len),
    metric token counts, and dryrun shapes all consume this; drifting copies
    would silently disagree with the model's actual sequence length."""
    return cfg.vision.num_patches + (0 if cfg.select_feature == "patch" else 1)


def project_vision(params: Dict[str, Any], patch_embeddings: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    p = params["projector"]
    x = patch_embeddings.astype(dtype) @ p["fc1"]["weight"].astype(dtype) + p["fc1"]["bias"].astype(dtype)
    x = jax.nn.gelu(x, approximate=False)
    return x @ p["fc2"]["weight"].astype(dtype) + p["fc2"]["bias"].astype(dtype)


def build_inputs(
    params: Dict[str, Any],
    cfg: ModelConfig,
    input_ids: jax.Array,
    pixel_values: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
    patch_embeddings: Optional[jax.Array] = None,
    *,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    vision_attn_impl: Optional[str] = None,
) -> tuple:
    """Vision-first concat of embeddings + extended mask (vl_pythia.py:267-292)."""
    if patch_embeddings is None:
        patch_embeddings = get_patch_embeddings(
            params, cfg, pixel_values, dtype=dtype,
            attn_impl=attn_impl if vision_attn_impl is None else vision_attn_impl,
        )
    vis_embeds = project_vision(params, patch_embeddings, dtype=dtype)
    batch, n_vis = vis_embeds.shape[:2]
    txt_embeds = gpt_neox.embed(params["decoder"], input_ids, dtype=dtype)
    inputs_embeds = jnp.concatenate([vis_embeds, txt_embeds], axis=1)
    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)
    full_mask = jnp.concatenate(
        [jnp.ones((batch, n_vis), attention_mask.dtype), attention_mask], axis=1
    )
    return inputs_embeds, full_mask


def forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    input_ids: jax.Array,
    pixel_values: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    *,
    patch_embeddings: Optional[jax.Array] = None,
    output_hidden_states: bool = False,
    hidden_perturbation: Optional[jax.Array] = None,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    vision_attn_impl: Optional[str] = None,
    loss_only: bool = False,
    need_logits: bool = True,
    num_layers: Optional[int] = None,
    remat_layers: bool = False,
    remat_policy=None,
    label_tail: Optional[int] = None,
) -> VLPythiaOutput:
    """Full training/eval forward (no KV cache; see evaluation.decode for that).

    vision_attn_impl: the frozen vision tower is never differentiated, so it
    may use XLA's fused attention (faster forward) while the decoder keeps
    the flash kernel (whose custom VJP keeps backward memory bounded).

    loss_only (training fast path): project embed_out only over the last
    label_len positions — the loss slices logits there anyway
    (vl_pythia.py:89), and the full [B, T, 50304] projection (fwd+bwd) plus
    its activation is ~4x the needed work at VQA shapes. Returned logits
    then cover only those positions.

    num_layers: early-exit the decoder after this many blocks (teacher fast
    path — distillation never reads hidden_states beyond index L-2; see
    gpt_neox.apply). Requires need_logits=False and labels=None.

    label_tail (with loss_only + labels): restrict the lm_head + CE to the
    last `label_tail` positions. Under the CL data layout the supervised
    answer⊕EOS is a SUFFIX of the left-padded text (vqa_dataset labels are
    -100 elsewhere), so the loss is bit-identical as long as every row's
    valid labels fit in the last label_tail-1 positions — enforced by
    collate_train. Cuts the [B, T, 50304] projection (fwd+bwd) to the
    answer region (~60% less lm_head work at VQA shapes).
    """
    inputs_embeds, full_mask = build_inputs(
        params, cfg, input_ids, pixel_values, attention_mask,
        patch_embeddings=patch_embeddings, dtype=dtype, attn_impl=attn_impl,
        vision_attn_impl=vision_attn_impl,
    )
    if num_layers is not None and (need_logits or labels is not None):
        raise ValueError("num_layers truncation skips the final LN: logits/loss unavailable")
    if hidden_perturbation is not None:
        inputs_embeds = inputs_embeds + hidden_perturbation[0].astype(inputs_embeds.dtype)
        layer_pert = hidden_perturbation[1:]
    else:
        layer_pert = None

    dec = gpt_neox.apply(
        params["decoder"], cfg, inputs_embeds,
        attention_mask=full_mask,
        output_hidden_states=output_hidden_states or layer_pert is not None,
        dtype=dtype, attn_impl=attn_impl,
        layer_perturbation=layer_pert,
        num_layers=num_layers,
        remat=remat_layers,
        remat_policy=remat_policy,
    )
    hidden = dec["last_hidden_state"]
    if not need_logits and labels is None:
        # e.g. the distillation teacher: only hidden_states are consumed
        return VLPythiaOutput(loss=None, logits=None, hidden_states=dec.get("hidden_states"), cache=None)
    if loss_only and labels is not None:
        if label_tail is not None and 0 < label_tail < labels.shape[1]:
            labels = labels[:, -label_tail:]
        hidden = hidden[:, -labels.shape[1]:]
    lm_logits = gpt_neox.logits(params["decoder"], hidden, dtype=dtype)
    loss = compute_loss(labels, lm_logits) if labels is not None else None
    return VLPythiaOutput(
        loss=loss,
        logits=lm_logits,
        hidden_states=dec.get("hidden_states"),
        cache=None,
    )


class VLPythia:
    """Thin OO wrapper bundling config + params for trainer/eval ergonomics."""

    def __init__(self, cfg: ModelConfig, params: Dict[str, Any]):
        self.cfg = cfg
        self.params = params

    @classmethod
    def init(cls, cfg: ModelConfig, seed: int = 0, dtype=jnp.float32) -> "VLPythia":
        return cls(cfg, init_params(cfg, jax.random.PRNGKey(seed), dtype=dtype))

    def __call__(self, **kwargs) -> VLPythiaOutput:
        return forward(self.params, self.cfg, **kwargs)
