"""Checkpoint interop: reference torch/safetensors names <-> param pytrees.

The reference ships base models as HF safetensors (single or sharded) or
``pytorch_model.bin`` (mafed/model/vl_pythia.py:385-451) with keys like

    gpt_neox.embed_in.weight
    gpt_neox.layers.N.{input_layernorm,post_attention_layernorm}.{weight,bias}
    gpt_neox.layers.N.attention.{query_key_value,dense}.{weight,bias}
    gpt_neox.layers.N.mlp.{dense_h_to_4h,dense_4h_to_h}.{weight,bias}
    gpt_neox.final_layer_norm.{weight,bias}
    embed_out.weight
    vision_embed_tokens.{0,2}.{weight,bias}          (MLP projector)
    vision_encoder.<timm Eva names>                  (patch_embed.proj, cls_token,
                                                      pos_embed, blocks.N.*, norm)

This module converts both directions:
  * torch layout [out, in] -> jax layout [in, out] (transpose) on import
  * per-layer tensors stacked along a leading [L, ...] axis (for lax.scan)
  * conv patch-embed kernels OIHW -> HWIO

Export writes a reference-compatible ``model.safetensors`` so checkpoints
round-trip into the reference's own loader (checkpoint-format parity per
BASELINE.json).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from mafed_tpu.core.config import ModelConfig


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        if t.dtype.__str__() == "torch.bfloat16":
            t = t.float()
        return t.numpy()
    return np.asarray(t)


_LAYER_RE = re.compile(r"^(?:gpt_neox\.)?layers\.(\d+)\.(.+)$")
_BLOCK_RE = re.compile(r"^blocks\.(\d+)\.(.+)$")


def _stack(layers: Dict[int, np.ndarray], n: int, name: str) -> np.ndarray:
    missing = [i for i in range(n) if i not in layers]
    if missing:
        raise KeyError(f"missing layers {missing} for {name}")
    return np.stack([layers[i] for i in range(n)], axis=0)


def convert_decoder_state_dict(state_dict: Dict[str, Any], cfg: ModelConfig, prefix: str = "gpt_neox.") -> Dict[str, Any]:
    """HF GPTNeoX state dict -> stacked jax param tree (decoder subtree)."""
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    n = cfg.num_hidden_layers

    def get(name):
        for key in (prefix + name, name):
            if key in sd:
                return sd[key]
        raise KeyError(f"{prefix}{name} not in state dict")

    per_layer: Dict[str, Dict[int, np.ndarray]] = {}
    for key, val in sd.items():
        if key.startswith(prefix):
            key_nop = key[len(prefix):]
        else:
            key_nop = key
        m = re.match(r"^layers\.(\d+)\.(.+)$", key_nop)
        if m:
            idx, rest = int(m.group(1)), m.group(2)
            per_layer.setdefault(rest, {})[idx] = val

    def layer(name, transpose=False):
        arr = _stack(per_layer[name], n, name)
        if transpose:
            arr = arr.transpose(0, 2, 1)
        return jnp.asarray(arr)

    params = {
        "embed_in": {"weight": jnp.asarray(get("embed_in.weight"))},
        "layers": {
            "input_layernorm": {
                "weight": layer("input_layernorm.weight"),
                "bias": layer("input_layernorm.bias"),
            },
            "post_attention_layernorm": {
                "weight": layer("post_attention_layernorm.weight"),
                "bias": layer("post_attention_layernorm.bias"),
            },
            "attention": {
                "query_key_value": {
                    "weight": layer("attention.query_key_value.weight", transpose=True),
                    "bias": layer("attention.query_key_value.bias"),
                },
                "dense": {
                    "weight": layer("attention.dense.weight", transpose=True),
                    "bias": layer("attention.dense.bias"),
                },
            },
            "mlp": {
                "dense_h_to_4h": {
                    "weight": layer("mlp.dense_h_to_4h.weight", transpose=True),
                    "bias": layer("mlp.dense_h_to_4h.bias"),
                },
                "dense_4h_to_h": {
                    "weight": layer("mlp.dense_4h_to_h.weight", transpose=True),
                    "bias": layer("mlp.dense_4h_to_h.bias"),
                },
            },
        },
        "final_layer_norm": {
            "weight": jnp.asarray(get("final_layer_norm.weight")),
            "bias": jnp.asarray(get("final_layer_norm.bias")),
        },
    }
    # embed_out lives at top level in the composed model, inside for standalone
    for key in ("embed_out.weight", prefix + "embed_out.weight"):
        if key in sd:
            params["embed_out"] = {"weight": jnp.asarray(sd[key])}
            break
    return params


def convert_vision_state_dict(state_dict: Dict[str, Any], cfg: ModelConfig, prefix: str = "vision_encoder.") -> Dict[str, Any]:
    """timm Eva state dict -> stacked jax param tree (vision subtree)."""
    sd = {}
    for k, v in state_dict.items():
        if k.startswith(prefix):
            sd[k[len(prefix):]] = _to_np(v)
        elif not any(k.startswith(p) for p in ("gpt_neox.", "embed_out", "vision_embed_tokens")):
            sd[k] = _to_np(v)
    n = cfg.vision.depth

    per_block: Dict[str, Dict[int, np.ndarray]] = {}
    for key, val in sd.items():
        m = _BLOCK_RE.match(key)
        if m:
            per_block.setdefault(m.group(2), {})[int(m.group(1))] = val

    def block(name, transpose=False):
        arr = _stack(per_block[name], n, name)
        if transpose:
            arr = arr.transpose(0, 2, 1)
        return jnp.asarray(arr)

    conv_w = sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0)  # OIHW -> HWIO
    return {
        "patch_embed": {
            "proj": {"weight": jnp.asarray(conv_w), "bias": jnp.asarray(sd["patch_embed.proj.bias"])},
        },
        "cls_token": jnp.asarray(sd["cls_token"]),
        "pos_embed": jnp.asarray(sd["pos_embed"]),
        "blocks": {
            "norm1": {"weight": block("norm1.weight"), "bias": block("norm1.bias")},
            "norm2": {"weight": block("norm2.weight"), "bias": block("norm2.bias")},
            "attn": {
                "q_proj": {"weight": block("attn.q_proj.weight", transpose=True), "bias": block("attn.q_proj.bias")},
                "k_proj": {"weight": block("attn.k_proj.weight", transpose=True)},
                "v_proj": {"weight": block("attn.v_proj.weight", transpose=True), "bias": block("attn.v_proj.bias")},
                "norm": {"weight": block("attn.norm.weight"), "bias": block("attn.norm.bias")},
                "proj": {"weight": block("attn.proj.weight", transpose=True), "bias": block("attn.proj.bias")},
            },
            "mlp": {
                "fc1_g": {"weight": block("mlp.fc1_g.weight", transpose=True), "bias": block("mlp.fc1_g.bias")},
                "fc1_x": {"weight": block("mlp.fc1_x.weight", transpose=True), "bias": block("mlp.fc1_x.bias")},
                "norm": {"weight": block("mlp.norm.weight"), "bias": block("mlp.norm.bias")},
                "fc2": {"weight": block("mlp.fc2.weight", transpose=True), "bias": block("mlp.fc2.bias")},
            },
        },
        "norm": {"weight": jnp.asarray(sd["norm.weight"]), "bias": jnp.asarray(sd["norm.bias"])},
    }


def convert_vl_state_dict(state_dict: Dict[str, Any], cfg: ModelConfig) -> Dict[str, Any]:
    """Full VL-Pythia torch state dict -> param pytree."""
    sd = {k: v for k, v in state_dict.items()}
    params = {
        "decoder": convert_decoder_state_dict(sd, cfg),
        "vision": convert_vision_state_dict(sd, cfg),
        "projector": {
            "fc1": {
                "weight": jnp.asarray(_to_np(sd["vision_embed_tokens.0.weight"]).T),
                "bias": jnp.asarray(_to_np(sd["vision_embed_tokens.0.bias"])),
            },
            "fc2": {
                "weight": jnp.asarray(_to_np(sd["vision_embed_tokens.2.weight"]).T),
                "bias": jnp.asarray(_to_np(sd["vision_embed_tokens.2.bias"])),
            },
        },
    }
    return params


def load_pretrained(model_dir: str, cfg: Optional[ModelConfig] = None) -> tuple:
    """Load a reference-format model directory (config.json + safetensors/bin).

    Mirrors the fallback chain of vl_pythia.py:399-451: single safetensors,
    sharded safetensors, then pytorch_model.bin.
    """
    import json

    cfg_path = os.path.join(model_dir, "config.json")
    if cfg is None:
        cfg = ModelConfig.from_json(cfg_path) if os.path.exists(cfg_path) else ModelConfig()

    sd: Dict[str, Any] = {}
    single = os.path.join(model_dir, "model.safetensors")
    shards = sorted(
        f for f in os.listdir(model_dir)
        if f.endswith(".safetensors") and f != "model.safetensors"
    ) if os.path.isdir(model_dir) else []
    if os.path.exists(single):
        from safetensors.numpy import load_file

        sd = dict(load_file(single))
    elif shards:
        from safetensors.numpy import load_file

        for shard in shards:
            sd.update(load_file(os.path.join(model_dir, shard)))
    elif os.path.exists(os.path.join(model_dir, "pytorch_model.bin")):
        # stdlib zipfile+pickle reader — no torch dependency (bin_reader.py)
        from mafed_tpu.models.bin_reader import load_torch_bin

        sd = load_torch_bin(os.path.join(model_dir, "pytorch_model.bin"))
    else:
        raise FileNotFoundError(f"no weights found under {model_dir}")
    return convert_vl_state_dict(sd, cfg), cfg


# ---------------------------------------------------------------------------
# Export (reference-compatible naming)
# ---------------------------------------------------------------------------

def params_to_reference_state_dict(params: Dict[str, Any], cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Param pytree -> flat numpy dict with the reference's torch names."""
    out: Dict[str, np.ndarray] = {}

    dec = params["decoder"]
    out["gpt_neox.embed_in.weight"] = np.asarray(dec["embed_in"]["weight"])
    out["embed_out.weight"] = np.asarray(dec["embed_out"]["weight"])
    out["gpt_neox.final_layer_norm.weight"] = np.asarray(dec["final_layer_norm"]["weight"])
    out["gpt_neox.final_layer_norm.bias"] = np.asarray(dec["final_layer_norm"]["bias"])
    lp = dec["layers"]
    n = cfg.num_hidden_layers
    for i in range(n):
        base = f"gpt_neox.layers.{i}."
        out[base + "input_layernorm.weight"] = np.asarray(lp["input_layernorm"]["weight"][i])
        out[base + "input_layernorm.bias"] = np.asarray(lp["input_layernorm"]["bias"][i])
        out[base + "post_attention_layernorm.weight"] = np.asarray(lp["post_attention_layernorm"]["weight"][i])
        out[base + "post_attention_layernorm.bias"] = np.asarray(lp["post_attention_layernorm"]["bias"][i])
        out[base + "attention.query_key_value.weight"] = np.asarray(lp["attention"]["query_key_value"]["weight"][i]).T
        out[base + "attention.query_key_value.bias"] = np.asarray(lp["attention"]["query_key_value"]["bias"][i])
        out[base + "attention.dense.weight"] = np.asarray(lp["attention"]["dense"]["weight"][i]).T
        out[base + "attention.dense.bias"] = np.asarray(lp["attention"]["dense"]["bias"][i])
        out[base + "mlp.dense_h_to_4h.weight"] = np.asarray(lp["mlp"]["dense_h_to_4h"]["weight"][i]).T
        out[base + "mlp.dense_h_to_4h.bias"] = np.asarray(lp["mlp"]["dense_h_to_4h"]["bias"][i])
        out[base + "mlp.dense_4h_to_h.weight"] = np.asarray(lp["mlp"]["dense_4h_to_h"]["weight"][i]).T
        out[base + "mlp.dense_4h_to_h.bias"] = np.asarray(lp["mlp"]["dense_4h_to_h"]["bias"][i])

    proj = params["projector"]
    out["vision_embed_tokens.0.weight"] = np.asarray(proj["fc1"]["weight"]).T
    out["vision_embed_tokens.0.bias"] = np.asarray(proj["fc1"]["bias"])
    out["vision_embed_tokens.2.weight"] = np.asarray(proj["fc2"]["weight"]).T
    out["vision_embed_tokens.2.bias"] = np.asarray(proj["fc2"]["bias"])

    vis = params["vision"]
    out["vision_encoder.patch_embed.proj.weight"] = np.asarray(vis["patch_embed"]["proj"]["weight"]).transpose(3, 2, 0, 1)
    out["vision_encoder.patch_embed.proj.bias"] = np.asarray(vis["patch_embed"]["proj"]["bias"])
    out["vision_encoder.cls_token"] = np.asarray(vis["cls_token"])
    out["vision_encoder.pos_embed"] = np.asarray(vis["pos_embed"])
    out["vision_encoder.norm.weight"] = np.asarray(vis["norm"]["weight"])
    out["vision_encoder.norm.bias"] = np.asarray(vis["norm"]["bias"])
    bp = vis["blocks"]
    for i in range(cfg.vision.depth):
        base = f"vision_encoder.blocks.{i}."
        out[base + "norm1.weight"] = np.asarray(bp["norm1"]["weight"][i])
        out[base + "norm1.bias"] = np.asarray(bp["norm1"]["bias"][i])
        out[base + "norm2.weight"] = np.asarray(bp["norm2"]["weight"][i])
        out[base + "norm2.bias"] = np.asarray(bp["norm2"]["bias"][i])
        out[base + "attn.q_proj.weight"] = np.asarray(bp["attn"]["q_proj"]["weight"][i]).T
        out[base + "attn.q_proj.bias"] = np.asarray(bp["attn"]["q_proj"]["bias"][i])
        out[base + "attn.k_proj.weight"] = np.asarray(bp["attn"]["k_proj"]["weight"][i]).T
        out[base + "attn.v_proj.weight"] = np.asarray(bp["attn"]["v_proj"]["weight"][i]).T
        out[base + "attn.v_proj.bias"] = np.asarray(bp["attn"]["v_proj"]["bias"][i])
        out[base + "attn.norm.weight"] = np.asarray(bp["attn"]["norm"]["weight"][i])
        out[base + "attn.norm.bias"] = np.asarray(bp["attn"]["norm"]["bias"][i])
        out[base + "attn.proj.weight"] = np.asarray(bp["attn"]["proj"]["weight"][i]).T
        out[base + "attn.proj.bias"] = np.asarray(bp["attn"]["proj"]["bias"][i])
        out[base + "mlp.fc1_g.weight"] = np.asarray(bp["mlp"]["fc1_g"]["weight"][i]).T
        out[base + "mlp.fc1_g.bias"] = np.asarray(bp["mlp"]["fc1_g"]["bias"][i])
        out[base + "mlp.fc1_x.weight"] = np.asarray(bp["mlp"]["fc1_x"]["weight"][i]).T
        out[base + "mlp.fc1_x.bias"] = np.asarray(bp["mlp"]["fc1_x"]["bias"][i])
        out[base + "mlp.norm.weight"] = np.asarray(bp["mlp"]["norm"]["weight"][i])
        out[base + "mlp.norm.bias"] = np.asarray(bp["mlp"]["norm"]["bias"][i])
        out[base + "mlp.fc2.weight"] = np.asarray(bp["mlp"]["fc2"]["weight"][i]).T
        out[base + "mlp.fc2.bias"] = np.asarray(bp["mlp"]["fc2"]["bias"][i])
    return out


def save_reference_safetensors(params: Dict[str, Any], cfg: ModelConfig, path: str) -> None:
    """Write a reference-loadable model.safetensors checkpoint."""
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    sd = params_to_reference_state_dict(params, cfg)

    def savable(v: np.ndarray) -> np.ndarray:
        if v.dtype.name == "bfloat16":  # safetensors.numpy can't hold bf16
            v = v.astype(np.float32)
        return np.ascontiguousarray(v)

    save_file({k: savable(v) for k, v in sd.items()}, path)
