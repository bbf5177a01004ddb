"""CLIP ViT vision encoder — pure-functional JAX.

The reference supports CLIP backbones besides EVA-02
(build_vision_encoder, vl_pythia.py:177-201; feature selection from
hidden_states[select_layer] at :463-475). Semantics match HF
``CLIPVisionModel``: class embedding + bias-free conv patch embed + learned
absolute position embeddings, pre-encoder LayerNorm, pre-LN transformer
blocks with quick_gelu MLPs. ``hidden_states`` stack mirrors HF (embeddings
output first, then each layer's output, no post-LN) so select_layer=-2
picks the penultimate layer exactly as the reference does.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from mafed_tpu.core.config import VisionConfig
from mafed_tpu.kernels.attention import dot_product_attention


def init_params(cfg: VisionConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    d, l = cfg.embed_dim, cfg.depth
    inter = int(d * cfg.mlp_ratio)
    p = cfg.patch_size
    n_tokens = cfg.num_patches + 1
    ks = jax.random.split(key, 8)

    def normal(k, shape, std=0.02):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    def stacked(k, shape, std=0.02):
        return (jax.random.normal(k, (l, *shape)) * std).astype(dtype)

    zeros = lambda shape: jnp.zeros((l, *shape), dtype)
    ones = lambda shape: jnp.ones((l, *shape), dtype)

    return {
        "class_embedding": normal(ks[0], (d,)),
        "patch_embedding": {"weight": normal(ks[1], (p, p, 3, d))},  # HWIO, no bias
        "position_embedding": normal(ks[2], (n_tokens, d)),
        "pre_layrnorm": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "layers": {
            "layer_norm1": {"weight": ones((d,)), "bias": zeros((d,))},
            "layer_norm2": {"weight": ones((d,)), "bias": zeros((d,))},
            "self_attn": {
                "q_proj": {"weight": stacked(ks[3], (d, d)), "bias": zeros((d,))},
                "k_proj": {"weight": stacked(ks[4], (d, d)), "bias": zeros((d,))},
                "v_proj": {"weight": stacked(ks[5], (d, d)), "bias": zeros((d,))},
                "out_proj": {"weight": stacked(ks[6], (d, d)), "bias": zeros((d,))},
            },
            "mlp": {
                "fc1": {"weight": stacked(ks[7], (d, inter)), "bias": zeros((inter,))},
                "fc2": {"weight": stacked(ks[7], (inter, d)), "bias": zeros((d,))},
            },
        },
        "post_layernorm": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }


def _ln(x, w, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def forward_hidden_states(
    params: Dict[str, Any],
    cfg: VisionConfig,
    pixel_values: jax.Array,  # [B, 3, H, W]
    *,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
) -> jax.Array:
    """Returns hidden_states [L+1, B, 1+N, D] in HF order (embeds, per-layer)."""
    x = pixel_values.astype(dtype).transpose(0, 2, 3, 1)
    w = params["patch_embedding"]["weight"].astype(dtype)
    patches = jax.lax.conv_general_dilated(
        x, w, window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b, hh, ww, d = patches.shape
    patches = patches.reshape(b, hh * ww, d)
    cls = jnp.broadcast_to(params["class_embedding"].astype(dtype), (b, 1, d))
    h = jnp.concatenate([cls, patches], axis=1)
    h = h + params["position_embedding"].astype(dtype)
    h = _ln(h, params["pre_layrnorm"]["weight"], params["pre_layrnorm"]["bias"])

    n_heads = cfg.num_heads
    head_dim = d // n_heads
    t = h.shape[1]
    scale = head_dim ** -0.5

    def block(h, lp):
        ln1 = _ln(h, lp["layer_norm1"]["weight"], lp["layer_norm1"]["bias"])
        q = ln1 @ lp["self_attn"]["q_proj"]["weight"].astype(dtype) + lp["self_attn"]["q_proj"]["bias"].astype(dtype)
        k = ln1 @ lp["self_attn"]["k_proj"]["weight"].astype(dtype) + lp["self_attn"]["k_proj"]["bias"].astype(dtype)
        v = ln1 @ lp["self_attn"]["v_proj"]["weight"].astype(dtype) + lp["self_attn"]["v_proj"]["bias"].astype(dtype)
        q = q.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)
        attn = dot_product_attention(q, k, v, causal=False, scale=scale, impl=attn_impl)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, d)
        attn = attn @ lp["self_attn"]["out_proj"]["weight"].astype(dtype) + lp["self_attn"]["out_proj"]["bias"].astype(dtype)
        h = h + attn
        ln2 = _ln(h, lp["layer_norm2"]["weight"], lp["layer_norm2"]["bias"])
        act = quick_gelu(ln2 @ lp["mlp"]["fc1"]["weight"].astype(dtype) + lp["mlp"]["fc1"]["bias"].astype(dtype))
        mlp_out = act @ lp["mlp"]["fc2"]["weight"].astype(dtype) + lp["mlp"]["fc2"]["bias"].astype(dtype)
        h = h + mlp_out
        return h, h

    h_final, layer_outs = jax.lax.scan(block, h, params["layers"])
    return jnp.concatenate([h[None], layer_outs], axis=0)


def convert_hf_state_dict(state_dict, cfg: VisionConfig, prefix: str = "vision_encoder.") -> Dict[str, Any]:
    """HF CLIPVisionModel state dict -> stacked jax param tree."""
    import re

    import numpy as np

    def npv(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    sd = {}
    for k, v in state_dict.items():
        k = k[len(prefix):] if k.startswith(prefix) else k
        k = k[len("vision_model."):] if k.startswith("vision_model.") else k
        sd[k] = npv(v)
    n = cfg.depth
    per: Dict[str, Dict[int, Any]] = {}
    for k, v in sd.items():
        m = re.match(r"^encoder\.layers\.(\d+)\.(.+)$", k)
        if m:
            per.setdefault(m.group(2), {})[int(m.group(1))] = v

    import numpy as np

    def stack(name, transpose=False):
        arr = np.stack([per[name][i] for i in range(n)])
        if transpose:
            arr = arr.transpose(0, 2, 1)
        return jnp.asarray(arr)

    return {
        "class_embedding": jnp.asarray(sd["embeddings.class_embedding"]),
        "patch_embedding": {"weight": jnp.asarray(sd["embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0))},
        "position_embedding": jnp.asarray(sd["embeddings.position_embedding.weight"]),
        "pre_layrnorm": {"weight": jnp.asarray(sd["pre_layrnorm.weight"]), "bias": jnp.asarray(sd["pre_layrnorm.bias"])},
        "layers": {
            "layer_norm1": {"weight": stack("layer_norm1.weight"), "bias": stack("layer_norm1.bias")},
            "layer_norm2": {"weight": stack("layer_norm2.weight"), "bias": stack("layer_norm2.bias")},
            "self_attn": {
                "q_proj": {"weight": stack("self_attn.q_proj.weight", True), "bias": stack("self_attn.q_proj.bias")},
                "k_proj": {"weight": stack("self_attn.k_proj.weight", True), "bias": stack("self_attn.k_proj.bias")},
                "v_proj": {"weight": stack("self_attn.v_proj.weight", True), "bias": stack("self_attn.v_proj.bias")},
                "out_proj": {"weight": stack("self_attn.out_proj.weight", True), "bias": stack("self_attn.out_proj.bias")},
            },
            "mlp": {
                "fc1": {"weight": stack("mlp.fc1.weight", True), "bias": stack("mlp.fc1.bias")},
                "fc2": {"weight": stack("mlp.fc2.weight", True), "bias": stack("mlp.fc2.bias")},
            },
        },
        "post_layernorm": {"weight": jnp.asarray(sd["post_layernorm.weight"]), "bias": jnp.asarray(sd["post_layernorm.bias"])},
    }
