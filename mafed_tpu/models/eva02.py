"""EVA-02 ViT encoder — pure-functional JAX.

Re-implements the semantics of timm's ``Eva`` model as configured for
``eva02_large_patch14_clip_224`` — the frozen vision tower of every
reference experiment (mafed/model/vl_pythia.py:119-201, mafed/train.py:477):

  * Conv patch embed (14x14/14) -> 256 tokens, prepended CLS, learned
    absolute pos-embed added to all 257 tokens
  * 2D axial rotary position embedding (RotaryEmbeddingCat semantics:
    per-axis frequency bands, interleaved rotate, CLS excluded from rope)
  * pre-norm blocks with unfused q/k/v (k has no bias), inner attention
    LayerNorm before the output projection ("sub-LN"), SwiGLU MLP with a
    LayerNorm before the down-projection, LN eps 1e-6
  * final LayerNorm; the VL combinator then drops CLS ("patch" feature
    select, vl_pythia.py:463-475)

TPU-first: blocks are stacked [L, ...] and run under lax.scan; attention
uses the shared Pallas flash kernel (non-causal, no mask). The encoder is
frozen in all reference configs, so params live in bf16 and the whole
forward is a single fused jit region with the projector.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from mafed_tpu.core.config import VisionConfig
from mafed_tpu.kernels.attention import dot_product_attention


def rope_embed_2d(cfg: VisionConfig) -> np.ndarray:
    """Precompute the concatenated sin/cos rope table [num_patches, 2*head_dim].

    Follows timm's build_rotary_pos_embed with in_pixels=False: per spatial
    axis, num_bands = head_dim // 4 frequency bands
    1/temperature^(i/num_bands); position grid is integer (h, w) rescaled by
    ref_feat_shape/feat_shape; sin/cos are repeat_interleave(2)'d and then
    concatenated [sin | cos].
    """
    head_dim = cfg.head_dim
    num_bands = head_dim // 4
    side = cfg.img_size // cfg.patch_size
    exp = np.arange(num_bands, dtype=np.float64) / num_bands
    bands = 1.0 / (cfg.rope_temperature ** exp)  # [nb]
    t = np.arange(side, dtype=np.float64)
    if cfg.rope_ref_feat_side is not None:
        # pretrained-grid rescale: t = t / feat * ref (timm
        # build_rotary_pos_embed ref_feat_shape — the reference's
        # create_eva2_model(img_size=336) keeps the 224-pretrained (16, 16))
        t = t / side * cfg.rope_ref_feat_side
    grid_h, grid_w = np.meshgrid(t, t, indexing="ij")
    # pos[..., axis, band]
    pos = np.stack([grid_h, grid_w], axis=-1)[..., None] * bands  # [s, s, 2, nb]
    pos = pos.reshape(side * side, 2 * num_bands)
    sin = np.repeat(np.sin(pos), 2, axis=-1)  # [N, head_dim]
    cos = np.repeat(np.cos(pos), 2, axis=-1)
    return np.concatenate([sin, cos], axis=-1).astype(np.float32)  # [N, 2*head_dim]


def _rot_interleaved(x: jax.Array) -> jax.Array:
    """timm's rot(): stack(-x_odd, x_even) interleaved."""
    x_even = x[..., 0::2]
    x_odd = x[..., 1::2]
    return jnp.stack([-x_odd, x_even], axis=-1).reshape(x.shape)


def apply_rot_embed_cat(x: jax.Array, emb: jax.Array) -> jax.Array:
    """x: [..., N, head_dim]; emb: [N, 2*head_dim] = [sin | cos]."""
    half = emb.shape[-1] // 2
    sin, cos = emb[..., :half], emb[..., half:]
    return x * cos.astype(x.dtype) + _rot_interleaved(x) * sin.astype(x.dtype)


def init_params(cfg: VisionConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    d, l = cfg.embed_dim, cfg.depth
    hidden = int(d * cfg.mlp_ratio)
    p = cfg.patch_size
    n_tokens = cfg.num_patches + (1 if cfg.class_token else 0)
    ks = jax.random.split(key, 10)

    def trunc(k, shape, std=0.02):
        return (jax.random.truncated_normal(k, -2, 2, shape) * std).astype(dtype)

    def stacked(k, shape, std=0.02):
        return (jax.random.truncated_normal(k, -2, 2, (l, *shape)) * std).astype(dtype)

    zeros = lambda shape: jnp.zeros((l, *shape), dtype)
    ones = lambda shape: jnp.ones((l, *shape), dtype)

    params: Dict[str, Any] = {
        "patch_embed": {
            # conv kernel stored HWIO
            "proj": {"weight": trunc(ks[0], (p, p, 3, d)), "bias": jnp.zeros((d,), dtype)},
        },
        "cls_token": trunc(ks[1], (1, 1, d)),
        "pos_embed": trunc(ks[2], (1, n_tokens, d)),
        "blocks": {
            "norm1": {"weight": ones((d,)), "bias": zeros((d,))},
            "norm2": {"weight": ones((d,)), "bias": zeros((d,))},
            "attn": {
                "q_proj": {"weight": stacked(ks[3], (d, d)), "bias": zeros((d,))},
                "k_proj": {"weight": stacked(ks[4], (d, d))},  # no bias (timm k_proj bias=False)
                "v_proj": {"weight": stacked(ks[5], (d, d)), "bias": zeros((d,))},
                "norm": {"weight": ones((d,)), "bias": zeros((d,))},  # inner sub-LN
                "proj": {"weight": stacked(ks[6], (d, d)), "bias": zeros((d,))},
            },
            "mlp": {
                "fc1_g": {"weight": stacked(ks[7], (d, hidden)), "bias": zeros((hidden,))},
                "fc1_x": {"weight": stacked(ks[8], (d, hidden)), "bias": zeros((hidden,))},
                "norm": {"weight": ones((hidden,)), "bias": zeros((hidden,))},
                "fc2": {"weight": stacked(ks[9], (hidden, d)), "bias": zeros((d,))},
            },
        },
        "norm": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }
    return params


def _ln(x, w, b, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def patch_embed(params: Dict[str, Any], pixel_values: jax.Array, cfg: VisionConfig, dtype=jnp.bfloat16) -> jax.Array:
    """pixel_values [B, 3, H, W] (torch layout) -> [B, N, D]."""
    x = pixel_values.astype(dtype).transpose(0, 2, 3, 1)  # NHWC
    w = params["patch_embed"]["proj"]["weight"].astype(dtype)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = out + params["patch_embed"]["proj"]["bias"].astype(dtype)
    b, hh, ww, d = out.shape
    return out.reshape(b, hh * ww, d)


def forward_features(
    params: Dict[str, Any],
    cfg: VisionConfig,
    pixel_values: jax.Array,
    *,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
) -> jax.Array:
    """EVA-02 forward_features (vl_pythia.py:132-142): returns [B, 1+N, D]."""
    x = patch_embed(params, pixel_values, cfg, dtype=dtype)
    b = x.shape[0]
    if cfg.class_token:
        cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (b, 1, cfg.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
    if cfg.use_abs_pos_emb:
        x = x + params["pos_embed"].astype(dtype)

    rope = jnp.asarray(rope_embed_2d(cfg)) if cfg.use_rot_pos_emb else None
    n_prefix = 1 if cfg.class_token else 0
    n_heads, head_dim = cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    d = cfg.embed_dim
    t = x.shape[1]

    def block_fn(h, bp):
        ln1 = _ln(h, bp["norm1"]["weight"], bp["norm1"]["bias"], eps)
        q = ln1 @ bp["attn"]["q_proj"]["weight"].astype(dtype) + bp["attn"]["q_proj"]["bias"].astype(dtype)
        k = ln1 @ bp["attn"]["k_proj"]["weight"].astype(dtype)
        v = ln1 @ bp["attn"]["v_proj"]["weight"].astype(dtype) + bp["attn"]["v_proj"]["bias"].astype(dtype)
        q = q.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)
        if rope is not None:
            q = jnp.concatenate([q[:, :, :n_prefix], apply_rot_embed_cat(q[:, :, n_prefix:], rope)], axis=2)
            k = jnp.concatenate([k[:, :, :n_prefix], apply_rot_embed_cat(k[:, :, n_prefix:], rope)], axis=2)
        attn = dot_product_attention(q, k, v, causal=False, impl=attn_impl)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, d)
        if cfg.scale_attn_inner:
            attn = _ln(attn, bp["attn"]["norm"]["weight"], bp["attn"]["norm"]["bias"], eps)
        attn = attn @ bp["attn"]["proj"]["weight"].astype(dtype) + bp["attn"]["proj"]["bias"].astype(dtype)
        h = h + attn

        ln2 = _ln(h, bp["norm2"]["weight"], bp["norm2"]["bias"], eps)
        if cfg.swiglu_mlp:
            gate = ln2 @ bp["mlp"]["fc1_g"]["weight"].astype(dtype) + bp["mlp"]["fc1_g"]["bias"].astype(dtype)
            up = ln2 @ bp["mlp"]["fc1_x"]["weight"].astype(dtype) + bp["mlp"]["fc1_x"]["bias"].astype(dtype)
            act = jax.nn.silu(gate) * up
        else:
            act = jax.nn.gelu(ln2 @ bp["mlp"]["fc1_g"]["weight"].astype(dtype) + bp["mlp"]["fc1_g"]["bias"].astype(dtype), approximate=False)
        if cfg.scale_mlp:
            act = _ln(act, bp["mlp"]["norm"]["weight"], bp["mlp"]["norm"]["bias"], eps)
        mlp_out = act @ bp["mlp"]["fc2"]["weight"].astype(dtype) + bp["mlp"]["fc2"]["bias"].astype(dtype)
        h = h + mlp_out
        return h, None

    x, _ = jax.lax.scan(block_fn, x, params["blocks"])
    return _ln(x, params["norm"]["weight"], params["norm"]["bias"], eps)
