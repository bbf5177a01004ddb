"""EVA-02 structural/mathematical invariants (timm cannot be installed in
this environment, so parity is enforced structurally: rope table formulas,
shapes, weight-name round-trip via models/weights.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mafed_tpu.core.config import VisionConfig
from mafed_tpu.models import eva02
from mafed_tpu.models.eva02 import apply_rot_embed_cat, rope_embed_2d


def test_rope_table_shape_and_origin():
    cfg = VisionConfig(img_size=224, patch_size=14, embed_dim=1024, num_heads=16)
    emb = rope_embed_2d(cfg)  # [256, 2*head_dim]
    assert emb.shape == (256, 2 * cfg.head_dim)
    sin, cos = emb[:, : cfg.head_dim], emb[:, cfg.head_dim :]
    # position (0,0): all phases zero
    np.testing.assert_allclose(sin[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(cos[0], 1.0, atol=1e-7)
    # repeat_interleave(2) pattern: adjacent pairs equal
    np.testing.assert_allclose(sin[5, 0::2], sin[5, 1::2])
    np.testing.assert_allclose(cos[5, 0::2], cos[5, 1::2])


def test_rope_axial_structure():
    """First half of bands follow the row index, second half the column."""
    cfg = VisionConfig(img_size=28, patch_size=14, embed_dim=64, num_heads=4)  # 2x2 grid
    emb = rope_embed_2d(cfg)
    head_dim = cfg.head_dim  # 16 -> 4 bands/axis -> 8 sin vals interleaved x2
    sin = emb[:, :head_dim]
    # positions row-major: (0,0), (0,1), (1,0), (1,1)
    half = head_dim // 2
    # same row, different col: h-bands identical
    np.testing.assert_allclose(sin[0, :half], sin[1, :half], atol=1e-7)
    # same col, different row: w-bands identical
    np.testing.assert_allclose(sin[0, half:], sin[2, half:], atol=1e-7)


def test_rot_embed_preserves_norm():
    """Rotary application is an orthogonal transform: norms preserved."""
    cfg = VisionConfig(img_size=28, patch_size=14, embed_dim=64, num_heads=4)
    emb = jnp.asarray(rope_embed_2d(cfg))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, cfg.head_dim)).astype(np.float32))
    y = apply_rot_embed_cat(x, emb)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1),
        rtol=1e-5,
    )


def test_forward_features_shapes_and_finiteness():
    cfg = VisionConfig(img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0)
    params = eva02.init_params(cfg, jax.random.PRNGKey(0))
    pixels = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 28, 28)).astype(np.float32))
    feats = eva02.forward_features(params, cfg, pixels, dtype=jnp.float32, attn_impl="xla")
    assert feats.shape == (2, 1 + 4, 32)  # CLS + 2x2 patches
    assert np.isfinite(np.asarray(feats)).all()


def test_swiglu_hidden_dim():
    cfg = VisionConfig(embed_dim=1024, mlp_ratio=4 * 2 / 3)
    params = eva02.init_params(
        VisionConfig(img_size=28, patch_size=14, embed_dim=1024, depth=1, num_heads=16, mlp_ratio=4 * 2 / 3),
        jax.random.PRNGKey(0),
    )
    # EVA-02-L hidden: int(1024 * 8/3) = 2730
    assert params["blocks"]["mlp"]["fc1_g"]["weight"].shape[-1] == 2730
