"""EVA-02 numerical parity against a test-only torch transcription of the
timm ``Eva`` semantics the reference depends on.

timm itself cannot be installed in this environment, so this module vendors
a minimal, independent torch implementation of exactly the semantics the
reference model uses (mafed/model/vl_pythia.py:119-201 configures timm's
``eva02_large_patch14_clip_224``):

  * conv patch embed, prepended CLS, learned abs pos-embed on all tokens
  * 2D axial rotary embedding, ``RotaryEmbeddingCat`` flavor:
    build_rotary_pos_embed(in_pixels=False) — per-axis freq bands
    1/T^(i/nb), integer grid optionally rescaled by ref_feat/feat,
    sin/cos repeat_interleave(2)'d then concatenated [sin | cos];
    apply = x*cos + rot(x)*sin with rot = interleaved (-odd, even);
    CLS excluded from rope
  * unfused q/k/v (k bias-less), scale = head_dim**-0.5, softmax attention
  * inner LayerNorm on the merged attention output BEFORE the out
    projection (``scale_attn_inner`` sub-LN)
  * SwiGLU MLP (silu(fc1_g) * fc1_x) with a LayerNorm before fc2
    (``scale_mlp`` sub-LN)
  * pre-norm residual blocks, final LayerNorm
  * the VL combinator drops CLS ("patch" select, vl_pythia.py:463-475)

The oracle is written directly from the published timm equations — NOT from
mafed_tpu.models.eva02 — so a transcription error there (transposed rope
bands, misplaced sub-LN, wrong interleave) fails here numerically instead
of surviving the structural tests in test_eva02.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from mafed_tpu.core.config import VisionConfig
from mafed_tpu.models import eva02, vl_pythia
from mafed_tpu.core.config import ModelConfig


# ---------------------------------------------------------------------------
# torch oracle (timm Eva semantics, functional)
# ---------------------------------------------------------------------------

def oracle_rope_table(head_dim: int, side: int, ref_side, temperature: float) -> torch.Tensor:
    """timm build_rotary_pos_embed(in_pixels=False) + RotaryEmbeddingCat cat."""
    num_bands = head_dim // 4
    exp = torch.arange(num_bands, dtype=torch.float64) / num_bands
    bands = 1.0 / (temperature ** exp)  # freq_bands(step=1)
    t = torch.arange(side, dtype=torch.float64)
    if ref_side is not None:
        t = t / side * ref_side
    grid = torch.stack(torch.meshgrid(t, t, indexing="ij"), dim=-1)  # [s, s, 2]
    pos = grid.unsqueeze(-1) * bands  # [s, s, 2, nb]
    n = side * side
    sin = pos.sin().reshape(n, -1).repeat_interleave(2, -1)  # [N, head_dim]
    cos = pos.cos().reshape(n, -1).repeat_interleave(2, -1)
    return torch.cat([sin, cos], dim=-1).to(torch.float32)  # [N, 2*head_dim]


def oracle_rot(x: torch.Tensor) -> torch.Tensor:
    return torch.stack([-x[..., 1::2], x[..., ::2]], dim=-1).reshape(x.shape)


def oracle_apply_rot_embed_cat(x: torch.Tensor, emb: torch.Tensor) -> torch.Tensor:
    sin, cos = emb.tensor_split(2, -1)
    return x * cos + oracle_rot(x) * sin


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.array(x, dtype=np.float32))


def oracle_forward_features(params, cfg: VisionConfig, pixels: np.ndarray) -> torch.Tensor:
    """Full Eva forward_features in torch, fp32, from the SAME param pytree
    layout as eva02.init_params (projection weights stored as x @ W)."""
    eps = cfg.layer_norm_eps
    x = torch.from_numpy(np.array(pixels, dtype=np.float32))  # [B, 3, H, W]
    w = _t(params["patch_embed"]["proj"]["weight"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    x = F.conv2d(x, w, _t(params["patch_embed"]["proj"]["bias"]), stride=cfg.patch_size)
    b, d, hh, ww = x.shape
    x = x.reshape(b, d, hh * ww).transpose(1, 2)  # [B, N, D]

    if cfg.class_token:
        cls = _t(params["cls_token"]).expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1)
    if cfg.use_abs_pos_emb:
        x = x + _t(params["pos_embed"])

    rope = None
    if cfg.use_rot_pos_emb:
        rope = oracle_rope_table(
            cfg.head_dim, cfg.img_size // cfg.patch_size, cfg.rope_ref_feat_side, cfg.rope_temperature
        )
    n_prefix = 1 if cfg.class_token else 0
    nh, hd = cfg.num_heads, cfg.head_dim
    t = x.shape[1]
    scale = hd ** -0.5

    def ln(h, wb):
        return F.layer_norm(h, (h.shape[-1],), _t(wb["weight"]), _t(wb["bias"]), eps)

    bp = params["blocks"]
    for i in range(cfg.depth):
        layer = jax.tree.map(lambda p: np.asarray(p)[i], bp)
        h = ln(x, layer["norm1"])
        q = h @ _t(layer["attn"]["q_proj"]["weight"]) + _t(layer["attn"]["q_proj"]["bias"])
        k = h @ _t(layer["attn"]["k_proj"]["weight"])  # timm k_proj bias=False
        v = h @ _t(layer["attn"]["v_proj"]["weight"]) + _t(layer["attn"]["v_proj"]["bias"])
        q = q.reshape(b, t, nh, hd).transpose(1, 2)
        k = k.reshape(b, t, nh, hd).transpose(1, 2)
        v = v.reshape(b, t, nh, hd).transpose(1, 2)
        if rope is not None:
            q = torch.cat([q[:, :, :n_prefix], oracle_apply_rot_embed_cat(q[:, :, n_prefix:], rope)], dim=2)
            k = torch.cat([k[:, :, :n_prefix], oracle_apply_rot_embed_cat(k[:, :, n_prefix:], rope)], dim=2)
        attn = torch.softmax((q * scale) @ k.transpose(-2, -1), dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, t, d)
        if cfg.scale_attn_inner:
            out = ln(out, layer["attn"]["norm"])  # sub-LN pre-projection
        out = out @ _t(layer["attn"]["proj"]["weight"]) + _t(layer["attn"]["proj"]["bias"])
        x = x + out

        h = ln(x, layer["norm2"])
        if cfg.swiglu_mlp:
            gate = h @ _t(layer["mlp"]["fc1_g"]["weight"]) + _t(layer["mlp"]["fc1_g"]["bias"])
            up = h @ _t(layer["mlp"]["fc1_x"]["weight"]) + _t(layer["mlp"]["fc1_x"]["bias"])
            act = F.silu(gate) * up
        else:
            act = F.gelu(h @ _t(layer["mlp"]["fc1_g"]["weight"]) + _t(layer["mlp"]["fc1_g"]["bias"]))
        if cfg.scale_mlp:
            act = ln(act, layer["mlp"]["norm"])  # sub-LN pre-down-projection
        x = x + (act @ _t(layer["mlp"]["fc2"]["weight"]) + _t(layer["mlp"]["fc2"]["bias"]))

    return ln(x, params["norm"])


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------

def _run_both(cfg: VisionConfig, batch: int = 2, seed: int = 0):
    params = eva02.init_params(cfg, jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    pixels = rng.normal(size=(batch, 3, cfg.img_size, cfg.img_size)).astype(np.float32)
    ours = np.asarray(
        eva02.forward_features(params, cfg, jnp.asarray(pixels), dtype=jnp.float32, attn_impl="xla")
    )
    ref = oracle_forward_features(params, cfg, pixels).numpy()
    return ours, ref


@pytest.mark.parametrize(
    "img_size,embed_dim,heads,depth",
    [
        (28, 32, 2, 3),   # 2x2 grid
        (56, 64, 4, 2),   # 4x4 grid
    ],
)
def test_forward_features_matches_torch_oracle(img_size, embed_dim, heads, depth):
    cfg = VisionConfig(
        img_size=img_size, patch_size=14, embed_dim=embed_dim, depth=depth,
        num_heads=heads, mlp_ratio=4 * 2 / 3,
    )
    ours, ref = _run_both(cfg)
    assert ours.shape == ref.shape == (2, 1 + cfg.num_patches, embed_dim)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_forward_features_ref_feat_shape_rescale():
    """The create_eva2_model(img_size=336) path: rope positions rescaled to
    the pretrained reference grid (mafed/model/vl_pythia.py:163-172)."""
    cfg = VisionConfig(
        img_size=56, patch_size=14, embed_dim=32, depth=2, num_heads=2,
        mlp_ratio=4 * 2 / 3, rope_ref_feat_side=2,  # 4x4 grid, 2x2 reference
    )
    ours, ref = _run_both(cfg)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)
    # and the rescale genuinely changes the table (guards a silent no-op)
    plain = eva02.rope_embed_2d(VisionConfig(
        img_size=56, patch_size=14, embed_dim=32, depth=2, num_heads=2, mlp_ratio=4 * 2 / 3))
    scaled = eva02.rope_embed_2d(cfg)
    assert not np.allclose(plain, scaled)


def test_cls_drop_select_matches_oracle():
    """The VL combinator's "patch" select drops exactly the CLS row
    (vl_pythia.py:463-475): get_patch_embeddings == oracle[:, 1:]."""
    vcfg = VisionConfig(img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0)
    mcfg = ModelConfig(vision=vcfg, hidden_size=16, num_hidden_layers=2, num_attention_heads=2)
    params = {"vision": eva02.init_params(vcfg, jax.random.PRNGKey(3))}
    rng = np.random.default_rng(3)
    pixels = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    ours = np.asarray(
        vl_pythia.get_patch_embeddings(params, mcfg, jnp.asarray(pixels), dtype=jnp.float32, attn_impl="xla")
    )
    ref = oracle_forward_features(params["vision"], vcfg, pixels).numpy()
    assert ours.shape == (2, vcfg.num_patches, 32)
    np.testing.assert_allclose(ours, ref[:, 1:], atol=2e-5, rtol=2e-5)


def test_sub_ln_placement_is_load_bearing():
    """Sanity on the oracle itself: toggling the two sub-LN flags changes the
    output, so the parity assertions above genuinely pin their placement."""
    base = VisionConfig(img_size=28, patch_size=14, embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0)
    params = eva02.init_params(base, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    ref = oracle_forward_features(params, base, pixels).numpy()
    for flag in ("scale_attn_inner", "scale_mlp"):
        cfg2 = VisionConfig(**{**base.__dict__, flag: False})
        alt = oracle_forward_features(params, cfg2, pixels).numpy()
        assert not np.allclose(ref, alt, atol=1e-4)
