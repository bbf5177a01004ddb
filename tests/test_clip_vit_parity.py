"""CLIP ViT backbone parity vs HF CLIPVisionModel (random weights, fp32)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mafed_tpu.core.config import VisionConfig
from mafed_tpu.models import clip_vit

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_clip_hidden_states_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(0)
    hf_cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        attn_implementation="eager",
    )
    hf = CLIPVisionModel(hf_cfg).eval()
    cfg = VisionConfig(
        backbone="clip", img_size=28, patch_size=14, embed_dim=64, depth=3,
        num_heads=4, mlp_ratio=2.0,
    )
    params = clip_vit.convert_hf_state_dict(hf.state_dict(), cfg, prefix="")

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(pixels), output_hidden_states=True).hidden_states

    got = clip_vit.forward_hidden_states(
        params, cfg, jnp.asarray(pixels), dtype=jnp.float32, attn_impl="xla"
    )
    assert got.shape[0] == len(ref) == 4
    for i, r in enumerate(ref):
        np.testing.assert_allclose(
            np.asarray(got[i]), r.numpy(), atol=3e-4, rtol=1e-3, err_msg=f"layer {i}"
        )


def test_clip_backbone_in_combinator():
    import jax

    from mafed_tpu.core.config import ModelConfig
    from mafed_tpu.models import vl_pythia

    vision = VisionConfig(backbone="clip", img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0)
    cfg = ModelConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, vision=vision, select_layer=-2,
    )
    params = vl_pythia.init_params(cfg, jax.random.PRNGKey(0))
    params["vision"] = clip_vit.init_params(vision, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    out = vl_pythia.forward(
        params, cfg,
        jnp.asarray(rng.integers(1, 100, size=(2, 6)).astype(np.int32)),
        jnp.asarray(rng.normal(size=(2, 3, 28, 28)).astype(np.float32)),
        dtype=jnp.float32, attn_impl="xla",
    )
    # 4 patches + 6 text tokens
    assert out.logits.shape == (2, 10, 128)
