"""Full VL combinator parity vs a torch assembly (HF GPTNeoX + projector).

Validates the vision-first concat order, mask extension, projector math,
untied embed_out logits, and the length-normalized loss end-to-end against
torch with identical weights (vl_pythia.py:247-326 semantics). The EVA
encoder is bypassed by injecting patch embeddings directly on both sides.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mafed_tpu.core.config import ModelConfig, VisionConfig
from mafed_tpu.models import vl_pythia
from mafed_tpu.models.weights import convert_decoder_state_dict

torch = pytest.importorskip("torch")


def build_pair(seed=0):
    from transformers import GPTNeoXConfig, GPTNeoXModel

    torch.manual_seed(seed)
    hidden, d_vis, vocab = 64, 48, 128
    hf_cfg = GPTNeoXConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96, rotary_pct=0.25,
        use_parallel_residual=True, attn_implementation="eager",
    )
    hf = GPTNeoXModel(hf_cfg).eval()
    embed_out = torch.nn.Linear(hidden, vocab, bias=False)
    proj = torch.nn.Sequential(
        torch.nn.Linear(d_vis, hidden), torch.nn.GELU(), torch.nn.Linear(hidden, hidden)
    )
    torch.nn.init.normal_(embed_out.weight, std=0.02)

    cfg = ModelConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96, rotary_pct=0.25,
        vision=VisionConfig(embed_dim=d_vis, img_size=28, patch_size=14, depth=1, num_heads=2),
    )
    decoder = convert_decoder_state_dict(hf.state_dict(), cfg, prefix="")
    decoder["embed_out"] = {"weight": jnp.asarray(embed_out.weight.detach().numpy())}
    params = {
        "decoder": decoder,
        "vision": {},  # bypassed
        "projector": {
            "fc1": {
                "weight": jnp.asarray(proj[0].weight.detach().numpy().T),
                "bias": jnp.asarray(proj[0].bias.detach().numpy()),
            },
            "fc2": {
                "weight": jnp.asarray(proj[2].weight.detach().numpy().T),
                "bias": jnp.asarray(proj[2].bias.detach().numpy()),
            },
        },
    }
    return hf, embed_out, proj, cfg, params


def torch_vl_forward(hf, embed_out, proj, patch_feats, input_ids, attention_mask, labels=None):
    """Literal re-derivation of the reference forward (vl_pythia.py:247-326)."""
    vis = proj(torch.tensor(patch_feats))
    txt = hf.embed_in(torch.tensor(input_ids))
    inputs_embeds = torch.cat([vis, txt], dim=1)
    vis_mask = torch.ones(vis.shape[:2], dtype=torch.long)
    mask = torch.cat([vis_mask, torch.tensor(attention_mask)], dim=1)
    hidden = hf(inputs_embeds=inputs_embeds, attention_mask=mask).last_hidden_state
    logits = embed_out(hidden)
    loss = None
    if labels is not None:
        lab = torch.tensor(labels)
        lg = logits[:, -lab.size(1):, :]
        shift_logits = lg[..., :-1, :].contiguous()
        shift_labels = lab[..., 1:].contiguous()
        ce = torch.nn.CrossEntropyLoss(reduction="none")(
            shift_logits.reshape(-1, logits.size(-1)), shift_labels.reshape(-1)
        ).view(shift_labels.shape)
        m = shift_labels != -100
        per = ce.masked_fill(~m, 0).sum(-1) / m.sum(-1).float().clamp(min=1e-13)
        loss = per.mean()
    return logits.detach().numpy(), None if loss is None else float(loss)


def test_vl_forward_parity():
    hf, embed_out, proj, cfg, params = build_pair()
    rng = np.random.default_rng(0)
    b, n_vis, t = 2, 4, 9
    patch = rng.normal(size=(b, n_vis, cfg.vision.embed_dim)).astype(np.float32)
    ids = rng.integers(0, cfg.vocab_size, size=(b, t)).astype(np.int64)
    mask = np.ones((b, t), np.int64)
    mask[0, :3] = 0
    labels = ids.astype(np.int64).copy()
    labels[:, :4] = -100
    labels = np.where(mask == 0, -100, labels)

    with torch.no_grad():
        ref_logits, ref_loss = torch_vl_forward(hf, embed_out, proj, patch, ids, mask, labels)

    out = vl_pythia.forward(
        params, cfg,
        jnp.asarray(ids), None, jnp.asarray(mask), jnp.asarray(labels),
        patch_embeddings=jnp.asarray(patch),
        dtype=jnp.float32, attn_impl="xla",
    )
    got_logits = np.asarray(out.logits)
    # compare only positions attended in both (padded text rows are garbage)
    full_mask = np.concatenate([np.ones((b, n_vis), bool), mask.astype(bool)], axis=1)
    np.testing.assert_allclose(got_logits[full_mask], ref_logits[full_mask], atol=2e-3, rtol=1e-3)
    assert abs(float(out.loss) - ref_loss) < 1e-4


def test_hidden_states_count_includes_embeddings():
    hf, embed_out, proj, cfg, params = build_pair()
    rng = np.random.default_rng(1)
    patch = rng.normal(size=(1, 4, cfg.vision.embed_dim)).astype(np.float32)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 5)).astype(np.int64)
    out = vl_pythia.forward(
        params, cfg, jnp.asarray(ids), None, None,
        patch_embeddings=jnp.asarray(patch),
        output_hidden_states=True, dtype=jnp.float32, attn_impl="xla",
    )
    assert out.hidden_states.shape[0] == cfg.num_hidden_layers + 1
    assert out.hidden_states.shape[2] == 4 + 5  # vision-first concat
