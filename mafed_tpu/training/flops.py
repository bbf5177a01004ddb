"""Analytic FLOPs accounting + MFU.

The reference relies on the HF trainer's floating-point-operations counter
(trainer/hf.py:471,585-586); here the model is static enough to account
analytically, which also gives MFU against the chip's peak.
"""

from __future__ import annotations

from dataclasses import dataclass

from mafed_tpu.core.config import ModelConfig

TPU_PEAK_FLOPS = {
    "v5e": 197e12,  # bf16
    "v5p": 459e12,
    "v4": 275e12,
}


def decoder_flops_per_token(cfg: ModelConfig) -> float:
    """Forward matmul FLOPs per token (2*MACs), attention excluded."""
    h, inter = cfg.hidden_size, cfg.intermediate_size
    per_layer = 2 * (4 * h * h + 2 * h * inter)
    return cfg.num_hidden_layers * per_layer


def attention_flops(cfg: ModelConfig, seq_len: int) -> float:
    """Forward attention FLOPs for one sequence (causal ~ /2 but we count full)."""
    return cfg.num_hidden_layers * 4 * seq_len * seq_len * cfg.hidden_size


def vision_flops_per_image(cfg: ModelConfig) -> float:
    v = cfg.vision
    tokens = v.num_patches + (1 if v.class_token else 0)
    hidden = int(v.embed_dim * v.mlp_ratio)
    mlps = 3 if v.swiglu_mlp else 2
    per_layer = 2 * (4 * v.embed_dim ** 2 + mlps * v.embed_dim * hidden)
    blocks = v.depth * (per_layer * tokens + 4 * tokens * tokens * v.embed_dim)
    patch_embed = 2 * tokens * (v.patch_size ** 2 * 3) * v.embed_dim
    return blocks + patch_embed


def lm_head_flops(cfg: ModelConfig, positions: int) -> float:
    return 2 * positions * cfg.hidden_size * cfg.vocab_size


def distill_step_flops_per_example(cfg: ModelConfig, text_len: int) -> float:
    """Fused student+teacher step: student fwd+bwd (3x fwd) + teacher fwd
    (1x) + ONE shared vision fwd + projector, per example."""
    seq = cfg.vision.num_patches + text_len
    dec_fwd = decoder_flops_per_token(cfg) * seq + attention_flops(cfg, seq)
    head = lm_head_flops(cfg, text_len)
    proj = 2 * cfg.vision.num_patches * (cfg.vision.embed_dim * cfg.hidden_size + cfg.hidden_size ** 2)
    return 3 * (dec_fwd + head) + (dec_fwd) + vision_flops_per_image(cfg) + proj


def mfu(examples_per_sec: float, flops_per_example: float, chip: str = "v5e") -> float:
    return examples_per_sec * flops_per_example / TPU_PEAK_FLOPS[chip]


def framework_window_flops(
    cfg: ModelConfig,
    text_len: int,
    n_ce: int,
    batch: int,
    *,
    vision_cached: bool = True,
    teacher_cached: bool = False,
) -> float:
    """Algorithmic FLOPs THIS framework's fused MAFED window computes
    (training/step.py make_mafed_window_step) — the numerator of our own
    MFU, so bench.py's perf claims are self-auditing (VERDICT r3 #3).

    Counts model FLOPs in the PaLM-MFU convention: fwd + bwd (3x fwd for
    trainable paths), EXCLUDING remat recompute — so the reported MFU is
    conservative (the chip also executes ~1 extra fwd of recompute under
    per-layer remat).

    What the window actually runs at the defaults:
      * lm_head only over the last label_len positions (vl_pythia.forward
        loss_only fast path) — not the full 256+T sequence;
      * the teacher early-exits after the deepest distilled tap
        (num_hidden_layers - 2) with NO lm_head, fwd only;
      * the trainable projector runs fwd+bwd on every microbatch, and fwd
        on the teacher's distill pass;
      * with the vision cache (trainer default) the EVA tower contributes
        zero step FLOPs; uncached, ONE shared vision fwd per microbatch
        (the fused step shares it between student and teacher).
    """
    seq = cfg.vision.num_patches + text_len
    dec_fwd = decoder_flops_per_token(cfg) * seq + attention_flops(cfg, seq)
    head = lm_head_flops(cfg, text_len)
    proj = 2 * cfg.vision.num_patches * (
        cfg.vision.embed_dim * cfg.hidden_size + cfg.hidden_size ** 2
    )
    student_ex = 3 * (dec_fwd + head + proj)
    deepest = cfg.num_hidden_layers - 2
    teacher_ex = 0.0 if teacher_cached else (
        dec_fwd * deepest / cfg.num_hidden_layers + proj
    )
    vis_ex = 0.0 if vision_cached else vision_flops_per_image(cfg)
    ce_example = student_ex + vis_ex
    distill_example = student_ex + teacher_ex + vis_ex
    return batch * (n_ce * ce_example + distill_example)


def reference_window_flops(cfg: ModelConfig, text_len: int, n_ce: int, batch: int) -> float:
    """Analytic FLOPs the REFERENCE spends on one accumulation window of the
    featdistill workload (n_ce CE microbatches + 1 distill microbatch, batch
    rows each) — the A100-comparator workload for bench.py.

    Reference semantics (what its eager loop actually computes):
      * every microbatch runs the frozen EVA-02 tower (fwd only);
      * distill microbatches run TWO vision passes — the teacher's forward
        re-encodes pixel_values (methods/distillation.py:218-224 calls the
        full model forward);
      * lm_head logits cover the FULL 256+T sequence (vl_pythia.py:310
        computes embed_out before slicing);
      * the teacher fwd also produces logits (full forward, labels popped);
      * student fwd+bwd ~ 3x fwd matmul FLOPs.
    """
    seq = cfg.vision.num_patches + text_len
    dec_fwd = decoder_flops_per_token(cfg) * seq + attention_flops(cfg, seq)
    head_full = lm_head_flops(cfg, seq)
    vis = vision_flops_per_image(cfg)
    ce_example = vis + 3 * (dec_fwd + head_full)
    distill_example = 2 * vis + 3 * (dec_fwd + head_full) + (dec_fwd + head_full)
    return batch * (n_ce * ce_example + distill_example)


def framework_decode_flops_per_example(
    cfg: ModelConfig,
    text_len: int,
    max_new: int,
    *,
    vision_cached: bool = True,
) -> float:
    """Algorithmic FLOPs of THIS framework's greedy decode per example
    (evaluation/decode.py: one prefill over vision+text, then max_new-1
    KV-cached single-token steps; logits only at the sampled position).
    The numerator of bench_eval.py's self-reported MFU. With the vision
    cache (trainer default) the EVA tower contributes zero; the trainable
    projector always runs."""
    seq0 = cfg.vision.num_patches + text_len
    proj = 2 * cfg.vision.num_patches * (
        cfg.vision.embed_dim * cfg.hidden_size + cfg.hidden_size ** 2
    )
    total = proj + (0.0 if vision_cached else vision_flops_per_image(cfg))
    # prefill: full fwd over seq0, logits for the last position only
    total += decoder_flops_per_token(cfg) * seq0 + attention_flops(cfg, seq0)
    total += lm_head_flops(cfg, 1)
    # cached steps: one query token against the growing KV prefix
    for k in range(1, max_new):
        seq = seq0 + k
        total += decoder_flops_per_token(cfg)
        total += attention_flops(cfg, seq) / seq
        total += lm_head_flops(cfg, 1)
    return total
