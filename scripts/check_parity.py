"""Numerical parity harness: this framework vs the torch reference stack.

Given a reference-format model directory (config.json + safetensors), loads
the weights into BOTH the JAX VL-Pythia and (when torch/transformers/timm
are importable) the torch modules, runs fixed inputs through each, and
reports logit deltas. Run this wherever the real gpantaz/vl-pythia-eva-*
checkpoints are available:

    python scripts/check_parity.py --model_dir storage/models/vl-pythia-eva-410m
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--txt_len", type=int, default=24)
    parser.add_argument("--atol", type=float, default=5e-2)  # bf16-scale tolerance
    args = parser.parse_args()

    import jax.numpy as jnp

    from mafed_tpu.models import vl_pythia
    from mafed_tpu.models.weights import load_pretrained

    params, cfg = load_pretrained(args.model_dir)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 1000, size=(args.batch, args.txt_len)).astype(np.int32)
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(args.batch, 3, cfg.vision.img_size, cfg.vision.img_size)).astype(np.float32)

    out = vl_pythia.forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(pixels), jnp.asarray(mask),
        dtype=jnp.float32, attn_impl="xla",
    )
    jax_logits = np.asarray(out.logits.astype(jnp.float32))
    print(f"jax logits: shape={jax_logits.shape} mean={jax_logits.mean():.4f} std={jax_logits.std():.4f}")

    try:
        import torch  # noqa: F401
        from transformers import AutoConfig  # noqa: F401
    except ImportError:
        print("torch/transformers unavailable; JAX-side smoke only")
        return 0

    try:
        sys.path.insert(0, "/root/reference")
        from mafed.model.vl_pythia import VLCLIPGPTNeoXForCausalLM  # type: ignore

        model = VLCLIPGPTNeoXForCausalLM.from_pretrained(
            args.model_dir,
            vision_encoder_name=cfg.vision_encoder_name,
            use_flash_attention_2=False,
        ).eval()
    except Exception as exc:
        print(f"reference model unavailable ({type(exc).__name__}: {exc}); JAX-side smoke only")
        return 0

    import torch

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            pixel_values=torch.tensor(pixels),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            return_dict=True,
        ).logits.float().numpy()

    delta = np.abs(jax_logits - ref)
    print(f"max |Δlogit| = {delta.max():.5f}, mean = {delta.mean():.6f}")
    ok = delta.max() < args.atol
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
