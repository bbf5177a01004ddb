"""Per-layer text/image representation similarity across task checkpoints.

Capability parity with mafed/analysis/get_average_CKA_per_layer.py and
get_representation_CKA_ratio.py (which are bit-rotted in the reference:
broken import at :30, `selg` typo at :55, kwarg mismatch at :208 — fixed by
construction here): for each pair of task checkpoints, run a shared batch
stream through both models with hidden states on, split tokens by modality
(vision prefix vs attended text), and report linear CKA per layer plus the
text/image CKA ratio.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

from mafed_tpu.analysis.cka import feature_space_linear_cka
from mafed_tpu.constants import NUM_VISION_TOKENS
from mafed_tpu.core.config import ModelConfig
from mafed_tpu.core.logging import LOGGER


def collect_hidden_states(params, model_cfg: ModelConfig, batches, max_batches: int = 8, dtype=None):
    """Run batches through the model, return per-layer (text, image) features.

    Returns dict layer -> {"text": [n_text_tokens, H], "image": [n_img, H]}.
    """
    import jax.numpy as jnp

    from mafed_tpu.data.images import prep_pixels
    from mafed_tpu.models import vl_pythia

    dtype = dtype or jnp.bfloat16
    n_vis = model_cfg.vision.num_patches
    per_layer_text: Dict[int, List[np.ndarray]] = {}
    per_layer_image: Dict[int, List[np.ndarray]] = {}

    for i, batch in enumerate(batches):
        if i >= max_batches:
            break
        pixel_values = prep_pixels(batch, model_cfg.vision, dtype)
        out = vl_pythia.forward(
            params, model_cfg,
            batch["input_ids"], pixel_values, batch["attention_mask"],
            output_hidden_states=True, dtype=dtype,
        )
        hs = np.asarray(out.hidden_states.astype(jnp.float32))  # [L+1, B, T, H]
        text_mask = np.asarray(batch["attention_mask"]).astype(bool)  # [B, Ttxt]
        for layer in range(hs.shape[0]):
            img = hs[layer][:, :n_vis].reshape(-1, hs.shape[-1])
            txt = hs[layer][:, n_vis:][text_mask]
            per_layer_image.setdefault(layer, []).append(img)
            per_layer_text.setdefault(layer, []).append(txt)

    return {
        layer: {
            "text": np.concatenate(per_layer_text[layer], axis=0),
            "image": np.concatenate(per_layer_image[layer], axis=0),
        }
        for layer in per_layer_text
    }


def cka_between_checkpoints(
    params_a, params_b, model_cfg: ModelConfig, batches_factory, max_batches: int = 8
) -> Dict[str, List[float]]:
    """Per-layer linear CKA between two models on the same data stream."""
    feats_a = collect_hidden_states(params_a, model_cfg, batches_factory(), max_batches)
    feats_b = collect_hidden_states(params_b, model_cfg, batches_factory(), max_batches)
    layers = sorted(feats_a)
    text_cka, image_cka, ratio = [], [], []
    for layer in layers:
        t = feature_space_linear_cka(feats_a[layer]["text"], feats_b[layer]["text"])
        i = feature_space_linear_cka(feats_a[layer]["image"], feats_b[layer]["image"])
        text_cka.append(t)
        image_cka.append(i)
        ratio.append(t / (i + 1e-12))
        LOGGER.info("layer %d: text CKA %.4f image CKA %.4f ratio %.3f", layer, t, i, ratio[-1])
    return {"layers": layers, "text_cka": text_cka, "image_cka": image_cka, "ti_ratio": ratio}


def save_cka_report(report: Dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
