"""Optimizer: optax AdamW/Adam/Adamax with the reference's param groups.

Parity with mafed/model/vqa_cont_learner.py:71-128:
  * "top" params (name contains "vqa_output") train at lr_mul x lr
  * no-decay set: biases + LayerNorm weights/biases (+ distill-loss params)
  * decoupled weight decay multiplied by the group lr (torch AdamW semantics)
  * AdamW eps 1e-6 with bias correction (vendored HF AdamW,
    mafed/optim/adamw.py:12-113); Adam/Adamax eps 1e-8 (torch defaults)

Grad clipping (global norm, grad_norm=2.0; mafed/train.py:288) is fused
into the same optax chain instead of a separate trainer hook.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from mafed_tpu.core.config import TrainConfig


def _path_names(path) -> list:
    return [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]


def param_group_masks(params: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Return (lr_mul_mask, weight_decay_mask) pytrees of bools.

    lr_mul applies to names containing "vqa_output" (none in VL-Pythia — the
    generative head is embed_out — but kept for parity with classifier-head
    models); weight decay skips biases and LayerNorm params.
    """
    no_decay_markers = ("layernorm", "layer_norm", "norm", "bias", "distill_loss")

    def is_top(path, leaf):
        return any("vqa_output" in n for n in _path_names(path))

    def decays(path, leaf):
        names = [n.lower() for n in _path_names(path)]
        if any(any(m in n for m in no_decay_markers) for n in names):
            return False
        return True

    top = jax.tree_util.tree_map_with_path(is_top, params)
    decay = jax.tree_util.tree_map_with_path(decays, params)
    return top, decay


def build_optimizer(
    config: TrainConfig,
    params: Dict[str, Any],
    schedule: Callable,
) -> optax.GradientTransformation:
    b1, b2 = config.betas
    lr_mul = config.lr_mul
    wd = config.weight_decay
    top_mask, decay_mask = param_group_masks(params)

    if config.optim == "adamw":
        scale = optax.scale_by_adam(b1=b1, b2=b2, eps=1e-6)
        decoupled_wd = True
    elif config.optim == "adam":
        scale = optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8)
        decoupled_wd = False
    elif config.optim == "adamax":
        scale = optax.scale_by_adamax(b1=b1, b2=b2, eps=1e-8)
        decoupled_wd = False
    else:
        raise ValueError(f"invalid optimizer {config.optim}")

    chain = []
    if config.grad_norm and config.grad_norm > 0:
        chain.append(optax.clip_by_global_norm(config.grad_norm))
    if wd > 0 and not decoupled_wd:
        # classic L2: grad += wd * theta before the moment updates
        chain.append(optax.add_decayed_weights(wd, mask=decay_mask))
    chain.append(scale)
    if wd > 0 and decoupled_wd:
        # AdamW: theta -= lr_group * (adam_dir + wd * theta)
        chain.append(optax.add_decayed_weights(wd, mask=decay_mask))

    def per_group_lr(updates, state, params=None):
        del params
        step = state

        def apply(u, is_top):
            lr = schedule(step) * (lr_mul if is_top else 1.0)
            return -lr * u

        updates = jax.tree.map(apply, updates, top_mask)
        return updates, step + 1

    lr_transform = optax.GradientTransformation(
        init=lambda params: jnp.zeros((), jnp.int32),
        update=per_group_lr,
    )
    chain.append(lr_transform)
    return optax.chain(*chain)
