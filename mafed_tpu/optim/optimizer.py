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

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from mafed_tpu.core.config import TrainConfig


class ClipState(NamedTuple):
    """State of clip_by_global_norm_recorded: the last pre-clip grad norm.

    Recording the norm here lets train steps report it as a metric without
    recomputing the full-tree reduction optax already performed for clipping
    (it was ~1% of the fused distill step).
    """

    grad_norm: jax.Array


def clip_by_global_norm_recorded(max_norm: float) -> "optax.GradientTransformation":
    """optax.clip_by_global_norm semantics + the norm kept in state."""

    def init(params):
        del params
        return ClipState(jnp.zeros((), jnp.float32))

    def update(updates, state, params=None):
        del params, state
        gnorm = optax.global_norm(updates)
        scale = jnp.where(gnorm > max_norm, max_norm / gnorm, 1.0)
        updates = jax.tree.map(lambda u: u * scale.astype(u.dtype), updates)
        return updates, ClipState(gnorm.astype(jnp.float32))

    return optax.GradientTransformation(init, update)


def last_grad_norm(opt_state) -> jax.Array:
    """Extract the recorded pre-clip global grad norm from an optimizer state
    tree (searches through chains / MultiSteps wrappers)."""
    found = [
        s.grad_norm
        for s in jax.tree.leaves(opt_state, is_leaf=lambda x: isinstance(x, ClipState))
        if isinstance(s, ClipState)
    ]
    if not found:
        raise ValueError("optimizer state contains no ClipState (grad clipping disabled?)")
    return found[0]


class ScheduleState(NamedTuple):
    """LR-schedule state carried INSIDE the optimizer state.

    Keeping warmup/total as state (not Python closure constants) means the
    jitted train step compiles ONCE and is reused across all tasks even
    though every task has a different schedule horizon — per-task
    recompilation of a 400M-param step costs minutes on TPU.
    """

    count: jax.Array
    warmup_steps: jax.Array
    total_steps: jax.Array


def triangular_factor(state: ScheduleState) -> jax.Array:
    """Linear warmup then linear decay to 0 (HF semantics, sched.py:34-48)."""
    step = state.count.astype(jnp.float32)
    warm = step / jnp.maximum(state.warmup_steps.astype(jnp.float32), 1.0)
    decay = jnp.maximum(
        0.0,
        (state.total_steps - state.count).astype(jnp.float32)
        / jnp.maximum((state.total_steps - state.warmup_steps).astype(jnp.float32), 1.0),
    )
    return jnp.where(state.count < state.warmup_steps, warm, decay)


def set_schedule(opt_state, warmup_steps: int, total_steps: int, reset_count: bool = True):
    """Replace the ScheduleState horizon inside an optimizer state tree."""
    def visit(node):
        if isinstance(node, ScheduleState):
            return ScheduleState(
                jnp.zeros((), jnp.int32) if reset_count else node.count,
                jnp.asarray(warmup_steps, jnp.int32),
                jnp.asarray(total_steps, jnp.int32),
            )
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*(visit(v) for v in node))
        if isinstance(node, (tuple, list)):
            return type(node)(visit(v) for v in node)
        if isinstance(node, dict):
            return {k: visit(v) for k, v in node.items()}
        return node

    return visit(opt_state)


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
    schedule: Callable = None,
    *,
    base_lr: float = None,
) -> optax.GradientTransformation:
    """Optax chain with a stateful triangular schedule.

    When `schedule` is given it is used directly (legacy closure form);
    otherwise the triangular schedule runs off ScheduleState inside the
    optimizer state (see set_schedule), keeping one compiled step across
    tasks.
    """
    b1, b2 = config.betas
    lr_mul = config.lr_mul
    wd = config.weight_decay
    top_mask, decay_mask = param_group_masks(params)

    mu_dtype = getattr(config, "adam_mu_dtype", None)
    if config.optim == "adamw":
        scale = optax.scale_by_adam(b1=b1, b2=b2, eps=1e-6, mu_dtype=mu_dtype)
        decoupled_wd = True
    elif config.optim == "adam":
        scale = optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8, mu_dtype=mu_dtype)
        decoupled_wd = False
    elif config.optim == "adamax":
        scale = optax.scale_by_adamax(b1=b1, b2=b2, eps=1e-8)
        decoupled_wd = False
    else:
        raise ValueError(f"invalid optimizer {config.optim}")

    chain = []
    if config.grad_norm and config.grad_norm > 0:
        chain.append(clip_by_global_norm_recorded(config.grad_norm))
    if wd > 0 and not decoupled_wd:
        # classic L2: grad += wd * theta before the moment updates
        chain.append(optax.add_decayed_weights(wd, mask=decay_mask))
    chain.append(scale)
    if wd > 0 and decoupled_wd:
        # AdamW: theta -= lr_group * (adam_dir + wd * theta)
        chain.append(optax.add_decayed_weights(wd, mask=decay_mask))

    lr0 = config.learning_rate if base_lr is None else base_lr

    if schedule is not None:
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
    else:
        def per_group_lr_state(updates, state: ScheduleState, params=None):
            del params
            lr = lr0 * triangular_factor(state)

            def apply(u, is_top):
                return -(lr * (lr_mul if is_top else 1.0)) * u

            updates = jax.tree.map(apply, updates, top_mask)
            return updates, ScheduleState(state.count + 1, state.warmup_steps, state.total_steps)

        lr_transform = optax.GradientTransformation(
            init=lambda params: ScheduleState(
                jnp.zeros((), jnp.int32), jnp.ones((), jnp.int32), jnp.ones((), jnp.int32)
            ),
            update=per_group_lr_state,
        )
    chain.append(lr_transform)
    return optax.chain(*chain)
