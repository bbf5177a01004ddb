"""LR schedules.

Parity: mafed/optim/sched.py — "triangular" = linear warmup then linear
decay to 0 (HF get_linear_schedule_with_warmup semantics, :34-48), plus the
functional warmup_linear_lr variant with a min_lr floor (:4-8).
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_warmup_schedule(learning_rate: float, warmup_steps: int, total_steps: int):
    """HF-style multiplicative schedule: step/warmup, then linear to 0."""
    warmup_steps = max(warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup_steps
        decay = jnp.maximum(
            0.0,
            (total_steps - step) / max(1, total_steps - warmup_steps),
        )
        return learning_rate * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def warmup_linear_lr(learning_rate: float, step: int, warmup_steps: int, total_steps: int, min_lr: float = 1e-8) -> float:
    """Host-side variant with a min_lr floor (sched.py:4-8)."""
    if step < warmup_steps:
        return step * (learning_rate - min_lr) / warmup_steps + min_lr
    return max(min_lr, learning_rate * (total_steps - step) / (total_steps - warmup_steps))


def constant_lr(learning_rate: float, **_) -> float:
    return learning_rate
