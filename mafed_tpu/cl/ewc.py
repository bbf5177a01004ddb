"""Online EWC.

Parity: mafed/methods/ewc.py — after each task the diagonal Fisher is
estimated as mean squared gradients of (batch_size x loss) over the task
loader (:70-103); online accumulation F <- new + 0.95 * F_old (:53-68); the
quadratic penalty 0.5*lambda*sum(F*(theta-theta*)^2) is added to the loss
(:105-127). TPU-first: the grad^2 accumulation is a single jitted function
re-invoked per batch with a donated accumulator (no host round-trips), and
the penalty term lives inside the compiled train step.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from mafed_tpu.cl.base import CLStrategy
from mafed_tpu.core.logging import LOGGER


class EWC(CLStrategy):
    name = "ewc"

    def __init__(self, config, model_cfg, online: bool = True, online_factor: float = 0.95, **kwargs) -> None:
        super().__init__(config, model_cfg)
        self.reg_lambda = config.reg_lambda
        self.online = online
        self.online_factor = online_factor
        self.fisher: Optional[Any] = None
        self.old_params: Optional[Any] = None

    @property
    def ewc_state(self) -> Optional[Tuple[Any, Any]]:
        if self.task_id == 0 or self.fisher is None:
            return None
        return (self.fisher, self.old_params)

    def train_step(self, runner, state, batch):
        if self.ewc_state is not None:
            return runner.ewc_step(state, batch, self.ewc_state)
        return runner.ce_step(state, batch)

    def window_step(self, runner, state, idx_batches):
        stacked = runner.stack_window(self.window_batches(runner, idx_batches))
        if self.ewc_state is not None:
            return runner.ewc_window_step(state, stacked, self.ewc_state)
        return runner.ce_window_step(state, stacked)

    def update(self, runner, state, dataset, loader) -> None:
        """Estimate Fisher over the finished task's loader (ewc.py:53-103)."""
        LOGGER.info("EWC: computing importances over %d batches", len(loader))
        importances = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), state.trainable)
        total = 0
        for batch in runner.device_batches(loader):
            bsz = int(batch["input_ids"].shape[0])
            importances = runner.fisher_step(state.trainable, state.frozen, batch, importances)
            total += bsz
        importances = jax.tree.map(lambda x: x / max(total, 1), importances)

        # stored dtype: f32 fisher+anchor = 2x model size in HBM; bf16 halves
        # it (needed at 1B next to Adam state) — the penalty still reduces
        # in f32 (training/step.ewc_penalty upcasts)
        store = jnp.bfloat16 if self.config.ewc_state_dtype == "bfloat16" else jnp.float32
        if self.online and self.fisher is not None and self.task_id >= 1:
            self.fisher = jax.tree.map(
                lambda new, old: (new + self.online_factor * old.astype(jnp.float32)).astype(store),
                importances, self.fisher,
            )
        else:
            self.fisher = jax.tree.map(lambda x: x.astype(store), importances)
        self.old_params = jax.tree.map(lambda p: p.astype(store), state.trainable)
        self.task_id += 1
