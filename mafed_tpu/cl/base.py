"""CL strategy protocol.

Mirrors the reference hook surface (mafed/methods/base.py:17-47): between
tasks ``update``; per-step the trainer asks the strategy whether this batch
is a replay batch (vqa_cont_learner.py:216-218: every replay_interval-th
batch on tasks > 0) and dispatches to the strategy's step. Strategies own
their jit-compiled step functions so each method stays a single fused XLA
program.
"""

from __future__ import annotations


class CLStrategy:
    """Base strategy: hooks are no-ops; loss is the task CE loss."""

    name = "naive"
    needs_replay = False

    def __init__(self, config, model_cfg, **kwargs) -> None:
        self.config = config
        self.model_cfg = model_cfg
        self.task_id = 0
        self.update_freq = max(1, getattr(config, "accumulate_grad_batches", 1) or 1)

    # -- step-level ---------------------------------------------------------
    def is_replay_batch(self, batch_idx: int) -> bool:
        """Every replay_interval-th batch replaces the task batch
        (vqa_cont_learner.py:216)."""
        if not self.needs_replay or self.task_id == 0:
            return False
        return (batch_idx + 1) % self.config.replay_interval == 0

    def replay_step(self, runner, state):
        raise NotImplementedError

    def train_step(self, runner, state, batch):
        """Default: the runner's plain CE step."""
        return runner.ce_step(state, batch)

    # -- task-level ---------------------------------------------------------
    def update(self, runner, state, dataset, loader) -> None:
        """After finishing a task, before evaluating (train.py:206-213)."""
        self.task_id += 1

    def update_after_new_task(self, runner, state, dataset) -> None:
        pass


class Naive(CLStrategy):
    """Plain sequential finetuning (methods/base.py:50-57)."""

    name = "naive"
