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
    # memory stream state (ER / featdistill): strategies with replay memory
    # set _mem_loader/_mem_iter; mem_draws counts batches drawn since the
    # last rebuild so resume bundles can fast-forward the seeded stream
    _mem_iter = None
    _mem_loader = None
    mem_draws = 0

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

    # -- fused accumulation windows -------------------------------------------
    def supports_fused_window(self, window: int) -> bool:
        """Whether the replay cadence folds into fixed windows of `window`
        microbatches (trainer/runner.py window mode). CE-only strategies and
        ER always fold (every position is a CE batch); strategies whose
        replay step is NOT plain CE must override."""
        return True

    def window_batches(self, runner, idx_batches):
        """Map one window's (batch_idx, device_batch) list to CE batches,
        substituting memory batches at replay positions (the reference
        REPLACES the task batch, vqa_cont_learner.py:216-218)."""
        return [
            self.next_memory_batch() if self.is_replay_batch(i) else b
            for i, b in idx_batches
        ]

    def window_step(self, runner, state, idx_batches):
        """One optimizer update over a full accumulation window."""
        return runner.ce_window_step(state, runner.stack_window(self.window_batches(runner, idx_batches)))

    def next_memory_batch(self):
        if self._mem_iter is None:
            raise NotImplementedError(f"{self.name} has no memory stream")
        self.mem_draws += 1
        return next(self._mem_iter)

    def fast_forward_memory(self, runner, n_draws: int) -> None:
        """Mid-task resume: skip the first n_draws batches of the seeded
        infinite memory stream (index-level — no decode/collate is paid for
        skipped draws), so post-resume replay/distill batches match the
        uninterrupted run's. No-op for strategies without memory."""
        if n_draws <= 0 or self._mem_loader is None:
            return
        self._mem_loader.set_draws(n_draws)
        self._mem_iter = iter(runner.memory_batches(self._mem_loader))
        self.mem_draws = n_draws

    # -- task-level ---------------------------------------------------------
    def update(self, runner, state, dataset, loader) -> None:
        """After finishing a task, before evaluating (train.py:206-213)."""
        self.task_id += 1

    def update_after_new_task(self, runner, state, dataset) -> None:
        pass


class Naive(CLStrategy):
    """Plain sequential finetuning (methods/base.py:50-57)."""

    name = "naive"
