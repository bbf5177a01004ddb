"""Experience replay (ER).

Parity: mafed/methods/replay.py — after each task, memory_size/(T-1) random
samples (seeded numpy choice without replacement, :37-42) join the memory;
every replay_interval-th training batch is swapped for a memory batch whose
loss is plain CE (:68-72). The memory stream here is an infinite shuffled
BatchLoader (the reference re-creates an iterator per replay, :69 —
effectively random batches; we keep a persistent shuffled stream which is
the same distribution without iterator-restart overhead).
"""

from __future__ import annotations

from typing import List

import numpy as np

from mafed_tpu.cl.base import CLStrategy
from mafed_tpu.core.logging import LOGGER
from mafed_tpu.data.vqa_dataset import ConcatDataset, Subset


class ER(CLStrategy):
    name = "replay"
    needs_replay = True

    def __init__(self, config, model_cfg, **kwargs) -> None:
        super().__init__(config, model_cfg)
        self.memory_size = config.cl_memory
        num_mem_tasks = max(1, len(config.tasks or []) - 1)
        self.memory_per_task = int(self.memory_size / num_mem_tasks)
        self.rng = np.random.default_rng(config.seed)
        self.datasets: List = []
        self._mem_iter = None

    def _rebuild_memory_loader(self, runner) -> None:
        mem_dataset = ConcatDataset(self.datasets)
        self._mem_loader = runner.make_train_loader(mem_dataset, infinite=True, seed=1)
        self._mem_iter = iter(runner.memory_batches(self._mem_loader))
        self.mem_draws = 0
        LOGGER.info("replay memory: %d samples over %d tasks", len(mem_dataset), len(self.datasets))

    def replay_step(self, runner, state):
        batch = self.next_memory_batch()
        return runner.ce_step(state, batch)

    def update(self, runner, state, dataset, loader) -> None:
        self.task_id += 1
        indices = self.rng.choice(np.arange(len(dataset)), self.memory_per_task, replace=False)
        self.datasets.append(Subset(dataset, indices.tolist()))
        self._rebuild_memory_loader(runner)
