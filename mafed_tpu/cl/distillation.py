"""Feature distillation / MAFED.

Parity: mafed/methods/distillation.py + distillation_loss_weights.py —
on every replay_interval-th batch: optional replay CE (x replay_coeff) plus
per-layer hidden-state distillation of the student against the previous
task's best model (the teacher), with gamma-discounted layer weights and
equal / balanced / adaptive modality weights. The adaptive weights are
gradient-based modality importances averaged over the task loader and
running-averaged across tasks (dl_weights.py:62-69).

TPU-first: teacher+student run in ONE fused jitted step sharing a single
vision pass (training/step.make_distill_step); adaptive importances come
from a jitted perturbation-gradient function instead of retain_graph
autograd loops.
"""

from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from mafed_tpu.cl.base import CLStrategy
from mafed_tpu.core.logging import LOGGER
from mafed_tpu.data.vqa_dataset import ConcatDataset, Subset
from mafed_tpu.training.step import distillation_layers


class FeatureDistillation(CLStrategy):
    name = "featdistill"
    needs_replay = True

    def __init__(self, config, model_cfg, **kwargs) -> None:
        super().__init__(config, model_cfg)
        self.memory_size = config.cl_memory
        num_mem_tasks = max(1, len(config.tasks or []) - 1)
        self.memory_per_task = int(self.memory_size / num_mem_tasks)
        self.rng = np.random.default_rng(config.seed)
        self.datasets: List = []
        self._mem_iter = None
        self.teacher_trainable = None

        self.strategy = config.distillation_modality_weighing_strategy
        num_hl = model_cfg.num_hidden_layers - 1  # train.py:133
        self.layers = distillation_layers(
            config.distillation_layer_weighing_strategy, num_hl, config.distillation_layer
        )
        if self.strategy == "balanced":
            # fixed 0.5/0.5 (dl_weights.py:30-31,165-166)
            self.lang_coeff = np.full((len(self.layers),), 0.5, np.float32)
        else:
            self.lang_coeff = np.ones((len(self.layers),), np.float32)  # placeholder

    # -- steps ----------------------------------------------------------------
    def replay_step(self, runner, state):
        batch = self.next_memory_batch()
        return runner.distill_step(
            state, self.teacher_trainable, batch, jnp.asarray(self.lang_coeff)
        )

    def supports_fused_window(self, window: int) -> bool:
        """The fused MAFED window step holds exactly window-1 CE microbatches
        + 1 distill microbatch, so each window may contain at most one replay
        position: replay_interval >= window (the canonical config has
        replay_interval == accumulate_grad_batches == 4)."""
        return self.config.replay_interval >= window

    def window_step(self, runner, state, idx_batches):
        replay_positions = [j for j, (i, _) in enumerate(idx_batches) if self.is_replay_batch(i)]
        if not replay_positions:  # task 0 (no teacher) or an off-cadence window
            batches = [b for _, b in idx_batches]
            return runner.ce_window_step(state, runner.stack_window(batches))
        ce_batches = [b for j, (_, b) in enumerate(idx_batches) if j not in replay_positions]
        # gradient averaging is position-independent, so the distill batch's
        # slot inside the window doesn't matter
        return runner.mafed_window_step(
            state,
            self.teacher_trainable,
            runner.stack_window(ce_batches),
            self.next_memory_batch(),
            jnp.asarray(self.lang_coeff),
        )

    # -- task transitions -------------------------------------------------------
    def update(self, runner, state, dataset, loader) -> None:
        """Teacher <- finished model; memory += subset; adaptive weights."""
        # teacher = copy of the (just reloaded best) trainable params, frozen
        # in bf16 (the reference teacher runs under bf16 autocast anyway,
        # distillation.py:90) — halves teacher HBM footprint
        self.teacher_trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), state.trainable)

        indices = self.rng.choice(np.arange(len(dataset)), self.memory_per_task, replace=False)
        assert len(set(indices.tolist())) == self.memory_per_task
        self.datasets.append(Subset(dataset, indices.tolist()))
        mem_dataset = ConcatDataset(self.datasets)
        mem_dataset = self._maybe_prime_teacher_cache(runner, state, mem_dataset)
        self._mem_loader = runner.make_train_loader(mem_dataset, infinite=True, seed=1)
        self._mem_iter = iter(runner.memory_batches(self._mem_loader))
        self.mem_draws = 0
        LOGGER.info("featdistill memory: %d samples", len(mem_dataset))

        if self.strategy == "adaptive":
            importances = self._compute_adaptive_weights(runner, state, loader)
            if self.task_id < 1:
                self.lang_coeff = importances
            else:
                # running average across tasks (dl_weights.py:62-69)
                self.lang_coeff = (importances + self.task_id * self.lang_coeff) / (self.task_id + 1)
            LOGGER.info("adaptive lang coefficients: %s", np.round(self.lang_coeff, 4))
        self.task_id += 1

    def _maybe_prime_teacher_cache(self, runner, state, mem_dataset):
        """Teacher-state cache (data/teacher_cache.py): the teacher is frozen
        for the whole task and the memory set is fixed, so each memory
        example's teacher hidden states are computed ONCE here and the
        steady-state distill step drops the teacher forward entirely."""
        import time

        from functools import partial

        from mafed_tpu.data.collate import collate_train
        from mafed_tpu.data.teacher_cache import (
            TeacherStateCache,
            TeacherStateView,
            prime_teacher_cache,
            resolve_teacher_cache_mode,
            teacher_seq_len,
        )

        cfg = self.config
        mode = resolve_teacher_cache_mode(getattr(cfg, "teacher_state_cache", "off"))
        if mode == "off" or self.teacher_trainable is None:
            runner.teacher_table = None
            return mem_dataset
        deepest_tap = max(self.layers) if self.layers else 0
        if cfg.distillation_coeff == 0 or not self.layers:
            runner.teacher_table = None
            return mem_dataset  # pure-replay ablation: teacher never read
        seq_len = teacher_seq_len(self.model_cfg, runner.train_text_len)

        from mafed_tpu.data.teacher_cache import teacher_table_nbytes

        # the budget decision is a pure function of sizes known BEFORE
        # priming, so "auto" can skip the (expensive) priming pass entirely
        # for over-budget memory sets — and every process of a pod takes the
        # same branch
        n_mem = len(mem_dataset)
        budget = getattr(cfg, "device_teacher_table_mb", 0) * (1 << 20)
        need = teacher_table_nbytes(n_mem, deepest_tap + 1, seq_len, self.model_cfg.hidden_size)
        if mode == "auto" and not (0 < need <= budget):
            LOGGER.info(
                "teacher cache auto: %.1f MB of states exceeds "
                "device_teacher_table_mb=%d — keeping the in-step teacher",
                need / (1 << 20), getattr(cfg, "device_teacher_table_mb", 0),
            )
            runner.teacher_table = None
            return mem_dataset
        cache = TeacherStateCache(
            getattr(cfg, "teacher_cache_dir", None) or os.path.join(cfg.output_dir, "teacher_cache"),
            generation=self.task_id,
            n_states=deepest_tap + 1,
            seq_len=seq_len,
            hidden=self.model_cfg.hidden_size,
        )
        cache.drop_older_generations()
        t0 = time.time()
        n = prime_teacher_cache(
            cache, mem_dataset, self.teacher_trainable, state.frozen, self.model_cfg,
            collate=partial(
                collate_train,
                text_len=runner.train_text_len,
                label_tail=getattr(cfg, "label_tail", 0) or None,
            ),
            deepest_tap=deepest_tap,
            batch_size=cfg.batch_size,
            vision_table=runner.vision_table,
        )
        if n:
            LOGGER.info(
                "teacher cache gen%d: %d example states in %.1fs",
                self.task_id, n, time.time() - t0,
            )

        # HBM tier (VERDICT r3 #4a): when the whole memory set's states fit
        # --device_teacher_table_mb they live in HBM for the task and memory
        # batches carry 4-byte t_idx rows — no per-draw streaming at all.
        # Detach the previous generation's table first: its rows belong to
        # the OLD teacher. The budget decision is a pure function of sizes,
        # so every process of a pod takes the same branch.
        runner.teacher_table = None
        from mafed_tpu.data.teacher_cache import TeacherIndexView, build_teacher_table
        from mafed_tpu.data.vqa_dataset import question_id_of

        if 0 < need <= budget:
            qids = [question_id_of(mem_dataset, i) for i in range(n_mem)]
            table = build_teacher_table(cache, qids, mesh=runner.mesh)
            runner.teacher_table = table
            LOGGER.info(
                "teacher table gen%d: %d examples, %.1f MB in HBM",
                self.task_id, n_mem, table.nbytes / (1 << 20),
            )
            return ConcatDataset([TeacherIndexView(d, table) for d in self.datasets])
        if need:
            LOGGER.info(
                "teacher table gen%d: %.1f MB exceeds device_teacher_table_mb=%d — "
                "streaming cached states instead",
                self.task_id, need / (1 << 20), getattr(cfg, "device_teacher_table_mb", 0),
            )
        return ConcatDataset([TeacherStateView(d, cache) for d in self.datasets])

    def _compute_adaptive_weights(self, runner, state, loader) -> np.ndarray:
        """Dataset-level modality importances (dl_weights.py:91-146)."""
        lang_sums = np.zeros((len(self.layers),), np.float64)
        image_sums = np.zeros((len(self.layers),), np.float64)
        n_lang = 0.0
        n_image = 0.0
        for batch in runner.device_batches(loader):
            ls, ims, nl, ni = runner.adaptive_weights_step(state.trainable, state.frozen, batch)
            lang_sums += np.asarray(ls, np.float64)
            image_sums += np.asarray(ims, np.float64)
            n_lang += float(nl)
            n_image += float(ni)
        lang_imp = lang_sums / max(n_lang, 1e-9)
        image_imp = image_sums / max(n_image, 1e-9)
        return (lang_imp / (lang_imp + image_imp)).astype(np.float32)
