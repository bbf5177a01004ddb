"""Pretraining trainer: captioning pretrain with full resume.

TPU-native replacement for the vendored HF Trainer loop
(mafed/trainer/hf.py:131-615) and the pretrain entry
(mafed/pretrain_vlpythia.py). Capabilities preserved:
  * epochs, grad accumulation (optax.MultiSteps), clipping, linear
    warmup (warmup_ratio) schedule
  * periodic eval (val loss) and periodic checkpoints `checkpoint-<step>`
    with a rolling save_total_limit, plus `checkpoint-final` at the end
    (hf.py:554-561)
  * full resume: params + optimizer state (orbax) + step/epoch + numpy RNG
    state restore with skip-batches to reach the saved position
    (hf.py:330-349,414-423,439-450)
  * best-model tracking on eval loss (load_best_model_at_end)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mafed_tpu.core.config import ModelConfig, TrainConfig
from mafed_tpu.core.logging import LOGGER, MetricsLogger
from mafed_tpu.data.loader import BatchLoader
from mafed_tpu.data.prefetch import DevicePrefetcher
from mafed_tpu.models import vl_pythia
from mafed_tpu.optim.optimizer import build_optimizer
from mafed_tpu.optim.sched import linear_warmup_schedule
from mafed_tpu.pretrain.dataset import collate_pretrain
from mafed_tpu.training.step import make_train_step, _ce_loss
from mafed_tpu.training.train_state import TrainState, merge_params, split_params
from mafed_tpu.utils.checkpoint import save_task_checkpoint, load_task_checkpoint


@dataclass
class PretrainConfig:
    """Pretraining arguments (parity: pretrain_vlpythia.py:16-81)."""

    output_dir: str = "storage/pretrain-pythia"
    per_device_train_batch_size: int = 128
    per_device_eval_batch_size: int = 128
    gradient_accumulation_steps: int = 1
    num_train_epochs: int = 2
    learning_rate: float = 2e-5
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    max_grad_norm: float = 1.0
    save_steps: float = 0.1  # fraction of total steps
    eval_steps: float = 0.1
    save_total_limit: int = 2
    load_best_model_at_end: bool = True
    logging_steps: int = 1
    seed: int = 12345
    model_max_length: int = 100
    betas: tuple = (0.9, 0.999)
    run_name: str = "pretrain-vl-pythia"
    project_name: str = "cl-pretrain-vl-pythia"


class PretrainTrainer:
    def __init__(
        self,
        model_cfg: ModelConfig,
        args: PretrainConfig,
        train_dataset,
        eval_dataset=None,
        tokenizer=None,
        init_params: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.model_cfg = model_cfg
        self.args = args
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.tokenizer = tokenizer
        os.makedirs(args.output_dir, exist_ok=True)
        self.metrics = MetricsLogger(
            project=args.project_name, name=args.run_name, output_dir=args.output_dir
        )
        if init_params is None:
            init_params = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(args.seed))
        self._params0 = init_params

        accum = max(1, args.gradient_accumulation_steps)
        batches_per_epoch = len(train_dataset) // args.per_device_train_batch_size
        self.steps_per_epoch = max(1, batches_per_epoch // accum)
        self.total_steps = self.steps_per_epoch * args.num_train_epochs
        warmup = int(args.warmup_ratio * self.total_steps)
        schedule = linear_warmup_schedule(args.learning_rate, warmup, self.total_steps)

        tcfg = TrainConfig(
            batch_size=args.per_device_train_batch_size,
            accumulate_grad_batches=accum,
            learning_rate=args.learning_rate,
            weight_decay=args.weight_decay,
            grad_norm=args.max_grad_norm,
            optim="adamw",
            betas=list(args.betas),
            seed=args.seed,
            # captions supervise EVERY position — the CL answer-tail
            # restriction does not apply to pretraining
            label_tail=0,
        )
        self._train_cfg = tcfg
        trainable, _ = split_params(init_params)
        tx = build_optimizer(tcfg, trainable, schedule)
        if accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        self.tx = tx
        self.step_fn = make_train_step(model_cfg, tcfg, tx)
        self._eval_loss_fn = jax.jit(
            lambda trainable, frozen, batch: _ce_loss(
                trainable, frozen, model_cfg, batch, jnp.bfloat16, "auto"
            )
        )

    # -- checkpointing -------------------------------------------------------
    def _ckpt_dir(self, step: int) -> str:
        return os.path.join(self.args.output_dir, f"checkpoint-{step}")

    def save_checkpoint(self, state: TrainState, tag, rng: np.random.Generator, epoch: int, batch_idx: int) -> str:
        path = self._ckpt_dir(tag) if isinstance(tag, int) else os.path.join(self.args.output_dir, tag)
        os.makedirs(path, exist_ok=True)
        params = merge_params(state.trainable, state.frozen)
        save_task_checkpoint(params, self.model_cfg, os.path.join(path, "model.safetensors"))
        import orbax.checkpoint as ocp

        opt_path = os.path.abspath(os.path.join(path, "opt_state"))
        if os.path.exists(opt_path):
            shutil.rmtree(opt_path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(opt_path, state.opt_state)
        ckptr.wait_until_finished()
        meta = {
            "step": int(state.step),
            "epoch": epoch,
            "batch_idx": batch_idx,
            "rng_state": rng.bit_generator.state,
        }
        # atomic commit marker (written last): a kill mid-save must leave
        # either no trainer_state.json (checkpoint ignored) or a complete one
        meta_path = os.path.join(path, "trainer_state.json")
        tmp = f"{meta_path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, default=str)
        os.replace(tmp, meta_path)
        self._prune_checkpoints()
        return path

    def _prune_checkpoints(self) -> None:
        ckpts = sorted(
            (d for d in os.listdir(self.args.output_dir) if d.startswith("checkpoint-") and d.split("-")[-1].isdigit()),
            key=lambda d: int(d.split("-")[-1]),
        )
        while len(ckpts) > self.args.save_total_limit:
            victim = ckpts.pop(0)
            shutil.rmtree(os.path.join(self.args.output_dir, victim))

    def load_checkpoint(self, path: str, state: TrainState):
        params = load_task_checkpoint(os.path.join(path, "model.safetensors"), self.model_cfg)
        trainable, frozen = split_params(params)
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        opt_state = ckptr.restore(
            os.path.abspath(os.path.join(path, "opt_state")), state.opt_state
        )
        with open(os.path.join(path, "trainer_state.json")) as f:
            meta = json.load(f)
        new_state = TrainState(jnp.asarray(meta["step"], jnp.int32), trainable, state.frozen, opt_state)
        return new_state, meta

    # -- eval ------------------------------------------------------------------
    def evaluate(self, state: TrainState, text_len: int) -> float:
        if self.eval_dataset is None:
            return float("nan")
        loader = BatchLoader(
            self.eval_dataset,
            batch_size=self.args.per_device_eval_batch_size,
            collate=partial(collate_pretrain, text_len=text_len),
            shuffle=False,
            drop_last=True,
        )
        losses = []
        for batch in DevicePrefetcher(loader):
            losses.append(float(self._eval_loss_fn(state.trainable, state.frozen, batch)))
        return float(np.mean(losses)) if losses else float("nan")

    # -- train -----------------------------------------------------------------
    def train(self, resume_from_checkpoint: Optional[str] = None) -> TrainState:
        args = self.args
        text_len = args.model_max_length
        trainable, frozen = split_params(self._params0)
        state = TrainState(jnp.zeros((), jnp.int32), trainable, jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen), self.tx.init(trainable))
        rng = np.random.default_rng(args.seed)
        start_epoch, skip_batches = 0, 0
        if resume_from_checkpoint:
            state, meta = self.load_checkpoint(resume_from_checkpoint, state)
            rng.bit_generator.state = meta["rng_state"]
            start_epoch = meta["epoch"]
            skip_batches = meta["batch_idx"] + 1
            LOGGER.info("resumed from %s (epoch %d, batch %d)", resume_from_checkpoint, start_epoch, skip_batches)

        accum = max(1, args.gradient_accumulation_steps)
        save_every = max(1, int(args.save_steps * self.total_steps))
        eval_every = max(1, int(args.eval_steps * self.total_steps))
        best_loss, best_path = float("inf"), None
        opt_steps = int(state.step)

        for epoch in range(start_epoch, args.num_train_epochs):
            seed = int(rng.integers(0, 2**31 - 1))
            loader = BatchLoader(
                self.train_dataset,
                batch_size=args.per_device_train_batch_size,
                collate=partial(collate_pretrain, text_len=text_len),
                shuffle=True,
                seed=seed,
                drop_last=True,
            )
            for batch_idx, batch in enumerate(DevicePrefetcher(loader)):
                if epoch == start_epoch and batch_idx < skip_batches:
                    continue  # HF-style resume batch skipping
                state, m = self.step_fn(state, batch)
                is_opt_step = (batch_idx + 1) % accum == 0
                if not is_opt_step:
                    continue
                opt_steps += 1
                if opt_steps % args.logging_steps == 0:
                    self.metrics.log_metrics({"train/loss": float(m["loss"])}, step=opt_steps)
                if opt_steps % eval_every == 0:
                    eval_loss = self.evaluate(state, text_len)
                    self.metrics.log_metrics({"eval/loss": eval_loss}, step=opt_steps)
                    LOGGER.info("step %d eval loss %.4f", opt_steps, eval_loss)
                    if eval_loss < best_loss:
                        best_loss = eval_loss
                        best_path = self.save_checkpoint(state, opt_steps, rng, epoch, batch_idx)
                        continue
                if opt_steps % save_every == 0:
                    self.save_checkpoint(state, opt_steps, rng, epoch, batch_idx)
            skip_batches = 0

        # always save checkpoint-final (hf.py:554-561)
        self.save_checkpoint(state, "checkpoint-final", rng, args.num_train_epochs - 1, -1)
        if args.load_best_model_at_end and best_path is not None:
            params = load_task_checkpoint(os.path.join(best_path, "model.safetensors"), self.model_cfg)
            trainable, frozen = split_params(params)
            state = TrainState(state.step, trainable, state.frozen, state.opt_state)
        return state
