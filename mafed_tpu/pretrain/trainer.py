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
    # SPMD: (data, model) mesh built by the entry point over all devices;
    # -1 infers the axis (core/mesh.make_mesh). The HF world_size batch
    # scaling applies: global batch = per_device_train_batch_size x mesh size
    mesh_shape: tuple = (-1, 1)
    distributed_init: bool = False  # force jax.distributed.initialize()


class PretrainTrainer:
    def __init__(
        self,
        model_cfg: ModelConfig,
        args: PretrainConfig,
        train_dataset,
        eval_dataset=None,
        tokenizer=None,
        init_params: Optional[Dict[str, Any]] = None,
        mesh=None,
    ) -> None:
        """mesh: optional jax.sharding.Mesh for SPMD pretraining. HF Trainer
        batch semantics are preserved (hf.py world_size scaling): the global
        batch is per_device_train_batch_size x mesh size, sharded over the
        'data' axis; params place per core/mesh.param_partition_spec (DP
        replication, Megatron TP when the 'model' axis > 1). Multi-process
        pods get per-host sharded loaders, rank-0 writer gating, and
        collective opt-state checkpoints — same machinery as the CL runner."""
        from mafed_tpu.core.dist import is_main_process, maybe_initialize_distributed

        maybe_initialize_distributed(args)
        self.model_cfg = model_cfg
        self.args = args
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.is_main = is_main_process()
        os.makedirs(args.output_dir, exist_ok=True)
        self.metrics = (
            MetricsLogger(project=args.project_name, name=args.run_name, output_dir=args.output_dir)
            if self.is_main
            else None
        )
        if init_params is None:
            init_params = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(args.seed))
        if mesh is not None:
            from mafed_tpu.core.mesh import batch_sharding, shard_params

            init_params = shard_params(init_params, mesh)
            self._batch_sharding = batch_sharding(mesh)
        else:
            self._batch_sharding = None
        self._params0 = init_params

        n_dev = mesh.size if mesh is not None else 1
        self.global_batch = args.per_device_train_batch_size * n_dev
        accum = max(1, args.gradient_accumulation_steps)
        batches_per_epoch = len(train_dataset) // self.global_batch
        self.steps_per_epoch = max(1, batches_per_epoch // accum)
        self.total_steps = self.steps_per_epoch * args.num_train_epochs
        warmup = int(args.warmup_ratio * self.total_steps)
        schedule = linear_warmup_schedule(args.learning_rate, warmup, self.total_steps)

        tcfg = TrainConfig(
            batch_size=self.global_batch,
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
        """COLLECTIVE on multi-process pods (every process writes its
        opt_state shards); host-side artifacts (safetensors, meta, pruning)
        are rank-0-gated — same pattern as the CL runner's resume bundles."""
        path = self._ckpt_dir(tag) if isinstance(tag, int) else os.path.join(self.args.output_dir, tag)
        os.makedirs(path, exist_ok=True)
        if self.is_main:
            params = merge_params(state.trainable, state.frozen)
            save_task_checkpoint(params, self.model_cfg, os.path.join(path, "model.safetensors"))
        import orbax.checkpoint as ocp

        from mafed_tpu.utils.checkpoint import atomic_json_commit, collective_opt_state_save

        opt_path = os.path.abspath(os.path.join(path, "opt_state"))
        ckptr = ocp.StandardCheckpointer()
        collective_opt_state_save(
            ckptr, opt_path, state.opt_state, barrier_name="pretrain_ckpt_rmtree"
        )
        if self.is_main:
            meta = {
                "step": int(state.step),
                "epoch": epoch,
                "batch_idx": batch_idx,
                "rng_state": rng.bit_generator.state,
            }
            # commit marker written last (see atomic_json_commit)
            atomic_json_commit(os.path.join(path, "trainer_state.json"), meta, default=str)
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
        if self.mesh is not None:
            # same global layout as init: host numpy would re-ship the model
            # through jit on the first post-resume step, and the restored
            # opt_state's sharded layout must match
            from mafed_tpu.core.mesh import shard_params

            params = shard_params(params, self.mesh)
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

    # -- loaders ---------------------------------------------------------------
    def _loader(self, dataset, global_batch: int, text_len: int, shuffle: bool, seed: int = 0) -> BatchLoader:
        """Per-host sharded loader: every process walks the same seeded order
        and collates its interleaved slice of each GLOBAL batch; drop_last
        keeps per-process batch counts equal (SPMD steps are collective)."""
        n_proc = jax.process_count()
        if global_batch % n_proc != 0:
            raise ValueError(
                f"global batch {global_batch} not divisible by {n_proc} processes"
            )
        return BatchLoader(
            dataset,
            batch_size=global_batch // n_proc,
            collate=partial(collate_pretrain, text_len=text_len),
            shuffle=shuffle,
            seed=seed,
            drop_last=True,
            shard_id=jax.process_index(),
            num_shards=n_proc,
        )

    def _batches(self, loader):
        return DevicePrefetcher(loader, sharding=self._batch_sharding)

    # -- eval ------------------------------------------------------------------
    def evaluate(self, state: TrainState, text_len: int) -> float:
        if self.eval_dataset is None:
            return float("nan")
        n_dev = self.mesh.size if self.mesh is not None else 1
        loader = self._loader(
            self.eval_dataset, self.args.per_device_eval_batch_size * n_dev,
            text_len, shuffle=False,
        )
        losses = []
        for batch in self._batches(loader):
            # SPMD loss over the global sharded batch: identical scalar on
            # every process — no extra reduction needed
            losses.append(float(self._eval_loss_fn(state.trainable, state.frozen, batch)))
        return float(np.mean(losses)) if losses else float("nan")

    # -- train -----------------------------------------------------------------
    def train(self, resume_from_checkpoint: Optional[str] = None) -> TrainState:
        args = self.args
        text_len = args.model_max_length
        trainable, frozen = split_params(self._params0)
        opt_state = self.tx.init(trainable)
        if self.mesh is not None:
            # collective orbax saves/restores before any post-init update
            # need globally-placed scalar leaves (core/mesh docstring)
            from mafed_tpu.core.mesh import globalize_scalar_leaves

            opt_state = globalize_scalar_leaves(opt_state, self.mesh)
        state = TrainState(jnp.zeros((), jnp.int32), trainable, jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen), opt_state)
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
            # The epoch shuffle order must be a pure function of (seed, epoch):
            # drawing it from the mutable `rng` would make a mid-epoch resume
            # re-draw with the POST-draw saved state — i.e. shuffle the resumed
            # epoch with the NEXT epoch's seed, so skip_batches would skip
            # batches of the wrong permutation (the reference instead restores
            # framework RNG state wholesale, hf.py:330-349; deriving the order
            # deterministically gives the same exact-resume guarantee without
            # global RNG coupling — same scheme as the CL runner).
            seed = int(np.random.default_rng([args.seed, epoch]).integers(0, 2**31 - 1))
            loader = self._loader(
                self.train_dataset, self.global_batch, text_len, shuffle=True, seed=seed
            )
            for batch_idx, batch in enumerate(self._batches(loader)):
                if epoch == start_epoch and batch_idx < skip_batches:
                    continue  # HF-style resume batch skipping
                state, m = self.step_fn(state, batch)
                is_opt_step = (batch_idx + 1) % accum == 0
                if not is_opt_step:
                    continue
                opt_steps += 1
                if self.metrics is not None and opt_steps % args.logging_steps == 0:
                    self.metrics.log_metrics({"train/loss": float(m["loss"])}, step=opt_steps)
                if opt_steps % eval_every == 0:
                    eval_loss = self.evaluate(state, text_len)
                    if self.metrics is not None:
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
