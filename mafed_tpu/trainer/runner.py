"""TaskRunner: compiled-step registry + per-task fit loop.

This replaces the per-task pytorch_lightning.Trainer of the reference
(mafed/train.py:284-301): epochs, gradient accumulation (optax.MultiSteps at
microbatch granularity, preserving the reference's replay cadence inside
accumulation windows), grad clipping (inside the optax chain), per-epoch
generative validation driving EarlyStopping(patience, min_delta=5e-5) and
top-1 best-checkpoint saving (train.py:243-263).
"""

from __future__ import annotations

import itertools
import json
import math
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mafed_tpu.constants import PATIENCE_THRESHOLD
from mafed_tpu.core import preempt
from mafed_tpu.core.config import ModelConfig, TrainConfig
from mafed_tpu.core.logging import LOGGER, MetricsLogger
from mafed_tpu.core.mesh import batch_sharding
from mafed_tpu.data.collate import collate_train
from mafed_tpu.data.loader import BatchLoader
from mafed_tpu.data.prefetch import DevicePrefetcher
from mafed_tpu.evaluation.decode import make_greedy_decoder
from mafed_tpu.evaluation.validate import validate_vqa
from mafed_tpu.optim.optimizer import build_optimizer, set_schedule
from mafed_tpu.training.step import (
    distillation_layers,
    make_adaptive_weights_fn,
    make_ce_window_step,
    make_distill_step,
    make_ewc_fisher_fn,
    make_mafed_window_step,
    make_train_step,
)
from mafed_tpu.training.train_state import TrainState, split_params


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class TaskRunner:
    def __init__(
        self,
        model_cfg: ModelConfig,
        config: TrainConfig,
        tokenizer,
        mesh=None,
        metrics: Optional[MetricsLogger] = None,
        attn_impl: str = "auto",
    ) -> None:
        self.model_cfg = model_cfg
        self.config = config
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.metrics = metrics
        self.attn_impl = attn_impl
        pad_m = max(1, config.text_pad_multiple)
        # question + answer + eos; static for the whole run
        self.train_text_len = _round_up(config.max_txt_len + 20, pad_m)
        self.val_text_len = _round_up(config.max_txt_len + 4, pad_m)
        self._batch_sharding = batch_sharding(mesh) if mesh is not None else None
        # SPMD eval sharding. Single-process: the mesh's batch sharding.
        # Multi-process: a globally-sharded decode would be collective, and
        # per-process val shards have unequal batch counts (deadlock) — so
        # each process decodes its own shard, but over ALL of its local
        # devices via a process-local mesh (params are DP-replicated, so a
        # local replicated copy is cheap); metric sums reduce afterwards.
        self.eval_param_sharding = None
        if jax.process_count() == 1:
            self.eval_sharding = self._batch_sharding
        else:
            local = jax.local_devices()
            if len(local) > 1 and config.val_batch_size % len(local) == 0:
                local_mesh = jax.sharding.Mesh(np.asarray(local), ("data",))
                self.eval_sharding = jax.sharding.NamedSharding(
                    local_mesh, jax.sharding.PartitionSpec("data")
                )
                self.eval_param_sharding = jax.sharding.NamedSharding(
                    local_mesh, jax.sharding.PartitionSpec()
                )
            else:
                # one addressable device (or an indivisible val batch):
                # decode on a single local device. Params must STILL be
                # localized — dispatching per-process decode on globally-
                # sharded params would be a collective over UNEQUAL per-host
                # batch counts (deadlock)
                self.eval_sharding = jax.sharding.SingleDeviceSharding(local[0])
                self.eval_param_sharding = jax.sharding.SingleDeviceSharding(local[0])

        self.decoder = make_greedy_decoder(
            model_cfg,
            eos_token_id=getattr(tokenizer, "eos_token_id", 0),
            attn_impl=attn_impl,
        )
        self.fisher_step = make_ewc_fisher_fn(model_cfg, config, attn_impl=attn_impl)
        # tap layer ids for the per-layer distill-loss metric keys; only
        # resolvable for distillation configs (the default 'single' strategy
        # without a distillation_layer is a non-distill run)
        try:
            self._distill_layer_ids = tuple(
                distillation_layers(
                    config.distillation_layer_weighing_strategy,
                    model_cfg.num_hidden_layers - 1,
                    config.distillation_layer,
                )
            )
        except ValueError:
            self._distill_layer_ids = ()
        self._adaptive_fn = None
        # per-task compiled steps (schedule changes per task)
        self.ce_step: Optional[Callable] = None
        self._ewc_step: Optional[Callable] = None
        self._distill_step: Optional[Callable] = None
        self._ce_window_step: Optional[Callable] = None
        self._ewc_window_step: Optional[Callable] = None
        self._mafed_window_step: Optional[Callable] = None
        self._ckptr = None  # persistent orbax checkpointer for resume bundles
        # bundle-save caches (_save_resume_bundle): reset per fit() so a
        # re-invoked task id can never alias a stale frozen tower or skip a
        # best.safetensors write on a tied best_acc (ADVICE r4)
        self._bundle_frozen_host = None
        self._bundle_frozen_task = None
        self._bundle_best_key = None
        # device-resident vision-feature table (data/vision_table.py), swapped
        # per task by the continual trainer; None = stream patches/pixels
        self.vision_table = None
        # device-resident teacher-state table (teacher_cache.
        # DeviceTeacherTable), swapped per task transition by the
        # distillation strategy; None = stream t_hs / in-step teacher
        self.teacher_table = None
        # accumulation-window fusion: microbatches per jit step (1 = the
        # per-microbatch optax.MultiSteps path)
        self.window = 1
        self._window_sharding = (
            None
            if mesh is None
            else jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data"))
        )
        self.tx = None

    # -- loaders -------------------------------------------------------------
    def make_train_loader(self, dataset, shuffle: bool = True, seed: Optional[int] = None, infinite: bool = False) -> BatchLoader:
        """Per-host sharded train loader (replaces DistributedSampler,
        reference replay.py:46-49): every process walks the SAME seeded epoch
        order but loads only its interleaved slice; config.batch_size is the
        GLOBAL batch, so each host collates batch_size/process_count rows and
        DevicePrefetcher assembles the global sharded array."""
        n_proc = jax.process_count()
        if self.config.batch_size % n_proc != 0:
            raise ValueError(
                f"global batch_size {self.config.batch_size} not divisible by "
                f"{n_proc} processes"
            )
        return BatchLoader(
            dataset,
            batch_size=self.config.batch_size // n_proc,
            collate=partial(
                collate_train,
                text_len=self.train_text_len,
                label_tail=getattr(self.config, "label_tail", 0) or None,
            ),
            shuffle=shuffle or infinite,
            seed=self.config.seed if seed is None else seed,
            num_workers=self.config.n_workers,
            drop_last=True,
            infinite=infinite,
            shard_id=jax.process_index(),
            num_shards=n_proc,
        )

    def device_batches(self, loader):
        # depth 2 measured BEST on the tunneled chip: flooding the transport
        # with a full window of in-flight device_puts (depth 2*window = 8)
        # regressed integrated throughput 80 -> 58 ex/s — queued transfers
        # contend with step dispatch. Knob for real-host tuning.
        depth = max(1, getattr(self.config, "prefetch_depth", 2))
        pf = DevicePrefetcher(loader, sharding=self._batch_sharding, depth=depth)
        if self.vision_table is None and self.teacher_table is None:
            return pf
        return self._resolving_iter(pf)

    def _resolving_iter(self, iterable):
        """Gather table rows (patch_idx -> patches, t_idx -> t_hs) as batches
        stream; a generator so close() propagates to the producer thread."""
        it = iter(iterable)
        try:
            for batch in it:
                yield self.resolve_tables(batch)
        finally:
            close = getattr(it, "close", None)
            if close:
                close()

    def resolve_tables(self, batch):
        """Device-table rows -> arrays via the attached tables (no-op
        otherwise): patch_idx -> patches (vision_table), t_idx -> t_hs
        (teacher_table). Device-to-device gathers, so the wire transfer per
        row stays 4 bytes."""
        if self.vision_table is not None and "patch_idx" in batch:
            batch = self.vision_table.resolve(batch)
        if self.teacher_table is not None and "t_idx" in batch:
            batch = self.teacher_table.resolve(batch)
        return batch

    def eval_resolve(self, batch):
        """patch_idx -> patches for DECODE batches (validate_vqa's `resolve`):
        the collective gather on the training mesh under a single controller;
        a per-process local gather (table localized like the params) on
        multi-process pods, where decode dispatch is non-collective."""
        if self.vision_table is None or "patch_idx" not in batch:
            return batch
        if self.eval_param_sharding is None:
            return self.vision_table.resolve(batch)
        return self.vision_table.resolve_local(batch, self.eval_param_sharding)

    @property
    def host_window(self) -> bool:
        """Single-controller fused windows keep microbatches on HOST and ship
        each window as ONE transfer inside stack_window (np.stack + a single
        async device_put that overlaps the previous window's step) — instead
        of per-microbatch device_puts plus device-side stacking. Multi-process
        pods keep device batches: the memory/distill shards differ per
        process, and the per-device assembly path is the tested SPMD form."""
        return self.window > 1 and jax.process_count() == 1

    def fit_batches(self, loader):
        """The fit loop's batch stream: host batches under host_window (the
        window stacker does the one transfer), device-prefetched otherwise."""
        return iter(loader) if self.host_window else self.device_batches(loader)

    def memory_batches(self, loader):
        """Memory/replay stream for strategies: the SAME layout policy as
        fit_batches so window composition never mixes host and device
        leaves."""
        return self.fit_batches(loader)

    # -- optimizer / state -----------------------------------------------------
    def ensure_window_policy(self, strategy) -> None:
        """Decide the fused-window size (and with it the host/device batch
        layout, `host_window`) BEFORE any memory stream exists.

        On a restart run, task transitions for SKIPPED tasks call
        strategy.update() — which builds the strategy's memory iterator via
        memory_batches — before setup_task_optimizer ever runs (skipped
        tasks train nothing). The policy is a pure function of config +
        strategy, so computing it here keeps the memory stream's layout
        identical to the one the next trained task's fit loop will use;
        leaving window at its initial 1 would hand fused-window fits a
        device-prefetched memory stream and violate memory_batches'
        "never mixes host and device leaves" contract.
        """
        if self.tx is not None:
            return  # policy frozen alongside the compiled steps
        accum = max(1, self.config.accumulate_grad_batches)
        fused = (
            self.config.fused_window
            and accum > 1
            and strategy is not None
            and strategy.supports_fused_window(accum)
        )
        self.window = accum if fused else 1

    def setup_task_optimizer(
        self, dataset_size: int, trainable_template: Dict[str, Any], strategy=None
    ) -> None:
        """Set the task's schedule horizon; build the optax chain ONCE.

        Reproduces the reference's warmup quirk faithfully: the schedule's
        horizon is ceil(batches/accum) * 60 — a constant "60 epochs" —
        regardless of the real max_epochs (vqa_cont_learner.py:62-63), with
        warmup_perc of that. The horizon lives in ScheduleState inside the
        optimizer state, so the jitted steps compile once and are reused
        for every task (recompiling a 400M-param step costs minutes).

        With config.fused_window (and a strategy whose replay cadence folds,
        CLStrategy.supports_fused_window) each accumulation window runs as
        ONE jit step on the raw optax chain; otherwise microbatch steps run
        under optax.MultiSteps. Both apply the optimizer once per window.
        """
        batches_per_epoch = dataset_size // self.config.batch_size
        accum = max(1, self.config.accumulate_grad_batches)
        total_steps = math.ceil(batches_per_epoch / accum) * 60
        warmup_steps = int(self.config.warmup_perc * total_steps)
        LOGGER.info("schedule: total=%d warmup=%d", total_steps, warmup_steps)
        self._sched = (warmup_steps, total_steps)

        if self.tx is None:
            # strategy=None (direct runner use, e.g. tests driving ce_step
            # themselves) keeps the MultiSteps path — fused windows change
            # what ce_step means per call
            self.ensure_window_policy(strategy)
            fused = self.window > 1
            tx = build_optimizer(self.config, trainable_template)
            if accum > 1 and not fused:
                tx = optax.MultiSteps(tx, every_k_schedule=accum)
            self.tx = tx
            self.ce_step = make_train_step(self.model_cfg, self.config, tx, attn_impl=self.attn_impl)
            if fused:
                LOGGER.info("fused accumulation windows: %d microbatches/step", accum)
        if self.window > 1 and batches_per_epoch < self.window:
            LOGGER.warning(
                "epoch has %d batches < window %d: accumulation windows span "
                "multiple epochs (microbatches carry over; an optimizer step "
                "only fires once a window fills)",
                batches_per_epoch, self.window,
            )

    def ewc_step(self, state, batch, ewc_state):
        if self._ewc_step is None:
            self._ewc_step = make_train_step(
                self.model_cfg, self.config, self.tx, with_ewc=True, attn_impl=self.attn_impl
            )
        return self._ewc_step(state, batch, ewc_state)

    def distill_step(self, state, teacher_trainable, batch, lang_coeffs):
        if self._distill_step is None:
            self._distill_step = make_distill_step(
                self.model_cfg, self.config, self.tx, attn_impl=self.attn_impl
            )
        return self._distill_step(state, teacher_trainable, self.resolve_tables(batch), lang_coeffs)

    # -- fused accumulation windows ---------------------------------------------
    def stack_window(self, batches):
        """Stack a window's device batches along a new leading microbatch dim,
        laid out P(None, 'data') so the batch dim stays sharded over 'data'.

        Each device stacks its OWN shards of the microbatches locally (a
        committed-device jnp.stack — no resharding, no host gather), then the
        global [n_mb, B, ...] array is assembled from the per-device pieces
        with make_array_from_single_device_arrays. This works identically on
        a single-controller mesh and on multi-process pods, where the
        microbatches are global jax.Arrays whose remote shards are NOT
        addressable — the previous global-stack + device_put form required
        every shard to be addressable and restricted fused windows to
        single-controller runs."""
        n_mb = len(batches)
        wsh = self._window_sharding
        if all(isinstance(x, np.ndarray) for x in jax.tree.leaves(batches[0])):
            # host batches (host_window, single-controller only — multi-
            # process streams always arrive as global jax.Arrays via
            # DevicePrefetcher): ONE stack + ONE async transfer per window.
            stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches)
            if wsh is None:
                return self.resolve_tables(jax.tree.map(jax.device_put, stacked))
            return self.resolve_tables(jax.device_put(stacked, wsh))
        if wsh is None:
            return self.resolve_tables(jax.tree.map(lambda *xs: jnp.stack(xs), *batches))

        def assemble(*xs):
            per_dev: Dict[Any, list] = {}
            for x in xs:
                for shard in x.addressable_shards:
                    per_dev.setdefault(shard.device, []).append(shard.data)
            arrays = [jnp.stack(datas) for datas in per_dev.values()]
            return jax.make_array_from_single_device_arrays(
                (n_mb,) + xs[0].shape, wsh, arrays
            )

        return self.resolve_tables(jax.tree.map(assemble, *batches))

    def ce_window_step(self, state, stacked):
        if self._ce_window_step is None:
            self._ce_window_step = make_ce_window_step(
                self.model_cfg, self.config, self.tx, attn_impl=self.attn_impl
            )
        return self._ce_window_step(state, stacked)

    def ewc_window_step(self, state, stacked, ewc_state):
        if self._ewc_window_step is None:
            self._ewc_window_step = make_ce_window_step(
                self.model_cfg, self.config, self.tx, with_ewc=True, attn_impl=self.attn_impl
            )
        return self._ewc_window_step(state, stacked, ewc_state)

    def mafed_window_step(self, state, teacher_trainable, ce_stacked, distill_batch, lang_coeffs):
        if self._mafed_window_step is None:
            self._mafed_window_step = make_mafed_window_step(
                self.model_cfg, self.config, self.tx,
                n_ce=self.window - 1, attn_impl=self.attn_impl,
            )
        if self._batch_sharding is not None and any(
            isinstance(x, np.ndarray) for x in jax.tree.leaves(distill_batch)
        ):
            # host_window memory batch on a multi-device mesh: place it with
            # the batch sharding explicitly — jit auto-placement would
            # replicate it instead of sharding over 'data'
            distill_batch = {
                k: jax.device_put(v, self._batch_sharding) if isinstance(v, np.ndarray) else v
                for k, v in distill_batch.items()
            }
        distill_batch = self.resolve_tables(distill_batch)
        return self._mafed_window_step(state, teacher_trainable, ce_stacked, distill_batch, lang_coeffs)

    def adaptive_weights_step(self, trainable, frozen, batch):
        if self._adaptive_fn is None:
            from mafed_tpu.training.step import distillation_layers

            num_hl = self.model_cfg.num_hidden_layers - 1
            layers = distillation_layers(
                self.config.distillation_layer_weighing_strategy,
                num_hl,
                self.config.distillation_layer,
            )
            self._adaptive_fn = make_adaptive_weights_fn(
                self.model_cfg, self.config, layers, attn_impl=self.attn_impl
            )
        return self._adaptive_fn(trainable, frozen, batch)

    def place_params(self, tree):
        """Put a host param pytree on device ONCE.

        Anything a strategy RETAINS and re-passes into jitted steps (the
        distillation teacher, EWC fisher/anchors, the post-task eval state)
        must be device-resident — a retained host numpy pytree silently
        re-transfers the full model through jit on EVERY call (measured
        ~5 ex/s MAFED epochs on the tunneled chip before this fix).

        Multi-process SPMD additionally needs GLOBAL arrays: shard_params
        applies the TP layout where configured and replication elsewhere
        (every process holds the same host values, so device_put just
        writes the addressable shards); optimizer moments follow via
        zeros_like, and host-local scalars auto-replicate at dispatch.
        """
        if self.mesh is not None and jax.process_count() > 1:
            from mafed_tpu.core.mesh import shard_params

            return shard_params(tree, self.mesh)
        return jax.device_put(tree)

    def init_state(self, params: Dict[str, Any]) -> TrainState:
        trainable, frozen = split_params(params)
        if self.tx is None:
            raise RuntimeError("call setup_task_optimizer first")
        trainable = self.place_params(trainable)
        frozen = self.place_params(frozen)
        opt_state = self.tx.init(trainable)
        opt_state = set_schedule(opt_state, *self._sched)
        if self.mesh is not None:
            # see core/mesh.globalize_scalar_leaves: collective orbax
            # saves/restores before any post-(re)init update need these
            from mafed_tpu.core.mesh import globalize_scalar_leaves

            opt_state = globalize_scalar_leaves(opt_state, self.mesh)
        frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
        return TrainState(jnp.zeros((), jnp.int32), trainable, frozen, opt_state)

    # -- resume bundles ----------------------------------------------------------
    # Epoch-granular mid-task resume (parity: PL resume_from_checkpoint,
    # train.py:323). A bundle = model safetensors + orbax opt state + fit
    # bookkeeping; saved each epoch, restored when config.resume_from_checkpoint
    # points at the bundle directory.

    def _save_resume_bundle(self, resume_dir: str, state: TrainState, meta: Dict[str, Any], best_trainable) -> None:
        """Save an epoch-granular resume bundle.

        COLLECTIVE on multi-process pods: the orbax save of a globally-
        sharded opt_state needs every process to participate (each writes its
        addressable shards to the shared dir) — rank-0-only gating here would
        deadlock or raise on non-addressable shards (ADVICE r2). Only the
        host-side artifacts (safetensors, fit_state.json) are rank-0 gated;
        params are DP-replicated so rank 0 can materialize them.
        """
        import orbax.checkpoint as ocp

        from mafed_tpu.core.dist import is_main_process
        from mafed_tpu.training.train_state import merge_params
        from mafed_tpu.utils.checkpoint import save_task_checkpoint

        main = is_main_process()
        t0 = time.time()
        os.makedirs(resume_dir, exist_ok=True)
        if main:
            # the frozen tower never changes within a fit: materialize it to
            # host ONCE per task instead of re-fetching ~0.6 GB from device
            # for model.safetensors AND best.safetensors on every bundle
            task_key = meta.get("task_id")
            if self._bundle_frozen_host is None or self._bundle_frozen_task != task_key:
                self._bundle_frozen_host = jax.tree.map(np.asarray, state.frozen)
                self._bundle_frozen_task = task_key
            frozen_host = self._bundle_frozen_host
            save_task_checkpoint(merge_params(state.trainable, frozen_host), self.model_cfg, os.path.join(resume_dir, "model.safetensors"))
            # best_trainable only changes when valid_acc strictly improves
            # (fit loop), so (task_id, best_acc) identifies it: skip the
            # ~2.8 GB re-write when the file already holds this best
            best_key = (task_key, meta.get("best_acc"))
            best_path = os.path.join(resume_dir, "best.safetensors")
            if best_trainable is not None and not (
                self._bundle_best_key is not None
                and self._bundle_best_key == best_key
                and os.path.exists(best_path)
            ):
                save_task_checkpoint(merge_params(best_trainable, frozen_host), self.model_cfg, best_path)
                self._bundle_best_key = best_key
        opt_path = os.path.abspath(os.path.join(resume_dir, "opt_state"))
        # NOTE: orbax's async save blocks on the device->host transfer (the
        # dominant cost on tunneled TPUs) and only backgrounds the disk
        # write, so deferring wait_until_finished would buy little while
        # leaving fit_state.json/opt_state skewed for a whole epoch after a
        # crash. Bundles stay synchronous + self-consistent; the cost knob
        # is config.resume_bundle_every.
        if os.environ.get("MAFED_DEBUG_BUNDLE_SHARDINGS"):
            LOGGER.warning("bundle save meta=%s", {k: meta.get(k) for k in ("task_id", "epoch", "batches_done", "global_step")})
            for path, leaf in jax.tree_util.tree_leaves_with_path(state.opt_state):
                sh = getattr(leaf, "sharding", None)
                if sh is not None and not isinstance(sh, jax.sharding.NamedSharding):
                    LOGGER.warning("bundle leaf %s sharding=%r", jax.tree_util.keystr(path), sh)
        if self._ckptr is None:
            self._ckptr = ocp.StandardCheckpointer()
        from mafed_tpu.utils.checkpoint import atomic_json_commit, collective_opt_state_save

        collective_opt_state_save(
            self._ckptr, opt_path, state.opt_state, barrier_name="resume_bundle_rmtree"
        )
        if main:
            # meta is the COMMIT MARKER for the whole bundle (written last,
            # after model/opt_state — see atomic_json_commit)
            atomic_json_commit(os.path.join(resume_dir, "fit_state.json"), meta)
        # attribute the bundle tax explicitly: integrated wall-clock deltas
        # between resume_bundle_every settings must be explainable from these
        # lines alone (VERDICT r3 #6)
        bundle_s = time.time() - t0
        LOGGER.info(
            "resume bundle (task %s epoch %s) saved in %.1fs",
            meta.get("task_id"), meta.get("epoch"), bundle_s,
        )
        if self.metrics is not None:
            self.metrics.log_metrics(
                {f"task_{meta.get('task_id')}/bundle_save_s": round(bundle_s, 2)},
                step=meta.get("global_step", 0),
            )

    def _load_resume_bundle(self, resume_dir: str, state: TrainState):
        import orbax.checkpoint as ocp

        from mafed_tpu.training.train_state import split_params
        from mafed_tpu.utils.checkpoint import load_task_checkpoint

        with open(os.path.join(resume_dir, "fit_state.json")) as f:
            meta = json.load(f)
        params = load_task_checkpoint(os.path.join(resume_dir, "model.safetensors"), self.model_cfg)
        trainable, _ = split_params(params)
        # same placement as init_state: device-resident, and on pods the
        # configured GLOBAL layout — host numpy here would re-ship the model
        # through jit on the first post-resume step, and a replicated tree
        # would mismatch the orbax-restored opt_state's TP-sharded layout
        trainable = self.place_params(trainable)
        ckptr = ocp.StandardCheckpointer()
        opt_state = ckptr.restore(os.path.abspath(os.path.join(resume_dir, "opt_state")), state.opt_state)
        best_trainable = None
        best_path = os.path.join(resume_dir, "best.safetensors")
        if os.path.exists(best_path):
            best_params = load_task_checkpoint(best_path, self.model_cfg)
            best_trainable, _ = split_params(best_params)
            best_trainable = jax.tree.map(np.asarray, best_trainable)
        new_state = TrainState(jnp.asarray(meta["global_step"], jnp.int32), trainable, state.frozen, opt_state)
        return new_state, meta, best_trainable

    # -- fit -------------------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        strategy,
        train_dataset,
        val_loader,
        task_id: int,
        epochs: int,
        resume_dir: Optional[str] = None,
        resume: bool = False,
    ) -> Tuple[TrainState, Dict[str, Any], Dict]:
        """Train one task with early stopping; returns (state, best_params, log)."""
        loader = self.make_train_loader(train_dataset, shuffle=True, seed=self.config.seed + task_id)
        # invalidate bundle-save caches: a fresh fit must re-materialize the
        # frozen tower and never skip the first best.safetensors write even
        # if (task_id, best_acc) collides with a previous in-process fit
        self._bundle_frozen_host = None
        self._bundle_frozen_task = None
        self._bundle_best_key = None
        best_acc = -float("inf")
        best_trainable = None
        wait = 0
        global_step = 0
        history = []
        start_epoch = 0

        start_batch = 0
        carry = None
        if resume and resume_dir and os.path.exists(os.path.join(resume_dir, "fit_state.json")):
            # peek BEFORE restoring: the bundle belongs to exactly one task —
            # applying its params/opt_state to any other task would silently
            # clobber that task's fresh state with stale weights
            with open(os.path.join(resume_dir, "fit_state.json")) as f:
                peek = json.loads(f.read())
            if peek.get("task_id") == task_id:
                state, meta, best_trainable = self._load_resume_bundle(resume_dir, state)
                if meta.get("batches_done", 0) > 0:
                    # preemption bundle: resume INSIDE the epoch, skipping the
                    # batches already consumed into applied updates (the
                    # loader replays the same seeded order for this epoch)
                    start_epoch = meta["epoch"]
                    start_batch = int(meta["batches_done"])
                else:
                    start_epoch = meta["epoch"] + 1
                best_acc = meta["best_acc"]
                wait = meta["wait"]
                global_step = meta["global_step"]
                history = meta.get("history", [])
                if self.metrics is not None and "metrics_offset" in meta:
                    # restart-with-same-command: skipped (already-complete)
                    # tasks never advance the cross-task wandb/JSONL step
                    # offset, so restore the one the preempted run carried
                    self.metrics.set_global_step_offset(int(meta["metrics_offset"]))
                # the memory stream (ER/featdistill) is a seeded order too:
                # fast-forward to the bundle's draw count so post-resume
                # replay/distill batches match the uninterrupted run
                strategy.fast_forward_memory(self, int(meta.get("mem_draws", 0)))
                carry = meta.get("window_carry")
                LOGGER.info(
                    "resuming task %d at epoch %d batch %d",
                    task_id, start_epoch, start_batch,
                )
                if start_batch == 0 and wait >= self.config.patience:
                    # the epoch-end bundle is saved BEFORE the early-stop
                    # break, so a crash between the two leaves a bundle whose
                    # wait already exhausted patience with fit_state.json
                    # still naming this task. The uninterrupted run trained
                    # nothing after that save — entering the loop here would
                    # train a whole extra epoch (the patience check only runs
                    # at epoch END) and could shift {task}_best.
                    LOGGER.info(
                        "resume: patience already exhausted (wait=%d >= %d) — "
                        "task had early-stopped; skipping training",
                        wait, self.config.patience,
                    )
                    start_epoch = epochs
                    # nothing will consume a carried partial window: skip the
                    # replay below (it would pay loader + transfer work and
                    # then log the carry as unapplied trailing microbatches,
                    # which the uninterrupted early-stopped run never did)
                    carry = None

        # fused-window accumulation carries across epoch boundaries, exactly
        # like the optax.MultiSteps fallback (and PL gradient accumulation):
        # a trailing partial window joins the next epoch's first microbatches
        # instead of being silently dropped (ADVICE r2)
        window_buf = []
        window_buf_meta = []  # (epoch, batch_idx) per buffered microbatch
        if carry:
            # an epoch-end bundle was saved with a partial window carried
            # toward the next epoch; replay those microbatches from their
            # epochs' seeded orders so the resumed run applies them exactly
            # as the uninterrupted run would (batch_idx is preserved — the
            # replay cadence keys on it). Grouped by epoch: per-epoch indices
            # are contiguous (sequential buffering).
            for ep, group in itertools.groupby(carry, key=lambda p: p[0]):
                idxs = [p[1] for p in group]
                loader.set_epoch(int(ep), start_batch=int(idxs[0]))
                # iter() materializes the generator so it can be CLOSED
                # deterministically (fit_batches may return a DevicePrefetcher
                # iterable; abandoning an un-closed stream would leave the
                # BatchLoader producer thread blocked on its full queue)
                refill = iter(self.fit_batches(loader))
                for i, b in zip(idxs, itertools.islice(refill, len(idxs))):
                    window_buf.append((i, b))
                    window_buf_meta.append((int(ep), int(i)))
                refill.close()
            LOGGER.info("restored %d carried microbatches", len(window_buf))
        for epoch in range(start_epoch, epochs):
            epoch_start = time.time()
            n_seen = 0
            skip = start_batch if epoch == start_epoch else 0
            loader.set_epoch(epoch, start_batch=skip)
            profiling = False
            last_logged = global_step
            for batch_idx, batch in enumerate(self.fit_batches(loader), start=skip):
                if self.config.profile_dir and task_id == 0 and epoch == 0 and batch_idx == 10:
                    jax.profiler.start_trace(self.config.profile_dir)
                    profiling = True
                if self.window > 1:
                    # fused accumulation windows: one jit step per window
                    window_buf.append((batch_idx, batch))
                    window_buf_meta.append((epoch, batch_idx))
                    if len(window_buf) < self.window:
                        continue
                    state, m = strategy.window_step(self, state, window_buf)
                    window_buf = []
                    window_buf_meta = []
                    n_seen += self.config.batch_size * self.window
                    global_step += self.window
                elif strategy.is_replay_batch(batch_idx):
                    state, m = strategy.replay_step(self, state)
                    n_seen += self.config.batch_size
                    global_step += 1
                else:
                    state, m = strategy.train_step(self, state, batch)
                    n_seen += self.config.batch_size
                    global_step += 1
                # update boundary (window_buf is empty here in window mode):
                # cooperative preemption saves a mid-epoch bundle and exits
                # cleanly with 143; resume skips the consumed batches
                preempt.tick_update()
                if resume_dir and preempt.sync_preemption_requested(global_step):
                    self._save_resume_bundle(
                        resume_dir, state,
                        {
                            "task_id": task_id, "epoch": epoch,
                            "batches_done": batch_idx + 1, "best_acc": best_acc,
                            "wait": wait, "global_step": global_step,
                            "history": history,
                            "mem_draws": strategy.mem_draws,
                            "metrics_offset": self.metrics.global_step_offset if self.metrics else 0,
                        },
                        best_trainable,
                    )
                    LOGGER.warning(
                        "preempted: resume bundle saved at task %d epoch %d "
                        "batch %d; exiting 143", task_id, epoch, batch_idx + 1,
                    )
                    raise preempt.Preempted(
                        f"preempted at task {task_id} epoch {epoch}"
                    )
                if profiling and batch_idx >= 20:
                    jax.block_until_ready(m["loss"])
                    jax.profiler.stop_trace()
                    profiling = False
                    LOGGER.info("profiler trace written to %s", self.config.profile_dir)
                if (
                    self.metrics is not None
                    and global_step - last_logged >= self.config.log_every
                ):
                    last_logged = global_step
                    payload = {
                        f"task_{task_id}/train_loss": float(m["loss"]),
                        f"task_{task_id}/grad_norm": float(m["grad_norm"]),
                    }
                    # per-tap distill losses at the log cadence (the
                    # reference logs them per distill step,
                    # distillation.py:165 — same keys, sampled)
                    dl = m.get("distill_layer_losses")
                    if dl is not None:
                        for layer, v in zip(self._distill_layer_ids, np.asarray(dl)):
                            payload[f"task_{task_id}/distill_loss_{layer}"] = float(v)
                    self.metrics.log_metrics(payload, step=global_step)
            if profiling:
                jax.profiler.stop_trace()
            # steps are dispatched asynchronously; without this sync the
            # epoch timer measures dispatch rate (validation would silently
            # absorb the queued work and ex/s would read impossibly high)
            jax.block_until_ready(state.trainable)
            ex_per_s = n_seen / max(time.time() - epoch_start, 1e-9)

            val_log, _ = validate_vqa(
                {**state.trainable, **state.frozen},
                self.decoder,
                val_loader,
                self.tokenizer,
                self.config.val_batch_size,
                max_batches=self.config.val_max_batches,
                sharding=self.eval_sharding,
                param_sharding=self.eval_param_sharding,
                resolve=self.eval_resolve,
            )
            acc = float(val_log["valid/acc"])
            history.append({"epoch": epoch, "acc": acc, "train_ex_per_s": ex_per_s})
            LOGGER.info(
                "task %d epoch %d: acc=%.4f train_ex/s=%.1f", task_id, epoch, acc, ex_per_s
            )
            if self.metrics is not None:
                self.metrics.log_metrics(
                    {f"task_{task_id}/valid_acc": acc, f"task_{task_id}/train_ex_per_s": ex_per_s},
                    step=global_step,
                )

            # EarlyStopping + ModelCheckpoint(top-1) semantics
            if acc > best_acc + PATIENCE_THRESHOLD:
                wait = 0
            elif math.isfinite(best_acc):
                wait += 1
            if acc > best_acc:
                best_acc = acc
                best_trainable = jax.tree.map(lambda x: np.asarray(x), state.trainable)
            every = max(0, getattr(self.config, "resume_bundle_every", 1))
            due = every > 0 and ((epoch + 1) % every == 0 or epoch == epochs - 1)
            # NOT rank-0 gated: the bundle save is a collective (orbax writes
            # each process's opt_state shards); gating happens inside
            if resume_dir and due:
                self._save_resume_bundle(
                    resume_dir, state,
                    {
                        "task_id": task_id, "epoch": epoch, "best_acc": best_acc,
                        "wait": wait, "global_step": global_step, "history": history,
                        "mem_draws": strategy.mem_draws,
                        "metrics_offset": self.metrics.global_step_offset if self.metrics else 0,
                        # partial window carried into the next epoch: recorded
                        # as (epoch, batch_idx) pairs so resume can replay the
                        # exact microbatches from the seeded epoch orders
                        "window_carry": [[e, i] for e, i in window_buf_meta] or None,
                    },
                    best_trainable,
                )
            if wait >= self.config.patience:
                LOGGER.info("early stopping at epoch %d (patience %d)", epoch, self.config.patience)
                break

        if window_buf:
            # end-of-fit remainder that never completed a window: the same
            # partial-accumulation residue MultiSteps would leave in its
            # accumulator at fit end — not applied, but never silent
            LOGGER.info(
                "fit end: %d trailing microbatches did not fill an accumulation "
                "window (window=%d) and were not applied",
                len(window_buf), self.window,
            )
        if best_trainable is None:
            best_trainable = jax.tree.map(lambda x: np.asarray(x), state.trainable)
        fit_log = {"best_acc": best_acc, "epochs_run": len(history), "history": history, "global_step": global_step}
        return state, best_trainable, fit_log
