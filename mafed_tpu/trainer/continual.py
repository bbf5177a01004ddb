"""Continual-learning orchestrator: the outer task loop.

Parity with mafed/train.py:33-301 (ContinualLearningTrainer):
  per task — build data, (re)load best previous checkpoint, train with the
  CL strategy, reload the task's best checkpoint, update the strategy
  (memory / Fisher / teacher / adaptive weights), then evaluate ALL tasks
  to fill column task_id of the accuracy matrix; finally avg accuracy and
  BWT = mean(A[i, t] - A[i, i]) over seen tasks (train.py:61-67).
  Mid-sequence resume via start_task_idx + checkpoint_dir (train.py:106-114,
  180-193).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from mafed_tpu.cl import CLMethod
from mafed_tpu.core.config import ModelConfig, TrainConfig
from mafed_tpu.core.logging import LOGGER, MetricsLogger, add_log_to_file
from mafed_tpu.core.mesh import make_mesh
from mafed_tpu.core.prng import seed_everything
from mafed_tpu.data.factory import get_val_loaders, prepare_train_dataset
from mafed_tpu.data.tokenizer import build_tokenizer
from mafed_tpu.evaluation.validate import validate_vqa
from mafed_tpu.models import vl_pythia
from mafed_tpu.models.weights import load_pretrained
from mafed_tpu.trainer.runner import TaskRunner
from mafed_tpu.training.train_state import merge_params, split_params
from mafed_tpu.utils.checkpoint import (
    get_initialization_checkpoint,
    load_task_checkpoint,
    save_task_checkpoint,
    task_checkpoint_path,
)
from mafed_tpu.utils.cl_utils import random_task_order
from mafed_tpu.utils.save import save_configs


class ContinualLearningTrainer:
    def __init__(
        self,
        config: TrainConfig,
        model_cfg: Optional[ModelConfig] = None,
        synthetic_images: bool = False,
        init_params: Optional[Dict[str, Any]] = None,
        use_mesh: bool = True,
    ) -> None:
        self.config = config
        # multi-host SPMD: must run before any backend use so every process
        # sees the global device set (replaces the reference's implicit
        # torch.distributed env init; README.md:47 left it untested)
        from mafed_tpu.core.dist import is_main_process, maybe_initialize_distributed

        maybe_initialize_distributed(config)
        seed_everything(config.seed)
        self._initialize_tasks()
        # rank-0 writer gating (reference save.py:35): on multi-host pods
        # with a shared output_dir, only process 0 writes provenance files,
        # metrics, logs, and checkpoints
        self.is_main = is_main_process()
        if self.is_main:
            save_configs(config)
            add_log_to_file(os.path.join(config.output_dir, "log", "log.txt"))
        self.metrics = (
            MetricsLogger(
                project=config.run_project,
                entity=config.run_entity,
                group=config.run_group,
                name=config.run_name,
                output_dir=os.path.join(config.output_dir, "log"),
            )
            if self.is_main
            else None
        )
        self.synthetic_images = synthetic_images
        self._init_params = init_params

        if model_cfg is None:
            if config.model_config and os.path.exists(config.model_config):
                model_cfg = ModelConfig.from_json(config.model_config)
            elif os.path.isdir(config.model_name) and os.path.exists(
                os.path.join(config.model_name, "config.json")
            ):
                model_cfg = ModelConfig.from_json(os.path.join(config.model_name, "config.json"))
            else:
                model_cfg = ModelConfig()
        self.model_cfg = model_cfg
        # persist for offline analysis (analysis/sweep.py) + ckpt parity
        if self.is_main:
            import json

            with open(os.path.join(config.output_dir, "log", "model_config.json"), "w") as f:
                json.dump(model_cfg.to_dict(), f, indent=2)

        self.tokenizer = build_tokenizer(
            config.tokenizer_name, model_max_length=100, padding_side="left",
            allow_fallback=config.allow_tokenizer_fallback,
        )
        mesh = make_mesh(config.mesh_shape, config.mesh_axis_names) if use_mesh else None
        self.runner = TaskRunner(
            self.model_cfg, config, self.tokenizer, mesh=mesh, metrics=self.metrics
        )
        # frozen-vision feature cache (data/vision_cache.py): primed once per
        # unique image; steady-state steps skip the EVA-02 tower entirely
        self.vision_cache = None
        self._vt_attached = []  # leaves holding the current task's table
        self.val_loaders = {}  # built once in main() (reference dataloaders.py:61-83)
        if config.vision_cache:
            from mafed_tpu.data.vision_cache import VisionFeatureCache

            from mafed_tpu.models.vl_pythia import n_vision_tokens

            self.vision_cache = VisionFeatureCache(
                config.vision_cache_dir or os.path.join(config.output_dir, "vision_cache"),
                n_vision_tokens(self.model_cfg), self.model_cfg.vision.embed_dim,
            )

    # ------------------------------------------------------------------
    def _initialize_tasks(self) -> None:
        cfg = self.config
        if not cfg.tasks:
            split_file = os.path.join(cfg.question_task_ids, cfg.exp, "train_question_ids.json")
            cfg.tasks = random_task_order(cfg.exp, split_file, seed=cfg.seed)
        if cfg.start_task_idx < 0 or cfg.start_task_idx >= len(cfg.tasks):
            raise AssertionError(f"Invalid start_task_idx: {cfg.start_task_idx}")
        LOGGER.info("Task order: %s", cfg.tasks)
        if cfg.checkpoint and cfg.checkpoint_dir:
            raise ValueError("set either checkpoint or checkpoint_dir, not both")

    def _initial_params(self) -> Dict[str, Any]:
        if self._init_params is not None:
            return self._init_params
        init_ckpt = get_initialization_checkpoint(self.config)
        if init_ckpt and os.path.exists(init_ckpt):
            return load_task_checkpoint(init_ckpt, self.model_cfg)
        if os.path.isdir(self.config.model_name):
            params, _ = load_pretrained(self.config.model_name, self.model_cfg)
            return params
        LOGGER.warning("no pretrained weights found; random init (%s)", self.config.model_name)
        return vl_pythia.init_params(self.model_cfg, jax.random.PRNGKey(self.config.seed))

    def _prev_best_path(self, task_id: int, task: str) -> str:
        if task_id == 0 and self.config.start_task_idx > 0 and self.config.checkpoint_dir:
            return os.path.join(
                self.config.checkpoint_dir, f"{task}_best{self.config.checkpoint_extension}"
            )
        return task_checkpoint_path(self.config.output_dir, task, self.config.checkpoint_extension)

    def _epochs_for(self, task_id: int) -> int:
        return self.config.epochs[0] if task_id == 0 else self.config.epochs[1]

    # ------------------------------------------------------------------
    def validate_all_tasks(self, params, task_id: int, accuracy: np.ndarray) -> np.ndarray:
        # device-resident once: host numpy params (the reloaded best
        # checkpoint) would re-transfer the full model on every decode call
        if self.runner.eval_param_sharding is not None:
            # multi-process decode is per-process: localize the (mostly host)
            # tree DIRECTLY onto the local eval sharding, once for the whole
            # eval round. Routing through place_params first would ship the
            # full model host -> global mesh -> host -> local devices (three
            # movements where one suffices), and per-call localization inside
            # validate_vqa would re-copy it n_tasks times.
            from mafed_tpu.evaluation.validate import localize_params

            params = localize_params(params, self.runner.eval_param_sharding)
        else:
            params = self.runner.place_params(params)
        metrics = {}
        for val_task_id, val_task in enumerate(self.config.tasks):
            LOGGER.info(val_task)
            val_log, _ = validate_vqa(
                params,
                self.runner.decoder,
                self.val_loaders[val_task],
                self.tokenizer,
                self.config.val_batch_size,
                max_batches=self.config.val_max_batches,
                sharding=self.runner.eval_sharding,
                param_sharding=None,
                resolve=self.runner.eval_resolve,
            )
            accuracy[val_task_id, task_id] = val_log["valid/acc"]
            # per-task validation metrics ride along at the same valid step,
            # so the JSONL/wandb stream carries the FULL TxT accuracy matrix
            # (and the reference's valid/ex_per_s, eval_utils.py:152-153) —
            # one row per task per round — not just its column means
            for k, v in val_log.items():
                metrics[f"validation/{val_task}/{k.split('/', 1)[1]}"] = float(v)

        metrics["validation/average_accuracy"] = float(np.mean(accuracy[:, task_id]))
        LOGGER.info("Average score: %.2f", metrics["validation/average_accuracy"] * 100)
        if task_id > 0:
            bwt = float(
                np.mean(np.diag(accuracy[:task_id, task_id] - accuracy[:task_id, :task_id]))
            )
            metrics["validation/BWT"] = bwt
            LOGGER.info("Average forgetting: %.2f", bwt * 100)
        if self.metrics is not None:
            self.metrics.log_metrics(metrics, step=task_id, is_valid_step=True)
        return accuracy

    # ------------------------------------------------------------------
    def _prime_vision_cache(self, params, datasets) -> None:
        if self.vision_cache is None:
            return
        import time

        from mafed_tpu.data.vision_cache import prime_vision_cache

        _, frozen = split_params(params)
        t0 = time.time()
        n = prime_vision_cache(self.vision_cache, datasets, frozen, self.model_cfg)
        if n:
            LOGGER.info("vision cache: computed %d image features in %.1fs", n, time.time() - t0)

    def _refresh_vision_table(self, strategy, train_dataset, task=None) -> None:
        """Per-task device-resident feature table (data/vision_table.py).

        Covers every image this task's batches can draw — the train set plus
        the replay memory (whose examples come from previous train sets, all
        primed into the same disk cache) — so attachment is all-or-nothing
        per dataset and every batch a fused window stacks has one structure.
        Validation sets ride along budget-permitting (decode re-streams the
        same features every epoch otherwise), in tiers: all tasks' val sets
        (validate_all_tasks) > the current task's val set (the per-epoch
        early-stopping eval) > train+memory only > full streaming. Swapped
        strictly BETWEEN tasks: memory iterators built at the last transition
        are lazy (nothing produced until the first draw, inside this task's
        fit), so no in-flight batch can carry stale rows.
        """
        cfg = self.config
        if self.vision_cache is None or cfg.device_vision_table_mb <= 0:
            return
        from mafed_tpu.data import vision_table as vt
        from mafed_tpu.models.vl_pythia import n_vision_tokens

        base = [train_dataset] + list(getattr(strategy, "datasets", []))
        all_val = [loader.dataset for loader in self.val_loaders.values()]
        cur_val = [self.val_loaders[task].dataset] if task in self.val_loaders else []
        tiers = [("train+memory+val", base + all_val)]
        if cur_val and len(all_val) > 1:
            tiers.append(("train+memory+current-val", base + cur_val))
        tiers.append(("train+memory", base))

        # detach the previous task's leaves first: leaves can recur across
        # tasks (memory subsets reference earlier train datasets) and must
        # never serve rows from a table about to be replaced
        vt.attach(self._vt_attached, None)
        self._vt_attached = []
        self.runner.vision_table = None

        table_dtype = getattr(cfg, "vision_table_dtype", "bfloat16")
        row_bytes = vt.table_nbytes(
            1, n_vision_tokens(self.model_cfg), self.model_cfg.vision.embed_dim,
            dtype=table_dtype,
        )
        budget = cfg.device_vision_table_mb * (1 << 20)
        for tier, datasets in tiers:
            keys = list(dict.fromkeys(vt.iter_image_keys(datasets)))
            if len(keys) * row_bytes > budget:
                continue
            table = vt.build_table(
                self.vision_cache, keys, mesh=self.runner.mesh, dtype=table_dtype
            )
            self._vt_attached = vt.attach(datasets, table)
            self.runner.vision_table = table
            LOGGER.info(
                "vision table [%s, %s]: %d unique images (%.0f MB) device-resident",
                tier, table_dtype, len(keys), len(keys) * row_bytes / (1 << 20),
            )
            return
        LOGGER.info(
            "vision table: train+memory image set over the %d MB budget — "
            "streaming patches this task", cfg.device_vision_table_mb,
        )

    def main(self) -> Dict[str, Any]:
        cfg = self.config
        params = self._initial_params()

        self.val_loaders = get_val_loaders(
            cfg, self.tokenizer, self.model_cfg.vision, self.runner.val_text_len,
            synthetic_images=self.synthetic_images, vision_cache=self.vision_cache,
        )
        self._prime_vision_cache(params, [l.dataset for l in self.val_loaders.values()])
        strategy = CLMethod[cfg.cl_method](cfg, self.model_cfg)
        # retained for post-run introspection (tests assert on strategy state,
        # e.g. the adaptive modality coefficients after a finished sequence)
        self.strategy = strategy
        # layout policy BEFORE any task transition: skipped-task transitions
        # on a restart build strategy memory iterators before the first
        # setup_task_optimizer runs, and those iterators must already use
        # the host/device layout the next trained task's fit will use
        self.runner.ensure_window_policy(strategy)
        n_tasks = len(cfg.tasks)
        accuracy = np.zeros((n_tasks, n_tasks))

        # Restart-with-the-same-command resume (cooperative preemption): a
        # resume bundle names the ONE task it belongs to. Tasks before it
        # already completed in the preempted run (their best checkpoints are
        # on disk) — retraining them would both redo the work and clobber the
        # bundle at the first epoch-end save, losing the preserved mid-task
        # progress.
        resume_task = -1
        if cfg.resume_from_checkpoint:
            fit_state = os.path.join(cfg.output_dir, "resume", "fit_state.json")
            if os.path.exists(fit_state):
                import json

                with open(fit_state) as f:
                    resume_task = int(json.load(f).get("task_id", -1))

        for task_id, task in enumerate(cfg.tasks):
            LOGGER.info("Task %d: %s", task_id, task)
            train_dataset = prepare_train_dataset(
                cfg, task, self.tokenizer, self.model_cfg.vision,
                synthetic_images=self.synthetic_images, vision_cache=self.vision_cache,
            )
            self._prime_vision_cache(params, [train_dataset])
            self._refresh_vision_table(strategy, train_dataset, task)
            best_path = self._prev_best_path(task_id, task)

            train_this = task_id >= cfg.start_task_idx
            if train_this and task_id < resume_task and os.path.exists(best_path):
                LOGGER.info(
                    "task %d finished before the resume bundle (task %d): "
                    "loading %s instead of retraining", task_id, resume_task, best_path,
                )
                train_this = False

            if train_this:
                trainable, _ = split_params(params)
                self.runner.setup_task_optimizer(len(train_dataset), trainable, strategy=strategy)
                state = self.runner.init_state(params)
                strategy.update_after_new_task(self.runner, state, train_dataset)
                resume_dir = os.path.join(cfg.output_dir, "resume")
                state, best_trainable, fit_log = self.runner.fit(
                    state,
                    strategy,
                    train_dataset,
                    self.val_loaders[task],
                    task_id,
                    self._epochs_for(task_id),
                    resume_dir=resume_dir,
                    resume=bool(cfg.resume_from_checkpoint),
                )
                if self.metrics is not None:
                    self.metrics.set_global_step_offset(
                        self.metrics.global_step_offset + fit_log["global_step"]
                    )
                best_params = merge_params(best_trainable, state.frozen)
                if self.is_main:
                    save_task_checkpoint(best_params, self.model_cfg, best_path)
                params = best_params
                del state
            elif os.path.exists(best_path):
                params = load_task_checkpoint(best_path, self.model_cfg)

            # strategy transition uses the best (reloaded) model
            if task_id < n_tasks - 1:
                trainable, frozen = split_params(params)
                # ON DEVICE, once: strategies retain these (teacher, EWC
                # anchors) and pass them into every subsequent jitted step —
                # host numpy here would re-ship the full model per window
                trainable = self.runner.place_params(trainable)
                frozen = self.runner.place_params(frozen)
                from mafed_tpu.training.train_state import TrainState

                eval_state = TrainState(0, trainable, frozen, None)
                update_loader = self.runner.make_train_loader(
                    train_dataset, shuffle=False, infinite=False
                )
                strategy.update(self.runner, eval_state, train_dataset, update_loader)

            accuracy = self.validate_all_tasks(params, task_id, accuracy)

        result = {
            "accuracy_matrix": accuracy.tolist(),
            "average_accuracy": float(np.mean(accuracy[:, n_tasks - 1])),
            "bwt": float(
                np.mean(np.diag(accuracy[: n_tasks - 1, n_tasks - 1] - accuracy[: n_tasks - 1, : n_tasks - 1]))
            )
            if n_tasks > 1
            else 0.0,
        }
        out_path = os.path.join(cfg.output_dir, "log", "results.json")
        import json

        if self.is_main:
            with open(out_path, "w") as f:
                json.dump(result, f, indent=2)
        LOGGER.info("final average accuracy: %.4f", result["average_accuracy"])
        if self.metrics is not None:
            self.metrics.finish()
        return result
