"""Checkpoint IO: {task}_best checkpoints + init-checkpoint resolution.

Parity with mafed/utils/checkpoint.py and the ModelCheckpoint setup
(train.py:243-254): weights-only, top-1 on per-task generative VQA
accuracy, named ``{task}_best<ext>`` under ``<output_dir>/ckpt``. Format is
safetensors with the reference's torch key names (loadable by the reference
via its own safetensors path, vl_pythia.py:408-414).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

from mafed_tpu.core.config import ModelConfig, TrainConfig
from mafed_tpu.core.logging import LOGGER
from mafed_tpu.models.weights import (
    convert_vl_state_dict,
    save_reference_safetensors,
)


def task_checkpoint_path(output_dir: str, task: str, extension: str = ".safetensors") -> str:
    return os.path.join(output_dir, "ckpt", f"{task}_best{extension}")


def collective_opt_state_save(ckptr, opt_path: str, opt_state, *, barrier_name: str) -> None:
    """Save a (possibly globally-sharded) opt_state pytree with orbax.

    ONE implementation of the multi-process choreography shared by the CL
    runner's resume bundles and the pretrain trainer's checkpoints — the
    steps are subtle enough that hand-maintained copies drift:

    1. rank 0 clears any previous dir, then an UNCONDITIONAL barrier: the
       rmtree decision must not depend on each process's own exists() check —
       arrival skew means they can disagree (rank 0 clears the dir while a
       late rank sees it already gone, skips a conditional barrier, and
       mismatches the collective save);
    2. ALL processes save (each writes its addressable shards to the shared
       dir — rank-0-only gating would deadlock or raise on non-addressable
       shards), then block until the write completes.

    Callers write their own rank-0 commit marker AFTER this returns (see
    atomic_json_commit), so a kill mid-save leaves the previous
    self-consistent checkpoint, never a half-written one.
    """
    import shutil

    import jax

    opt_path = os.path.abspath(opt_path)
    if jax.process_count() > 1:
        from mafed_tpu.core.dist import is_main_process

        if is_main_process() and os.path.exists(opt_path):
            shutil.rmtree(opt_path)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(barrier_name)
    elif os.path.exists(opt_path):
        shutil.rmtree(opt_path)
    ckptr.save(opt_path, opt_state)
    ckptr.wait_until_finished()


def atomic_json_commit(path: str, meta: Dict[str, Any], **dump_kwargs) -> None:
    """Write a checkpoint's commit-marker JSON atomically (tmp + os.replace).

    The marker is written LAST, after every other artifact: a kill mid-save
    leaves either no marker (checkpoint ignored) or a complete one — never a
    truncated JSON (restart crash loop) or new-state/old-meta skew (batches
    silently re-applied on resume). Rank-0-gated by the caller.
    """
    import json

    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, **dump_kwargs)
    os.replace(tmp, path)


def save_task_checkpoint(params: Dict[str, Any], model_cfg: ModelConfig, path: str) -> None:
    LOGGER.info("saving checkpoint %s", path)
    save_reference_safetensors(params, model_cfg, path)


def load_task_checkpoint(path: str, model_cfg: ModelConfig) -> Dict[str, Any]:
    """Load a {task}_best checkpoint (safetensors or torch pickle)."""
    LOGGER.info("loading checkpoint %s", path)
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = dict(load_file(path))
    else:  # torch .ckpt / .bin (PL checkpoints carry a 'state_dict' field
        # with 'model.'-prefixed keys; checkpoint.py:16-29)
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k[len("model."):] if k.startswith("model.") else k: v for k, v in sd.items()}
    return convert_vl_state_dict(sd, model_cfg)


def get_checkpoint_path(task_id: int, task: str, checkpoint_dir: str, extension: str = ".safetensors") -> str:
    """Resolve a task's best checkpoint with the reference's task-0 fallback
    (eval_utils.py:18-26): when the first task's checkpoint is missing from a
    method-suffixed run dir, fall back to the base run's ckpt/ directory."""
    import re

    best_model = os.path.join(checkpoint_dir, f"{task}_best{extension}")
    if task_id == 0 and not os.path.exists(best_model):
        root = re.split("_ewc|_lwf|_er|_ps_|_der_|_agem|_replay|_featdistill", checkpoint_dir)[0]
        best_model = os.path.join(root, f"ckpt/{task}_best{os.path.splitext(best_model)[-1]}")
    return best_model


def get_initialization_checkpoint(config: TrainConfig, task_id: int = 0) -> Optional[str]:
    """Checkpoint to initialize the first task (utils/checkpoint.py:32-41)."""
    if task_id != 0:
        return None
    if config.checkpoint is not None:
        return config.checkpoint
    if config.checkpoint_dir is not None:
        return os.path.join(
            config.checkpoint_dir, f"{config.tasks[0]}_best{config.init_ckpt_extension}"
        )
    return None
