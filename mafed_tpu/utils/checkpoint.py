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
