"""Logging + experiment metrics.

Parity: mafed/utils/logger.py — global LOGGER with file handler and a
continual-learning metrics logger that offsets global steps across tasks
(CLWandbLogger.set_global_step_offset, logger.py:77-98). wandb is optional;
when unavailable (or offline TPU pods) metrics stream to a JSONL file, which
is the canonical artifact here.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

_LOG_FMT = "%(asctime)s - %(levelname)s - %(name)s -   %(message)s"
_DATE_FMT = "%m/%d/%Y %H:%M:%S"

logging.basicConfig(format=_LOG_FMT, datefmt=_DATE_FMT, level=logging.INFO)
LOGGER = logging.getLogger("mafed_tpu")


def add_log_to_file(log_path: str) -> None:
    """Attach a file handler to the global logger (reference logger.py:22-27)."""
    os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
    fh = logging.FileHandler(log_path)
    fh.setFormatter(logging.Formatter(_LOG_FMT, datefmt=_DATE_FMT))
    LOGGER.addHandler(fh)


class MetricsLogger:
    """Step-offset-aware metrics logger.

    Mirrors CLWandbLogger semantics: each task's steps are logged with a
    cumulative global-step offset so curves concatenate across the task
    sequence. Falls back to JSONL when wandb isn't importable/configured.
    """

    def __init__(
        self,
        project: str = "mafed-tpu",
        entity: Optional[str] = None,
        group: Optional[str] = None,
        name: Optional[str] = None,
        output_dir: str = ".",
        use_wandb: bool = False,
    ) -> None:
        self._offset = 0
        self._jsonl_path = os.path.join(output_dir, "metrics.jsonl")
        os.makedirs(output_dir, exist_ok=True)
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(project=project, entity=entity, group=group, name=name)
                # custom x-axes (reference logger.py:62-73): train metrics
                # plot against the offset global step, the CL summary metrics
                # against the validation step (task index)
                if getattr(self._wandb, "define_metric", None):
                    self._wandb.define_metric("trainer/global_step")
                    self._wandb.define_metric("*", step_metric="trainer/global_step", step_sync=True)
                    # the CL summary metrics are logged under validation/*
                    # (trainer/continual.py validate_all_tasks) and plot
                    # against the task index, not the train step
                    self._wandb.define_metric(
                        "validation/*", step_metric="trainer/valid_step", step_sync=True
                    )
            except Exception as exc:  # pragma: no cover - depends on env
                LOGGER.warning("wandb unavailable (%s); logging to %s", exc, self._jsonl_path)

    def set_global_step_offset(self, offset: int) -> None:
        self._offset = int(offset)

    @property
    def global_step_offset(self) -> int:
        return self._offset

    def log_metrics(self, metrics: Dict[str, Any], step: Optional[int] = None, is_valid_step: bool = False) -> None:
        record = {k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()}
        logical_step = None if step is None else int(step) + (0 if is_valid_step else self._offset)
        record["_step"] = logical_step
        record["_time"] = time.time()
        with open(self._jsonl_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            payload = {k: v for k, v in record.items() if not k.startswith("_")}
            # log the step-axis key alongside the metrics (logger.py:84-94)
            # so the define_metric axes above resolve
            if logical_step is not None:
                axis = "trainer/valid_step" if is_valid_step else "trainer/global_step"
                payload[axis] = logical_step
            self._wandb.log(payload)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
