"""Experiment provenance: hps.json, task_order.json, git_info.json.

Parity: mafed/utils/save.py:18-74 — dump the resolved config, the task
order, and best-effort git metadata into the output directory before
training starts.
"""

from __future__ import annotations

import json
import os
import subprocess
from typing import Any

from mafed_tpu.core.config import TrainConfig
from mafed_tpu.core.logging import LOGGER


def _git_info(repo_dir: str = ".") -> dict:
    def run(*args):
        try:
            return subprocess.check_output(["git", *args], cwd=repo_dir, stderr=subprocess.DEVNULL).decode().strip()
        except Exception:
            return None

    return {
        "commit": run("rev-parse", "HEAD"),
        "branch": run("rev-parse", "--abbrev-ref", "HEAD"),
        "dirty": bool(run("status", "--porcelain")),
    }


def save_configs(config: TrainConfig, output_dir: str = None) -> None:
    out = output_dir or config.output_dir
    os.makedirs(os.path.join(out, "ckpt"), exist_ok=True)
    os.makedirs(os.path.join(out, "log"), exist_ok=True)
    with open(os.path.join(out, "log", "hps.json"), "w") as f:
        json.dump(config.to_dict(), f, indent=2, default=str)
    with open(os.path.join(out, "log", "task_order.json"), "w") as f:
        json.dump({"tasks": config.tasks}, f, indent=2)
    with open(os.path.join(out, "log", "git_info.json"), "w") as f:
        json.dump(_git_info(), f, indent=2)
    LOGGER.info("saved experiment configs under %s/log", out)
