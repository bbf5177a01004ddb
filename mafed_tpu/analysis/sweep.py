"""CKA sweep CLI: per-layer average CKA + text/image ratio over a task-
checkpoint directory.

Capability parity with the reference's (bit-rotted) analysis scripts
/root/reference/mafed/analysis/get_average_CKA_per_layer.py:39-236 and
get_representation_CKA_ratio.py: for every consecutive pair of task
checkpoints produced by a CL run, compute per-layer linear CKA of text and
image token representations on a shared validation stream, then report the
per-layer averages and T/I ratios as JSON (and optionally a matplotlib
plot).

Usage (against a finished experiment directory):

    python -m mafed_tpu.analysis.sweep --experiment_dir storage/out/run1 \
        [--tasks action count ...] [--max_batches 8] [--output report.json]

The experiment directory is expected to contain log/hps.json,
log/model_config.json and ckpt/{task}_best.safetensors — exactly what
ContinualLearningTrainer writes.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

import numpy as np

from mafed_tpu.analysis.representation_similarity import cka_between_checkpoints
from mafed_tpu.core.config import ModelConfig, TrainConfig
from mafed_tpu.core.logging import LOGGER


def _load_experiment(experiment_dir: str):
    with open(os.path.join(experiment_dir, "log", "hps.json")) as f:
        config = TrainConfig.from_dict(json.load(f))
    mc_path = os.path.join(experiment_dir, "log", "model_config.json")
    model_cfg = ModelConfig.from_json(mc_path) if os.path.exists(mc_path) else ModelConfig()
    with open(os.path.join(experiment_dir, "log", "task_order.json")) as f:
        tasks = json.load(f)["tasks"]
    return config, model_cfg, tasks


def _batches_factory(config: TrainConfig, model_cfg: ModelConfig, task: str, synthetic_images: bool):
    """Validation batch stream for the CKA probe (shared across checkpoints)."""
    from mafed_tpu.data.factory import make_val_loader, prepare_val_dataset
    from mafed_tpu.data.tokenizer import build_tokenizer

    tokenizer = build_tokenizer(
        config.tokenizer_name, model_max_length=100, padding_side="left",
        allow_fallback=config.allow_tokenizer_fallback,
    )
    text_len = config.max_txt_len + 4
    dataset = prepare_val_dataset(config, task, tokenizer, model_cfg.vision, synthetic_images)

    def factory():
        return iter(make_val_loader(config, dataset, text_len))

    return factory


def sweep(
    experiment_dir: str,
    tasks: List[str] = None,
    max_batches: int = 8,
    probe_task: str = None,
    synthetic_images: bool = False,
) -> Dict:
    """Per-layer CKA between consecutive task checkpoints, averaged."""
    from mafed_tpu.utils.checkpoint import load_task_checkpoint, task_checkpoint_path

    config, model_cfg, task_order = _load_experiment(experiment_dir)
    tasks = tasks or task_order
    if len(tasks) < 2:
        raise ValueError("need at least two task checkpoints to compare")
    probe_task = probe_task or tasks[0]
    batches_factory = _batches_factory(config, model_cfg, probe_task, synthetic_images)

    pairs = []
    per_pair = []
    for prev, cur in zip(tasks[:-1], tasks[1:]):
        p_prev = load_task_checkpoint(task_checkpoint_path(experiment_dir, prev), model_cfg)
        p_cur = load_task_checkpoint(task_checkpoint_path(experiment_dir, cur), model_cfg)
        LOGGER.info("CKA: %s_best vs %s_best (probe data: %s)", prev, cur, probe_task)
        report = cka_between_checkpoints(p_prev, p_cur, model_cfg, batches_factory, max_batches)
        pairs.append(f"{prev}->{cur}")
        per_pair.append(report)

    layers = per_pair[0]["layers"]
    text = np.asarray([r["text_cka"] for r in per_pair])  # [pairs, layers]
    image = np.asarray([r["image_cka"] for r in per_pair])
    avg_text = text.mean(axis=0)
    avg_image = image.mean(axis=0)
    result = {
        "experiment_dir": experiment_dir,
        "probe_task": probe_task,
        "pairs": pairs,
        "layers": list(layers),
        "per_pair": per_pair,
        "avg_text_cka": avg_text.tolist(),
        "avg_image_cka": avg_image.tolist(),
        "avg_ti_ratio": (avg_text / np.maximum(avg_image, 1e-12)).tolist(),
    }
    return result


def maybe_plot(result: Dict, path: str) -> bool:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        LOGGER.warning("matplotlib unavailable; skipping plot")
        return False
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(result["layers"], result["avg_text_cka"], marker="o", label="text CKA")
    ax.plot(result["layers"], result["avg_image_cka"], marker="s", label="image CKA")
    ax.set_xlabel("layer")
    ax.set_ylabel("avg CKA (consecutive task ckpts)")
    ax.set_ylim(0, 1.05)
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return True


def main(argv=None) -> Dict:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--experiment_dir", required=True)
    parser.add_argument("--tasks", nargs="*", default=None)
    parser.add_argument("--probe_task", default=None)
    parser.add_argument("--max_batches", type=int, default=8)
    parser.add_argument("--output", default=None, help="report JSON path")
    parser.add_argument("--plot", default=None, help="optional PNG path")
    parser.add_argument("--synthetic_images", action="store_true")
    args = parser.parse_args(argv)

    result = sweep(
        args.experiment_dir,
        tasks=args.tasks,
        max_batches=args.max_batches,
        probe_task=args.probe_task,
        synthetic_images=args.synthetic_images,
    )
    out = args.output or os.path.join(args.experiment_dir, "log", "cka_report.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    LOGGER.info("CKA report written to %s", out)
    if args.plot:
        maybe_plot(result, args.plot)
    return result


if __name__ == "__main__":
    main()
