"""On-TPU smoke of the REAL training surface (410M default; SMOKE_PRESET=160m/1b).

Drives ContinualLearningTrainer end-to-end (2 synthetic mini-tasks,
featdistill/MAFED, accumulate_grad_batches=4 = fused windows, generative
validation, teacher/memory transition) on the actual chip — the e2e tests
run this path only on tiny CPU configs, so this catches TPU-only issues in
the runner's window assembly / prefetch / decode integration.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/smoke_tpu.py [workdir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mafed_smoke_")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from tests.helpers import write_synthetic_vqa

    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    n_train = int(os.environ.get("SMOKE_N_TRAIN", "64"))
    epochs0 = int(os.environ.get("SMOKE_EPOCHS", "1"))
    method = os.environ.get("SMOKE_METHOD", "featdistill")
    # SMOKE_TASKS="action,count,subcategory,scene,color" runs the reference's
    # full 5-task sequence length (scripts/run_seed42.sh:6) on synthetic data
    tasks = tuple(os.environ.get("SMOKE_TASKS", "taskA,taskB").split(","))
    cfg = write_synthetic_vqa(workdir, tasks=tasks, n_train=n_train, n_val=8)
    cfg = cfg.replace(
        cl_method=method,
        output_dir=os.path.join(workdir, "out"),
        batch_size=16,
        val_batch_size=16,
        accumulate_grad_batches=4,
        replay_interval=4,
        cl_memory=16,
        epochs=[epochs0, int(os.environ.get("SMOKE_EPOCHS1", epochs0))],
        max_txt_len=24,
        val_max_batches=1,
        distillation_modality_weighing_strategy=os.environ.get("SMOKE_MODALITY", "balanced"),
        distillation_layer_weighing_strategy="discounted",
        distillation_layer_discount=0.5,
        reg_lambda=100.0,
        ewc_state_dtype=os.environ.get("SMOKE_EWC_DTYPE", "float32"),
        resume_bundle_every=int(os.environ.get("SMOKE_BUNDLE_EVERY", "1")),
        # production logging cadence by default (the r2 smoke's log_every=1
        # forced a host sync after EVERY window and understated integrated
        # throughput by ~20%)
        log_every=int(os.environ.get("SMOKE_LOG_EVERY", "50")),
        remat_policy=os.environ.get("SMOKE_REMAT_POLICY", ""),
        # off/auto/on (legacy 0/1 accepted by resolve_teacher_cache_mode)
        teacher_state_cache=os.environ.get("SMOKE_TEACHER_CACHE", "auto"),
        # SMOKE_TEACHER_TABLE_MB=0 forces the streaming TeacherStateView tier
        # (the r3 opt-in trade); default keeps the HBM-resident teacher table
        device_teacher_table_mb=int(os.environ.get("SMOKE_TEACHER_TABLE_MB", "4096")),
        vision_table_dtype=os.environ.get("SMOKE_VISION_TABLE_DTYPE", "bfloat16"),
        # SMOKE_VISION_TABLE_MB=0 streams patches per batch (the r2/r3 default
        # path); default keeps the device-resident feature table
        device_vision_table_mb=int(os.environ.get("SMOKE_VISION_TABLE_MB", "1024")),
        allow_tokenizer_fallback=True,
    )
    # SMOKE_PRESET selects the model scale (160m / 410m / 1b — the three
    # reference scales, utils/download_models.py:6-24); default is the 410M
    from mafed_tpu.core.config import model_config_for_preset

    preset = os.environ.get("SMOKE_PRESET", "410m")
    model_cfg = model_config_for_preset(preset)  # + EVA-02-L vision

    start = time.time()
    trainer = ContinualLearningTrainer(
        cfg, model_cfg=model_cfg, synthetic_images=True, use_mesh=False
    )
    result = trainer.main()
    wall = time.time() - start

    ok = (
        len(result["accuracy_matrix"]) == len(tasks)
        and os.path.exists(
            os.path.join(cfg.output_dir, "ckpt", f"{tasks[-1]}_best.safetensors")
        )
        and trainer.runner.window == 4
    )
    # steady-state integrated throughput: later epochs run warm-compiled
    epoch_rates = {}
    bundle_saves = {}
    metrics_path = os.path.join(cfg.output_dir, "log", "metrics.jsonl")
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            for line in f:
                rec = json.loads(line)
                for k, v in rec.items():
                    if k.endswith("train_ex_per_s"):
                        epoch_rates.setdefault(k, []).append(v)
                    elif k.endswith("bundle_save_s"):
                        bundle_saves.setdefault(k, []).append(v)
    print(
        json.dumps(
            {
                "smoke": "ok" if ok else "FAIL",
                "window": trainer.runner.window,
                "wall_s": round(wall, 1),
                "accuracy_matrix": result["accuracy_matrix"],
                "train_ex_per_s": epoch_rates,
                "bundle_save_s": bundle_saves,
                "workdir": workdir,
            }
        )
    )
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
