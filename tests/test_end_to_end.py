"""Tiny-config end-to-end continual-learning runs (SURVEY.md §4 integration).

2 mini-tasks with synthetic images/annotations shaped like the real
{split}_annotations.json; asserts the {task}_best checkpoints appear, the
accuracy matrix has the right shape, and each CL method completes a full
sequence.
"""

import os

import numpy as np
import pytest

from tests.helpers import tiny_model_cfg, write_synthetic_vqa


def run_cl(tmp_path, method, **overrides):
    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    cfg = write_synthetic_vqa(str(tmp_path))
    cfg = cfg.replace(cl_method=method, output_dir=str(tmp_path / f"out_{method}"), **overrides)
    trainer = ContinualLearningTrainer(
        cfg, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    )
    return cfg, trainer.main()


@pytest.mark.slow
def test_naive_sequence(tmp_path):
    cfg, result = run_cl(tmp_path, "naive")
    acc = np.asarray(result["accuracy_matrix"])
    assert acc.shape == (2, 2)
    assert (acc >= 0).all() and (acc <= 1).all()
    for task in cfg.tasks:
        assert os.path.exists(os.path.join(cfg.output_dir, "ckpt", f"{task}_best.safetensors"))
    # BWT formula: A[0,1] - A[0,0]
    assert abs(result["bwt"] - (acc[0, 1] - acc[0, 0])) < 1e-9
    assert os.path.exists(os.path.join(cfg.output_dir, "log", "hps.json"))
    assert os.path.exists(os.path.join(cfg.output_dir, "log", "results.json"))

    # CKA sweep CLI over the finished run's checkpoints (VERDICT r1 #6;
    # reference capability: analysis/get_average_CKA_per_layer.py)
    from mafed_tpu.analysis.sweep import main as sweep_main

    report = sweep_main([
        "--experiment_dir", cfg.output_dir,
        "--max_batches", "2",
        "--synthetic_images",
    ])
    n_layers_plus = len(report["layers"])
    assert n_layers_plus >= 3  # embeddings + per-layer taps
    assert len(report["avg_text_cka"]) == n_layers_plus
    assert all(0.0 <= v <= 1.0 + 1e-6 for v in report["avg_text_cka"])
    assert all(0.0 <= v <= 1.0 + 1e-6 for v in report["avg_image_cka"])
    assert os.path.exists(os.path.join(cfg.output_dir, "log", "cka_report.json"))


@pytest.mark.slow
def test_replay_sequence(tmp_path):
    cfg, result = run_cl(tmp_path, "replay", cl_memory=8, replay_interval=2)
    assert np.asarray(result["accuracy_matrix"]).shape == (2, 2)


@pytest.mark.slow
def test_ewc_sequence(tmp_path):
    cfg, result = run_cl(tmp_path, "ewc", reg_lambda=100.0)
    assert np.asarray(result["accuracy_matrix"]).shape == (2, 2)


@pytest.mark.slow
def test_featdistill_balanced_sequence(tmp_path):
    cfg, result = run_cl(
        tmp_path,
        "featdistill",
        cl_memory=8,
        replay_interval=2,
        distillation_modality_weighing_strategy="balanced",
        distillation_layer_weighing_strategy="discounted",
        distillation_layer_discount=0.5,
    )
    assert np.asarray(result["accuracy_matrix"]).shape == (2, 2)


@pytest.mark.slow
def test_featdistill_memory_smaller_than_batch(tmp_path):
    """3-task sequence whose per-task memory (cl_memory/(T-1) = 2) is SMALLER
    than the batch (4): the infinite memory stream must fill distill batches
    by cycling permutations instead of hanging (regression for the pre-carry
    BatchLoader, which yielded nothing when len(memory) < batch_size)."""
    from tests.helpers import write_synthetic_vqa

    cfg = write_synthetic_vqa(str(tmp_path), tasks=("taskA", "taskB", "taskC"))
    cfg = cfg.replace(
        cl_method="featdistill",
        output_dir=str(tmp_path / "out_small_mem"),
        cl_memory=4,
        replay_interval=2,
        distillation_modality_weighing_strategy="balanced",
        distillation_layer_weighing_strategy="discounted",
        distillation_layer_discount=0.5,
    )
    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    trainer = ContinualLearningTrainer(
        cfg, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    )
    result = trainer.main()
    assert np.asarray(result["accuracy_matrix"]).shape == (3, 3)


@pytest.mark.slow
def test_featdistill_adaptive_sequence(tmp_path):
    cfg, result = run_cl(
        tmp_path,
        "featdistill",
        cl_memory=8,
        replay_interval=2,
        distillation_modality_weighing_strategy="adaptive",
        distillation_layer_weighing_strategy="discounted",
    )
    assert np.asarray(result["accuracy_matrix"]).shape == (2, 2)
