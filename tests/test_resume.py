"""Mid-task resume: the CL trainer continues from the saved epoch."""

import os

import numpy as np
import pytest

from tests.helpers import tiny_model_cfg, write_synthetic_vqa


@pytest.mark.slow
def test_resume_after_early_stop_trains_no_extra_epoch(tmp_path, monkeypatch):
    """The epoch-end bundle is saved BEFORE the early-stop break, so a crash
    between the two leaves a bundle whose wait already exhausted patience.
    A restart must NOT train an extra epoch from it (the patience check used
    to run only at epoch END, so the resumed run trained a whole epoch the
    uninterrupted run never ran, potentially shifting {task}_best)."""
    import json

    import mafed_tpu.trainer.runner as runner_mod
    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    real_validate = runner_mod.validate_vqa
    fit_validations = []

    def fixed_validate(*args, **kw):
        # constant accuracy: epoch 0 sets best, epoch 1 exhausts patience=1
        fit_validations.append(1)
        log, preds = real_validate(*args, **kw)
        log = dict(log)
        log["valid/acc"] = 0.5
        return log, preds

    monkeypatch.setattr(runner_mod, "validate_vqa", fixed_validate)

    cfg = write_synthetic_vqa(str(tmp_path), tasks=("taskA",))
    cfg = cfg.replace(
        cl_method="naive", output_dir=str(tmp_path / "out"), epochs=[4, 4], patience=1
    )
    t1 = ContinualLearningTrainer(cfg, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False)
    t1.main()
    resume_dir = os.path.join(cfg.output_dir, "resume")
    meta = json.load(open(os.path.join(resume_dir, "fit_state.json")))
    # early-stopped at epoch 1 with patience exhausted; the bundle survives
    assert meta["task_id"] == 0 and meta["epoch"] == 1 and meta["wait"] >= 1
    assert len(fit_validations) == 2

    fit_validations.clear()
    cfg2 = cfg.replace(resume_from_checkpoint=resume_dir)
    t2 = ContinualLearningTrainer(cfg2, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False)
    t2.main()
    # zero fit-loop epochs ran (validate_all_tasks uses its own import and is
    # not counted here)
    assert fit_validations == []


@pytest.mark.slow
def test_mid_task_resume(tmp_path):
    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    cfg = write_synthetic_vqa(str(tmp_path), tasks=("taskA",))
    cfg = cfg.replace(
        cl_method="naive", output_dir=str(tmp_path / "out"), epochs=[2, 2]
    )
    t1 = ContinualLearningTrainer(cfg, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False)
    r1 = t1.main()
    resume_dir = os.path.join(cfg.output_dir, "resume")
    assert os.path.exists(os.path.join(resume_dir, "fit_state.json"))
    import json

    meta = json.load(open(os.path.join(resume_dir, "fit_state.json")))
    assert meta["task_id"] == 0 and meta["epoch"] == 1

    # every bundle save is attributed in the metrics stream (the integrated
    # wall-clock delta between resume_bundle_every settings must be
    # explainable from these records alone)
    saves = []
    with open(os.path.join(cfg.output_dir, "log", "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            saves += [v for k, v in rec.items() if k.endswith("bundle_save_s")]
    assert len(saves) == 2 and all(s >= 0 for s in saves)  # one per epoch

    # resume run: starts at epoch 2 (beyond epochs=[2]) -> zero extra epochs,
    # completes evaluation without retraining
    cfg2 = cfg.replace(resume_from_checkpoint=resume_dir)
    t2 = ContinualLearningTrainer(cfg2, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False)
    r2 = t2.main()
    assert np.asarray(r2["accuracy_matrix"]).shape == (1, 1)
