"""Mid-task resume: the CL trainer continues from the saved epoch."""

import os

import numpy as np
import pytest

from tests.helpers import tiny_model_cfg, write_synthetic_vqa


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

    # resume run: starts at epoch 2 (beyond epochs=[2]) -> zero extra epochs,
    # completes evaluation without retraining
    cfg2 = cfg.replace(resume_from_checkpoint=resume_dir)
    t2 = ContinualLearningTrainer(cfg2, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False)
    r2 = t2.main()
    assert np.asarray(r2["accuracy_matrix"]).shape == (1, 1)
