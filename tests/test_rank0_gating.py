"""Non-main processes must not write provenance/metrics/checkpoints
(reference save.py:35 rank-0 gating; multi-host pods share output_dir)."""

import os

import numpy as np

from tests.helpers import tiny_model_cfg, write_synthetic_vqa


def test_non_main_process_writes_nothing(tmp_path, monkeypatch):
    import mafed_tpu.core.dist as dist
    import mafed_tpu.trainer.continual as continual

    monkeypatch.setattr(dist, "is_main_process", lambda: False)

    cfg = write_synthetic_vqa(str(tmp_path))
    cfg = cfg.replace(cl_method="naive", output_dir=str(tmp_path / "out"), epochs=[1, 1])
    trainer = continual.ContinualLearningTrainer(
        cfg, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    )
    assert trainer.is_main is False
    assert trainer.metrics is None
    # provenance files not written by a non-main process
    assert not os.path.exists(os.path.join(cfg.output_dir, "log", "hps.json"))
    assert not os.path.exists(os.path.join(cfg.output_dir, "log", "model_config.json"))


def test_main_process_writes_provenance(tmp_path):
    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    cfg = write_synthetic_vqa(str(tmp_path))
    cfg = cfg.replace(cl_method="naive", output_dir=str(tmp_path / "out"))
    trainer = ContinualLearningTrainer(
        cfg, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    )
    assert trainer.is_main is True
    assert trainer.metrics is not None
    assert os.path.exists(os.path.join(cfg.output_dir, "log", "hps.json"))
    assert os.path.exists(os.path.join(cfg.output_dir, "log", "model_config.json"))
