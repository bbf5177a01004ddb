"""wandb-live branch of MetricsLogger, exercised via a mock module
(VERDICT r2 #6): the reference's CLWandbLogger registers custom step axes
and offsets global steps across tasks (mafed/utils/logger.py:62-98); the
CL summary metrics are logged under validation/* against the task index.
"""

import json
import sys
import types

import pytest


class FakeRun:
    def __init__(self):
        self.defined = []
        self.logged = []

    def define_metric(self, name, step_metric=None, step_sync=None):
        self.defined.append((name, step_metric))

    def log(self, payload):
        self.logged.append(dict(payload))

    def finish(self):
        self.finished = True


@pytest.fixture
def fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    runs = []

    def init(**kwargs):
        run = FakeRun()
        run.init_kwargs = kwargs
        runs.append(run)
        return run

    mod.init = init
    mod._runs = runs
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def make_logger(tmp_path):
    from mafed_tpu.core.logging import MetricsLogger

    return MetricsLogger(
        project="proj", entity="ent", group="grp", name="run",
        output_dir=str(tmp_path), use_wandb=True,
    )


def test_define_metric_axes_match_logged_keys(tmp_path, fake_wandb):
    logger = make_logger(tmp_path)
    run = fake_wandb._runs[0]
    assert run.init_kwargs["project"] == "proj"
    assert ("trainer/global_step", None) in run.defined
    assert ("*", "trainer/global_step") in run.defined
    # ADVICE r2: the CL summary metrics are logged as validation/*
    # (trainer/continual.py validate_all_tasks) — the registered axis
    # pattern must cover the REAL key names
    assert ("validation/*", "trainer/valid_step") in run.defined
    assert logger._wandb is run


def test_train_metrics_carry_offset_global_step(tmp_path, fake_wandb):
    logger = make_logger(tmp_path)
    run = fake_wandb._runs[0]
    logger.log_metrics({"task_0/train_loss": 1.5}, step=7)
    logger.set_global_step_offset(100)
    logger.log_metrics({"task_1/train_loss": 1.0}, step=7)
    assert run.logged[0]["trainer/global_step"] == 7
    assert run.logged[1]["trainer/global_step"] == 107
    assert run.logged[1]["task_1/train_loss"] == 1.0


def test_validation_metrics_use_valid_step_axis_without_offset(tmp_path, fake_wandb):
    logger = make_logger(tmp_path)
    run = fake_wandb._runs[0]
    logger.set_global_step_offset(500)
    logger.log_metrics(
        {"validation/average_accuracy": 0.4, "validation/BWT": -0.01},
        step=2, is_valid_step=True,
    )
    payload = run.logged[0]
    # valid-step axis, task index, NOT offset by the train step counter
    assert payload["trainer/valid_step"] == 2
    assert "trainer/global_step" not in payload
    assert payload["validation/average_accuracy"] == pytest.approx(0.4)
    assert payload["validation/BWT"] == pytest.approx(-0.01)


def test_jsonl_written_alongside_wandb(tmp_path, fake_wandb):
    logger = make_logger(tmp_path)
    logger.log_metrics({"task_0/valid_acc": 0.25}, step=3)
    logger.finish()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["task_0/valid_acc"] == 0.25
    assert lines[0]["_step"] == 3
    assert getattr(fake_wandb._runs[0], "finished", False)


def test_wandb_init_failure_falls_back_to_jsonl(tmp_path, monkeypatch):
    mod = types.ModuleType("wandb")

    def init(**kwargs):
        raise RuntimeError("no network")

    mod.init = init
    monkeypatch.setitem(sys.modules, "wandb", mod)
    logger = make_logger(tmp_path)
    assert logger._wandb is None
    logger.log_metrics({"x": 1.0}, step=0)
    assert (tmp_path / "metrics.jsonl").exists()
