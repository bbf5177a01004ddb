"""Per-task validation logging parity (component #18 hardening, VERDICT r3
#9): every validate_all_tasks round logs each task's valid/acc, valid/
ex_per_s and valid/n_ex (mafed/utils/eval_utils.py:152-154) at the valid
step, so the JSONL fallback — the canonical artifact on offline pods —
records the full TxT accuracy matrix the reference reconstructs from wandb,
alongside the average/BWT summary (mafed/train.py:61-67)."""

import json
from types import SimpleNamespace

import numpy as np
import pytest


TASKS = ("taskA", "taskB", "taskC")


@pytest.fixture
def fake_trainer(tmp_path, monkeypatch):
    from mafed_tpu.core.logging import MetricsLogger
    from mafed_tpu.trainer import continual

    # canned per-(val_task, round) accuracies; validate_vqa is exercised for
    # real in test_end_to_end / test_decode — here only the logging contract
    canned = {
        "taskA": {"valid/acc": 0.50, "valid/ex_per_s": 100.0, "valid/n_ex": 8},
        "taskB": {"valid/acc": 0.25, "valid/ex_per_s": 90.0, "valid/n_ex": 8},
        "taskC": {"valid/acc": 0.10, "valid/ex_per_s": 80.0, "valid/n_ex": 8},
    }
    calls = []

    def fake_validate_vqa(params, decoder, loader, tokenizer, batch_size, **kw):
        calls.append(loader)
        return dict(canned[loader]), {}

    monkeypatch.setattr(continual, "validate_vqa", fake_validate_vqa)

    self = SimpleNamespace(
        config=SimpleNamespace(tasks=list(TASKS), val_batch_size=4, val_max_batches=None),
        runner=SimpleNamespace(
            eval_param_sharding=None,
            place_params=lambda p: p,
            decoder=None,
            eval_sharding=None,
            eval_resolve=None,
        ),
        tokenizer=None,
        val_loaders={t: t for t in TASKS},  # loader stands in for its task name
        metrics=MetricsLogger(output_dir=str(tmp_path), use_wandb=False),
    )
    self.validate_all_tasks = continual.ContinualLearningTrainer.validate_all_tasks.__get__(self)
    return self, tmp_path, calls, canned


def test_jsonl_records_full_accuracy_matrix(fake_trainer):
    self, tmp_path, calls, canned = fake_trainer
    n = len(TASKS)
    accuracy = np.zeros((n, n))
    for task_id in range(n):
        accuracy = self.validate_all_tasks(None, task_id, accuracy)
    assert calls == list(TASKS) * n  # every task validated every round

    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(rows) == n  # one valid-step record per round
    for task_id, row in enumerate(rows):
        assert row["_step"] == task_id
        for t in TASKS:
            assert row[f"validation/{t}/acc"] == pytest.approx(canned[t]["valid/acc"])
            assert row[f"validation/{t}/ex_per_s"] == pytest.approx(canned[t]["valid/ex_per_s"])
            assert row[f"validation/{t}/n_ex"] == canned[t]["valid/n_ex"]
    # the TxT matrix is reconstructable from the JSONL alone
    matrix = np.array([[rows[c][f"validation/{t}/acc"] for c in range(n)] for t in TASKS])
    np.testing.assert_allclose(matrix, accuracy)


def test_summary_metrics_match_reference_math(fake_trainer):
    self, tmp_path, _, canned = fake_trainer
    n = len(TASKS)
    accuracy = np.zeros((n, n))
    for task_id in range(n):
        accuracy = self.validate_all_tasks(None, task_id, accuracy)
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    # round 0: average over column 0, no BWT (train.py:63-67)
    assert rows[0]["validation/average_accuracy"] == pytest.approx(np.mean(accuracy[:, 0]))
    assert "validation/BWT" not in rows[0]
    for task_id in (1, 2):
        expected_bwt = float(np.mean(np.diag(
            accuracy[:task_id, task_id] - accuracy[:task_id, :task_id])))
        assert rows[task_id]["validation/BWT"] == pytest.approx(expected_bwt)
