"""Fused accumulation-window mode (config.fused_window) equivalence.

The fused path runs one jit step per accumulation window (training/step.py
make_ce_window_step / make_mafed_window_step); the fallback path runs
per-microbatch steps under optax.MultiSteps. Both must produce the same
training trajectory — verified end-to-end through the orchestrator: two
identical tiny CL sequences, fused on/off, must land on (numerically) the
same best checkpoints.

Step-level equivalence is covered by
tests/test_distill_step.py::test_window_step_matches_multisteps_microbatches;
this exercises the strategy/runner wiring (replay-position substitution,
window assembly, cadence).
"""

import numpy as np
import pytest

from tests.helpers import tiny_model_cfg, write_synthetic_vqa


def _run(tmp_path, tag, method, fused, **overrides):
    from mafed_tpu.trainer.continual import ContinualLearningTrainer
    from mafed_tpu.utils.checkpoint import load_task_checkpoint

    cfg = write_synthetic_vqa(str(tmp_path / tag))
    kwargs = dict(
        cl_method=method,
        output_dir=str(tmp_path / tag / "out"),
        accumulate_grad_batches=2,
        fused_window=fused,
    )
    kwargs.update(overrides)
    cfg = cfg.replace(**kwargs)
    model_cfg = tiny_model_cfg()
    trainer = ContinualLearningTrainer(
        cfg, model_cfg=model_cfg, synthetic_images=True, use_mesh=False
    )
    trainer.main()
    import os

    last = cfg.tasks[-1]
    params = load_task_checkpoint(
        os.path.join(cfg.output_dir, "ckpt", f"{last}_best.safetensors"), model_cfg
    )
    return params, trainer.runner.window


def _assert_params_close(a, b):
    import jax

    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        # fp-accumulation noise on ~1e-2-scale weights after several AdamW
        # steps; the fused/MultiSteps trajectories are equivalent, not
        # bit-identical (different reduction order)
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32), rtol=2e-3, atol=2e-4
        )


@pytest.mark.slow
def test_window_policy_decided_before_setup_task_optimizer():
    """Restart runs call strategy.update() for SKIPPED tasks before
    setup_task_optimizer ever runs; the memory iterators built there must
    already use the layout the next trained task's fit will use —
    ensure_window_policy decides the fused-window size without building the
    optimizer (regression: runner.window stayed 1 through skipped-task
    transitions, handing fused-window fits a device-prefetched memory
    stream)."""
    from mafed_tpu.cl.base import Naive
    from mafed_tpu.core.config import TrainConfig
    from mafed_tpu.data.tokenizer import ByteTokenizer
    from mafed_tpu.trainer.runner import TaskRunner

    cfg = TrainConfig(batch_size=4, accumulate_grad_batches=4, tasks=["a", "b"])
    runner = TaskRunner(tiny_model_cfg(), cfg, ByteTokenizer(), mesh=None)
    assert runner.window == 1  # pre-policy default
    runner.ensure_window_policy(Naive(cfg, tiny_model_cfg()))
    assert runner.window == 4
    assert runner.host_window  # single-process: host-stacked windows


def test_featdistill_window_equivalence(tmp_path):
    kw = dict(
        cl_memory=8,
        replay_interval=2,
        distillation_modality_weighing_strategy="balanced",
        distillation_layer_weighing_strategy="discounted",
        distillation_layer_discount=0.5,
    )
    fused_params, window = _run(tmp_path, "fused", "featdistill", True, **kw)
    assert window == 2  # the fused path actually engaged
    multi_params, window = _run(tmp_path, "multi", "featdistill", False, **kw)
    assert window == 1
    _assert_params_close(fused_params, multi_params)


@pytest.mark.slow
def test_replay_window_equivalence(tmp_path):
    kw = dict(cl_memory=8, replay_interval=2)
    fused_params, window = _run(tmp_path, "fused", "replay", True, **kw)
    assert window == 2
    multi_params, window = _run(tmp_path, "multi", "replay", False, **kw)
    assert window == 1
    _assert_params_close(fused_params, multi_params)


@pytest.mark.slow
def test_fused_window_under_dp8_mesh(tmp_path):
    """The runner's window assembly (device-side stack + reshard to
    P(None, 'data')) must work under an 8-device data-parallel mesh."""
    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    cfg = write_synthetic_vqa(str(tmp_path))
    cfg = cfg.replace(
        cl_method="replay",
        output_dir=str(tmp_path / "out"),
        accumulate_grad_batches=2,
        cl_memory=8,
        replay_interval=2,
        batch_size=8,
        val_batch_size=8,
        mesh_shape=[8, 1],
    )
    trainer = ContinualLearningTrainer(
        cfg, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=True
    )
    result = trainer.main()
    assert trainer.runner.window == 2
    acc = np.asarray(result["accuracy_matrix"])
    assert acc.shape == (2, 2) and np.isfinite(acc).all()


@pytest.mark.slow
def test_ewc_window_equivalence(tmp_path):
    """Task 1 runs with a live EWC penalty: the fused window path must route
    through ewc_window_step and match the MultiSteps trajectory."""
    kw = dict(reg_lambda=100.0)
    fused_params, window = _run(tmp_path, "fused", "ewc", True, **kw)
    assert window == 2
    multi_params, window = _run(tmp_path, "multi", "ewc", False, **kw)
    assert window == 1
    _assert_params_close(fused_params, multi_params)


def test_featdistill_falls_back_when_cadence_unfoldable(tmp_path):
    """replay_interval < accum: two replay positions per window — must fall
    back to the MultiSteps path rather than silently drop a replay batch."""
    from mafed_tpu.cl.distillation import FeatureDistillation

    cfg = write_synthetic_vqa(str(tmp_path)).replace(
        accumulate_grad_batches=4,
        replay_interval=2,
        cl_memory=8,
        distillation_layer_weighing_strategy="discounted",
    )
    strat = FeatureDistillation(cfg, tiny_model_cfg())
    assert not strat.supports_fused_window(4)
    assert strat.supports_fused_window(2)


@pytest.mark.slow
def test_featdistill_fallback_fit_runs(tmp_path):
    """End-to-end: with fused_window requested but an unfoldable cadence
    (interval 2 < accum 4), the trainer must transparently run the
    per-microbatch MultiSteps path."""
    params, window = _run(
        tmp_path, "fallback", "featdistill", True,
        accumulate_grad_batches=4,
        cl_memory=8,
        replay_interval=2,
        distillation_modality_weighing_strategy="balanced",
        distillation_layer_weighing_strategy="discounted",
    )
    import jax

    assert window == 1  # fell back
    leaves = jax.tree.leaves(params)
    assert leaves and all(np.isfinite(np.asarray(x, np.float32)).all() for x in leaves)
