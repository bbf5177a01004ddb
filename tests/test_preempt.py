"""Cooperative preemption: SIGTERM -> clean exit at an update boundary with a
mid-epoch resume bundle, and EXACT continuation (the reference has no signal
handling at all — a preempted run loses everything since the last epoch-end
checkpoint, mafed/train.py:284-301)."""

import json
import os
import signal

import numpy as np
import pytest

from mafed_tpu.core import preempt
from tests.helpers import tiny_model_cfg, write_synthetic_vqa


@pytest.fixture(autouse=True)
def _clean_preempt_state():
    preempt.clear()
    yield
    preempt.clear()


def test_signal_handler_sets_flag():
    preempt.install_handlers((signal.SIGUSR1,))
    assert not preempt.preemption_requested()
    os.kill(os.getpid(), signal.SIGUSR1)
    assert preempt.preemption_requested()
    preempt.clear()
    assert not preempt.preemption_requested()


def test_reinstall_after_dist_init_restores_flag_handler(monkeypatch):
    """jax.distributed.initialize()'s preemption notifier installs an
    OS-level SIGTERM handler that displaces the Python flag handler; on a
    single-process run the flag is the ONLY preemption mechanism, so the
    post-init hook must put it back (multi-process runs keep jax's handler —
    they agree on a stop boundary via reached_preemption_sync_point)."""
    prev = signal.getsignal(signal.SIGTERM)
    try:
        preempt.install_handlers()
        # simulate the notifier displacing the Python handler during init
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        preempt.reinstall_after_dist_init()
        assert signal.getsignal(signal.SIGTERM) is preempt._handler

        # multi-process: jax's own notifier must be left in place
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        import jax

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        preempt.reinstall_after_dist_init()
        assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_request_after_counts_updates():
    preempt.request_preemption_after(2)
    assert not preempt.preemption_requested()
    preempt.tick_update()
    assert not preempt.preemption_requested()
    preempt.tick_update()
    assert preempt.preemption_requested()


def _make_cfg(root: str, out: str):
    cfg = write_synthetic_vqa(root, tasks=("taskA",), n_train=16, n_val=4)
    return cfg.replace(
        cl_method="naive",
        output_dir=out,
        epochs=[2],
        accumulate_grad_batches=2,
        log_every=100,
    )


def _load_safetensors(path):
    from safetensors.numpy import load_file

    return load_file(path)


@pytest.mark.slow
def test_preempt_then_resume_matches_uninterrupted(tmp_path):
    """Preempt after the first window of epoch 0, resume, finish: final
    params bit-identical to the run that was never interrupted."""
    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    # 16 train rows / batch 4 = 4 batches/epoch; window 2 -> 2 updates/epoch
    root = str(tmp_path)
    cfg_a = _make_cfg(root, os.path.join(root, "out_a"))
    t_a = ContinualLearningTrainer(
        cfg_a, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    )
    t_a.main()
    final_a = _load_safetensors(os.path.join(cfg_a.output_dir, "resume", "model.safetensors"))

    cfg_b = _make_cfg(root, os.path.join(root, "out_b"))
    preempt.request_preemption_after(1)  # stop after the 1st applied window
    t_b = ContinualLearningTrainer(
        cfg_b, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    )
    with pytest.raises(preempt.Preempted) as exc:
        t_b.main()
    assert exc.value.code == 143

    resume_dir = os.path.join(cfg_b.output_dir, "resume")
    meta = json.load(open(os.path.join(resume_dir, "fit_state.json")))
    assert meta["epoch"] == 0
    assert meta["batches_done"] == 2  # one window = 2 microbatches consumed

    preempt.clear()
    cfg_b2 = cfg_b.replace(resume_from_checkpoint=resume_dir)
    t_b2 = ContinualLearningTrainer(
        cfg_b2, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    )
    r = t_b2.main()
    assert np.asarray(r["accuracy_matrix"]).shape == (1, 1)

    final_b = _load_safetensors(os.path.join(resume_dir, "model.safetensors"))
    assert final_a.keys() == final_b.keys()
    for k in final_a:
        np.testing.assert_array_equal(
            final_a[k], final_b[k], err_msg=f"param {k} diverged after resume"
        )


@pytest.mark.slow
def test_preempt_multisteps_path(tmp_path):
    """Same contract on the per-microbatch MultiSteps path (window=1)."""
    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    root = str(tmp_path)
    cfg = _make_cfg(root, os.path.join(root, "out"))
    cfg = cfg.replace(fused_window=False)
    preempt.request_preemption_after(3)
    t = ContinualLearningTrainer(
        cfg, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    )
    with pytest.raises(preempt.Preempted):
        t.main()
    meta = json.load(open(os.path.join(cfg.output_dir, "resume", "fit_state.json")))
    assert meta["epoch"] == 0 and meta["batches_done"] == 3

    preempt.clear()
    cfg2 = cfg.replace(resume_from_checkpoint=os.path.join(cfg.output_dir, "resume"))
    t2 = ContinualLearningTrainer(
        cfg2, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    )
    r = t2.main()
    assert np.asarray(r["accuracy_matrix"]).shape == (1, 1)


@pytest.mark.slow
def test_preempt_resume_two_task_replay_matches_uninterrupted(tmp_path):
    """Preempt mid-task-1 of a 2-task ER run; restart the FULL sequence with
    resume_from_checkpoint. Covers two resume-correctness contracts:
    (a) the task-1 bundle must NOT be applied to task 0's re-fit (stale-
    bundle clobber), and (b) the seeded memory stream must fast-forward to
    the bundle's draw count so post-resume replay batches match. Final
    params must be bit-identical to the uninterrupted run."""
    from mafed_tpu.trainer.continual import ContinualLearningTrainer
    from tests.helpers import write_synthetic_vqa

    def cfg_for(out):
        cfg = write_synthetic_vqa(str(tmp_path), tasks=("taskA", "taskB"), n_train=16, n_val=4)
        return cfg.replace(
            cl_method="replay",
            cl_memory=8,
            replay_interval=4,
            output_dir=out,
            epochs=[1, 2],
            accumulate_grad_batches=2,
            log_every=100,
        )

    cfg_a = cfg_for(os.path.join(str(tmp_path), "out_a"))
    ContinualLearningTrainer(
        cfg_a, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    ).main()
    final_a = _load_safetensors(os.path.join(cfg_a.output_dir, "resume", "model.safetensors"))

    # task 0: 1 epoch x 2 windows = 2 updates; preempt after task 1's 2nd
    # window (epoch 0 done there, one memory draw consumed)
    cfg_b = cfg_for(os.path.join(str(tmp_path), "out_b"))
    preempt.request_preemption_after(4)
    with pytest.raises(preempt.Preempted):
        ContinualLearningTrainer(
            cfg_b, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
        ).main()
    resume_dir = os.path.join(cfg_b.output_dir, "resume")
    meta = json.load(open(os.path.join(resume_dir, "fit_state.json")))
    assert meta["task_id"] == 1
    assert meta["epoch"] == 0 and meta["batches_done"] == 4
    assert meta["mem_draws"] == 1

    preempt.clear()
    cfg_b2 = cfg_b.replace(resume_from_checkpoint=resume_dir)
    r = ContinualLearningTrainer(
        cfg_b2, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    ).main()
    assert np.asarray(r["accuracy_matrix"]).shape == (2, 2)

    final_b = _load_safetensors(os.path.join(resume_dir, "model.safetensors"))
    assert final_a.keys() == final_b.keys()
    for key in final_a:
        np.testing.assert_array_equal(
            final_a[key], final_b[key], err_msg=f"param {key} diverged after resume"
        )

    # cross-task metric-step continuity: the restart skips task 0, so its
    # wandb/JSONL offset must come from the bundle (metrics_offset) — task-1
    # rows land on the same global axis as the uninterrupted run's
    def steps_of(out_dir, key):
        vals = set()
        with open(os.path.join(out_dir, "log", "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if key in rec:
                    vals.add(rec["_step"])
        return vals

    a_steps = steps_of(cfg_a.output_dir, "task_1/valid_acc")
    b_steps = steps_of(cfg_b.output_dir, "task_1/valid_acc")
    assert a_steps and a_steps <= b_steps, (a_steps, b_steps)


@pytest.mark.slow
def test_preempt_resume_two_task_featdistill_matches_uninterrupted(tmp_path):
    """Same contract as the ER variant for the flagship method: preempt
    mid-task-1 of a 2-task MAFED run and restart the full sequence. Beyond
    the memory fast-forward this exercises the distillation-specific resume
    state: the frozen teacher rebuilt from task 0's best checkpoint and the
    modality/layer coefficients must match the uninterrupted run's, or the
    post-resume distill windows diverge. Final params bit-identical."""
    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    def cfg_for(out):
        cfg = write_synthetic_vqa(str(tmp_path), tasks=("taskA", "taskB"), n_train=16, n_val=4)
        return cfg.replace(
            cl_method="featdistill",
            cl_memory=8,
            replay_interval=4,
            distillation_modality_weighing_strategy="balanced",
            distillation_layer_weighing_strategy="discounted",
            distillation_layer_discount=0.5,
            output_dir=out,
            epochs=[1, 2],
            accumulate_grad_batches=2,
            log_every=100,
        )

    cfg_a = cfg_for(os.path.join(str(tmp_path), "fd_a"))
    ContinualLearningTrainer(
        cfg_a, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    ).main()
    final_a = _load_safetensors(os.path.join(cfg_a.output_dir, "resume", "model.safetensors"))

    cfg_b = cfg_for(os.path.join(str(tmp_path), "fd_b"))
    preempt.request_preemption_after(4)
    with pytest.raises(preempt.Preempted):
        ContinualLearningTrainer(
            cfg_b, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
        ).main()
    resume_dir = os.path.join(cfg_b.output_dir, "resume")
    meta = json.load(open(os.path.join(resume_dir, "fit_state.json")))
    assert meta["task_id"] == 1
    assert meta["mem_draws"] == 1  # one distill microbatch consumed pre-preempt

    preempt.clear()
    cfg_b2 = cfg_b.replace(resume_from_checkpoint=resume_dir)
    r = ContinualLearningTrainer(
        cfg_b2, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    ).main()
    assert np.asarray(r["accuracy_matrix"]).shape == (2, 2)

    final_b = _load_safetensors(os.path.join(resume_dir, "model.safetensors"))
    assert final_a.keys() == final_b.keys()
    for key in final_a:
        np.testing.assert_array_equal(
            final_a[key], final_b[key], err_msg=f"param {key} diverged after resume"
        )


@pytest.mark.slow
def test_epoch_bundle_window_carry_resume_matches_uninterrupted(tmp_path):
    """5 batches/epoch with window 2: each epoch ends with one carried
    microbatch. Resuming from an epoch-end bundle must replay the carried
    microbatch into the next epoch's first window exactly as the
    uninterrupted run does."""
    from mafed_tpu.trainer.continual import ContinualLearningTrainer
    from tests.helpers import write_synthetic_vqa

    def cfg_for(out, epochs):
        cfg = write_synthetic_vqa(str(tmp_path), tasks=("taskA",), n_train=20, n_val=4)
        return cfg.replace(
            cl_method="naive",
            output_dir=out,
            epochs=[epochs],
            accumulate_grad_batches=2,
            log_every=100,
        )

    cfg_a = cfg_for(os.path.join(str(tmp_path), "out_a"), 2)
    ContinualLearningTrainer(
        cfg_a, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    ).main()
    final_a = _load_safetensors(os.path.join(cfg_a.output_dir, "resume", "model.safetensors"))

    # stop cleanly after epoch 0 (its trailing batch 4 carried, unapplied)
    cfg_b = cfg_for(os.path.join(str(tmp_path), "out_b"), 1)
    ContinualLearningTrainer(
        cfg_b, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    ).main()
    resume_dir = os.path.join(cfg_b.output_dir, "resume")
    meta = json.load(open(os.path.join(resume_dir, "fit_state.json")))
    assert meta["window_carry"] == [[0, 4]]

    cfg_b2 = cfg_for(os.path.join(str(tmp_path), "out_b"), 2).replace(
        resume_from_checkpoint=resume_dir
    )
    ContinualLearningTrainer(
        cfg_b2, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    ).main()
    final_b = _load_safetensors(os.path.join(resume_dir, "model.safetensors"))
    for key in final_a:
        np.testing.assert_array_equal(
            final_a[key], final_b[key], err_msg=f"param {key} diverged after carry resume"
        )
