"""On-TPU preemption chaos drill at 410M through the REAL CLI + supervisor.

The CPU chaos drill (tests/test_supervise.py) proves the resume logic;
this proves it on the actual chip with the production model: an
uninterrupted `python -m mafed_tpu.train` run vs the same command wrapped
in scripts/supervise.py with MAFED_PREEMPT_AFTER=N (deterministic
preemption after every N applied updates → repeated 143-exits + relaunches
with --resume_from_checkpoint). Final {task}_best checkpoints must be
bit-identical and the accuracy matrices equal.

Replaces/validates the reference's nearest feature — PL's epoch-granular
resume_from_checkpoint flag (mafed/train.py:323), which loses mid-epoch
progress and is never exercised in that repo.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/drill_tpu.py [workdir]
Env: DRILL_N_TRAIN (default 128), DRILL_PREEMPT_AFTER (default 3),
DRILL_METHOD (default naive; featdistill drills the teacher/memory resume
path with canonical MAFED-balanced settings).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mafed_drill_")
    sys.path.insert(0, REPO)
    n_train = int(os.environ.get("DRILL_N_TRAIN", "128"))
    preempt_after = int(os.environ.get("DRILL_PREEMPT_AFTER", "3"))
    method = os.environ.get("DRILL_METHOD", "naive")

    from tests.test_cli_e2e import _write_dataset_with_real_images

    from mafed_tpu.core.config import model_config_for_preset

    img_dir = _write_dataset_with_real_images(workdir, n_train=n_train, n_val=16)
    model_cfg_path = os.path.join(workdir, "model_config.json")
    with open(model_cfg_path, "w") as f:
        json.dump(model_config_for_preset("410m").to_dict(), f)

    cli_cfg = {
        "data_dir": workdir,
        "question_task_ids": os.path.join(workdir, "contvqa"),
        "exp": "tiny",
        "tasks": ["taskA", "taskB"],
        "train_img_dirs": [img_dir],
        "val_img_dirs": [img_dir],
        "batch_size": 16,
        "val_batch_size": 16,
        "accumulate_grad_batches": 4,
        # 128 train / 16 = 8 batches = 2 windows/epoch; 2 epochs x 2 tasks
        # = 8 updates total -> preempt_after=3 forces >=2 preemptions
        "epochs": [2, 2],
        "max_txt_len": 24,
        "val_max_batches": 1,
        "n_workers": 2,
        "val_num_workers": 2,
        "learning_rate": 1e-4,
        "optim": "adamw",
        "weight_decay": 0.01,
        "log_every": 50,
        "seed": 42,
        "allow_tokenizer_fallback": True,
        # skip routine epoch-end bundles (numerics-neutral save cadence):
        # each bundle moves ~9 GB (model + best + opt_state) through the
        # single-chip tunnel at ~20 MB/s. The preempt-time bundle save is
        # unconditional and the last epoch of each task always saves, which
        # is all the drill needs.
        "resume_bundle_every": 99,
    }
    if method == "featdistill":
        # memory + canonical MAFED-balanced settings: drills the
        # teacher/memory resume path, not just the optimizer/loader state
        cli_cfg.update({
            "cl_memory": 16,
            "replay_interval": 4,
            "distillation_modality_weighing_strategy": "balanced",
            "distillation_layer_weighing_strategy": "discounted",
            "distillation_layer_discount": 0.5,
        })
    cfg_path = os.path.join(workdir, "cli.json")
    with open(cfg_path, "w") as f:
        json.dump(cli_cfg, f)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("MAFED_PREEMPT_AFTER", None)

    def train_cmd(out):
        return [
            sys.executable, "-m", "mafed_tpu.train",
            "--config", cfg_path, "--model_config", model_cfg_path,
            "--output_dir", out, "--cl_method", method,
        ]

    out_ref = os.path.join(workdir, "ref")
    if os.path.exists(os.path.join(out_ref, "log", "results.json")):
        # reuse a previous invocation's uninterrupted run (the drill is two
        # long TPU runs; a timeout mid-supervised-run shouldn't redo the ref)
        print("reusing existing uninterrupted run", flush=True)
    else:
        t0 = time.time()
        rc = subprocess.call(train_cmd(out_ref), env=env, cwd=REPO)
        assert rc == 0, f"uninterrupted run failed rc={rc}"
        print(f"uninterrupted run: {time.time() - t0:.0f}s", flush=True)

    # fresh supervised dir per invocation: resuming a half-drilled sup dir
    # would skew the relaunch count the drill asserts on
    n = 0
    while os.path.exists(os.path.join(workdir, f"sup{n or ''}")):
        n += 1
    out_sup = os.path.join(workdir, f"sup{n or ''}")
    env_sup = dict(env)
    env_sup["MAFED_PREEMPT_AFTER"] = str(preempt_after)
    t0 = time.time()
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "supervise.py"),
            "--max-restarts", "12", "--backoff", "0", "--",
            *train_cmd(out_sup),
        ],
        env=env_sup, cwd=REPO, capture_output=True, text=True,
    )
    t_sup = time.time() - t0
    sys.stderr.write(proc.stderr[-3000:])
    assert proc.returncode == 0, f"supervised run failed rc={proc.returncode}"
    relaunches = proc.stderr.count("relaunching with --resume_from_checkpoint")
    print(f"supervised run: {t_sup:.0f}s, {relaunches} preemption relaunches", flush=True)
    assert relaunches >= 2, "drill did not actually preempt"

    import numpy as np
    from safetensors.numpy import load_file

    with open(os.path.join(out_ref, "log", "results.json")) as f:
        ref = json.load(f)
    with open(os.path.join(out_sup, "log", "results.json")) as f:
        sup = json.load(f)
    np.testing.assert_allclose(
        np.asarray(sup["accuracy_matrix"]), np.asarray(ref["accuracy_matrix"]), atol=1e-6
    )
    for task in ("taskA", "taskB"):
        a = load_file(os.path.join(out_ref, "ckpt", f"{task}_best.safetensors"))
        b = load_file(os.path.join(out_sup, "ckpt", f"{task}_best.safetensors"))
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"{task}:{k}")
    print(json.dumps({
        "drill": "ok",
        "relaunches": relaunches,
        "preempt_after": preempt_after,
        "checkpoints": "bit-identical",
        "accuracy_matrix": sup["accuracy_matrix"],
    }), flush=True)


if __name__ == "__main__":
    main()
