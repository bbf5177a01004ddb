"""scripts/supervise.py: the restart supervisor completes a repeatedly-
preempted run with results identical to an uninterrupted one.

Chaos drill: MAFED_PREEMPT_AFTER=N arms the deterministic countdown in
every (re)launch, so the child is preempted (exit 143) after every N
applied updates until the remaining work per attempt is < N. The
supervisor relaunches with --resume_from_checkpoint each time; the trainer
auto-skips completed tasks and resumes the preempted one at batch
granularity. Final checkpoints must be bit-identical to the run that was
never preempted.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.helpers import tiny_model_cfg
from tests.test_cli_e2e import _write_dataset_with_real_images

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_configs(root, img_dir):
    model_cfg_path = os.path.join(root, "model_config.json")
    with open(model_cfg_path, "w") as f:
        json.dump(tiny_model_cfg().to_dict(), f)
    cli_cfg = {
        "data_dir": root,
        "question_task_ids": os.path.join(root, "contvqa"),
        "exp": "tiny",
        "tasks": ["taskA", "taskB"],
        "train_img_dirs": [img_dir],
        "val_img_dirs": [img_dir],
        "batch_size": 4,
        "val_batch_size": 4,
        "accumulate_grad_batches": 2,
        "epochs": [2, 2],
        "max_txt_len": 24,
        "n_workers": 2,
        "val_num_workers": 2,
        "learning_rate": 1e-3,
        "optim": "adamw",
        "weight_decay": 0.01,
        "text_pad_multiple": 8,
        "mesh_shape": [1, 1],
        "log_every": 100,
        "seed": 42,
        "allow_tokenizer_fallback": True,
    }
    cfg_path = os.path.join(root, "cli.json")
    with open(cfg_path, "w") as f:
        json.dump(cli_cfg, f)
    return cfg_path, model_cfg_path


def _env(preempt_after=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # share the suite's persistent compile cache across attempts
    env["MAFED_TPU_XLA_CACHE"] = os.path.join(REPO, "tests", ".jax_cache")
    if preempt_after is not None:
        env["MAFED_PREEMPT_AFTER"] = str(preempt_after)
    else:
        env.pop("MAFED_PREEMPT_AFTER", None)
    return env


def _train_cmd(cfg_path, model_cfg_path, out):
    return [
        sys.executable, "-m", "mafed_tpu.train",
        "--config", cfg_path, "--model_config", model_cfg_path,
        "--output_dir", out, "--cl_method", "naive",
    ]


def test_supervisor_restarts_on_signal_death(tmp_path):
    """Real preemption can SIGKILL a child that never reaches the cooperative
    143 exit (grace window expired mid-step). subprocess reports signal
    deaths as NEGATIVE statuses; the supervisor must relaunch — the job still
    has a valid epoch-end resume bundle on disk."""
    child = tmp_path / "child.py"
    child.write_text(
        "import os, signal, sys\n"
        "out = sys.argv[sys.argv.index('--output_dir') + 1]\n"
        "flag = out + '.flag'\n"
        "if not os.path.exists(flag):\n"
        "    open(flag, 'w').close()\n"
        "    os.kill(os.getpid(), signal.SIGKILL)\n"
        "assert '--resume_from_checkpoint' in sys.argv\n"
        "print('second attempt ok')\n"
    )
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "supervise.py"),
            "--backoff", "0", "--",
            sys.executable, str(child), "--output_dir", str(tmp_path / "out"),
        ],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "status -9" in proc.stderr
    assert "second attempt ok" in proc.stdout


@pytest.mark.slow
def test_supervisor_completes_repeatedly_preempted_run(tmp_path):
    root = str(tmp_path)
    img_dir = _write_dataset_with_real_images(root)
    cfg_path, model_cfg_path = _write_configs(root, img_dir)

    out_ref = os.path.join(root, "ref")
    rc = subprocess.call(
        _train_cmd(cfg_path, model_cfg_path, out_ref), env=_env(), cwd=REPO
    )
    assert rc == 0

    # 4 updates total (2 tasks x 2 epochs x 1 window); preempt every 2 ->
    # at least two 143-exits before an attempt can finish
    out_sup = os.path.join(root, "sup")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "supervise.py"),
            "--max-restarts", "8", "--backoff", "0", "--",
            *_train_cmd(cfg_path, model_cfg_path, out_sup),
        ],
        env=_env(preempt_after=2), cwd=REPO,
        # the supervised run re-JITs every trainer relaunch; ~860 s on an
        # idle 8-core host, so 1200 flakes whenever the machine is loaded
        # (e.g. the rest of the slow tier running alongside) — give it the
        # same 2x headroom the other subprocess drills get
        capture_output=True, text=True, timeout=2400,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    relaunches = proc.stderr.count("relaunching with --resume_from_checkpoint")
    assert relaunches >= 2, proc.stderr[-4000:]

    with open(os.path.join(out_ref, "log", "results.json")) as f:
        ref = json.load(f)
    with open(os.path.join(out_sup, "log", "results.json")) as f:
        sup = json.load(f)
    np.testing.assert_allclose(
        np.asarray(sup["accuracy_matrix"]), np.asarray(ref["accuracy_matrix"]), atol=1e-6
    )

    from safetensors.numpy import load_file

    for task in ("taskA", "taskB"):
        a = load_file(os.path.join(out_ref, "ckpt", f"{task}_best.safetensors"))
        b = load_file(os.path.join(out_sup, "ckpt", f"{task}_best.safetensors"))
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"{task}:{k}")
