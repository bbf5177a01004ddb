"""Restart supervisor: keep a preemptible training job running to completion.

Production TPU pods get SIGTERM on maintenance/reclaim; the trainer saves a
mid-epoch resume bundle and exits 143 (core/preempt.py). This wrapper is the
ops counterpart: it launches the training CLI, and whenever the job exits
with the preemption status it relaunches the SAME command with
`--resume_from_checkpoint <output_dir>/resume` appended — the trainer then
auto-skips tasks completed before the bundle and resumes the preempted task
at batch granularity (trainer/continual.py, trainer/runner.py fit; verified
bit-identical to uninterrupted runs in tests/test_preempt.py and the
2-process tests/test_multiprocess.py).

The reference has no equivalent — its runs die on SIGTERM and its PL resume
flag restarts at epoch granularity only (SURVEY.md §5 "failure detection").

Usage:
    python scripts/supervise.py [--max-restarts N] [--restart-status 143 ...]
        -- python -m mafed_tpu.train --config ... --output_dir OUT ...

Anything after `--` runs verbatim. The output_dir is parsed from the child
args to derive the resume-bundle path. Exits with the child's final status.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def _child_output_dir(child_args) -> str:
    for i, a in enumerate(child_args):
        if a == "--output_dir" and i + 1 < len(child_args):
            return child_args[i + 1]
        if a.startswith("--output_dir="):
            return a.split("=", 1)[1]
    raise SystemExit("supervise.py: child command must carry --output_dir")


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" not in argv:
        raise SystemExit("usage: supervise.py [opts] -- <training command ...>")
    split = argv.index("--")
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--max-restarts", type=int, default=100)
    parser.add_argument(
        "--restart-status", type=int, nargs="*", default=[143, -15, -9],
        help="child exit statuses that trigger a relaunch. 143 = cooperative "
        "preemption exit; -15/-9 = killed by raw SIGTERM/SIGKILL "
        "(subprocess reports signal deaths as negative statuses) — a child "
        "that died before reaching the cooperative exit still has a valid "
        "epoch-end resume bundle on disk, which is exactly the case this "
        "wrapper exists for",
    )
    parser.add_argument(
        "--backoff", type=float, default=5.0,
        help="seconds to wait before each relaunch",
    )
    opts = parser.parse_args(argv[:split])
    child = argv[split + 1 :]
    if not child:
        raise SystemExit("supervise.py: empty child command")
    resume_dir = os.path.join(_child_output_dir(child), "resume")

    attempt = 0
    while True:
        cmd = list(child)
        if attempt > 0 and "--resume_from_checkpoint" not in " ".join(child):
            cmd += ["--resume_from_checkpoint", resume_dir]
        print(
            f"supervise: attempt {attempt + 1}: {' '.join(cmd)}",
            file=sys.stderr, flush=True,
        )
        rc = subprocess.call(cmd)
        if rc not in opts.restart_status:
            print(f"supervise: child exited {rc}; done", file=sys.stderr, flush=True)
            return rc
        attempt += 1
        if attempt > opts.max_restarts:
            print(
                f"supervise: restart budget exhausted ({opts.max_restarts})",
                file=sys.stderr, flush=True,
            )
            return rc
        print(
            f"supervise: child preempted (status {rc}); relaunching with "
            f"--resume_from_checkpoint {resume_dir} in {opts.backoff:.0f}s",
            file=sys.stderr, flush=True,
        )
        time.sleep(opts.backoff)


if __name__ == "__main__":
    raise SystemExit(main())
