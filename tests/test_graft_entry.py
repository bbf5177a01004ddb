"""Driver entry-point regression tests.

Round-1 failure mode (MULTICHIP_r01.json): the driver imports jax and touches
devices BEFORE calling dryrun_multichip, pinning a 1-device backend — the dry
run must then re-exec itself in a subprocess with a scrubbed environment
rather than raise. Reproduces VERDICT.md round-1 item #1.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_with_preinitialized_small_backend():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # simulate the driver: backend already initialized with ONE device
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import jax; assert len(jax.devices()) == 1; "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-4000:]}"
    assert "dryrun_multichip ok on 8 devices" in proc.stdout


def test_entry_compiles_tiny():
    # entry() itself targets the 410M flagship (driver compile-checks it on
    # TPU); here just assert the module imports and exposes the contract
    import __graft_entry__ as g

    assert callable(g.entry)
    assert callable(g.dryrun_multichip)
