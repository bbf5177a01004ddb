"""JAX_PLATFORMS env must win over site-pinned platform config.

Regression for the chaos-drill hang class: a deployment sitecustomize that
pins the platform via `jax.config.update("jax_platforms", ...)` at
interpreter start silently overrides the JAX_PLATFORMS environment variable
a launcher exported for a child process — so children a harness directed to
CPU were riding the site's (single-chip, remote) accelerator and could
wedge when a previously-killed attempt's device session was still tearing
down. `core/cache.respect_platform_env()` (called by every CLI entry via
`enable_compilation_cache`) re-applies an explicit env value before first
backend use.

The test simulates the sitecustomize in a FRESH subprocess: pin the config
to a nonexistent platform (which would make backend init fail loudly — the
observable stand-in for "the wrong backend"), export JAX_PLATFORMS=cpu,
and assert the entry-point preamble restores CPU.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import jax
# stand-in for a site customization pinning the platform at startup
jax.config.update("jax_platforms", "no_such_platform")

from mafed_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()  # must re-apply the JAX_PLATFORMS env var
print("devices:", jax.devices()[0].platform)
"""


def _env(platforms):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    if platforms is None:
        env.pop("JAX_PLATFORMS", None)
    else:
        env["JAX_PLATFORMS"] = platforms
    return env


def test_env_var_overrides_pinned_config():
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD], env=_env("cpu"),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "devices: cpu" in proc.stdout


def test_unset_env_keeps_site_default():
    # without the env var the (bogus) site pin must stand — the preamble is
    # a no-op, so backend init fails on the nonexistent platform rather
    # than silently switching
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD], env=_env(None),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode != 0
    assert "no_such_platform" in (proc.stderr + proc.stdout).lower()
