"""Persistent XLA compilation cache for entry points.

First compile of the 410M train step costs minutes; the persistent cache
keys on HLO so re-runs of bench.py, the CL trainer, and scripts skip
compilation. Tests enable their own cache (tests/conftest.py).

Caveat (measured): the axon remote-compile tunnel does not serialize the
large TPU executables, so only small programs cache there — on standard
PJRT TPU/CPU backends the big train-step executables cache as expected.
"""

from __future__ import annotations

import os


def respect_platform_env() -> None:
    """Make an explicit JAX_PLATFORMS env var win over site defaults.

    Some deployment images ship a sitecustomize that pins the platform via
    `jax.config.update("jax_platforms", ...)` at interpreter start — which
    silently OVERRIDES the JAX_PLATFORMS environment variable a launcher
    set for a child process (env vars lose to explicit config). A
    supervisor or test harness that exports JAX_PLATFORMS=cpu for a
    subprocess must actually get CPU, not the site's accelerator: a child
    pinned to a single-chip remote backend can wedge indefinitely when the
    device is busy or a previous (killed) attempt's session is still being
    torn down. Call before first backend use; no-op when the env var is
    unset (the site default then stands).
    """
    import jax

    env = os.environ.get("JAX_PLATFORMS")
    if env:
        jax.config.update("jax_platforms", env)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotent; call before heavy jit use. Returns the cache dir."""
    import jax

    respect_platform_env()
    if cache_dir is None:
        cache_dir = os.environ.get(
            "MAFED_TPU_XLA_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "mafed_tpu_xla"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
