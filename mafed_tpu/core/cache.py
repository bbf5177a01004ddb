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


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotent; call before heavy jit use. Returns the cache dir."""
    import jax

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
