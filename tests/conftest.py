"""Test environment: 8 virtual CPU devices so pjit/psum/mesh tests run
without TPU hardware (the JAX analog of a fake NCCL backend; SURVEY.md §4)."""

import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")  # no retry storms in tests

# Force CPU: the driver env pins JAX_PLATFORMS=axon (TPU tunnel) and the
# axon sitecustomize re-applies it via jax.config at registration, so both
# the env var AND jax.config must be overridden before first backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the slow e2e tests recompile the same
# tiny-config programs every run; caching them cuts the slow tier from
# minutes to seconds on re-runs. Keyed by HLO, so code changes invalidate
# naturally.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devices = jax.devices()
    assert len(devices) >= 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices
