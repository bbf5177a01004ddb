"""Multi-host SPMD hooks: process initialization + host-scalar reduction.

TPU-native replacement for the reference's torch.distributed surface
(mafed/utils/eval_utils.py:135-138 all_reduce, mafed/methods/replay.py:46-49
DistributedSampler, mafed/utils/save.py:35 rank-0 gating). Single-process
runs (including the 8-virtual-device CPU test mesh) are strict no-ops.
"""

from __future__ import annotations

import os
from typing import Tuple

from mafed_tpu.core.logging import LOGGER

_COORD_ENV_VARS = ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS")


def maybe_initialize_distributed(config=None) -> bool:
    """Call jax.distributed.initialize() when a multi-process run is
    requested — via config.distributed_init or coordinator env vars (TPU pod
    runtimes set these; jax autodetects the rest). Safe to call repeatedly
    and under single-process tests (returns False, touches nothing).
    """
    import jax

    want = bool(getattr(config, "distributed_init", False)) or any(
        os.environ.get(v) for v in _COORD_ENV_VARS
    )
    if not want:
        return False
    try:
        # already initialized -> initialize() raises; treat as success
        if jax._src.distributed.global_state.client is not None:  # noqa: SLF001
            return True
    except Exception:
        pass
    try:
        jax.distributed.initialize()
    except RuntimeError as exc:
        # initialize() must precede any backend use; if a driver already
        # touched jax.devices() the runtime refuses — surface a clear error
        # instead of the generic one (or tolerate double-init)
        if "already initialized" in str(exc).lower():
            return True
        raise RuntimeError(
            "jax.distributed.initialize() failed — it must run before any JAX "
            "computation. Construct ContinualLearningTrainer (or call "
            "maybe_initialize_distributed) before touching jax.devices()/jit."
        ) from exc
    LOGGER.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    # initialize()'s preemption notifier may have displaced the Python
    # SIGTERM flag handler; single-process runs need it back (see
    # preempt.reinstall_after_dist_init for the topology split)
    from mafed_tpu.core.preempt import reinstall_after_dist_init

    reinstall_after_dist_init()
    return True


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    return process_index() == 0


def process_reduce_sum(*values: float) -> Tuple[float, ...]:
    """Sum host-side scalars across all processes (the reference's NCCL
    all_reduce of metric states, eval_utils.py:135-138). Identity when
    single-process; multi-process uses a device all_gather so the reduction
    rides ICI/DCN, not the host network."""
    import jax

    if jax.process_count() == 1:
        return values
    import numpy as np
    from jax.experimental import multihost_utils

    arr = np.asarray(values, np.float64)
    gathered = multihost_utils.process_allgather(arr)  # [n_proc, n_vals]
    return tuple(float(x) for x in np.sum(gathered, axis=0))
