"""Tracing / profiling hooks.

The reference has none (SURVEY.md §5) beyond wall-clock valid/ex_per_s; the
TPU build exposes jax.profiler properly: capture a trace of a step window
for xprof/tensorboard, annotate named regions, and time steps with proper
device synchronization (block_until_ready — wall-clocking async dispatch
without it measures nothing).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

from mafed_tpu.core.logging import LOGGER


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into profile_dir (no-op when None)."""
    if not profile_dir:
        yield
        return
    LOGGER.info("capturing profiler trace -> %s", profile_dir)
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the trace viewer."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Throughput meter with correct async-dispatch handling."""

    def __init__(self) -> None:
        self._start: Optional[float] = None
        self._items = 0

    def start(self) -> None:
        self._start = time.perf_counter()
        self._items = 0

    def tick(self, n_items: int) -> None:
        self._items += n_items

    def stop(self, sync_on=None) -> float:
        """Returns items/sec; pass a device array to block on before timing."""
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        elapsed = time.perf_counter() - (self._start or time.perf_counter())
        return self._items / max(elapsed, 1e-9)
