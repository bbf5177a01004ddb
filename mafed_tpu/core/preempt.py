"""Cooperative preemption: clean exit + exact resume at update granularity.

Production TPU pods are preemptible — maintenance events and spot
reclamation deliver SIGTERM with a short grace window. The reference stack
simply dies (no signal handling anywhere; its PL resume flag restarts at
epoch granularity from the last on-disk checkpoint). Here the signal sets a
flag; the task runner checks it at every optimizer-update boundary, saves a
mid-epoch resume bundle (params + optimizer state + `batches_done`, see
trainer/runner.py fit), and raises `Preempted` — exiting with the
conventional 128+SIGTERM=143 so supervisors restart the job, which then
resumes exactly where it stopped (the loader skips the consumed batches of
the seeded epoch order).

Multi-process pods: the save is a collective, so every process must agree
on WHICH update boundary to stop at even though only some hosts may have
received the signal. `jax.experimental.multihost_utils.
reached_preemption_sync_point` (backed by the coordination service set up
by `jax.distributed.initialize`) provides exactly that agreement; single
process runs use the local flag directly.
"""

from __future__ import annotations

import logging
import signal
import threading
from typing import Optional

import jax

LOGGER = logging.getLogger("mafed_tpu")

_FLAG = threading.Event()
_INSTALLED = False
_PREV_HANDLERS: dict = {}
_TEST_COUNTDOWN: Optional[int] = None
_WARNED_NO_SYNC = False
_lock = threading.Lock()


class Preempted(SystemExit):
    """Raised at a clean update boundary after a preemption request.

    Subclasses SystemExit with code 143 (128+SIGTERM) so an uncaught
    preemption terminates the process with the conventional status and no
    traceback; callers that want to log first can still catch it.
    """

    def __init__(self, message: str = "preempted") -> None:
        super().__init__(143)
        self.message = message


def _handler(signum, frame):
    _FLAG.set()
    LOGGER.warning(
        "received signal %d: will save a resume bundle and exit at the next "
        "update boundary", signum,
    )
    prev = _PREV_HANDLERS.get(signum)
    if callable(prev):
        prev(signum, frame)


def install_handlers(signals=(signal.SIGTERM,)) -> None:
    """Install the preemption flag handler (chains any previous handler).

    Main-thread only (signal module restriction); the CLI entry points call
    this once before training starts.
    """
    global _INSTALLED
    for s in signals:
        prev = signal.signal(s, _handler)
        if prev not in (None, _handler):
            _PREV_HANDLERS[s] = prev
    _INSTALLED = True


def reinstall_after_dist_init() -> None:
    """Re-arm the flag handler after jax.distributed.initialize().

    jaxlib's preemption notifier registers its own OS-level SIGTERM handler
    during initialize(), displacing a Python handler installed earlier. The
    two mechanisms split by topology: multi-process runs agree on a stop
    boundary through jax's notifier (sync_preemption_requested ->
    reached_preemption_sync_point), so its handler must stay; single-process
    runs (including a 1-process pod slice that still has a coordinator)
    consult ONLY the local Python flag, so the flag handler must win there.
    No-op unless install_handlers already ran (library users who never opted
    into cooperative preemption keep whatever handler they have).
    """
    import jax

    if not _INSTALLED or jax.process_count() > 1:
        return
    if threading.current_thread() is not threading.main_thread():
        return  # signal.signal is main-thread-only
    if signal.getsignal(signal.SIGTERM) is not _handler:
        install_handlers()


def preemption_requested() -> bool:
    """True once a preemption signal (or a test request) has arrived."""
    global _TEST_COUNTDOWN
    if _FLAG.is_set():
        return True
    with _lock:
        return _TEST_COUNTDOWN is not None and _TEST_COUNTDOWN <= 0


def sync_preemption_requested(step_id: int) -> bool:
    """Globally-agreed preemption check at an update boundary.

    Single process: the local flag. Multi-process: all processes reach
    agreement through the coordination service — returns True on EVERY
    process at the same step_id if ANY process saw the signal. The
    deterministic countdown (request_preemption_after) is globally
    consistent by construction — every process arms the same count and
    ticks the same update boundaries — so it short-circuits the sync
    service (which only tracks real signals).
    """
    if jax.process_count() == 1:
        return preemption_requested()
    with _lock:
        if _TEST_COUNTDOWN is not None and _TEST_COUNTDOWN <= 0:
            return True
    from jax.experimental import multihost_utils

    try:
        return bool(multihost_utils.reached_preemption_sync_point(step_id))
    except RuntimeError:
        # preemption sync manager unavailable (jax_enable_preemption_service
        # off): a LOCAL flag must not trigger the collective bundle save on
        # one host only — disable cooperative exit rather than deadlock
        global _WARNED_NO_SYNC
        if not _WARNED_NO_SYNC:
            _WARNED_NO_SYNC = True
            LOGGER.warning(
                "multi-process preemption sync unavailable; cooperative "
                "preemption exit disabled (enable jax_enable_preemption_service)"
            )
        return False


def tick_update() -> None:
    """Called by the runner once per applied optimizer update; drives the
    deterministic test hook (request_preemption_after)."""
    global _TEST_COUNTDOWN
    with _lock:
        if _TEST_COUNTDOWN is not None and _TEST_COUNTDOWN > 0:
            _TEST_COUNTDOWN -= 1


def request_preemption() -> None:
    """Programmatic equivalent of receiving SIGTERM (ops/test use)."""
    _FLAG.set()


def request_preemption_after(n_updates: int) -> None:
    """Arrange for preemption_requested() to flip after n more applied
    updates — a deterministic stand-in for a signal arriving mid-epoch
    (used by the preemption-equivalence tests and chaos drills)."""
    global _TEST_COUNTDOWN
    with _lock:
        _TEST_COUNTDOWN = int(n_updates)


def clear() -> None:
    """Reset all preemption state (tests)."""
    global _TEST_COUNTDOWN
    _FLAG.clear()
    with _lock:
        _TEST_COUNTDOWN = None
