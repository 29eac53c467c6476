"""Preemption-safe training: checkpoint-on-SIGTERM.

TPU pod VMs (and most cluster schedulers) deliver SIGTERM with a grace
window before eviction. The reference has no failure handling at all beyond
per-sample dataset retries (SURVEY.md §5: "Failure detection / elastic
recovery: none") — a preempted run loses everything since the last periodic
save. This guard turns the signal into a clean final checkpoint: the trainers
poll `should_stop()` once per step and, when set, write a last checkpoint and
return instead of dying mid-step.

Multi-host: the local flag is OR-reduced across processes (a tiny jitted
psum on one int32) so every host agrees to stop at the same step — a host
that checkpoints alone would deadlock the others' collectives.
"""

from __future__ import annotations

import logging
import signal
import threading

import jax
import numpy as np

logger = logging.getLogger(__name__)


class PreemptionGuard:
    """Context manager: installs handlers for `signals` that set a flag
    (chaining any previous handler) and restores them on exit. Safe to use
    from non-main threads — installation is skipped with a warning (signal
    handlers are main-thread-only in CPython) and `request_stop()` still
    works programmatically."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._prev = {}
        self._event = threading.Event()

    def __enter__(self):
        if threading.current_thread() is not threading.main_thread():
            logger.warning(
                "PreemptionGuard outside the main thread: signal handlers "
                "not installed (request_stop() remains available)"
            )
            return self
        for sig in self._signals:
            self._prev[sig] = signal.signal(sig, self._handle)
        return self

    def __exit__(self, *exc):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()
        return False

    def _handle(self, signum, frame):
        logger.warning("signal %s received: finishing step, then "
                       "checkpointing and exiting", signum)
        self._event.set()
        prev = self._prev.get(signum)
        if callable(prev) and prev not in (signal.SIG_IGN, signal.SIG_DFL):
            prev(signum, frame)

    def request_stop(self):
        """Programmatic preemption (tests, external watchdogs)."""
        self._event.set()

    @property
    def triggered(self) -> bool:
        return self._event.is_set()

    def should_stop(self) -> bool:
        """Global consensus: True on every process if ANY process was
        signalled. Single-process skips the collective entirely."""
        if jax.process_count() == 1:
            return self._event.is_set()
        from jax.experimental import multihost_utils

        flag = np.asarray(1 if self._event.is_set() else 0, np.int32)
        total = multihost_utils.process_allgather(flag)
        return bool(np.asarray(total).sum() > 0)
