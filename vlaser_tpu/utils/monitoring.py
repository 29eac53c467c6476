"""Timing / logging / profiling utilities.

Parity surface: src/utils/monitor.py (Timer, log_execution_time,
log_allocated_gpu_memory, MainRankFilter). TPU-native additions: jax.profiler
trace context and device memory stats — exceeding the reference's manual
timers (SURVEY.md §5 'cheap to exceed reference').
"""

from __future__ import annotations

import contextlib
import functools
import logging
import time
from typing import Optional

import jax

log = logging.getLogger("vlaser_tpu")


class Timer:
    def __init__(self):
        self._start = time.perf_counter()

    def __call__(self, reset: bool = True) -> float:
        now = time.perf_counter()
        dt = now - self._start
        if reset:
            self._start = now
        return dt


def log_execution_time(logger=None):
    """Decorator logging wall time of the wrapped call (monitor.py:15)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            (logger or log).info(
                "%s took %.3fs", fn.__name__, time.perf_counter() - t0
            )
            return out

        return wrapped

    return deco


def log_device_memory(tag: str = ""):
    """HBM usage of addressable devices (log_allocated_gpu_memory analogue)."""
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
            used = stats.get("bytes_in_use", 0) / 2**30
            limit = stats.get("bytes_limit", 0) / 2**30
            log.info("%s %s: %.2f/%.2f GiB HBM", tag, d, used, limit)
        except Exception:  # backend without memory_stats
            pass


class MainProcessFilter(logging.Filter):
    """Only log from process 0 (MainRankFilter analogue)."""

    def __init__(self, process_index: Optional[int] = None):
        super().__init__()
        self.process_index = (
            process_index if process_index is not None else jax.process_index()
        )

    def filter(self, record):
        return self.process_index == 0


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """jax.profiler trace (view in TensorBoard/XProf); no-op when logdir None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsWriter:
    """Append-only JSONL scalar log — the wandb/tensorboard role of the
    reference (train.py wandb, internvl3_2b...sh:68 --report_to tensorboard)
    without external services: one {"step": n, ...scalars} line per call,
    flushed immediately so crashes lose nothing. Main-process only under
    multi-host."""

    def __init__(self, path, process_index=None):
        import os

        if process_index is None:
            try:
                import jax

                process_index = jax.process_index()
            except Exception:
                process_index = 0
        self._fh = None
        if process_index == 0:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")

    def write(self, step: int, **scalars):
        if self._fh is None:
            return
        import json

        rec = {"step": int(step)}
        for k, v in scalars.items():
            rec[k] = float(v)
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None
