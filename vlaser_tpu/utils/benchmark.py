"""Benchmark timing that is robust to the axon-tunnel TPU backend.

On this backend `block_until_ready` acknowledges before device completion and
host round-trip is ~40ms, so we (a) chain K dependent iterations of the
benched fn inside ONE jitted lax.scan — each iteration consumes the previous
output so XLA cannot elide or overlap them — and (b) force a host fetch of a
scalar, then subtract the measured round-trip.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def measure_rtt(n: int = 5) -> float:
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    np.asarray(f(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_scanned(
    step_fn: Callable,  # (carry, *args) -> carry; carry is a small pytree
    carry0,
    *args,  # large operands (params, ...) threaded as jit ARGUMENTS,
    # never closure constants
    iters: int = 20,
    repeats: int = 3,
) -> float:
    """Seconds per iteration of step_fn, RTT-corrected."""

    @jax.jit
    def run(carry, *a):
        def body(c, _):
            return step_fn(c, *a), None

        c, _ = jax.lax.scan(body, carry, None, length=iters)
        return jax.tree_util.tree_map(lambda x: jnp.sum(x), c)

    # warm up (compile)
    np.asarray(jax.tree_util.tree_leaves(run(carry0, *args))[0])
    rtt = measure_rtt()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(run(carry0, *args))[0])
        ts.append(time.perf_counter() - t0)
    total = float(np.median(ts)) - rtt
    return max(total, 1e-9) / iters
