"""Training/eval metrics.

Parity surface: src/utils/metric.py get_action_accuracy (all action dims must
be within threshold for a step to count) and the L1 eval in train.py:548-597.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def action_accuracy(
    gt: jax.Array,  # [B, Horizon, Action_Dim]
    pred: jax.Array,
    thresholds: Sequence[float] = (0.1, 0.2),
) -> jax.Array:
    """[len(thresholds)] — fraction of (batch*horizon) steps where EVERY
    action dim is within the threshold."""
    diff = jnp.abs(gt - pred).reshape(-1, gt.shape[-1])
    accs = []
    for th in thresholds:
        per_step = jnp.mean((diff < th).astype(jnp.float32), axis=1) >= 1.0
        accs.append(jnp.mean(per_step.astype(jnp.float32)))
    return jnp.stack(accs)


def action_l1(gt: jax.Array, pred: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(gt - pred))
