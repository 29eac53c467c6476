"""Optimizers and schedules.

Replaces: bitsandbytes AdamW8bit (train.py:251 — plain optax.adamw here;
bf16/fp32 state at 2B scale, called out as a delta in SURVEY.md §2.9.4),
CosineAnnealingWarmupRestarts (src/utils/optim.py:31), HF cosine schedule with
warmup (VLM SFT), and parameter freezing via name filters (ViT frozen in the
Vlaser recipe: shell/.../internvl3_2b...sh:44 freeze_backbone).
"""

from __future__ import annotations

import math
import re
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def cosine_warmup_restarts(
    max_lr: float,
    first_cycle_steps: int,
    cycle_mult: float = 1.0,
    min_lr: float = 1e-8,
    warmup_steps: int = 0,
    gamma: float = 1.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Schedule matching src/utils/optim.py:31 CosineAnnealingWarmupRestarts:
    per-cycle linear warmup to max_lr*gamma^cycle then cosine to min_lr."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)

        if cycle_mult == 1.0:
            cycle = jnp.floor(step / first_cycle_steps)
            in_cycle = step - cycle * first_cycle_steps
            cycle_steps = jnp.asarray(first_cycle_steps, jnp.float32)
        else:
            # closed form for geometric cycle growth
            n = jnp.floor(
                jnp.log1p(step / first_cycle_steps * (cycle_mult - 1.0))
                / math.log(cycle_mult)
            )
            start = first_cycle_steps * (cycle_mult**n - 1.0) / (cycle_mult - 1.0)
            cycle = n
            in_cycle = step - start
            cycle_steps = first_cycle_steps * cycle_mult**cycle

        peak = max_lr * gamma**cycle
        warm = jnp.minimum(warmup_steps, cycle_steps - 1.0)
        lr_warm = min_lr + (peak - min_lr) * in_cycle / jnp.maximum(warm, 1.0)
        progress = (in_cycle - warm) / jnp.maximum(cycle_steps - warm, 1.0)
        lr_cos = min_lr + (peak - min_lr) * 0.5 * (1.0 + jnp.cos(math.pi * progress))
        return jnp.where(in_cycle < warm, lr_warm, lr_cos)

    return schedule


def warmup_cosine(
    max_lr: float, total_steps: int, warmup_ratio: float = 0.03, min_ratio: float = 0.0
):
    """HF Trainer-style cosine with warmup (VLM SFT recipe: lr 2e-5 cosine,
    warmup_ratio 0.03)."""
    warmup = max(1, int(total_steps * warmup_ratio))
    # decay span must be >= 1 (smoke runs with total_steps <= warmup)
    total = max(total_steps, warmup + 1)
    return optax.warmup_cosine_decay_schedule(
        0.0, max_lr, warmup, total, end_value=max_lr * min_ratio
    )


def _label_params(params, frozen_patterns: Sequence[str]):
    def one(path, _):
        p = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for pat in frozen_patterns:
            if re.search(pat, p):
                return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(one, params)


def make_optimizer(
    learning_rate,
    *,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    grad_clip: Optional[float] = 1.0,
    frozen_patterns: Sequence[str] = (),
    params: Any = None,
) -> optax.GradientTransformation:
    """AdamW + clip, with optional frozen-parameter masks (regex over paths)."""
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(
        optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    )
    tx = optax.chain(*chain)
    if frozen_patterns:
        assert params is not None, "need params to build freeze labels"
        labels = _label_params(params, frozen_patterns)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels
        )
    return tx


# Vlaser-2B SFT recipe: ViT frozen, LLM+mlp1 trained
# (internvl3_2b_dynamic_res_2nd_finetune_full.sh:44-46)
VIT_FROZEN = (r"^params/vision_model/",)
