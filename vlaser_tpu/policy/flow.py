"""Flow-matching utilities: time sampling + batch loss closure.

Parity surface: train.py:335-343 (beta(1.5,1) flow-time sampling
t = t_max * (1 - z), the pi0 recipe) and uniform-stratified sampling;
pizero_internvl.py:1050-1062 (psi_t) lives in PiZeroVLA.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def sample_fm_time(
    rng: jax.Array,
    bsz: int,
    sampling: str = "beta",
    alpha: float = 1.5,
    beta: float = 1.0,
    t_max: float = 1.0 - 1e-3,
) -> jax.Array:
    if sampling == "uniform":
        eps = 1e-5
        u = jax.random.uniform(rng, ())
        return (u + jnp.arange(bsz) / bsz) % (1 - eps)
    z = jax.random.beta(rng, alpha, beta, (bsz,))
    return t_max * (1.0 - z)


def make_flow_loss(model, sampling: str = "beta"):
    """loss_fn(params, batch, rng) for make_train_step. batch keys:
    input_ids, pixel_values, text_mask, proprios, actions."""
    cfg = model.cfg

    def loss_fn(params, batch: Dict, rng):
        b = batch["input_ids"].shape[0]
        rt, rn = jax.random.split(rng)
        t = sample_fm_time(
            rt, b, sampling, cfg.flow_alpha, cfg.flow_beta, cfg.flow_t_max
        )
        x0 = jax.random.normal(
            rn, (b, cfg.num_action_tokens, cfg.action_dim), jnp.float32
        )
        return model.apply(
            params,
            batch["input_ids"],
            batch["pixel_values"],
            batch["text_mask"],
            batch["proprios"],
            batch["actions"],
            t,
            x0,
        )

    return loss_fn
