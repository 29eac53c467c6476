"""pjit train step: GSPMD sharding in place of DeepSpeed/NCCL.

The reference's distributed runtime (SURVEY.md §2.8) — DDP grad all-reduce,
ZeRO-1/2/3 optimizer sharding, grad accumulation with no_sync — collapses here
into sharding specs: params/optimizer state shard over 'fsdp' (ZeRO), batch
over ('data','fsdp'), optional 'tensor' for Megatron-style TP. XLA inserts the
collectives (reduce-scatter/all-gather over ICI). Grad accumulation is a
lax.scan over microbatches inside the same jit.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import mesh as mesh_lib


class TrainState:
    """Minimal functional train state (params, opt_state, step)."""

    def __init__(self, params, opt_state, step):
        self.params = params
        self.opt_state = opt_state
        self.step = step

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def make_train_step(
    loss_fn: Callable[..., jax.Array],
    tx: optax.GradientTransformation,
    *,
    accum_steps: int = 1,
    donate: bool = True,
):
    """loss_fn(params, batch, rng) -> scalar loss.

    Returns jitted step(state, batch, rng) -> (state, metrics). With
    accum_steps>1, batch's leading dim is [accum, micro_batch, ...] and
    gradients accumulate in a lax.scan before one optimizer update.
    """

    def grads_of(params, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        return loss, grads

    def step_fn(state: TrainState, batch, rng):
        if accum_steps == 1:
            loss, grads = grads_of(state.params, batch, rng)
        else:
            def body(carry, micro):
                acc, rng = carry
                rng, sub = jax.random.split(rng)
                loss, grads = grads_of(state.params, micro, sub)
                acc = jax.tree_util.tree_map(jnp.add, acc, grads)
                return (acc, rng), loss

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (grads, _), losses = jax.lax.scan(body, (zeros, rng), batch)
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
            loss = jnp.mean(losses)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return TrainState(new_params, new_opt, state.step + 1), {
            "loss": loss,
            "grad_norm": gnorm,
        }

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def shard_train_state(
    state: TrainState, mesh: Mesh, rules=None
) -> Tuple[TrainState, Any]:
    """Place params + opt state on the mesh per sharding rules (ZeRO-style)."""
    rules = rules if rules is not None else mesh_lib.default_param_rules()
    p_sh = mesh_lib.tree_shardings(state.params, mesh, rules)
    o_sh = mesh_lib.tree_shardings(state.opt_state, mesh, rules)
    s_sh = NamedSharding(mesh, P())
    params = jax.device_put(state.params, p_sh)
    opt_state = jax.device_put(state.opt_state, o_sh)
    step = jax.device_put(state.step, s_sh)
    return TrainState(params, opt_state, step), (p_sh, o_sh, s_sh)
