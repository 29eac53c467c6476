"""Sparse Mixture-of-Experts MLP (Qwen3-MoE semantics) + expert parallelism.

The reference is dense-only (Vlaser-2B/8B on InternVL3; SURVEY §2.8: "no
MoE", EP scoped out). InternVL3.5 — whose Qwen3 dense backbone this repo
already serves — ships MoE tiers (e.g. 30B-A3B on Qwen3-MoE); this module
covers them the TPU way:

- Router parity with HF `Qwen3MoeSparseMoeBlock` (transformers
  modeling_qwen3_moe.py): fp32 softmax over router logits, top-k of the
  *probabilities*, optional renormalization (`norm_topk_prob`), combine in
  activation dtype. Golden-tested against the HF module in
  tests/test_moe.py.
- Dispatch is scatter/gather, not the MeshTF [T,E,C] one-hot einsum: each
  (token, slot) writes its activation into an [E, C, H] buffer at its
  within-expert position (cumsum priority, token-major — earlier tokens
  win capacity), experts run as one vmapped gate/up/down batch on the MXU,
  and tokens gather their k results back. O(T·k·H) extra memory instead of
  O(T·E·C).
- Capacity: `moe_capacity_factor=None` is lossless (C = T, HF parity);
  training at scale sets ~1.0-1.25 and overflow tokens drop (combine
  weight 0 — the standard GShard/Switch behavior).
- Expert parallelism falls out of GSPMD: expert params carry a leading
  [E] dim sharded over the tensor axis (core/mesh.py rules), the [E,C,H]
  buffers follow, and XLA inserts the all_to_all. Sharded == single-device
  tested on the virtual mesh.
- Aux load-balancing loss (HF `load_balancing_loss_func` semantics:
  E · Σ_e f_e·P_e over the top-k dispatch fractions) is sown into the
  'intermediates' collection as 'router_aux' per layer.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import LLMConfig


def router_aux_loss(router_f: jax.Array, router_p: jax.Array):
    """HF load_balancing_loss_func semantics over the sown per-layer
    vectors: router_f/router_p [L, E] (or [E]) -> scalar
    E * sum_e mean_L(f) * mean_L(p). HF concatenates all layers' logits
    before averaging, which equals this layer-mean combination."""
    f = jnp.mean(jnp.atleast_2d(router_f), axis=0)
    p = jnp.mean(jnp.atleast_2d(router_p), axis=0)
    return f.shape[-1] * jnp.sum(f * p)


class MoEMLP(nn.Module):
    cfg: LLMConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, S, H]
        cfg = self.cfg
        E, k = cfg.num_experts, cfg.num_experts_per_tok
        H = cfg.hidden_size
        F = cfg.moe_intermediate_size or cfg.intermediate_size
        b, s, _ = x.shape
        T = b * s
        xt = x.reshape(T, H)

        gate = self.param(
            "gate", nn.initializers.normal(0.02), (H, E), self.param_dtype
        )
        wg = self.param(
            "experts_gate_proj", nn.initializers.normal(0.02), (E, H, F),
            self.param_dtype,
        )
        wu = self.param(
            "experts_up_proj", nn.initializers.normal(0.02), (E, H, F),
            self.param_dtype,
        )
        wd = self.param(
            "experts_down_proj", nn.initializers.normal(0.02), (E, F, H),
            self.param_dtype,
        )

        # --- routing (fp32, HF semantics: top-k of the softmax probs) ---
        logits = xt.astype(jnp.float32) @ gate.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        topw, topi = jax.lax.top_k(probs, k)  # [T, k]
        if cfg.norm_topk_prob:
            topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
        # aux-loss ingredients (HF load_balancing_loss_func): f_e = mean
        # over tokens of the top-k one-hot counts (summed over slots,
        # NOT divided by k), P_e = mean softmax prob. Combine across
        # layers with router_aux_loss.
        oh_f = jax.nn.one_hot(topi, E, dtype=jnp.float32)  # [T, k, E]
        self.sow("intermediates", "router_f",
                 jnp.mean(jnp.sum(oh_f, axis=1), axis=0))
        self.sow("intermediates", "router_p", jnp.mean(probs, axis=0))

        # --- capacity + within-expert positions (token-major priority) ---
        if cfg.moe_capacity_factor is None:
            C = T  # lossless: an expert can at most receive every token
        else:
            C = max(k, int(cfg.moe_capacity_factor * T * k / E))
            C = min(C, T)
        flat_e = topi.reshape(T * k)  # slot order (t0 s0), (t0 s1), (t1 s0)…
        oh = jax.nn.one_hot(flat_e, E, dtype=jnp.int32)  # [T*k, E]
        pos = jnp.cumsum(oh, axis=0) - oh  # prior count for own expert
        pos = jnp.sum(pos * oh, axis=-1)  # [T*k] position within expert
        keep = pos < C

        # --- dispatch: scatter tokens into [E, C, H] expert buffers ---
        xk = jnp.repeat(xt.astype(self.compute_dtype), k, axis=0)  # [T*k, H]
        xk = xk * keep[:, None].astype(xk.dtype)
        safe_pos = jnp.where(keep, pos, C - 1)
        buf = jnp.zeros((E, C, H), self.compute_dtype)
        buf = buf.at[flat_e, safe_pos].add(xk)

        # --- expert MLPs: one vmapped gate/up/down batch ---
        def one(xe, g, u, d):
            gt = xe @ g.astype(self.compute_dtype)
            up = xe @ u.astype(self.compute_dtype)
            return (nn.silu(gt) * up) @ d.astype(self.compute_dtype)

        ye = jax.vmap(one)(buf, wg, wu, wd)  # [E, C, H]

        # --- combine: gather each slot's result, weight, sum over k ---
        yk = ye[flat_e, safe_pos]  # [T*k, H]
        w = (topw.reshape(T * k) * keep.astype(jnp.float32))
        y = jnp.sum(
            (yk.astype(jnp.float32) * w[:, None]).reshape(T, k, H), axis=1
        )
        return y.astype(x.dtype).reshape(b, s, H)
