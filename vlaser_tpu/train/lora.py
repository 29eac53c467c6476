"""Functional LoRA: low-rank deltas over existing param trees.

Parity surface: modeling_internvl_chat.py wrap_backbone_lora/wrap_llm_lora
(:111-141; peft targets q/k/v/o + gate/up/down, r=128, alpha=2r) and
tools/merge_lora.py. Instead of wrapping modules (the torch/peft way), LoRA
lives as a flat {param_path: {a, b}} dict; the effective weights
W + (alpha/r) * A @ B are materialized inside jit right before the forward —
XLA fuses the rank-r update into the surrounding graph, base params stay
frozen via the optimizer mask, and merging for export is the same expression
run once.
"""

from __future__ import annotations

import re
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# peft target_modules for Qwen2 (modeling_internvl_chat.py:133-135)
LLM_TARGETS = (
    r"(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj)/kernel$",
)
# ViT targets (:114)
BACKBONE_TARGETS = (r"(qkv|attn/proj|fc1|fc2)/kernel$",)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def init_lora_params(
    rng: jax.Array,
    params,
    target_patterns: Sequence[str] = LLM_TARGETS,
    r: int = 128,
    dtype=jnp.float32,
) -> Dict[str, Dict[str, jax.Array]]:
    """-> {path: {'a','b'}} for every kernel matching the target patterns.

    Handles scanned [L, in, out] kernels (per-layer factors [L, in, r] /
    [L, r, out]). A ~ N(0, 1/r), B = 0 so the delta starts at zero.
    """
    lora: Dict[str, Dict[str, jax.Array]] = {}
    leaves = jax.tree_util.tree_leaves_with_path(params)
    keys = jax.random.split(rng, max(len(leaves), 1))
    for i, (path, leaf) in enumerate(leaves):
        p = _path_str(path)
        if not any(re.search(pat, p) for pat in target_patterns):
            continue
        shape = leaf.shape
        assert len(shape) in (2, 3), f"LoRA target must be a kernel: {p}"
        if len(shape) == 2:
            din, dout = shape
            a = jax.random.normal(keys[i], (din, r), dtype) / r
            b = jnp.zeros((r, dout), dtype)
        else:
            L, din, dout = shape
            a = jax.random.normal(keys[i], (L, din, r), dtype) / r
            b = jnp.zeros((L, r, dout), dtype)
        lora[p] = {"a": a, "b": b}
    return lora


def apply_lora(params, lora: Dict[str, Dict[str, jax.Array]], alpha: float, r: int):
    """Effective params = base + (alpha/r) * a @ b; call inside the jitted
    loss/forward so the update fuses."""
    scale = alpha / r

    def one(path, base):
        ab = lora.get(_path_str(path))
        if ab is None:
            return base
        a, b = ab["a"], ab["b"]
        if a.ndim == 2:
            delta = a @ b
        else:
            delta = jnp.einsum("lir,lro->lio", a, b)
        return base + (scale * delta).astype(base.dtype)

    return jax.tree_util.tree_map_with_path(one, params)


def merge_lora(params, lora, alpha: float, r: int):
    """One-shot merge for export (tools/merge_lora.py parity)."""
    return jax.jit(lambda p, l: apply_lora(p, l, alpha, r))(params, lora)


def count_lora_params(lora) -> int:
    return sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(lora)
    )
