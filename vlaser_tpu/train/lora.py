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


def init_qlora_collection(
    rng: jax.Array,
    variables: Dict,
    target_patterns: Sequence[str] = LLM_TARGETS,
    r: int = 128,
    alpha: float = 256.0,
    dtype=jnp.float32,
) -> Dict:
    """QLoRA analogue (src/model/lora.py 4-bit variants): build a `lora`
    flax collection {module_path: {a, b, scale}} that Dense applies on the
    ACTIVATION path (y += s (x A) B), composing with the int8 base produced
    by core/quant.quantize_variables. Targets are matched against both
    fp kernels in 'params' and quantized kernels in 'quant' (kernel_q).

    Usage:
        qvars = quantize_variables(variables)
        qvars["lora"] = init_qlora_collection(rng, qvars, r=16)
        model.apply(qvars, ...)  # train grads w.r.t. qvars["lora"] only
    """
    from flax import traverse_util

    entries: Dict[tuple, Dict[str, jax.Array]] = {}
    sources = []
    if "params" in variables:
        sources.append(("kernel", traverse_util.flatten_dict(variables["params"])))
    if "quant" in variables:
        sources.append(("kernel_q", traverse_util.flatten_dict(variables["quant"])))

    leaves = []
    for leaf_name, flat in sources:
        for key, val in flat.items():
            if key[-1] != leaf_name:
                continue
            p = "/".join(str(k) for k in key[:-1] + ("kernel",))
            if not any(re.search(pat, p) for pat in target_patterns):
                continue
            leaves.append((key[:-1], val))

    keys = jax.random.split(rng, max(len(leaves), 1))
    scale = alpha / r  # folded into `a` (scalars can't ride a scanned axis)
    for i, (mod_path, val) in enumerate(leaves):
        shape = val.shape  # [in, out] or [L, in, out] (int8 or fp)
        assert len(shape) in (2, 3), mod_path
        if len(shape) == 2:
            din, dout = shape
            a = jax.random.normal(keys[i], (din, r), dtype) / r * scale
            b = jnp.zeros((r, dout), dtype)
        else:
            L, din, dout = shape
            a = jax.random.normal(keys[i], (L, din, r), dtype) / r * scale
            b = jnp.zeros((L, r, dout), dtype)
        entries[mod_path] = {"a": a, "b": b}

    from flax import traverse_util as tu

    flat_out = {}
    for mod_path, leafs in entries.items():
        for name, arr in leafs.items():
            flat_out[mod_path + (name,)] = arr
    return tu.unflatten_dict(flat_out)


def merge_qlora_into_quant(variables: Dict) -> Dict:
    """Export path: dequantize int8 kernels, add the low-rank deltas, and
    return plain fp params (inverse of the QLoRA setup, for HF export)."""
    from flax import traverse_util

    out = dict(variables)
    params = traverse_util.flatten_dict(out.get("params", {}))
    quant = traverse_util.flatten_dict(out.get("quant", {}))
    lora = traverse_util.flatten_dict(out.get("lora", {}))

    # dequantize kernels back into params
    for key in [k for k in quant if k[-1] == "kernel_q"]:
        mod = key[:-1]
        w = quant[key].astype(jnp.float32) * quant[mod + ("kernel_scale",)]
        params[mod + ("kernel",)] = w
    for key in [k for k in quant if k[-1] == "embedding_q"]:
        mod = key[:-1]
        params[mod + ("embedding",)] = (
            quant[key].astype(jnp.float32) * quant[mod + ("embedding_scale",)]
        )
    # fold lora deltas
    mods = {k[:-1] for k in lora if k[-1] == "a"}
    for mod in mods:
        a = lora[mod + ("a",)]
        b = lora[mod + ("b",)]
        delta = jnp.einsum("lir,lro->lio", a, b) if a.ndim == 3 else a @ b
        kkey = mod + ("kernel",)
        params[kkey] = params[kkey] + delta.astype(params[kkey].dtype)

    return {"params": traverse_util.unflatten_dict(params)}
