"""Int8 weight-only quantization (core/quant.py): serving parity guards.

The quantized path must (a) run through every model entry unchanged (the
`quant` collection rides along in the variables dict), (b) stay numerically
close to the bf16/fp32 path — weight-only int8 with per-channel scales is
~0.8% relative weight error, which the oracle tolerances below bound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import tiny_vla, tiny_vlm
from vlaser_tpu.core.quant import (
    DEFAULT_PATTERNS,
    POLICY_PATTERNS,
    quantize_int8,
    quantize_variables,
)
from vlaser_tpu.models.vlm import InternVLChatModel
from vlaser_tpu.policy.pizero import PiZeroVLA


def _rand_params(model, init_args, seed=0):
    variables = model.init(jax.random.PRNGKey(seed), *init_args)
    key = jax.random.PRNGKey(seed + 1)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(key, len(leaves))
    leaves = [
        (jax.random.normal(k, l.shape, jnp.float32) * 0.05).astype(l.dtype)
        for k, l in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def test_quantize_int8_roundtrip():
    w = np.random.default_rng(0).standard_normal((64, 128)).astype(np.float32)
    q, s = quantize_int8(jnp.asarray(w), reduce_axis=-2)
    assert q.dtype == jnp.int8 and s.shape == (1, 128)
    w_hat = np.asarray(q, np.float32) * np.asarray(s)
    rel = np.abs(w_hat - w).max() / np.abs(w).max()
    assert rel < 0.01


def test_vla_infer_action_quant_close():
    cfg = tiny_vla(max_image_text_tokens=16)
    model = PiZeroVLA(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    B, S = 1, cfg.max_image_text_tokens
    img = cfg.vlm.vision.image_size
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 400, (B, S))
    ids[:, 2] = cfg.vlm.img_context_token_id
    args = (
        jnp.asarray(ids),
        jnp.asarray(rng.standard_normal((B, img, img, 3)).astype(np.float32)),
        jnp.ones((B, S), jnp.int32),
        jnp.zeros((B, cfg.cond_steps, cfg.proprio_dim), jnp.float32),
        jnp.asarray(rng.standard_normal(
            (B, cfg.num_action_tokens, cfg.action_dim)).astype(np.float32)),
    )
    variables = _rand_params(
        model,
        (args[0], args[1], args[2], args[3],
         jnp.zeros((B, cfg.num_action_tokens, cfg.action_dim)),
         jnp.zeros((B,)), args[4]),
    )
    ref = model.apply(variables, *args, method=model.infer_action)

    qvars = quantize_variables(variables, POLICY_PATTERNS)
    assert "quant" in qvars, "no kernels matched the policy quant patterns"
    # every joint-layer kernel must have moved out of params
    flat = jax.tree_util.tree_leaves_with_path(qvars["params"])
    joint_kernels = [
        p for p, _ in flat
        if "joint" in str(p) and str(p).endswith("kernel']")
    ]
    out = model.apply(qvars, *args, method=model.infer_action)
    assert out.shape == ref.shape
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale < 0.15, (err, scale)
    # and it must actually be a different (quantized) computation
    assert err > 0


def test_vlm_logits_quant_close():
    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    B, N = 1, 24
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 400, (B, N))
    ids[:, 1] = cfg.img_context_token_id
    img = cfg.vision.image_size
    args = (
        jnp.asarray(ids),
        jnp.asarray(rng.standard_normal((B, img, img, 3)).astype(np.float32)),
        jnp.ones((B,), jnp.int32),
    )
    variables = _rand_params(model, args, seed=3)
    ref = model.apply(variables, *args)[0]
    qvars = quantize_variables(variables, DEFAULT_PATTERNS)
    assert "quant" in qvars
    out = model.apply(qvars, *args)[0]
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale < 0.1, (err, scale)


def test_quant_skips_vit_and_small_leaves():
    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    B, N = 1, 8
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 400, (B, N))
    ids[:, 1] = cfg.img_context_token_id
    img = cfg.vision.image_size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids),
        jnp.asarray(rng.standard_normal((B, img, img, 3)).astype(np.float32)),
        jnp.ones((B,), jnp.int32),
    )
    qvars = quantize_variables(variables, DEFAULT_PATTERNS)
    from flax import traverse_util

    qflat = traverse_util.flatten_dict(qvars.get("quant", {}))
    for key in qflat:
        path = "/".join(key)
        assert "vision_model" not in path, path

def test_dense_act_quant_flag_and_row_threshold():
    """kernel_aq-flagged Dense runs w8a8 at >=128 rows (close to the
    weight-only dequant result, not exact) and stays EXACTLY on the
    weight-only path below the threshold (GEMV regime)."""
    import jax
    import jax.numpy as jnp
    from flax.core import freeze, unfreeze

    from vlaser_tpu.core.quant import quantize_variables
    from vlaser_tpu.models.layers import ACT_QUANT_MIN_ROWS, Dense

    dense = Dense(features=96, compute_dtype=jnp.float32)
    rng = np.random.default_rng(11)
    x_big = jnp.asarray(
        rng.standard_normal((ACT_QUANT_MIN_ROWS, 64)).astype(np.float32))
    x_small = x_big[: ACT_QUANT_MIN_ROWS // 2]
    variables = dense.init(jax.random.PRNGKey(0), x_big)
    # the generic pattern matches the bare "kernel" path
    qv_wo = quantize_variables(variables, (r"kernel$",))
    qv_aq = quantize_variables(variables, (r"kernel$",),
                               act_quant_patterns=(r"kernel$",))
    assert "kernel_aq" in qv_aq["quant"] and \
        "kernel_aq" not in qv_wo["quant"]

    big_wo = dense.apply(qv_wo, x_big)
    big_aq = dense.apply(qv_aq, x_big)
    # w8a8 differs from weight-only by the activation rounding only
    assert not np.allclose(np.asarray(big_wo), np.asarray(big_aq),
                           atol=1e-7), "w8a8 path did not run"
    np.testing.assert_allclose(np.asarray(big_aq), np.asarray(big_wo),
                               rtol=0.05, atol=0.05)

    small_wo = dense.apply(qv_wo, x_small)
    small_aq = dense.apply(qv_aq, x_small)
    np.testing.assert_allclose(np.asarray(small_aq), np.asarray(small_wo),
                               atol=0)  # identical: flag ignored for GEMVs
