"""Fused ViT stack kernel (kernels/fused_vit.py) vs the flax
InternVisionModel on the same weights (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from vlaser_tpu.core.config import VisionConfig
from vlaser_tpu.kernels.fused_vit import fused_vit_stack, pack_vit_stack
from vlaser_tpu.models.internvit import InternVisionModel


def _tiny_vision():
    return VisionConfig(
        hidden_size=128, intermediate_size=256, num_layers=3, num_heads=2,
        image_size=32, patch_size=8, qkv_bias=True, qk_normalization=True,
        norm_type="layer_norm",
    )


def test_fused_vit_stack_matches_flax():
    cfg = _tiny_vision()
    model = InternVisionModel(cfg, param_dtype=jnp.bfloat16,
                              compute_dtype=jnp.bfloat16,
                              attn_impl="reference")
    rng = np.random.default_rng(0)
    px = jnp.asarray(
        rng.standard_normal((1, cfg.image_size, cfg.image_size, 3))
        .astype(np.float32)
    )
    variables = jax.tree_util.tree_map(
        lambda s: (jax.random.normal(jax.random.PRNGKey(1), s.shape,
                                     jnp.float32) * 0.05).astype(s.dtype),
        jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), px)),
    )
    want = model.apply(variables, px)  # [1, S, H]

    emb = model.apply(variables, px, method=model.embed)  # [1, S, H]
    stack = pack_vit_stack(variables)
    got = fused_vit_stack(
        emb[0].astype(jnp.bfloat16), **stack,
        num_heads=cfg.num_heads, eps=cfg.layer_norm_eps, qk_norm=cfg.qk_normalization, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want[0], np.float32),
        rtol=0.05, atol=0.05,
    )


def test_fused_vit_stack_no_qk_norm():
    """300M flavor: qk_normalization=False (no q_norm/k_norm params)."""
    cfg = _tiny_vision().replace(qk_normalization=False) \
        if hasattr(_tiny_vision(), "replace") else None
    from dataclasses import replace

    cfg = replace(_tiny_vision(), qk_normalization=False)
    model = InternVisionModel(cfg, param_dtype=jnp.bfloat16,
                              compute_dtype=jnp.bfloat16,
                              attn_impl="reference")
    rng = np.random.default_rng(1)
    px = jnp.asarray(
        rng.standard_normal((1, cfg.image_size, cfg.image_size, 3))
        .astype(np.float32)
    )
    variables = jax.tree_util.tree_map(
        lambda s: (jax.random.normal(jax.random.PRNGKey(2), s.shape,
                                     jnp.float32) * 0.05).astype(s.dtype),
        jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), px)),
    )
    want = model.apply(variables, px)
    emb = model.apply(variables, px, method=model.embed)
    got = fused_vit_stack(
        emb[0].astype(jnp.bfloat16), **pack_vit_stack(variables),
        num_heads=cfg.num_heads, eps=cfg.layer_norm_eps,
        qk_norm=False, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want[0], np.float32),
        rtol=0.05, atol=0.05,
    )


def test_fused_vit_stack_batched():
    """B=3 batched rows with sublane padding + key masking must match the
    flax encoder per sample."""
    cfg = _tiny_vision()
    model = InternVisionModel(cfg, param_dtype=jnp.bfloat16,
                              compute_dtype=jnp.bfloat16,
                              attn_impl="reference")
    rng = np.random.default_rng(3)
    px = jnp.asarray(
        rng.standard_normal((3, cfg.image_size, cfg.image_size, 3))
        .astype(np.float32)
    )
    variables = jax.tree_util.tree_map(
        lambda s: (jax.random.normal(jax.random.PRNGKey(4), s.shape,
                                     jnp.float32) * 0.05).astype(s.dtype),
        jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), px[:1])),
    )
    want = model.apply(variables, px)  # [3, S, H]
    emb = model.apply(variables, px, method=model.embed)
    got = fused_vit_stack(
        emb.astype(jnp.bfloat16), **pack_vit_stack(variables),
        num_heads=cfg.num_heads, eps=cfg.layer_norm_eps,
        qk_norm=cfg.qk_normalization, interpret=True,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05,
    )

def test_fused_vit_stack_w8a8():
    """w8a8 mode: encoder kernels quantized into the quant collection
    (core/quant VIT_W8A8_PATTERNS); pack_vit_stack flips the kernel to
    act_quant automatically. Both sides consume the SAME int8 weights
    (the flax encoder dequantizes them inline), so the diff isolates the
    in-kernel per-token activation quantization — bounded, not exact."""
    from vlaser_tpu.core.quant import VIT_W8A8_PATTERNS, quantize_variables

    cfg = _tiny_vision()
    model = InternVisionModel(cfg, param_dtype=jnp.bfloat16,
                              compute_dtype=jnp.bfloat16,
                              attn_impl="reference")
    rng = np.random.default_rng(5)
    px = jnp.asarray(
        rng.standard_normal((2, cfg.image_size, cfg.image_size, 3))
        .astype(np.float32)
    )
    variables = jax.tree_util.tree_map(
        lambda s: (jax.random.normal(jax.random.PRNGKey(6), s.shape,
                                     jnp.float32) * 0.05).astype(s.dtype),
        jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), px[:1])),
    )
    qvars = quantize_variables(variables, VIT_W8A8_PATTERNS)
    assert "quant" in qvars, "encoder kernels did not match the patterns"
    want = model.apply(qvars, px)  # weight-only int8, bf16 compute

    emb = model.apply(qvars, px, method=model.embed)
    stack = pack_vit_stack(qvars)
    assert stack.get("act_quant") is True
    assert stack["qkvw"].dtype == jnp.int8
    got = fused_vit_stack(
        emb.astype(jnp.bfloat16), **stack,
        num_heads=cfg.num_heads, eps=cfg.layer_norm_eps,
        qk_norm=cfg.qk_normalization, interpret=True,
    )
    # activation-quant error budget: per-token symmetric int8 on
    # well-conditioned activations is ~1% per matmul; the residual
    # stream keeps full precision so depth does not compound it
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.12, atol=0.12,
    )
    # unquantized packing still takes the bf16 path
    stack_bf = pack_vit_stack(variables)
    assert "act_quant" not in stack_bf


def test_fused_vit_stack_attn_qk_int8():
    """attn_qk_int8 (round-4 VERDICT #7 attempt): int8 MXU QK^T with
    per-row q / per-head k scales. Scores quantize but the softmax
    weights stay bf16 and the residual stream full-precision, so the
    output must stay close to the bf16-attention kernel; pad-row
    correction must survive (B=3 exercises sublane padding)."""
    cfg = _tiny_vision()
    model = InternVisionModel(cfg, param_dtype=jnp.bfloat16,
                              compute_dtype=jnp.bfloat16,
                              attn_impl="reference")
    rng = np.random.default_rng(7)
    px = jnp.asarray(
        rng.standard_normal((3, cfg.image_size, cfg.image_size, 3))
        .astype(np.float32)
    )
    variables = jax.tree_util.tree_map(
        lambda s: (jax.random.normal(jax.random.PRNGKey(8), s.shape,
                                     jnp.float32) * 0.05).astype(s.dtype),
        jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), px[:1])),
    )
    want = model.apply(variables, px)
    emb = model.apply(variables, px, method=model.embed)
    got = fused_vit_stack(
        emb.astype(jnp.bfloat16), **pack_vit_stack(variables),
        num_heads=cfg.num_heads, eps=cfg.layer_norm_eps,
        qk_norm=cfg.qk_normalization, attn_qk_int8=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.12, atol=0.12,
    )
