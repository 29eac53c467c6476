"""Fused denoise path (policy/fused_infer.py) vs PiZeroVLA.infer_action on
the same int8-quantized variables: same prefix, same Euler schedule, the
only difference is how each step's expert stack executes."""

import jax
import jax.numpy as jnp
import numpy as np

from vlaser_tpu.core.config import tiny_vla
from vlaser_tpu.core.quant import POLICY_PATTERNS, quantize_variables
from vlaser_tpu.policy.fused_infer import make_fused_infer_action
from vlaser_tpu.policy.pizero import PiZeroVLA


def _setup():
    cfg = tiny_vla(max_image_text_tokens=16)
    model = PiZeroVLA(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    B, S = 1, cfg.max_image_text_tokens
    img = cfg.vlm.vision.image_size
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 400, (B, S)).astype(np.int32)
    ids[:, 2] = cfg.vlm.img_context_token_id
    text_mask = np.ones((B, S), np.int32)
    text_mask[:, -3:] = 0  # padded prefix tail must be masked out
    args = (
        jnp.asarray(ids),
        jnp.asarray(rng.standard_normal((B, img, img, 3)).astype(np.float32)),
        jnp.asarray(text_mask),
        jnp.asarray(rng.standard_normal(
            (B, cfg.cond_steps, cfg.proprio_dim)).astype(np.float32)),
    )
    noise = jnp.asarray(rng.standard_normal(
        (B, cfg.num_action_tokens, cfg.action_dim)).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), *args,
        jnp.zeros((B, cfg.num_action_tokens, cfg.action_dim)),
        jnp.zeros((B,)),
        noise,
    )
    qvars = quantize_variables(variables, POLICY_PATTERNS)
    return cfg, model, qvars, args, noise


def test_fused_infer_matches_xla_infer_action():
    cfg, model, qvars, args, noise = _setup()
    want = model.apply(qvars, *args, noise, method=model.infer_action)
    fused = make_fused_infer_action(model, interpret=True)
    got = fused(qvars, *args, noise)
    assert got.shape == (1, cfg.horizon_steps, cfg.action_dim)
    # the XLA path computes in fp32, the kernel in bf16: integrate 10 Euler
    # steps and compare the final action chunk
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0.05, atol=0.05
    )


def test_fused_infer_respects_prefix_padding():
    """Padded prefix positions must not leak into the action attention:
    changing ids under text_mask=0 must not change the fused output."""
    cfg, model, qvars, args, noise = _setup()
    fused = make_fused_infer_action(model, interpret=True)
    a = fused(qvars, *args, noise)
    ids2 = np.asarray(args[0]).copy()
    ids2[:, -3:] = 123  # padded tail
    b = fused(qvars, jnp.asarray(ids2), *args[1:], noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_batched_infer_matches_xla_infer_action():
    """make_batched_infer_action (fused ViT + XLA prefix/denoise) at B=3
    must match infer_action."""
    from vlaser_tpu.policy.fused_infer import make_batched_infer_action

    cfg = tiny_vla(max_image_text_tokens=16)
    model = PiZeroVLA(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    B, S = 3, cfg.max_image_text_tokens
    img = cfg.vlm.vision.image_size
    rng = np.random.default_rng(7)
    ids = rng.integers(1, 400, (B, S)).astype(np.int32)
    ids[:, 2] = cfg.vlm.img_context_token_id
    args = (
        jnp.asarray(ids),
        jnp.asarray(rng.standard_normal((B, img, img, 3)).astype(np.float32)),
        jnp.ones((B, S), jnp.int32),
        jnp.asarray(rng.standard_normal(
            (B, cfg.cond_steps, cfg.proprio_dim)).astype(np.float32)),
    )
    noise = jnp.asarray(rng.standard_normal(
        (B, cfg.num_action_tokens, cfg.action_dim)).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), args[0][:1], args[1][:1], args[2][:1],
        args[3][:1],
        jnp.zeros((1, cfg.num_action_tokens, cfg.action_dim)),
        jnp.zeros((1,)), noise[:1],
    )
    qvars = quantize_variables(variables, POLICY_PATTERNS)
    want = model.apply(qvars, *args, noise, method=model.infer_action)
    fused = make_batched_infer_action(model, interpret=True)
    got = fused(qvars, *args, noise)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0.05, atol=0.05
    )


def test_fused_infer_w8a8_close_to_weight_only():
    """Round-4 serving quantization: POLICY_W8A8_PATTERNS + act flags put
    the ViT on the int8-MXU w8a8 kernel (pack_vit_stack auto-detect) and
    flag the joint prefix for large-row act quant. End-to-end actions must
    stay close to the weight-only path — w8a8 is an accuracy-bounded
    serving mode, not an exact transform."""
    from vlaser_tpu.core.quant import (POLICY_W8A8_ACT_PATTERNS,
                                       POLICY_W8A8_PATTERNS)

    cfg, model, _, args, noise = _setup()
    rng2 = np.random.default_rng(3)
    variables = model.init(
        jax.random.PRNGKey(0), *args,
        jnp.zeros((1, cfg.num_action_tokens, cfg.action_dim)),
        jnp.zeros((1,)), noise,
    )
    q_wo = quantize_variables(variables, POLICY_PATTERNS)
    # min_size=1: the tiny config's proj kernel is under the default
    # floor, and pack_vit_stack only goes w8a8 when ALL FOUR encoder
    # kernels are quantized
    q_w8 = quantize_variables(variables, POLICY_W8A8_PATTERNS,
                              act_quant_patterns=POLICY_W8A8_ACT_PATTERNS,
                              min_size=1)
    from vlaser_tpu.kernels.fused_vit import pack_vit_stack

    assert pack_vit_stack(q_w8).get("act_quant") is True
    want = model.apply(q_wo, *args, noise, method=model.infer_action)
    fused = make_fused_infer_action(model, interpret=True)
    got = fused(q_w8, *args, noise)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0.08, atol=0.08
    )
    # and the XLA path accepts the w8a8 tree too (Dense flag path)
    xla_w8 = model.apply(q_w8, *args, noise, method=model.infer_action)
    np.testing.assert_allclose(
        np.asarray(xla_w8), np.asarray(want), rtol=0.08, atol=0.08
    )
