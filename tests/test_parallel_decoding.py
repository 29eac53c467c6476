"""RoboTwin parallel-decoding policy tests (tiny config)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import tiny_vlm
from vlaser_tpu.policy.parallel_decoding import (
    ParallelDecodingConfig,
    ParallelDecodingVLA,
    SequenceBuilder,
    UnitModel,
    discretize_state,
)

TOKENS = {
    "bos": 1, "eos": 2, "soi": 400, "eoi": 401, "sot": 402, "eot": 403,
    "left_arm_soa": 404, "left_arm_eoa": 405, "right_arm_soa": 406,
    "right_arm_eoa": 407, "left_arm_sost": 408, "left_arm_eost": 409,
    "right_arm_sost": 410, "right_arm_eost": 411, "img_context": 500,
}


@pytest.fixture(scope="module")
def pd():
    cfg = ParallelDecodingConfig(
        vlm=tiny_vlm(), action_chunk=4, action_dim=6, state_dim=6,
        state_vocab_size=16, max_text_tokens=8, head_hidden=32,
    )
    model = ParallelDecodingVLA(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    builder = SequenceBuilder(cfg, TOKENS, state_token_start=420, pad_token_id=0)
    rng = np.random.default_rng(0)
    B = 2
    text = rng.integers(10, 100, (B, 5))
    qpos = rng.uniform(-1, 1, (B, cfg.state_dim))
    ids, mask = builder.build(text, qpos)
    pixels = rng.standard_normal(
        (B, cfg.vlm.vision.image_size, cfg.vlm.vision.image_size, 3)
    ).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(pixels), jnp.asarray(mask)
    )
    return cfg, model, builder, params, ids, mask, pixels


def test_unitmodel_alias():
    assert UnitModel is ParallelDecodingVLA


def test_layout_and_builder(pd):
    cfg, model, builder, params, ids, mask, pixels = pd
    spans = cfg.layout()
    assert spans["total"][1] == ids.shape[1]
    # image section filled with IMG_CONTEXT; tiny vlm: 1 token per tile
    s, e = spans["image"]
    assert (ids[:, s:e] == 500).all()
    assert e - s == cfg.num_image_tokens
    # state tokens in range
    s, e = spans["left_state"]
    assert (ids[:, s:e] >= 420).all() and (ids[:, s:e] < 420 + 16).all()
    # text padding masked
    s, e = spans["text"]
    assert mask[:, s + 5 : e].sum() == 0


def test_discretize_state_bounds():
    q = np.array([[-1.0, 0.0, 1.0]])
    bins = discretize_state(q, vocab=16)
    assert bins[0, 0] == 0 and bins[0, 2] == 15
    assert 7 <= bins[0, 1] <= 8


def test_forward_and_loss(pd):
    cfg, model, builder, params, ids, mask, pixels = pd
    pred = model.apply(params, jnp.asarray(ids), jnp.asarray(pixels), jnp.asarray(mask))
    assert pred.shape == (2, cfg.action_chunk, cfg.action_dim)
    assert np.all(np.isfinite(pred))

    actions = jnp.zeros((2, cfg.action_chunk, cfg.action_dim))
    loss = model.apply(
        params, jnp.asarray(ids), jnp.asarray(pixels), jnp.asarray(mask), actions,
        method=model.loss,
    )
    assert np.isfinite(float(loss))
    grads = jax.grad(
        lambda p: model.apply(
            p, jnp.asarray(ids), jnp.asarray(pixels), jnp.asarray(mask), actions,
            method=model.loss,
        )
    )(params)
    g = grads["params"]["action_head"]["fc2"]["kernel"]
    assert float(jnp.abs(g).max()) > 0


def test_text_padding_inert(pd):
    """Junk in masked text positions must not change predictions."""
    cfg, model, builder, params, ids, mask, pixels = pd
    a = model.apply(params, jnp.asarray(ids), jnp.asarray(pixels), jnp.asarray(mask))
    ids2 = ids.copy()
    s, e = cfg.layout()["text"]
    ids2[:, s + 5 : e] = 77
    b = model.apply(params, jnp.asarray(ids2), jnp.asarray(pixels), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_slot_content_inert(pd):
    """Slot token ids are irrelevant (their embeddings are zeroed)."""
    cfg, model, builder, params, ids, mask, pixels = pd
    a = model.apply(params, jnp.asarray(ids), jnp.asarray(pixels), jnp.asarray(mask))
    ids2 = ids.copy()
    s, e = cfg.layout()["left_slots"]
    ids2[:, s:e] = 123
    b = model.apply(params, jnp.asarray(ids2), jnp.asarray(pixels), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
