"""Golden-value tests: our flax Qwen2 vs HuggingFace transformers (CPU torch),
plus cached-vs-uncached decode parity (the reference's own oracle style —
pizero_internvl.py:938-1003 / eval.py:131-137)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import tiny_llm
from vlaser_tpu.inference.kv_cache import KVCache
from vlaser_tpu.models.qwen2 import Qwen2ForCausalLM
from vlaser_tpu.utils.hf_convert import convert_qwen2


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import Qwen2Config
    from transformers.models.qwen2.modeling_qwen2 import Qwen2ForCausalLM as HFQwen2

    torch.manual_seed(0)
    cfg = tiny_llm()
    hf_cfg = Qwen2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=False,
        attention_dropout=0.0,
    )
    hf = HFQwen2(hf_cfg).eval().to(torch.float32)
    params = {"params": convert_qwen2(hf.state_dict(), cfg.num_layers)}
    model = Qwen2ForCausalLM(cfg, compute_dtype=jnp.float32)
    return hf, model, params, cfg


def test_logits_match_hf(hf_pair):
    import torch

    hf, model, params, cfg = hf_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 11))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    got, _, _ = model.apply(params, input_ids=jnp.asarray(ids), attn_impl="reference")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_padding_invariance(hf_pair):
    """Left-content + right-padding via segment ids must not change logits."""
    _, model, params, cfg = hf_pair
    rng = np.random.default_rng(1)
    ids = rng.integers(1, cfg.vocab_size, (1, 8))
    got_plain, _, _ = model.apply(
        params, input_ids=jnp.asarray(ids), attn_impl="reference"
    )
    padded = np.concatenate([ids, np.zeros((1, 4), np.int64)], axis=1)
    seg = np.concatenate([np.ones((1, 8)), np.zeros((1, 4))], axis=1).astype(np.int32)
    got_padded, _, _ = model.apply(
        params,
        input_ids=jnp.asarray(padded),
        seg_ids=jnp.asarray(seg),
        attn_impl="reference",
    )
    np.testing.assert_allclose(
        np.asarray(got_padded)[:, :8], np.asarray(got_plain), rtol=2e-4, atol=2e-4
    )


def test_packing_matches_separate(hf_pair):
    """Two sequences packed with segment ids == the two run separately."""
    _, model, params, cfg = hf_pair
    rng = np.random.default_rng(2)
    a = rng.integers(1, cfg.vocab_size, (1, 5))
    b = rng.integers(1, cfg.vocab_size, (1, 7))
    la, _, _ = model.apply(params, input_ids=jnp.asarray(a), attn_impl="reference")
    lb, _, _ = model.apply(params, input_ids=jnp.asarray(b), attn_impl="reference")
    packed = np.concatenate([a, b], axis=1)
    seg = np.array([[1] * 5 + [2] * 7], np.int32)
    pos = np.array([list(range(5)) + list(range(7))], np.int32)
    lp, _, _ = model.apply(
        params,
        input_ids=jnp.asarray(packed),
        positions=jnp.asarray(pos),
        seg_ids=jnp.asarray(seg),
        attn_impl="reference",
    )
    lp = np.asarray(lp)
    np.testing.assert_allclose(lp[:, :5], np.asarray(la), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(lp[:, 5:], np.asarray(lb), rtol=2e-4, atol=2e-4)


def test_cached_decode_matches_full(hf_pair):
    """Prefill+cached-decode logits == full uncached forward (fp32 exact-ish)."""
    _, model, params, cfg = hf_pair
    rng = np.random.default_rng(3)
    ids = rng.integers(1, cfg.vocab_size, (2, 10))
    full, _, _ = model.apply(params, input_ids=jnp.asarray(ids), attn_impl="reference")

    cache = KVCache.create(cfg.num_layers, 2, 16, cfg.num_kv_heads, cfg.head_dim,
                           dtype=jnp.float32)
    pre, _, cache = model.apply(
        params, input_ids=jnp.asarray(ids[:, :6]), cache=cache, attn_impl="reference"
    )
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full)[:, :6],
                               rtol=2e-4, atol=2e-4)
    for t in range(6, 10):
        step, _, cache = model.apply(
            params, input_ids=jnp.asarray(ids[:, t : t + 1]), cache=cache,
            attn_impl="reference",
        )
        np.testing.assert_allclose(
            np.asarray(step)[:, 0], np.asarray(full)[:, t], rtol=2e-4, atol=2e-4
        )


def test_llama_backend_matches_hf():
    """LLMConfig(attention_bias=False) == HF Llama — the reference's Llama
    backend (modeling_internvl_chat.py:81) via the same Qwen2Model."""
    import torch
    from transformers import LlamaConfig
    from transformers.models.llama.modeling_llama import LlamaForCausalLM

    from vlaser_tpu.core.config import LLMConfig
    from vlaser_tpu.utils.hf_convert import convert_llama

    torch.manual_seed(1)
    cfg = LLMConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, rope_theta=500000.0,
        attention_bias=False,
    )
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=500000.0, rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=False, attention_bias=False, attention_dropout=0.0,
        mlp_bias=False,
    )
    hf = LlamaForCausalLM(hf_cfg).eval().to(torch.float32)
    params = {"params": convert_llama(hf.state_dict(), cfg.num_layers)}
    model = Qwen2ForCausalLM(cfg, compute_dtype=jnp.float32)
    ids = np.random.default_rng(5).integers(0, 256, (2, 9))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    got, _, _ = model.apply(params, input_ids=jnp.asarray(ids), attn_impl="reference")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
