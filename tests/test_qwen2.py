"""Golden-value tests: our flax Qwen2 vs HuggingFace transformers (CPU torch),
plus cached-vs-uncached decode parity (the reference's own oracle style —
pizero_internvl.py:938-1003 / eval.py:131-137)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import LLMConfig, tiny_llm
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


def test_phi3_backend_matches_hf():
    """Phi3 (fused qkv/gate_up + su-scaled rope) converted onto the
    Qwen2Model layout matches the REFERENCE's vendored Phi3 modeling
    (hf_convert.convert_phi3, ops.rope_cos_sin_su vs modeling_phi3.py:139-178).
    Note: modern HF transformers picks longrope factors statically from
    config; the vendored code (our parity target) picks at runtime seq len."""
    import os
    import sys

    import torch

    ref_dir = "/root/reference/Vlaser_VLM/internvl_chat"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference unavailable")
    if ref_dir not in sys.path:
        sys.path.insert(0, ref_dir)
    from conftest import install_reference_stubs

    install_reference_stubs()
    try:
        from internvl.model.phi3.configuration_phi3 import Phi3Config
        from internvl.model.phi3.modeling_phi3 import (
            Phi3ForCausalLM as HFPhi3,
        )
    except Exception as e:
        pytest.skip(f"phi3 import failed: {e}")

    from vlaser_tpu.utils.hf_convert import convert_phi3

    torch.manual_seed(0)
    H, HEADS, KV, L, D = 64, 4, 2, 2, 16
    short = [1.0 + 0.05 * i for i in range(D // 2)]
    long = [2.0 + 0.1 * i for i in range(D // 2)]
    hf_cfg = Phi3Config(
        vocab_size=256, hidden_size=H, intermediate_size=128,
        num_hidden_layers=L, num_attention_heads=HEADS,
        num_key_value_heads=KV, rope_theta=10_000.0,
        max_position_embeddings=128, original_max_position_embeddings=32,
        rope_scaling={"type": "su", "short_factor": short,
                      "long_factor": long},
        tie_word_embeddings=False, attention_dropout=0.0, pad_token_id=0,
        attn_implementation="eager",
    )
    hf = HFPhi3(hf_cfg).eval().to(torch.float32)

    cfg = LLMConfig(
        vocab_size=256, hidden_size=H, intermediate_size=128, num_layers=L,
        num_heads=HEADS, num_kv_heads=KV, head_dim=D, rope_theta=10_000.0,
        attention_bias=False, max_position_embeddings=128,
        rms_norm_eps=1e-5,  # Phi3 default differs from Qwen2
        rope_short_factor=tuple(short), rope_long_factor=tuple(long),
        original_max_position=32,
    )
    params = {"params": convert_phi3(hf.state_dict(), L, HEADS, KV, D)}
    model = Qwen2ForCausalLM(cfg, compute_dtype=jnp.float32)

    rng = np.random.default_rng(1)
    # short-context path (within original max)
    ids = rng.integers(0, 256, (2, 12))
    with torch.no_grad():
        want = hf(torch.tensor(ids), use_cache=False).logits.numpy()
    got, _, _ = model.apply(params, input_ids=jnp.asarray(ids),
                            attn_impl="reference")
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)

    # long-context path (> original max 32 -> long factors + amplitude)
    ids = rng.integers(0, 256, (1, 48))
    with torch.no_grad():
        want = hf(torch.tensor(ids), use_cache=False).logits.numpy()
    got, _, _ = model.apply(params, input_ids=jnp.asarray(ids),
                            attn_impl="reference")
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_internlm2_conversion_matches_reference():
    """InternLM2's grouped-fused wqkv unpacks onto the Qwen2Model layout and
    matches the reference's vendored modeling (internlm2 golden — round 1
    shipped the converter untested)."""
    import importlib.machinery
    import importlib.util
    import os
    import sys
    import types

    import torch

    ref_dir = "/root/reference/Vlaser_VLM/internvl_chat"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference unavailable")
    if ref_dir not in sys.path:
        sys.path.insert(0, ref_dir)
    from conftest import install_reference_stubs

    install_reference_stubs()
    try:
        from internvl.model.internlm2.configuration_internlm2 import (
            InternLM2Config,
        )
        from internvl.model.internlm2.modeling_internlm2 import (
            InternLM2ForCausalLM,
        )
    except Exception as e:
        pytest.skip(f"internlm2 import failed: {e}")

    from vlaser_tpu.utils.hf_convert import convert_internlm2

    torch.manual_seed(0)
    H, HEADS, KV, L, D = 64, 4, 2, 2, 16
    ref_cfg = InternLM2Config(
        vocab_size=256, hidden_size=H, intermediate_size=128,
        num_hidden_layers=L, num_attention_heads=HEADS,
        num_key_value_heads=KV, rope_theta=10_000.0, bias=False,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    ref = InternLM2ForCausalLM(ref_cfg).eval().float()

    cfg = LLMConfig(
        vocab_size=256, hidden_size=H, intermediate_size=128, num_layers=L,
        num_heads=HEADS, num_kv_heads=KV, head_dim=D, rope_theta=10_000.0,
        attention_bias=False,
    )
    params = {"params": convert_internlm2(ref.state_dict(), L, HEADS, KV, D)}
    model = Qwen2ForCausalLM(cfg, compute_dtype=jnp.float32)

    rng = np.random.default_rng(2)
    ids = rng.integers(0, 256, (2, 10))
    with torch.no_grad():
        want = ref(torch.tensor(ids)).logits.numpy()
    got, _, _ = model.apply(params, input_ids=jnp.asarray(ids),
                            attn_impl="reference")
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_qwen3_backend_matches_hf():
    """LLMConfig(qk_norm=True, attention_bias=False) == HF Qwen3 — the
    InternVL3.5 language backbone (per-head q/k RMSNorm before rope;
    pizero_internvl.py:63-65, joint_model.py:449-452)."""
    import torch
    from transformers import Qwen3Config
    from transformers.models.qwen3.modeling_qwen3 import (
        Qwen3ForCausalLM as HFQwen3,
    )

    cfg = LLMConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=2, num_kv_heads=1, head_dim=32, rope_theta=1_000_000.0,
        attention_bias=False, qk_norm=True, tie_word_embeddings=False,
    )
    hf_cfg = Qwen3Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=False, attention_bias=False,
        attention_dropout=0.0,
    )
    torch.manual_seed(5)
    hf = HFQwen3(hf_cfg).eval().to(torch.float32)
    params = {"params": convert_qwen2(hf.state_dict(), cfg.num_layers)}
    model = Qwen2ForCausalLM(cfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, (2, 9))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    got, _, _ = model.apply(params, input_ids=jnp.asarray(ids),
                            attn_impl="reference")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_qwen3_cached_decode_matches_full():
    """Per-head q/k RMSNorm (qk_norm) must compose with the KV-cache decode
    path: prefill + per-token decode == full uncached forward."""
    cfg = LLMConfig(
        vocab_size=256, hidden_size=48, intermediate_size=96, num_layers=2,
        num_heads=2, num_kv_heads=1, head_dim=24, rope_theta=10_000.0,
        attention_bias=False, qk_norm=True, tie_word_embeddings=False,
    )
    model = Qwen2ForCausalLM(cfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(4)
    ids = rng.integers(1, cfg.vocab_size, (2, 10))
    params = model.init(jax.random.PRNGKey(0), input_ids=jnp.asarray(ids))
    full, _, _ = model.apply(params, input_ids=jnp.asarray(ids),
                             attn_impl="reference")
    cache = KVCache.create(cfg.num_layers, 2, 16, cfg.num_kv_heads,
                           cfg.head_dim, dtype=jnp.float32)
    pre, _, cache = model.apply(
        params, input_ids=jnp.asarray(ids[:, :6]), cache=cache,
        attn_impl="reference",
    )
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full)[:, :6],
                               rtol=2e-4, atol=2e-4)
    for t in range(6, 10):
        step, _, cache = model.apply(
            params, input_ids=jnp.asarray(ids[:, t : t + 1]), cache=cache,
            attn_impl="reference",
        )
        np.testing.assert_allclose(
            np.asarray(step)[:, 0], np.asarray(full)[:, t], rtol=2e-4,
            atol=2e-4,
        )
