"""Chat API end-to-end (toy tokenizer) + named-config assembly checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import (
    action_expert_2b,
    action_expert_8b,
    qwen2_5_1_5b,
    qwen2_5_7b,
    tiny_vlm,
    vlaser_2b,
    vlaser_2b_vla,
    vlaser_8b,
)
from vlaser_tpu.inference.chat import VlaserChat
from vlaser_tpu.models.vlm import InternVLChatModel
from vlaser_tpu.tokenizer.conversation import build_chat_query


class ToyTok:
    """Char-level with special-token vocabulary for the chat path."""

    pad_token_id = 0
    SPECIALS = {"<IMG_CONTEXT>": 500, "<img>": 498, "</img>": 499,
                "<|im_end|>": 497, "<|im_start|>": 496}

    def __call__(self, text, add_special_tokens=False, **kw):
        ids, i = [], 0
        while i < len(text):
            hit = False
            for tok, tid in self.SPECIALS.items():
                if text.startswith(tok, i):
                    ids.append(tid)
                    i += len(tok)
                    hit = True
                    break
            if not hit:
                ids.append(ord(text[i]) % 450 + 1)
                i += 1
        return {"input_ids": ids}

    def convert_tokens_to_ids(self, tok):
        return self.SPECIALS.get(tok, 1)

    def decode(self, ids, skip_special_tokens=True):
        out = []
        inv = {v: k for k, v in self.SPECIALS.items()}
        for t in ids:
            if t in inv:
                if not skip_special_tokens:
                    out.append(inv[t])
            else:
                out.append(chr(t + 60))
        return "".join(out)


def test_build_chat_query_structure():
    q = build_chat_query("internvl2_5", "<image>\nWhat is this?", [2], 4)
    assert q.count("<IMG_CONTEXT>") == 8  # 4 tokens * 2 patches
    assert q.startswith("<|im_start|>system\n")
    assert q.rstrip().endswith("<|im_start|>assistant")
    assert "<|im_start|>user\n" in q
    # multi-turn history
    q2 = build_chat_query("internvl2_5", "and now?", [], 4,
                          history=[("first q", "first a")])
    assert "first q" in q2 and "first a" in q2


def test_chat_end_to_end():
    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 400, (1, 8))
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(pixels), None)
    chat = VlaserChat(model, params, ToyTok(), max_new_tokens=4, bucket=32,
                      cache_dtype=jnp.float32)
    resp = chat.chat("what do you see?", pixels)
    assert isinstance(resp, str)
    resp2, history = chat.chat("what do you see?", pixels, return_history=True)
    assert history[-1][1] == resp2
    batch = chat.batch_chat(["hello", "hi"], None, num_patches_list=[0, 0])
    assert len(batch) == 2


def test_engine_chat_matches_static_chat():
    """EngineChat (serve/engine_chat.py) is a drop-in for VlaserChat: same
    prompt assembly, same greedy responses — backed by the continuous-
    batching engine instead of the static padded batch."""
    from vlaser_tpu.serve.engine_chat import EngineChat

    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 400, (1, 8))
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(pixels), None)
    static = VlaserChat(model, params, ToyTok(), max_new_tokens=5, bucket=32,
                        cache_dtype=jnp.float32)
    served = EngineChat(model, params, ToyTok(), max_new_tokens=5,
                        num_slots=2, max_len=512, prefill_buckets=(512,),
                        tile_buckets=(1, 2), cache_dtype=jnp.float32)
    qs = ["what do you see?", "count the objects please"]
    want = static.batch_chat(qs, pixels, num_patches_list=[1, 0])
    got = served.batch_chat(qs, pixels, num_patches_list=[1, 0])
    assert got == want
    assert served.chat("what do you see?", pixels) == \
        static.chat("what do you see?", pixels)

    # the one-jit offline backend (serve/offline.py) behind the same API
    offline = EngineChat(model, params, ToyTok(), max_new_tokens=5,
                         num_slots=2, max_len=1024, prefill_buckets=(512,),
                         tile_buckets=(1, 2), cache_dtype=jnp.float32,
                         backend="offline")
    assert offline.batch_chat(qs, pixels, num_patches_list=[1, 0]) == want
    assert offline.chat("what do you see?", pixels) == \
        static.chat("what do you see?", pixels)

    # shared-image prefix caching: N questions about ONE image answer
    # identically to batch_chat with the image repeated per question
    shared = EngineChat(model, params, ToyTok(), max_new_tokens=5,
                        num_slots=2, max_len=512,
                        prefill_buckets=(32, 256), tile_buckets=(1, 2),
                        cache_dtype=jnp.float32)
    q3 = ["what do you see?", "count the objects please", "is it red?"]
    want3 = static.batch_chat(
        q3, np.concatenate([pixels] * 3), num_patches_list=[1, 1, 1]
    )
    assert shared.batch_chat_shared_image(q3, pixels) == want3


def test_named_configs_consistent():
    c2 = vlaser_2b()
    assert c2.num_image_token == 256
    assert c2.vit_proj_in_dim == 4096
    assert c2.llm.q_dim == 1536 and c2.llm.kv_dim == 256
    c8 = vlaser_8b()
    assert c8.llm.hidden_size == 3584 and c8.llm.num_heads == 28

    # joint attention requires identical head layouts between vlm + expert
    for llm, exp in ((qwen2_5_1_5b(), action_expert_2b()),
                     (qwen2_5_7b(), action_expert_8b())):
        assert llm.num_heads == exp.num_heads
        assert llm.num_kv_heads == exp.num_kv_heads
        assert llm.head_dim == exp.head_dim

    vla = vlaser_2b_vla()
    assert vla.num_action_tokens == 4 and vla.num_proprio_tokens == 1
    assert vla.total_tokens == 384 + 1 + 4


def test_vlaser_2b_vla_param_shapes():
    """eval_shape-only assembly of the full-size flagship (no allocation)."""
    from vlaser_tpu.policy.pizero import PiZeroVLA

    cfg = vlaser_2b_vla()
    model = PiZeroVLA(cfg, param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    B, S = 1, cfg.max_image_text_tokens
    img = cfg.vlm.vision.image_size
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((B, S), jnp.int32),
            jnp.zeros((B, img, img, 3)),
            jnp.ones((B, S), jnp.int32),
            jnp.zeros((B, cfg.cond_steps, cfg.proprio_dim)),
            jnp.zeros((B, cfg.num_action_tokens, cfg.action_dim)),
            jnp.zeros((B,)),
            jnp.zeros((B, cfg.num_action_tokens, cfg.action_dim)),
        )
    )
    p = shapes["params"]
    # expert q_proj: 768 -> 12*128 (pizero_internvl.py:117-127)
    assert p["joint"]["layers"]["expert"]["q_proj"]["kernel"].shape == (28, 768, 1536)
    assert p["joint"]["layers"]["expert"]["mlp"]["gate_proj"]["kernel"].shape == (
        28, 768, 8960)
    assert p["joint"]["layers"]["vlm"]["q_proj"]["kernel"].shape == (28, 1536, 1536)
    assert p["vision_model"]["embeddings"]["position_embedding"].shape == (1, 1025, 1024)
    assert p["mlp1"]["fc1"]["kernel"].shape == (4096, 1536)
    total = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(p))
    assert 2.0e9 < total < 2.6e9  # ~2B params + 0.3B expert


def test_templates_match_reference_module():
    """Our template registry renders identical prompts to the reference's
    conversation.py (imported live) for every shared template."""
    import importlib.util
    import os
    import sys

    import pytest as _pytest

    ref = "/root/reference/Vlaser_VLM/internvl_chat/internvl/conversation.py"
    if not os.path.exists(ref):
        _pytest.skip("reference unavailable")
    spec = importlib.util.spec_from_file_location("ref_conversation", ref)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from vlaser_tpu.tokenizer.conversation import get_conv_template

    for name in ("internvl2_5", "Hermes-2", "internlm2-chat", "phi3-chat",
                 "internvl_zh"):
        theirs = mod.get_conv_template(name)
        ours = get_conv_template(name)
        theirs.append_message(theirs.roles[0], "What is in <image>?")
        theirs.append_message(theirs.roles[1], "A cat.")
        theirs.append_message(theirs.roles[0], "Color?")
        theirs.append_message(theirs.roles[1], None)
        ours.append_message(ours.roles[0], "What is in <image>?")
        ours.append_message(ours.roles[1], "A cat.")
        ours.append_message(ours.roles[0], "Color?")
        ours.append_message(ours.roles[1], None)
        assert ours.get_prompt() == theirs.get_prompt(), name


def test_top_p_sampling():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlaser_tpu.inference.sampling import _sample

    # distribution: probs ~ [0.5, 0.3, 0.15, 0.05]; top_p=0.6 keeps {0, 1}
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    keys = jax.random.split(jax.random.PRNGKey(0), 300)
    draws = np.asarray([
        int(_sample(logits, k, temperature=1.0, top_k=0, top_p=0.6)[0])
        for k in keys[:300]
    ])
    assert set(draws) <= {0, 1}
    assert (draws == 0).mean() > 0.45  # renormalized 0.5/0.8
    # top_p=1.0 keeps the full support
    draws = np.asarray([
        int(_sample(logits, k, temperature=1.0, top_k=0, top_p=1.0)[0])
        for k in keys[:300]
    ])
    assert set(draws) == {0, 1, 2, 3}


def test_chat_beams_and_penalty_paths():
    """VlaserChat exposes the HF generation_config surface: num_beams>1
    routes through the jitted beam searcher, repetition_penalty through the
    penalized greedy scan — both end-to-end over the chat template."""
    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 400, (1, 8))
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(pixels), None)
    beam_chat = VlaserChat(model, params, ToyTok(), max_new_tokens=6,
                           bucket=32, num_beams=2, cache_dtype=jnp.float32)
    resp = beam_chat.chat("describe", pixels)
    assert isinstance(resp, str)
    pen_chat = VlaserChat(model, params, ToyTok(), max_new_tokens=6,
                          bucket=32, repetition_penalty=1.3,
                          cache_dtype=jnp.float32)
    resp2 = pen_chat.chat("describe", pixels)
    assert isinstance(resp2, str)


def test_chat_quantized_routes_fused_serving():
    """round-4 VERDICT #2: int8/w8a8-quantized params route single-stream
    greedy chat() through the fused serving runner (fused decode kernel +
    <=13-tile fused ViT), while batch_chat / sampled / beam configurations
    keep the XLA generator — and the fused response matches the XLA
    response over the SAME quantized weights (greedy, fp32 host compute)."""
    from vlaser_tpu.core.quant import quantize_for_serving

    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 400, (1, 8))
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                           jnp.asarray(pixels), None)
    qv = quantize_for_serving(variables, target="vlm", mode="w8a8",
                              min_size=0)

    # unquantized -> XLA only; quantized + sampling/beams -> XLA only
    assert VlaserChat(model, variables, ToyTok(), max_new_tokens=4,
                      use_fused=True)._fused_gen is None
    assert VlaserChat(model, qv, ToyTok(), max_new_tokens=4,
                      temperature=0.7, use_fused=True)._fused_gen is None
    assert VlaserChat(model, qv, ToyTok(), max_new_tokens=4,
                      num_beams=2, use_fused=True)._fused_gen is None
    # "auto" must NOT route off-TPU (interpret-mode Pallas would crawl)
    # and must not route at a non-bf16 cache dtype (the fused stack's KV
    # cache is bf16)
    assert VlaserChat(model, qv, ToyTok(),
                      max_new_tokens=4)._fused_gen is None
    assert VlaserChat(model, qv, ToyTok(), max_new_tokens=4,
                      cache_dtype=jnp.float32,
                      use_fused="auto")._fused_gen is None

    chat = VlaserChat(model, qv, ToyTok(), max_new_tokens=4, bucket=32,
                      use_fused=True)
    assert chat._fused_gen is not None
    calls = []
    orig = chat._fused_gen
    chat._fused_gen = lambda *a: (calls.append(1), orig(*a))[1]
    resp_fused = chat.chat("what do you see?", pixels)
    assert calls, "single-stream greedy chat did not take the fused path"

    # batch_chat (b=2) must stay on the XLA generator
    n = len(calls)
    chat.batch_chat(["hello", "hi"], None, num_patches_list=[0, 0])
    assert len(calls) == n

    # identity vs the XLA path over the same quantized tree (both at the
    # fused stack's bf16 cache dtype)
    chat_xla = VlaserChat(model, qv, ToyTok(), max_new_tokens=4, bucket=32,
                          use_fused=False)
    assert chat_xla._fused_gen is None
    assert chat_xla.chat("what do you see?", pixels) == resp_fused


def test_quantized_params_through_beams_and_penalty():
    """The non-fused generation surfaces (beam search, repetition
    penalty, sampling) must serve a quantized tree through the XLA
    dequant path — the product CLIs now quantize by DEFAULT, so every
    generation mode sees the quant collection, not just greedy chat."""
    from vlaser_tpu.core.quant import quantize_for_serving

    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    rng = np.random.default_rng(5)
    ids = rng.integers(1, 400, (1, 8))
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                           jnp.asarray(pixels), None)
    qv = quantize_for_serving(variables, target="vlm", mode="w8a8",
                              min_size=0)
    beams = VlaserChat(model, qv, ToyTok(), max_new_tokens=4, bucket=32,
                       num_beams=2, cache_dtype=jnp.float32)
    assert isinstance(beams.chat("what do you see?", pixels), str)
    pen = VlaserChat(model, qv, ToyTok(), max_new_tokens=4, bucket=32,
                     repetition_penalty=1.3, cache_dtype=jnp.float32)
    assert isinstance(pen.chat("what do you see?", pixels), str)
    sampled = VlaserChat(model, qv, ToyTok(), max_new_tokens=4, bucket=32,
                         temperature=0.8, top_k=5, cache_dtype=jnp.float32)
    assert isinstance(sampled.chat("what do you see?", pixels), str)
