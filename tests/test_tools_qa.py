"""Checkpoint tools + QA generation tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import tiny_vla
from vlaser_tpu.data.qa_generation import (
    QAGenConfig,
    QAGenerator,
    parse_qa_response,
    parse_score,
    quality_filter,
)
from vlaser_tpu.policy.pizero import PiZeroVLA
from vlaser_tpu.utils.tools import (
    convert_pizero_torch_checkpoint,
    resize_pos_embeddings,
    strip_compile_prefix,
)


def test_resize_pos_embeddings():
    pos = np.random.default_rng(0).standard_normal((1, 17, 8)).astype(np.float32)
    out = resize_pos_embeddings(pos, new_side=8)
    assert out.shape == (1, 65, 8)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])  # CLS preserved
    # identity resize returns original patches (PIL bicubic is exact at 1:1)
    same = resize_pos_embeddings(pos, new_side=4)
    np.testing.assert_allclose(same[:, 1:], pos[:, 1:], atol=1e-4)


def test_strip_compile_prefix():
    sd = {"_orig_mod.a.b": 1, "c": 2}
    assert strip_compile_prefix(sd) == {"a.b": 1, "c": 2}


def test_convert_pizero_checkpoint_roundtrip():
    """Build a synthetic torch-style state dict shaped like the reference
    PiZero, convert, and verify it loads into PiZeroVLA and changes outputs
    deterministically."""
    import torch

    cfg = tiny_vla(max_image_text_tokens=16)
    model = PiZeroVLA(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    rng = np.random.default_rng(0)
    S = cfg.max_image_text_tokens
    ids = rng.integers(1, 400, (2, S))
    ids[:, 2] = cfg.vlm.img_context_token_id
    args = (
        jnp.asarray(ids),
        jnp.asarray(rng.standard_normal((2, 28, 28, 3)).astype(np.float32)),
        jnp.ones((2, S), jnp.int32),
        jnp.zeros((2, 1, 7)),
        jnp.zeros((2, 4, 7)),
        jnp.zeros((2,)),
        jnp.zeros((2, 4, 7)),
    )
    params = model.init(jax.random.PRNGKey(0), *args)

    # synthesize a torch state dict with the right shapes from our params
    g = torch.Generator().manual_seed(0)
    sd = {}
    p = params["params"]
    L = cfg.vlm.llm.num_layers
    VL = cfg.vlm.vision.num_layers

    def put_lin(prefix, kernel, bias=None):
        sd[f"{prefix}.weight"] = torch.randn(
            kernel.shape[1], kernel.shape[0], generator=g
        ) * 0.02
        if bias is not None:
            sd[f"{prefix}.bias"] = torch.randn(bias.shape[0], generator=g) * 0.02

    # vision tower
    v = p["vision_model"]
    emb = v["embeddings"]
    sd["vision_tower.vision_model.embeddings.class_embedding"] = torch.randn(
        1, 1, emb["class_embedding"].shape[-1], generator=g
    )
    sd["vision_tower.vision_model.embeddings.position_embedding"] = torch.randn(
        *emb["position_embedding"].shape, generator=g
    )
    ker = emb["patch_embedding"]["kernel"]
    sd["vision_tower.vision_model.embeddings.patch_embedding.weight"] = torch.randn(
        ker.shape[3], ker.shape[2], ker.shape[0], ker.shape[1], generator=g
    )
    sd["vision_tower.vision_model.embeddings.patch_embedding.bias"] = torch.randn(
        ker.shape[3], generator=g
    )
    enc = v["encoder"]
    for i in range(VL):
        pre = f"vision_tower.vision_model.encoder.layers.{i}"
        qkv = enc["attn"]["qkv"]["kernel"]
        sd[f"{pre}.attn.qkv.weight"] = torch.randn(qkv.shape[2], qkv.shape[1], generator=g) * 0.02
        sd[f"{pre}.attn.qkv.bias"] = torch.randn(qkv.shape[2], generator=g) * 0.02
        pr = enc["attn"]["proj"]["kernel"]
        sd[f"{pre}.attn.proj.weight"] = torch.randn(pr.shape[2], pr.shape[1], generator=g) * 0.02
        sd[f"{pre}.attn.proj.bias"] = torch.randn(pr.shape[2], generator=g) * 0.02
        if "q_norm" in enc["attn"]:
            sd[f"{pre}.attn.q_norm.weight"] = torch.ones(qkv.shape[1])
            sd[f"{pre}.attn.k_norm.weight"] = torch.ones(qkv.shape[1])
        f1 = enc["mlp"]["fc1"]["kernel"]
        sd[f"{pre}.mlp.fc1.weight"] = torch.randn(f1.shape[2], f1.shape[1], generator=g) * 0.02
        sd[f"{pre}.mlp.fc1.bias"] = torch.zeros(f1.shape[2])
        f2 = enc["mlp"]["fc2"]["kernel"]
        sd[f"{pre}.mlp.fc2.weight"] = torch.randn(f2.shape[2], f2.shape[1], generator=g) * 0.02
        sd[f"{pre}.mlp.fc2.bias"] = torch.zeros(f2.shape[2])
        for nm in ("norm1", "norm2"):
            sd[f"{pre}.{nm}.weight"] = torch.ones(qkv.shape[1])
            sd[f"{pre}.{nm}.bias"] = torch.zeros(qkv.shape[1])
        sd[f"{pre}.ls1"] = torch.ones(qkv.shape[1]) * 0.1
        sd[f"{pre}.ls2"] = torch.ones(qkv.shape[1]) * 0.1

    # projector / embeddings
    m = p["mlp1"]
    sd["multi_modal_projector.0.weight"] = torch.ones(m["norm"]["weight"].shape[0])
    sd["multi_modal_projector.0.bias"] = torch.zeros(m["norm"]["bias"].shape[0])
    put_lin("multi_modal_projector.1", m["fc1"]["kernel"], m["fc1"]["bias"])
    put_lin("multi_modal_projector.3", m["fc2"]["kernel"], m["fc2"]["bias"])
    sd["embed_tokens.weight"] = torch.randn(
        *p["embed_tokens"]["embedding"].shape, generator=g
    ) * 0.02

    # joint mixtures
    for name, tree in (("vlm", p["joint"]["layers"]["vlm"]),
                       ("action", p["joint"]["layers"]["expert"])):
        for i in range(L):
            pre = f"joint_model.mixtures.{name}.layers.{i}"
            for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                k = tree[proj]["kernel"]
                sd[f"{pre}.self_attn.{proj}.weight"] = torch.randn(
                    k.shape[2], k.shape[1], generator=g) * 0.02
                if "bias" in tree[proj]:
                    sd[f"{pre}.self_attn.{proj}.bias"] = torch.zeros(k.shape[2])
            for proj in ("gate_proj", "up_proj", "down_proj"):
                k = tree["mlp"][proj]["kernel"]
                sd[f"{pre}.mlp.{proj}.weight"] = torch.randn(
                    k.shape[2], k.shape[1], generator=g) * 0.02
            for nm in ("input_layernorm", "post_attention_layernorm"):
                sd[f"{pre}.{nm}.weight"] = torch.ones(tree[nm]["weight"].shape[1])
    sd["joint_model.mixtures.vlm.norm.weight"] = torch.ones(
        p["joint"]["vlm_norm"]["weight"].shape[0]
    )
    sd["joint_model.mixtures.action.norm.weight"] = torch.ones(
        p["joint"]["expert_norm"]["weight"].shape[0]
    )
    for nm in ("linear_1", "linear_2", "linear_3"):
        k = p["action_encoder"][nm]["kernel"]
        put_lin(f"action_encoder.{nm}", k, p["action_encoder"][nm]["bias"])
    put_lin("proprio_encoder", p["proprio_encoder"]["kernel"],
            p["proprio_encoder"]["bias"])
    put_lin("action_decoder", p["action_decoder"]["kernel"],
            p["action_decoder"]["bias"])

    converted = convert_pizero_torch_checkpoint(sd, num_layers=L, vision_layers=VL)
    # structure must match our params exactly
    ours = jax.tree_util.tree_structure(p)
    theirs = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.asarray, converted)
    )
    assert ours == theirs
    # and it must run
    out = model.apply({"params": converted}, *args)
    assert np.isfinite(float(out))


def test_qa_parse_and_generate(tmp_path):
    assert parse_qa_response("Question: what?\nAnswer: a cat") == {
        "question": "what?", "answer": "a cat"
    }
    assert parse_qa_response("no structure") is None
    assert parse_score("Score: 8") == 8.0
    assert parse_score("I rate it 7/10") == 7.0

    def fake_gen(images, prompts):
        return [f"Question: What is task {i}?\nAnswer: Move the arm."
                for i in range(len(prompts))]

    gen = QAGenerator(fake_gen, QAGenConfig(images_dir=str(tmp_path / "imgs"),
                                            batch_size=2))
    frames = [
        {"image": np.zeros((8, 8, 3), np.uint8), "instruction": f"task {i}"}
        for i in range(3)
    ]
    out = str(tmp_path / "qa.jsonl")
    n = gen.generate(frames, out)
    assert n == 3
    items = [json.loads(l) for l in open(out)]
    assert items[0]["conversations"][0]["value"].startswith("<image>\n")

    kept = quality_filter(
        items,
        score_fn=lambda prompts: ["Score: 9"] * (len(prompts) - 1) + ["Score: 2"],
        threshold=6.0,
    )
    assert len(kept) == 2
    assert kept[0]["quality_score"] == 9.0


def test_qa_generate_all_kinds(tmp_path):
    """kind='all' asks every QA kind per frame; the shared_image_fn fast
    path (one image prefill, K prompts — EngineChat.batch_chat_shared_image
    shape) writes the same items as the plain batched path."""
    def fake_gen(images, prompts):
        assert len(images) == len(prompts)
        return [f"Question: q{hash(p) % 97}?\nAnswer: a." for p in prompts]

    frames = lambda: [
        {"image": np.full((8, 8, 3), i, np.uint8), "instruction": f"task {i}"}
        for i in range(2)
    ]
    gen = QAGenerator(fake_gen, QAGenConfig(
        kind="all", images_dir=str(tmp_path / "i1"), batch_size=2))
    out1 = str(tmp_path / "qa1.jsonl")
    assert gen.generate(frames(), out1) == 6  # 2 frames x 3 kinds

    calls = []

    def shared_fn(prompts, image):
        calls.append(len(prompts))
        return fake_gen([image] * len(prompts), prompts)

    gen2 = QAGenerator(fake_gen, QAGenConfig(
        kind="all", images_dir=str(tmp_path / "i2"), batch_size=2),
        shared_image_fn=shared_fn)
    out2 = str(tmp_path / "qa2.jsonl")
    assert gen2.generate(frames(), out2) == 6
    assert calls == [3, 3]  # one shared-prefix run per frame
    rows1 = [json.loads(l) for l in open(out1)]
    rows2 = [json.loads(l) for l in open(out2)]
    assert [r["conversations"] for r in rows1] == \
        [r["conversations"] for r in rows2]
    # each frame's items share one saved image file
    assert len({r["image"] for r in rows2}) == 2


def test_reasoning_pipeline_end_to_end(tmp_path):
    """MMPR correctness pipeline: rollouts -> pos/neg buckets -> preference
    pairs consumable by the MPO PreferenceDataset."""
    from vlaser_tpu.data.reasoning_pipeline import (
        build_items_based_on_correctness,
        build_pairs,
        check_answer,
        extract_final_answer,
        relaxed_correctness,
        sample_responses,
        write_pairs_jsonl,
    )

    assert extract_final_answer("thinking...\n\\boxed{42}") == "42"
    assert extract_final_answer("So the answer is: 7.") == "7"
    assert extract_final_answer("blah\nlast line") == "last line"
    assert check_answer("42", "42") == 1
    assert check_answer("43", "42") == 0
    assert check_answer("41.9", "42", mode="relaxed_accuracy") == 1
    assert relaxed_correctness("100", "104") == 1
    assert relaxed_correctness("100", "110") == 0

    items = [
        {"image": "a.png", "question": "2+2?", "answer": "4"},
        {"question": "capital of France?", "answer": "Paris"},
    ]

    def gen(item, k):
        # half the rollouts correct, half wrong; one unparsable
        if k == 3:
            return ""
        good = k % 2 == 0
        ans = item["answer"] if good else "wrong"
        return f"Let me think.\nFinal answer: {ans}"

    rollouts = sample_responses(items, gen, num_samples=4)
    assert len(rollouts) == 8
    pos, neg, fmt = build_items_based_on_correctness(rollouts)
    assert sum(len(v) for v in pos.values()) == 4
    assert sum(len(v) for v in neg.values()) == 2  # k=1 only (k=3 is format)
    assert sum(len(v) for v in fmt.values()) == 2
    pairs = build_pairs(pos, neg, max_pairs_per_key=10)
    assert len(pairs) == 4  # 2 pos x 1 neg per question
    p = pairs[0]
    assert set(p) == {"image", "question", "chosen", "rejected", "answer_gt"}
    assert "Final answer: 4" in p["chosen"] or "Paris" in p["chosen"]
    assert "wrong" in p["rejected"]

    # jsonl output loads through the MPO preference dataset
    out = tmp_path / "pairs.jsonl"
    write_pairs_jsonl(pairs, str(out))
    from vlaser_tpu.data.preference_dataset import (
        PreferenceDataset, PreferenceDatasetConfig,
    )

    class MiniTok:
        pad_token_id = 0

        def __call__(self, text, add_special_tokens=False, **kw):
            return {"input_ids": [ord(c) % 200 for c in text]}

    ds = PreferenceDataset(
        PreferenceDatasetConfig(jsonl_path=str(out), num_image_token=1,
                                image_size=8),
        MiniTok(),
    )
    s = ds[1]  # text-only pair (question 2 has no real image file)
    assert (s["chosen_labels"] != -100).sum() > 0
    assert (s["rejected_labels"] != -100).sum() > 0


def test_dropout_ntp_pairs():
    from vlaser_tpu.data.reasoning_pipeline import build_dropout_ntp_pairs

    items = [{"question": "q", "response": "A" * 10 + "B" * 10}]
    pairs = build_dropout_ntp_pairs(
        items, lambda item, prefix: "XXX", drop_ratio=0.5
    )
    assert pairs[0]["chosen"] == "A" * 10 + "B" * 10
    assert pairs[0]["rejected"] == "A" * 10 + "XXX"
