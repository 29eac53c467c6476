"""Golden parity vs the REFERENCE'S OWN PyTorch code (random weights).

Real Vlaser checkpoints are unreachable from this box (no network egress,
nothing cached on disk — documented in docs/STATUS.md), so the strongest
available parity evidence is to run the reference implementation itself
(/root/reference/Vlaser_VLM/internvl_chat/internvl/model/**, imported at test
time, never copied) on randomly initialized weights, convert the state_dict
through utils/hf_convert, and require our flax models to match in fp32.

This pins down exactly the surfaces VERDICT.md flagged as real-weight risk:
bicubic pos-emb behavior, pixel-shuffle permute order (ps_version v2), the
IMG_CONTEXT scatter, QK-RMSNorm-over-flattened-dim, and the mlp1 projector.
"""

import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vlaser_tpu.core.config import LLMConfig, VisionConfig, VLMConfig  # noqa: E402
from vlaser_tpu.utils import hf_convert  # noqa: E402

REF = "/root/reference/Vlaser_VLM/internvl_chat"


@pytest.fixture(scope="module")
def ref_pkg():
    import os

    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")
    # the reference imports timm only for DropPath (identity at eval)
    import importlib.machinery
    import types

    import torch.nn as nn

    if "timm" not in sys.modules:
        def mkmod(name):
            m = types.ModuleType(name)
            m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            return m

        timm = mkmod("timm")
        models = mkmod("timm.models")
        layers_mod = mkmod("timm.models.layers")

        class DropPath(nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()

            def forward(self, x):
                return x

        layers_mod.DropPath = DropPath
        timm.models = models
        models.layers = layers_mod
        sys.modules.update(
            {"timm": timm, "timm.models": models, "timm.models.layers": layers_mod}
        )
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from internvl.model.internvl_chat.configuration_intern_vit import (
            InternVisionConfig,
        )
        from internvl.model.internvl_chat.configuration_internvl_chat import (
            InternVLChatConfig,
        )
        from internvl.model.internvl_chat.modeling_intern_vit import (
            InternVisionModel,
        )
        from internvl.model.internvl_chat.modeling_internvl_chat import (
            InternVLChatModel,
        )
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    return dict(
        torch=torch,
        InternVisionConfig=InternVisionConfig,
        InternVisionModel=InternVisionModel,
        InternVLChatConfig=InternVLChatConfig,
        InternVLChatModel=InternVLChatModel,
    )


VIS_KW = dict(hidden_size=64, intermediate_size=128, num_layers=2, num_heads=4,
              patch_size=14, image_size=56, qk_normalization=True)


def _ref_vision_cfg(ref_pkg):
    return ref_pkg["InternVisionConfig"](
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        use_flash_attn=False, qk_normalization=True, drop_path_rate=0.0,
        norm_type="layer_norm", qkv_bias=True,  # InternViT-300M recipe
    )


def test_internvit_golden(ref_pkg):
    torch = ref_pkg["torch"]
    torch.manual_seed(0)
    ref = ref_pkg["InternVisionModel"](_ref_vision_cfg(ref_pkg)).eval().float()
    x = torch.randn(2, 3, 56, 56)
    with torch.no_grad():
        want = ref(x).last_hidden_state.numpy()

    from vlaser_tpu.models.internvit import InternVisionModel

    cfg = VisionConfig(**VIS_KW)
    model = InternVisionModel(cfg, param_dtype=jnp.float32,
                              compute_dtype=jnp.float32, attn_impl="reference")
    params = hf_convert.convert_internvit(ref.state_dict(), cfg.num_layers)
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _tiny_chat_pair(ref_pkg, image_size=56):
    """Build matched (reference torch model, our flax model+params)."""
    torch = ref_pkg["torch"]
    from transformers import Qwen2Config

    llm = Qwen2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=1_000_000.0, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    llm.architectures = ["Qwen2ForCausalLM"]
    cfg = ref_pkg["InternVLChatConfig"](
        vision_config=_ref_vision_cfg(ref_pkg).to_dict(), llm_config=llm.to_dict(),
        downsample_ratio=0.5, ps_version="v2", select_layer=-1,
        template="internvl2_5", force_image_size=image_size,
    )
    torch.manual_seed(1)
    ref = ref_pkg["InternVLChatModel"](cfg).eval().float()
    ref.img_context_token_id = 300

    from vlaser_tpu.models.vlm import InternVLChatModel as OurChat

    ours_cfg = VLMConfig(
        vision=VisionConfig(**VIS_KW),
        llm=LLMConfig(
            vocab_size=512, hidden_size=64, intermediate_size=128, num_layers=2,
            num_heads=4, num_kv_heads=2, head_dim=16, rope_theta=1_000_000.0,
            tie_word_embeddings=False, attention_bias=True,
        ),
        img_context_token_id=300, pad_token_id=0,
    )
    ours = OurChat(ours_cfg, param_dtype=jnp.float32, compute_dtype=jnp.float32,
                   attn_impl="reference")
    params = hf_convert.convert_internvl_chat(ref.state_dict(), 2, 2)
    return ref, ours, params, ours_cfg


def test_extract_feature_golden(ref_pkg):
    """ViT -> drop CLS -> pixel_shuffle(v2) -> mlp1 vs
    modeling_internvl_chat.py:273-291."""
    torch = ref_pkg["torch"]
    ref, ours, params, _ = _tiny_chat_pair(ref_pkg)
    px = torch.randn(3, 3, 56, 56)
    with torch.no_grad():
        want = ref.extract_feature(px).numpy()
    got = np.asarray(
        ours.apply({"params": params},
                   jnp.asarray(px.numpy().transpose(0, 2, 3, 1)),
                   method=ours.extract_feature)
    )
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_chat_forward_logits_golden(ref_pkg):
    """Full forward (IMG_CONTEXT scatter + Qwen2 LLM) vs the reference
    (modeling_internvl_chat.py:143-243)."""
    torch = ref_pkg["torch"]
    ref, ours, params, ours_cfg = _tiny_chat_pair(ref_pkg)
    B, N, T = 1, 16, 1
    g = torch.Generator().manual_seed(2)
    ids = torch.randint(1, 200, (B, N), generator=g)
    n_img = ref.num_image_token * T
    ids[0, 3 : 3 + n_img] = 300
    px = torch.randn(T, 3, 56, 56, generator=g)
    with torch.no_grad():
        want = ref(
            pixel_values=px, input_ids=ids,
            attention_mask=torch.ones(B, N, dtype=torch.long),
            image_flags=torch.ones(T, dtype=torch.long),
        ).logits.numpy()
    got, _, _ = ours.apply(
        {"params": params}, jnp.asarray(ids.numpy()),
        jnp.asarray(px.numpy().transpose(0, 2, 3, 1)),
        jnp.ones((T,), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_pos_emb_interpolation_golden(ref_pkg):
    """448-trained pos-emb applied at a different grid exercises the bicubic
    interp path on both sides (modeling_intern_vit.py:154-174)."""
    torch = ref_pkg["torch"]
    # reference trained at 56px (4x4 grid), evaluated at 84px (6x6 grid)
    torch.manual_seed(3)
    ref = ref_pkg["InternVisionModel"](_ref_vision_cfg(ref_pkg)).eval().float()
    x = torch.randn(1, 3, 84, 84)
    with torch.no_grad():
        want = ref(x).last_hidden_state.numpy()

    from vlaser_tpu.models.internvit import InternVisionModel

    cfg = VisionConfig(**VIS_KW)  # image_size still 56 => interp kicks in
    model = InternVisionModel(cfg, param_dtype=jnp.float32,
                              compute_dtype=jnp.float32, attn_impl="reference")
    params = hf_convert.convert_internvit(ref.state_dict(), cfg.num_layers)
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    )
    # ops.bicubic_resize_2d reproduces torch's a=-0.75 kernel exactly, so
    # this holds at fp32 tolerance
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_generate_repetition_penalty_golden(ref_pkg):
    """Greedy decode with repetition_penalty vs HF generate on the matched
    tiny Qwen2 (the reference surfaces generation_config through
    modeling_internvl_chat.py:400-438). Text-only prompt, no padding."""
    torch = ref_pkg["torch"]
    ref, ours, params, ours_cfg = _tiny_chat_pair(ref_pkg)
    B, N, NEW = 2, 10, 12
    g = torch.Generator().manual_seed(9)
    ids = torch.randint(5, 200, (B, N), generator=g)
    eos_id = 511  # unused in the prompt and unlikely under random logits

    with torch.no_grad():
        hf_out = ref.language_model.generate(
            input_ids=ids, attention_mask=torch.ones(B, N, dtype=torch.long),
            max_new_tokens=NEW, do_sample=False, repetition_penalty=1.3,
            pad_token_id=0, eos_token_id=eos_id, use_cache=True,
        )
    want = hf_out[:, N:].numpy()

    from vlaser_tpu.inference.sampling import make_generate_fn

    gen = make_generate_fn(
        ours, max_new_tokens=NEW, eos_token_ids=[eos_id], pad_token_id=0,
        repetition_penalty=1.3, cache_dtype=jnp.float32,
    )
    tokens, num = gen({"params": params}, jnp.asarray(ids.numpy()),
                      jnp.ones((B, N), jnp.int32), None, jax.random.PRNGKey(0))
    got = np.asarray(tokens)
    np.testing.assert_array_equal(got, want)

    # and the penalty actually changes the continuation vs plain greedy
    gen0 = make_generate_fn(
        ours, max_new_tokens=NEW, eos_token_ids=[eos_id], pad_token_id=0,
        cache_dtype=jnp.float32,
    )
    base, _ = gen0({"params": params}, jnp.asarray(ids.numpy()),
                   jnp.ones((B, N), jnp.int32), None, jax.random.PRNGKey(0))
    assert not np.array_equal(np.asarray(base), got)


def test_beam_search_golden(ref_pkg):
    """num_beams=2 vs HF generate on the matched tiny Qwen2
    (generation_config.num_beams through modeling_internvl_chat.py:400-438).
    Case 1: EOS unreachable (pure beam-scoring path). Case 2: EOS chosen so
    finished-hypothesis bookkeeping engages on both sides."""
    torch = ref_pkg["torch"]
    ref, ours, params, _ = _tiny_chat_pair(ref_pkg)
    from vlaser_tpu.inference.beam_search import make_beam_generate_fn

    B, N, NEW = 2, 9, 10
    g = torch.Generator().manual_seed(21)
    ids = torch.randint(5, 200, (B, N), generator=g)
    mask = torch.ones(B, N, dtype=torch.long)

    def hf_beams(eos_id):
        with torch.no_grad():
            out = ref.language_model.generate(
                input_ids=ids, attention_mask=mask, max_new_tokens=NEW,
                do_sample=False, num_beams=2, pad_token_id=0,
                eos_token_id=eos_id, use_cache=True, early_stopping=False,
            )
        return out[:, N:].numpy()

    def our_beams(eos_id):
        gen = make_beam_generate_fn(
            ours, max_new_tokens=NEW, num_beams=2, eos_token_ids=[eos_id],
            pad_token_id=0, cache_dtype=jnp.float32,
        )
        toks, _ = gen({"params": params}, jnp.asarray(ids.numpy()),
                      jnp.ones((B, N), jnp.int32), None)
        return np.asarray(toks)

    # case 1: unreachable EOS
    np.testing.assert_array_equal(our_beams(511), hf_beams(511))

    # case 2: make EOS a token the model actually produces mid-beam
    probe = hf_beams(511)
    eos_id = int(probe[0, NEW // 2])
    got, want = our_beams(eos_id), hf_beams(eos_id)
    # compare through the first EOS: transformers' vectorized beam search
    # pads finished rows with EOS, ours with pad_token_id — same hypothesis
    for r in range(B):
        w, o = list(want[r]), list(got[r])
        end_w = w.index(eos_id) + 1 if eos_id in w else len(w)
        end_o = o.index(eos_id) + 1 if eos_id in o else len(o)
        assert end_w == end_o, (w, o)
        np.testing.assert_array_equal(o[:end_o], w[:end_w])
    # at least one row actually finished early via EOS
    assert any(eos_id in list(want[r]) for r in range(B))
