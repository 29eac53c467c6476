"""Golden parity of the VLA against the REFERENCE'S OWN PyTorch code.

Imports src/model/vla/{pizero_internvl,joint_model,mixture,modules}.py from the
reference tree at test time (never copied), instantiates the reference PiZero
at a tiny config with random weights (its `get_internvl3` checkpoint loader is
replaced by a same-shape random constructor since no checkpoints/network exist
on this box), converts the state_dict through utils/hf_convert, and requires
fp32 parity from our PiZeroVLA on:

- the flow-matching loss (pizero_internvl.py:1064-1197)
- infer_action action chunks — KV-cache mode "append_non_active"
  (pizero_internvl.py:798-936, joint_model.py:702-814)
- infer_action_naive — KV-cache mode "no_append" (pizero_internvl.py:938-1003)
- infer_text prefill logits — KV-cache mode "append"
  (pizero_internvl.py:1005-1046)

The reference's hydra/omegaconf/bitsandbytes imports are stubbed minimally
(they are config plumbing, not model math).
"""

import copy
import importlib
import importlib.machinery
import os
import sys
import types

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vlaser_tpu.core.config import LLMConfig, VisionConfig, VLAConfig, VLMConfig  # noqa: E402
from vlaser_tpu.utils import hf_convert  # noqa: E402

SIMPLER = "/root/reference/Vlaser_VLA/Simpler"
INTERNVL_CHAT = "/root/reference/Vlaser_VLM/internvl_chat"

IMG_TOKEN_ID = 300
PAD_ID = 0
VOCAB = 512
S_TEXT = 80  # 64 image tokens + 16 text/pad
N_IMG_TOK = 64  # (224/14)^2 * 0.5^2


class CfgNode(dict):
    """Attribute-access dict standing in for the reference's OmegaConf nodes."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def get(self, k, default=None):
        return dict.get(self, k, default)


def _mkmod(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m


def _install_stub_modules(torch):
    """bitsandbytes / hydra / omegaconf shims for the reference imports."""
    import torch.nn as nn

    if "bitsandbytes" not in sys.modules:
        bnb = _mkmod("bitsandbytes")
        bnb_nn = _mkmod("bitsandbytes.nn")
        bnb_nn.Params4bit = nn.Parameter
        bnb_nn.Linear4bit = nn.Linear
        bnb_f = _mkmod("bitsandbytes.functional")
        bnb_f.quantize_4bit = None
        bnb_f.dequantize_4bit = None
        bnb.nn = bnb_nn
        bnb.functional = bnb_f
        sys.modules.update(
            {"bitsandbytes": bnb, "bitsandbytes.nn": bnb_nn,
             "bitsandbytes.functional": bnb_f}
        )
    if "omegaconf" not in sys.modules:
        om = _mkmod("omegaconf")

        class OmegaConf:
            @staticmethod
            def merge(a, b):
                out = CfgNode(a)
                out.update(b)
                return out

        om.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = om
    if "hydra" not in sys.modules:
        hydra = _mkmod("hydra")
        hydra_utils = _mkmod("hydra.utils")

        def instantiate(node):
            target = node["_target_"]
            mod_name, cls_name = target.rsplit(".", 1)
            cls = getattr(importlib.import_module(mod_name), cls_name)
            return cls(**{k: v for k, v in node.items() if k != "_target_"})

        hydra_utils.instantiate = instantiate
        hydra.utils = hydra_utils
        sys.modules.update({"hydra": hydra, "hydra.utils": hydra_utils})


def _tiny_ref_internvl(torch):
    """Random tiny stand-in for get_internvl3 (pizero_internvl.py:32-152):
    InternVLChatModel + a narrower action-expert Qwen2, same wiring."""
    from internvl.model.internvl_chat.configuration_intern_vit import (
        InternVisionConfig,
    )
    from internvl.model.internvl_chat.configuration_internvl_chat import (
        InternVLChatConfig,
    )
    from internvl.model.internvl_chat.modeling_internvl_chat import (
        InternVLChatModel,
    )
    from transformers import Qwen2Config, Qwen2ForCausalLM

    vis = InternVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=224, patch_size=14,
        use_flash_attn=False, qk_normalization=True, drop_path_rate=0.0,
        norm_type="layer_norm", qkv_bias=True,
    )
    llm = Qwen2Config(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=128, rope_theta=1_000_000.0, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    llm.architectures = ["Qwen2ForCausalLM"]
    cfg = InternVLChatConfig(
        vision_config=vis.to_dict(), llm_config=llm.to_dict(),
        downsample_ratio=0.5, ps_version="v2", select_layer=-1,
        template="internvl2_5", force_image_size=224,
    )
    torch.manual_seed(7)
    vlm = InternVLChatModel(cfg).eval().float()
    vlm.img_context_token_id = IMG_TOKEN_ID
    # action expert: deepcopy of the llm config, narrower hidden/mlp, same
    # head layout with head_dim 128 (pizero_internvl.py:116-134)
    expert_cfg = copy.deepcopy(llm)
    expert_cfg.hidden_size = 48
    expert_cfg.intermediate_size = 96
    expert_cfg.head_dim = 128
    vlm.action_expert_config = expert_cfg
    vlm.action_expert = Qwen2ForCausalLM(expert_cfg)
    vlm.action_expert.model.embed_tokens = None
    vlm.action_in_proj = None
    vlm.action_time_mlp_in = None
    vlm.action_time_mlp_out = None
    vlm.action_out_proj = None
    return vlm


def _ref_cfg():
    """Tiny analogue of config/eval/bridge_internvl_448.yaml."""
    mixture = CfgNode(
        vlm=CfgNode(hidden_size=64, intermediate_size=128, use_final_norm=False,
                    cache=True, use_quantize=False, use_lora=False,
                    adaptive_mode=None, rope_theta=1_000_000.0),
        proprio=CfgNode(hidden_size=48, intermediate_size=96,
                        use_final_norm=True, cache=True, use_quantize=False,
                        use_lora=False, adaptive_mode=None,
                        rope_theta=1_000_000.0),
        action=CfgNode(hidden_size=48, intermediate_size=96,
                       use_final_norm=True, cache=False, use_quantize=False,
                       use_lora=False, adaptive_mode=None,
                       rope_theta=1_000_000.0),
    )
    return CfgNode(
        vocab_size=VOCAB, pad_token_id=PAD_ID, image_token_index=IMG_TOKEN_ID,
        use_lm_head=True, integration_method="euler",
        max_image_text_tokens=S_TEXT, cond_steps=1, horizon_steps=4,
        num_inference_steps=4, action_dim=7, proprio_dim=7,
        final_action_clip_value=1.0, flow_sig_min=0.001,
        flow_sampling="beta", time_max_period=10_000.0, time_hidden_size=256,
        action_expert_adaptive_mode=None,
        pretrained_model_path="tiny-random", model_size="2B",
        mixture=mixture,
        vision=CfgNode(
            _target_="src.model.paligemma.siglip.SiglipVisionModel",
            config=CfgNode(hidden_size=16, intermediate_size=32,
                           num_hidden_layers=1, num_attention_heads=2,
                           num_channels=3, image_size=28, patch_size=14,
                           layer_norm_eps=1e-6, attention_dropout=0.0,
                           num_image_tokens=4),
        ),
        vision_projector=CfgNode(
            _target_="src.model.paligemma.siglip.PaliGemmaMultiModalProjector",
            config=CfgNode(vision_config=CfgNode(hidden_size=16,
                                                 projection_dim=16)),
        ),
        joint=CfgNode(
            _target_="src.model.vla.joint_model.JointModel",
            config=CfgNode(
                action_expert_adaptive_mode=None, time_hidden_size=256,
                mixture=mixture, lora=CfgNode(r=8, dropout=0.0),
                num_hidden_layers=2, num_attention_heads=2,
                num_key_value_heads=1, head_dim=128, rms_norm_eps=1e-6,
                attention_bias=False, attention_dropout=0.0,
                pad_token_id=PAD_ID,
            ),
        ),
    )


def _our_cfg() -> VLAConfig:
    llm = LLMConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=2, num_kv_heads=1, head_dim=128, rope_theta=1_000_000.0,
        attention_bias=True, tie_word_embeddings=False,
    )
    expert = LLMConfig(
        vocab_size=0, hidden_size=48, intermediate_size=96, num_layers=2,
        num_heads=2, num_kv_heads=1, head_dim=128, rope_theta=1_000_000.0,
        attention_bias=True, has_embed=False, has_lm_head=False,
    )
    return VLAConfig(
        vlm=VLMConfig(
            vision=VisionConfig(hidden_size=64, intermediate_size=128,
                                num_layers=2, num_heads=4, patch_size=14,
                                image_size=224, qkv_bias=True,
                                qk_normalization=True, norm_type="layer_norm"),
            llm=llm, img_context_token_id=IMG_TOKEN_ID, pad_token_id=PAD_ID,
        ),
        expert=expert, max_image_text_tokens=S_TEXT, cond_steps=1,
        horizon_steps=4, action_dim=7, proprio_dim=7, num_inference_steps=4,
        final_action_clip_value=1.0, use_lm_head=True,
    )


@pytest.fixture(scope="module")
def vla_pair():
    if not os.path.isdir(SIMPLER) or not os.path.isdir(INTERNVL_CHAT):
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")
    from conftest import install_reference_stubs

    install_reference_stubs()
    _install_stub_modules(torch)
    os.environ["INTERNVL"] = "1"  # joint_model.py:723 selects the internvl path
    for path in (INTERNVL_CHAT, SIMPLER):
        if path not in sys.path:
            sys.path.insert(0, path)
    try:
        pz_mod = importlib.import_module("src.model.vla.pizero_internvl")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference VLA import failed: {e}")

    orig = pz_mod.get_internvl3
    pz_mod.get_internvl3 = lambda *a, **k: _tiny_ref_internvl(torch)
    try:
        torch.manual_seed(11)
        ref = pz_mod.PiZero(_ref_cfg()).eval().float()
    finally:
        pz_mod.get_internvl3 = orig

    import jax

    from vlaser_tpu.policy.pizero import PiZeroVLA

    cfg = _our_cfg()
    ours = PiZeroVLA(cfg, param_dtype=jnp.float32, compute_dtype=jnp.float32,
                     attn_impl="reference")
    params = hf_convert.convert_pizero_internvl(ref.state_dict(), 2, 2)
    params = jax.tree.map(jnp.asarray, params)

    # shared inputs: trailing-padded text, one 224px tile per sample
    B = 2
    g = torch.Generator().manual_seed(3)
    ids = torch.randint(5, VOCAB - 10, (B, S_TEXT), generator=g)
    ids[:, 2 : 2 + N_IMG_TOK] = IMG_TOKEN_ID
    text_mask = torch.ones(B, S_TEXT, dtype=torch.long)
    text_mask[0, -6:] = 0
    text_mask[1, -2:] = 0
    ids = ids * text_mask  # pad ids -> 0 like the reference collator
    ids[:, 2 : 2 + N_IMG_TOK] = IMG_TOKEN_ID
    px = torch.randn(B, 3, 224, 224, generator=g)
    proprios = torch.randn(B, 1, 7, generator=g)
    actions = torch.randn(B, 4, 7, generator=g)
    t = torch.tensor([0.3, 0.8])
    return dict(torch=torch, ref=ref, ours=ours, params=params, cfg=cfg,
                ids=ids, text_mask=text_mask, px=px, proprios=proprios,
                actions=actions, t=t)


def _jnp_inputs(d):
    to = lambda x: jnp.asarray(x.numpy())
    return (
        to(d["ids"]),
        jnp.asarray(d["px"].numpy().transpose(0, 2, 3, 1)),
        to(d["text_mask"]).astype(jnp.int32),
        to(d["proprios"]),
    )


def test_flow_loss_golden(vla_pair):
    """Flow-matching training loss (pizero_internvl.py:1064-1197)."""
    d = vla_pair
    torch, ref = d["torch"], d["ref"]
    causal_mask, vlm_pos, prop_pos, act_pos = (
        ref.build_causal_mask_and_position_ids(d["text_mask"], torch.float32)
    )
    torch.manual_seed(123)
    x0 = torch.randn(2, 4, 7)
    torch.manual_seed(123)  # forward redraws the same noise internally
    with torch.no_grad():
        want = ref(
            d["ids"], d["px"], causal_mask, vlm_pos, prop_pos, act_pos,
            d["proprios"], d["actions"], d["t"],
        ).item()

    ids, px, mask, proprios = _jnp_inputs(d)
    got = float(
        d["ours"].apply(
            {"params": d["params"]}, ids, px, mask, proprios,
            jnp.asarray(d["actions"].numpy()), jnp.asarray(d["t"].numpy()),
            jnp.asarray(x0.numpy()),
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_infer_action_golden(vla_pair):
    """Cached denoise loop — KV-cache mode 'append_non_active'
    (pizero_internvl.py:798-936)."""
    d = vla_pair
    torch, ref = d["torch"], d["ref"]
    causal_mask, vlm_pos, prop_pos, act_pos = (
        ref.build_causal_mask_and_position_ids(d["text_mask"], torch.float32)
    )
    itp_mask, act_mask = ref.split_full_mask_into_submasks(causal_mask)
    torch.manual_seed(77)
    noise = torch.randn(2, 4, 7)
    torch.manual_seed(77)
    with torch.no_grad():
        want = ref.infer_action(
            d["ids"], d["px"], itp_mask, act_mask, vlm_pos, prop_pos, act_pos,
            d["proprios"],
        ).numpy()

    ids, px, mask, proprios = _jnp_inputs(d)
    got = np.asarray(
        d["ours"].apply(
            {"params": d["params"]}, ids, px, mask, proprios,
            jnp.asarray(noise.numpy()), method=d["ours"].infer_action,
        )
    )
    assert got.shape == want.shape == (2, 4, 7)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-4)


def test_infer_action_naive_golden(vla_pair):
    """No-cache denoise oracle — KV-cache mode 'no_append'
    (pizero_internvl.py:938-1003). The reference's own infer_action_naive was
    never wired for the internvl backbone (it omits position_embeddings_all,
    KeyError at joint_model.py:549), so this replays its exact loop body with
    the internvl rotary plumbing that infer_action (:854-876) uses."""
    d = vla_pair
    torch, ref = d["torch"], d["ref"]
    causal_mask, vlm_pos, prop_pos, act_pos = (
        ref.build_causal_mask_and_position_ids(d["text_mask"], torch.float32)
    )
    torch.manual_seed(78)
    noise = torch.randn(2, 4, 7)
    with torch.no_grad():
        kv_caches = ref.joint_model.build_mixture_caches()
        inputs_embeds = ref._forward_siglip_and_text_embedding(
            d["ids"], d["px"]
        )
        proprio_embeds = ref.proprio_encoder(d["proprios"])
        rot_vlm = ref.internvl_model.language_model.model.rotary_emb
        rot_exp = ref.internvl_model.action_expert.model.rotary_emb
        pe_vlm = rot_vlm(inputs_embeds, vlm_pos)
        pe_prop = rot_exp(proprio_embeds, prop_pos)
        action = noise.clone()
        delta_t = 1.0 / 4
        t = torch.zeros(2)
        for _ in range(4):
            time_cond = ref.time_embedding(t)
            action_embeds = ref.action_encoder(action, time_cond)
            pe_act = rot_exp(action_embeds, act_pos)
            action_embeds = ref.joint_model(
                attention_mask=causal_mask,
                position_ids_all={"vlm": vlm_pos, "proprio": prop_pos,
                                  "action": act_pos},
                embeds_all={"vlm": inputs_embeds.clone(),
                            "proprio": proprio_embeds.clone(),
                            "action": action_embeds},
                time_cond=time_cond, kv_caches=kv_caches,
                position_embeddings_all={"vlm": pe_vlm, "proprio": pe_prop,
                                         "action": pe_act},
                cache_mode="no_append",
            )["action"]
            action = action + delta_t * ref.action_decoder(action_embeds)
            t = t + delta_t
        want = torch.clamp(action, -1.0, 1.0).numpy()

    ids, px, mask, proprios = _jnp_inputs(d)
    got = np.asarray(
        d["ours"].apply(
            {"params": d["params"]}, ids, px, mask, proprios,
            jnp.asarray(noise.numpy()), method=d["ours"].infer_action_naive,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-4)


def test_infer_text_prefill_golden(vla_pair):
    """Text prefill logits — KV-cache mode 'append'
    (pizero_internvl.py:1005-1046). No padding (the reference asserts its
    cached-text path is padding-free)."""
    d = vla_pair
    torch, ref = d["torch"], d["ref"]
    sys.path.insert(0, SIMPLER)
    from src.model.kv_cache import KVCache

    mask = torch.ones(2, S_TEXT, dtype=torch.long)
    # pad-free ids: the reference zero-embeds pad-id tokens unconditionally
    # (pizero_internvl.py:764-768), which only matches under real masking
    ids_t = torch.where(d["ids"] == PAD_ID, torch.tensor(7), d["ids"])
    with torch.no_grad():
        out = ref.infer_text(ids_t, d["px"], mask, kv_cache=KVCache())
    want = out["logits"].numpy()
    # cache was filled for every layer of the vlm mixture
    assert out["kv_cache"].num_items() == S_TEXT

    _, px, _, _ = _jnp_inputs(d)
    got = np.asarray(
        d["ours"].apply(
            {"params": d["params"]}, jnp.asarray(ids_t.numpy()), px,
            jnp.ones((2, S_TEXT), jnp.int32), method=d["ours"].forward_vlm,
        )
    )
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_openloop_episode_parity(vla_pair):
    """Synthetic open-loop episode parity (SURVEY §7 step 5's closest
    available proxy without checkpoints/sims): a 3-step episode of raw
    uint8 frames + evolving proprio runs through the FULL serving chain —
    adapter preprocess (envs/adapters.py, the simpler.py:65-177 semantics)
    -> processor -> policy infer_action -> adapter postprocess — with the
    reference torch PiZero and our PiZeroVLA as the policy, same noise.
    The env-space action trajectories must match."""
    d = vla_pair
    torch, ref, ours, params = d["torch"], d["ref"], d["ours"], d["params"]

    from test_eval import STATS

    from vlaser_tpu.envs.adapters import BridgeSimplerAdapter
    from vlaser_tpu.image.tiling import normalize_uint8
    from vlaser_tpu.policy.processing import InternVLAProcessor

    class Tok:
        """Toy tokenizer emitting the golden pair's img id; merges the fixed
        chat scaffold into single tokens (as a trained BPE would) so the
        64-image-token prompt fits the fixture's 80-token budget."""

        pad_token_id = PAD_ID
        SPECIALS = [
            ("<|im_start|>system\nNone<|im_end|>\n<|im_start|>user\n", 10),
            ("<|im_end|>\n<|im_start|>assistant\n", 11),
            ("<IMG_CONTEXT>", IMG_TOKEN_ID),
            ("<img>", 12),
            ("</img>", 13),
        ]

        def __call__(self, text, add_special_tokens=False, **kw):
            ids, i = [], 0
            while i < len(text):
                for pat, tid in self.SPECIALS:
                    if text.startswith(pat, i):
                        ids.append(tid)
                        i += len(pat)
                        break
                else:
                    tok = 20 + ord(text[i]) % 270
                    ids.append(tok + 1 if tok == IMG_TOKEN_ID else tok)
                    i += 1
            return {"input_ids": ids}

    rng = np.random.default_rng(5)
    proc = InternVLAProcessor(Tok(), num_image_tokens=N_IMG_TOK,
                              max_seq_len=S_TEXT, pad_token_id=PAD_ID)
    pout = proc(["stack cube"], np.zeros((1, 1, 224, 224, 3), np.uint8))
    assert int((np.asarray(pout["input_ids"]) == IMG_TOKEN_ID).sum()) == N_IMG_TOK
    ids_np = np.asarray(pout["input_ids"])
    mask_np = np.asarray(pout["attention_mask"])

    adapters = [
        BridgeSimplerAdapter(dataset_statistics=STATS, image_size=(224, 224))
        for _ in range(2)
    ]
    trajs = [[], []]
    eef = np.array([0.1, 0.0, 0.2, 0.0, 0.0, 0.0, 1.0, 0.6], np.float32)
    for step in range(3):
        frame = rng.integers(0, 255, (64, 48, 3), np.uint8)
        obs = {"agent": {"eef_pos": eef + 0.01 * step}}
        noise = rng.standard_normal((1, 4, 7)).astype(np.float32)

        for side in (0, 1):
            pre = adapters[side].preprocess(obs, frame)
            pixels = normalize_uint8(pre["image"][None]).astype(np.float32)
            proprios = pre["proprio"][None, None].astype(np.float32)
            if side == 0:  # ours
                chunk = np.asarray(
                    ours.apply(
                        {"params": params}, jnp.asarray(ids_np),
                        jnp.asarray(pixels), jnp.asarray(mask_np),
                        jnp.asarray(proprios), jnp.asarray(noise),
                        method=ours.infer_action,
                    )
                )[0]
            else:  # reference torch
                tmask = torch.from_numpy(mask_np.astype(np.int64))
                cm, vp, pp, ap = ref.build_causal_mask_and_position_ids(
                    tmask, torch.float32
                )
                itp, am = ref.split_full_mask_into_submasks(cm)

                class _FixedNoise:
                    def __enter__(self):
                        self._orig = torch.randn
                        torch.randn = lambda *a, **k: torch.from_numpy(noise)
                        return self

                    def __exit__(self, *a):
                        torch.randn = self._orig

                with torch.no_grad(), _FixedNoise():
                    chunk = ref.infer_action(
                        torch.from_numpy(ids_np.astype(np.int64)),
                        torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
                        itp, am, vp, pp, ap,
                        torch.from_numpy(proprios),
                    )[0].numpy()
            trajs[side].append(adapters[side].postprocess(chunk))

    for a, b in zip(trajs[0], trajs[1]):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_qwen3_vla_golden():
    """InternVL3.5-style VLA: Qwen3 mixtures (per-head q/k RMSNorm) through
    the reference's own 'Qwen3' joint-model branch (joint_model.py:449-452,
    573-576, 657-669) vs our qk_norm joint — flow loss + cached
    infer_action at fp32."""
    if not os.path.isdir(SIMPLER) or not os.path.isdir(INTERNVL_CHAT):
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")
    from conftest import install_reference_stubs

    install_reference_stubs()
    _install_stub_modules(torch)
    os.environ["INTERNVL"] = "1"
    for path in (INTERNVL_CHAT, SIMPLER):
        if path not in sys.path:
            sys.path.insert(0, path)
    pz_mod = importlib.import_module("src.model.vla.pizero_internvl")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    def qwen3_internvl(*a, **k):
        vlm = _tiny_ref_internvl(torch)  # vision + mlp1 from the chat model
        q3 = Qwen3Config(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=1, head_dim=128, rope_theta=1_000_000.0,
            tie_word_embeddings=False, attention_bias=False,
            attn_implementation="eager",
        )
        torch.manual_seed(17)
        vlm.language_model = Qwen3ForCausalLM(q3).eval().float()
        expert_cfg = copy.deepcopy(q3)
        expert_cfg.hidden_size = 48
        expert_cfg.intermediate_size = 96
        vlm.action_expert = Qwen3ForCausalLM(expert_cfg).eval().float()
        vlm.action_expert.model.embed_tokens = None
        return vlm

    orig = pz_mod.get_internvl3
    pz_mod.get_internvl3 = qwen3_internvl
    try:
        torch.manual_seed(18)
        ref = pz_mod.PiZero(_ref_cfg()).eval().float()
    finally:
        pz_mod.get_internvl3 = orig

    import dataclasses

    import jax

    from vlaser_tpu.policy.pizero import PiZeroVLA

    base = _our_cfg()
    cfg = dataclasses.replace(
        base,
        vlm=dataclasses.replace(
            base.vlm,
            llm=dataclasses.replace(base.vlm.llm, qk_norm=True,
                                    attention_bias=False),
        ),
        expert=dataclasses.replace(base.expert, qk_norm=True,
                                   attention_bias=False),
    )
    ours = PiZeroVLA(cfg, param_dtype=jnp.float32, compute_dtype=jnp.float32,
                     attn_impl="reference")
    params = hf_convert.convert_pizero_internvl(ref.state_dict(), 2, 2)
    params = jax.tree.map(jnp.asarray, params)

    B = 2
    g = torch.Generator().manual_seed(19)
    ids = torch.randint(5, VOCAB - 10, (B, S_TEXT), generator=g)
    ids[:, 2 : 2 + N_IMG_TOK] = IMG_TOKEN_ID
    text_mask = torch.ones(B, S_TEXT, dtype=torch.long)
    text_mask[0, -5:] = 0
    ids = ids * text_mask
    ids[:, 2 : 2 + N_IMG_TOK] = IMG_TOKEN_ID
    px = torch.randn(B, 3, 224, 224, generator=g)
    proprios = torch.randn(B, 1, 7, generator=g)
    actions = torch.randn(B, 4, 7, generator=g)
    t = torch.tensor([0.25, 0.7])

    causal_mask, vlm_pos, prop_pos, act_pos = (
        ref.build_causal_mask_and_position_ids(text_mask, torch.float32)
    )
    torch.manual_seed(20)
    x0 = torch.randn(B, 4, 7)
    torch.manual_seed(20)
    with torch.no_grad():
        loss_want = ref(ids, px, causal_mask, vlm_pos, prop_pos, act_pos,
                        proprios, actions, t).item()
    to = lambda x: jnp.asarray(x.numpy())
    jargs = (to(ids), jnp.asarray(px.numpy().transpose(0, 2, 3, 1)),
             to(text_mask).astype(jnp.int32), to(proprios))
    loss_got = float(
        ours.apply({"params": params}, *jargs, to(actions), to(t), to(x0))
    )
    np.testing.assert_allclose(loss_got, loss_want, rtol=2e-4)

    itp_mask, act_mask = ref.split_full_mask_into_submasks(causal_mask)
    torch.manual_seed(22)
    noise = torch.randn(B, 4, 7)
    torch.manual_seed(22)
    with torch.no_grad():
        want = ref.infer_action(ids, px, itp_mask, act_mask, vlm_pos,
                                prop_pos, act_pos, proprios).numpy()
    got = np.asarray(
        ours.apply({"params": params}, *jargs, to(noise),
                   method=ours.infer_action)
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-4)


def test_infer_text_cached_decode_golden(vla_pair):
    """Multi-step cached greedy decode: the reference's infer_text is
    re-invoked one token at a time against its KVCache (cache_mode
    'append', pad-free); our jitted infer_text (prefill + scan over the
    fixed buffers) must emit the same greedy tokens."""
    d = vla_pair
    torch, ref = d["torch"], d["ref"]
    sys.path.insert(0, SIMPLER)
    from src.model.kv_cache import KVCache

    NEW = 6
    mask = torch.ones(2, S_TEXT, dtype=torch.long)
    ids_t = torch.where(d["ids"] == PAD_ID, torch.tensor(7), d["ids"])

    kv = KVCache()
    with torch.no_grad():
        out = ref.infer_text(ids_t, d["px"], mask, kv_cache=kv)
        tok = out["logits"][:, -1].argmax(-1)
        ref_tokens = [tok]
        am = mask
        # the reference's decode step is broken as shipped: its embedding
        # helper unconditionally runs the vision tower and scatters image
        # features (pizero_internvl.py:769-791 crashes for a 1-token step
        # with or without pixels). With no image tokens the helper reduces
        # to the token-embedding lookup — shim exactly that for the steps.
        orig_embed = ref._forward_siglip_and_text_embedding
        ref._forward_siglip_and_text_embedding = (
            lambda input_ids, pixel_values: ref.embed_tokens(input_ids)
        )
        try:
            for _ in range(NEW - 1):
                am = torch.cat([am, torch.ones(2, 1, dtype=torch.long)],
                               dim=1)
                out = ref.infer_text(tok[:, None], d["px"], am,
                                     kv_cache=out["kv_cache"])
                tok = out["logits"][:, -1].argmax(-1)
                ref_tokens.append(tok)
        finally:
            ref._forward_siglip_and_text_embedding = orig_embed
    want = torch.stack(ref_tokens, dim=1).numpy()

    _, px, _, _ = _jnp_inputs(d)
    got = np.asarray(
        d["ours"].apply(
            {"params": d["params"]}, jnp.asarray(ids_t.numpy()), px,
            jnp.ones((2, S_TEXT), jnp.int32), NEW, -1,
            method=d["ours"].infer_text,
        )
    )
    np.testing.assert_array_equal(got[:, :NEW], want)
