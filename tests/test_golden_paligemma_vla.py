"""Golden parity of the PaliGemma VLA variant against the REFERENCE'S OWN
torch code (src/model/vla/pizero.py — the open-pi-zero original: SigLIP
tower + single-linear projector + Gemma mixtures with sqrt(hidden) embed
scaling and tanh-softclamp-50 attention).

Complements tests/test_golden_vla_vs_reference.py (the InternVL flagship):
same import-and-convert technique, default (non-INTERNVL) joint path.
Covers: flow-matching loss (pizero.py:631-687), cached infer_action
(pizero.py:435-512, KV mode 'append_non_active').
"""

import importlib
import importlib.machinery
import os
import sys
import types

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vlaser_tpu.core.config import (  # noqa: E402
    LLMConfig, SiglipConfig, VLAConfig, VLMConfig, tiny_vision,
)
from vlaser_tpu.utils import hf_convert  # noqa: E402

SIMPLER = "/root/reference/Vlaser_VLA/Simpler"

IMG_TOKEN_ID = 500
PAD_ID = 0
VOCAB = 512
S_TEXT = 12
N_IMG_TOK = 4  # (28/14)^2 tiny SigLIP tokens


class CfgNode(dict):
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


def _install_stubs(torch):
    # reuse the VLA golden test's hydra/omegaconf/bitsandbytes shims
    from test_golden_vla_vs_reference import _install_stub_modules

    _install_stub_modules(torch)
    # timm.data.constants (pizero.py:25-31) — ImageNet/CLIP stats only
    if "timm.data" not in sys.modules:
        data = _mkmod("timm.data")
        const = _mkmod("timm.data.constants")
        const.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
        const.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
        const.IMAGENET_STANDARD_MEAN = (0.5, 0.5, 0.5)
        const.IMAGENET_STANDARD_STD = (0.5, 0.5, 0.5)
        const.OPENAI_CLIP_MEAN = (0.481, 0.458, 0.408)
        const.OPENAI_CLIP_STD = (0.269, 0.261, 0.276)
        import timm

        timm.data = data
        data.constants = const
        sys.modules.update({"timm.data": data, "timm.data.constants": const})


def _ref_cfg():
    """Tiny analogue of config/train/bridge.yaml (paligemma backbone)."""
    mixture = CfgNode(
        vlm=CfgNode(hidden_size=64, intermediate_size=128,
                    use_final_norm=False, cache=True, use_quantize=False,
                    use_lora=False, adaptive_mode=None, rope_theta=10_000.0),
        proprio=CfgNode(hidden_size=32, intermediate_size=64,
                        use_final_norm=True, cache=True, use_quantize=False,
                        use_lora=False, adaptive_mode=None,
                        rope_theta=10_000.0),
        action=CfgNode(hidden_size=32, intermediate_size=64,
                       use_final_norm=True, cache=False, use_quantize=False,
                       use_lora=False, adaptive_mode=None,
                       rope_theta=10_000.0),
    )
    return CfgNode(
        vocab_size=VOCAB, pad_token_id=PAD_ID, image_token_index=IMG_TOKEN_ID,
        use_lm_head=False,
        max_image_text_tokens=S_TEXT, cond_steps=1, horizon_steps=4,
        num_inference_steps=4, action_dim=7, proprio_dim=7,
        final_action_clip_value=1.0, flow_sig_min=0.001,
        flow_sampling="beta", time_max_period=10_000.0, time_hidden_size=256,
        action_expert_adaptive_mode=None,
        pretrained_model_path="tiny-random",
        mixture=mixture,
        vision=CfgNode(
            _target_="src.model.paligemma.siglip.SiglipVisionModel",
            config=CfgNode(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           num_channels=3, image_size=28, patch_size=14,
                           layer_norm_eps=1e-6, attention_dropout=0.0,
                           num_image_tokens=N_IMG_TOK),
        ),
        vision_projector=CfgNode(
            _target_="src.model.paligemma.siglip.PaliGemmaMultiModalProjector",
            config=CfgNode(vision_config=CfgNode(hidden_size=32,
                                                 projection_dim=64)),
        ),
        joint=CfgNode(
            _target_="src.model.vla.joint_model.JointModel",
            config=CfgNode(
                action_expert_adaptive_mode=None, time_hidden_size=256,
                mixture=mixture, lora=CfgNode(r=8, dropout=0.0),
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=1, head_dim=16, rms_norm_eps=1e-6,
                attention_bias=False, attention_dropout=0.0,
                pad_token_id=PAD_ID,
            ),
        ),
    )


def _our_cfg() -> VLAConfig:
    vlm_llm = LLMConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=1, head_dim=16, rope_theta=10_000.0,
        attention_bias=False, tie_word_embeddings=True, mlp_act="gelu_tanh",
        rms_plus_one=True, embed_scale=True, attn_softcap=50.0,
    )
    expert = LLMConfig(
        vocab_size=0, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=1, head_dim=16, rope_theta=10_000.0,
        attention_bias=False, has_embed=False, has_lm_head=False,
        mlp_act="gelu_tanh", rms_plus_one=True,
    )
    return VLAConfig(
        vlm=VLMConfig(vision=tiny_vision(), llm=vlm_llm,
                      img_context_token_id=IMG_TOKEN_ID, pad_token_id=PAD_ID),
        expert=expert, max_image_text_tokens=S_TEXT, cond_steps=1,
        horizon_steps=4, action_dim=7, proprio_dim=7, num_inference_steps=4,
        final_action_clip_value=1.0, backbone="paligemma",
        siglip=SiglipConfig(hidden_size=32, intermediate_size=64,
                            num_layers=2, num_heads=4, patch_size=14,
                            image_size=28),
    )


@pytest.fixture(scope="module")
def pali_pair():
    if not os.path.isdir(SIMPLER):
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from conftest import install_reference_stubs

    install_reference_stubs()
    _install_stubs(torch)
    if SIMPLER not in sys.path:
        sys.path.insert(0, SIMPLER)
    # the default (Gemma) joint path must NOT see the INTERNVL env flag the
    # sibling golden module sets (joint_model.py:723 reads it per instance)
    had = os.environ.pop("INTERNVL", None)
    try:
        pz_mod = importlib.import_module("src.model.vla.pizero")
        jm_mod = importlib.import_module("src.model.vla.joint_model")
        # the reference's default (Gemma) path is broken as shipped:
        # JointModel.forward passes the internvl-only `use_flash_attention`
        # kwarg into forward_mixture_layers (joint_model.py:780 vs :28-42 —
        # they only ever ran the INTERNVL branch). Shim it back to the
        # intended call; no numerical behavior is involved.
        orig_fml = jm_mod.forward_mixture_layers

        def fml(*args, **kwargs):
            kwargs.pop("use_flash_attention", None)
            return orig_fml(*args, **kwargs)

        jm_mod.forward_mixture_layers = fml
        torch.manual_seed(21)
        ref = pz_mod.PiZero(_ref_cfg()).eval().float()
        # the reference's TrainAgent/EvalAgent always tie the proprio
        # mixture to the action mixture (pizero.py:275-277; our expert is
        # the single tied mixture)
        ref.tie_action_proprio_weights()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference paligemma VLA import failed: {e}")
    finally:
        if had is not None:
            os.environ["INTERNVL"] = had

    import jax

    from vlaser_tpu.policy.pizero import PiZeroVLA

    cfg = _our_cfg()
    ours = PiZeroVLA(cfg, param_dtype=jnp.float32, compute_dtype=jnp.float32,
                     attn_impl="reference")
    params = hf_convert.convert_pizero_paligemma(ref.state_dict(), 2, 2)
    params = jax.tree.map(jnp.asarray, params)

    B = 2
    g = torch.Generator().manual_seed(5)
    ids = torch.randint(5, VOCAB - 10, (B, S_TEXT), generator=g)
    ids[:, :N_IMG_TOK] = IMG_TOKEN_ID  # paligemma prompt: image tokens first
    text_mask = torch.ones(B, S_TEXT, dtype=torch.long)
    text_mask[0, -3:] = 0
    text_mask[1, -1:] = 0
    ids = ids * text_mask
    ids[:, :N_IMG_TOK] = IMG_TOKEN_ID
    px = torch.randn(B, 3, 28, 28, generator=g)
    proprios = torch.randn(B, 1, 7, generator=g)
    actions = torch.randn(B, 4, 7, generator=g)
    t = torch.tensor([0.25, 0.6])
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


def test_paligemma_flow_loss_golden(pali_pair):
    """Flow-matching loss through SigLIP + Gemma mixtures
    (pizero.py:631-687)."""
    d = pali_pair
    torch, ref = d["torch"], d["ref"]
    causal_mask, vlm_pos, prop_pos, act_pos = (
        ref.build_causal_mask_and_position_ids(d["text_mask"], torch.float32)
    )
    torch.manual_seed(321)
    x0 = torch.randn(2, 4, 7)
    torch.manual_seed(321)  # forward redraws the same noise internally
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


def test_paligemma_infer_action_golden(pali_pair):
    """Cached denoise loop, KV mode 'append_non_active'
    (pizero.py:435-512)."""
    d = pali_pair
    torch, ref = d["torch"], d["ref"]
    causal_mask, vlm_pos, prop_pos, act_pos = (
        ref.build_causal_mask_and_position_ids(d["text_mask"], torch.float32)
    )
    itp_mask, act_mask = ref.split_full_mask_into_submasks(causal_mask)
    torch.manual_seed(177)
    noise = torch.randn(2, 4, 7)
    torch.manual_seed(177)
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
