"""Single typed config tree for the whole framework.

The reference scatters configuration across four systems (HF dataclasses, hydra
yamls, plain OmegaConf, and env-var model flags — SURVEY.md §5 "Config / flag
system"). Here every model/trainer takes one frozen dataclass; behavioral
env-vars of the reference (INTERNVL, IMAGE_448, NO_CAUSAL_IMG, ...) become
explicit fields.

Reference hyperparameters cited per field come from:
- InternViT: /root/reference Vlaser_VLM/internvl_chat/internvl/model/internvl_chat/
  configuration_intern_vit.py:63-90
- VLM wrapper: configuration_internvl_chat.py:24-76
- VLA mixtures: Vlaser_VLA/Simpler/config/eval/bridge_internvl_448.yaml and
  src/model/vla/pizero_internvl.py:117-141 (action expert dims)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


@dataclass(frozen=True)
class VisionConfig:
    """InternViT-style vision transformer."""

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    patch_size: int = 14
    image_size: int = 448
    qkv_bias: bool = True
    qk_normalization: bool = False  # RMSNorm over the flattened (H*D) dim when on
    norm_type: str = "layer_norm"  # 'layer_norm' (300M) | 'rms_norm' (6B)
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu"
    initializer_factor: float = 0.1  # layer-scale init
    drop_path_rate: float = 0.0
    use_cls_token: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        n = self.num_patches_per_side**2
        return n + 1 if self.use_cls_token else n


@dataclass(frozen=True)
class LLMConfig:
    """Qwen2.5-style causal LM (also reused for the 768-wide action expert)."""

    vocab_size: int = 151936
    hidden_size: int = 1536
    intermediate_size: int = 8960
    num_layers: int = 28
    num_heads: int = 12
    num_kv_heads: int = 2
    head_dim: int = 128  # NOT hidden_size // num_heads for the action expert
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = False
    attention_bias: bool = True  # Qwen2: q/k/v bias, no o bias
    # Qwen3 (InternVL3.5 backbone): per-head RMSNorm on q/k before rope,
    # no qkv bias (pizero_internvl.py:63-65 'InternVL3_5' branch,
    # joint_model.py:449-452)
    qk_norm: bool = False
    has_embed: bool = True  # action expert has no token embedding
    has_lm_head: bool = True
    # Gemma-family options (PaliGemma VLA variant; src/model/paligemma/)
    mlp_act: str = "silu"  # 'silu' (Qwen2/Llama) | 'gelu_tanh' (Gemma)
    rms_plus_one: bool = False  # Gemma RMSNorm scales by (1 + weight)
    embed_scale: bool = False  # Gemma multiplies embeddings by sqrt(hidden)
    attn_softcap: Optional[float] = None  # tanh soft-clamp on logits (50.0)
    # sliding-window attention (qwen2_packed_training_patch.py:70-96 passes
    # window_size=(config.sliding_window,)*2 to flash_attn_varlen_func when
    # the recipe enables it; Qwen2.5-2B ships with it disabled). Applied
    # uniformly to all layers when set (the scanned stack is homogeneous;
    # the reference's max_window_layers gating is a per-layer variant of the
    # same mask).
    sliding_window: Optional[int] = None
    query_pre_attn_scalar: Optional[float] = None  # Gemma scale override
    # Phi3 su/longrope scaling (modeling_phi3.py:139-178): per-frequency
    # extension factors, hashable tuples (head_dim/2 entries each)
    rope_short_factor: Optional[Tuple[float, ...]] = None
    rope_long_factor: Optional[Tuple[float, ...]] = None
    original_max_position: Optional[int] = None
    # context parallelism: shard the training sequence dim over this mesh
    # axis and run ring attention (kernels/ring_attention.py). A capability
    # the reference does NOT have (SURVEY.md §5: no ring/CP/Ulysses
    # anywhere); scales max_seq beyond one chip's activation memory.
    context_parallel_axis: Optional[str] = None
    # sparse MoE MLP (Qwen3-MoE / InternVL3.5 MoE tiers; models/moe.py).
    # num_experts=0 keeps the dense MLP. The reference is dense-only.
    num_experts: int = 0
    num_experts_per_tok: int = 8
    moe_intermediate_size: Optional[int] = None
    norm_topk_prob: bool = True
    # None = lossless dispatch (C=T, HF parity); ~1.25 at training scale
    moe_capacity_factor: Optional[float] = None

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


@dataclass(frozen=True)
class VLMConfig:
    """InternVL-chat-style fusion of vision encoder + LLM.

    Parity surface: modeling_internvl_chat.py:39-141 (mlp1, pixel-shuffle,
    num_image_token) and chat template wiring (:343-398).
    """

    vision: VisionConfig = field(default_factory=VisionConfig)
    llm: LLMConfig = field(default_factory=LLMConfig)
    downsample_ratio: float = 0.5
    ps_version: str = "v2"
    select_layer: int = -1
    template: str = "internvl2_5"
    # dynamic tiling (dataset.py:813-866)
    dynamic_image_size: bool = True
    use_thumbnail: bool = True
    min_dynamic_patch: int = 1
    max_dynamic_patch: int = 12
    # special token ids (set after tokenizer extension; Vlaser-2B values:
    # config/eval/bridge_internvl_448.yaml:44-50)
    img_context_token_id: int = 151667
    img_start_token_id: int = 151665
    img_end_token_id: int = 151666
    pad_token_id: int = 151643

    @property
    def num_image_token(self) -> int:
        """Tokens per 448px tile after pixel-shuffle: (448/14)^2 * 0.25 = 256."""
        v = self.vision
        return int((v.image_size // v.patch_size) ** 2 * (self.downsample_ratio**2))

    @property
    def vit_proj_in_dim(self) -> int:
        return self.vision.hidden_size * int(1 / self.downsample_ratio) ** 2


@dataclass(frozen=True)
class VLAConfig:
    """PiZero-style flow-matching VLA: VLM mixture + proprio/action expert.

    Parity surface: pizero_internvl.py:154-330 (construction), :517-604 (mask),
    :1064-1197 (flow loss), :798-936 (cached denoise loop).
    """

    vlm: VLMConfig = field(default_factory=VLMConfig)
    expert: LLMConfig = field(default_factory=LLMConfig)  # 768-wide action expert
    # sequence layout
    max_image_text_tokens: int = 384
    cond_steps: int = 1  # proprio history
    horizon_steps: int = 4
    action_dim: int = 7
    proprio_dim: int = 7
    # flow matching
    num_inference_steps: int = 10
    flow_sig_min: float = 0.001
    flow_alpha: float = 1.5  # Beta(alpha, beta) time sampling, s*(1-z)
    flow_beta: float = 1.0
    flow_t_max: float = 1.0 - 0.001
    final_action_clip_value: Optional[float] = 1.0
    time_max_period: float = 10_000.0
    # structure flags (reference env vars made explicit)
    causal_image_text: bool = False  # NO_CAUSAL_IMG / DEBUG_CAUSAL analogue
    # backbone family: 'internvl' (InternViT + pixel-shuffle + mlp1, Qwen2.5)
    # or 'paligemma' (SigLIP + linear projector + Gemma with sqrt(hidden)
    # embed scaling — src/model/vla/pizero.py)
    backbone: str = "internvl"
    siglip: Optional["SiglipConfig"] = None
    use_lm_head: bool = False  # optional text output (pizero_internvl.py:322)
    # adaLN ablation (pizero.py:86-102, modules.py:78-117): None | 'adaln' |
    # 'adaln_zero'. Time conditions the action tokens' norms instead of being
    # concatenated into the action encoder.
    adaptive_mode: Optional[str] = None
    time_hidden_size: int = 256
    # vision-in-expert (imgfeat) ablation (pizero_internvl_vision.py /
    # DEBUG_IMGFEAT, pizero_internvl.py:272-289, 769-789): a second trainable
    # vision tower + projector feeds num_image_token expert-width image
    # tokens ahead of proprio in the expert stream; the VLM-side image
    # features are stop-gradient. (Implements the NO_CAUSAL_IMG flavor:
    # expert image tokens attend each other non-causally.) Oracle-tested
    # only: a tiny golden vs the reference's DEBUG_IMGFEAT branch is
    # impossible by construction — pizero_internvl.py:273 hard-codes the
    # 1536->768 projector dims, so its imgfeat path cannot run at any
    # other width.
    vision_in_expert: bool = False

    @property
    def num_proprio_tokens(self) -> int:
        return 1  # reference hard-codes 1 (pizero_internvl.py:209)

    @property
    def num_action_tokens(self) -> int:
        return self.horizon_steps + self.cond_steps - 1

    @property
    def total_tokens(self) -> int:
        return (
            self.max_image_text_tokens
            + self.num_proprio_tokens
            + self.num_action_tokens
        )


# ---------------------------------------------------------------------------
# Named model configs
# ---------------------------------------------------------------------------


def internvit_300m(image_size: int = 448) -> VisionConfig:
    """InternViT-300M-448px as used by InternVL3-2B/8B."""
    return VisionConfig(
        hidden_size=1024,
        intermediate_size=4096,
        num_layers=24,
        num_heads=16,
        image_size=image_size,
        qkv_bias=True,
        qk_normalization=False,
        norm_type="layer_norm",
    )


def internvit_6b(image_size: int = 448) -> VisionConfig:
    return VisionConfig(
        hidden_size=3200,
        intermediate_size=12800,
        num_layers=45,
        num_heads=25,
        image_size=image_size,
        qkv_bias=False,
        qk_normalization=True,
        norm_type="rms_norm",
    )


def qwen2_5_1_5b(vocab_size: int = 151936) -> LLMConfig:
    return LLMConfig(
        vocab_size=vocab_size,
        hidden_size=1536,
        intermediate_size=8960,
        num_layers=28,
        num_heads=12,
        num_kv_heads=2,
        head_dim=128,
        rope_theta=1_000_000.0,
    )


def qwen3_1_7b(vocab_size: int = 151936) -> LLMConfig:
    """Qwen3-1.7B — the InternVL3.5-2B language backbone
    (pizero_internvl.py:63-65)."""
    return LLMConfig(
        vocab_size=vocab_size,
        hidden_size=2048,
        intermediate_size=6144,
        num_layers=28,
        num_heads=16,
        num_kv_heads=8,
        head_dim=128,
        rope_theta=1_000_000.0,
        attention_bias=False,
        qk_norm=True,
        tie_word_embeddings=True,
    )


def internvl3_5_2b(vocab_size: int = 151936) -> VLMConfig:
    """InternVL3.5-2B: InternViT-300M + Qwen3-1.7B (the reference's
    alternate pretrained_model_path in get_internvl3)."""
    return VLMConfig(vision=internvit_300m(), llm=qwen3_1_7b(vocab_size))


def qwen3_moe_30b_a3b(vocab_size: int = 151936) -> LLMConfig:
    """Qwen3-30B-A3B: the InternVL3.5 MoE language backbone (128 experts,
    top-8, 768-wide experts; models/moe.py). Dense reference has no MoE."""
    return LLMConfig(
        vocab_size=vocab_size,
        hidden_size=2048,
        intermediate_size=6144,  # unused on MoE layers
        num_layers=48,
        num_heads=32,
        num_kv_heads=4,
        head_dim=128,
        rope_theta=1_000_000.0,
        attention_bias=False,
        qk_norm=True,
        num_experts=128,
        num_experts_per_tok=8,
        moe_intermediate_size=768,
        norm_topk_prob=True,
        moe_capacity_factor=1.25,
    )


def internvl3_5_30b_a3b(vocab_size: int = 151936) -> VLMConfig:
    """InternVL3.5-30B-A3B: InternViT-300M + Qwen3-30B-A3B (MoE)."""
    return VLMConfig(vision=internvit_300m(), llm=qwen3_moe_30b_a3b(vocab_size))


def qwen2_5_7b(vocab_size: int = 151936) -> LLMConfig:
    return LLMConfig(
        vocab_size=vocab_size,
        hidden_size=3584,
        intermediate_size=18944,
        num_layers=28,
        num_heads=28,
        num_kv_heads=4,
        head_dim=128,
        rope_theta=1_000_000.0,
    )


def qwen2_5_32b(vocab_size: int = 151936) -> LLMConfig:
    """Qwen2.5-32B — the 34B-tier backbone (InternVL3-38B pairing). The
    reference ships ZeRO-3 configs for >=34B (zero_stage3_config*.json);
    here the tier is served by fsdp sharding plus the stage-axis pipeline
    (train/pipeline.py) per SURVEY §2.8's PP row."""
    return LLMConfig(
        vocab_size=vocab_size,
        hidden_size=5120,
        intermediate_size=27648,
        num_layers=64,
        num_heads=40,
        num_kv_heads=8,
        head_dim=128,
        rope_theta=1_000_000.0,
    )


def internvl3_38b(vocab_size: int = 151674) -> VLMConfig:
    """InternVL3-38B = InternViT-6B + Qwen2.5-32B (the >=34B tier whose
    DeepSpeed recipe is zero_stage3_config.json in the reference)."""
    return VLMConfig(vision=internvit_6b(), llm=qwen2_5_32b(vocab_size))


def qwen2_5_72b(vocab_size: int = 151936) -> LLMConfig:
    """Qwen2.5-72B — the 70B-tier backbone (InternVL3-78B pairing). The
    reference ships a dedicated ZeRO-3 recipe for this class
    (internvl_chat/zero_stage3_config_70b.json); here it is fsdp x stage
    sharding, fits asserted by tests/test_memory_budget.py."""
    return LLMConfig(
        vocab_size=vocab_size,
        hidden_size=8192,
        intermediate_size=29568,
        num_layers=80,
        num_heads=64,
        num_kv_heads=8,
        head_dim=128,
        rope_theta=1_000_000.0,
    )


def internvl3_78b(vocab_size: int = 151674) -> VLMConfig:
    """InternVL3-78B = InternViT-6B + Qwen2.5-72B (~78.4B params) — the
    tier the reference trains under zero_stage3_config_70b.json."""
    return VLMConfig(vision=internvit_6b(), llm=qwen2_5_72b(vocab_size))


def llm_100b_class(vocab_size: int = 151936) -> LLMConfig:
    """A ~100B dense decoder (hidden 10240, 72 layers) standing in for the
    class the reference provisions with zero_stage3_config_100b_*.json
    (incl. the _offload variant) — the reference ships the recipe without
    naming a checkpoint, so this preset pins the arithmetic the budget
    tests assert (utils/memory_budget.py offload_optimizer rows)."""
    return LLMConfig(
        vocab_size=vocab_size,
        hidden_size=10240,
        intermediate_size=35840,
        num_layers=72,
        num_heads=80,
        num_kv_heads=8,
        head_dim=128,
        rope_theta=1_000_000.0,
    )


def internvl_100b_class(vocab_size: int = 151674) -> VLMConfig:
    """InternViT-6B + the 100B-class decoder (~105B params total)."""
    return VLMConfig(vision=internvit_6b(), llm=llm_100b_class(vocab_size))


def action_expert_2b() -> LLMConfig:
    """768-wide expert sharing head layout with Qwen2.5-1.5B.

    pizero_internvl.py:123-127: hidden 768, intermediate 8960, head_dim 128;
    num_heads/num_kv_heads inherited from the 1.5B config (12 / 2).
    """
    return LLMConfig(
        vocab_size=0,
        hidden_size=768,
        intermediate_size=8960,
        num_layers=28,
        num_heads=12,
        num_kv_heads=2,
        head_dim=128,
        rope_theta=1_000_000.0,
        has_embed=False,
        has_lm_head=False,
    )


def action_expert_8b() -> LLMConfig:
    """pizero_internvl.py:132-134: hidden 768, intermediate 5600, head_dim 128."""
    return LLMConfig(
        vocab_size=0,
        hidden_size=768,
        intermediate_size=5600,
        num_layers=28,
        num_heads=28,
        num_kv_heads=4,
        head_dim=128,
        rope_theta=1_000_000.0,
        has_embed=False,
        has_lm_head=False,
    )


def vlaser_2b(vocab_size: int = 151674) -> VLMConfig:
    """Vlaser-2B = InternViT-300M + Qwen2.5-1.5B (+9 special tokens)."""
    return VLMConfig(vision=internvit_300m(), llm=qwen2_5_1_5b(vocab_size))


def vlaser_8b(vocab_size: int = 151674) -> VLMConfig:
    return VLMConfig(vision=internvit_300m(), llm=qwen2_5_7b(vocab_size))


def vlaser_2b_vla(vocab_size: int = 151674 + 256) -> VLAConfig:
    """Vlaser-2B-VLA: VLM mixture + 768-wide expert, bridge/fractal recipe.

    Dims: config/eval/bridge_internvl_448.yaml:44-125; 256 action tokens <a_i>
    appended to the vocab (pizero_internvl.py:47-49).
    """
    return VLAConfig(vlm=vlaser_2b(vocab_size), expert=action_expert_2b())


def gemma_2b() -> LLMConfig:
    """Gemma-2B as used by PaliGemma (src/model/paligemma/gemma.py)."""
    return LLMConfig(
        vocab_size=257216,
        hidden_size=2048,
        intermediate_size=16384,
        num_layers=18,
        num_heads=8,
        num_kv_heads=1,
        head_dim=256,
        rope_theta=10_000.0,
        attention_bias=False,
        tie_word_embeddings=True,
        mlp_act="gelu_tanh",
        rms_plus_one=True,
        embed_scale=True,
        # the Gemma joint path always tanh-softclamps attention logits at 50
        # (joint_model.py:368-371); the internvl path never does
        attn_softcap=50.0,
    )


def gemma_action_expert() -> LLMConfig:
    """open-pi-zero action expert: 1024-wide Gemma-style mixture
    (config/train/*.yaml mixture.action: hidden 1024, intermediate 4096)."""
    return LLMConfig(
        vocab_size=0,
        hidden_size=1024,
        intermediate_size=4096,
        num_layers=18,
        num_heads=8,
        num_kv_heads=1,
        head_dim=256,
        rope_theta=10_000.0,
        attention_bias=False,
        has_embed=False,
        has_lm_head=False,
        mlp_act="gelu_tanh",
        rms_plus_one=True,
    )


@dataclass(frozen=True)
class SiglipConfig:
    """SigLIP-So400m/14-224 vision tower (paligemma/siglip.py)."""

    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    patch_size: int = 14
    image_size: int = 224
    layer_norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def pizero_paligemma() -> VLAConfig:
    """open-pi-zero PaliGemma VLA (src/model/vla/pizero.py): SigLIP-So400m +
    Gemma-2B mixture + 1024-wide Gemma expert; image token 257152."""
    return VLAConfig(
        vlm=VLMConfig(
            vision=internvit_300m(),  # unused in the paligemma branch
            llm=gemma_2b(),
            img_context_token_id=257152,
            pad_token_id=0,
        ),
        expert=gemma_action_expert(),
        max_image_text_tokens=276,  # 256 image + 20 text (VLAProcessor)
        backbone="paligemma",
        siglip=SiglipConfig(),
    )


def tiny_siglip() -> "SiglipConfig":
    return SiglipConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                        num_heads=4, patch_size=14, image_size=28)


def tiny_gemma_llm() -> LLMConfig:
    return LLMConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=1, head_dim=16, rope_theta=10_000.0,
        attention_bias=False, tie_word_embeddings=True, mlp_act="gelu_tanh",
        rms_plus_one=True, embed_scale=True, attn_softcap=50.0,
    )


def tiny_paligemma_vla(max_image_text_tokens: int = 12) -> VLAConfig:
    return VLAConfig(
        vlm=VLMConfig(
            vision=tiny_vision(), llm=tiny_gemma_llm(),
            img_context_token_id=500, pad_token_id=0,
        ),
        expert=LLMConfig(
            vocab_size=0, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=4, num_kv_heads=1, head_dim=16, rope_theta=10_000.0,
            attention_bias=False, has_embed=False, has_lm_head=False,
            mlp_act="gelu_tanh", rms_plus_one=True,
        ),
        max_image_text_tokens=max_image_text_tokens,
        horizon_steps=4, cond_steps=1, num_inference_steps=4,
        backbone="paligemma",
        siglip=tiny_siglip(),
    )


# Tiny configs for tests ----------------------------------------------------


def tiny_vision(image_size: int = 28) -> VisionConfig:
    return VisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        patch_size=14,
        image_size=image_size,
        qkv_bias=True,
        qk_normalization=True,
        norm_type="layer_norm",
    )


def tiny_llm(vocab_size: int = 512) -> LLMConfig:
    return LLMConfig(
        vocab_size=vocab_size,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        rope_theta=10_000.0,
    )


def tiny_expert() -> LLMConfig:
    return LLMConfig(
        vocab_size=0,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        rope_theta=10_000.0,
        has_embed=False,
        has_lm_head=False,
    )


def tiny_vlm() -> VLMConfig:
    return VLMConfig(
        vision=tiny_vision(),
        llm=tiny_llm(),
        img_context_token_id=500,
        img_start_token_id=498,
        img_end_token_id=499,
        pad_token_id=0,
        max_dynamic_patch=4,
    )


def tiny_vla(max_image_text_tokens: int = 16) -> VLAConfig:
    return VLAConfig(
        vlm=tiny_vlm(),
        expert=tiny_expert(),
        max_image_text_tokens=max_image_text_tokens,
        horizon_steps=4,
        cond_steps=1,
        action_dim=7,
        proprio_dim=7,
        num_inference_steps=4,
    )
