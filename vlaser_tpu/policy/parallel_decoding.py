"""RoboTwin parallel-decoding VLA policy (internvla_2B_parallel_decoding).

Parity surface: RoboTwin/policy/internvla_2B_parallel_decoding/
- vla-scripts/train_mine_new.py:226-266 special tokens (<soi> <eoi> <sot>
  <eot>, per-arm <{left,right}_arm_{soa,eoa,sost,eost}>, 512 <state_i>),
  :600-688 embedding sequence [bos | <soi> img <eoi> | <sot> text <eot> |
  state | left slots | right slots | eos], zero-slot action embeddings
  (:606-609), full bidirectional attention (:702), L1 loss on action-head
  predictions over slot hidden states (:690-695)
- internvl/model/action_heads.py:58-106 MLPResNet / L1RegressionActionHead
- the missing `models` package (Showo/UnitModel; SURVEY.md §2.5) is
  reconstructed here: UnitModel == ParallelDecodingVLA (vla + action_head in
  one flax module).

TPU-native: the sequence layout is static, so action-slot positions are
compile-time constants — the gather is a static slice, the whole train step
and the one-pass control step jit cleanly. The non-causal "mask" is just
causal=False plus padding segment ids in the flash kernel.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.config import VLMConfig, vlaser_2b
from ..kernels import ops
from ..models.internvit import InternVisionModel
from ..models.layers import Dense, Embed, LayerNorm
from ..models.vlm import MLP1, scatter_image_embeds
from ..models.qwen2 import Qwen2Model


@dataclass(frozen=True)
class ParallelDecodingConfig:
    vlm: VLMConfig = field(default_factory=lambda: vlaser_2b())
    action_chunk: int = 8
    action_dim: int = 14  # dual-arm joint deltas
    state_dim: int = 14
    state_vocab_size: int = 512
    max_text_tokens: int = 32
    head_hidden: int = 1536

    @property
    def num_image_tokens(self) -> int:
        return self.vlm.num_image_token

    @property
    def slots_per_arm(self) -> int:
        return self.action_chunk * self.action_dim // 2

    def layout(self) -> Dict[str, Tuple[int, int]]:
        """Static [start, end) spans of each section."""
        spans = {}
        p = 0

        def put(name, n):
            nonlocal p
            spans[name] = (p, p + n)
            p += n

        put("bos", 1)
        put("soi", 1)
        put("image", self.num_image_tokens)
        put("eoi", 1)
        put("sot", 1)
        put("text", self.max_text_tokens)
        put("eot", 1)
        put("left_sost", 1)
        put("left_state", self.state_dim // 2)
        put("left_eost", 1)
        put("right_sost", 1)
        put("right_state", self.state_dim // 2)
        put("right_eost", 1)
        put("left_soa", 1)
        put("left_slots", self.slots_per_arm)
        put("left_eoa", 1)
        put("right_soa", 1)
        put("right_slots", self.slots_per_arm)
        put("right_eoa", 1)
        put("eos", 1)
        spans["total"] = (0, p)
        return spans


def discretize_state(qpos: np.ndarray, vocab: int = 512,
                     low: float = -1.0, high: float = 1.0) -> np.ndarray:
    """Continuous joint state -> <state_i> bin indices in [0, vocab)."""
    x = np.clip((qpos - low) / (high - low), 0.0, 1.0 - 1e-6)
    return (x * vocab).astype(np.int32)


class MLPResNetBlock(nn.Module):
    dim: int
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = LayerNorm(self.dim, 1e-5, self.param_dtype, name="norm")(x)
        h = Dense(self.dim, param_dtype=self.param_dtype,
                  compute_dtype=self.compute_dtype, name="fc")(h)
        return x + nn.relu(h)


class L1RegressionActionHead(nn.Module):
    """MLPResNet over per-chunk concatenated slot hidden states
    (action_heads.py:58-106)."""

    input_dim: int  # llm_hidden * action_dim
    hidden_dim: int
    action_dim: int
    num_blocks: int = 2
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, slot_hidden: jax.Array) -> jax.Array:
        """[B, chunk, action_dim * D] -> [B, chunk, action_dim]."""
        x = LayerNorm(self.input_dim, 1e-5, self.param_dtype, name="norm1")(slot_hidden)
        x = Dense(self.hidden_dim, param_dtype=self.param_dtype,
                  compute_dtype=self.compute_dtype, name="fc1")(x)
        x = nn.relu(x)
        for i in range(self.num_blocks):
            x = MLPResNetBlock(self.hidden_dim, self.param_dtype,
                               self.compute_dtype, name=f"block{i}")(x)
        x = LayerNorm(self.hidden_dim, 1e-5, self.param_dtype, name="norm2")(x)
        return Dense(self.action_dim, param_dtype=self.param_dtype,
                     compute_dtype=self.compute_dtype, name="fc2")(x).astype(jnp.float32)


class ParallelDecodingVLA(nn.Module):
    """UnitModel: InternVL backbone + zero-slot parallel decoding + L1 head."""

    cfg: ParallelDecodingConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    attn_impl: str = "auto"

    def setup(self):
        vlm = self.cfg.vlm
        self.vision_model = InternVisionModel(
            vlm.vision, self.param_dtype, self.compute_dtype, self.remat,
            self.attn_impl,
        )
        self.mlp1 = MLP1(vlm.vit_proj_in_dim, vlm.llm.hidden_size,
                         self.param_dtype, self.compute_dtype)
        self.embed_tokens = Embed(
            vlm.llm.vocab_size, vlm.llm.hidden_size,
            param_dtype=self.param_dtype, dtype=self.compute_dtype,
        )
        self.language_model = Qwen2Model(
            vlm.llm, self.param_dtype, self.compute_dtype, self.remat
        )
        self.action_head = L1RegressionActionHead(
            input_dim=vlm.llm.hidden_size * self.cfg.action_dim,
            hidden_dim=self.cfg.head_hidden,
            action_dim=self.cfg.action_dim,
            param_dtype=self.param_dtype,
            compute_dtype=self.compute_dtype,
        )

    def _slot_mask(self) -> np.ndarray:
        spans = self.cfg.layout()
        total = spans["total"][1]
        m = np.zeros(total, bool)
        for k in ("left_slots", "right_slots"):
            s, e = spans[k]
            m[s:e] = True
        return m

    def backbone_hidden(
        self,
        input_ids: jax.Array,  # [B, S] full static layout (slot ids arbitrary)
        pixel_values: jax.Array,  # [B_tiles, H, W, 3]
        text_mask: jax.Array,  # [B, S] 1 = attended (0 on text padding)
    ) -> jax.Array:
        cfg = self.cfg
        tok = self.embed_tokens(input_ids)
        # action slots carry ZERO embeddings (train_mine_new.py:606-609)
        slot = jnp.asarray(self._slot_mask())
        tok = jnp.where(slot[None, :, None], 0.0, tok)
        vit = self.vision_model(pixel_values, select_layer=cfg.vlm.select_layer)
        vit = vit[:, 1:, :]
        t, s, c = vit.shape
        side = int(s**0.5)
        vit = vit.reshape(t, side, side, c)
        vit = ops.pixel_shuffle(vit, cfg.vlm.downsample_ratio, cfg.vlm.ps_version)
        vit = self.mlp1(vit.reshape(t, -1, vit.shape[-1]))
        embeds = scatter_image_embeds(
            input_ids, tok, vit, None, cfg.vlm.img_context_token_id
        )
        b, n, _ = embeds.shape
        positions = jnp.broadcast_to(jnp.arange(n)[None, :], (b, n))
        hidden, _ = self.language_model(
            embeds, positions, seg_ids=text_mask, causal=False,
            attn_impl=self.attn_impl,
        )
        return hidden

    def __call__(self, input_ids, pixel_values, text_mask) -> jax.Array:
        """-> predicted actions [B, chunk, action_dim] (one forward pass)."""
        cfg = self.cfg
        hidden = self.backbone_hidden(input_ids, pixel_values, text_mask)
        spans = self.cfg.layout()
        ls, le = spans["left_slots"]
        rs, re = spans["right_slots"]
        slots = jnp.concatenate([hidden[:, ls:le], hidden[:, rs:re]], axis=1)
        b = slots.shape[0]
        # [B, chunk * action_dim, D] -> [B, chunk, action_dim * D]
        slots = slots.reshape(b, cfg.action_chunk, -1)
        return self.action_head(slots)

    def loss(self, input_ids, pixel_values, text_mask, actions) -> jax.Array:
        """L1 regression loss (train_mine_new.py:690-695)."""
        pred = self(input_ids, pixel_values, text_mask)
        return jnp.mean(jnp.abs(pred - actions.astype(jnp.float32)))


# reference call-site name (envs/_base_task.py:2944, train_mine_new.py:325)
UnitModel = ParallelDecodingVLA


class SequenceBuilder:
    """Host-side builder of the static token layout from tokenizer ids."""

    def __init__(self, cfg: ParallelDecodingConfig, token_ids: Dict[str, int],
                 state_token_start: int, pad_token_id: int):
        self.cfg = cfg
        self.tok = token_ids  # bos, eos, soi, eoi, sot, eot, per-arm markers
        self.state_token_start = state_token_start
        self.pad_token_id = pad_token_id
        self.spans = cfg.layout()

    def build(self, text_ids: np.ndarray, qpos: np.ndarray
              ) -> Tuple[np.ndarray, np.ndarray]:
        """text_ids [B, <=max_text], qpos [B, state_dim] -> (input_ids, mask)."""
        cfg = self.cfg
        b = text_ids.shape[0]
        total = self.spans["total"][1]
        ids = np.full((b, total), self.pad_token_id, np.int64)
        mask = np.ones((b, total), np.int32)
        t = self.tok
        state_ids = self.state_token_start + discretize_state(
            qpos, cfg.state_vocab_size
        )

        def fill(name, value):
            s, e = self.spans[name]
            ids[:, s:e] = value

        fill("bos", t["bos"])
        fill("soi", t["soi"])
        fill("image", t["img_context"])
        fill("eoi", t["eoi"])
        fill("sot", t["sot"])
        s, e = self.spans["text"]
        n = min(text_ids.shape[1], e - s)
        ids[:, s : s + n] = text_ids[:, :n]
        mask[:, s:e] = 0
        mask[:, s : s + n] = (text_ids[:, :n] != self.pad_token_id).astype(np.int32)
        fill("eot", t["eot"])
        fill("left_sost", t["left_arm_sost"])
        s, e = self.spans["left_state"]
        ids[:, s:e] = state_ids[:, : cfg.state_dim // 2]
        fill("left_eost", t["left_arm_eost"])
        fill("right_sost", t["right_arm_sost"])
        s, e = self.spans["right_state"]
        ids[:, s:e] = state_ids[:, cfg.state_dim // 2 :]
        fill("right_eost", t["right_arm_eost"])
        fill("left_soa", t["left_arm_soa"])
        fill("left_slots", self.pad_token_id)  # embeddings zeroed anyway
        fill("left_eoa", t["left_arm_eoa"])
        fill("right_soa", t["right_arm_soa"])
        fill("right_slots", self.pad_token_id)
        fill("right_eoa", t["right_arm_eoa"])
        fill("eos", t["eos"])
        return ids.astype(np.int32), mask
