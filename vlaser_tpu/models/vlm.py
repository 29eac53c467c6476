"""InternVL-chat-style VLM: InternViT features fused into a Qwen2.5 LLM.

Parity surface: modeling_internvl_chat.py — extract_feature (:273-291 — ViT,
drop CLS, pixel-shuffle x0.5, mlp1), IMG_CONTEXT scatter (:180-190), weighted
CE loss (:206-243). The scatter is reimplemented with static shapes
(cumsum-gather instead of boolean indexing) so the whole step jits; padded
tiles (image_flags==0, the reference's blank-tile trick for text-only samples,
internvl_chat_finetune.py:581-622) are compacted out with a drop-scatter.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import VLMConfig
from ..inference.kv_cache import KVCache
from ..kernels import ops
from .internvit import InternVisionModel
from .layers import Dense, LayerNorm
from .qwen2 import Qwen2ForCausalLM


class MLP1(nn.Module):
    """LayerNorm -> Linear -> GELU -> Linear (modeling_internvl_chat.py:91-96)."""

    in_dim: int
    out_dim: int
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = LayerNorm(self.in_dim, 1e-5, self.param_dtype, name="norm")(x)
        x = Dense(self.out_dim, use_bias=True, param_dtype=self.param_dtype,
                  compute_dtype=self.compute_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return Dense(self.out_dim, use_bias=True, param_dtype=self.param_dtype,
                     compute_dtype=self.compute_dtype, name="fc2")(x)


def scatter_image_embeds(
    input_ids: jax.Array,  # [B, N]
    tok_embeds: jax.Array,  # [B, N, C]
    vit_embeds: jax.Array,  # [T, tokens_per_tile, C] (all tiles, incl. padding)
    image_flags: Optional[jax.Array],  # [T] 1=real tile, 0=padding tile
    img_context_token_id: int,
) -> jax.Array:
    """Replace <IMG_CONTEXT> positions with ViT tokens, statically shaped."""
    b, n, c = tok_embeds.shape
    t, ppt, _ = vit_embeds.shape
    vit_flat = vit_embeds.reshape(t * ppt, c)
    if image_flags is not None:
        flags = jnp.repeat(image_flags.astype(jnp.int32), ppt)  # [T*ppt]
        # compact flagged tokens to the front, order-preserving
        dest = jnp.cumsum(flags) - 1
        dest = jnp.where(flags == 1, dest, t * ppt)  # drop invalid
        compact = jnp.zeros_like(vit_flat).at[dest].set(vit_flat, mode="drop")
    else:
        compact = vit_flat
    am = jax.sharding.get_abstract_mesh()
    if not am.empty and "context" in am.axis_names:
        # under a context (ring-attention) mesh the token embeds are
        # sequence-sharded while the per-tile vit embeds have no sequence
        # axis; without an explicit choice GSPMD reshards `compact`
        # through an "involuntary full rematerialization" (replicate then
        # repartition). Replicating the small [T*ppt, C] table is that
        # same last-resort layout, made deliberate and warning-free.
        compact = jax.lax.with_sharding_constraint(
            compact, jax.sharding.PartitionSpec(None, None)
        )
    sel = (input_ids == img_context_token_id).reshape(b * n)
    src_idx = jnp.cumsum(sel.astype(jnp.int32)) - 1
    gathered = jnp.take(compact, jnp.clip(src_idx, 0, t * ppt - 1), axis=0)
    flat = tok_embeds.reshape(b * n, c)
    out = jnp.where(sel[:, None], gathered.astype(flat.dtype), flat)
    return out.reshape(b, n, c)


class InternVLChatModel(nn.Module):
    """Vision + projector + LLM; the Vlaser-2B/8B model body."""

    cfg: VLMConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    attn_impl: str = "auto"

    def setup(self):
        cfg = self.cfg
        self.vision_model = InternVisionModel(
            cfg.vision, self.param_dtype, self.compute_dtype, self.remat,
            self.attn_impl,
        )
        self.language_model = Qwen2ForCausalLM(
            cfg.llm, self.param_dtype, self.compute_dtype, self.remat
        )
        self.mlp1 = MLP1(
            cfg.vit_proj_in_dim, cfg.llm.hidden_size, self.param_dtype,
            self.compute_dtype,
        )

    def extract_feature(self, pixel_values: jax.Array) -> jax.Array:
        """[T, H, W, 3] -> [T, num_image_token, llm_hidden]."""
        vit = self.vision_model(
            pixel_values, select_layer=self.cfg.select_layer
        )
        return self.project_features(vit)

    def vit_embed(self, pixel_values: jax.Array) -> jax.Array:
        """Patch conv + CLS + pos-emb (layer-0 input) — the fused serving
        ViT stack (kernels/fused_vit.py) takes over from here."""
        return self.vision_model.embed(pixel_values)

    def project_features(self, vit_hidden: jax.Array) -> jax.Array:
        """extract_feature's tail: CLS drop, pixel-shuffle x0.5, mlp1
        (modeling_internvl_chat.py:273-291)."""
        cfg = self.cfg
        vit = vit_hidden[:, 1:, :]  # drop CLS
        t, s, c = vit.shape
        side = int(s**0.5)
        vit = vit.reshape(t, side, side, c)
        vit = ops.pixel_shuffle(vit, cfg.downsample_ratio, cfg.ps_version)
        vit = vit.reshape(t, -1, vit.shape[-1])
        return self.mlp1(vit)

    def fuse_embeddings(
        self,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array],
        image_flags: Optional[jax.Array] = None,
        visual_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        tok = self.language_model.embed(input_ids)
        if pixel_values is None and visual_features is None:
            return tok
        vit = visual_features
        if vit is None:
            vit = self.extract_feature(pixel_values)
        return scatter_image_embeds(
            input_ids, tok, vit, image_flags, self.cfg.img_context_token_id
        )

    def __call__(
        self,
        input_ids: jax.Array,  # [B, N]
        pixel_values: Optional[jax.Array],  # [T, H, W, 3] tiles across batch
        image_flags: Optional[jax.Array] = None,  # [T]
        seg_ids: Optional[jax.Array] = None,  # [B, N] padding/packing
        positions: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
        return_logits: bool = True,
    ) -> Tuple[jax.Array, jax.Array, Optional[KVCache]]:
        embeds = self.fuse_embeddings(input_ids, pixel_values, image_flags)
        return self.language_model(
            inputs_embeds=embeds, positions=positions, seg_ids=seg_ids,
            cache=cache, return_logits=return_logits, attn_impl=self.attn_impl,
        )

    # decode-path helpers (used by inference/chat.py inside jitted loops)
    def prefill(self, input_ids, pixel_values, seg_ids, cache,
                visual_features=None, image_flags=None):
        # image_flags: [T] 1=real tile, 0=padding tile — lets callers pad
        # the tile count to a bucket (bounded compile count for variable
        # multi-tile prompts, serve/engine.py tile_buckets)
        embeds = self.fuse_embeddings(
            input_ids, pixel_values, image_flags=image_flags,
            visual_features=visual_features,
        )
        return self.language_model(
            inputs_embeds=embeds, seg_ids=seg_ids, cache=cache,
            attn_impl=self.attn_impl,
        )

    def decode_step(self, token: jax.Array, cache: KVCache,
                    positions: Optional[jax.Array] = None,
                    seg_ids: Optional[jax.Array] = None):
        # seg_ids: the continuous-batching engine (serve/engine.py) passes
        # 0 for vacant slots so they neither advance nor record attendable
        # cache entries; None keeps the plain all-active decode semantics.
        return self.language_model(
            input_ids=token, positions=positions, seg_ids=seg_ids,
            cache=cache, attn_impl=self.attn_impl,
        )
