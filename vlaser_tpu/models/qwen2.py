"""Qwen2.5-style causal LM in flax — the Vlaser LLM backbone and (with
hidden=768, head_dim=128) the VLA action expert.

TPU-native design vs the reference (HF Qwen2ForCausalLM, vendored at
Vlaser_VLM/internvl_chat/internvl/model/*, used via transformers):
- layers are a single `nn.scan` stack: one compile for 28 layers, clean remat,
  stacked [L, ...] params that shard naturally over the fsdp/tensor mesh axes
- KV cache is a static-shape pytree (inference/kv_cache.py) threaded through
  the scan; decode is a jitted lax.scan outside (inference/sampling.py)
- attention is kernels/flash_attention.attention (Pallas on TPU), with
  packing/padding expressed as segment ids rather than cu_seqlens

Parity surface: HF Qwen2 modeling (transformers), exercised by
tests/test_qwen2.py golden comparison against transformers' CPU implementation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import LLMConfig
from ..inference.kv_cache import KVCache, write_kv
from ..kernels import ops
from ..kernels.flash_attention import attention
from .layers import Dense, Embed, RMSNorm


class Qwen2Attention(nn.Module):
    cfg: LLMConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, S, H]
        cos: jax.Array,
        sin: jax.Array,
        *,
        seg_ids: jax.Array,  # [B, S]
        levels: Optional[jax.Array],
        kv_buffers: Optional[Tuple[jax.Array, jax.Array]] = None,
        kv_seg: Optional[jax.Array] = None,  # [B, max]
        kv_levels: Optional[jax.Array] = None,
        q_offset: jax.Array | int = 0,
        causal: bool = True,
        attn_impl: str = "auto",
    ):
        cfg = self.cfg
        b, s, _ = x.shape
        dense = lambda f, bias, name: Dense(
            f, use_bias=bias, param_dtype=self.param_dtype,
            compute_dtype=self.compute_dtype, name=name,
        )
        q = dense(cfg.q_dim, cfg.attention_bias, "q_proj")(x)
        k = dense(cfg.kv_dim, cfg.attention_bias, "k_proj")(x)
        v = dense(cfg.kv_dim, cfg.attention_bias, "v_proj")(x)
        q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        if cfg.qk_norm:
            # Qwen3: per-head RMSNorm over head_dim before rope
            # (modeling_qwen3.py Qwen3Attention.q_norm/k_norm; the reference
            # VLA reaches it via joint_model.py:449-452,573-576)
            q = RMSNorm(cfg.head_dim, cfg.rms_norm_eps, self.param_dtype,
                        name="q_norm")(q)
            k = RMSNorm(cfg.head_dim, cfg.rms_norm_eps, self.param_dtype,
                        name="k_norm")(k)
        q = ops.apply_rope(q, cos, sin)
        k = ops.apply_rope(k, cos, sin)
        scale = (
            cfg.query_pre_attn_scalar ** -0.5
            if cfg.query_pre_attn_scalar is not None else None
        )

        new_buffers = None
        if kv_buffers is not None:
            k_buf, v_buf = kv_buffers
            k_buf = write_kv(k_buf, k, q_offset)
            v_buf = write_kv(v_buf, v, q_offset)
            new_buffers = (k_buf, v_buf)
            per_row = getattr(q_offset, "ndim", 0) == 1
            if per_row:
                # continuous-batching decode: each row sits at its own fill
                # depth. With a single query token per row, "causal" reduces
                # to the kv segment mask (every valid cached slot is in the
                # past), so no per-row offset needs to reach the kernel.
                # Multi-token per-row blocks (the engine's speculative
                # verify step) DO need causality among the block's own
                # freshly written slots — the vector q_offset reaches
                # make_attention_mask, which builds per-row positions.
                assert cfg.sliding_window is None, (
                    "sliding window + per-row decode offsets is unsupported"
                )
                out = attention(
                    q, k_buf.astype(q.dtype), v_buf.astype(q.dtype),
                    q_segment_ids=seg_ids, kv_segment_ids=kv_seg,
                    q_levels=levels, kv_levels=kv_levels,
                    q_offset=q_offset if s > 1 else 0,
                    causal=s > 1, impl=attn_impl,
                    scale=scale, softcap=cfg.attn_softcap,
                )
            else:
                out = attention(
                    q, k_buf.astype(q.dtype), v_buf.astype(q.dtype),
                    q_segment_ids=seg_ids, kv_segment_ids=kv_seg,
                    q_levels=levels, kv_levels=kv_levels,
                    q_offset=q_offset, causal=causal, impl=attn_impl,
                    scale=scale, softcap=cfg.attn_softcap,
                    window=cfg.sliding_window if causal else None,
                )
        elif cfg.context_parallel_axis is not None:
            # ring attention over the context mesh axis (a capability the
            # reference lacks — SURVEY.md §5); window is incompatible by
            # construction (the ring chunks are the window granularity)
            assert cfg.sliding_window is None, (
                "sliding window + context parallelism is unsupported"
            )
            from ..kernels.ring_attention import context_parallel_attention

            out = context_parallel_attention(
                q, k, v, axis=cfg.context_parallel_axis,
                q_segment_ids=seg_ids, kv_segment_ids=seg_ids,
                q_levels=levels, kv_levels=levels,
                causal=causal, scale=scale, softcap=cfg.attn_softcap,
            )
        else:
            out = attention(
                q, k, v,
                q_segment_ids=seg_ids, kv_segment_ids=seg_ids,
                q_levels=levels, kv_levels=levels,
                causal=causal, impl=attn_impl,
                scale=scale, softcap=cfg.attn_softcap,
                window=cfg.sliding_window if causal else None,
            )
        out = out.reshape(b, s, cfg.q_dim)
        out = dense(cfg.hidden_size, False, "o_proj")(out)
        return out, new_buffers


class Qwen2MLP(nn.Module):
    cfg: LLMConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dense = lambda f, name: Dense(
            f, use_bias=False, param_dtype=self.param_dtype,
            compute_dtype=self.compute_dtype, name=name,
        )
        gate = dense(cfg.intermediate_size, "gate_proj")(x)
        up = dense(cfg.intermediate_size, "up_proj")(x)
        act = nn.silu if cfg.mlp_act == "silu" else (
            lambda g: nn.gelu(g, approximate=True)
        )
        return dense(cfg.hidden_size, "down_proj")(act(gate) * up)


class Qwen2Layer(nn.Module):
    cfg: LLMConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    causal: bool = True
    use_cache: bool = False
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, cos, sin, seg_ids, levels, kv_k, kv_v, kv_seg,
                 kv_levels, q_offset):
        cfg = self.cfg
        h = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, self.param_dtype,
                    cfg.rms_plus_one, name="input_layernorm")(x)
        attn_out, new_buffers = Qwen2Attention(
            cfg, self.param_dtype, self.compute_dtype, name="self_attn"
        )(
            h, cos, sin, seg_ids=seg_ids, levels=levels,
            kv_buffers=(kv_k, kv_v) if self.use_cache else None,
            kv_seg=kv_seg, kv_levels=kv_levels, q_offset=q_offset,
            causal=self.causal, attn_impl=self.attn_impl,
        )
        x = x + attn_out
        h = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, self.param_dtype,
                    cfg.rms_plus_one, name="post_attention_layernorm")(x)
        if cfg.num_experts > 0:
            from .moe import MoEMLP

            x = x + MoEMLP(cfg, self.param_dtype, self.compute_dtype,
                           name="mlp")(h)
        else:
            x = x + Qwen2MLP(cfg, self.param_dtype, self.compute_dtype,
                             name="mlp")(h)
        if self.use_cache:
            return x, new_buffers
        return x, (kv_k, kv_v)


class Qwen2Model(nn.Module):
    """Embedding + scanned decoder stack + final norm (no head)."""

    cfg: LLMConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        inputs_embeds: jax.Array,  # [B, S, H]
        positions: jax.Array,  # [B, S]
        seg_ids: Optional[jax.Array] = None,
        levels: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
        causal: bool = True,
        attn_impl: str = "auto",
    ) -> Tuple[jax.Array, Optional[KVCache]]:
        cfg = self.cfg
        b, s, _ = inputs_embeds.shape
        if seg_ids is None:
            seg_ids = jnp.ones((b, s), jnp.int32)
        if cfg.rope_short_factor is not None:
            cos, sin = ops.rope_cos_sin_su(
                positions, cfg.head_dim, cfg.rope_theta,
                cfg.rope_short_factor, cfg.rope_long_factor,
                cfg.original_max_position, cfg.max_position_embeddings,
            )
        else:
            cos, sin = ops.rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

        use_cache = cache is not None
        if use_cache:
            q_offset = cache.length
            cache = cache.write_meta(seg_ids, levels)
            kv_seg = cache.seg
            kv_k, kv_v = cache.k, cache.v  # [L, B, max, KVH, D]
            # levels persist in the cache, so the VLA block rule holds across
            # cached decode steps too (round-1 silently zeroed them)
            kv_levels = None if levels is None else cache.lev
        else:
            q_offset = jnp.zeros((), jnp.int32)
            kv_seg = seg_ids
            dummy = jnp.zeros((cfg.num_layers, b, 0, cfg.num_kv_heads, cfg.head_dim),
                              self.compute_dtype)
            kv_k, kv_v = dummy, dummy
            kv_levels = levels

        layer_cls = Qwen2Layer
        if self.remat:
            layer_cls = nn.remat(Qwen2Layer, prevent_cse=False)

        scan = nn.scan(
            layer_cls,
            variable_axes={"params": 0, "quant": 0, "lora": 0,
                           "intermediates": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast,
                     0, 0, nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
            length=cfg.num_layers,
        )
        x = inputs_embeds.astype(self.compute_dtype)
        if cfg.embed_scale:
            x = x * jnp.asarray(cfg.hidden_size**0.5, x.dtype)
        x, (new_k, new_v) = scan(
            cfg, self.param_dtype, self.compute_dtype,
            causal, use_cache, attn_impl, name="layers",
        )(x, cos, sin, seg_ids, levels, kv_k, kv_v, kv_seg, kv_levels, q_offset)
        x = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, self.param_dtype,
                    cfg.rms_plus_one, name="norm")(x)

        new_cache = None
        if use_cache:
            new_cache = cache.replace(k=new_k, v=new_v)
        return x, new_cache


class Qwen2ForCausalLM(nn.Module):
    cfg: LLMConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    def setup(self):
        cfg = self.cfg
        if cfg.has_embed:
            self.embed_tokens = Embed(
                cfg.vocab_size, cfg.hidden_size, param_dtype=self.param_dtype,
                dtype=self.compute_dtype,
            )
        self.model = Qwen2Model(cfg, self.param_dtype, self.compute_dtype, self.remat)
        if cfg.has_lm_head and not cfg.tie_word_embeddings:
            self.lm_head = Dense(
                cfg.vocab_size, use_bias=False, param_dtype=self.param_dtype,
                compute_dtype=self.compute_dtype,
            )

    def __call__(
        self,
        input_ids: Optional[jax.Array] = None,
        inputs_embeds: Optional[jax.Array] = None,
        positions: Optional[jax.Array] = None,
        seg_ids: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
        attn_impl: str = "auto",
        return_logits: bool = True,
    ):
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        b, s, _ = inputs_embeds.shape
        if positions is None:
            base = jnp.arange(s, dtype=jnp.int32)[None, :]
            positions = jnp.broadcast_to(base, (b, s))
            if cache is not None:
                off = cache.length
                positions = positions + (off[:, None] if off.ndim == 1 else off)
        hidden, new_cache = self.model(
            inputs_embeds, positions, seg_ids=seg_ids, cache=cache,
            attn_impl=attn_impl,
        )
        # return_logits=False: long-context SFT computes the CE vocab-chunked
        # from `hidden` instead (train/losses.py chunked_weighted_ce) — the
        # [B, S, V] fp32 logits tensor would dominate HBM at 2B scale
        logits = self.logits(hidden) if return_logits else None
        return logits, hidden, new_cache

    def embed(self, input_ids: jax.Array) -> jax.Array:
        return self.embed_tokens(input_ids)

    def logits(self, hidden: jax.Array) -> jax.Array:
        cfg = self.cfg
        if not cfg.has_lm_head:
            return hidden
        if cfg.tie_word_embeddings:
            return self.embed_tokens.attend(hidden)
        return self.lm_head(hidden).astype(jnp.float32)
