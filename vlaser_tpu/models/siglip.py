"""SigLIP vision tower (PaliGemma variant of the VLA).

Parity surface: src/model/paligemma/siglip.py — SiglipVisionModel: conv patch
embed (valid padding, bias), learned position embedding (no CLS token),
pre-norm encoder layers (LayerNorm -> MHA -> res, LayerNorm -> gelu-tanh MLP
-> res), final post_layernorm; 224px/14 -> 256 tokens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import SiglipConfig
from ..kernels.flash_attention import attention
from .layers import Dense, LayerNorm


class SiglipAttention(nn.Module):
    cfg: SiglipConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, s, _ = x.shape
        mk = lambda name: Dense(cfg.hidden_size, use_bias=True,
                                param_dtype=self.param_dtype,
                                compute_dtype=self.compute_dtype, name=name)
        q = mk("q_proj")(x).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = mk("k_proj")(x).reshape(b, s, cfg.num_heads, cfg.head_dim)
        v = mk("v_proj")(x).reshape(b, s, cfg.num_heads, cfg.head_dim)
        out = attention(q, k, v, causal=False, impl=self.attn_impl)
        return mk("out_proj")(out.reshape(b, s, cfg.hidden_size))


class SiglipLayer(nn.Module):
    cfg: SiglipConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, _=None):
        cfg = self.cfg
        h = LayerNorm(cfg.hidden_size, cfg.layer_norm_eps, self.param_dtype,
                      name="layer_norm1")(x).astype(x.dtype)
        x = x + SiglipAttention(cfg, self.param_dtype, self.compute_dtype,
                                self.attn_impl, name="self_attn")(h)
        h = LayerNorm(cfg.hidden_size, cfg.layer_norm_eps, self.param_dtype,
                      name="layer_norm2")(x).astype(x.dtype)
        h = Dense(cfg.intermediate_size, use_bias=True,
                  param_dtype=self.param_dtype, compute_dtype=self.compute_dtype,
                  name="fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = Dense(cfg.hidden_size, use_bias=True, param_dtype=self.param_dtype,
                  compute_dtype=self.compute_dtype, name="fc2")(h)
        return x + h, None


class SiglipVisionModel(nn.Module):
    cfg: SiglipConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        """[B, H, W, 3] -> [B, num_tokens, hidden]."""
        cfg = self.cfg
        x = nn.Conv(
            cfg.hidden_size, kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            param_dtype=self.param_dtype, dtype=self.compute_dtype,
            name="patch_embedding",
        )(pixel_values.astype(self.compute_dtype))
        b, hh, ww, c = x.shape
        x = x.reshape(b, hh * ww, c)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (1, cfg.num_tokens, cfg.hidden_size), self.param_dtype,
        )
        x = x + pos.astype(x.dtype)
        layer_cls = SiglipLayer
        if self.remat:
            layer_cls = nn.remat(SiglipLayer, prevent_cse=False)
        scan = nn.scan(
            layer_cls,
            variable_axes={"params": 0, "quant": 0, "lora": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,),
            out_axes=0,
            length=cfg.num_layers,
        )
        x, _ = scan(cfg, self.param_dtype, self.compute_dtype, self.attn_impl,
                    name="encoder")(x, None)
        return LayerNorm(cfg.hidden_size, cfg.layer_norm_eps, self.param_dtype,
                         name="post_layernorm")(x).astype(self.compute_dtype)
