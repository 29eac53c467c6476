"""InternViT vision encoder in flax (InternViT-300M / InternViT-6B).

Parity surface: Vlaser_VLM/internvl_chat/internvl/model/internvl_chat/
modeling_intern_vit.py — conv patch embed + CLS + learnable pos-emb with
bicubic interpolation (:133-174), pre-norm blocks with layer-scale (:266-290),
QK-RMSNorm over the flattened head dim (:210-226), non-causal attention
(:229-247).

TPU-native choices: scanned layer stack, Pallas non-causal flash attention
(448px tile = 1025 tokens), fp32 norm statistics inside bf16 flow, bicubic
pos-emb interpolation via jax.image.resize.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import VisionConfig
from ..kernels import ops
from ..kernels.flash_attention import attention
from .layers import Dense, LayerNorm, RMSNorm


class InternVisionEmbeddings(nn.Module):
    cfg: VisionConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        """pixel_values [B, H, W, 3] (NHWC; channels-last is TPU-native)."""
        cfg = self.cfg
        embed = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            param_dtype=self.param_dtype,
            dtype=self.compute_dtype,
            name="patch_embedding",
        )(pixel_values.astype(self.compute_dtype))
        b, h, w, c = embed.shape
        patches = embed.reshape(b, h * w, c)

        cls = self.param(
            "class_embedding",
            nn.initializers.normal(1.0),
            (1, 1, cfg.hidden_size),
            self.param_dtype,
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(1.0),
            (1, cfg.seq_len, cfg.hidden_size),
            self.param_dtype,
        )
        # bicubic-interp pos-emb when grid differs from train-time grid
        # (modeling_intern_vit.py:154-160 / resize_pos_embeddings:378);
        # torch-parity kernel (a=-0.75) via static matrices, NOT
        # jax.image.resize (a=-0.5) — golden-tested vs the reference
        n_side = cfg.num_patches_per_side
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (h, w) != (n_side, n_side):
            grid = pos_patch.reshape(1, n_side, n_side, cfg.hidden_size)
            grid = ops.bicubic_resize_2d(grid, h, w)
            pos_patch = grid.reshape(1, h * w, cfg.hidden_size)
        pos = jnp.concatenate([pos_cls, pos_patch.astype(pos_cls.dtype)], axis=1)

        cls_tok = jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)).astype(patches.dtype)
        x = jnp.concatenate([cls_tok, patches], axis=1)
        return x + pos.astype(x.dtype)


class InternAttention(nn.Module):
    cfg: VisionConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, s, _ = x.shape
        qkv = Dense(
            3 * cfg.hidden_size, use_bias=cfg.qkv_bias,
            param_dtype=self.param_dtype, compute_dtype=self.compute_dtype,
            name="qkv",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if cfg.qk_normalization:
            # RMSNorm over the FULL flattened (H*D) dim (modeling_intern_vit.py:216-219)
            q = RMSNorm(cfg.hidden_size, cfg.layer_norm_eps, self.param_dtype,
                        name="q_norm")(q)
            k = RMSNorm(cfg.hidden_size, cfg.layer_norm_eps, self.param_dtype,
                        name="k_norm")(k)
        q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, s, cfg.num_heads, cfg.head_dim)
        v = v.reshape(b, s, cfg.num_heads, cfg.head_dim)
        out = attention(q, k, v, causal=False, impl=self.attn_impl)
        out = out.reshape(b, s, cfg.hidden_size)
        return Dense(
            cfg.hidden_size, use_bias=True, param_dtype=self.param_dtype,
            compute_dtype=self.compute_dtype, name="proj",
        )(out)


class InternMLP(nn.Module):
    cfg: VisionConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = Dense(cfg.intermediate_size, use_bias=True, param_dtype=self.param_dtype,
                  compute_dtype=self.compute_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return Dense(cfg.hidden_size, use_bias=True, param_dtype=self.param_dtype,
                     compute_dtype=self.compute_dtype, name="fc2")(x)


class InternVisionLayer(nn.Module):
    cfg: VisionConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, _=None):
        cfg = self.cfg
        norm_cls = LayerNorm if cfg.norm_type == "layer_norm" else RMSNorm
        ls1 = self.param(
            "ls1", nn.initializers.constant(cfg.initializer_factor),
            (cfg.hidden_size,), self.param_dtype,
        )
        ls2 = self.param(
            "ls2", nn.initializers.constant(cfg.initializer_factor),
            (cfg.hidden_size,), self.param_dtype,
        )
        h = norm_cls(cfg.hidden_size, cfg.layer_norm_eps, self.param_dtype,
                     name="norm1")(x).astype(x.dtype)
        h = InternAttention(cfg, self.param_dtype, self.compute_dtype,
                            self.attn_impl, name="attn")(h)
        x = x + h * ls1.astype(h.dtype)
        h = norm_cls(cfg.hidden_size, cfg.layer_norm_eps, self.param_dtype,
                     name="norm2")(x).astype(x.dtype)
        h = InternMLP(cfg, self.param_dtype, self.compute_dtype, name="mlp")(h)
        x = x + h * ls2.astype(h.dtype)
        return x, x  # (carry, per-layer output)


class InternVisionModel(nn.Module):
    """Returns hidden states at `select_layer` (HF hidden_states indexing:
    -1 = final layer output, -2 = one layer earlier; no final norm in the
    reference encoder)."""

    cfg: VisionConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    attn_impl: str = "auto"

    def setup(self):
        self.embeddings = InternVisionEmbeddings(
            self.cfg, self.param_dtype, self.compute_dtype,
        )

    def embed(self, pixel_values: jax.Array) -> jax.Array:
        """Patch conv + CLS + (interpolated) pos-emb only — the input of
        layer 0. Exposed so the fused serving stack (kernels/fused_vit.py)
        can take over from here."""
        return self.embeddings(pixel_values)

    @nn.compact
    def __call__(self, pixel_values: jax.Array, select_layer: int = -1) -> jax.Array:
        cfg = self.cfg
        x = self.embeddings(pixel_values)
        layer_cls = InternVisionLayer
        if self.remat:
            layer_cls = nn.remat(InternVisionLayer, prevent_cse=False)
        scan = nn.scan(
            layer_cls,
            variable_axes={"params": 0, "quant": 0, "lora": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,),
            out_axes=0,
            length=cfg.num_layers,
        )
        x_final, all_states = scan(
            cfg, self.param_dtype, self.compute_dtype, self.attn_impl,
            name="encoder",
        )(x, None)
        if select_layer in (-1, cfg.num_layers):
            return x_final
        # hidden_states[i] = input of layer i; select_layer=-2 -> output of L-2
        idx = select_layer + cfg.num_layers  # e.g. -2 -> L-2 (output of layer L-2)
        return all_states[idx]
