"""Joint mixture transformer: VLM (1536-wide) + action expert (768-wide)
attending in one shared attention per layer.

Parity surface: src/model/vla/joint_model.py — per-mixture norms/projections,
Q/K/V concatenated along sequence across mixtures into one attention
(:140-235, :410-696), cache modes (doc at :6-10), final per-mixture norm
(:800-812). Both mixtures project to the same head layout (12 q heads / 2 kv
heads x head_dim 128 for the 2B recipe: pizero_internvl.py:117-127), so the
joint attention is a clean sequence concat — no padding of widths.

TPU-native: one scanned stack holds both mixtures' layer params; the VLA block
mask is the level rule (img/text=0 < proprio=1 < action=2) evaluated inside
the Pallas flash kernel; prefix KV caches are [L, B, Sp, KVH, D] arrays reused
across a jitted lax.scan denoise loop with zero re-materialization.

Modes (static, selected per call):
  train  — vlm + (proprio|action) streams, full block mask, no cache
  prefix — vlm + proprio only; returns per-layer rope'd K/V for caching
  suffix — action stream only, attending to cached prefix K/V + fresh action K/V
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import LLMConfig
from ..kernels import ops
from ..kernels.flash_attention import attention
from ..models.layers import Dense, RMSNorm


class MixtureMLP(nn.Module):
    cfg: LLMConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        d = lambda f, name: Dense(f, use_bias=False, param_dtype=self.param_dtype,
                                  compute_dtype=self.compute_dtype, name=name)
        act = nn.silu if cfg.mlp_act == "silu" else (
            lambda g: nn.gelu(g, approximate=True)
        )
        return d(cfg.hidden_size, "down_proj")(
            act(d(cfg.intermediate_size, "gate_proj")(x))
            * d(cfg.intermediate_size, "up_proj")(x)
        )


class MixtureBlock(nn.Module):
    """One mixture's per-layer weights (Qwen2 layer layout for conversion)."""

    cfg: LLMConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.input_layernorm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                       self.param_dtype, cfg.rms_plus_one)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                                self.param_dtype, cfg.rms_plus_one)
        mk = lambda f, bias: Dense(f, use_bias=bias, param_dtype=self.param_dtype,
                                   compute_dtype=self.compute_dtype)
        self.q_proj = mk(cfg.q_dim, cfg.attention_bias)
        self.k_proj = mk(cfg.kv_dim, cfg.attention_bias)
        self.v_proj = mk(cfg.kv_dim, cfg.attention_bias)
        self.o_proj = mk(cfg.hidden_size, False)
        self.mlp = MixtureMLP(cfg, self.param_dtype, self.compute_dtype)

    def qkv(self, x, cos, sin):
        cfg = self.cfg
        b, s, _ = x.shape
        h = self.input_layernorm(x)
        q = self.q_proj(h).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = self.k_proj(h).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = self.v_proj(h).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        q = ops.apply_rope(q, cos, sin)
        k = ops.apply_rope(k, cos, sin)
        return q, k, v

    def post_attn(self, x, attn_out):
        b, s = attn_out.shape[:2]
        x = x + self.o_proj(attn_out.reshape(b, s, -1))
        return x + self.mlp(self.post_attention_layernorm(x))


class JointLayer(nn.Module):
    vlm_cfg: LLMConfig
    expert_cfg: LLMConfig
    mode: str  # 'train' | 'prefix' | 'suffix'
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, carry, scanned):
        vlm = MixtureBlock(self.vlm_cfg, self.param_dtype, self.compute_dtype,
                           name="vlm")
        expert = MixtureBlock(self.expert_cfg, self.param_dtype,
                              self.compute_dtype, name="expert")
        if self.mode == "vlm_only":
            # causal text-only pass through the vlm mixture (forward_vlm /
            # infer_text path, pizero_internvl.py:1200, :1005)
            (x_vlm, cos_v, sin_v, seg) = carry
            qv, kv_, vv = vlm.qkv(x_vlm, cos_v, sin_v)
            out = attention(
                qv, kv_, vv, q_segment_ids=seg, kv_segment_ids=seg,
                causal=True, impl=self.attn_impl,
            )
            x_vlm = vlm.post_attn(x_vlm, out)
            return (x_vlm, cos_v, sin_v, seg), None
        if self.mode in ("train", "prefix"):
            (x_vlm, x_pa, cos_v, sin_v, cos_pa, sin_pa, seg, lev) = carry
            sv, spa = x_vlm.shape[1], x_pa.shape[1]
            qv, kv_, vv = vlm.qkv(x_vlm, cos_v, sin_v)
            qp, kp, vp = expert.qkv(x_pa, cos_pa, sin_pa)
            q = jnp.concatenate([qv, qp], axis=1)
            k = jnp.concatenate([kv_, kp], axis=1)
            v = jnp.concatenate([vv, vp], axis=1)
            out = attention(
                q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                q_levels=lev, kv_levels=lev, causal=False, impl=self.attn_impl,
            )
            x_vlm = vlm.post_attn(x_vlm, out[:, :sv])
            x_pa = expert.post_attn(x_pa, out[:, sv:])
            new_carry = (x_vlm, x_pa, cos_v, sin_v, cos_pa, sin_pa, seg, lev)
            if self.mode == "prefix":
                return new_carry, (k, v)  # rope'd K/V over [vlm|proprio]
            return new_carry, None
        else:  # suffix: action stream over cached prefix
            (x_act, cos_a, sin_a, seg_q, seg_kv, lev_q, lev_kv) = carry
            k_pre, v_pre = scanned  # [B, Sp, KVH, D]
            qa, ka, va = expert.qkv(x_act, cos_a, sin_a)
            k = jnp.concatenate([k_pre.astype(ka.dtype), ka], axis=1)
            v = jnp.concatenate([v_pre.astype(va.dtype), va], axis=1)
            out = attention(
                qa, k, v, q_segment_ids=seg_q, kv_segment_ids=seg_kv,
                q_levels=lev_q, kv_levels=lev_kv, causal=False,
                impl=self.attn_impl,
            )
            x_act = expert.post_attn(x_act, out)
            return (x_act, cos_a, sin_a, seg_q, seg_kv, lev_q, lev_kv), None


class JointModel(nn.Module):
    """Scanned joint stack + final per-mixture norms."""

    vlm_cfg: LLMConfig
    expert_cfg: LLMConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    attn_impl: str = "auto"

    def _scan(self, mode: str):
        layer_cls = JointLayer
        if self.remat and mode == "train":
            layer_cls = nn.remat(JointLayer, prevent_cse=False)
        return nn.scan(
            layer_cls,
            variable_axes={"params": 0, "quant": 0},
            split_rngs={"params": True},
            in_axes=0,
            out_axes=0,
            length=self.vlm_cfg.num_layers,
        )(
            self.vlm_cfg, self.expert_cfg, mode, self.param_dtype,
            self.compute_dtype, self.attn_impl, name="layers",
        )

    @nn.compact
    def __call__(self, mode: str, *args):
        """Dispatch so all modes share one param scope ('layers', norms)."""
        vlm_norm = RMSNorm(self.vlm_cfg.hidden_size, self.vlm_cfg.rms_norm_eps,
                           self.param_dtype, name="vlm_norm")
        expert_norm = RMSNorm(self.expert_cfg.hidden_size,
                              self.expert_cfg.rms_norm_eps, self.param_dtype,
                              name="expert_norm")
        scan = self._scan(mode)
        if mode == "vlm_only":
            (x_vlm, cos_v, sin_v, seg) = args
            carry, _ = scan((x_vlm, cos_v, sin_v, seg), None)
            return vlm_norm(carry[0])
        if mode == "train":
            (x_vlm, x_pa, cos_v, sin_v, cos_pa, sin_pa, seg, lev) = args
            carry, _ = scan(
                (x_vlm, x_pa, cos_v, sin_v, cos_pa, sin_pa, seg, lev), None
            )
            x_vlm, x_pa = carry[0], carry[1]
            return vlm_norm(x_vlm), expert_norm(x_pa)
        if mode == "prefix":
            (x_vlm, x_p, cos_v, sin_v, cos_p, sin_p, seg, lev) = args
            carry, kv = scan(
                (x_vlm, x_p, cos_v, sin_v, cos_p, sin_p, seg, lev), None
            )
            return kv  # (k [L,B,Sv+Sp,KVH,D], v [...])
        if mode == "suffix":
            (x_act, cos_a, sin_a, seg_q, seg_kv, lev_q, lev_kv, k_pre, v_pre) = args
            carry, _ = scan(
                (x_act, cos_a, sin_a, seg_q, seg_kv, lev_q, lev_kv),
                (k_pre, v_pre),
            )
            return expert_norm(carry[0])
        raise ValueError(mode)
