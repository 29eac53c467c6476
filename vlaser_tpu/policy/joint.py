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
    """One mixture's per-layer weights (Qwen2 layer layout for conversion).

    adaptive_mode ('adaln' | 'adaln_zero', src/model/vla/mixture.py:89-143):
    when a time condition is supplied, action tokens use time-conditioned
    AdaptiveRMSNorms (and, for adaln_zero, sigmoid-gated residual scales);
    tokens outside `blend` (the tied proprio token, and the whole prefix
    pass where cond=None) keep the plain norms.
    """

    cfg: LLMConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    adaptive_mode: str = ""  # '' | 'adaln' | 'adaln_zero'

    def setup(self):
        from ..models.layers import AdaptiveLayerscale, AdaptiveRMSNorm

        cfg = self.cfg
        self.input_layernorm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                       self.param_dtype, cfg.rms_plus_one)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                                self.param_dtype, cfg.rms_plus_one)
        if self.adaptive_mode:
            mknorm = lambda: AdaptiveRMSNorm(
                cfg.hidden_size, cfg.rms_norm_eps, self.param_dtype,
                self.compute_dtype,
            )
            self.ada_input_norm = mknorm()
            self.ada_post_norm = mknorm()
            if self.adaptive_mode == "adaln_zero":
                mkscale = lambda: AdaptiveLayerscale(
                    cfg.hidden_size, param_dtype=self.param_dtype,
                    compute_dtype=self.compute_dtype,
                )
                self.post_adaptive_scale = mkscale()
                self.final_adaptive_scale = mkscale()
        mk = lambda f, bias: Dense(f, use_bias=bias, param_dtype=self.param_dtype,
                                   compute_dtype=self.compute_dtype)
        self.q_proj = mk(cfg.q_dim, cfg.attention_bias)
        self.k_proj = mk(cfg.kv_dim, cfg.attention_bias)
        self.v_proj = mk(cfg.kv_dim, cfg.attention_bias)
        self.o_proj = mk(cfg.hidden_size, False)
        if cfg.qk_norm:
            # Qwen3 mixtures (InternVL3.5 backbone): per-head q/k RMSNorm
            # before rope (joint_model.py:449-452,573-576)
            self.q_norm = RMSNorm(cfg.head_dim, cfg.rms_norm_eps,
                                  self.param_dtype)
            self.k_norm = RMSNorm(cfg.head_dim, cfg.rms_norm_eps,
                                  self.param_dtype)
        self.mlp = MixtureMLP(cfg, self.param_dtype, self.compute_dtype)

    def _norm(self, which: str, x, cond, blend):
        plain = (self.input_layernorm if which == "input"
                 else self.post_attention_layernorm)
        if not self.adaptive_mode or cond is None:
            return plain(x)
        ada = self.ada_input_norm if which == "input" else self.ada_post_norm
        a = ada(x, cond)
        if blend is None:
            return a
        return jnp.where(blend, a, plain(x))

    def _scale(self, which: str, x, cond, blend):
        if self.adaptive_mode != "adaln_zero" or cond is None:
            return x
        scale = (self.post_adaptive_scale if which == "post_attn"
                 else self.final_adaptive_scale)
        s = scale(x, cond)
        if blend is None:
            return s
        return jnp.where(blend, s, x)

    def qkv(self, x, cos, sin, cond=None, blend=None):
        cfg = self.cfg
        b, s, _ = x.shape
        h = self._norm("input", x, cond, blend)
        q = self.q_proj(h).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = self.k_proj(h).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = self.v_proj(h).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        if cfg.qk_norm:
            q = self.q_norm(q)
            k = self.k_norm(k)
        q = ops.apply_rope(q, cos, sin)
        k = ops.apply_rope(k, cos, sin)
        return q, k, v

    def post_attn(self, x, attn_out, cond=None, blend=None):
        b, s = attn_out.shape[:2]
        o = self.o_proj(attn_out.reshape(b, s, -1))
        x = x + self._scale("post_attn", o, cond, blend)
        m = self.mlp(self._norm("post", x, cond, blend))
        return x + self._scale("final", m, cond, blend)


class JointLayer(nn.Module):
    vlm_cfg: LLMConfig
    expert_cfg: LLMConfig
    mode: str  # 'train' | 'prefix' | 'suffix'
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"
    adaptive_mode: str = ""

    @nn.compact
    def __call__(self, carry, scanned):
        vlm = MixtureBlock(self.vlm_cfg, self.param_dtype, self.compute_dtype,
                           name="vlm")
        expert = MixtureBlock(self.expert_cfg, self.param_dtype,
                              self.compute_dtype, self.adaptive_mode,
                              name="expert")
        if self.mode == "vlm_prefix":
            # vlm mixture alone, VLA block-mask semantics (non-causal within
            # the image+text level, segment-masked), collecting rope'd K/V.
            # Exactly equal to the vlm half of mode='prefix': level-0 tokens
            # never attend proprio (the level rule), so the vlm stream is
            # independent of the expert — running it alone drops 28 layers
            # of interleaved 1-token expert GEMVs from the serving prefix
            # (policy/fused_infer.py pushes proprio through the fused stack
            # kernel against this K/V instead).
            (x_vlm, cos_v, sin_v, seg) = carry
            qv, kv_, vv = vlm.qkv(x_vlm, cos_v, sin_v)
            out = attention(
                qv, kv_, vv, q_segment_ids=seg, kv_segment_ids=seg,
                causal=False, impl=self.attn_impl,
                softcap=self.vlm_cfg.attn_softcap,
            )
            x_vlm = vlm.post_attn(x_vlm, out)
            return (x_vlm, cos_v, sin_v, seg), (kv_, vv)
        if self.mode == "vlm_only":
            # causal text-only pass through the vlm mixture (forward_vlm /
            # infer_text path, pizero_internvl.py:1200, :1005)
            (x_vlm, cos_v, sin_v, seg) = carry
            qv, kv_, vv = vlm.qkv(x_vlm, cos_v, sin_v)
            out = attention(
                qv, kv_, vv, q_segment_ids=seg, kv_segment_ids=seg,
                causal=True, impl=self.attn_impl,
                softcap=self.vlm_cfg.attn_softcap,
            )
            x_vlm = vlm.post_attn(x_vlm, out)
            return (x_vlm, cos_v, sin_v, seg), None
        if self.mode == "vlm_cached":
            # causal vlm pass over a fixed-size KV buffer (the cached
            # infer_text decode; reference pizero_internvl.py:1005-1048
            # decodes with its KV cache — round 1 re-ran the full prefix)
            from ..inference.kv_cache import write_kv

            (x_vlm, cos_v, sin_v, seg_q, kv_seg, offset) = carry
            k_buf, v_buf = scanned  # [B, total, KVH, D]
            qv, kv_, vv = vlm.qkv(x_vlm, cos_v, sin_v)
            k_buf = write_kv(k_buf, kv_, offset)
            v_buf = write_kv(v_buf, vv, offset)
            out = attention(
                qv, k_buf.astype(qv.dtype), v_buf.astype(qv.dtype),
                q_segment_ids=seg_q, kv_segment_ids=kv_seg,
                q_offset=offset, causal=True, impl=self.attn_impl,
                softcap=self.vlm_cfg.attn_softcap,
            )
            x_vlm = vlm.post_attn(x_vlm, out)
            return (x_vlm, cos_v, sin_v, seg_q, kv_seg, offset), (k_buf, v_buf)
        if self.mode in ("train", "prefix"):
            (x_vlm, x_pa, cos_v, sin_v, cos_pa, sin_pa, seg, lev, cond) = carry
            sv, spa = x_vlm.shape[1], x_pa.shape[1]
            # adaLN applies to action tokens only (level 2); the tied proprio
            # token keeps the plain norms (see MixtureBlock docstring)
            blend = (
                (lev[:, sv:] == 2)[:, :, None] if cond is not None else None
            )
            qv, kv_, vv = vlm.qkv(x_vlm, cos_v, sin_v)
            qp, kp, vp = expert.qkv(x_pa, cos_pa, sin_pa, cond, blend)
            q = jnp.concatenate([qv, qp], axis=1)
            k = jnp.concatenate([kv_, kp], axis=1)
            v = jnp.concatenate([vv, vp], axis=1)
            out = attention(
                q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                q_levels=lev, kv_levels=lev, causal=False, impl=self.attn_impl,
                softcap=self.vlm_cfg.attn_softcap,
            )
            x_vlm = vlm.post_attn(x_vlm, out[:, :sv])
            x_pa = expert.post_attn(x_pa, out[:, sv:], cond, blend)
            new_carry = (x_vlm, x_pa, cos_v, sin_v, cos_pa, sin_pa, seg, lev,
                         cond)
            if self.mode == "prefix":
                return new_carry, (k, v)  # rope'd K/V over [vlm|proprio]
            return new_carry, None
        else:  # suffix: action stream over cached prefix
            (x_act, cos_a, sin_a, seg_q, seg_kv, lev_q, lev_kv, cond) = carry
            k_pre, v_pre = scanned  # [B, Sp, KVH, D]
            qa, ka, va = expert.qkv(x_act, cos_a, sin_a, cond)
            k = jnp.concatenate([k_pre.astype(ka.dtype), ka], axis=1)
            v = jnp.concatenate([v_pre.astype(va.dtype), va], axis=1)
            out = attention(
                qa, k, v, q_segment_ids=seg_q, kv_segment_ids=seg_kv,
                q_levels=lev_q, kv_levels=lev_kv, causal=False,
                impl=self.attn_impl, softcap=self.vlm_cfg.attn_softcap,
            )
            x_act = expert.post_attn(x_act, out, cond)
            return (x_act, cos_a, sin_a, seg_q, seg_kv, lev_q, lev_kv,
                    cond), None


class JointModel(nn.Module):
    """Scanned joint stack + final per-mixture norms."""

    vlm_cfg: LLMConfig
    expert_cfg: LLMConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    attn_impl: str = "auto"
    adaptive_mode: str = ""

    def _scan(self, mode: str):
        layer_cls = JointLayer
        if self.remat and mode == "train":
            layer_cls = nn.remat(JointLayer, prevent_cse=False)
        return nn.scan(
            layer_cls,
            variable_axes={"params": 0, "quant": 0, "lora": 0},
            split_rngs={"params": True},
            in_axes=0,
            out_axes=0,
            length=self.vlm_cfg.num_layers,
        )(
            self.vlm_cfg, self.expert_cfg, mode, self.param_dtype,
            self.compute_dtype, self.attn_impl, self.adaptive_mode,
            name="layers",
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
        if mode == "vlm_prefix":
            (x_vlm, cos_v, sin_v, seg) = args
            _, kv = scan((x_vlm, cos_v, sin_v, seg), None)
            return kv  # (k [L,B,Sv,KVH,D], v [...]) — rope'd
        if mode == "vlm_cached":
            (x_vlm, cos_v, sin_v, seg_q, kv_seg, offset, k_bufs, v_bufs) = args
            carry, (new_k, new_v) = scan(
                (x_vlm, cos_v, sin_v, seg_q, kv_seg, offset), (k_bufs, v_bufs)
            )
            return vlm_norm(carry[0]), new_k, new_v
        if mode == "train":
            (x_vlm, x_pa, cos_v, sin_v, cos_pa, sin_pa, seg, lev, *rest) = args
            cond = rest[0] if rest else None
            carry, _ = scan(
                (x_vlm, x_pa, cos_v, sin_v, cos_pa, sin_pa, seg, lev, cond),
                None,
            )
            x_vlm, x_pa = carry[0], carry[1]
            return vlm_norm(x_vlm), expert_norm(x_pa)
        if mode == "prefix":
            (x_vlm, x_p, cos_v, sin_v, cos_p, sin_p, seg, lev) = args
            carry, kv = scan(
                (x_vlm, x_p, cos_v, sin_v, cos_p, sin_p, seg, lev, None), None
            )
            return kv  # (k [L,B,Sv+Sp,KVH,D], v [...])
        if mode == "suffix":
            (x_act, cos_a, sin_a, seg_q, seg_kv, lev_q, lev_kv, k_pre, v_pre,
             *rest) = args
            cond = rest[0] if rest else None
            carry, _ = scan(
                (x_act, cos_a, sin_a, seg_q, seg_kv, lev_q, lev_kv, cond),
                (k_pre, v_pre),
            )
            return expert_norm(carry[0])
        raise ValueError(mode)
