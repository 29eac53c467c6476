"""PiZero-style flow-matching VLA (the Vlaser-2B-VLA model), TPU-native.

Parity surface: src/model/vla/pizero_internvl.py —
- construction (:154-330): InternViT vision + mlp1 + embed_tokens shared with
  the VLM; 768-wide action expert; proprio/action tied to the same expert
- block mask + position ids (:517-604): here the mask is the level rule fed to
  the flash kernel; positions start at 1 (vlm 1..S, proprio 1, action 2..)
- flow matching (:1050-1197): psi_t = (1-(1-sig_min)t)x0 + t*x1; loss
  ||v_psi - (x1 - (1-sig_min)x0)||^2
- cached inference (:798-936): one prefix forward (vlm+proprio) producing KV,
  then num_inference_steps Euler steps running only the action suffix.

The TPU redesign turns the denoise loop into a single jitted lax.scan over a
[L, B, Sp, KVH, D] prefix cache (north-star item, SURVEY.md §2.9.5); noise is
drawn from jax PRNG keys passed in explicitly.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import VLAConfig
from ..kernels import ops
from ..models.internvit import InternVisionModel
from ..models.layers import Dense, Embed, RMSNorm
from ..models.vlm import MLP1, scatter_image_embeds
from .joint import JointModel


def sinusoidal_pos_emb(t: jax.Array, dim: int, max_period: float) -> jax.Array:
    """modules.py:9-22 — t [B] -> [B, dim], fp32."""
    half = dim // 2
    freq = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / (half - 1)
    )
    emb = t.astype(jnp.float32)[:, None] * freq[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class ActionEncoder(nn.Module):
    """pi0 appendix action encoder (modules.py:25-55): Linear -> [concat time]
    -> SiLU -> Linear. time_cond=False (adaLN variants) drops the concat —
    time enters through the adaptive norms instead (pizero.py:86-102)."""

    width: int
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    time_cond: bool = True

    @nn.compact
    def __call__(self, action: jax.Array,
                 time_emb: Optional[jax.Array] = None) -> jax.Array:
        d = lambda f, name: Dense(f, use_bias=True, param_dtype=self.param_dtype,
                                  compute_dtype=self.compute_dtype, name=name)
        emb = d(self.width, "linear_1")(action)
        if self.time_cond:
            time_full = jnp.broadcast_to(
                time_emb[:, None, :], (*emb.shape[:-1], time_emb.shape[-1])
            ).astype(emb.dtype)
            emb = jnp.concatenate([time_full, emb], axis=-1)
        emb = nn.silu(d(self.width, "linear_2")(emb))
        return d(self.width, "linear_3")(emb)


class PiZeroVLA(nn.Module):
    cfg: VLAConfig
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    attn_impl: str = "auto"

    def setup(self):
        cfg = self.cfg
        vlm, expert = cfg.vlm, cfg.expert
        if cfg.backbone == "paligemma":
            from ..models.siglip import SiglipVisionModel

            self.vision_model = SiglipVisionModel(
                cfg.siglip, self.param_dtype, self.compute_dtype, self.remat,
                self.attn_impl,
            )
            self.multi_modal_projector = Dense(
                vlm.llm.hidden_size, use_bias=True, param_dtype=self.param_dtype,
                compute_dtype=self.compute_dtype,
            )
        else:
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
        self.joint = JointModel(
            vlm.llm, expert, self.param_dtype, self.compute_dtype, self.remat,
            self.attn_impl, cfg.adaptive_mode or "",
        )
        mkd = lambda f: Dense(f, use_bias=True, param_dtype=self.param_dtype,
                              compute_dtype=self.compute_dtype)
        if cfg.vision_in_expert:
            # second trainable tower + mlp1-like projector with an extra
            # Linear down to expert width (pizero_internvl.py:272-276, 785-789)
            self.vision_model_expert = InternVisionModel(
                vlm.vision, self.param_dtype, self.compute_dtype, self.remat,
                self.attn_impl,
            )
            self.expert_img_mlp = MLP1(vlm.vit_proj_in_dim, vlm.llm.hidden_size,
                                       self.param_dtype, self.compute_dtype)
            self.expert_img_proj = mkd(expert.hidden_size)
        self.proprio_encoder = mkd(expert.hidden_size)
        self.action_encoder = ActionEncoder(
            expert.hidden_size, self.param_dtype, self.compute_dtype,
            time_cond=not cfg.adaptive_mode,
        )
        self.action_decoder = mkd(cfg.action_dim)
        if cfg.use_lm_head:
            self.lm_head = Dense(
                vlm.llm.vocab_size, use_bias=False,
                param_dtype=self.param_dtype, compute_dtype=self.compute_dtype,
            )

    # ------------------------------------------------------------------ #
    # shared embedding / metadata builders
    # ------------------------------------------------------------------ #

    def _image_text_embeds(self, input_ids, pixel_values):
        """[B,S] ids + [T,H,W,3] tiles -> fused [B,S,llm_hidden]
        (pizero_internvl.py:718-796 / pizero.py:400-430 for paligemma)."""
        cfg = self.cfg.vlm
        if self.cfg.backbone == "paligemma":
            tok = self.embed_tokens(input_ids)
            vit = self.vision_model(pixel_values)  # [T, 256, siglip_hidden]
            vit = self.multi_modal_projector(vit)
            # PaliGemma: image features scaled by hidden^-0.5 (pizero.py:413);
            # the later sqrt(hidden) mixture scaling restores them to unit
            vit = vit / jnp.asarray(cfg.llm.hidden_size**0.5, vit.dtype)
            if self.cfg.vision_in_expert:
                # imgfeat ablation freezes the VLM-side image features
                # (pizero_internvl.py:773 .detach())
                vit = jax.lax.stop_gradient(vit)
            fused = scatter_image_embeds(input_ids, tok, vit, None,
                                         cfg.img_context_token_id)
            # per-mixture sqrt(hidden) scaling (joint_model.py:763-771)
            return fused * jnp.asarray(cfg.llm.hidden_size**0.5, fused.dtype)
        vit = self.vision_model(pixel_values, select_layer=cfg.select_layer)
        return self.fuse_vit_features(input_ids, vit)

    def vit_embed(self, pixel_values):
        """Patch conv + CLS + pos-emb (layer-0 input) — the hand-off point
        for the fused serving ViT stack (kernels/fused_vit.py)."""
        return self.vision_model.embed(pixel_values)

    def fuse_vit_features(self, input_ids, vit_hidden):
        """[T, 1+S_vit, C] ViT hidden states -> fused [B, S, llm_hidden]:
        CLS drop, pixel-shuffle, mlp1, IMG_CONTEXT scatter
        (pizero_internvl.py:718-796)."""
        cfg = self.cfg.vlm
        tok = self.embed_tokens(input_ids)
        vit = vit_hidden[:, 1:, :]
        t, s, c = vit.shape
        side = int(s**0.5)
        vit = vit.reshape(t, side, side, c)
        vit = ops.pixel_shuffle(vit, cfg.downsample_ratio, cfg.ps_version)
        vit = self.mlp1(vit.reshape(t, -1, vit.shape[-1]))
        if self.cfg.vision_in_expert:
            # VLM-side image features are frozen in the imgfeat ablation
            # (pizero_internvl.py:773 .detach())
            vit = jax.lax.stop_gradient(vit)
        return scatter_image_embeds(input_ids, tok, vit, None,
                                    cfg.img_context_token_id)

    def _expert_image_feats(self, pixel_values):
        """[T,H,W,3] -> [T, num_image_token, expert_hidden] via the second
        tower (pizero_internvl.py:775-789)."""
        cfg = self.cfg.vlm
        vit = self.vision_model_expert(pixel_values,
                                       select_layer=cfg.select_layer)
        vit = vit[:, 1:, :]
        t, s, c = vit.shape
        side = int(s**0.5)
        vit = vit.reshape(t, side, side, c)
        vit = ops.pixel_shuffle(vit, cfg.downsample_ratio, cfg.ps_version)
        vit = self.expert_img_mlp(vit.reshape(t, -1, vit.shape[-1]))
        return self.expert_img_proj(vit)

    def _scale_pa(self, x):
        if self.cfg.backbone == "paligemma":
            return x * jnp.asarray(self.cfg.expert.hidden_size**0.5, x.dtype)
        return x

    @property
    def _n_expert_img(self) -> int:
        """imgfeat ablation: expert-stream image tokens ahead of proprio
        (pizero_internvl.py:1105-1110: positions 1..256, proprio/action +256)."""
        return self.cfg.vlm.num_image_token if self.cfg.vision_in_expert else 0

    def _positions(self, batch: int):
        cfg = self.cfg
        n_pre = self._n_expert_img
        vlm_pos = jnp.broadcast_to(
            jnp.arange(1, cfg.max_image_text_tokens + 1)[None, :],
            (batch, cfg.max_image_text_tokens),
        )
        n_p = n_pre + cfg.num_proprio_tokens
        p_pos = jnp.broadcast_to(
            jnp.arange(1, n_p + 1)[None, :], (batch, n_p)
        )
        a_pos = jnp.broadcast_to(
            jnp.arange(n_p + 1, n_p + cfg.num_action_tokens + 1)[None, :],
            (batch, cfg.num_action_tokens),
        )
        return vlm_pos, p_pos, a_pos

    def _meta(self, text_mask: jax.Array, include_action: bool):
        """(segments, levels) over [vlm | (expert-img) proprio (| action)]."""
        cfg = self.cfg
        b = text_mask.shape[0]
        n_p = self._n_expert_img + cfg.num_proprio_tokens
        n_pa = n_p + (cfg.num_action_tokens if include_action else 0)
        seg = jnp.concatenate(
            [text_mask.astype(jnp.int32), jnp.ones((b, n_pa), jnp.int32)], axis=1
        )
        lev = jnp.concatenate(
            [
                jnp.zeros((b, cfg.max_image_text_tokens), jnp.int32),
                jnp.ones((b, n_p), jnp.int32),
                *( [jnp.full((b, cfg.num_action_tokens), 2, jnp.int32)]
                   if include_action else [] ),
            ],
            axis=1,
        )
        return seg, lev

    def _pa_prefix_embeds(self, pixel_values, proprio_embeds):
        """[(expert-img) | proprio] stream embeddings."""
        if not self.cfg.vision_in_expert:
            return proprio_embeds
        b = proprio_embeds.shape[0]
        feats = self._expert_image_feats(pixel_values)
        feats = feats.reshape(b, -1, feats.shape[-1])
        return jnp.concatenate([feats, proprio_embeds], axis=1)

    def _rope(self, positions, theta):
        return ops.rope_cos_sin(positions, self.cfg.expert.head_dim, theta)

    def _time_embed(self, t: jax.Array):
        """-> (encoder_time_emb, adaLN_cond): concat-into-encoder by default;
        adaLN variants route time through the adaptive norms instead
        (pizero.py:86-102, :483-495)."""
        cfg = self.cfg
        if cfg.adaptive_mode:
            cond = sinusoidal_pos_emb(
                t, cfg.time_hidden_size, cfg.time_max_period
            ).astype(self.compute_dtype)
            return None, cond
        return (
            sinusoidal_pos_emb(t, cfg.expert.hidden_size, cfg.time_max_period),
            None,
        )

    # ------------------------------------------------------------------ #
    # flow-matching training forward (pizero_internvl.py:1064-1197)
    # ------------------------------------------------------------------ #

    def __call__(
        self,
        input_ids: jax.Array,  # [B, S_it]
        pixel_values: jax.Array,  # [T, H, W, 3]
        text_mask: jax.Array,  # [B, S_it] 1=valid
        proprios: jax.Array,  # [B, cond_steps, proprio_dim]
        actions: jax.Array,  # [B, num_action_tokens, action_dim]
        t: jax.Array,  # [B] flow time
        x0: jax.Array,  # [B, num_action_tokens, action_dim] noise
    ) -> jax.Array:
        cfg = self.cfg
        b = input_ids.shape[0]
        x1 = actions
        tt = t[:, None, None]
        psi_t = (1.0 - (1.0 - cfg.flow_sig_min) * tt) * x0 + tt * x1

        embeds_vlm = self._image_text_embeds(input_ids, pixel_values)
        proprio_embeds = self.proprio_encoder(
            proprios.reshape(b, cfg.num_proprio_tokens, -1).astype(self.compute_dtype)
        )
        time_emb, cond = self._time_embed(t)
        action_embeds = self.action_encoder(
            psi_t.astype(self.compute_dtype), time_emb
        )
        pa_prefix = self._pa_prefix_embeds(pixel_values, proprio_embeds)
        x_pa = self._scale_pa(
            jnp.concatenate([pa_prefix, action_embeds], axis=1)
        )

        vlm_pos, p_pos, a_pos = self._positions(b)
        cos_v, sin_v = self._rope(vlm_pos, cfg.vlm.llm.rope_theta)
        cos_pa, sin_pa = self._rope(
            jnp.concatenate([p_pos, a_pos], axis=1), cfg.expert.rope_theta
        )
        seg, lev = self._meta(text_mask, include_action=True)

        _, pa_out = self.joint(
            "train", embeds_vlm, x_pa, cos_v, sin_v, cos_pa, sin_pa, seg, lev,
            cond,
        )
        action_out = pa_out[:, self._n_expert_img + cfg.num_proprio_tokens :]
        v_psi = self.action_decoder(action_out).astype(jnp.float32)
        d_psi = (x1 - (1.0 - cfg.flow_sig_min) * x0).astype(jnp.float32)
        return jnp.mean((v_psi - d_psi) ** 2)

    # ------------------------------------------------------------------ #
    # cached inference (pizero_internvl.py:798-936)
    # ------------------------------------------------------------------ #

    def prefix_forward(self, input_ids, pixel_values, text_mask, proprios):
        """One vlm+proprio pass -> per-layer K/V [L, B, S_it+1, KVH, D]."""
        embeds_vlm = self._image_text_embeds(input_ids, pixel_values)
        return self.prefix_forward_from_embeds(
            embeds_vlm, pixel_values, text_mask, proprios
        )

    def prefix_forward_from_embeds(self, embeds_vlm, pixel_values, text_mask,
                                   proprios):
        """prefix_forward taking pre-fused vlm embeddings (the batched fused
        serving path computes those through kernels/fused_vit).
        pixel_values is only consulted by the vision_in_expert ablation."""
        cfg = self.cfg
        b = embeds_vlm.shape[0]
        proprio_embeds = self.proprio_encoder(
            proprios.reshape(b, cfg.num_proprio_tokens, -1).astype(self.compute_dtype)
        )
        vlm_pos, p_pos, _ = self._positions(b)
        cos_v, sin_v = self._rope(vlm_pos, cfg.vlm.llm.rope_theta)
        cos_p, sin_p = self._rope(p_pos, cfg.expert.rope_theta)
        seg, lev = self._meta(text_mask, include_action=False)
        x_p = self._pa_prefix_embeds(pixel_values, proprio_embeds)
        k_pre, v_pre = self.joint(
            "prefix", embeds_vlm, self._scale_pa(x_p),
            cos_v, sin_v, cos_p, sin_p, seg, lev,
        )
        return k_pre, v_pre, seg, lev

    def prefix_vlm_forward(self, input_ids, pixel_values, text_mask):
        """VLM half of the prefix alone -> per-layer rope'd K/V
        [L, B, S_it, KVH, D]. Exactly equal to the vlm rows of
        prefix_forward's cache: level-0 tokens never attend proprio, so the
        vlm stream is independent of the expert (joint.py 'vlm_prefix').
        The serving path (policy/fused_infer.py) then runs proprio through
        the fused expert-stack kernel against this cache."""
        embeds_vlm = self._image_text_embeds(input_ids, pixel_values)
        return self.vlm_prefix_from_embeds(embeds_vlm, text_mask)

    def vlm_prefix_from_embeds(self, embeds_vlm, text_mask):
        """prefix_vlm_forward's joint half, taking pre-fused embeddings
        (the fused-ViT serving path computes those via vit_embed +
        kernels/fused_vit + fuse_vit_features)."""
        cfg = self.cfg
        vlm_pos, _, _ = self._positions(embeds_vlm.shape[0])
        cos_v, sin_v = self._rope(vlm_pos, cfg.vlm.llm.rope_theta)
        return self.joint(
            "vlm_prefix", embeds_vlm, cos_v, sin_v,
            text_mask.astype(jnp.int32),
        )

    def denoise_step(self, action, t, k_pre, v_pre, seg_pre, lev_pre):
        """One velocity evaluation of the action suffix (768-wide only)."""
        cfg = self.cfg
        b = action.shape[0]
        time_emb, cond = self._time_embed(t)
        action_embeds = self._scale_pa(
            self.action_encoder(action.astype(self.compute_dtype), time_emb)
        )
        _, _, a_pos = self._positions(b)
        cos_a, sin_a = self._rope(a_pos, cfg.expert.rope_theta)
        seg_q = jnp.ones((b, cfg.num_action_tokens), jnp.int32)
        lev_q = jnp.full((b, cfg.num_action_tokens), 2, jnp.int32)
        seg_kv = jnp.concatenate([seg_pre, seg_q], axis=1)
        lev_kv = jnp.concatenate([lev_pre, lev_q], axis=1)
        out = self.joint(
            "suffix", action_embeds, cos_a, sin_a, seg_q, seg_kv, lev_q, lev_kv,
            k_pre, v_pre, cond,
        )
        return self.action_decoder(out).astype(jnp.float32)

    def infer_action(
        self,
        input_ids: jax.Array,
        pixel_values: jax.Array,
        text_mask: jax.Array,
        proprios: jax.Array,
        noise: jax.Array,  # [B, num_action_tokens, action_dim] ~ N(0, I)
    ) -> jax.Array:
        """Prefix once, then num_inference_steps Euler steps as one lax.scan."""
        embeds_vlm = self._image_text_embeds(input_ids, pixel_values)
        return self.infer_action_from_embeds(
            embeds_vlm, pixel_values, text_mask, proprios, noise
        )

    def infer_action_from_embeds(
        self, embeds_vlm, pixel_values, text_mask, proprios, noise
    ) -> jax.Array:
        """infer_action taking pre-fused vlm embeddings (batched fused-ViT
        serving path; pixel_values only feeds the vision_in_expert
        ablation's second tower)."""
        cfg = self.cfg
        k_pre, v_pre, seg_pre, lev_pre = self.prefix_forward_from_embeds(
            embeds_vlm, pixel_values, text_mask, proprios
        )
        delta_t = 1.0 / cfg.num_inference_steps
        action0 = noise.astype(jnp.float32)
        if self.is_initializing():
            action, _ = self.denoise_scan_body(
                action0, jnp.zeros((), jnp.int32), delta_t, k_pre, v_pre,
                seg_pre, lev_pre,
            )
        else:
            action, _ = nn.scan(
                lambda mdl, a, i: mdl.denoise_scan_body(
                    a, i, delta_t, k_pre, v_pre, seg_pre, lev_pre
                ),
                variable_broadcast=("params", "quant", "lora"),
                split_rngs={"params": False},
            )(self, action0, jnp.arange(cfg.num_inference_steps))
        if cfg.final_action_clip_value is not None:
            action = jnp.clip(
                action, -cfg.final_action_clip_value, cfg.final_action_clip_value
            )
        return action[:, -cfg.horizon_steps :]

    def denoise_scan_body(self, action, i, delta_t, k_pre, v_pre, seg_pre, lev_pre):
        b = action.shape[0]
        t = jnp.full((b,), 0.0, jnp.float32) + i.astype(jnp.float32) * delta_t
        v = self.denoise_step(action, t, k_pre, v_pre, seg_pre, lev_pre)
        return action + delta_t * v, None

    def forward_vlm(self, input_ids, pixel_values, text_mask):
        """Causal text logits through the vlm mixture
        (pizero_internvl.py:1200 forward_vlm; requires use_lm_head)."""
        cfg = self.cfg
        b, s = input_ids.shape
        embeds = self._image_text_embeds(input_ids, pixel_values)
        pos = jnp.broadcast_to(jnp.arange(1, s + 1)[None, :], (b, s))
        cos_v, sin_v = self._rope(pos, cfg.vlm.llm.rope_theta)
        hidden = self.joint("vlm_only", embeds, cos_v, sin_v,
                            text_mask.astype(jnp.int32))
        return self.lm_head(hidden).astype(jnp.float32)

    def infer_text(self, input_ids, pixel_values, text_mask,
                   max_new_tokens: int = 16, eos_token_id: int = 2):
        """Greedy text generation on the joint vlm mixture with a KV cache
        (pizero_internvl.py:1005-1048 decodes over its cache): one causal
        prefill writes the prompt K/V into fixed [L, B, total] buffers, then
        each lax.scan step runs a single token against the buffers."""
        cfg = self.cfg
        llm = cfg.vlm.llm
        b, s = input_ids.shape
        total = s + max_new_tokens

        embeds = self._image_text_embeds(input_ids, pixel_values)
        pos = jnp.broadcast_to(jnp.arange(1, s + 1)[None, :], (b, s))
        cos_v, sin_v = self._rope(pos, llm.rope_theta)
        seg_prompt = text_mask.astype(jnp.int32)
        kv_seg = jnp.concatenate(
            [seg_prompt, jnp.zeros((b, max_new_tokens), jnp.int32)], axis=1
        )
        shape = (llm.num_layers, b, total, llm.num_kv_heads, llm.head_dim)
        k_bufs = jnp.zeros(shape, self.compute_dtype)
        v_bufs = jnp.zeros(shape, self.compute_dtype)
        hidden, k_bufs, v_bufs = self.joint(
            "vlm_cached", embeds, cos_v, sin_v, seg_prompt, kv_seg,
            jnp.zeros((), jnp.int32), k_bufs, v_bufs,
        )
        lengths = jnp.sum(seg_prompt, axis=1)
        last = jnp.take_along_axis(hidden, (lengths - 1)[:, None, None], axis=1)
        first_tok = jnp.argmax(
            self.lm_head(last[:, 0]).astype(jnp.float32), axis=-1
        ).astype(input_ids.dtype)
        done0 = first_tok == eos_token_id
        first_tok = jnp.where(done0, 0, first_tok)

        if self.is_initializing():
            return first_tok[:, None]

        def step(mdl, carry, i):
            tok, k_bufs, v_bufs, kv_seg, done, lengths = carry
            offset = s + i
            x = mdl.embed_tokens(tok[:, None])
            position = (lengths + 1 + i)[:, None]  # 1-based like _positions
            cos, sin = mdl._rope(position, llm.rope_theta)
            kv_seg = jax.lax.dynamic_update_slice(
                kv_seg, jnp.ones((b, 1), jnp.int32), (0, offset)
            )
            hidden, k_bufs, v_bufs = mdl.joint(
                "vlm_cached", x, cos, sin, jnp.ones((b, 1), jnp.int32),
                kv_seg, offset, k_bufs, v_bufs,
            )
            logits = mdl.lm_head(hidden[:, 0]).astype(jnp.float32)
            nxt = jnp.argmax(logits, axis=-1).astype(tok.dtype)
            done = jnp.logical_or(done, tok == eos_token_id)
            nxt = jnp.where(done, 0, nxt)
            done = jnp.logical_or(done, nxt == eos_token_id)
            return (nxt, k_bufs, v_bufs, kv_seg, done, lengths), tok

        _, toks = nn.scan(
            step,
            variable_broadcast=("params", "quant", "lora"),
            split_rngs={"params": False},
        )(self, (first_tok, k_bufs, v_bufs, kv_seg, done0, lengths),
          jnp.arange(max_new_tokens))
        return jnp.transpose(toks, (1, 0))

    def infer_action_naive(
        self, input_ids, pixel_values, text_mask, proprios, noise
    ) -> jax.Array:
        """No-cache oracle (pizero_internvl.py:938-1003): each Euler step runs
        the full joint [vlm|proprio|action] forward. Used by parity tests."""
        cfg = self.cfg
        b = input_ids.shape[0]
        embeds_vlm = self._image_text_embeds(input_ids, pixel_values)
        proprio_embeds = self.proprio_encoder(
            proprios.reshape(b, cfg.num_proprio_tokens, -1).astype(self.compute_dtype)
        )
        vlm_pos, p_pos, a_pos = self._positions(b)
        cos_v, sin_v = self._rope(vlm_pos, cfg.vlm.llm.rope_theta)
        cos_pa, sin_pa = self._rope(
            jnp.concatenate([p_pos, a_pos], axis=1), cfg.expert.rope_theta
        )
        seg, lev = self._meta(text_mask, include_action=True)
        pa_prefix = self._pa_prefix_embeds(pixel_values, proprio_embeds)
        delta_t = 1.0 / cfg.num_inference_steps

        action = noise.astype(jnp.float32)
        for i in range(cfg.num_inference_steps):
            t = jnp.full((b,), i * delta_t, jnp.float32)
            time_emb, cond = self._time_embed(t)
            action_embeds = self.action_encoder(
                action.astype(self.compute_dtype), time_emb
            )
            x_pa = self._scale_pa(
                jnp.concatenate([pa_prefix, action_embeds], axis=1)
            )
            _, pa_out = self.joint(
                "train", embeds_vlm, x_pa, cos_v, sin_v, cos_pa, sin_pa, seg,
                lev, cond,
            )
            v = self.action_decoder(
                pa_out[:, self._n_expert_img + cfg.num_proprio_tokens :]
            ).astype(jnp.float32)
            action = action + delta_t * v
        if cfg.final_action_clip_value is not None:
            action = jnp.clip(
                action, -cfg.final_action_clip_value, cfg.final_action_clip_value
            )
        return action[:, -cfg.horizon_steps :]
