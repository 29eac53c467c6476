"""Fused single-kernel denoise for VLA serving (batch 1).

The 10-step Euler denoise loop is the dominant cost of the control step
(docs/STATUS.md roofline): each step streams the whole 768-wide action
expert from HBM for a 4-row GEMV chain. This module drives every denoise
step through ONE `fused_int8_stack` pallas_call (kernels/fused_decode.py —
the same kernel that owns the VLM decode stream; its R rows are the 4
action tokens and its external KV block is the vlm+proprio prefix cache),
replacing ~200 XLA ops per step with one launch whose weight DMAs are
software-pipelined against compute.

Prefill (ViT + joint vlm+proprio prefix) stays on the XLA path — it is
MXU-bound. The tiny per-step modules around the stack (sinusoidal time
embedding, ActionEncoder, final expert norm, action decoder) run as plain
XLA ops between kernel launches.

Reference parity: semantics match PiZeroVLA.infer_action (the reference's
cached `infer_action`, src/model/vla/pizero_internvl.py:798-936); the
kernel replaces only how each step's expert stack executes. Requires an
int8-quantized model (core/quant.POLICY_PATTERNS), plain RMSNorm mixtures
(no adaLN), no vision-in-expert, internvl backbone, batch 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..kernels import ops
from ..kernels.fused_decode import NEG_INF, fused_int8_stack
from ..kernels.fused_vit import fused_vit_stack, pack_vit_stack
from ..inference.fused_runner import _pick_tile
from .pizero import sinusoidal_pos_emb


def pack_expert_stack(variables):
    """Expert-mixture scanned weights -> fused kernel layout (the expert
    twin of inference/fused_runner.pack_qwen2_stack; MixtureBlock stores
    projections at the layer root, not under 'self_attn')."""
    from ..core.quant import quantize_int8

    p = variables["params"]["joint"]["layers"]["expert"]
    q = (variables.get("quant", {}).get("joint", {}).get("layers", {})
         .get("expert", {}))

    def wpair(*path):
        node = q
        for k in path:
            node = node.get(k, {})
        if "kernel_q" in node:
            return node["kernel_q"], node["kernel_scale"].astype(jnp.float32)
        # leaves under quantize_variables' 4096-element floor (tiny test
        # configs) stay in params; quantize them here so the kernel always
        # sees int8 + [L, 1, N] scales
        node = p
        for k in path:
            node = node[k]
        return quantize_int8(node["kernel"], reduce_axis=-2)

    wq, sq = wpair("q_proj")
    wk, sk = wpair("k_proj")
    wv, sv = wpair("v_proj")
    wo, so = wpair("o_proj")
    wg, sg = wpair("mlp", "gate_proj")
    wu, su = wpair("mlp", "up_proj")
    wd, sd = wpair("mlp", "down_proj")
    L = wq.shape[0]

    def bias(name, n):
        if name in p and "bias" in p[name]:
            return p[name]["bias"].astype(jnp.float32)
        return jnp.zeros((L, n), jnp.float32)

    return dict(
        ln1=p["input_layernorm"]["weight"].astype(jnp.float32),
        ln2=p["post_attention_layernorm"]["weight"].astype(jnp.float32),
        bq=bias("q_proj", wq.shape[-1]),
        bk=bias("k_proj", wk.shape[-1]),
        bv=bias("v_proj", wv.shape[-1]),
        wq=wq, sq=sq, wk=wk, sk=sk, wv=wv, sv=sv, wo=wo, so=so,
        wg=wg, sg=sg, wu=wu, su=su, wd=wd, sd=sd,
        final_norm=variables["params"]["joint"]["expert_norm"]["weight"]
        .astype(jnp.float32),
    )


def _dense(p, x):
    """Tiny bf16 Dense from raw params (ActionEncoder / action_decoder are
    not quantized — they are < 4096-element streams)."""
    y = x.astype(jnp.bfloat16) @ p["kernel"].astype(jnp.bfloat16)
    return y + p["bias"].astype(jnp.bfloat16)


def _encode_actions(enc_params, action, time_emb):
    """ActionEncoder forward (policy/pizero.py:45-67, time_cond=True)."""
    emb = _dense(enc_params["linear_1"], action)
    time_full = jnp.broadcast_to(
        time_emb[:, None, :].astype(emb.dtype),
        (*emb.shape[:-1], time_emb.shape[-1]),
    )
    emb = jnp.concatenate([time_full, emb], axis=-1)
    emb = jax.nn.silu(_dense(enc_params["linear_2"], emb))
    return _dense(enc_params["linear_3"], emb)


def make_fused_infer_action(model, *, interpret: bool | None = None):
    """-> jitted fn(variables, input_ids, pixel_values, text_mask, proprios,
    noise) with PiZeroVLA.infer_action semantics, denoise steps through the
    fused int8 stack kernel. Batch 1."""
    cfg = model.cfg
    assert cfg.backbone != "paligemma", "fused denoise targets the 2B recipe"
    assert not cfg.adaptive_mode and not cfg.vision_in_expert, (
        "fused denoise supports the plain-RMSNorm checkpoint family"
    )
    expert = cfg.expert
    n_p = cfg.num_proprio_tokens
    R = cfg.num_action_tokens
    steps = cfg.num_inference_steps
    delta_t = 1.0 / steps
    mlp_tile = _pick_tile(expert.intermediate_size, expert.hidden_size)

    @jax.jit
    def infer(variables, input_ids, pixel_values, text_mask, proprios, noise):
        b = input_ids.shape[0]
        assert b == 1, "fused denoise path is single-stream (batch 1)"
        stack = pack_expert_stack(variables)
        enc = variables["params"]["action_encoder"]
        dec = variables["params"]["action_decoder"]
        itp = (jax.default_backend() != "tpu") if interpret is None \
            else interpret

        # 1) vlm half of the prefix alone (level-0 tokens never attend
        # proprio, so this equals the vlm rows of prefix_forward's cache —
        # and drops 28 layers of interleaved 1-token expert GEMVs).
        # The ViT encoder runs through the fused single-kernel stack when
        # the serving config allows (select_layer=-1, one 448px tile):
        # measured 5.49 vs 6.69 ms for the XLA encoder (kernels/fused_vit).
        vcfg = cfg.vlm.vision
        from ..kernels.fused_vit import supports_fused_vit

        if cfg.vlm.select_layer in (-1, vcfg.num_layers) \
                and supports_fused_vit(vcfg) \
                and pixel_values.shape[0] == 1:
            emb = model.apply(variables, pixel_values,
                              method=model.vit_embed)  # [1, 1+S_vit, C]
            hidden = fused_vit_stack(
                emb[0].astype(jnp.bfloat16),
                **pack_vit_stack(variables),
                num_heads=vcfg.num_heads, eps=vcfg.layer_norm_eps,
                qk_norm=vcfg.qk_normalization, interpret=itp,
            )
            embeds = model.apply(
                variables, input_ids, hidden[None].astype(emb.dtype),
                method=model.fuse_vit_features,
            )
            k_vlm, v_vlm = model.apply(
                variables, embeds, text_mask,
                method=model.vlm_prefix_from_embeds,
            )
        else:
            k_vlm, v_vlm = model.apply(
                variables, input_ids, pixel_values, text_mask,
                method=model.prefix_vlm_forward,
            )
        k_vlm = k_vlm[:, 0].astype(jnp.bfloat16)  # [L, Sv, KVH, D]
        v_vlm = v_vlm[:, 0].astype(jnp.bfloat16)
        vlm_mask = jnp.where(text_mask[0] > 0, 0.0, NEG_INF)[None, :]

        # 2) proprio rows fold into denoise step 0: one [proprio | action]
        # pass against the vlm-only external KV shares the expert weight
        # stream that a separate proprio pass would pay again (each pass is
        # HBM-bound on the int8 stack — measured 0.9 ms/pass; this is one
        # pass of eleven removed). The proprio K/V the pass returns are the
        # same values a standalone pass computes: same inputs, same weights,
        # same external block, and the block mask keeps proprio rows blind
        # to the action rows.
        pr = variables["params"]["proprio_encoder"]
        x_p = _dense(pr, proprios.reshape(1, n_p, -1).astype(jnp.bfloat16))
        p_pos = jnp.arange(1, n_p + 1, dtype=jnp.float32)
        cos_p, sin_p = ops.rope_cos_sin(p_pos, expert.head_dim,
                                        expert.rope_theta)
        a_pos = jnp.arange(n_p + 1, n_p + R + 1, dtype=jnp.float32)
        cos, sin = ops.rope_cos_sin(a_pos, expert.head_dim,
                                    expert.rope_theta)  # [R, D]
        cos = cos.astype(jnp.bfloat16)
        sin = sin.astype(jnp.bfloat16)
        cos_pa = jnp.concatenate([cos_p.astype(jnp.bfloat16), cos], axis=0)
        sin_pa = jnp.concatenate([sin_p.astype(jnp.bfloat16), sin], axis=0)
        # [proprio | action] self block: proprio attends proprio only;
        # action attends everything (pizero block mask, level 1 vs 2)
        self_mask0 = jnp.concatenate(
            [
                jnp.concatenate(
                    [jnp.zeros((n_p, n_p), jnp.float32),
                     jnp.full((n_p, R), NEG_INF, jnp.float32)], axis=1
                ),
                jnp.zeros((R, n_p + R), jnp.float32),
            ],
            axis=0,
        )

        def run_stack(x_rows, cs, sn, selfm, extm, k_e, v_e):
            return fused_int8_stack(
                x_rows, cs, sn, selfm, extm,
                stack["ln1"], stack["ln2"],
                stack["bq"], stack["bk"], stack["bv"],
                stack["wq"], stack["sq"], stack["wk"], stack["sk"],
                stack["wv"], stack["sv"], stack["wo"], stack["so"],
                stack["wg"], stack["sg"], stack["wu"], stack["su"],
                stack["wd"], stack["sd"],
                k_e, v_e,
                eps=expert.rms_norm_eps,
                mlp_tile=mlp_tile,
                interpret=itp,
            )

        def decode_velocity(x_out):
            hidden = ops.rms_norm(x_out, stack["final_norm"],
                                  eps=expert.rms_norm_eps)
            return _dense(dec, hidden).astype(jnp.float32)[None]

        def encode_step(action, i):
            t = jnp.full((1,), i * delta_t, jnp.float32)
            time_emb = sinusoidal_pos_emb(
                t, expert.hidden_size, cfg.time_max_period
            )
            return _encode_actions(enc, action.astype(jnp.bfloat16), time_emb)

        # step 0 (merged): builds the proprio K/V while denoising t=0
        action0 = noise.astype(jnp.float32)
        x_a0 = encode_step(action0, jnp.float32(0.0))
        x0 = jnp.concatenate([x_p[0], x_a0[0]], axis=0)  # [n_p + R, hidden]
        x_out0, k_pa, v_pa = run_stack(x0, cos_pa, sin_pa, self_mask0,
                                       vlm_mask, k_vlm, v_vlm)
        action = action0 + delta_t * decode_velocity(x_out0[n_p:])

        # 3) full prefix cache = [vlm | proprio] for steps 1..N-1
        k_ext = jnp.concatenate([k_vlm, k_pa[:, :n_p].astype(jnp.bfloat16)],
                                axis=1)
        v_ext = jnp.concatenate([v_vlm, v_pa[:, :n_p].astype(jnp.bfloat16)],
                                axis=1)
        ext_mask = jnp.concatenate(
            [vlm_mask, jnp.zeros((1, n_p), jnp.float32)], axis=1
        )
        self_mask = jnp.zeros((R, R), jnp.float32)

        def step(action, i):
            x = encode_step(action, i.astype(jnp.float32))
            x_out, _, _ = run_stack(x[0], cos, sin, self_mask, ext_mask,
                                    k_ext, v_ext)
            return action + delta_t * decode_velocity(x_out), None

        if steps > 1:
            action, _ = jax.lax.scan(step, action, jnp.arange(1, steps))
        if cfg.final_action_clip_value is not None:
            action = jnp.clip(action, -cfg.final_action_clip_value,
                              cfg.final_action_clip_value)
        return action[:, -cfg.horizon_steps:]

    return infer


def make_batched_infer_action(model, *, interpret: bool | None = None):
    """Multi-stream serving (one tile per sample, any batch): the ViT runs
    through the batched fused encoder stack (kernels/fused_vit.py — at
    batch 8 the XLA encoder is elementwise-HBM-bound and attention-dispatch
    bound, measured 79ms vs the kernel's in-VMEM pass), then the joint
    prefix + denoise scan stay on the XLA path, which is MXU-bound at
    batch 8. Semantics match PiZeroVLA.infer_action exactly."""
    cfg = model.cfg
    vcfg = cfg.vlm.vision
    assert cfg.backbone != "paligemma" and not cfg.vision_in_expert
    from ..kernels.fused_vit import supports_fused_vit

    if (cfg.vlm.select_layer not in (-1, vcfg.num_layers)
            or not supports_fused_vit(vcfg)):
        # the kernel runs the FULL stack with LayerNorm blocks: configs that
        # read an earlier hidden state (select_layer=-2, the RoboTwin
        # family) or use rms_norm/bias-free ViTs stay on the XLA path
        return jax.jit(
            lambda variables, input_ids, pixel_values, text_mask, proprios,
            noise: model.apply(
                variables, input_ids, pixel_values, text_mask, proprios,
                noise, method=model.infer_action,
            )
        )

    @jax.jit
    def infer(variables, input_ids, pixel_values, text_mask, proprios, noise):
        itp = (jax.default_backend() != "tpu") if interpret is None \
            else interpret
        emb = model.apply(variables, pixel_values, method=model.vit_embed)
        hidden = fused_vit_stack(
            emb.astype(jnp.bfloat16), **pack_vit_stack(variables),
            num_heads=vcfg.num_heads, eps=vcfg.layer_norm_eps,
            qk_norm=vcfg.qk_normalization, interpret=itp,
        )
        embeds = model.apply(
            variables, input_ids, hidden.astype(emb.dtype),
            method=model.fuse_vit_features,
        )
        return model.apply(
            variables, embeds, pixel_values, text_mask, proprios, noise,
            method=model.infer_action_from_embeds,
        )

    return infer
