"""Phase-level profile of the VLA control step on the real chip.

Times each phase of the serving control step (the north-star path,
SURVEY.md §3.4) in isolation, plus compute-stage ablations of the fused
ViT kernel, to locate optimization headroom against the rooflines in
docs/STATUS.md. Prints one JSON dict. Run on the real TPU (no env vars).

All timings go through utils/benchmark.time_scanned: on the axon-tunnel
backend `block_until_ready` acknowledges before device completion, so
naive timing loops measure only Python dispatch. time_scanned chains
dependent iterations inside one jitted lax.scan and subtracts the
measured host round-trip.
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vlaser_tpu.core.config import vlaser_2b_vla
    from vlaser_tpu.core.quant import (POLICY_W8A8_ACT_PATTERNS,
                                       POLICY_W8A8_PATTERNS,
                                       quantize_variables)
    from vlaser_tpu.kernels.fused_vit import fused_vit_stack, pack_vit_stack
    from vlaser_tpu.policy.fused_infer import (make_batched_infer_action,
                                               make_fused_infer_action)
    from vlaser_tpu.policy.pizero import PiZeroVLA
    from vlaser_tpu.utils.benchmark import time_scanned

    res = {}
    cfg = vlaser_2b_vla()
    model = PiZeroVLA(cfg, param_dtype=jnp.bfloat16,
                      compute_dtype=jnp.bfloat16)
    B, S = 1, cfg.max_image_text_tokens
    img = cfg.vlm.vision.image_size
    vcfg = cfg.vlm.vision

    ids = np.full((B, S), cfg.vlm.pad_token_id, np.int32)
    ids[:, :256] = cfg.vlm.img_context_token_id
    ids[:, 256:300] = 7
    text_mask = np.zeros((B, S), np.int32)
    text_mask[:, :300] = 1
    ids, text_mask = jnp.asarray(ids), jnp.asarray(text_mask)
    proprios = jnp.zeros((B, cfg.cond_steps, cfg.proprio_dim), jnp.float32)
    pixels = jnp.full((B, img, img, 3), 0.5, jnp.float32)
    noise = jnp.zeros((B, cfg.num_action_tokens, cfg.action_dim))

    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), ids, pixels, text_mask, proprios,
            noise, jnp.zeros((B,)), noise,
        )
    )
    params = quantize_variables(
        jax.jit(lambda: jax.tree_util.tree_map(
            lambda s: (jax.random.normal(jax.random.PRNGKey(0), s.shape,
                                         jnp.float32) * 0.02).astype(s.dtype),
            shapes,
        ))(),
        POLICY_W8A8_PATTERNS,
        act_quant_patterns=POLICY_W8A8_ACT_PATTERNS,
    )

    def ms(step_fn, carry0, iters=40, repeats=3):
        return time_scanned(step_fn, carry0, params, iters=iters,
                            repeats=repeats) * 1e3

    # --- phase 1: ViT embed (conv patching + pos emb) ---------------------
    def embed_step(c, v):
        e = model.apply(v, pixels + c * 1e-9, method=model.vit_embed)
        return jnp.mean(e).astype(jnp.float32)

    res["vit_embed_ms"] = ms(embed_step, jnp.zeros(()))

    # --- phase 2: fused ViT kernel, whole + ablations ---------------------
    emb = jax.jit(
        lambda v, px: model.apply(v, px, method=model.vit_embed)
    )(params, pixels)
    x1 = emb[0].astype(jnp.bfloat16)
    x8 = jnp.broadcast_to(emb.astype(jnp.bfloat16), (8, *emb.shape[1:]))

    def vit_ms(x0, ab, iters=40):
        def step(c, v):
            x = x0 + c.astype(jnp.bfloat16) * 1e-9
            h = fused_vit_stack(
                x, **pack_vit_stack(v), num_heads=vcfg.num_heads,
                eps=vcfg.layer_norm_eps, qk_norm=vcfg.qk_normalization,
                ablate=ab,
            )
            return jnp.mean(h).astype(jnp.float32)

        return ms(step, jnp.zeros(()), iters=iters)

    res["fused_vit_b1_ms"] = vit_ms(x1, "")
    res["fused_vit_b1_nogelu_ms"] = vit_ms(x1, "nogelu")
    res["fused_vit_b1_nosoftmax_ms"] = vit_ms(x1, "nosoftmax")
    res["fused_vit_b1_noattn_ms"] = vit_ms(x1, "noattn")
    res["fused_vit_b8_ms"] = vit_ms(x8, "", iters=10)
    res["fused_vit_b8_nosoftmax_ms"] = vit_ms(x8, "nosoftmax", iters=10)

    # XLA encoder for comparison (the non-fused path)
    def xla_vit_step(c, v):
        h = model.apply(v, pixels + c * 1e-9, method=model.vit_encode)
        return jnp.mean(h).astype(jnp.float32)

    if hasattr(model, "vit_encode"):
        res["xla_vit_b1_ms"] = ms(xla_vit_step, jnp.zeros(()))

    # --- phase 3: full vlm prefix (embed + kernel + fuse + KV) ------------
    def _fused_prefix(v, px):
        e = model.apply(v, px, method=model.vit_embed)
        hidden = fused_vit_stack(
            e[0].astype(jnp.bfloat16), **pack_vit_stack(v),
            num_heads=vcfg.num_heads, eps=vcfg.layer_norm_eps,
            qk_norm=vcfg.qk_normalization,
        )
        embeds = model.apply(v, ids, hidden[None].astype(e.dtype),
                             method=model.fuse_vit_features)
        return model.apply(v, embeds, text_mask,
                           method=model.vlm_prefix_from_embeds)

    def prefix_step(c, v):
        kv = _fused_prefix(v, pixels + c * 1e-9)
        return jnp.mean(kv[0][0].astype(jnp.float32))

    res["prefix_full_ms"] = ms(prefix_step, jnp.zeros(()))

    # --- phase 4: whole control step at 10 / 20 denoise steps -------------
    infer10 = make_fused_infer_action(model)

    def infer_step(c, v):
        feed = jnp.mean(c) * 1e-6
        out = infer10(v, ids, pixels + feed, text_mask, proprios,
                      noise + feed)
        return out.astype(jnp.float32)

    carry0 = jnp.zeros((B, cfg.horizon_steps, cfg.action_dim), jnp.float32)
    res["infer_total_ms"] = ms(infer_step, carry0)

    import dataclasses

    cfg20 = dataclasses.replace(cfg, num_inference_steps=20)
    model20 = PiZeroVLA(cfg20, param_dtype=jnp.bfloat16,
                        compute_dtype=jnp.bfloat16)
    infer20 = make_fused_infer_action(model20)

    def infer20_step(c, v):
        feed = jnp.mean(c) * 1e-6
        out = infer20(v, ids, pixels + feed, text_mask, proprios,
                      noise + feed)
        return out.astype(jnp.float32)

    t20 = ms(infer20_step, carry0)
    res["infer_total_20step_ms"] = t20
    res["denoise_per_step_ms"] = (t20 - res["infer_total_ms"]) / 10.0
    res["denoise_10step_ms"] = res["denoise_per_step_ms"] * 10.0
    res["prefix_plus_overhead_ms"] = (
        res["infer_total_ms"] - res["denoise_10step_ms"]
    )

    # --- batch 8 step (the aggregate-throughput path) ----------------------
    binfer = make_batched_infer_action(model)
    B8 = 8
    ids8 = jnp.broadcast_to(ids, (B8, S))
    mask8 = jnp.broadcast_to(text_mask, (B8, S))
    pr8 = jnp.zeros((B8, cfg.cond_steps, cfg.proprio_dim), jnp.float32)

    def infer8_step(c, v):
        feed = jnp.mean(c) * 1e-6
        px = jnp.full((B8, img, img, 3), 0.5, jnp.float32) + feed
        nz = jnp.zeros((B8, cfg.num_action_tokens, cfg.action_dim)) + feed
        return binfer(v, ids8, px, mask8, pr8, nz).astype(jnp.float32)

    carry8 = jnp.zeros((B8, cfg.horizon_steps, cfg.action_dim), jnp.float32)
    res["infer_b8_total_ms"] = ms(infer8_step, carry8, iters=10, repeats=2)

    for k, v in sorted(res.items()):
        res[k] = round(v, 3)
    print(json.dumps(res, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
