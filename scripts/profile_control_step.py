"""Phase-level profile of the VLA control step on the real chip.

Times each phase of the serving control step (the north-star path,
SURVEY.md §3.4) in isolation, plus compute-stage ablations of the fused
ViT kernel, to locate optimization headroom against the rooflines in
docs/STATUS.md. Prints one JSON dict. Run on the real TPU (no env vars).
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from vlaser_tpu.core.config import vlaser_2b_vla
    from vlaser_tpu.core.quant import POLICY_PATTERNS, quantize_variables
    from vlaser_tpu.kernels.fused_vit import fused_vit_stack, pack_vit_stack
    from vlaser_tpu.policy.fused_infer import make_fused_infer_action
    from vlaser_tpu.policy.pizero import PiZeroVLA

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
        POLICY_PATTERNS,
    )

    # --- phase 1: ViT embed (conv patching + pos emb) ---------------------
    embed = jax.jit(lambda v, px: model.apply(v, px, method=model.vit_embed))
    res["vit_embed_ms"] = _timeit(embed, params, pixels)
    emb = embed(params, pixels)

    # --- phase 2: fused ViT kernel, whole + ablations ---------------------
    stack = pack_vit_stack(params)
    x1 = emb[0].astype(jnp.bfloat16)

    def vit(ab):
        return _timeit(
            lambda x: fused_vit_stack(
                x, **stack, num_heads=vcfg.num_heads,
                eps=vcfg.layer_norm_eps, qk_norm=vcfg.qk_normalization,
                ablate=ab,
            ),
            x1,
        )

    res["fused_vit_b1_ms"] = vit("")
    res["fused_vit_b1_nogelu_ms"] = vit("nogelu")
    res["fused_vit_b1_nosoftmax_ms"] = vit("nosoftmax")
    res["fused_vit_b1_noattn_ms"] = vit("noattn")

    # batch 8
    x8 = jnp.broadcast_to(emb.astype(jnp.bfloat16), (8, *emb.shape[1:]))
    res["fused_vit_b8_ms"] = _timeit(
        lambda x: fused_vit_stack(
            x, **stack, num_heads=vcfg.num_heads, eps=vcfg.layer_norm_eps,
            qk_norm=vcfg.qk_normalization,
        ),
        x8, iters=5,
    )
    res["fused_vit_b8_nosoftmax_ms"] = _timeit(
        lambda x: fused_vit_stack(
            x, **stack, num_heads=vcfg.num_heads, eps=vcfg.layer_norm_eps,
            qk_norm=vcfg.qk_normalization, ablate="nosoftmax",
        ),
        x8, iters=5,
    )

    # --- phase 3: full vlm prefix (embed + kernel + fuse + KV) ------------
    def _fused_prefix(v, i, px, m):
        e = model.apply(v, px, method=model.vit_embed)
        hidden = fused_vit_stack(
            e[0].astype(jnp.bfloat16), **pack_vit_stack(v),
            num_heads=vcfg.num_heads, eps=vcfg.layer_norm_eps,
            qk_norm=vcfg.qk_normalization,
        )
        embeds = model.apply(v, i, hidden[None].astype(e.dtype),
                             method=model.fuse_vit_features)
        return model.apply(v, embeds, m, method=model.vlm_prefix_from_embeds)

    res["prefix_full_ms"] = _timeit(jax.jit(_fused_prefix), params, ids,
                                    pixels, text_mask)

    # --- phase 4: whole control step at 10 / 20 denoise steps -------------
    infer10 = make_fused_infer_action(model)
    res["infer_total_ms"] = _timeit(infer10, params, ids, pixels, text_mask,
                                    proprios, noise)

    import dataclasses

    cfg20 = dataclasses.replace(cfg, num_inference_steps=20)
    model20 = PiZeroVLA(cfg20, param_dtype=jnp.bfloat16,
                        compute_dtype=jnp.bfloat16)
    infer20 = make_fused_infer_action(model20)
    t20 = _timeit(infer20, params, ids, pixels, text_mask, proprios, noise)
    res["infer_total_20step_ms"] = t20
    res["denoise_per_step_ms"] = (t20 - res["infer_total_ms"]) / 10.0
    res["denoise_10step_ms"] = res["denoise_per_step_ms"] * 10.0
    res["prefix_plus_overhead_ms"] = (
        res["infer_total_ms"] - res["denoise_10step_ms"]
    )

    for k, v in sorted(res.items()):
        res[k] = round(v, 3)
    print(json.dumps(res, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
