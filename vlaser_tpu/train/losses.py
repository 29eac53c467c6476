"""Loss functions.

Weighted shifted cross-entropy matching modeling_internvl_chat.py:206-243:
per-token loss * loss_weight, normalized by the weight sum — with the
`loss_reduction_all_gather` behavior (all-reduce AVG of the weight sum across
data-parallel ranks, :224-225) expressed as a psum/pmean over the mesh when
run inside shard_map, or plain global sum under GSPMD jit (equivalent since
the batch dim is sharded and jnp.sum is global).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

IGNORE_TOKEN_ID = -100


def weighted_ce_loss(
    logits: jax.Array,  # [B, N, V] fp32
    labels: jax.Array,  # [B, N] int
    loss_weight: Optional[jax.Array] = None,  # [B, N] f32
) -> jax.Array:
    """Shift-by-one weighted CE; -100 labels ignored."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_TOKEN_ID
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    if loss_weight is not None:
        w = loss_weight[:, 1:] * valid
    else:
        w = valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


def make_sft_loss(model, moe_aux_coef: float = 0.0):
    """loss_fn(params, batch, rng) for the VLM SFT train step. Batch keys:
    input_ids, labels, loss_weight, seg_ids, pixel_values, image_flags,
    optional positions (packing).

    moe_aux_coef > 0 adds the router load-balancing loss for MoE backbones
    (models/moe.py sows per-layer f/P vectors; combined with the HF
    load_balancing_loss_func semantics — the reference has no MoE)."""

    def loss_fn(params, batch, rng):
        apply_kwargs = dict(
            seg_ids=batch.get("seg_ids"),
            positions=batch.get("positions"),
        )
        args = (
            batch["input_ids"], batch["pixel_values"],
            batch.get("image_flags"),
        )
        if moe_aux_coef > 0.0:
            (logits, _, _), state = model.apply(
                params, *args, **apply_kwargs, mutable=["intermediates"],
            )
            from ..models.moe import router_aux_loss

            inter = state["intermediates"]
            # one sown (router_f, router_p) pair per MoE stack
            fs, ps = [], []

            def walk(node):
                if isinstance(node, dict):
                    if "router_f" in node:
                        fs.append(node["router_f"][0])
                        ps.append(node["router_p"][0])
                    else:
                        for v in node.values():
                            walk(v)

            walk(inter)
            aux = sum(router_aux_loss(f, p) for f, p in zip(fs, ps))
            ce = weighted_ce_loss(logits, batch["labels"],
                                  batch.get("loss_weight"))
            return ce + moe_aux_coef * aux
        logits, _, _ = model.apply(params, *args, **apply_kwargs)
        return weighted_ce_loss(logits, batch["labels"], batch.get("loss_weight"))

    return loss_fn


def chunked_weighted_ce(
    hidden: jax.Array,  # [B, N, H] (pre-head)
    vocab_table: jax.Array,  # [V, H] (tied embedding) or [H, V] kernel
    labels: jax.Array,  # [B, N]
    loss_weight: Optional[jax.Array] = None,
    chunk: int = 512,
    table_is_kernel: bool = False,
) -> jax.Array:
    """Shift-by-one weighted CE computed in sequence chunks so the [N, V]
    fp32 logits never materialize (the vocab tensor dominates HBM for
    long-context SFT at 2B scale: 2048 x 151k fp32 = 1.2 GB per copy, and
    fwd+bwd holds several). Each chunk's logits are recomputed in the
    backward via jax.checkpoint; gradients to hidden and the vocab table
    accumulate across chunks through the scan."""
    b, n, h = hidden.shape
    sh = hidden[:, :-1].reshape(-1, h)
    sl = labels[:, 1:].reshape(-1)
    if loss_weight is not None:
        w = loss_weight[:, 1:].reshape(-1)
    else:
        w = jnp.ones_like(sl, jnp.float32)
    valid = sl != IGNORE_TOKEN_ID
    w = w * valid
    safe = jnp.where(valid, sl, 0)

    total = sh.shape[0]
    pad = (-total) % chunk
    if pad:
        sh = jnp.pad(sh, ((0, pad), (0, 0)))
        safe = jnp.pad(safe, (0, pad))
        w = jnp.pad(w, (0, pad))
    k = sh.shape[0] // chunk
    sh = sh.reshape(k, chunk, h)
    safe = safe.reshape(k, chunk)
    w = w.reshape(k, chunk)

    kernel = vocab_table.T if not table_is_kernel else vocab_table  # [H, V]

    @jax.checkpoint
    def chunk_nll(h_c, lab_c, w_c, kern):
        logits = jnp.dot(
            h_c, kern.astype(h_c.dtype), preferred_element_type=jnp.float32
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, lab_c[:, None], axis=-1)[:, 0]
        return jnp.sum(nll * w_c)

    def body(acc, xs):
        h_c, lab_c, w_c = xs
        return acc + chunk_nll(h_c, lab_c, w_c, kernel), None

    loss_sum, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (sh, safe, w))
    return loss_sum / jnp.maximum(jnp.sum(w), 1e-8)


def make_sft_loss_chunked(model, chunk: int = 512):
    """make_sft_loss variant that never materializes full logits; reads the
    (tied) vocab table / lm_head kernel straight from the param tree."""

    def loss_fn(params, batch, rng):
        _, hidden, _ = model.apply(
            params,
            batch["input_ids"],
            batch["pixel_values"],
            batch.get("image_flags"),
            seg_ids=batch.get("seg_ids"),
            positions=batch.get("positions"),
            return_logits=False,
        )
        lm_q = params.get("quant", {}).get("language_model", {})
        p = params["params"]["language_model"]
        if model.cfg.llm.tie_word_embeddings:
            if "embed_tokens" in lm_q:  # int8 base (core/quant.py)
                eq = lm_q["embed_tokens"]
                table = (eq["embedding_q"].astype(jnp.bfloat16)
                         * eq["embedding_scale"].astype(jnp.bfloat16))
            else:
                table = p["embed_tokens"]["embedding"]
            is_kernel = False
        else:
            if "lm_head" in lm_q:
                hq = lm_q["lm_head"]
                table = (hq["kernel_q"].astype(jnp.bfloat16)
                         * hq["kernel_scale"].astype(jnp.bfloat16))
            else:
                table = p["lm_head"]["kernel"]
            is_kernel = True
        return chunked_weighted_ce(
            hidden, table, batch["labels"], batch.get("loss_weight"),
            chunk=chunk, table_is_kernel=is_kernel,
        )

    return loss_fn
