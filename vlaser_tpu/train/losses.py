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


def make_sft_loss(model):
    """loss_fn(params, batch, rng) for the VLM SFT train step. Batch keys:
    input_ids, labels, loss_weight, seg_ids, pixel_values, image_flags,
    optional positions (packing)."""

    def loss_fn(params, batch, rng):
        logits, _, _ = model.apply(
            params,
            batch["input_ids"],
            batch["pixel_values"],
            batch.get("image_flags"),
            seg_ids=batch.get("seg_ids"),
            positions=batch.get("positions"),
        )
        return weighted_ce_loss(logits, batch["labels"], batch.get("loss_weight"))

    return loss_fn
