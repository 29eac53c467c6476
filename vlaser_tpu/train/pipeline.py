"""SPMD pipeline parallelism over a `stage` mesh axis.

The reference's only PP is inference-time naive layer placement
(`split_model` device_map, internvl_chat/eval/eval_example.py:84-108) and
SURVEY.md §2.8 scopes training PP to "provide GSPMD stage sharding if
>=34B configs are ported". This module provides that machinery the
TPU-native way for the 34B+ tier (core/config.internvl3_38b): the layer
stack is split into `n_stages` contiguous chunks, one per device along the
`stage` axis, and microbatches flow through the ring via `lax.ppermute`
(GPipe schedule: M + n_stages - 1 lockstep ticks, bubble fraction
(n-1)/(M+n-1)). Backward falls out of autodiff — the reversed scan +
reversed ppermute is the mirrored pipeline.

All-broadcast per-microbatch constants (rope tables, segment ids) ride a
device-local gather on the tick index rather than the ring, so only the
activation slab moves over ICI each tick.

Two layers of API:
  - spmd_pipeline(stage_fn, ...): generic — any per-layer function.
  - pipeline_llm_forward(...): the Qwen2 decoder stack (models/qwen2.py
    Qwen2Layer) through a pipeline, parity-tested against the nn.scan
    stack in tests/test_pipeline.py.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

STAGE_AXIS = "stage"


def _pvary(x, axis_name):
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (axis_name,), to="varying")
    return jax.lax.pvary(x, (axis_name,))


def _stage_loop(stage_fn, local_params, x_mb, consts, axis_name):
    """Per-device pipeline loop. x_mb [M, mb, ...]; consts is a pytree of
    [M, ...] per-microbatch constants (replicated on every device)."""
    n = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    m = x_mb.shape[0]
    ticks = m + n - 1
    perm = [(j, j + 1) for j in range(n - 1)]  # stage r -> r+1

    state = _pvary(jnp.zeros_like(x_mb[0]), axis_name)
    outputs = _pvary(jnp.zeros_like(x_mb), axis_name)

    def tick(carry, t):
        state, outputs = carry
        # stage 0 injects microbatch t (clamped; injections past M-1 are
        # bubble garbage that never reaches a valid output slot)
        inj = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, m - 1), keepdims=False
        )
        state = jnp.where(rank == 0, inj, state)
        # this device currently holds microbatch (t - rank)
        mb_idx = jnp.clip(t - rank, 0, m - 1)
        c = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, mb_idx, keepdims=False),
            consts,
        )
        out = stage_fn(local_params, state, c)
        # last stage banks microbatch t-(n-1); bubble ticks (t < n-1) write
        # garbage at slot 0 which the t = n-1 valid write overwrites
        widx = jnp.clip(t - (n - 1), 0, m - 1)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, out, widx, axis=0
        )
        state = jax.lax.ppermute(out, axis_name, perm)
        return (state, outputs), None

    (_, outputs), _ = jax.lax.scan(
        tick, (state, outputs), jnp.arange(ticks)
    )
    # only the last stage's buffer is real; replicate it to every device
    mask = (rank == n - 1).astype(outputs.dtype)
    return jax.lax.psum(outputs * mask, axis_name)


def spmd_pipeline(
    stage_fn: Callable[[Any, jax.Array, Any], jax.Array],
    *,
    n_microbatches: int,
    axis: str = STAGE_AXIS,
    mesh=None,
):
    """Build `fn(stacked_params, x, consts) -> y` running the layer stack as
    an SPMD pipeline inside a (partial-auto) shard_map.

    stacked_params: pytree with leading layer dim [L, ...], L divisible by
    the stage-axis size; sharded over `axis` at the shard_map boundary.
    x: [B, ...] activations, B divisible by n_microbatches.
    consts: pytree of [B, ...] per-sample constants (rope/segment ids) that
    follow their microbatch; pass None for none.
    stage_fn(local_params, x_mb, consts_mb) applies this stage's layer
    chunk to one microbatch.
    """

    def run(stacked_params, x, consts):
        b = x.shape[0]
        assert b % n_microbatches == 0, (b, n_microbatches)
        mb = b // n_microbatches
        x_mb = x.reshape(n_microbatches, mb, *x.shape[1:])
        consts_mb = jax.tree_util.tree_map(
            lambda a: a.reshape(n_microbatches, mb, *a.shape[1:]), consts
        )

        def inner(params, x_mb, consts_mb):
            return _stage_loop(stage_fn, params, x_mb, consts_mb, axis)

        fn = jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(axis), P(), P()),
            out_specs=P(),
            axis_names={axis},
            check_vma=False,
        )
        y = fn(stacked_params, x_mb, consts_mb)
        return y.reshape(b, *y.shape[2:])

    return run


def make_pipeline_lm_loss(
    cfg,
    *,
    n_microbatches: int,
    mesh=None,
    axis: str = STAGE_AXIS,
    compute_dtype=jnp.bfloat16,
    param_dtype=jnp.float32,
    remat: bool = True,
    attn_impl: str = "auto",
):
    """Shifted-CE LM loss with the decoder stack as an SPMD pipeline — the
    full >=34B-tier train path the budget rows assume (utils/memory_budget
    vlm_sft_budget pp>1 + core/mesh.stageify_rules): layer params live
    stage-sharded (leading [L] dim over `axis`; fsdp/tensor inside each
    stage per stageify_rules), the forward runs the GPipe schedule
    (pipeline_llm_forward), and autodiff's reversed pipeline produces
    grads, so `make_train_step` on top gives pipeline x fsdp training with
    ZeRO-style optimizer sharding. The shard_map boundary all-gathers each
    stage's fsdp-sharded layer chunk for compute — exactly ZeRO-3's
    gather-on-use (the reference's zero_stage3_config*.json role).

    Returns loss_fn(params, batch, rng) for train_step.make_train_step;
    params is a Qwen2ForCausalLM variables dict, batch needs
    input_ids/labels/seg_ids [B, S] with B divisible by n_microbatches.
    """
    import optax

    from ..kernels import ops as kops
    from ..models.layers import Dense, Embed, RMSNorm

    embed = Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=param_dtype,
                  dtype=compute_dtype)
    norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, param_dtype,
                   cfg.rms_plus_one)
    head = None
    if cfg.has_lm_head and not cfg.tie_word_embeddings:
        head = Dense(cfg.vocab_size, use_bias=False, param_dtype=param_dtype,
                     compute_dtype=compute_dtype)

    def loss_fn(params, batch, rng):
        del rng
        p = params["params"]
        ids, labels, seg = (batch["input_ids"], batch["labels"],
                            batch["seg_ids"])
        b, s = ids.shape
        x = embed.apply({"params": p["embed_tokens"]}, ids)
        pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
        cos, sin = kops.rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)
        h = pipeline_llm_forward(
            cfg, p["model"]["layers"], x, cos, sin, seg,
            n_microbatches=n_microbatches, axis=axis, mesh=mesh,
            compute_dtype=compute_dtype, param_dtype=param_dtype,
            remat=remat, attn_impl=attn_impl,
        )
        h = norm.apply({"params": p["model"]["norm"]}, h)
        if head is not None:
            logits = head.apply({"params": p["lm_head"]}, h)
        else:
            logits = embed.apply({"params": p["embed_tokens"]}, h,
                                 method=embed.attend)
        logits = logits.astype(jnp.float32)
        tgt = labels[:, 1:]
        valid = ((seg[:, 1:] != 0) & (tgt >= 0)).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], jnp.maximum(tgt, 0)
        )
        return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    return loss_fn


def pipeline_llm_forward(
    cfg,
    layer_params,  # ['params'-less] stacked Qwen2Layer params [L, ...]
    x: jax.Array,  # [B, S, H] embeddings
    cos: jax.Array,  # [B, S, D]
    sin: jax.Array,
    seg_ids: jax.Array,  # [B, S]
    *,
    n_microbatches: int,
    axis: str = STAGE_AXIS,
    mesh=None,
    compute_dtype=jnp.bfloat16,
    param_dtype=jnp.float32,
    remat: bool = True,
    attn_impl: str = "auto",
) -> jax.Array:
    """Qwen2 decoder stack (models/qwen2.py) as an SPMD pipeline: the
    [L, ...] scanned-layer params are split into stage chunks and
    microbatches ride the ring. Embedding/norm/head stay outside (they are
    negligible next to a 34B stack and shard over fsdp/tensor as usual)."""
    from ..models.qwen2 import Qwen2Layer

    layer = Qwen2Layer(cfg, param_dtype, compute_dtype, causal=True,
                       use_cache=False, attn_impl=attn_impl)
    kvh, d = cfg.num_kv_heads, cfg.head_dim

    def one_layer(p, h, c):
        mbsz = h.shape[0]
        dummy = jnp.zeros((mbsz, 0, kvh, d), compute_dtype)
        y, _ = layer.apply(
            {"params": p}, h, c["cos"], c["sin"], c["seg"], None,
            dummy, dummy, c["seg"], None, jnp.zeros((), jnp.int32),
        )
        return y

    if remat:
        one_layer = jax.checkpoint(one_layer, prevent_cse=False)

    def stage_fn(local_params, h, c):
        def body(h, p):
            return one_layer(p, h, c), None

        h, _ = jax.lax.scan(body, h, local_params)
        return h

    run = spmd_pipeline(
        stage_fn, n_microbatches=n_microbatches, axis=axis, mesh=mesh
    )
    consts = {"cos": cos, "sin": sin, "seg": seg_ids}
    return run(layer_params, x.astype(compute_dtype), consts)
