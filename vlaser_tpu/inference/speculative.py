"""Prompt-lookup speculative decoding: draft-free multi-token greedy decode.

The reference's decode surface (modeling_internvl_chat.py:400-438 via HF
`generate`) emits one token per forward pass. On TPU the single-stream decode
step is weight-streaming bound (~all HBM time goes to reading the 2B weights
once per token), so a verify pass over K+1 tokens costs nearly the same wall
time as a 1-token step — the MXU rows are free. Speculative decoding converts
that slack into accepted tokens:

1. *Draft*: the last `ngram` committed tokens are looked up in the full
   prompt+generated context (vectorized match over the static token buffer);
   the K tokens that followed the most recent earlier occurrence become the
   draft (prompt-lookup / PLD self-speculation — no draft model).
2. *Verify*: ONE cached forward over [cur, d1..dK] (the multi-token cache
   step the KV machinery already supports: write_meta + q_offset causal).
3. *Accept*: the longest prefix where draft[i] == argmax(logits[i]), plus the
   one bonus token at the first mismatch. Committed tokens are ALWAYS the
   verified argmax targets, so the output is token-for-token identical to
   sequential greedy decode regardless of draft quality; drafts only decide
   how many verified tokens each pass yields (1..K+1).
4. *Cache rollback*: slots written for rejected drafts get their segment ids
   zeroed and `length` rewound, so the next pass overwrites them and attention
   never sees them.

Everything runs inside one jitted lax.while_loop with static shapes: the
token buffer, the n-gram match, acceptance, EOS cut, and the rollback are all
fixed-size tensor ops. Single-stream (B=1) only — that is the latency path
where speculation pays; batched serving amortizes weights across streams
instead (bench.py batch-8 decode).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from .kv_cache import KVCache


def lookup_draft(buf: jax.Array, total_len: jax.Array, ngram: int, k: int):
    """Find the most recent earlier occurrence of the trailing `ngram` of
    buf[:total_len] and return the `k` tokens that followed it.

    buf: [N] int32 logical sequence (prompt + committed tokens, pad after).
    Returns (draft [k] int32, found bool). When no match exists the draft is
    whatever follows position 0 — harmless, verification rejects it.
    """
    n = buf.shape[0]
    w = n - ngram - k  # candidate window (static)
    pattern = jax.lax.dynamic_slice(buf, (total_len - ngram,), (ngram,))
    cond = jnp.ones((w,), bool)
    for j in range(ngram):
        cond = jnp.logical_and(cond, buf[j : j + w] == pattern[j])
    idx = jnp.arange(w, dtype=jnp.int32)
    # strictly earlier than the trailing occurrence itself
    cond = jnp.logical_and(cond, idx < total_len - ngram)
    best = jnp.max(jnp.where(cond, idx, -1))
    found = best >= 0
    start = jnp.clip(best, 0) + ngram
    return jax.lax.dynamic_slice(buf, (start,), (k,)), found


def make_speculative_generate_fn(
    model,
    *,
    max_new_tokens: int,
    eos_token_ids: Sequence[int],
    pad_token_id: int,
    draft_len: int = 8,
    ngram: int = 2,
    cache_dtype=jnp.bfloat16,
    force_no_match: bool = False,
):
    """Build fn(params, input_ids, seg_ids, pixel_values, rng) ->
    (tokens [1, max_new_tokens], lengths [1]) — the make_generate_fn
    interface, greedy only, batch 1 only. Output tokens are identical to
    make_generate_fn(temperature=0); only the number of model passes differs
    (reported per-pass acceptance is (tokens emitted)/(verify passes)).

    force_no_match=True rejects every draft (acceptance pinned to the 1
    bonus token per pass) while still paying the full lookup + K+1-row
    verify + rollback machinery — the measured WORST-CASE throughput of
    this decoder (bench.py reports it as the spec-decode floor; outputs
    stay token-identical to sequential greedy decode either way)."""
    eos = jnp.asarray(list(eos_token_ids), jnp.int32)
    llm = model.cfg.llm
    k = int(draft_len)
    assert k >= 1 and ngram >= 1

    @functools.partial(jax.jit, static_argnames=())
    def generate(params, input_ids, seg_ids, pixel_values, rng):
        del rng  # greedy
        b, n = input_ids.shape
        assert b == 1, "speculative decode is the single-stream latency path"
        nbuf = n + max_new_tokens + k + 1
        cache = KVCache.create(
            llm.num_layers, b, nbuf, llm.num_kv_heads, llm.head_dim,
            dtype=cache_dtype,
        )
        length = jnp.sum((seg_ids[0] != 0).astype(jnp.int32))  # prompt tokens
        logits, _, cache = model.apply(
            params, input_ids, pixel_values, seg_ids, cache,
            method=model.prefill,
        )
        first = jnp.argmax(logits[0, length - 1], axis=-1).astype(jnp.int32)

        # logical sequence buffer: prompt (left-compacted by construction —
        # chat.py right-pads, so buf[:length] is the real prompt) + generated
        buf = jnp.full((nbuf,), pad_token_id, jnp.int32)
        buf = jax.lax.dynamic_update_slice(buf, input_ids[0], (0,))
        buf = buf.at[length].set(first)
        done = jnp.any(first == eos)
        # g: committed generated tokens; fed: generated tokens whose KV is in
        # the cache (invariant fed == g - 1: the newest token is never fed yet)
        g = jnp.ones((), jnp.int32)
        passes = jnp.zeros((), jnp.int32)

        def cond(carry):
            cache, buf, g, done, passes = carry
            return jnp.logical_and(~done, g < max_new_tokens)

        def body(carry):
            cache, buf, g, done, passes = carry
            total = length + g
            draft, _ = lookup_draft(buf, total, ngram, k)
            cur = jax.lax.dynamic_slice(buf, (total - 1,), (1,))
            block = jnp.concatenate([cur, draft])[None, :]  # [1, K+1]
            positions = (total - 1 + jnp.arange(k + 1, dtype=jnp.int32))[None]
            base = cache.length  # slot offset before this pass
            logits, _, cache = model.apply(
                params, block, cache, positions, method=model.decode_step,
            )
            targets = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [K+1]
            match = (draft == targets[:k]).astype(jnp.int32)
            if force_no_match:
                match = jnp.zeros_like(match)
            a = jnp.sum(jnp.cumprod(match))  # leading accepted drafts, 0..K
            idx = jnp.arange(k + 1, dtype=jnp.int32)
            committed = idx <= a
            is_eos = jnp.any(targets[:, None] == eos[None, :], axis=-1)
            # cut after the first committed EOS (the EOS itself is emitted,
            # matching make_generate_fn + trim_output semantics)
            prior_eos = jnp.cumsum((is_eos & committed).astype(jnp.int32)) - (
                is_eos & committed
            ).astype(jnp.int32)
            committed = jnp.logical_and(committed, prior_eos == 0)
            m = jnp.sum(committed.astype(jnp.int32))  # tokens emitted, 1..K+1
            new_done = jnp.any(is_eos & committed)

            old_block = jax.lax.dynamic_slice(buf, (total,), (k + 1,))
            buf = jax.lax.dynamic_update_slice(
                buf, jnp.where(committed, targets, old_block), (total,)
            )
            # rollback: keep `m` of the K+1 written slots (cur + m-1 accepted
            # drafts), zero the rest so attention masks them until overwritten
            slot = jnp.arange(cache.max_len, dtype=jnp.int32)[None, :]
            stale = jnp.logical_and(slot >= base + m, slot < base + k + 1)
            cache = cache.replace(
                length=base + m,
                seg=jnp.where(stale, 0, cache.seg),
            )
            return cache, buf, g + m, new_done, passes + 1

        cache, buf, g, done, passes = jax.lax.while_loop(
            cond, body, (cache, buf, g, done, passes)
        )
        tokens = jax.lax.dynamic_slice(buf, (length,), (max_new_tokens,))
        keep = jnp.arange(max_new_tokens, dtype=jnp.int32) < g
        tokens = jnp.where(keep, tokens, pad_token_id)[None, :]
        # same length rule as make_generate_fn: the committed count itself
        # (a model CAN argmax the pad id — such a token is real and kept;
        # trim_output cuts at EOS, which spec decode emits into the stream)
        num = jnp.minimum(g, max_new_tokens)[None]
        return tokens, num, g, passes

    def fn(params, input_ids, seg_ids, pixel_values, rng):
        tokens, num, _, _ = generate(params, input_ids, seg_ids, pixel_values, rng)
        return tokens, num

    fn.with_stats = generate  # (tokens, num, emitted, verify_passes)
    return fn
