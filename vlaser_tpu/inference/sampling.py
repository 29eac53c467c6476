"""Jitted autoregressive generation: one prefill + one lax.scan decode.

Replaces HF `language_model.generate(inputs_embeds=..., use_cache=True)`
(modeling_internvl_chat.py:400-438). The whole decode is a single compiled
scan over static shapes — no per-token Python, no recompiles across steps;
EOS is handled with done-flags, right-padded rows via segment ids and per-row
position counters.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from .kv_cache import KVCache


def _apply_repetition_penalty(logits, seen, penalty: float):
    """HF RepetitionPenaltyLogitsProcessor: for every token already in the
    sequence (prompt + generated), divide positive logits by `penalty`,
    multiply negative ones (modeling_internvl_chat.py:400-438 reaches this
    through generation_config.repetition_penalty)."""
    pen = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, pen, logits)


def _sample(logits, rng, temperature: float, top_k: int,
            top_p: float = 1.0):
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 0:
        top = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < top, -1e30, logits)
    if top_p < 1.0:
        # nucleus sampling (HF generation_config top_p): drop the tail whose
        # cumulative probability exceeds top_p (keep at least the argmax)
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = cum - probs < top_p  # token included while mass before it < p
        threshold = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < threshold, -1e30, logits)
    return jax.random.categorical(rng, logits).astype(jnp.int32)


def sample_per_row(logits, keys, temps, top_ks, top_ps):
    """Per-row sampling with traced (data, not static) parameters.

    Row-for-row reproduces `_sample` run at B=1 with that row's scalar
    params and key: the filters apply the same masks in the same order
    (temperature scale -> top-k threshold -> nucleus threshold on the
    filtered logits), and `jax.random.categorical`'s Gumbel draw is
    layout-invariant for a fixed element count, so a [V] row under `key`
    equals the [1, V] draw `_sample` makes. Rows with temp==0 take the
    argmax (greedy). Used by the continuous-batching engine
    (serve/engine.py) where each slot carries its own sampling params —
    the vLLM role's per-request SamplingParams
    (data-pipeline/src/agent/filter.py samples through vLLM).

    logits [B, V] f32; keys [B, 2] uint32; temps/top_ps [B] f32;
    top_ks [B] int32 (0 = no top-k). Returns [B] int32 tokens.
    """

    def row(lg, key, temp, k, p):
        # every intermediate stays in lg.dtype — `_sample`'s params are
        # python floats (weak-typed), so a bf16 serving path computes these
        # filters in bf16; promoting to f32 here would silently change
        # which tokens survive the thresholds
        v = lg.shape[-1]
        dt = lg.dtype
        greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        lt = lg / jnp.where(temp > 0, temp, 1.0).astype(dt)
        srt = jnp.sort(lt, axis=-1)[::-1]
        kth = srt[jnp.clip(k - 1, 0, v - 1)]
        thr_k = jnp.where(k > 0, kth, jnp.asarray(-jnp.inf, dt))
        lt = jnp.where(lt < thr_k, jnp.asarray(-1e30, dt), lt)
        srt2 = jnp.sort(lt, axis=-1)[::-1]
        probs = jax.nn.softmax(srt2, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = cum - probs < p.astype(probs.dtype)
        thr_p = jnp.min(jnp.where(keep, srt2, jnp.asarray(jnp.inf, dt)))
        thr_p = jnp.where(p < 1.0, thr_p, jnp.asarray(-jnp.inf, dt))
        lt = jnp.where(lt < thr_p, jnp.asarray(-1e30, dt), lt)
        sampled = jax.random.categorical(key, lt).astype(jnp.int32)
        return jnp.where(temp > 0, sampled, greedy)

    return jax.vmap(row)(logits, keys, temps, top_ks, top_ps)


def make_generate_fn(
    model,
    *,
    max_new_tokens: int,
    eos_token_ids: Sequence[int],
    pad_token_id: int,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
    cache_dtype=jnp.bfloat16,
):
    """Build a jitted fn(params, input_ids, seg_ids, pixel_values, rng) ->
    (tokens [B, max_new_tokens], lengths [B]).

    `model` is InternVLChatModel (or anything exposing .prefill/.decode_step
    via flax method apply). pixel_values may be None (text-only trace).
    repetition_penalty follows HF semantics over prompt+generated tokens,
    tracked as a [B, vocab] seen-mask inside the scan.
    """
    eos = jnp.asarray(list(eos_token_ids), jnp.int32)
    llm = model.cfg.llm
    use_penalty = repetition_penalty != 1.0

    @functools.partial(jax.jit, static_argnames=())
    def generate(params, input_ids, seg_ids, pixel_values, rng):
        b, n = input_ids.shape
        cache = KVCache.create(
            llm.num_layers, b, n + max_new_tokens, llm.num_kv_heads,
            llm.head_dim, dtype=cache_dtype,
        )
        lengths = jnp.sum((seg_ids != 0).astype(jnp.int32), axis=1)  # [B]
        logits, _, cache = model.apply(
            params, input_ids, pixel_values, seg_ids, cache,
            method=model.prefill,
        )
        last = jnp.take_along_axis(
            logits, (lengths - 1)[:, None, None], axis=1
        )[:, 0]  # [B, V]
        if use_penalty:
            seen = jnp.zeros((b, llm.vocab_size), bool)
            seen = seen.at[jnp.arange(b)[:, None], input_ids].max(seg_ids != 0)
            last = _apply_repetition_penalty(last, seen, repetition_penalty)
        else:
            seen = jnp.zeros((b, 1), bool)  # unused carry placeholder
        rng, sub = jax.random.split(rng)
        token = _sample(last, sub, temperature, top_k, top_p)
        done = jnp.any(token[:, None] == eos[None, :], axis=-1)
        if use_penalty:
            seen = seen.at[jnp.arange(b), token].max(~done)

        def step(carry, t):
            cache, token, done, lengths, seen, rng = carry
            out_token = jnp.where(done, pad_token_id, token)
            positions = (lengths + t)[:, None]
            logits, _, cache = model.apply(
                params, token[:, None], cache, positions,
                method=model.decode_step,
            )
            lg = logits[:, 0]
            if use_penalty:
                lg = _apply_repetition_penalty(lg, seen, repetition_penalty)
            rng, sub = jax.random.split(rng)
            nxt = _sample(lg, sub, temperature, top_k, top_p)
            nxt_done = jnp.logical_or(
                done, jnp.any(nxt[:, None] == eos[None, :], axis=-1)
            )
            if use_penalty:
                seen = seen.at[jnp.arange(b), nxt].max(~nxt_done)
            return (cache, nxt, nxt_done, lengths, seen, rng), (out_token, ~done)

        (cache, token, done, _, _, _), (tokens, lives) = jax.lax.scan(
            step,
            (cache, token, done, lengths, seen, rng),
            jnp.arange(max_new_tokens - 1),
        )
        last_token = jnp.where(done, pad_token_id, token)
        tokens = jnp.concatenate(
            [jnp.transpose(tokens, (1, 0)), last_token[:, None]], axis=1
        )
        # emitted-token count from explicit liveness flags, NOT a pad-value
        # sentinel: the model can legitimately argmax the pad id, and the
        # continuous-batching engine (serve/engine.py) keeps such a token —
        # both decoders must agree on the stream
        lives = jnp.concatenate(
            [jnp.transpose(lives, (1, 0)), (~done)[:, None]], axis=1
        )
        num = jnp.sum(lives.astype(jnp.int32), axis=1)
        return tokens, num

    return generate


def trim_output(tokens, num, eos_token_ids: Sequence[int]) -> list:
    """Host-side: cut each row at its first EOS/pad."""
    import numpy as np

    tokens = np.asarray(tokens)
    num = np.asarray(num)
    out = []
    eos = set(int(e) for e in eos_token_ids)
    for row, n in zip(tokens, num):
        ids = []
        for t in row[: int(n)]:
            if int(t) in eos:
                break
            ids.append(int(t))
        out.append(ids)
    return out
