"""Jitted beam search: one prefill + one lax.scan over beam-expanded rows.

HF-generate surface parity (modeling_internvl_chat.py:400-438 delegates to HF
`generate`, which runs BeamSearchScorer when generation_config.num_beams > 1):
log-softmax beam scoring, 2K candidate expansion per step, EOS candidates
with rank < K become finished hypotheses normalized by
(prompt_len + generated_len) ** length_penalty, live beams reorder the KV
cache via a batch-dim gather. The whole loop is one compiled scan — no
per-step Python, no cache re-allocation on beam reorder.

Greedy (do_sample=False) beams only — the sampled-beam variant of HF is a
different scorer.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from .kv_cache import KVCache

NEG = -1.0e9


def _expand_beams(tree, num_beams: int):
    """Repeat cache rows K times along the batch dim: [B, ...] -> [B*K, ...]
    (k/v have a leading layer dim)."""

    def one(path, x):
        name = path[-1].name
        if name in ("k", "v"):
            return jnp.repeat(x, num_beams, axis=1)
        if name in ("seg", "lev"):
            return jnp.repeat(x, num_beams, axis=0)
        return x  # scalar length

    return jax.tree_util.tree_map_with_path(one, tree)


def _reorder_cache(cache: KVCache, rows: jax.Array) -> KVCache:
    """Gather cache rows (flattened [B*K] indices) after beam selection."""

    def one(path, x):
        name = path[-1].name
        if name in ("k", "v"):
            return x[:, rows]
        if name in ("seg", "lev"):
            return x[rows]
        return x

    return jax.tree_util.tree_map_with_path(one, cache)


def make_beam_generate_fn(
    model,
    *,
    max_new_tokens: int,
    num_beams: int,
    eos_token_ids: Sequence[int],
    pad_token_id: int,
    length_penalty: float = 1.0,
    cache_dtype=jnp.bfloat16,
):
    """-> jitted fn(params, input_ids, seg_ids, pixel_values) ->
    (tokens [B, max_new_tokens], lengths [B]) — the best beam per row,
    ending with EOS then pads like HF's finalize. Assumes unpadded prompts
    (HF beam search is run on single prompts in the reference eval)."""
    eos = jnp.asarray(list(eos_token_ids), jnp.int32)
    llm = model.cfg.llm
    K = num_beams
    T = max_new_tokens

    @jax.jit
    def generate(params, input_ids, seg_ids, pixel_values):
        b, n = input_ids.shape
        cache = KVCache.create(
            llm.num_layers, b, n + T, llm.num_kv_heads, llm.head_dim,
            dtype=cache_dtype,
        )
        lengths = jnp.sum((seg_ids != 0).astype(jnp.int32), axis=1)  # [B]
        logits, _, cache = model.apply(
            params, input_ids, pixel_values, seg_ids, cache,
            method=model.prefill,
        )
        cache = _expand_beams(cache, K)
        last = jnp.take_along_axis(
            logits, (lengths - 1)[:, None, None], axis=1
        )[:, 0]  # [B, V]
        logp0 = jax.nn.log_softmax(last.astype(jnp.float32), axis=-1)
        # first step: top-K tokens of beam 0 (HF inits beams 1.. at -1e9)
        scores0, tok0 = jax.lax.top_k(logp0, K)  # [B, K]
        V = logp0.shape[-1]

        tokens_buf = jnp.full((b, K, T), pad_token_id, jnp.int32)
        tokens_buf = tokens_buf.at[:, :, 0].set(tok0)
        fin_scores = jnp.full((b, K), NEG, jnp.float32)  # normalized
        fin_tokens = jnp.full((b, K, T), pad_token_id, jnp.int32)
        fin_lens = jnp.zeros((b, K), jnp.int32)  # generated len incl. eos

        is0_eos = jnp.any(tok0[..., None] == eos, axis=-1)  # [B, K]
        # rank-0.. first-step eos candidates -> hypotheses of generated len 0
        # (HF adds the prompt-only hyp); demote those beams to -inf
        fin0 = jnp.where(is0_eos, scores0 / lengths[:, None] ** length_penalty,
                         NEG)
        order0 = jnp.argsort(-fin0, axis=-1)
        fin_scores = jnp.take_along_axis(fin0, order0, axis=-1)
        fin_lens = jnp.where(fin_scores > NEG, 1, 0)
        fin_tokens = fin_tokens.at[:, :, 0].set(
            jnp.where(fin_scores > NEG, eos[0], pad_token_id)
        )
        beam_scores = jnp.where(is0_eos, NEG, scores0)

        def step(carry, t):
            (cache, tokens_buf, beam_scores, fin_scores, fin_tokens,
             fin_lens) = carry
            prev_tok = jnp.take_along_axis(
                tokens_buf, jnp.minimum(t - 1, T - 1)[None, None, None]
                .repeat(b, 0).repeat(K, 1), axis=2
            )[..., 0]  # [B, K]
            positions = jnp.broadcast_to(
                (lengths[:, None] + t), (b, K)
            ).reshape(b * K, 1)
            logits, _, cache = model.apply(
                params, prev_tok.reshape(b * K, 1), cache, positions,
                method=model.decode_step,
            )
            logp = jax.nn.log_softmax(
                logits[:, 0].astype(jnp.float32), axis=-1
            ).reshape(b, K, V)
            cand = (beam_scores[:, :, None] + logp).reshape(b, K * V)
            top_v, top_i = jax.lax.top_k(cand, 2 * K)  # [B, 2K]
            c_beam = top_i // V
            c_tok = (top_i % V).astype(jnp.int32)
            c_eos = jnp.any(c_tok[..., None] == eos, axis=-1)
            rank = jnp.broadcast_to(jnp.arange(2 * K), c_eos.shape)

            # finished hypotheses: eos candidates with rank < K
            hyp_ok = jnp.logical_and(c_eos, rank < K)
            hyp_norm = jnp.where(
                hyp_ok,
                top_v / (lengths[:, None] + t + 1) ** length_penalty,
                NEG,
            )  # [B, 2K]
            # merge into the top-K finished set (scores + token rows)
            all_scores = jnp.concatenate([fin_scores, hyp_norm], axis=1)
            hyp_rows = jnp.take_along_axis(
                tokens_buf, c_beam[:, :, None], axis=1
            )  # [B, 2K, T] — the source beams' tokens
            hyp_rows = jnp.where(
                (jnp.arange(T) == t)[None, None, :], eos[0], hyp_rows
            )
            all_tokens = jnp.concatenate([fin_tokens, hyp_rows], axis=1)
            all_lens = jnp.concatenate(
                [fin_lens, jnp.full((b, 2 * K), t + 1, jnp.int32)], axis=1
            )
            keep = jnp.argsort(-all_scores, axis=-1)[:, :K]
            fin_scores = jnp.take_along_axis(all_scores, keep, axis=-1)
            fin_tokens = jnp.take_along_axis(all_tokens, keep[:, :, None], axis=1)
            fin_lens = jnp.take_along_axis(all_lens, keep, axis=-1)

            # live beams: first K non-eos candidates in rank order
            live_key = jnp.where(c_eos, 2 * K + rank, rank)
            live_order = jnp.argsort(live_key, axis=-1)[:, :K]  # [B, K]
            sel_v = jnp.take_along_axis(top_v, live_order, axis=-1)
            sel_beam = jnp.take_along_axis(c_beam, live_order, axis=-1)
            sel_tok = jnp.take_along_axis(c_tok, live_order, axis=-1)
            sel_eos = jnp.take_along_axis(c_eos, live_order, axis=-1)
            beam_scores = jnp.where(sel_eos, NEG, sel_v)

            tokens_buf = jnp.take_along_axis(
                tokens_buf, sel_beam[:, :, None], axis=1
            )
            tokens_buf = jnp.where(
                (jnp.arange(T) == t)[None, None, :], sel_tok[:, :, None],
                tokens_buf,
            )
            rows = (jnp.arange(b)[:, None] * K + sel_beam).reshape(b * K)
            cache = _reorder_cache(cache, rows)
            return (cache, tokens_buf, beam_scores, fin_scores, fin_tokens,
                    fin_lens), None

        (cache, tokens_buf, beam_scores, fin_scores, fin_tokens,
         fin_lens), _ = jax.lax.scan(
            step,
            (cache, tokens_buf, beam_scores, fin_scores, fin_tokens, fin_lens),
            jnp.arange(1, T),
        )

        # finalize (HF: unfinished beams join the pool normalized at full len)
        live_norm = beam_scores / (lengths[:, None] + T) ** length_penalty
        all_scores = jnp.concatenate([fin_scores, live_norm], axis=1)
        all_tokens = jnp.concatenate([fin_tokens, tokens_buf], axis=1)
        all_lens = jnp.concatenate(
            [fin_lens, jnp.full((b, K), T, jnp.int32)], axis=1
        )
        best = jnp.argmax(all_scores, axis=-1)  # [B]
        tokens = jnp.take_along_axis(
            all_tokens, best[:, None, None], axis=1
        )[:, 0]  # [B, T]
        out_len = jnp.take_along_axis(all_lens, best[:, None], axis=-1)[:, 0]
        tokens = jnp.where(jnp.arange(T)[None, :] < out_len[:, None], tokens,
                           pad_token_id)
        return tokens, out_len

    return generate
