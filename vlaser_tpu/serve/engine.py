"""Continuous-batching VLM serving engine (the vLLM role, TPU-native).

The reference serves eval/QA generation through vLLM on GPU
(data-pipeline RoboTwin-QA/GeneralQA.py:3-5) — an engine whose core trick
is continuous (in-flight) batching: requests join and leave a running
decode batch as they arrive/finish, so the chip never idles on the
longest request in a static batch.

This is that engine built the TPU way, on top of the existing jitted
model surface rather than a separate runtime:

- One static-shape decode batch of `num_slots` rows. Each row ("slot")
  holds one in-flight request. Static shapes mean the decode step
  compiles once, ever.
- A per-row KV cache: `KVCache.length` is a [B] vector, so every slot
  decodes at its own fill depth (inference/kv_cache.py per-row writes;
  models/qwen2.py decodes single tokens with causal reduced to the kv
  segment mask — with one query token, every valid cached slot is in
  the past).
- Prefill runs per request at a bucketed prompt width (one compile per
  bucket), then the [1]-row cache is inserted into the big cache at the
  assigned slot. No re-prefill of running rows, no head-of-line blocking.
  Multi-tile image prompts can additionally bucket the TILE count
  (`tile_buckets`): tiles pad to the bucket with image_flags masking the
  padding out of the <IMG_CONTEXT> scatter, bounding compiles to
  |prefill_buckets| x |tile_buckets|.
- Scheduling is plain host Python between jitted steps: admit waiting
  requests into free slots, run one decode CHUNK for everyone, retire
  rows that hit EOS/max_new_tokens. Decode buffers are donated, so the
  cache updates in place in HBM.
- Decode runs in on-device chunks of `chunk_size` steps per host sync
  (a jitted `lax.while_loop`), not one step per Python iteration: a
  per-token host round-trip would dominate decode latency (the chip sits
  idle for the scheduler<->device RTT between every token — measured 6x
  slower than static batching through a tunneled link). Per-row
  aliveness (EOS hit / token budget spent) is tracked ON DEVICE inside
  the chunk so dead rows stop writing their caches (seg 0), and the loop
  exits early when every row is dead; the host then replays the returned
  [K, B] token matrix through the exact same retirement rules, so token
  identity with per-request decode is preserved (tests/test_engine.py
  runs the identity suite at chunk_size 1 and 16).

Decoding is greedy by default (the eval-serving setting) and outputs are
then token-identical to per-request `make_generate_fn` decode — pinned by
tests/test_engine.py. Per-request sampling (temperature / top-k / top-p /
seed, vLLM's SamplingParams role — data-pipeline/src/agent/filter.py
scores through sampled vLLM) rides the same decode batch: each slot
carries its own params and PRNG chain, and a sampled request emits the
same tokens as a solo `make_generate_fn(temperature=..)` run under the
same key (inference/sampling.sample_per_row is row-exact vs `_sample`).

One deliberate edge divergence from `make_generate_fn`: the engine keeps
a generated token that happens to equal `pad_token_id` (it is a real
model output), while `make_generate_fn`'s output-length accounting uses
pad as the done-sentinel and truncates there. Greedy eval prompts never
argmax onto pad in practice; sampled requests should use an eos set that
covers their stop tokens.

Speculative decoding (vLLM's spec-decode role) rides the same decode
batch when `speculative_draft_len > 0`: each pass verifies one
[num_slots, K+1] block — per-slot prompt-lookup drafts from each
request's own token history (inference/speculative.lookup_draft), the
multi-token per-row cache step (write_meta contiguous blocks + per-row
q_offset causal masks), and per-row rollback of rejected slots. Committed
tokens are always the verified argmaxes, so outputs stay token-identical
to the non-speculative engine; acceptance only changes how many passes a
request needs. Greedy runs only — a run containing sampled requests takes
the sampled chunk path unchanged.

Prefix caching (vLLM's automatic-prefix-caching role, made explicit the
static-shape way): QA generation asks many questions about ONE frame
(data-pipeline RoboTwin-QA/GeneralQA.py builds general/spatial/grounding
prompts over the same episode images), so the expensive part of every
prompt — the system text + 256-token image block — is identical across
requests. `register_prefix(ids, pixels)` prefills that shared prefix
once and keeps its [L, 1, bucket, KVH, D] KV on device; a request with
`prefix_id` carries only its tail tokens, and admission runs ONE
multi-token cached forward of the tail against the stored prefix KV
(the same write_meta + q_offset block step speculative decoding uses:
tail queries take positions prefix_len+i while prefix keys sit at slots
< prefix_len, so the causal rule composes exactly), then inserts the
combined row. Prefill cost per request drops from O((P+m)^2) attention +
P+m MLP rows to O(m*(P+m)) + m rows — for a 300-token image prefix and a
20-token question that is ~15x less prefill compute, and the ViT never
reruns. Token identity with the full-prompt decode is exact (same
arithmetic, fp32) and pinned by tests/test_engine.py.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..inference.kv_cache import KVCache
from ..inference.sampling import sample_per_row
from ..inference.speculative import lookup_draft


@dataclasses.dataclass
class Request:
    uid: int
    input_ids: np.ndarray  # [n] int32 prompt (image tokens already expanded)
    pixel_values: Optional[np.ndarray] = None  # [T, H, W, 3] tiles
    max_new_tokens: int = 64
    # per-request sampling params (vLLM SamplingParams role).
    # temperature 0.0 = greedy; a sampled request reproduces a solo
    # make_generate_fn(temperature, top_k, top_p) run under PRNGKey(seed).
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0
    # id from engine.register_prefix(); when set, input_ids holds ONLY the
    # tail after the shared prefix (text-only — the image lives in the
    # prefix) and the engine reuses the prefix KV instead of re-prefilling
    prefix_id: Optional[int] = None


@dataclasses.dataclass
class Completion:
    uid: int
    token_ids: List[int]  # generated ids, EOS excluded
    prompt_len: int


@dataclasses.dataclass
class _Slot:
    req: Request
    last_token: int
    generated: List[int]
    rng: Optional[np.ndarray] = None  # [2] uint32, sampled requests only
    prompt_len: int = 0  # prefix_len + tail for prefix-cached requests
    # full prompt ids (prefix + tail for prefix-cached rows) — the
    # speculative chunk's prompt-lookup draft window
    hist: Optional[np.ndarray] = None


def _pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"length {n} exceeds the largest bucket {buckets[-1]}")


class ContinuousBatchingEngine:
    """model: InternVLChatModel (or any model exposing prefill/decode_step)."""

    def __init__(
        self,
        model,
        params,
        *,
        num_slots: int = 8,
        max_len: int = 1024,
        eos_token_ids: Sequence[int],
        pad_token_id: int,
        prefill_buckets: Optional[Sequence[int]] = None,
        tile_buckets: Optional[Sequence[int]] = None,
        cache_dtype=jnp.bfloat16,
        chunk_size: int = 16,
        speculative_draft_len: int = 0,
        speculative_ngram: int = 2,
    ):
        llm = model.cfg.llm
        assert llm.sliding_window is None, (
            "continuous batching decodes with per-row offsets; "
            "sliding-window models are unsupported"
        )
        self.model = model
        self.params = params
        self.num_slots = num_slots
        self.max_len = max_len
        self.eos = tuple(int(e) for e in eos_token_ids)
        self.pad_token_id = int(pad_token_id)
        self.cache_dtype = cache_dtype
        if prefill_buckets is None:
            b, buckets = 32, []
            while b < max_len:
                buckets.append(b)
                b *= 2
            buckets.append(max_len)
            prefill_buckets = buckets
        bad = [b for b in prefill_buckets if b > max_len]
        if bad:
            raise ValueError(
                f"prefill_buckets {bad} exceed max_len {max_len}: a prompt "
                "padded to such a bucket cannot fit the decode cache"
            )
        self.prefill_buckets = tuple(sorted(set(prefill_buckets)))
        self.tile_buckets = (
            None if tile_buckets is None else tuple(sorted(set(tile_buckets)))
        )
        self._llm = llm
        self.cache = self._fresh_cache()

        def prefill(params, ids, seg, pixels, flags, true_len):
            nb = ids.shape[1]
            cache = KVCache.create(
                llm.num_layers, 1, nb, llm.num_kv_heads, llm.head_dim,
                dtype=cache_dtype,
            )
            logits, _, cache = model.apply(
                params, ids, pixels, seg, cache, image_flags=flags,
                method=model.prefill,
            )
            last = jnp.take_along_axis(
                logits, (true_len - 1)[None, None, None], axis=1
            )[0, 0]
            token = jnp.argmax(last).astype(jnp.int32)
            return cache.k, cache.v, cache.seg, cache.lev, token, last

        # one compile per (bucket, tile-bucket); cheap enough to share one jit
        self._prefill = jax.jit(prefill)

        def prefill_suffix(params, pk, pv, pseg, plev, plen, ids, seg,
                           true_m):
            """Prefill a text tail against a stored prefix KV: ONE cached
            multi-token forward. The combined row cache is
            [prefix_bucket + tail_bucket] wide; the prefix occupies slots
            [0, prefix_bucket) (seg 0 beyond plen), length starts at plen so
            tail K/V land at slots plen.. and take rope positions plen+i —
            identical arithmetic to a full prefill of prefix+tail."""
            nbt = pk.shape[2] + ids.shape[1]
            cache = KVCache.create(
                llm.num_layers, 1, nbt, llm.num_kv_heads, llm.head_dim,
                dtype=cache_dtype,
            )
            cache = cache.replace(
                k=jax.lax.dynamic_update_slice(
                    cache.k, pk.astype(cache.k.dtype), (0, 0, 0, 0, 0)
                ),
                v=jax.lax.dynamic_update_slice(
                    cache.v, pv.astype(cache.v.dtype), (0, 0, 0, 0, 0)
                ),
                seg=jax.lax.dynamic_update_slice(cache.seg, pseg, (0, 0)),
                lev=jax.lax.dynamic_update_slice(cache.lev, plev, (0, 0)),
                length=plen,
            )
            logits, _, cache = model.apply(
                params, ids, cache, None, seg, method=model.decode_step,
            )
            last = jnp.take_along_axis(
                logits, (true_m - 1)[None, None, None], axis=1
            )[0, 0]
            token = jnp.argmax(last).astype(jnp.int32)
            return cache.k, cache.v, cache.seg, cache.lev, token, last

        self._prefill_suffix = jax.jit(prefill_suffix)
        self._prefixes: Dict[int, dict] = {}
        self._next_prefix_id = 0

        def insert(cache, k1, v1, seg1, lev1, row, true_len):
            k = jax.lax.dynamic_update_slice(
                cache.k, k1.astype(cache.k.dtype), (0, row, 0, 0, 0)
            )
            v = jax.lax.dynamic_update_slice(
                cache.v, v1.astype(cache.v.dtype), (0, row, 0, 0, 0)
            )
            # clear the WHOLE row's metadata: a freed slot's stale seg ids
            # beyond this prompt must never be attendable again
            row_seg = jnp.zeros((1, cache.seg.shape[1]), jnp.int32)
            row_seg = jax.lax.dynamic_update_slice(row_seg, seg1, (0, 0))
            seg = jax.lax.dynamic_update_slice(cache.seg, row_seg, (row, 0))
            row_lev = jnp.zeros((1, cache.lev.shape[1]), jnp.int32)
            row_lev = jax.lax.dynamic_update_slice(row_lev, lev1, (0, 0))
            lev = jax.lax.dynamic_update_slice(cache.lev, row_lev, (row, 0))
            length = jax.lax.dynamic_update_index_in_dim(
                cache.length, true_len, row, axis=0
            )
            return cache.replace(k=k, v=v, seg=seg, lev=lev, length=length)

        self._insert = jax.jit(insert, donate_argnums=(0,))

        assert chunk_size >= 1
        self.chunk_size = K = int(chunk_size)
        eos_arr = jnp.asarray(self.eos, jnp.int32)

        def _one_step(params, cache, tokens, alive):
            seg = alive.astype(jnp.int32)[:, None]
            positions = cache.length[:, None]
            logits, _, cache = model.apply(
                params, tokens[:, None], cache, positions, seg,
                method=model.decode_step,
            )
            return logits[:, 0], cache

        def _advance(tokens, alive, budget, nxt):
            """Shared aliveness rule (the device mirror of the host's
            retirement logic in run()): a row that just emitted `nxt`
            dies on EOS or when its token budget is spent; dead rows
            freeze their feed token so later steps are inert."""
            budget = budget - alive.astype(jnp.int32)
            is_eos = jnp.any(nxt[:, None] == eos_arr[None, :], axis=-1)
            alive = alive & ~is_eos & (budget > 0)
            tokens = jnp.where(alive, nxt, tokens)
            return tokens, alive, budget

        def decode_chunk(params, cache, tokens, alive, budget):
            """-> (emitted [K, B] int32, cache). Runs up to K greedy steps
            on device; exits early once every row is dead. Emitted rows
            past a row's death repeat its frozen token — the host's own
            bookkeeping never reads them."""
            B = tokens.shape[0]
            buf0 = jnp.zeros((K, B), jnp.int32)

            def cond(state):
                step, _, _, alive, _, _ = state
                return jnp.logical_and(step < K, jnp.any(alive))

            def body(state):
                step, cache, tokens, alive, budget, buf = state
                lg, cache = _one_step(params, cache, tokens, alive)
                nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                buf = jax.lax.dynamic_update_slice(buf, nxt[None],
                                                   (step, 0))
                tokens, alive, budget = _advance(tokens, alive, budget, nxt)
                return step + 1, cache, tokens, alive, budget, buf

            _, cache, _, _, _, buf = jax.lax.while_loop(
                cond, body, (jnp.int32(0), cache, tokens, alive, budget,
                             buf0)
            )
            return buf, cache

        self._decode_chunk = jax.jit(decode_chunk, donate_argnums=(1,))

        def decode_chunk_sampled(params, cache, tokens, alive, budget, keys,
                                 temps, top_ks, top_ps):
            """Sampled twin: per-row PRNG chains advance once per step
            (matching make_generate_fn's split-per-step), riding the same
            early-exit loop."""
            B = tokens.shape[0]
            buf0 = jnp.zeros((K, B), jnp.int32)

            def cond(state):
                step, _, _, alive, _, _, _ = state
                return jnp.logical_and(step < K, jnp.any(alive))

            def body(state):
                step, cache, tokens, alive, budget, keys, buf = state
                lg, cache = _one_step(params, cache, tokens, alive)
                split = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
                nxt = sample_per_row(lg, split[:, 1], temps, top_ks, top_ps)
                buf = jax.lax.dynamic_update_slice(buf, nxt[None],
                                                   (step, 0))
                tokens, alive, budget = _advance(tokens, alive, budget, nxt)
                return step + 1, cache, tokens, alive, budget, split[:, 0], \
                    buf

            _, cache, _, _, _, keys, buf = jax.lax.while_loop(
                cond, body, (jnp.int32(0), cache, tokens, alive, budget,
                             keys, buf0)
            )
            return buf, cache, keys

        self._decode_chunk_sampled = jax.jit(decode_chunk_sampled,
                                             donate_argnums=(1,))

        def sample_first(last, key, temp, k, p):
            # mirrors make_generate_fn: rng, sub = split(rng); _sample(.., sub)
            split = jax.random.split(key, 2)
            tok = sample_per_row(
                last[None], split[1:2], temp[None], k[None], p[None]
            )[0]
            return tok, split[0]

        self._sample_first = jax.jit(sample_first)

        # --- batched speculative decode (prompt-lookup drafts per slot) ---
        # vLLM integrates spec decode into continuous batching; this is the
        # static-shape equivalent: every pass verifies a [B, Kd+1] block
        # (per-row draft from each slot's own token history), each row
        # accepts its own 1..Kd+1 tokens, and per-row cache rollback rides
        # the same per-row `length` vector the engine already decodes with.
        # Greedy only — committed tokens are always the verified argmax, so
        # outputs are token-identical to the non-speculative engine (pinned
        # by tests/test_engine.py); sampled runs take the sampled chunk.
        self.spec_draft_len = Kd = int(speculative_draft_len)
        self.spec_ngram = int(speculative_ngram)
        if Kd > 0:
            assert self.spec_ngram >= 1
            W = self.max_len + Kd + 1  # per-row token-history width
            self._spec_buf_width = W
            idx = jnp.arange(Kd + 1, dtype=jnp.int32)

            def decode_chunk_spec(params, cache, buf, totals, tokens, alive,
                                  budget):
                """-> (targets [P, B, Kd+1], counts [P, B], cache, buf).
                Runs up to P=chunk_size verify passes; pass p commits
                counts[p, b] tokens for row b, which are targets[p, b, :m]
                (acceptance + EOS-cut + budget-cap are all prefix rules).
                Dead rows write seg-0 blocks (masked, no metadata advance)
                and report count 0."""
                B = tokens.shape[0]
                tg0 = jnp.zeros((K, B, Kd + 1), jnp.int32)
                ct0 = jnp.zeros((K, B), jnp.int32)

                def cond(state):
                    p, _, _, _, _, alive, _, _, _ = state
                    return jnp.logical_and(p < K, jnp.any(alive))

                def body(state):
                    p, cache, buf, totals, tokens, alive, budget, tg, ct = \
                        state
                    draft = jax.vmap(
                        lambda b_, t_: lookup_draft(
                            b_, t_, self.spec_ngram, Kd
                        )[0]
                    )(buf, totals)
                    block = jnp.concatenate([tokens[:, None], draft], axis=1)
                    positions = (totals - 1)[:, None] + idx[None, :]
                    seg = jnp.broadcast_to(
                        alive.astype(jnp.int32)[:, None], (B, Kd + 1)
                    )
                    base = cache.length
                    logits, _, cache = model.apply(
                        params, block, cache, positions, seg,
                        method=model.decode_step,
                    )
                    targets = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    match = draft == targets[:, :Kd]
                    a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                                axis=1)
                    committed = idx[None, :] <= a[:, None]
                    is_eos = jnp.any(
                        targets[:, :, None] == eos_arr[None, None, :], axis=-1
                    )
                    eos_hit = jnp.logical_and(is_eos, committed)
                    prior = jnp.cumsum(eos_hit.astype(jnp.int32), axis=1) \
                        - eos_hit.astype(jnp.int32)
                    committed = jnp.logical_and(committed, prior == 0)
                    committed = jnp.logical_and(
                        committed, idx[None, :] < budget[:, None]
                    )
                    committed = jnp.logical_and(committed, alive[:, None])
                    m = jnp.sum(committed.astype(jnp.int32), axis=1)
                    # token-history update at per-row totals
                    old = jax.vmap(
                        lambda b_, t_: jax.lax.dynamic_slice(
                            b_, (t_,), (Kd + 1,)
                        )
                    )(buf, totals)
                    upd = jnp.where(committed, targets, old)
                    buf = jax.vmap(
                        lambda b_, u_, t_: jax.lax.dynamic_update_slice(
                            b_, u_, (t_,)
                        )
                    )(buf, upd, totals)
                    # per-row rollback: keep m of the Kd+1 written slots
                    slot = jnp.arange(cache.max_len, dtype=jnp.int32)[None, :]
                    stale = jnp.logical_and(
                        slot >= (base + m)[:, None],
                        slot < (base + Kd + 1)[:, None],
                    )
                    cache = cache.replace(
                        length=base + m,
                        seg=jnp.where(stale, 0, cache.seg),
                    )
                    last = jnp.take_along_axis(
                        targets, jnp.clip(m - 1, 0)[:, None], axis=1
                    )[:, 0]
                    tokens = jnp.where(m > 0, last, tokens)
                    totals = totals + m
                    budget = budget - m
                    alive = jnp.logical_and(
                        alive,
                        jnp.logical_and(
                            ~jnp.any(jnp.logical_and(is_eos, committed),
                                     axis=1),
                            budget > 0,
                        ),
                    )
                    tg = jax.lax.dynamic_update_slice(tg, targets[None],
                                                      (p, 0, 0))
                    ct = jax.lax.dynamic_update_slice(ct, m[None], (p, 0))
                    return (p + 1, cache, buf, totals, tokens, alive, budget,
                            tg, ct)

                _, cache, buf, _, _, _, _, tg, ct = jax.lax.while_loop(
                    cond, body,
                    (jnp.int32(0), cache, buf, totals, tokens, alive, budget,
                     tg0, ct0),
                )
                return tg, ct, cache

            self._decode_chunk_spec = jax.jit(decode_chunk_spec,
                                              donate_argnums=(1,))

    # -- cache/slot management ------------------------------------------------

    def _fresh_cache(self) -> KVCache:
        llm = self._llm
        cache = KVCache.create(
            llm.num_layers, self.num_slots, self.max_len, llm.num_kv_heads,
            llm.head_dim, dtype=self.cache_dtype,
        )
        return cache.replace(length=jnp.zeros((self.num_slots,), jnp.int32))

    def reset(self) -> None:
        self.cache = self._fresh_cache()

    def _prep_pixels(self, pixel_values):
        """Tile-bucket padding + image_flags (shared by full prefill and
        prefix registration)."""
        if pixel_values is None:
            return None, None
        px = np.asarray(pixel_values)
        flags = None
        if self.tile_buckets is not None:
            t = px.shape[0]
            tb = _pick_bucket(t, self.tile_buckets)
            if tb > t:
                pad = np.zeros((tb - t,) + px.shape[1:], px.dtype)
                px = np.concatenate([px, pad], axis=0)
            flags = jnp.asarray((np.arange(tb) < t).astype(np.int32))
        return jnp.asarray(px), flags

    # -- prefix caching ---------------------------------------------------------

    def register_prefix(self, input_ids, pixel_values=None) -> int:
        """Prefill a shared prompt prefix once; returns a prefix_id for
        `Request.prefix_id`. The prefix KV ([L, 1, bucket, KVH, D] per
        buffer, ~2*L*bucket*KVH*D bytes) stays on device until
        release_prefix()."""
        ids_np = np.asarray(input_ids, np.int32)
        n = int(ids_np.shape[-1])
        nb = _pick_bucket(n, self.prefill_buckets)
        ids = np.full((1, nb), self.pad_token_id, np.int32)
        ids[0, :n] = ids_np.reshape(-1)
        seg = np.zeros((1, nb), np.int32)
        seg[0, :n] = 1
        pixels, flags = self._prep_pixels(pixel_values)
        k1, v1, seg1, lev1, _, _ = self._prefill(
            self.params, jnp.asarray(ids), jnp.asarray(seg), pixels, flags,
            jnp.asarray(n, jnp.int32),
        )
        pid = self._next_prefix_id
        self._next_prefix_id += 1
        self._prefixes[pid] = dict(k=k1, v=v1, seg=seg1, lev=lev1, n=n,
                                   ids=ids_np.reshape(-1))
        return pid

    def release_prefix(self, prefix_id: int) -> None:
        del self._prefixes[prefix_id]

    # -- serving loop ---------------------------------------------------------

    def run(self, requests: Sequence[Request]) -> List[Completion]:
        """Serve all requests to completion; returns completions in the
        order requests finish (sort by uid for submission order)."""
        for req in requests:
            if req.max_new_tokens < 1:
                raise ValueError(
                    f"request {req.uid}: max_new_tokens must be >= 1, "
                    f"got {req.max_new_tokens}"
                )
        sampled_run = any(r.temperature > 0.0 for r in requests)
        # speculation accelerates greedy decode only (committed tokens are
        # verified argmaxes); a sampled run takes the sampled chunk path
        use_spec = self.spec_draft_len > 0 and not sampled_run
        queue = deque(requests)
        slots: List[Optional[_Slot]] = [None] * self.num_slots
        done: List[Completion] = []
        self.reset()

        def finish(row: int, include_last: bool) -> None:
            st = slots[row]
            toks = list(st.generated)
            if include_last:
                toks.append(st.last_token)
            # trim at EOS (the engine stops on it, but a max_new cut can
            # land exactly on one)
            out = []
            for t in toks:
                if t in self.eos:
                    break
                out.append(t)
            done.append(Completion(st.req.uid, out, st.prompt_len))
            slots[row] = None

        while queue or any(s is not None for s in slots):
            # 1) admit waiting requests into free slots. All device work
            # (prefill, insert, first-token sample) dispatches
            # asynchronously; the wave's first tokens come back in ONE
            # host sync at the end — per-request readbacks each paid a
            # full host<->device round trip.
            admitted = []  # (row, req, tok_dev, rng_dev_or_None, n)
            for row in range(self.num_slots):
                if slots[row] is not None or not queue:
                    continue
                req = queue.popleft()
                m = int(len(req.input_ids))
                if req.prefix_id is not None:
                    pref = self._prefixes[req.prefix_id]
                    assert req.pixel_values is None, (
                        f"request {req.uid}: a prefix_id tail is text-only "
                        "(put the image in the registered prefix)"
                    )
                    n = pref["n"] + m
                    sb = _pick_bucket(m, self.prefill_buckets)
                    assert pref["k"].shape[2] + sb <= self.max_len, (
                        f"request {req.uid}: prefix bucket "
                        f"{pref['k'].shape[2]} + tail bucket {sb} exceeds "
                        f"max_len {self.max_len}"
                    )
                else:
                    n = m
                # speculative runs write Kd+1-token blocks at fill depths up
                # to n+max_new-1, so the cache needs a draft_len margin
                margin = self.spec_draft_len if use_spec else 0
                assert n + req.max_new_tokens + margin <= self.max_len, (
                    f"request {req.uid}: {n}+{req.max_new_tokens}+{margin} "
                    f"(speculative margin) exceeds max_len {self.max_len}"
                )
                if req.prefix_id is not None:
                    ids = np.full((1, sb), self.pad_token_id, np.int32)
                    ids[0, :m] = req.input_ids
                    seg = np.zeros((1, sb), np.int32)
                    seg[0, :m] = 1
                    k1, v1, seg1, lev1, tok, last = self._prefill_suffix(
                        self.params, pref["k"], pref["v"], pref["seg"],
                        pref["lev"], jnp.asarray(pref["n"], jnp.int32),
                        jnp.asarray(ids), jnp.asarray(seg),
                        jnp.asarray(m, jnp.int32),
                    )
                else:
                    nb = _pick_bucket(n, self.prefill_buckets)
                    ids = np.full((1, nb), self.pad_token_id, np.int32)
                    ids[0, :n] = req.input_ids
                    seg = np.zeros((1, nb), np.int32)
                    seg[0, :n] = 1
                    pixels, flags = self._prep_pixels(req.pixel_values)
                    k1, v1, seg1, lev1, tok, last = self._prefill(
                        self.params, jnp.asarray(ids), jnp.asarray(seg),
                        pixels, flags, jnp.asarray(n, jnp.int32),
                    )
                self.cache = self._insert(
                    self.cache, k1, v1, seg1, lev1,
                    jnp.asarray(row, jnp.int32), jnp.asarray(n, jnp.int32),
                )
                rng = None
                if req.temperature > 0.0:
                    tok, rng = self._sample_first(
                        last, jax.random.PRNGKey(req.seed),
                        jnp.asarray(req.temperature, jnp.float32),
                        jnp.asarray(req.top_k, jnp.int32),
                        jnp.asarray(req.top_p, jnp.float32),
                    )
                admitted.append((row, req, tok, rng, n))
            if admitted:
                # the wave's only host syncs: first tokens, then the
                # sampled rows' advanced PRNG keys
                wave_toks = np.asarray(jnp.stack([a[2] for a in admitted]))
                rng_rows = [a[3] for a in admitted if a[3] is not None]
                wave_rngs = (
                    iter(np.asarray(jnp.stack(rng_rows))) if rng_rows
                    else None
                )
            for i, (row, req, _, rng_dev, n) in enumerate(admitted):
                tok = int(wave_toks[i])
                rng = next(wave_rngs) if rng_dev is not None else None
                hist = None
                if use_spec:
                    hist = (
                        np.concatenate([
                            self._prefixes[req.prefix_id]["ids"],
                            np.asarray(req.input_ids, np.int32),
                        ])
                        if req.prefix_id is not None
                        else np.asarray(req.input_ids, np.int32)
                    )
                slots[row] = _Slot(req, tok, [], rng, prompt_len=n,
                                   hist=hist)
                if tok in self.eos or req.max_new_tokens <= 1:
                    finish(row, include_last=True)

            if not any(s is not None for s in slots):
                continue

            # 2) one decode CHUNK (up to chunk_size on-device steps) for
            # every occupied slot
            tokens = np.full((self.num_slots,), self.pad_token_id, np.int32)
            alive = np.zeros((self.num_slots,), bool)
            budget = np.zeros((self.num_slots,), np.int32)
            for row, st in enumerate(slots):
                if st is not None:
                    tokens[row] = st.last_token
                    alive[row] = True
                    # decode steps this row may still take (each commits
                    # one token; the prefill token is already committed)
                    budget[row] = st.req.max_new_tokens - (
                        len(st.generated) + 1
                    )
            if use_spec:
                # assemble per-row token history (prompt + committed) on
                # host — a few KB per chunk, no resident device state
                W = self._spec_buf_width
                buf = np.full((self.num_slots, W), self.pad_token_id,
                              np.int32)
                totals = np.zeros((self.num_slots,), np.int32)
                for row, st in enumerate(slots):
                    if st is None:
                        continue
                    hist = np.concatenate([
                        st.hist,
                        np.asarray(st.generated, np.int32),
                        np.asarray([st.last_token], np.int32),
                    ])
                    buf[row, : len(hist)] = hist
                    totals[row] = len(hist)
                tg, ct, self.cache = self._decode_chunk_spec(
                    self.params, self.cache, jnp.asarray(buf),
                    jnp.asarray(totals), jnp.asarray(tokens),
                    jnp.asarray(alive), jnp.asarray(budget),
                )
                tg, ct = np.asarray(tg), np.asarray(ct)
                # replay: pass p committed ct[p, row] tokens tg[p, row, :m]
                # through the same retirement rules as the device
                for p in range(tg.shape[0]):
                    for row, st in enumerate(slots):
                        if st is None or not alive[row]:
                            continue
                        for j in range(int(ct[p, row])):
                            t = int(tg[p, row, j])
                            st.generated.append(st.last_token)
                            st.last_token = t
                            if t in self.eos:
                                finish(row, include_last=False)
                                alive[row] = False
                                break
                            if len(st.generated) + 1 >= st.req.max_new_tokens:
                                finish(row, include_last=True)
                                alive[row] = False
                                break
                continue

            if sampled_run:
                keys = np.zeros((self.num_slots, 2), np.uint32)
                temps = np.zeros((self.num_slots,), np.float32)
                top_ks = np.zeros((self.num_slots,), np.int32)
                top_ps = np.ones((self.num_slots,), np.float32)
                for row, st in enumerate(slots):
                    if st is not None and st.rng is not None:
                        keys[row] = st.rng
                        temps[row] = st.req.temperature
                        top_ks[row] = st.req.top_k
                        top_ps[row] = st.req.top_p
                toks, self.cache, new_keys = self._decode_chunk_sampled(
                    self.params, self.cache, jnp.asarray(tokens),
                    jnp.asarray(alive), jnp.asarray(budget),
                    jnp.asarray(keys), jnp.asarray(temps),
                    jnp.asarray(top_ks), jnp.asarray(top_ps),
                )
                new_keys = np.asarray(new_keys)
                for row, st in enumerate(slots):
                    if st is not None and st.rng is not None:
                        st.rng = new_keys[row]
            else:
                toks, self.cache = self._decode_chunk(
                    self.params, self.cache, jnp.asarray(tokens),
                    jnp.asarray(alive), jnp.asarray(budget),
                )
            toks = np.asarray(toks)  # [K, B]

            # 3) replay the chunk through the retirement rules (identical
            # to the device's _advance, so a retired row's later chunk
            # entries are never read)
            for k in range(toks.shape[0]):
                for row, st in enumerate(slots):
                    if st is None or not alive[row]:
                        continue
                    st.generated.append(st.last_token)
                    st.last_token = int(toks[k, row])
                    if st.last_token in self.eos:
                        finish(row, include_last=False)
                        alive[row] = False
                    elif len(st.generated) + 1 >= st.req.max_new_tokens:
                        finish(row, include_last=True)
                        alive[row] = False
        return done
