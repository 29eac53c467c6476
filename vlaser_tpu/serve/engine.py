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


class _PendingSlot:
    """Row admitted on device (prefill/insert/merge dispatched) whose
    first-token readback has not been replayed yet — occupies the slot so
    the wave builder cannot double-admit."""

    __slots__ = ("req",)

    def __init__(self, req: Request):
        self.req = req


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
        # scheduling defaults from the round-4 on-chip sweep (docs/STATUS):
        # 16 slots is the vLLM max_num_seqs role — continuous batching's
        # edge IS a deep running batch (at 8 slots a 16-request mixed
        # workload fragments into 4 admission waves and loses to static
        # batching); chunk 64 amortizes the per-chunk host round trip
        num_slots: int = 16,
        max_len: int = 1024,
        eos_token_ids: Sequence[int],
        pad_token_id: int,
        prefill_buckets: Optional[Sequence[int]] = None,
        tile_buckets: Optional[Sequence[int]] = None,
        cache_dtype=jnp.bfloat16,
        chunk_size: int = 64,
        speculative_draft_len: int = 0,
        speculative_ngram: int = 2,
        speculative_adaptive: bool = True,
        spec_threshold_base: float = 1.1,
        spec_threshold_slope: float = 0.05,
        spec_reprobe_every: int = 8,
        mesh=None,
        auto_prefix_block: Optional[int] = None,
        auto_prefix_max: int = 8,
        auto_prefix_min_gain: Optional[int] = None,
        pipeline_depth: int = 1,
    ):
        llm = model.cfg.llm
        # chunks the pipelined greedy loop keeps in flight beyond the one
        # being replayed. Default 1 = the round-4 on-chip scheduling
        # sweep's winner (docs/STATUS.md: deeper pipelines delay
        # retirement discovery more than they hide RTT); the shipped
        # default now equals the swept config (round-4 VERDICT #8),
        # asserted by tests/test_engine.py::test_engine_defaults_match_sweep
        self.pipeline_depth = int(pipeline_depth)
        assert self.pipeline_depth >= 1
        assert llm.sliding_window is None, (
            "continuous batching decodes with per-row offsets; "
            "sliding-window models are unsupported"
        )
        self.model = model
        # Tensor-parallel serving (the reference's vllm_tp role:
        # data-pipeline/RoboTwin-QA/GroundingQA.py:158 runs vLLM at
        # tensor_parallel_size=2 for the 8B tier). Params shard over the
        # mesh's 'tensor' axis via the SAME path rules training and the
        # policy server use (core/mesh.default_param_rules); every jitted
        # engine fn (prefill / insert / decode chunks) then runs under
        # GSPMD, which inserts the all-reduces — no separate TP runtime.
        # The persistent KV cache shards over the KV-head axis when the
        # tp degree divides num_kv_heads (each chip holds its own heads'
        # cache; attention is head-local so decode needs no cache
        # collectives), else it is replicated. Host-side scheduling is
        # unchanged: np.asarray readbacks gather transparently.
        self.mesh = mesh
        self._kv_shard = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..core.mesh import TENSOR_AXIS, default_param_rules, \
                tree_shardings

            params = jax.device_put(
                params, tree_shardings(params, mesh, default_param_rules())
            )
            tp = mesh.shape.get(TENSOR_AXIS, 1)
            t = TENSOR_AXIS if llm.num_kv_heads % max(tp, 1) == 0 else None
            self._kv_shard = dict(
                kv=NamedSharding(mesh, P(None, None, None, t, None)),
                meta=NamedSharding(mesh, P()),
            )
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
        # admission-group size buckets (powers of two up to num_slots):
        # a wave's same-shape admissions prefill as ONE [k, bucket] batch,
        # padded up to the nearest k-bucket to bound compile count
        kb, ks = 1, []
        while kb < num_slots:
            ks.append(kb)
            kb *= 2
        ks.append(num_slots)
        self._admit_kbuckets = tuple(sorted(set(ks)))
        self.tile_buckets = (
            None if tile_buckets is None else tuple(sorted(set(tile_buckets)))
        )
        self._llm = llm
        self.stats: Dict[str, int] = {}
        self.cache = self._fresh_cache()

        def prefill(params, ids, seg, pixels, flags, true_lens):
            """Batched admission prefill: ids [k, nb] prefills a whole
            admission-wave GROUP in one forward (k same-bucket requests
            stacked — vLLM admits a prefill batch per scheduler step, and a
            [k, nb] matmul feeds the MXU k-fold better than k serialized
            [1, nb] calls). Per-request results are row-independent, so
            tokens are identical to the k solo prefills."""
            k, nb = ids.shape
            cache = KVCache.create(
                llm.num_layers, k, nb, llm.num_kv_heads, llm.head_dim,
                dtype=cache_dtype,
            )
            logits, _, cache = model.apply(
                params, ids, pixels, seg, cache, image_flags=flags,
                method=model.prefill,
            )
            last = jnp.take_along_axis(
                logits, (true_lens - 1)[:, None, None], axis=1
            )[:, 0]
            token = jnp.argmax(last, axis=-1).astype(jnp.int32)
            return cache.k, cache.v, cache.seg, cache.lev, token, last

        # one compile per (k-bucket, bucket, tile-bucket); cheap enough to
        # share one jit
        self._prefill = jax.jit(prefill)

        def prefill_suffix(params, pk, pv, pseg, plev, plen, ids, seg,
                           true_ms):
            """Prefill text tails against a stored prefix KV: ONE cached
            multi-token forward for a whole group of tails (ids [k, sb] —
            QA generation admits many questions over the same frame at
            once). Each combined row cache is [prefix_bucket + tail_bucket]
            wide; the shared prefix KV is broadcast to every row at slots
            [0, prefix_bucket) (seg 0 beyond plen), length starts at plen so
            tail K/V land at slots plen.. and take rope positions plen+i —
            identical arithmetic to a full prefill of prefix+tail."""
            k_rows, sb = ids.shape
            pb = pk.shape[2]
            nbt = pb + sb
            cache = KVCache.create(
                llm.num_layers, k_rows, nbt, llm.num_kv_heads, llm.head_dim,
                dtype=cache_dtype,
            )
            bshape = (pk.shape[0], k_rows, pb) + pk.shape[3:]
            # mask the stored metadata at plen: one stored entry (APC
            # registers the full block-aligned prefill) serves ANY matched
            # prefix length — slots >= plen hold the storing request's own
            # later tokens and must be unattendable here
            pos = jnp.arange(pb, dtype=jnp.int32)[None, :]
            pseg = jnp.where(pos < plen, pseg, 0)
            plev = jnp.where(pos < plen, plev, 0)
            cache = cache.replace(
                k=cache.k.at[:, :, :pb].set(
                    jnp.broadcast_to(pk.astype(cache.k.dtype), bshape)
                ),
                v=cache.v.at[:, :, :pb].set(
                    jnp.broadcast_to(pv.astype(cache.v.dtype), bshape)
                ),
                seg=cache.seg.at[:, :pb].set(
                    jnp.broadcast_to(pseg, (k_rows, pb))
                ),
                lev=cache.lev.at[:, :pb].set(
                    jnp.broadcast_to(plev, (k_rows, pb))
                ),
                # scalar length: every row's tail writes at the same plen
                # offset (KVCache's contiguous-slot write path)
                length=plen,
            )
            logits, _, cache = model.apply(
                params, ids, cache, None, seg, method=model.decode_step,
            )
            last = jnp.take_along_axis(
                logits, (true_ms - 1)[:, None, None], axis=1
            )[:, 0]
            token = jnp.argmax(last, axis=-1).astype(jnp.int32)
            return cache.k, cache.v, cache.seg, cache.lev, token, last

        self._prefill_suffix = jax.jit(prefill_suffix)
        self._prefixes: Dict[int, dict] = {}
        self._next_prefix_id = 0
        # Automatic prefix caching (vLLM APC role, the static-shape way):
        # prompts are hashed in `auto_prefix_block`-token blocks, the chain
        # seeded by a digest of the prompt's pixel tiles (so two prompts
        # with identical text but different images never match, and
        # text-only never matches image-bearing). Every full prefill
        # REGISTERS its block-aligned prefix KV (sliced out of the batched
        # prefill it already paid for — no extra forward) into an LRU
        # store; a later prompt whose leading blocks hash-match admits
        # through the suffix path against the stored KV, skipping the
        # shared prefix's attention AND the ViT. Reference workload this
        # serves: data-pipeline/src/agent/filter.py:383-393 scores
        # near-identical prompts with no engine-aware plumbing.
        self.auto_prefix_block = (
            None if auto_prefix_block is None else int(auto_prefix_block)
        )
        assert self.auto_prefix_block is None or self.auto_prefix_block >= 1
        self.auto_prefix_max = int(auto_prefix_max)
        # Store an entry only when it extends the best EXISTING aligned
        # coverage by >= min_gain tokens. Without this, a QA-shaped stream
        # (one shared 300-token prefix, per-request tails) stores one
        # near-duplicate full-width KV slab PER REQUEST — each covering
        # the shared blocks plus a few tokens of its own tail — and the
        # LRU churns every entry out before it can be reused (measured:
        # the APC path ran 4x SLOWER than no caching at all). vLLM shares
        # per-block KV so a unique tail block costs one block; this
        # engine's unit is a prompt-wide slab, so marginal tail coverage
        # is not worth a slab. min_gain defaults to 4 blocks.
        self.auto_prefix_min_gain = (
            None if self.auto_prefix_block is None
            else (int(auto_prefix_min_gain) if auto_prefix_min_gain
                  is not None else 4 * self.auto_prefix_block)
        )
        from collections import OrderedDict

        self._auto: "OrderedDict[bytes, tuple]" = OrderedDict()
        self._auto_pids: Dict[int, set] = {}
        self.auto_prefix_hits = 0
        self.auto_prefix_misses = 0

        def insert(cache, kb, vb, segb, levb, rows, true_lens):
            """Splice a batched prefill's k rows into the big cache at slot
            indices `rows` ([k] int32). A row index == num_slots is a
            group-padding row and is DROPPED by the scatter (out of
            bounds, mode='drop'); real rows are distinct, so scatter order
            is immaterial."""
            kk = rows.shape[0]
            nb = segb.shape[1]
            k = cache.k.at[:, rows, :nb].set(
                kb.astype(cache.k.dtype), mode="drop"
            )
            v = cache.v.at[:, rows, :nb].set(
                vb.astype(cache.v.dtype), mode="drop"
            )
            # clear the WHOLE row's metadata: a freed slot's stale seg ids
            # beyond this prompt must never be attendable again
            row_seg = jnp.zeros((kk, cache.seg.shape[1]), jnp.int32)
            row_seg = row_seg.at[:, :nb].set(segb)
            seg = cache.seg.at[rows].set(row_seg, mode="drop")
            row_lev = jnp.zeros((kk, cache.lev.shape[1]), jnp.int32)
            row_lev = row_lev.at[:, :nb].set(levb)
            lev = cache.lev.at[rows].set(row_lev, mode="drop")
            length = cache.length.at[rows].set(true_lens, mode="drop")
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

        def decode_chunk(params, cache, tokens, alive, budget, kcap):
            """-> (emitted [K, B] int32, cache, tokens, alive, budget).
            Runs up to kcap (<= K, dynamic) greedy steps on device; exits
            early once every row is dead. Emitted rows past a row's death
            repeat its frozen token — the host's own bookkeeping never
            reads them. The (tokens, alive, budget) row state is RETURNED
            as device arrays so the host can chain chunk i+1 directly off
            chunk i's output handles without a blocking readback — the
            pipelined run loop keeps the chip busy through the scheduler's
            host<->device RTT (~tens of ms over a tunnel)."""
            B = tokens.shape[0]
            buf0 = jnp.zeros((K, B), jnp.int32)

            def cond(state):
                step, _, _, alive, _, _ = state
                return jnp.logical_and(step < kcap, jnp.any(alive))

            def body(state):
                step, cache, tokens, alive, budget, buf = state
                lg, cache = _one_step(params, cache, tokens, alive)
                nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                buf = jax.lax.dynamic_update_slice(buf, nxt[None],
                                                   (step, 0))
                tokens, alive, budget = _advance(tokens, alive, budget, nxt)
                return step + 1, cache, tokens, alive, budget, buf

            _, cache, tokens, alive, budget, buf = jax.lax.while_loop(
                cond, body, (jnp.int32(0), cache, tokens, alive, budget,
                             buf0)
            )
            return buf, cache, tokens, alive, budget

        self._decode_chunk = jax.jit(decode_chunk, donate_argnums=(1,))

        def admit_merge(tokens, alive, budget, rows, toks_new, max_news):
            """Splice a dispatched admission group's first tokens into the
            device-resident row state (rows == num_slots are group padding,
            dropped). A row whose FIRST token is EOS (or whose budget is
            already spent) starts dead — the same rule the host replay
            applies, so device and host never disagree."""
            first_dead = jnp.any(
                toks_new[:, None] == eos_arr[None, :], axis=-1
            ) | (max_news <= 1)
            tokens = tokens.at[rows].set(toks_new, mode="drop")
            alive = alive.at[rows].set(~first_dead, mode="drop")
            budget = budget.at[rows].set(max_news - 1, mode="drop")
            return tokens, alive, budget

        self._admit_merge = jax.jit(admit_merge)

        def decode_chunk_sampled(params, cache, tokens, alive, budget, keys,
                                 temps, top_ks, top_ps, kcap):
            """Sampled twin: per-row PRNG chains advance once per step
            (matching make_generate_fn's split-per-step), riding the same
            early-exit loop."""
            B = tokens.shape[0]
            buf0 = jnp.zeros((K, B), jnp.int32)

            def cond(state):
                step, _, _, alive, _, _, _ = state
                return jnp.logical_and(step < kcap, jnp.any(alive))

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
        # Occupancy-adaptive speculation (the vLLM policy: spec decode
        # subtracts value when acceptance is low and the batch is full —
        # a [B, Kd+1] verify pass costs more than a [B, 1] step and
        # commits ~1 token/row when drafts miss). The engine measures
        # tokens-per-row-per-pass on its own traffic (EMA) and falls back
        # to plain chunks whenever the EMA is under an occupancy-scaled
        # break-even threshold. Policy hardened round 5 (round-4 VERDICT
        # #4: in a bad session the old policy cost −11% vs plain):
        #  - PESSIMISTIC START: the first chunk is a bounded probe (1-2
        #    verify passes), not a full speculative chunk — undraftable
        #    text no longer pays up to chunk_size expensive passes before
        #    the EMA exists;
        #  - EXPONENTIAL BACKOFF: a failed probe doubles the plain-chunk
        #    interval to the next probe (cap 16x spec_reprobe_every), so
        #    persistently undraftable text converges to ~zero probe
        #    overhead instead of paying a probe every 8 chunks forever;
        #  - OCCUPANCY-BOUNDED PROBES: at >half-full slots a probe is 1
        #    verify pass (the per-pass cost scales with live rows), 2
        #    otherwise. A successful probe (acceptance >= the occupancy
        #    threshold at dispatch) jumps the EMA to the measured rate and
        #    resets the interval, so speculation turns fully on within
        #    one chunk of the text turning draftable.
        self.speculative_adaptive = bool(speculative_adaptive)
        self.spec_threshold_base = float(spec_threshold_base)
        self.spec_threshold_slope = float(spec_threshold_slope)
        self.spec_reprobe_every = int(spec_reprobe_every)
        self.spec_chunks_run = 0
        self.plain_chunks_run = 0
        self.spec_last_ema: Optional[float] = None
        self._spec_plain_streak = 0
        self._spec_probe_interval = self.spec_reprobe_every
        if Kd > 0:
            assert self.spec_ngram >= 1
            W = self.max_len + Kd + 1  # per-row token-history width
            self._spec_buf_width = W
            idx = jnp.arange(Kd + 1, dtype=jnp.int32)

            def decode_chunk_spec(params, cache, buf, totals, tokens, alive,
                                  budget, kcap):
                """-> (targets [P, B, Kd+1], counts [P, B], cache, buf,
                totals, tokens, alive, budget). Runs up to kcap (<=
                P=chunk_size, dynamic) verify passes; pass p commits
                counts[p, b] tokens for row b, which are targets[p, b, :m]
                (acceptance + EOS-cut + budget-cap are all prefix rules).
                Dead rows write seg-0 blocks (masked, no metadata advance)
                and report count 0. The full row state INCLUDING the
                token-history (buf, totals) returns as device arrays so
                the pipelined loop can chain spec chunks without a host
                readback, exactly like the plain chunk."""
                B = tokens.shape[0]
                tg0 = jnp.zeros((K, B, Kd + 1), jnp.int32)
                ct0 = jnp.zeros((K, B), jnp.int32)

                def cond(state):
                    p, _, _, _, _, alive, _, _, _ = state
                    return jnp.logical_and(p < kcap, jnp.any(alive))

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

                (_, cache, buf, totals, tokens, alive, budget, tg,
                 ct) = jax.lax.while_loop(
                    cond, body,
                    (jnp.int32(0), cache, buf, totals, tokens, alive, budget,
                     tg0, ct0),
                )
                return tg, ct, cache, buf, totals, tokens, alive, budget

            self._decode_chunk_spec = jax.jit(decode_chunk_spec,
                                              donate_argnums=(1, 2))

            def spec_admit_merge(buf, totals, rows, hists, hlens, first):
                """Splice admitted rows' token histories into the
                device-resident draft window: the prompt is host-assembled
                ([k, W]); the prefill's first token (`first`, a device
                array — not host-known at dispatch time) is appended on
                device. Padding rows (== num_slots) drop."""
                buf = buf.at[rows].set(hists, mode="drop")
                buf = buf.at[rows, hlens].set(first, mode="drop")
                totals = totals.at[rows].set(hlens + 1, mode="drop")
                return buf, totals

            self._spec_admit_merge = jax.jit(spec_admit_merge,
                                             donate_argnums=(0,))

            def decode_chunk_hist(params, cache, buf, totals, tokens, alive,
                                  budget, kcap):
                """Plain greedy chunk that ALSO appends committed tokens to
                the draft history — dispatched when adaptive speculation
                falls back to 1-token steps, so a later spec chunk drafts
                from a current window. Token semantics identical to
                decode_chunk (pinned by the engine identity tests, which
                run the spec engine across the adaptive fallback)."""
                B = tokens.shape[0]
                buf0 = jnp.zeros((K, B), jnp.int32)

                def cond(state):
                    step, _, _, _, _, alive, _, _ = state
                    return jnp.logical_and(step < kcap, jnp.any(alive))

                def body(state):
                    step, cache, buf, totals, tokens, alive, budget, out = \
                        state
                    lg, cache = _one_step(params, cache, tokens, alive)
                    nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                    out = jax.lax.dynamic_update_slice(out, nxt[None],
                                                       (step, 0))
                    # history append for rows that fed this step (their
                    # emission commits; dead rows don't advance totals, so
                    # their stale write is invisible to lookup_draft)
                    buf = jax.vmap(
                        lambda b_, v_, t_: jax.lax.dynamic_update_slice(
                            b_, v_[None], (t_,)
                        )
                    )(buf, nxt, totals)
                    totals = totals + alive.astype(jnp.int32)
                    tokens, alive, budget = _advance(tokens, alive, budget,
                                                     nxt)
                    return (step + 1, cache, buf, totals, tokens, alive,
                            budget, out)

                (_, cache, buf, totals, tokens, alive, budget,
                 out) = jax.lax.while_loop(
                    cond, body,
                    (jnp.int32(0), cache, buf, totals, tokens, alive,
                     budget, buf0),
                )
                return out, cache, buf, totals, tokens, alive, budget

            self._decode_chunk_hist = jax.jit(decode_chunk_hist,
                                              donate_argnums=(1, 2))

    # -- cache/slot management ------------------------------------------------

    def _fresh_cache(self) -> KVCache:
        llm = self._llm
        cache = KVCache.create(
            llm.num_layers, self.num_slots, self.max_len, llm.num_kv_heads,
            llm.head_dim, dtype=self.cache_dtype,
        )
        cache = cache.replace(length=jnp.zeros((self.num_slots,), jnp.int32))
        if self._kv_shard is not None:
            s = self._kv_shard
            cache = cache.replace(
                k=jax.device_put(cache.k, s["kv"]),
                v=jax.device_put(cache.v, s["kv"]),
                seg=jax.device_put(cache.seg, s["meta"]),
                lev=jax.device_put(cache.lev, s["meta"]),
                length=jax.device_put(cache.length, s["meta"]),
            )
        return cache

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
            jnp.asarray([n], jnp.int32),
        )
        pid = self._next_prefix_id
        self._next_prefix_id += 1
        self._prefixes[pid] = dict(k=k1, v=v1, seg=seg1, lev=lev1, n=n,
                                   ids=ids_np.reshape(-1))
        return pid

    def release_prefix(self, prefix_id: int) -> None:
        del self._prefixes[prefix_id]

    # -- automatic prefix caching (vLLM APC role) -----------------------------

    @staticmethod
    def _pixels_digest(pixel_values) -> bytes:
        """Content digest of the prompt's image tiles — the hash-chain
        seed, so prompts with identical text but different pixels can
        never share a cached prefix."""
        if pixel_values is None:
            return b""
        import hashlib

        px = np.ascontiguousarray(np.asarray(pixel_values))
        h = hashlib.blake2b(digest_size=16)
        h.update(str(px.shape).encode() + str(px.dtype).encode())
        h.update(px.tobytes())
        return h.digest()

    def _auto_keys(self, ids: np.ndarray, digest: bytes) -> List[bytes]:
        """Cumulative block-hash chain: keys[j] identifies the first
        (j+1)*block tokens (+ pixel digest). Only block-aligned prefixes
        that leave >= 1 tail token are keyed."""
        import hashlib

        blk = self.auto_prefix_block
        nblocks = (len(ids) - 1) // blk
        h = hashlib.blake2b(digest, digest_size=16)
        keys = []
        for j in range(nblocks):
            h.update(np.ascontiguousarray(
                ids[j * blk:(j + 1) * blk]).tobytes())
            keys.append(h.digest())
        return keys

    def _img_end(self, ids: np.ndarray, pixel_values) -> int:
        """First position after the last <IMG_CONTEXT> token: a usable
        cached prefix for an image prompt must cover the whole image block
        (tails are text-only by the suffix-prefill contract)."""
        if pixel_values is None:
            return 0
        tok = getattr(self.model.cfg, "img_context_token_id", None)
        if tok is None:
            return 0
        pos = np.nonzero(ids == tok)[0]
        return int(pos[-1]) + 1 if len(pos) else 0

    def _auto_match(self, ids: np.ndarray, pixel_values):
        """Longest registered block-aligned prefix of `ids` (same pixels),
        or None. Returns (prefix_id, matched_len) — the entry's KV may be
        wider than matched_len; the suffix prefill masks at plen."""
        keys = self._auto_keys(ids, self._pixels_digest(pixel_values))
        img_end = self._img_end(ids, pixel_values)
        blk = self.auto_prefix_block
        for j in range(len(keys) - 1, -1, -1):
            P = (j + 1) * blk
            if P < img_end:
                break  # shorter prefixes cover even less of the image
            hit = self._auto.get(keys[j])
            if hit is None:
                continue
            pid, _ = hit
            sb = _pick_bucket(len(ids) - P, self.prefill_buckets)
            if self._prefixes[pid]["k"].shape[2] + sb > self.max_len:
                continue
            self._auto.move_to_end(keys[j])
            return pid, P
        return None

    def _auto_store(self, ids: np.ndarray, pixel_values, k1, v1, seg1, lev1,
                    row: int, n: int) -> None:
        """Register row `row` of a batched full prefill's KV as ONE stored
        entry keyed at EVERY block boundary (vLLM caches per block; here
        the blocks share one KV slab and the suffix prefill masks at the
        matched length) — sliced from compute already paid for, no extra
        forward. LRU-evicts keys beyond auto_prefix_max entries; an entry
        frees when its last key evicts."""
        blk = self.auto_prefix_block
        nblocks = (n - 1) // blk
        Pmax = nblocks * blk
        if Pmax < blk:
            return
        img_end = self._img_end(ids, pixel_values)
        if Pmax < img_end:
            return  # no aligned prefix covers the image block
        keys = self._auto_keys(ids, self._pixels_digest(pixel_values))
        fresh = [(j, k) for j, k in enumerate(keys) if k not in self._auto]
        for k in keys:
            if k in self._auto:
                self._auto.move_to_end(k)
        if not fresh:
            return
        # min-gain policy (see __init__): the longest aligned prefix the
        # store already covers is everything below the first fresh key; a
        # new slab must beat it by >= min_gain tokens to be worth the
        # storage + the LRU pressure on heavily-shared entries. A prompt
        # with NO covered prefix always stores (it seeds a new family —
        # the first frame of a QA stream, a new image).
        covered = fresh[0][0] * blk
        if covered > 0 and Pmax - covered < self.auto_prefix_min_gain:
            return
        pb = _pick_bucket(Pmax, self.prefill_buckets)
        pid = self._next_prefix_id
        self._next_prefix_id += 1
        self._prefixes[pid] = dict(
            k=k1[:, row:row + 1, :pb],
            v=v1[:, row:row + 1, :pb],
            # seg/lev stored full-width; the suffix prefill masks >= plen,
            # so slots past the matched length are never attendable
            seg=seg1[row:row + 1, :pb],
            lev=lev1[row:row + 1, :pb],
            n=Pmax, ids=np.asarray(ids[:Pmax], np.int32),
        )
        self._auto_pids[pid] = set()
        for j, k in fresh:
            self._auto[k] = (pid, (j + 1) * blk)
            self._auto_pids[pid].add(k)
        while len(self._auto_pids) > self.auto_prefix_max:
            k_old, (pid_old, _) = self._auto.popitem(last=False)
            refs = self._auto_pids[pid_old]
            refs.discard(k_old)
            if not refs:
                del self._auto_pids[pid_old]
                del self._prefixes[pid_old]

    # -- serving loop ---------------------------------------------------------

    def _build_wave(self, queue, slots, use_spec: bool) -> list:
        """Pop waiting requests into free slots: resolve explicit/automatic
        prefix reuse and validate cache fit. Returns the admission wave as
        (row, req, n_total, (prefix_id, plen) | None, tail | None) tuples."""
        wave = []
        for row in range(self.num_slots):
            if slots[row] is not None or not queue:
                continue
            req = queue.popleft()
            ids_np = np.asarray(req.input_ids, np.int32)
            m = int(len(ids_np))
            pk, tail = None, None  # pk = (prefix_id, plen)
            if req.prefix_id is not None:
                pref = self._prefixes[req.prefix_id]
                pk, tail = (req.prefix_id, pref["n"]), ids_np
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
                if self.auto_prefix_block is not None:
                    hit = self._auto_match(ids_np, req.pixel_values)
                    if hit is not None:
                        pid, P = hit
                        pk, tail = (pid, P), ids_np[P:]
                        self.auto_prefix_hits += 1
                    else:
                        self.auto_prefix_misses += 1
            # speculative runs write Kd+1-token blocks at fill depths up
            # to n+max_new-1, so the cache needs a draft_len margin
            margin = self.spec_draft_len if use_spec else 0
            assert n + req.max_new_tokens + margin <= self.max_len, (
                f"request {req.uid}: {n}+{req.max_new_tokens}+{margin} "
                f"(speculative margin) exceeds max_len {self.max_len}"
            )
            wave.append((row, req, n, pk, tail))
        return wave

    def _dispatch_wave(self, wave):
        """Group a wave of admissions by compiled shape and dispatch ONE
        batched [k, bucket] prefill + insert per group (vLLM's
        batched-prefill scheduling): k same-bucket requests feed the MXU
        one k-row matmul instead of k serialized single-row passes. All
        device work dispatches asynchronously — nothing here blocks.
        Returns (admitted, tok_parts, sample_jobs): the wave entries in
        dispatch order, per-group first-token device arrays, and
        (admitted_idx, tok_dev, rng_dev) jobs for sampled rows."""
        groups: Dict[tuple, list] = {}
        for entry in wave:
            _, req, n, pk, tail = entry
            if pk is not None:
                sb = _pick_bucket(len(tail), self.prefill_buckets)
                key = ("sfx", pk[0], pk[1], sb)
            else:
                nb = _pick_bucket(n, self.prefill_buckets)
                if req.pixel_values is None:
                    tk = 0
                else:
                    t = int(np.asarray(req.pixel_values).shape[0])
                    tk = (t if self.tile_buckets is None
                          else _pick_bucket(t, self.tile_buckets))
                key = ("full", nb, tk)
            groups.setdefault(key, []).append(entry)

        admitted = []  # (row, req, n, pk, tail) in dispatch order
        tok_parts = []  # per-group [k_real] first-token device arrays
        sample_jobs = []  # (admitted_idx, tok_dev, rng_dev)
        store_jobs = []  # deferred APC registrations (after all groups,
        # so a store's LRU eviction can't invalidate a pid another
        # group in this same wave matched)
        for key, members in groups.items():
            k_real = len(members)
            kb = _pick_bucket(k_real, self._admit_kbuckets)
            # pad the group by replicating its last request: the
            # replica's output rows are DISCARDED (insert row ==
            # num_slots scatters out of bounds); replicating a real
            # row (vs an all-padding one) keeps every lane's softmax
            # rows well-formed
            padded = members + [members[-1]] * (kb - k_real)
            rows = np.array(
                [e[0] for e in members]
                + [self.num_slots] * (kb - k_real), np.int32,
            )
            tns = np.array([e[2] for e in padded], np.int32)
            if key[0] == "sfx":
                _, pid, plen, sb = key
                pref = self._prefixes[pid]
                ids = np.full((kb, sb), self.pad_token_id, np.int32)
                seg = np.zeros((kb, sb), np.int32)
                tms = np.zeros((kb,), np.int32)
                for i, (_, req, _, _, tail) in enumerate(padded):
                    mi = len(tail)
                    ids[i, :mi] = tail
                    seg[i, :mi] = 1
                    tms[i] = mi
                k1, v1, seg1, lev1, toks, last = self._prefill_suffix(
                    self.params, pref["k"], pref["v"], pref["seg"],
                    pref["lev"], jnp.asarray(plen, jnp.int32),
                    jnp.asarray(ids), jnp.asarray(seg),
                    jnp.asarray(tms),
                )
            else:
                _, nb, tk = key
                ids = np.full((kb, nb), self.pad_token_id, np.int32)
                seg = np.zeros((kb, nb), np.int32)
                px_parts, fl_parts = [], []
                for i, (_, req, n, _, _) in enumerate(padded):
                    ids[i, :n] = req.input_ids
                    seg[i, :n] = 1
                    if tk:
                        px = np.asarray(req.pixel_values)
                        t = px.shape[0]
                        if tk > t:
                            px = np.concatenate([
                                px,
                                np.zeros((tk - t,) + px.shape[1:],
                                         px.dtype),
                            ], axis=0)
                        px_parts.append(px)
                        fl_parts.append(
                            (np.arange(tk) < t).astype(np.int32)
                        )
                pixels = (jnp.asarray(np.concatenate(px_parts, 0))
                          if tk else None)
                flags = (jnp.asarray(np.concatenate(fl_parts, 0))
                         if tk else None)
                k1, v1, seg1, lev1, toks, last = self._prefill(
                    self.params, jnp.asarray(ids), jnp.asarray(seg),
                    pixels, flags, jnp.asarray(tns),
                )
                if self.auto_prefix_block is not None:
                    for i, (_, req, n, _, _) in enumerate(members):
                        store_jobs.append((
                            np.asarray(req.input_ids, np.int32),
                            req.pixel_values, k1, v1, seg1, lev1, i, n,
                        ))
            self.cache = self._insert(
                self.cache, k1, v1, seg1, lev1, jnp.asarray(rows),
                jnp.asarray(tns),
            )
            for i, (row, req, n, _, _) in enumerate(members):
                if req.temperature > 0.0:
                    tok_s, rng_s = self._sample_first(
                        last[i], jax.random.PRNGKey(req.seed),
                        jnp.asarray(req.temperature, jnp.float32),
                        jnp.asarray(req.top_k, jnp.int32),
                        jnp.asarray(req.top_p, jnp.float32),
                    )
                    sample_jobs.append((len(admitted) + i, tok_s, rng_s))
            admitted.extend(members)
            tok_parts.append(toks[:k_real])
        for job in store_jobs:
            self._auto_store(*job)
        return admitted, tok_parts, sample_jobs

    def _run_pipelined(self, requests: Sequence[Request],
                       use_spec: bool = False,
                       on_token=None) -> List[Completion]:
        """Greedy serving with a software-pipelined scheduler.

        The non-pipelined loop blocks on every chunk readback: over a
        tunneled link each host<->device round trip is tens of ms, and a
        mixed workload takes several chunks, so the chip idles 30-40% of
        wall clock waiting for the scheduler (measured: the r3 engine LOST
        to naive static batching, 715 vs 893 tok/s). Here all scheduling
        state the DEVICE needs (tokens/alive/budget + the cache, plus the
        draft-history window when speculating) chains from chunk to chunk
        as device arrays: the host dispatches chunk i+1 before reading
        chunk i, then replays chunk i's emissions through the retirement
        rules while the chip is busy. Aliveness (EOS/budget) is enforced
        on device, so a chunk dispatched before the host knows about a
        retirement simply carries frozen dead rows — token streams are
        unchanged (identity pinned by tests/test_engine.py, which runs
        this loop for every greedy case).
        Admission lags one chunk (a freed slot refills after the replay
        that discovers it) — the price of never stalling the chip.

        With use_spec, chunks are [B, Kd+1] verify passes
        (decode_chunk_spec) and the per-row token history rides along on
        device; the adaptive policy decides per chunk from the EMA as of
        the last REPLAYED spec chunk (pipeline-depth stale — the
        break-even moves slowly), falling back to history-carrying plain
        chunks so a later re-probe drafts from a current window."""
        queue = deque(requests)
        B = self.num_slots
        slots: list = [None] * B  # None | _PendingSlot | _Slot
        done: List[Completion] = []
        self.reset()
        # scheduling statistics for the last run (throughput forensics:
        # waves/groups say how batched admission really was, kcap_sum
        # bounds device decode steps dispatched)
        self.stats = dict(waves=0, groups=0, admitted_rows=0, chunks=0,
                          kcap_sum=0, spec_chunks=0)
        tokens = jnp.full((B,), self.pad_token_id, jnp.int32)
        alive = jnp.zeros((B,), bool)
        budget = jnp.zeros((B,), jnp.int32)
        if use_spec:
            W = self._spec_buf_width
            sbuf = jnp.full((B, W), self.pad_token_id, jnp.int32)
            stotals = jnp.zeros((B,), jnp.int32)
        # host mirror of row state, exact as of the last REPLAYED event
        h_alive = np.zeros((B,), bool)
        inflight: deque = deque()  # ("adm", admitted, tok_parts) |
        #                            ("chunk", buf_dev, kcap) |
        #                            ("spec", tg_dev, ct_dev, kcap,
        #                             probe_bar)  # probe_bar None = full
        #                            spec chunk; float = bounded probe,
        #                            judged against it at replay

        def finish(row: int, include_last: bool) -> None:
            st = slots[row]
            toks = list(st.generated)
            if include_last:
                toks.append(st.last_token)
                if on_token is not None and st.last_token not in self.eos:
                    on_token(st.req.uid, st.last_token)
            out = []
            for t in toks:
                if t in self.eos:
                    break
                out.append(t)
            done.append(Completion(st.req.uid, out, st.prompt_len))
            slots[row] = None

        def commit(row, tok) -> bool:
            """One committed token through the retirement rules (the host
            mirror of the device's _advance); returns row-still-alive."""
            st = slots[row]
            st.generated.append(st.last_token)
            if on_token is not None:
                on_token(st.req.uid, st.generated[-1])
            st.last_token = int(tok)
            if st.last_token in self.eos:
                finish(row, include_last=False)
                h_alive[row] = False
            elif len(st.generated) + 1 >= st.req.max_new_tokens:
                finish(row, include_last=True)
                h_alive[row] = False
            return h_alive[row]

        def replay(ev) -> None:
            if ev[0] == "adm":
                _, admitted, tok_parts = ev
                toks_h = np.asarray(jnp.concatenate(tok_parts))
                for i, (row, req, n, pk, tail) in enumerate(admitted):
                    slots[row] = _Slot(req, int(toks_h[i]), [],
                                       prompt_len=n)
                    if slots[row].last_token in self.eos or \
                            req.max_new_tokens <= 1:
                        finish(row, include_last=True)
                    else:
                        h_alive[row] = True
                return
            if ev[0] == "spec":
                _, tg_dev, ct_dev, kcap, probe_bar = ev
                tg, ct = np.asarray(tg_dev), np.asarray(ct_dev)
                acc_toks = acc_rowpasses = 0
                for p in range(min(tg.shape[0], kcap)):
                    live = [r for r in range(B)
                            if isinstance(slots[r], _Slot) and h_alive[r]]
                    if live:
                        acc_rowpasses += len(live)
                        acc_toks += int(sum(ct[p, r] for r in live))
                    for row in live:
                        for j in range(int(ct[p, row])):
                            if not commit(row, tg[p, row, j]):
                                break
                if acc_rowpasses:
                    a = acc_toks / acc_rowpasses
                    if probe_bar is not None:
                        # probe outcome (policy in __init__): success jumps
                        # the EMA to the measured rate and resets the
                        # interval; failure doubles the interval (capped)
                        if a >= probe_bar:
                            self.spec_last_ema = a
                            self._spec_probe_interval = \
                                self.spec_reprobe_every
                        else:
                            self.spec_last_ema = (
                                a if self.spec_last_ema is None
                                else 0.5 * self.spec_last_ema + 0.5 * a
                            )
                            self._spec_probe_interval = min(
                                2 * self._spec_probe_interval,
                                16 * self.spec_reprobe_every,
                            )
                    else:
                        self.spec_last_ema = (
                            a if self.spec_last_ema is None
                            else 0.5 * self.spec_last_ema + 0.5 * a
                        )
                self.spec_chunks_run += 1
                return
            _, buf_dev, kcap = ev
            buf = np.asarray(buf_dev)  # blocks; later chunks already queued
            for k in range(min(buf.shape[0], kcap)):
                for row, st in enumerate(slots):
                    if st is None or isinstance(st, _PendingSlot) or \
                            not h_alive[row]:
                        continue
                    commit(row, buf[k, row])


        def _prefetch_host(*arrs):
            """Start async device->host copies at DISPATCH time so the
            replay's np.asarray finds the data already local — the D2H
            latency overlaps the next chunk's host work instead of adding
            to the oldest event's blocking sync (host-RTT tail shaving;
            round-4 VERDICT #3)."""
            for a in arrs:
                f = getattr(a, "copy_to_host_async", None)
                if f is not None:
                    f()

        def chunks_in_flight() -> int:
            return sum(1 for ev in inflight if ev[0] in ("chunk", "spec"))

        while queue or any(s is not None for s in slots) or inflight:
            # 1) keep the pipeline bounded: replay oldest events while
            # newer chunks keep the device busy through the readback
            while chunks_in_flight() > self.pipeline_depth:
                replay(inflight.popleft())

            # 2) admit into host-known-free slots (device work is async;
            # the first-token readback happens at this event's replay)
            wave = self._build_wave(queue, slots, use_spec=use_spec)
            if wave:
                admitted, tok_parts, _ = self._dispatch_wave(wave)
                self.stats["waves"] += 1
                self.stats["groups"] += len(tok_parts)
                self.stats["admitted_rows"] += len(admitted)
                # merge each group's first tokens into the device row state
                off = 0
                for toks in tok_parts:
                    k_real = int(toks.shape[0])
                    grp = admitted[off:off + k_real]
                    rows = jnp.asarray([e[0] for e in grp], jnp.int32)
                    mnews = jnp.asarray(
                        [e[1].max_new_tokens for e in grp], jnp.int32
                    )
                    tokens, alive, budget = self._admit_merge(
                        tokens, alive, budget, rows, toks, mnews
                    )
                    if use_spec:
                        # draft-history rows: full prompt on host (the
                        # prefix ids for prefix-cached tails), first token
                        # appended ON DEVICE (it is not host-known yet)
                        hists = np.full((k_real, W), self.pad_token_id,
                                        np.int32)
                        hlens = np.zeros((k_real,), np.int32)
                        for i, (_, req, n, pk, tail) in enumerate(grp):
                            full = (
                                np.concatenate([
                                    self._prefixes[pk[0]]["ids"][:pk[1]],
                                    np.asarray(tail, np.int32),
                                ]) if pk is not None
                                else np.asarray(req.input_ids, np.int32)
                            )
                            hists[i, :len(full)] = full
                            hlens[i] = len(full)
                        sbuf, stotals = self._spec_admit_merge(
                            sbuf, stotals, rows, jnp.asarray(hists),
                            jnp.asarray(hlens), toks,
                        )
                    off += k_real
                for row, req, n, pk, tail in admitted:
                    slots[row] = _PendingSlot(req)
                _prefetch_host(*tok_parts)
                inflight.append(("adm", admitted, tok_parts))

            # 3) dispatch the next decode chunk off the device-resident
            # state. Pending admissions count as presumed-alive (their
            # device merge applied the same first-token retirement rule
            # the replay will).
            rems, any_live = [], False
            for row, st in enumerate(slots):
                if isinstance(st, _PendingSlot):
                    any_live = True
                    rems.append(st.req.max_new_tokens - 1)
                elif st is not None and h_alive[row]:
                    any_live = True
                    rems.append(
                        st.req.max_new_tokens - (len(st.generated) + 1)
                    )
            if any_live:
                caps = [r for r in rems if r >= 1]
                # with requests waiting, sync near the earliest possible
                # retirement so freed slots refill promptly (admission
                # already lags one chunk); otherwise run full chunks
                kcap_host = max(1, min(min(caps) if (queue and caps)
                                       else self.chunk_size,
                                       self.chunk_size))
                run_spec = use_spec
                probe_bar = None
                if use_spec and self.speculative_adaptive:
                    thresh = self.spec_threshold_base + \
                        self.spec_threshold_slope * len(caps)
                    ema = self.spec_last_ema
                    if ema is None or ema < thresh:
                        if (ema is not None and self._spec_plain_streak
                                < self._spec_probe_interval):
                            run_spec = False
                        else:
                            # bounded probe (pessimistic start when ema is
                            # None): 1 verify pass at >half occupancy, 2
                            # otherwise; outcome judged at replay against
                            # the occupancy threshold of THIS dispatch
                            probe_bar = thresh
                            kcap_host = min(
                                kcap_host,
                                1 if len(caps) > self.num_slots // 2 else 2,
                            )
                kcap = jnp.asarray(kcap_host, jnp.int32)
                self.stats["chunks"] += 1
                self.stats["kcap_sum"] += kcap_host
                if run_spec:
                    self.stats["spec_chunks"] += 1
                    (tg, ct, self.cache, sbuf, stotals, tokens, alive,
                     budget) = self._decode_chunk_spec(
                        self.params, self.cache, sbuf, stotals, tokens,
                        alive, budget, kcap,
                    )
                    self._spec_plain_streak = 0
                    _prefetch_host(tg, ct)
                    inflight.append(("spec", tg, ct, kcap_host, probe_bar))
                elif use_spec:
                    self._spec_plain_streak += 1
                    self.plain_chunks_run += 1
                    (buf, self.cache, sbuf, stotals, tokens, alive,
                     budget) = self._decode_chunk_hist(
                        self.params, self.cache, sbuf, stotals, tokens,
                        alive, budget, kcap,
                    )
                    _prefetch_host(buf)
                    inflight.append(("chunk", buf, kcap_host))
                else:
                    buf, self.cache, tokens, alive, budget = \
                        self._decode_chunk(
                            self.params, self.cache, tokens, alive, budget,
                            kcap,
                        )
                    _prefetch_host(buf)
                    inflight.append(("chunk", buf, kcap_host))
            elif inflight:
                # nothing runnable until an event lands — drain one
                replay(inflight.popleft())
        return done

    def run(self, requests: Sequence[Request],
            on_token=None) -> List[Completion]:
        """Serve all requests to completion; returns completions in the
        order requests finish (sort by uid for submission order).

        on_token: optional streaming callback `(uid, token_id)` fired for
        every committed token at host-replay time (i.e. per decode chunk
        over a tunneled link — the vLLM streaming role at the engine's
        commit granularity). The streamed sequence per uid equals the
        returned Completion.token_ids exactly: EOS is never emitted and
        the retirement trims are applied before the callback. The
        callback runs on the scheduler thread — keep it O(append)."""
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
        if not sampled_run:
            # every greedy run (speculative or not) takes the pipelined
            # loop: chunk i+1 chains off chunk i's device-resident row
            # state (including the draft-history window when speculating),
            # so host replay/admission hides behind device compute
            return self._run_pipelined(requests, use_spec=use_spec,
                                       on_token=on_token)
        queue = deque(requests)
        slots: List[Optional[_Slot]] = [None] * self.num_slots
        done: List[Completion] = []
        self.reset()

        def finish(row: int, include_last: bool) -> None:
            st = slots[row]
            toks = list(st.generated)
            if include_last:
                toks.append(st.last_token)
                if on_token is not None and st.last_token not in self.eos:
                    on_token(st.req.uid, st.last_token)
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
            # 1) admit waiting requests into free slots. Admissions are
            # GROUPED by compiled shape and every group prefills as ONE
            # batched [k, bucket] forward (vLLM's batched-prefill
            # scheduling): k same-bucket requests feed the MXU one k-row
            # matmul instead of k serialized single-row passes. All device
            # work (group prefills, inserts, first-token samples)
            # dispatches asynchronously; the wave's first tokens come back
            # in ONE host sync at the end — per-request readbacks each
            # paid a full host<->device round trip.
            wave = self._build_wave(queue, slots, use_spec)
            admitted, tok_parts, sample_jobs = self._dispatch_wave(wave)

            wave_toks = wave_rngs = None
            if admitted:
                # the wave's only host syncs: first tokens, then the
                # sampled rows' tokens + advanced PRNG keys
                wave_toks = np.array(jnp.concatenate(tok_parts))
                if sample_jobs:
                    st = np.asarray(jnp.stack([j[1] for j in sample_jobs]))
                    sr = np.asarray(jnp.stack([j[2] for j in sample_jobs]))
                    wave_rngs = {}
                    for (idx, _, _), t, r in zip(sample_jobs, st, sr):
                        wave_toks[idx] = t
                        wave_rngs[idx] = r
            for i, (row, req, n, pk, tail) in enumerate(admitted):
                tok = int(wave_toks[i])
                rng = wave_rngs[i] if wave_rngs and i in wave_rngs else None
                slots[row] = _Slot(req, tok, [], rng, prompt_len=n)
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
            # dynamic step cap: with requests waiting, sync exactly at the
            # earliest budget retirement (so a freed slot refills at once);
            # with an empty queue there is nothing to admit, so run to the
            # LAST retirement — intermediate syncs would only add RTT.
            # EOS can retire a row earlier than its budget; the chunk's
            # early-exit + frozen dead rows bound the waste at chunk_size.
            rem = budget[alive]
            kcap_host = max(1, min(int(rem.min()) if queue
                                   else int(rem.max()), self.chunk_size))
            kcap = jnp.asarray(kcap_host, jnp.int32)
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
                    jnp.asarray(top_ks), jnp.asarray(top_ps), kcap,
                )
                new_keys = np.asarray(new_keys)
                for row, st in enumerate(slots):
                    if st is not None and st.rng is not None:
                        st.rng = new_keys[row]
            else:
                toks, self.cache, _, _, _ = self._decode_chunk(
                    self.params, self.cache, jnp.asarray(tokens),
                    jnp.asarray(alive), jnp.asarray(budget), kcap,
                )
            toks = np.asarray(toks)  # [K, B]

            # 3) replay the chunk through the retirement rules (identical
            # to the device's _advance, so a retired row's later chunk
            # entries are never read). Only the kcap rows the device
            # actually ran are replayed — rows past the dynamic cap are
            # unwritten buffer zeros.
            for k in range(min(toks.shape[0], kcap_host)):
                for row, st in enumerate(slots):
                    if st is None or not alive[row]:
                        continue
                    st.generated.append(st.last_token)
                    if on_token is not None:
                        on_token(st.req.uid, st.generated[-1])
                    st.last_token = int(toks[k, row])
                    if st.last_token in self.eos:
                        finish(row, include_last=False)
                        alive[row] = False
                    elif len(st.generated) + 1 >= st.req.max_new_tokens:
                        finish(row, include_last=True)
                        alive[row] = False
        return done
