"""Continuous-batching engine: token-identity vs the jitted batch decoder.

The engine (serve/engine.py) serves requests through a rolling decode batch
with per-row KV offsets. Greedy outputs must be token-for-token identical to
running each request alone through `make_generate_fn` — slot reuse, staggered
admission, bucketed prefill, and vacant-slot masking must all be invisible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import tiny_vlm
from vlaser_tpu.inference.kv_cache import KVCache
from vlaser_tpu.inference.sampling import make_generate_fn, trim_output
from vlaser_tpu.models.vlm import InternVLChatModel
from vlaser_tpu.serve.engine import ContinuousBatchingEngine, Request

EOS = [3]
MAX_NEW = 6


@pytest.fixture(scope="module")
def vlm():
    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    rng = np.random.default_rng(0)
    npt = cfg.num_image_token
    ids = rng.integers(1, 400, (1, 8 + npt))
    ids[0, 2 : 2 + npt] = cfg.img_context_token_id
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(pixels),
        jnp.asarray([1], np.int32),
    )
    return cfg, model, params


def _sequential_oracle(model, params, input_ids, pixels=None, max_new=MAX_NEW,
                       temperature=0.0, top_k=0, top_p=1.0, seed=0):
    gen = make_generate_fn(
        model, max_new_tokens=max_new, eos_token_ids=EOS, pad_token_id=0,
        temperature=temperature, top_k=top_k, top_p=top_p,
        cache_dtype=jnp.float32,
    )
    ids = np.asarray(input_ids, np.int32)[None]
    seg = np.ones_like(ids, np.int32)
    px = None if pixels is None else jnp.asarray(pixels)
    tokens, num = gen(params, jnp.asarray(ids), jnp.asarray(seg), px,
                      jax.random.PRNGKey(seed))
    return trim_output(tokens, num, EOS)[0]


@pytest.mark.parametrize("chunk_size", [1, 3, 16])
def test_staggered_text_requests_match_sequential(vlm, chunk_size):
    """7 text prompts of different lengths through 3 slots: every request's
    greedy output equals its solo decode (forces slot reuse + mid-flight
    admission at mismatched fill depths). chunk_size 1 = one host sync per
    token; 3 = requests span chunks and die mid-chunk; 16 = a whole request
    inside one on-device chunk — all must be invisible."""
    cfg, model, params = vlm
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 400, (n,)).astype(np.int32)
               for n in (4, 9, 5, 13, 7, 3, 11)]
    engine = ContinuousBatchingEngine(
        model, params, num_slots=3, max_len=64, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(16,), cache_dtype=jnp.float32,
        chunk_size=chunk_size,
    )
    reqs = [Request(uid=i, input_ids=p, max_new_tokens=MAX_NEW)
            for i, p in enumerate(prompts)]
    done = {c.uid: c for c in engine.run(reqs)}
    assert sorted(done) == list(range(len(prompts)))
    for i, p in enumerate(prompts):
        want = _sequential_oracle(model, params, p)
        assert done[i].token_ids == want, f"request {i} diverged"


def test_image_request_matches_sequential(vlm):
    """A VLM (image) request served next to text requests decodes the same
    tokens as its solo prefill+decode."""
    cfg, model, params = vlm
    rng = np.random.default_rng(11)
    npt = cfg.num_image_token
    img_ids = rng.integers(1, 400, (6 + npt,)).astype(np.int32)
    img_ids[2 : 2 + npt] = cfg.img_context_token_id
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    txt = rng.integers(1, 400, (5,)).astype(np.int32)
    engine = ContinuousBatchingEngine(
        model, params, num_slots=2, max_len=64, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(32,), cache_dtype=jnp.float32,
    )
    done = {c.uid: c for c in engine.run([
        Request(uid=0, input_ids=img_ids, pixel_values=pixels,
                max_new_tokens=MAX_NEW),
        Request(uid=1, input_ids=txt, max_new_tokens=MAX_NEW),
    ])}
    assert done[0].token_ids == _sequential_oracle(model, params, img_ids, pixels)
    assert done[1].token_ids == _sequential_oracle(model, params, txt)


def test_vacant_slots_are_inert(vlm):
    """The same request decodes identically whether it shares the batch with
    other requests or runs with every other slot vacant."""
    cfg, model, params = vlm
    rng = np.random.default_rng(3)
    p = rng.integers(1, 400, (6,)).astype(np.int32)
    others = [rng.integers(1, 400, (n,)).astype(np.int32) for n in (4, 9, 7)]
    kwargs = dict(max_len=64, eos_token_ids=EOS, pad_token_id=0,
                  prefill_buckets=(16,), cache_dtype=jnp.float32)
    solo = ContinuousBatchingEngine(model, params, num_slots=4, **kwargs)
    got_solo = solo.run([Request(uid=0, input_ids=p, max_new_tokens=MAX_NEW)])
    assert got_solo[0].token_ids == _sequential_oracle(model, params, p)
    shared = ContinuousBatchingEngine(model, params, num_slots=4, **kwargs)
    got_shared = {c.uid: c for c in shared.run(
        [Request(uid=0, input_ids=p, max_new_tokens=MAX_NEW)]
        + [Request(uid=i + 1, input_ids=o, max_new_tokens=MAX_NEW)
           for i, o in enumerate(others)]
    )}
    assert got_shared[0].token_ids == got_solo[0].token_ids


def test_prefix_cached_requests_match_full_prompt(vlm):
    """Requests sharing a registered image prefix (the QA-generation shape:
    one frame, many questions) decode token-identically to their solo
    full-prompt runs. The prefix KV prefills ONCE; each admission runs only
    a multi-token tail forward against it."""
    cfg, model, params = vlm
    rng = np.random.default_rng(29)
    npt = cfg.num_image_token
    prefix = rng.integers(1, 400, (4 + npt,)).astype(np.int32)
    prefix[2 : 2 + npt] = cfg.img_context_token_id
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    tails = [rng.integers(1, 400, (n,)).astype(np.int32)
             for n in (5, 9, 3, 12)]
    engine = ContinuousBatchingEngine(
        model, params, num_slots=2, max_len=96, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(16, 32), cache_dtype=jnp.float32,
    )
    pid = engine.register_prefix(prefix, pixels)
    done = {c.uid: c for c in engine.run([
        Request(uid=i, input_ids=t, max_new_tokens=MAX_NEW, prefix_id=pid)
        for i, t in enumerate(tails)
    ])}
    for i, t in enumerate(tails):
        want = _sequential_oracle(
            model, params, np.concatenate([prefix, t]), pixels
        )
        assert done[i].token_ids == want, f"tail {i} diverged"
        assert done[i].prompt_len == len(prefix) + len(t)
    # a prefix-cached request mixing with plain requests stays invisible
    engine2 = ContinuousBatchingEngine(
        model, params, num_slots=2, max_len=96, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(16, 32), cache_dtype=jnp.float32,
    )
    pid2 = engine2.register_prefix(prefix, pixels)
    plain = rng.integers(1, 400, (7,)).astype(np.int32)
    mixed = {c.uid: c for c in engine2.run([
        Request(uid=0, input_ids=tails[0], max_new_tokens=MAX_NEW,
                prefix_id=pid2),
        Request(uid=1, input_ids=plain, max_new_tokens=MAX_NEW),
    ])}
    assert mixed[0].token_ids == _sequential_oracle(
        model, params, np.concatenate([prefix, tails[0]]), pixels)
    assert mixed[1].token_ids == _sequential_oracle(model, params, plain)
    engine2.release_prefix(pid2)


def test_auto_prefix_caching_transparent_identity(vlm):
    """Automatic prefix caching (vLLM APC role): with auto_prefix_block
    set and NO register_prefix call, requests sharing a long prompt prefix
    hit the cache (the first request's prefill registers its block-aligned
    prefix KV; later ones admit through the suffix path) and stay
    token-identical to their solo full-prompt decodes."""
    cfg, model, params = vlm
    rng = np.random.default_rng(41)
    npt = cfg.num_image_token
    prefix = rng.integers(1, 400, (4 + npt,)).astype(np.int32)
    prefix[2 : 2 + npt] = cfg.img_context_token_id
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    tails = [rng.integers(1, 400, (n,)).astype(np.int32)
             for n in (5, 9, 3, 12)]
    engine = ContinuousBatchingEngine(
        model, params, num_slots=2, max_len=96, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(16, 24, 32), cache_dtype=jnp.float32,
        auto_prefix_block=4,
    )
    reqs = [Request(uid=i, input_ids=np.concatenate([prefix, t]),
                    pixel_values=pixels, max_new_tokens=MAX_NEW)
            for i, t in enumerate(tails)]
    done = {c.uid: c for c in engine.run(reqs)}
    assert engine.auto_prefix_hits >= 1, "shared prefix never hit the cache"
    for i, t in enumerate(tails):
        want = _sequential_oracle(
            model, params, np.concatenate([prefix, t]), pixels
        )
        assert done[i].token_ids == want, f"request {i} diverged under APC"
        assert done[i].prompt_len == len(prefix) + len(t)

    # same text, DIFFERENT image: the pixel digest seeds the hash chain,
    # so the cached prefix must NOT match (a match would decode against
    # the wrong image's KV)
    pixels2 = rng.standard_normal(pixels.shape).astype(np.float32)
    hits0 = engine.auto_prefix_hits
    done2 = {c.uid: c for c in engine.run([
        Request(uid=0, input_ids=np.concatenate([prefix, tails[0]]),
                pixel_values=pixels2, max_new_tokens=MAX_NEW)
    ])}
    assert engine.auto_prefix_hits == hits0, (
        "prefix cache matched across different images"
    )
    assert done2[0].token_ids == _sequential_oracle(
        model, params, np.concatenate([prefix, tails[0]]), pixels2
    )

    # text-only prompts sharing a prefix also cache, and LRU eviction
    # keeps the store bounded
    eng_t = ContinuousBatchingEngine(
        model, params, num_slots=2, max_len=96, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(16, 32), cache_dtype=jnp.float32,
        auto_prefix_block=4, auto_prefix_max=2,
    )
    base = rng.integers(1, 400, (13,)).astype(np.int32)
    treqs = [Request(uid=i, input_ids=np.concatenate(
        [base, rng.integers(1, 400, (4,)).astype(np.int32)]),
        max_new_tokens=MAX_NEW) for i in range(4)]
    tdone = {c.uid: c for c in eng_t.run(treqs)}
    assert eng_t.auto_prefix_hits >= 1
    assert len(eng_t._auto_pids) <= 2  # cap = stored KV entries
    for i in range(4):
        want = _sequential_oracle(model, params, treqs[i].input_ids)
        assert tdone[i].token_ids == want, f"text request {i} diverged"


def test_sampled_request_matches_solo_sampled_decode(vlm):
    """A sampled request (temperature/top_k/top_p/seed) through the engine
    emits the same tokens as a solo make_generate_fn run with those params
    under PRNGKey(seed) — sharing the decode batch with greedy and
    differently-sampled requests must be invisible (the vLLM per-request
    SamplingParams role)."""
    cfg, model, params = vlm
    rng = np.random.default_rng(13)
    p_greedy = rng.integers(1, 400, (6,)).astype(np.int32)
    p_a = rng.integers(1, 400, (9,)).astype(np.int32)
    p_b = rng.integers(1, 400, (4,)).astype(np.int32)
    engine = ContinuousBatchingEngine(
        model, params, num_slots=3, max_len=64, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(16,), cache_dtype=jnp.float32,
    )
    done = {c.uid: c for c in engine.run([
        Request(uid=0, input_ids=p_greedy, max_new_tokens=MAX_NEW),
        Request(uid=1, input_ids=p_a, max_new_tokens=MAX_NEW,
                temperature=0.75, top_k=5, seed=11),
        Request(uid=2, input_ids=p_b, max_new_tokens=MAX_NEW,
                temperature=1.25, top_p=0.9, seed=23),
    ])}
    assert done[0].token_ids == _sequential_oracle(model, params, p_greedy)
    assert done[1].token_ids == _sequential_oracle(
        model, params, p_a, temperature=0.75, top_k=5, seed=11)
    assert done[2].token_ids == _sequential_oracle(
        model, params, p_b, temperature=1.25, top_p=0.9, seed=23)


def test_tile_buckets_pad_is_invisible(vlm):
    """tile_buckets pads the tile count with image_flags-masked zero tiles;
    a 1-tile request through a 2-tile bucket decodes identically to the
    unbucketed engine."""
    cfg, model, params = vlm
    rng = np.random.default_rng(17)
    npt = cfg.num_image_token
    ids = rng.integers(1, 400, (5 + npt,)).astype(np.int32)
    ids[1 : 1 + npt] = cfg.img_context_token_id
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    kwargs = dict(num_slots=2, max_len=64, eos_token_ids=EOS, pad_token_id=0,
                  prefill_buckets=(32,), cache_dtype=jnp.float32)
    plain = ContinuousBatchingEngine(model, params, **kwargs)
    bucketed = ContinuousBatchingEngine(model, params, tile_buckets=(2,),
                                        **kwargs)
    req = lambda: Request(uid=0, input_ids=ids, pixel_values=pixels,
                          max_new_tokens=MAX_NEW)
    want = plain.run([req()])[0].token_ids
    assert want == _sequential_oracle(model, params, ids, pixels)
    assert bucketed.run([req()])[0].token_ids == want


def test_admission_and_bucket_validation(vlm):
    cfg, model, params = vlm
    with pytest.raises(ValueError, match="exceed max_len"):
        ContinuousBatchingEngine(
            model, params, num_slots=2, max_len=32, eos_token_ids=EOS,
            pad_token_id=0, prefill_buckets=(16, 64),
        )
    engine = ContinuousBatchingEngine(
        model, params, num_slots=2, max_len=32, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(16,), cache_dtype=jnp.float32,
    )
    bad = Request(uid=0, input_ids=np.asarray([5, 6], np.int32),
                  max_new_tokens=0)
    with pytest.raises(ValueError, match="max_new_tokens"):
        engine.run([bad])


def test_per_row_write_meta_multitoken_blocks():
    """Widened per-row write_meta (the engine's speculative verify step):
    each row writes S contiguous slots at its own offset and advances by its
    count of nonzero incoming seg ids — an all-nonzero (alive) row advances
    by S, an all-zero (dead) row neither writes attendable metadata nor
    advances."""
    cache = KVCache.create(1, 2, 16, 1, 4, dtype=jnp.float32)
    cache = cache.replace(length=jnp.asarray([2, 5], jnp.int32))
    seg = jnp.asarray([[1, 1, 1], [0, 0, 0]], jnp.int32)
    out = cache.write_meta(seg)
    assert out.length.tolist() == [5, 5]
    np.testing.assert_array_equal(np.asarray(out.seg[0, 2:5]), [1, 1, 1])
    assert int(np.asarray(out.seg).sum()) == 3  # dead row wrote nothing


def test_per_row_cache_decode_matches_scalar(vlm):
    """Model-level invariant: single-token decode against a per-row-length
    cache equals decode against the scalar-length cache when the rows happen
    to be aligned."""
    cfg, model, params = vlm
    rng = np.random.default_rng(5)
    b, n = 2, 7
    ids = rng.integers(1, 400, (b, n)).astype(np.int32)
    seg = np.ones((b, n), np.int32)
    llm = cfg.llm

    def run(per_row):
        cache = KVCache.create(llm.num_layers, b, 32, llm.num_kv_heads,
                               llm.head_dim, dtype=jnp.float32)
        logits, _, cache = model.apply(
            params, jnp.asarray(ids), None, jnp.asarray(seg), cache,
            method=model.prefill,
        )
        if per_row:
            cache = cache.replace(length=jnp.full((b,), n, jnp.int32))
        tok = jnp.argmax(logits[:, n - 1], -1).astype(jnp.int32)
        pos = (jnp.zeros((b,), jnp.int32) + n)[:, None]
        step_logits, _, _ = model.apply(
            params, tok[:, None], cache, pos, method=model.decode_step,
        )
        return np.asarray(step_logits[:, 0])

    np.testing.assert_allclose(run(True), run(False), rtol=2e-5, atol=2e-5)


# -- speculative decode through the engine ---------------------------------

def _spec_pair(model, params, *, num_slots=3, max_len=96, draft_len=4,
               chunk_size=4, buckets=(16, 32), eos=EOS):
    kwargs = dict(max_len=max_len, eos_token_ids=eos, pad_token_id=0,
                  prefill_buckets=buckets, cache_dtype=jnp.float32,
                  chunk_size=chunk_size)
    plain = ContinuousBatchingEngine(model, params, num_slots=num_slots,
                                     **kwargs)
    # adaptive OFF: these tests pin the spec machinery itself, so every
    # chunk must take the verify path (the adaptive policy has its own test)
    spec = ContinuousBatchingEngine(model, params, num_slots=num_slots,
                                    speculative_draft_len=draft_len,
                                    speculative_adaptive=False,
                                    **kwargs)
    return plain, spec


def test_spec_engine_adaptive_identity_and_fallback(vlm):
    """Occupancy-adaptive speculation: outputs stay token-identical to the
    plain engine while the engine decides per chunk whether to speculate.
    On undraftable random prompts the acceptance EMA drops under the
    break-even and plain chunks take over (with periodic re-probes); on a
    draftable repetitive workload speculation stays on."""
    cfg, model, params = vlm
    rng = np.random.default_rng(23)
    prompts = [rng.integers(1, 400, (n,)).astype(np.int32)
               for n in (4, 9, 5, 13, 7, 6)]
    plain = ContinuousBatchingEngine(
        model, params, num_slots=3, max_len=96, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(16, 32), cache_dtype=jnp.float32,
        chunk_size=4,
    )
    adap = ContinuousBatchingEngine(
        model, params, num_slots=3, max_len=96, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(16, 32), cache_dtype=jnp.float32,
        chunk_size=4, speculative_draft_len=4, spec_reprobe_every=2,
    )
    reqs = lambda: [Request(uid=i, input_ids=p, max_new_tokens=24)
                    for i, p in enumerate(prompts)]
    want = {c.uid: c.token_ids for c in plain.run(reqs())}
    got = {c.uid: c.token_ids for c in adap.run(reqs())}
    assert got == want
    assert adap.spec_chunks_run >= 1  # probed at least once
    assert adap.spec_last_ema is not None


@pytest.mark.parametrize("chunk_size,draft_len", [(1, 4), (4, 2), (4, 6)])
def test_spec_engine_token_identity(vlm, chunk_size, draft_len):
    """Speculative engine output is token-for-token identical to the
    non-speculative engine (and hence the sequential oracle) on a staggered
    mixed-length workload — acceptance only changes pass counts, never
    tokens. max_new 24 lets random-weight greedy chains cycle, so drafts DO
    get accepted (>1 token/pass) and the accept path is exercised, not just
    the reject path."""
    cfg, model, params = vlm
    rng = np.random.default_rng(13)
    prompts = [rng.integers(1, 400, (n,)).astype(np.int32)
               for n in (4, 9, 5, 13, 7)]
    plain, spec = _spec_pair(model, params, chunk_size=chunk_size,
                             draft_len=draft_len)
    reqs = lambda: [Request(uid=i, input_ids=p, max_new_tokens=24)
                    for i, p in enumerate(prompts)]
    want = {c.uid: c.token_ids for c in plain.run(reqs())}
    got = {c.uid: c.token_ids for c in spec.run(reqs())}
    assert got == want


def test_spec_engine_eos_mid_block(vlm):
    """EOS landing inside a verify block cuts the stream exactly where the
    sequential rules would. The EOS set is chosen from tokens the plain run
    actually emits, so the cut genuinely happens mid-decode."""
    cfg, model, params = vlm
    rng = np.random.default_rng(17)
    prompts = [rng.integers(1, 400, (n,)).astype(np.int32) for n in (6, 11)]
    probe, _ = _spec_pair(model, params)
    emitted = [c.token_ids for c in probe.run(
        [Request(uid=i, input_ids=p, max_new_tokens=24)
         for i, p in enumerate(prompts)]
    )]
    # pick a token from the middle of a stream as EOS -> mid-stream stop
    mid = [t for toks in emitted for t in toks[1:-1]]
    assert mid, "probe run emitted too few tokens to pick a mid-stream EOS"
    eos = [int(mid[len(mid) // 2])]
    plain, spec = _spec_pair(model, params, eos=eos)
    reqs = lambda: [Request(uid=i, input_ids=p, max_new_tokens=24)
                    for i, p in enumerate(prompts)]
    want = {c.uid: c.token_ids for c in plain.run(reqs())}
    got = {c.uid: c.token_ids for c in spec.run(reqs())}
    assert got == want
    assert any(len(t) < 23 for t in got.values()), (
        "chosen EOS never cut a stream - the mid-block path was not hit"
    )


def test_spec_engine_budget_cut_and_image(vlm):
    """Tight max_new budgets (cut lands mid verify block) + an image request
    + slot reuse, all token-identical to the plain engine."""
    cfg, model, params = vlm
    rng = np.random.default_rng(19)
    npt = cfg.num_image_token
    img_ids = rng.integers(1, 400, (6 + npt,)).astype(np.int32)
    img_ids[2 : 2 + npt] = cfg.img_context_token_id
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    texts = [rng.integers(1, 400, (n,)).astype(np.int32)
             for n in (5, 8, 3, 10)]
    plain, spec = _spec_pair(model, params, num_slots=2, max_len=128,
                             buckets=(16, 64), draft_len=5)

    def reqs():
        out = [Request(uid=0, input_ids=img_ids, pixel_values=pixels,
                       max_new_tokens=7)]
        out += [Request(uid=i + 1, input_ids=t,
                        max_new_tokens=(2, 3, 7, 5)[i])
                for i, t in enumerate(texts)]
        return out

    want = {c.uid: c.token_ids for c in plain.run(reqs())}
    got = {c.uid: c.token_ids for c in spec.run(reqs())}
    assert got == want
    assert all(len(got[i + 1]) <= (2, 3, 7, 5)[i] for i in range(4))


def test_spec_engine_prefix_cached(vlm):
    """Prefix-cached tails decode identically under speculation; the
    prompt-lookup window covers the registered prefix ids too."""
    cfg, model, params = vlm
    rng = np.random.default_rng(23)
    npt = cfg.num_image_token
    prefix = rng.integers(1, 400, (4 + npt,)).astype(np.int32)
    prefix[2 : 2 + npt] = cfg.img_context_token_id
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    tails = [rng.integers(1, 400, (n,)).astype(np.int32) for n in (5, 9, 3)]
    plain, spec = _spec_pair(model, params, num_slots=2, max_len=128,
                             buckets=(16, 32))
    pid_p = plain.register_prefix(prefix, pixels)
    pid_s = spec.register_prefix(prefix, pixels)
    want = {c.uid: c.token_ids for c in plain.run(
        [Request(uid=i, input_ids=t, max_new_tokens=16, prefix_id=pid_p)
         for i, t in enumerate(tails)]
    )}
    got = {c.uid: c.token_ids for c in spec.run(
        [Request(uid=i, input_ids=t, max_new_tokens=16, prefix_id=pid_s)
         for i, t in enumerate(tails)]
    )}
    assert got == want


def test_spec_engine_sampled_run_falls_back(vlm):
    """A run containing sampled requests takes the sampled chunk path:
    outputs equal the non-speculative engine's sampled run (speculation
    only accelerates greedy workloads)."""
    cfg, model, params = vlm
    rng = np.random.default_rng(31)
    prompts = [rng.integers(1, 400, (n,)).astype(np.int32) for n in (6, 9)]
    plain, spec = _spec_pair(model, params)

    def reqs():
        return [
            Request(uid=0, input_ids=prompts[0], max_new_tokens=10,
                    temperature=0.8, top_k=7, seed=5),
            Request(uid=1, input_ids=prompts[1], max_new_tokens=10),
        ]

    want = {c.uid: c.token_ids for c in plain.run(reqs())}
    got = {c.uid: c.token_ids for c in spec.run(reqs())}
    assert got == want


def test_spec_engine_admission_margin(vlm):
    """The speculative cache margin is enforced at admission: a request that
    fits the plain engine but whose verify blocks would overrun max_len is
    rejected with a clear error."""
    cfg, model, params = vlm
    _, spec = _spec_pair(model, params, max_len=32, draft_len=4,
                         buckets=(16,))
    ids = np.arange(2, 14, dtype=np.int32)
    with pytest.raises(AssertionError, match="speculative margin"):
        spec.run([Request(uid=0, input_ids=ids, max_new_tokens=17)])


def test_engine_defaults_match_sweep(vlm):
    """round-4 VERDICT #8: the SHIPPED scheduling defaults must equal the
    round-4 on-chip sweep's winning config (docs/STATUS.md: 16 slots /
    chunk 64 / pipeline_depth 1) — product users were getting
    pipeline_depth=2 while the sweep measured 1 better. EngineChat must be
    able to express the swept config without touching serve/engine.py."""
    import inspect

    from vlaser_tpu.serve.engine_chat import EngineChat

    sig = inspect.signature(ContinuousBatchingEngine.__init__)
    assert sig.parameters["num_slots"].default == 16
    assert sig.parameters["chunk_size"].default == 64
    assert sig.parameters["pipeline_depth"].default == 1

    csig = inspect.signature(EngineChat.__init__)
    assert csig.parameters["num_slots"].default == 16
    assert csig.parameters["chunk_size"].default == 64
    assert csig.parameters["pipeline_depth"].default == 1

    cfg, model, params = vlm
    eng = ContinuousBatchingEngine(
        model, params, num_slots=3, max_len=64, eos_token_ids=EOS,
        pad_token_id=0, pipeline_depth=2,
    )
    assert eng.pipeline_depth == 2  # knob still reachable


def test_engine_chat_quantize_flag(vlm):
    """EngineChat(quantize="w8a8") builds the serving quant collection
    in-place (round-4 VERDICT #2): the engine's params carry the int8
    LLM stack + encoder aq flags; quantize=None serves params as passed."""
    from vlaser_tpu.serve.engine_chat import EngineChat

    cfg, model, params = vlm

    class _Tok:
        def __call__(self, text, add_special_tokens=False):
            return {"input_ids": [7 for _ in text[:4]]}

        def convert_tokens_to_ids(self, tok):
            return 3

        def decode(self, ids, skip_special_tokens=True):
            return "x"

    chat = EngineChat(model, params, _Tok(), max_new_tokens=4,
                      num_slots=3, max_len=64, quantize="w8a8")
    assert "quant" in chat.engine.params
    q = chat.engine.params["quant"]["language_model"]
    assert "embedding_q" in q["embed_tokens"]

    plain = EngineChat(model, params, _Tok(), max_new_tokens=4,
                       num_slots=3, max_len=64)
    assert "quant" not in plain.engine.params


def test_spec_probe_pessimistic_start_and_backoff(vlm):
    """round-4 VERDICT #4 policy hardening: (a) the FIRST chunk with no
    acceptance evidence is a BOUNDED probe (kcap <= 2), never a full
    speculative chunk; (b) failed probes back off exponentially, so on
    persistently undraftable text the probe interval grows past the base
    reprobe interval and the engine converges to ~plain-chunk behavior;
    (c) outputs stay token-identical throughout; (d) a draftable workload
    turns speculation fully back on after one successful probe."""
    cfg, model, params = vlm
    rng = np.random.default_rng(31)
    prompts = [rng.integers(1, 400, (n,)).astype(np.int32)
               for n in (6, 11, 8)]
    mk = lambda: [Request(uid=i, input_ids=p, max_new_tokens=30)
                  for i, p in enumerate(prompts)]
    plain = ContinuousBatchingEngine(
        model, params, num_slots=3, max_len=96, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(16,), cache_dtype=jnp.float32,
        chunk_size=2,
    )
    want = {c.uid: c.token_ids for c in plain.run(mk())}

    adap = ContinuousBatchingEngine(
        model, params, num_slots=3, max_len=96, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(16,), cache_dtype=jnp.float32,
        chunk_size=2, speculative_draft_len=4, spec_reprobe_every=2,
    )
    got = {c.uid: c.token_ids for c in adap.run(mk())}
    assert got == want  # (c) identity
    # (a)+(b): on undraftable random text every probe fails — the interval
    # must have backed off past the base, and full spec chunks must be a
    # small minority of the ~15+ chunks this run dispatches
    assert adap._spec_probe_interval > adap.spec_reprobe_every
    assert adap.spec_chunks_run <= 4
    assert adap.plain_chunks_run >= 4

    # (d): a repetitive (draftable) workload re-enables full speculation
    # after one successful probe — the EMA jumps to the measured rate
    phrase = rng.integers(1, 400, (6,)).astype(np.int32)
    rep = [Request(uid=i, input_ids=np.tile(phrase, 3), max_new_tokens=30)
           for i in range(3)]
    adap2 = ContinuousBatchingEngine(
        model, params, num_slots=3, max_len=96, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(32,), cache_dtype=jnp.float32,
        chunk_size=2, speculative_draft_len=4, spec_reprobe_every=2,
    )
    adap2.run(rep)
    if adap2.spec_last_ema is not None and \
            adap2.spec_last_ema >= adap2.spec_threshold_base:
        assert adap2._spec_probe_interval == adap2.spec_reprobe_every
        assert adap2.spec_chunks_run >= 2  # probe + full spec chunks


@pytest.mark.parametrize("mode", ["greedy", "spec", "sampled"])
def test_on_token_stream_equals_completions(vlm, mode):
    """The on_token streaming callback (the vLLM streaming role at commit
    granularity) must deliver, per uid, EXACTLY the returned
    Completion.token_ids — in order, EOS never emitted, retirement trims
    applied — across all three run paths (pipelined greedy, speculative,
    sampled blocking loop)."""
    cfg, model, params = vlm
    rng = np.random.default_rng(41)
    kw = dict(num_slots=3, max_len=96, eos_token_ids=EOS, pad_token_id=0,
              prefill_buckets=(16, 32), cache_dtype=jnp.float32,
              chunk_size=4)
    if mode == "spec":
        kw.update(speculative_draft_len=4, speculative_adaptive=False)
    eng = ContinuousBatchingEngine(model, params, **kw)
    reqs = []
    for i in range(6):
        n = (4, 9, 5, 13, 7, 6)[i]
        reqs.append(Request(
            uid=i, input_ids=rng.integers(1, 400, (n,)).astype(np.int32),
            max_new_tokens=(1, 7, 20)[i % 3],
            temperature=0.8 if mode == "sampled" else 0.0,
            top_k=5 if mode == "sampled" else 0, seed=i,
        ))
    streamed: dict = {}
    done = eng.run(reqs, on_token=lambda uid, tok:
                   streamed.setdefault(uid, []).append(tok))
    for c in done:
        assert streamed.get(c.uid, []) == c.token_ids, (mode, c.uid)
