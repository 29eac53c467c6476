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


def test_per_row_write_meta_rejects_multitoken():
    """Per-row cache offsets advance by nonzero-seg count but write S
    contiguous slots; S>1 would desynchronize — the cache refuses it."""
    cache = KVCache.create(1, 2, 16, 1, 4, dtype=jnp.float32)
    cache = cache.replace(length=jnp.zeros((2,), jnp.int32))
    with pytest.raises(ValueError, match="S==1"):
        cache.write_meta(jnp.ones((2, 3), jnp.int32))


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
