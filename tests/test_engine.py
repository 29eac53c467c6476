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


def _sequential_oracle(model, params, input_ids, pixels=None, max_new=MAX_NEW):
    gen = make_generate_fn(
        model, max_new_tokens=max_new, eos_token_ids=EOS, pad_token_id=0,
        cache_dtype=jnp.float32,
    )
    ids = np.asarray(input_ids, np.int32)[None]
    seg = np.ones_like(ids, np.int32)
    px = None if pixels is None else jnp.asarray(pixels)
    tokens, num = gen(params, jnp.asarray(ids), jnp.asarray(seg), px,
                      jax.random.PRNGKey(0))
    return trim_output(tokens, num, EOS)[0]


def test_staggered_text_requests_match_sequential(vlm):
    """7 text prompts of different lengths through 3 slots: every request's
    greedy output equals its solo decode (forces slot reuse + mid-flight
    admission at mismatched fill depths)."""
    cfg, model, params = vlm
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 400, (n,)).astype(np.int32)
               for n in (4, 9, 5, 13, 7, 3, 11)]
    engine = ContinuousBatchingEngine(
        model, params, num_slots=3, max_len=64, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(16,), cache_dtype=jnp.float32,
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
    kwargs = dict(max_len=64, eos_token_ids=EOS, pad_token_id=0,
                  prefill_buckets=(16,), cache_dtype=jnp.float32)
    solo = ContinuousBatchingEngine(model, params, num_slots=4, **kwargs)
    got_solo = solo.run([Request(uid=0, input_ids=p, max_new_tokens=MAX_NEW)])
    assert got_solo[0].token_ids == _sequential_oracle(model, params, p)


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
