"""Prompt-lookup speculative decoding: exactness vs sequential greedy decode.

The contract (inference/speculative.py): committed tokens are always the
verified argmax targets, so the output must be token-for-token identical to
make_generate_fn(temperature=0) — drafts only change how many tokens each
model pass yields. These tests pin that identity (incl. EOS cut and padded
prompts) and that speculation actually accepts >1 token/pass on repetitive
context.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import tiny_vlm
from vlaser_tpu.inference.sampling import make_generate_fn, trim_output
from vlaser_tpu.inference.speculative import (
    lookup_draft,
    make_speculative_generate_fn,
)
from vlaser_tpu.models.vlm import InternVLChatModel


@pytest.fixture(scope="module")
def vlm():
    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    rng = np.random.default_rng(0)
    N = 12
    ids = rng.integers(1, 400, (1, N))
    ids[0, 2 : 2 + cfg.num_image_token] = cfg.img_context_token_id
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(pixels), None
    )
    return cfg, model, params, ids, pixels


def test_lookup_draft_matches_numpy():
    rng = np.random.default_rng(3)
    buf = rng.integers(1, 6, 64).astype(np.int32)  # small vocab -> matches
    total, ngram, k = 40, 2, 4
    draft, found = jax.jit(lookup_draft, static_argnums=(2, 3))(
        jnp.asarray(buf), jnp.asarray(total), ngram, k
    )
    pattern = buf[total - ngram : total]
    best = -1
    for i in range(total - ngram):
        if np.array_equal(buf[i : i + ngram], pattern):
            best = i
    assert bool(found) == (best >= 0)
    if best >= 0:
        np.testing.assert_array_equal(
            np.asarray(draft), buf[best + ngram : best + ngram + k]
        )


def _greedy_and_spec(model, params, ids, pixels, *, max_new, eos, k=4, ngram=2):
    seg = np.ones_like(ids, np.int32)
    gen = make_generate_fn(
        model, max_new_tokens=max_new, eos_token_ids=eos, pad_token_id=0,
        cache_dtype=jnp.float32,
    )
    spec = make_speculative_generate_fn(
        model, max_new_tokens=max_new, eos_token_ids=eos, pad_token_id=0,
        draft_len=k, ngram=ngram, cache_dtype=jnp.float32,
    )
    args = (params, jnp.asarray(ids), jnp.asarray(seg),
            None if pixels is None else jnp.asarray(pixels),
            jax.random.PRNGKey(0))
    want_tokens, want_num = gen(*args)
    got_tokens, got_num, emitted, passes = spec.with_stats(*args)
    return (want_tokens, want_num), (got_tokens, got_num, emitted, passes)


def test_spec_matches_sequential_greedy(vlm):
    cfg, model, params, ids, pixels = vlm
    (want_t, want_n), (got_t, got_n, emitted, passes) = _greedy_and_spec(
        model, params, ids, pixels, max_new=24, eos=[3]
    )
    assert trim_output(got_t, got_n, [3]) == trim_output(want_t, want_n, [3])
    assert int(passes) >= 1
    # tiny random models cycle quickly -> lookup must accept multi-token steps
    assert int(emitted) > int(passes), (
        f"no speculation benefit: {int(emitted)} tokens in {int(passes)} passes"
    )


def test_spec_eos_cut_matches(vlm):
    """Force a reachable EOS: make the 3rd greedy token the EOS id and check
    both decoders stop identically (the EOS may land mid-draft-block)."""
    cfg, model, params, ids, pixels = vlm
    (want_t, want_n), _ = _greedy_and_spec(
        model, params, ids, pixels, max_new=8, eos=[3]
    )
    row = trim_output(want_t, want_n, [3])[0]
    assert len(row) >= 3, "fixture produced too few tokens to pick an EOS"
    eos = [int(row[2])]
    (want_t, want_n), (got_t, got_n, _, _) = _greedy_and_spec(
        model, params, ids, pixels, max_new=8, eos=eos
    )
    assert trim_output(got_t, got_n, eos) == trim_output(want_t, want_n, eos)
    assert len(trim_output(want_t, want_n, eos)[0]) == 2


def test_spec_right_padded_prompt(vlm):
    """A right-padded prompt must decode the same tokens (text-only row)."""
    cfg, model, params, ids, pixels = vlm
    rng = np.random.default_rng(5)
    row = rng.integers(1, 400, (1, 10)).astype(np.int64)
    spec = make_speculative_generate_fn(
        model, max_new_tokens=6, eos_token_ids=[3], pad_token_id=0,
        draft_len=3, cache_dtype=jnp.float32,
    )
    seg = np.ones_like(row, np.int32)
    t1, n1 = spec(params, jnp.asarray(row), jnp.asarray(seg), None,
                  jax.random.PRNGKey(0))
    padded = np.concatenate([row, np.zeros((1, 5), row.dtype)], 1)
    segp = np.concatenate([seg, np.zeros((1, 5), np.int32)], 1)
    t2, n2 = spec(params, jnp.asarray(padded), jnp.asarray(segp), None,
                  jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


def test_spec_draft_len_invariance(vlm):
    """Output is independent of draft_len/ngram (only pass count changes)."""
    cfg, model, params, ids, pixels = vlm
    outs = []
    for k, g in [(1, 1), (3, 2), (8, 3)]:
        _, (got_t, got_n, _, _) = _greedy_and_spec(
            model, params, ids, pixels, max_new=16, eos=[3], k=k, ngram=g
        )
        outs.append(trim_output(got_t, got_n, [3]))
    assert outs[0] == outs[1] == outs[2]


def test_chat_speculative_path_matches_default(vlm):
    """VlaserChat(speculative_draft_len=K) — same response text as the
    default greedy chat over the full template/prompt machinery."""
    from tests.test_chat_and_configs import ToyTok
    from vlaser_tpu.inference.chat import VlaserChat

    cfg, model, params, ids, pixels = vlm
    base = VlaserChat(model, params, ToyTok(), max_new_tokens=8, bucket=32,
                      cache_dtype=jnp.float32)
    spec = VlaserChat(model, params, ToyTok(), max_new_tokens=8, bucket=32,
                      speculative_draft_len=4, cache_dtype=jnp.float32)
    want = base.chat("what do you see?", pixels)
    got = spec.chat("what do you see?", pixels)
    assert got == want


def test_spec_floor_mode_identical_one_token_per_pass(vlm):
    """force_no_match (the bench worst-case floor) still emits the exact
    sequential-greedy stream, at exactly 1 token per verify pass."""
    cfg, model, params, ids, pixels = vlm
    seg = np.ones_like(ids, np.int32)
    gen = make_generate_fn(
        model, max_new_tokens=16, eos_token_ids=[3], pad_token_id=0,
        cache_dtype=jnp.float32,
    )
    floor = make_speculative_generate_fn(
        model, max_new_tokens=16, eos_token_ids=[3], pad_token_id=0,
        draft_len=4, cache_dtype=jnp.float32, force_no_match=True,
    )
    args = (params, jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pixels),
            jax.random.PRNGKey(0))
    want_t, want_n = gen(*args)
    got_t, got_n, emitted, passes = floor.with_stats(*args)
    assert trim_output(got_t, got_n, [3]) == trim_output(want_t, want_n, [3])
    # emitted counts the prefill token too; every verify pass yields its 1
    # bonus token and nothing more
    assert int(emitted) == int(passes) + 1
