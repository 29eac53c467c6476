"""Offline (one-jit) batch serving: token identity vs the host-driven
engine and the per-request sequential oracle.

serve/offline.py compiles admission + chunked decode + retirement into a
single lax.while_loop. Every request's greedy output must match its solo
make_generate_fn decode exactly — same contract as serve/engine.py, now
with the scheduler on device too.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import tiny_vlm
from vlaser_tpu.inference.sampling import make_generate_fn, trim_output
from vlaser_tpu.models.vlm import InternVLChatModel
from vlaser_tpu.serve.engine import ContinuousBatchingEngine, Request
from vlaser_tpu.serve.offline import run_offline

EOS = [3]


@pytest.fixture(scope="module")
def vlm():
    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
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


def _oracle(model, params, input_ids, pixels=None, max_new=6):
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


def test_offline_text_matches_sequential_and_engine(vlm):
    """9 text prompts, mixed lengths and budgets, through 3 slots: the
    one-jit schedule (slot reuse, mid-chunk deaths, multiple admission
    waves) reproduces every solo decode and the host-driven engine."""
    cfg, model, params = vlm
    rng = np.random.default_rng(21)
    prompts = [rng.integers(1, 400, (n,)).astype(np.int32)
               for n in (4, 9, 5, 13, 7, 3, 11, 6, 8)]
    budgets = [6, 3, 9, 6, 1, 4, 6, 2, 7]
    reqs = [Request(uid=i, input_ids=p, max_new_tokens=m)
            for i, (p, m) in enumerate(zip(prompts, budgets))]
    got = run_offline(
        model, params, reqs, num_slots=3, max_len=64, eos_token_ids=EOS,
        pad_token_id=0, chunk_size=4, cache_dtype=jnp.float32,
    )
    assert [c.uid for c in got] == list(range(len(reqs)))
    for c, p, m in zip(got, prompts, budgets):
        want = _oracle(model, params, p, max_new=m)
        assert c.token_ids == want, f"request {c.uid} diverged"

    engine = ContinuousBatchingEngine(
        model, params, num_slots=3, max_len=64, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(16,), cache_dtype=jnp.float32,
    )
    eng = {c.uid: c for c in engine.run(reqs)}
    for c in got:
        assert c.token_ids == eng[c.uid].token_ids


def test_offline_mixed_image_text(vlm):
    """Image and text requests share the dense pixel buffer: text rows run
    the ViT on zeroed flag-masked tiles and must decode exactly their solo
    stream."""
    cfg, model, params = vlm
    rng = np.random.default_rng(5)
    npt = cfg.num_image_token
    img_ids = rng.integers(1, 400, (6 + npt,)).astype(np.int32)
    img_ids[2 : 2 + npt] = cfg.img_context_token_id
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    txt = rng.integers(1, 400, (5,)).astype(np.int32)
    reqs = [
        Request(uid=0, input_ids=img_ids, pixel_values=pixels,
                max_new_tokens=6),
        Request(uid=1, input_ids=txt, max_new_tokens=6),
    ]
    got = run_offline(
        model, params, reqs, num_slots=2, max_len=64, eos_token_ids=EOS,
        pad_token_id=0, chunk_size=8, cache_dtype=jnp.float32,
    )
    assert got[0].token_ids == _oracle(model, params, img_ids, pixels)
    assert got[1].token_ids == _oracle(model, params, txt)


def test_offline_width_groups_match_oracle(vlm):
    """prefill_buckets splits the batch into width groups (one dispatch
    each); grouping must neither reorder completions nor change tokens."""
    cfg, model, params = vlm
    rng = np.random.default_rng(31)
    prompts = [rng.integers(1, 400, (n,)).astype(np.int32)
               for n in (4, 30, 9, 17, 5, 28, 12, 3)]
    reqs = [Request(uid=i, input_ids=p, max_new_tokens=5)
            for i, p in enumerate(prompts)]
    got = run_offline(
        model, params, reqs, num_slots=3, max_len=64, eos_token_ids=EOS,
        pad_token_id=0, chunk_size=4, cache_dtype=jnp.float32,
        prefill_buckets=(8, 16, 32), max_width_groups=2,
    )
    assert [c.uid for c in got] == list(range(len(reqs)))
    for c, p in zip(got, prompts):
        assert c.token_ids == _oracle(model, params, p, max_new=5), (
            f"request {c.uid} diverged"
        )


def test_offline_rejects_sampled_requests(vlm):
    cfg, model, params = vlm
    with pytest.raises(ValueError, match="greedy-only"):
        run_offline(
            model, params,
            [Request(uid=0, input_ids=np.asarray([5, 6], np.int32),
                     temperature=0.7)],
            num_slots=2, max_len=64, eos_token_ids=EOS, pad_token_id=0,
        )


def test_image_admission_under_occupied_lane(vlm):
    """Round-5 regression (self-review finding, reproduced before the
    fix): when a wave admits an IMAGE request while another lane is still
    OCCUPIED, the occupied lane's replicated candidate row used to keep
    its <IMG_CONTEXT> tokens — consuming scatter slots in
    scatter_image_embeds' GLOBAL cumsum and silently prefilling the
    admitting lane with zero image embeddings (wrong tokens for uid 2
    below). Non-admitting lanes' image tokens now become pad."""
    cfg, model, params = vlm
    rng = np.random.default_rng(17)
    npt = cfg.num_image_token
    img = cfg.vision.image_size

    def img_req(uid, max_new):
        row = rng.integers(4, 400, (8 + npt,)).astype(np.int32)
        row[2:2 + npt] = cfg.img_context_token_id
        px = rng.standard_normal((1, img, img, 3)).astype(np.float32)
        return Request(uid=uid, input_ids=row, pixel_values=px,
                       max_new_tokens=max_new)

    reqs = [
        # long text request keeps slot 0 occupied through wave 2
        Request(uid=0,
                input_ids=rng.integers(4, 400, (6,)).astype(np.int32),
                max_new_tokens=12),
        img_req(1, 2),   # short image request frees slot 1 early
        img_req(2, 3),   # admitted in wave 2 while slot 0 is occupied
    ]
    want = {r.uid: _oracle(model, params, r.input_ids, r.pixel_values,
                           max_new=r.max_new_tokens) for r in reqs}
    got = {c.uid: c.token_ids for c in run_offline(
        model, params, reqs, num_slots=2, max_len=64, eos_token_ids=EOS,
        pad_token_id=0, cache_dtype=jnp.float32, chunk_size=2)}
    assert got == want


def test_bucketed_prompt_width_up_to_max_len(vlm):
    """Round-5 review fix: a prompt whose BUCKET pads up to max_len must
    serve as long as each request's true len + max_new fits the cache
    (the old trace-time assert W + cap <= max_len rejected it)."""
    cfg, model, params = vlm
    rng = np.random.default_rng(19)
    row = rng.integers(4, 400, (40,)).astype(np.int32)
    reqs = [Request(uid=0, input_ids=row, max_new_tokens=6)]
    want = {0: _oracle(model, params, row, max_new=6)}
    got = {c.uid: c.token_ids for c in run_offline(
        model, params, reqs, num_slots=1, max_len=64, eos_token_ids=EOS,
        pad_token_id=0, cache_dtype=jnp.float32,
        prefill_buckets=(64,))}  # bucket == max_len
    assert got == want
