"""VLM fusion + jitted generation tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import tiny_vlm
from vlaser_tpu.inference.sampling import make_generate_fn, trim_output
from vlaser_tpu.models.vlm import InternVLChatModel, scatter_image_embeds


@pytest.fixture(scope="module")
def vlm():
    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    B, N = 2, 12
    npt = cfg.num_image_token  # tokens per tile after pixel shuffle
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 400, (B, N))
    # sample 0 has 1 tile of image tokens at positions [2, 2+npt)
    ids[0, 2 : 2 + npt] = cfg.img_context_token_id
    pixels = rng.standard_normal((2, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32)
    flags = np.array([1, 0], np.int32)  # second tile is a padding tile
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(pixels), jnp.asarray(flags)
    )
    return cfg, model, params, ids, pixels, flags


def test_scatter_matches_loop():
    rng = np.random.default_rng(1)
    B, N, C, T, ppt = 2, 10, 8, 3, 2
    img_id = 99
    ids = rng.integers(0, 50, (B, N))
    ids[0, 1:5] = img_id  # consumes tiles 0,1 (flags: 1,0,1 -> real tiles 0,2)
    tok = rng.standard_normal((B, N, C)).astype(np.float32)
    vit = rng.standard_normal((T, ppt, C)).astype(np.float32)
    flags = np.array([1, 0, 1], np.int32)
    got = scatter_image_embeds(
        jnp.asarray(ids), jnp.asarray(tok), jnp.asarray(vit), jnp.asarray(flags), img_id
    )
    # numpy oracle mirroring modeling_internvl_chat.py:180-190
    want = tok.copy().reshape(B * N, C)
    valid = vit[flags == 1].reshape(-1, C)
    sel = (ids == img_id).reshape(-1)
    want[sel] = valid[: sel.sum()]
    np.testing.assert_allclose(np.asarray(got).reshape(B * N, C), want, rtol=1e-6)


def test_forward_shapes_and_flags(vlm):
    cfg, model, params, ids, pixels, flags = vlm
    logits, hidden, _ = model.apply(
        params, jnp.asarray(ids), jnp.asarray(pixels), jnp.asarray(flags)
    )
    assert logits.shape == (2, 12, cfg.llm.vocab_size)
    assert np.all(np.isfinite(logits))


def test_padding_tile_is_inert(vlm):
    """Changing the content of a padding tile (flag=0) must not move logits."""
    cfg, model, params, ids, pixels, flags = vlm
    a, _, _ = model.apply(params, jnp.asarray(ids), jnp.asarray(pixels), jnp.asarray(flags))
    pixels2 = pixels.copy()
    pixels2[1] = 123.0
    b, _, _ = model.apply(params, jnp.asarray(ids), jnp.asarray(pixels2), jnp.asarray(flags))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_generate_matches_uncached_greedy(vlm):
    """Jitted prefill+scan decode == per-step full uncached argmax."""
    cfg, model, params, ids, pixels, flags = vlm
    eos = [3]
    gen = make_generate_fn(
        model, max_new_tokens=5, eos_token_ids=eos, pad_token_id=0,
        cache_dtype=jnp.float32,
    )
    seg = np.ones_like(ids, np.int32)
    tokens, num = gen(
        params, jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pixels[:1]),
        jax.random.PRNGKey(0),
    )
    # oracle: grow the sequence, full forward each step (only real tiles fused)
    cur = ids.copy()
    vit_feats = model.apply(params, jnp.asarray(pixels[:1]), method=model.extract_feature)
    want = []
    for _ in range(5):
        embeds = model.apply(
            params, jnp.asarray(cur), None,
            method=model.fuse_embeddings, visual_features=vit_feats,
        )
        logits, _, _ = model.apply(
            params, embeds,
            method=lambda m, e: m.language_model(inputs_embeds=e, attn_impl="reference"),
        )
        nxt = np.asarray(jnp.argmax(logits[:, -1], -1))
        want.append(nxt)
        cur = np.concatenate([cur, nxt[:, None]], axis=1)
    want = np.stack(want, 1)
    got = np.asarray(tokens)
    for b in range(2):
        w = want[b]
        stop = np.where(np.isin(w, eos))[0]
        n = stop[0] if len(stop) else 5
        np.testing.assert_array_equal(got[b, :n], w[:n])


def test_generate_right_padding_consistent(vlm):
    """A right-padded prompt decodes the same tokens as the unpadded one."""
    cfg, model, params, ids, pixels, flags = vlm
    gen = make_generate_fn(
        model, max_new_tokens=4, eos_token_ids=[3], pad_token_id=0,
        cache_dtype=jnp.float32,
    )
    row = ids[1:2]  # text-only row
    seg = np.ones_like(row, np.int32)
    t1, _ = gen(params, jnp.asarray(row), jnp.asarray(seg), None, jax.random.PRNGKey(0))
    padded = np.concatenate([row, np.zeros((1, 4), row.dtype)], 1)
    segp = np.concatenate([seg, np.zeros((1, 4), np.int32)], 1)
    t2, _ = gen(params, jnp.asarray(padded), jnp.asarray(segp), None, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
