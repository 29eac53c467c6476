"""Kernel + op unit tests: Pallas flash attention (interpret mode on CPU)
against the XLA reference, plus norm/rope/pixel-shuffle numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.kernels import ops
from vlaser_tpu.kernels.flash_attention import (
    attention,
    flash_attention_fwd,
    pack_meta,
)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=dtype)


class TestOps:
    def test_rms_norm(self):
        x = _rand(jax.random.PRNGKey(0), (2, 5, 8))
        w = jnp.arange(8, dtype=jnp.float32) * 0.1 + 1.0
        got = ops.rms_norm(x, w, eps=1e-6)
        want = x / np.sqrt(np.mean(np.asarray(x) ** 2, -1, keepdims=True) + 1e-6) * w
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_layer_norm(self):
        x = _rand(jax.random.PRNGKey(1), (2, 5, 8))
        w = jnp.ones(8) * 2.0
        b = jnp.ones(8) * 0.5
        got = ops.layer_norm(x, w, b)
        xn = np.asarray(x)
        mean, var = xn.mean(-1, keepdims=True), xn.var(-1, keepdims=True)
        want = (xn - mean) / np.sqrt(var + 1e-6) * 2.0 + 0.5
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_rope_matches_hf(self):
        """Rotate-half convention must match HF Qwen2 rotary."""
        import torch

        B, S, H, D = 1, 6, 2, 8
        positions = jnp.arange(S)[None, :]
        cos, sin = ops.rope_cos_sin(positions, D, theta=10000.0)
        x = _rand(jax.random.PRNGKey(2), (B, S, H, D))
        got = ops.apply_rope(x, cos, sin)

        # HF-style reference
        inv_freq = 1.0 / (10000.0 ** (torch.arange(0, D, 2).float() / D))
        t = torch.arange(S).float()
        freqs = torch.outer(t, inv_freq)
        emb = torch.cat((freqs, freqs), dim=-1)
        tc, ts = emb.cos(), emb.sin()
        xt = torch.tensor(np.asarray(x))  # [B, S, H, D]
        x1, x2 = xt[..., : D // 2], xt[..., D // 2 :]
        rot = torch.cat((-x2, x1), dim=-1)
        want = xt * tc[None, :, None, :] + rot * ts[None, :, None, :]
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)

    def test_pixel_shuffle_v2(self):
        """Matches the reference permute chain (modeling_internvl_chat.py:257-272)."""
        n, w, h, c = 2, 4, 4, 8
        x = jnp.arange(n * w * h * c, dtype=jnp.float32).reshape(n, w, h, c)
        got = ops.pixel_shuffle(x, 0.5, version="v2")
        xn = np.asarray(x)
        y = xn.reshape(n, w, h // 2, c * 2)
        y = y.transpose(0, 2, 1, 3)
        y = y.reshape(n, h // 2, w // 2, c * 4)
        y = y.transpose(0, 2, 1, 3)
        assert got.shape == (n, 2, 2, 32)
        np.testing.assert_array_equal(got, y)


def _ref(q, k, v, **mask_kw):
    mask = ops.make_attention_mask(
        batch=q.shape[0], q_len=q.shape[1], kv_len=k.shape[1], **mask_kw
    )
    return ops.attention_reference(q, k, v, mask=mask)


class TestFlashAttention:
    @pytest.mark.parametrize("causal", [False, True])
    def test_basic_gqa(self, causal):
        key = jax.random.PRNGKey(0)
        B, Sq, Skv, H, KVH, D = 2, 48, 48, 4, 2, 32
        ks = jax.random.split(key, 3)
        q = _rand(ks[0], (B, Sq, H, D))
        k = _rand(ks[1], (B, Skv, KVH, D))
        v = _rand(ks[2], (B, Skv, KVH, D))
        qm = pack_meta(jnp.ones((B, Sq), jnp.int32))
        km = pack_meta(jnp.ones((B, Skv), jnp.int32))
        got, _ = flash_attention_fwd(
            q, k, v, qm, km, jnp.int32(0), causal=causal,
            block_q=16, block_k=128, interpret=True,
        )
        want = _ref(q, k, v, causal=causal)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_segments_and_padding(self):
        key = jax.random.PRNGKey(1)
        B, S, H, KVH, D = 2, 64, 4, 2, 32
        ks = jax.random.split(key, 3)
        q = _rand(ks[0], (B, S, H, D))
        k = _rand(ks[1], (B, S, KVH, D))
        v = _rand(ks[2], (B, S, KVH, D))
        seg = jnp.concatenate(
            [jnp.full((B, 24), 1), jnp.full((B, 24), 2), jnp.zeros((B, 16))], axis=1
        ).astype(jnp.int32)
        got, _ = flash_attention_fwd(
            q, k, v, pack_meta(seg), pack_meta(seg), jnp.int32(0), causal=True,
            block_q=16, block_k=128, interpret=True,
        )
        want = _ref(q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg)
        # padded-query rows attend nothing -> compare only valid rows
        valid = np.asarray(seg) != 0
        np.testing.assert_allclose(
            np.asarray(got)[valid], np.asarray(want)[valid], rtol=2e-4, atol=2e-4
        )

    def test_levels_block_mask(self):
        """The VLA joint rule: kv_level <= q_level (pizero_internvl.py:517-587)."""
        key = jax.random.PRNGKey(2)
        B, S, H, KVH, D = 1, 32, 2, 2, 16
        ks = jax.random.split(key, 3)
        q = _rand(ks[0], (B, S, H, D))
        k = _rand(ks[1], (B, S, KVH, D))
        v = _rand(ks[2], (B, S, KVH, D))
        # layout: 20 img/text (4 of them padding), 1 proprio, 5 action, rest pad
        seg = np.ones((B, S), np.int32)
        seg[:, 16:20] = 0
        seg[:, 26:] = 0
        lev = np.zeros((B, S), np.int32)
        lev[:, 20] = 1
        lev[:, 21:26] = 2
        seg, lev = jnp.asarray(seg), jnp.asarray(lev)
        got, _ = flash_attention_fwd(
            q, k, v, pack_meta(seg, lev), pack_meta(seg, lev), jnp.int32(0),
            causal=False, block_q=16, block_k=128, interpret=True,
        )
        want = _ref(
            q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
            q_levels=lev, kv_levels=lev,
        )
        valid = np.asarray(seg) != 0
        np.testing.assert_allclose(
            np.asarray(got)[valid], np.asarray(want)[valid], rtol=2e-4, atol=2e-4
        )

    def test_q_offset_decode(self):
        """Suffix query against longer KV (decode step) matches full attention."""
        key = jax.random.PRNGKey(3)
        B, Skv, H, KVH, D = 1, 64, 4, 2, 32
        ks = jax.random.split(key, 3)
        qfull = _rand(ks[0], (B, Skv, H, D))
        k = _rand(ks[1], (B, Skv, KVH, D))
        v = _rand(ks[2], (B, Skv, KVH, D))
        full = _ref(qfull, k, v, causal=True)
        tail = qfull[:, 48:]
        seg = jnp.ones((B, Skv), jnp.int32)
        got, _ = flash_attention_fwd(
            tail, k, v, pack_meta(seg[:, 48:]), pack_meta(seg), jnp.int32(48),
            causal=True, block_q=16, block_k=128, interpret=True,
        )
        np.testing.assert_allclose(got, full[:, 48:], rtol=2e-4, atol=2e-4)

    def test_attention_entry_grad(self):
        """custom_vjp backward (reference recompute) produces finite grads."""
        key = jax.random.PRNGKey(4)
        B, S, H, KVH, D = 1, 16, 2, 1, 8
        ks = jax.random.split(key, 3)
        q = _rand(ks[0], (B, S, H, D))
        k = _rand(ks[1], (B, S, KVH, D))
        v = _rand(ks[2], (B, S, KVH, D))

        def loss(q, k, v):
            out = attention(q, k, v, causal=True, impl="reference")
            return jnp.sum(out**2)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for x in g:
            assert np.all(np.isfinite(x))

        # matches grad of the plain reference
        def loss_ref(q, k, v):
            mask = ops.make_attention_mask(batch=B, q_len=S, kv_len=S, causal=True)
            return jnp.sum(ops.attention_reference(q, k, v, mask=mask) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, g_ref):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


class TestFlashBackward:
    @pytest.mark.parametrize("causal", [False, True])
    def test_grads_match_reference(self, causal):
        key = jax.random.PRNGKey(7)
        B, S, H, KVH, D = 2, 48, 4, 2, 32
        ks = jax.random.split(key, 3)
        q = _rand(ks[0], (B, S, H, D))
        k = _rand(ks[1], (B, S, KVH, D))
        v = _rand(ks[2], (B, S, KVH, D))
        seg = np.ones((B, S), np.int32)
        seg[:, 40:] = 0  # padding tail
        seg = jnp.asarray(seg)

        def loss(q, k, v, impl):
            out = attention(
                q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                causal=causal, impl=impl, interpret=True,
            )
            w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) / out.size
            # padded q rows are don't-care (reference degenerates to uniform
            # softmax there; flash outputs zero) -> exclude from the loss
            w = w * (seg != 0)[:, :, None, None]
            return jnp.sum(out * w)

        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, "reference")
        g_pal = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, "pallas")
        for a, b, name in zip(g_pal, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=f"d{name} mismatch",
            )

    def test_grads_with_levels(self):
        """Backward through the VLA joint block mask."""
        key = jax.random.PRNGKey(8)
        B, S, H, KVH, D = 1, 32, 2, 1, 16
        ks = jax.random.split(key, 3)
        q = _rand(ks[0], (B, S, H, D))
        k = _rand(ks[1], (B, S, KVH, D))
        v = _rand(ks[2], (B, S, KVH, D))
        lev = np.zeros((B, S), np.int32)
        lev[:, 20] = 1
        lev[:, 21:26] = 2
        seg = np.ones((B, S), np.int32)
        seg[:, 26:] = 0
        seg, lev = jnp.asarray(seg), jnp.asarray(lev)

        def loss(q, k, v, impl):
            out = attention(
                q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                q_levels=lev, kv_levels=lev, impl=impl, interpret=True,
            )
            return jnp.sum(out[:, :26] ** 2)

        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, "reference")
        g_pal = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, "pallas")
        for a, b in zip(g_pal, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


def test_pallas_softcap_forward_and_grad_parity():
    """Gemma tanh soft-clamp inside the Pallas kernel (joint_model.py:368-371)
    must match the XLA reference in both values and gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlaser_tpu.kernels.flash_attention import attention

    rng = np.random.default_rng(0)
    B, S, H, D = 1, 64, 4, 32
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)

    def run(impl):
        def f(q, k, v):
            out = attention(q, k, v, causal=True, softcap=50.0, impl=impl,
                            interpret=(impl == "pallas"))
            return jnp.sum(out * out), out

        (loss, out), grads = jax.value_and_grad(f, argnums=(0, 1, 2),
                                                has_aux=True)(q, k, v)
        return out, grads

    out_ref, g_ref = run("reference")
    out_pl, g_pl = run("pallas")
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_cached_decode_levels_preserved():
    """KVCache now stores block-mask levels: a cached decode with the VLA
    level rule must equal the uncached forward (round-1 zeroed levels)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlaser_tpu.core.config import tiny_llm
    from vlaser_tpu.inference.kv_cache import KVCache
    from vlaser_tpu.models.qwen2 import Qwen2Model

    cfg = tiny_llm()
    model = Qwen2Model(cfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B, S1, S2 = 1, 6, 2
    x = jnp.asarray(rng.standard_normal((B, S1 + S2, cfg.hidden_size)),
                    jnp.float32)
    pos = jnp.arange(S1 + S2)[None, :]
    seg = jnp.ones((B, S1 + S2), jnp.int32)
    lev = jnp.asarray([[0] * S1 + [1] * S2], jnp.int32)

    params = model.init(jax.random.PRNGKey(0), x, pos, seg_ids=seg,
                        levels=lev, causal=False, attn_impl="reference")
    full, _ = model.apply(params, x, pos, seg_ids=seg, levels=lev,
                          causal=False, attn_impl="reference")

    cache = KVCache.create(cfg.num_layers, B, S1 + S2, cfg.num_kv_heads,
                           cfg.head_dim, jnp.float32)
    _, cache = model.apply(params, x[:, :S1], pos[:, :S1],
                           seg_ids=seg[:, :S1], levels=lev[:, :S1],
                           cache=cache, causal=False, attn_impl="reference")
    out2, _ = model.apply(params, x[:, S1:], pos[:, S1:],
                          seg_ids=seg[:, S1:], levels=lev[:, S1:],
                          cache=cache, causal=False, attn_impl="reference")
    # suffix (level 1) may attend to prefix (level 0): cached == uncached.
    # With round-1's zeroed cache levels this still passed; the reverse
    # direction is the trap: prefix queries must NOT see the suffix.
    np.testing.assert_allclose(np.asarray(out2), np.asarray(full[:, S1:]),
                               rtol=1e-5, atol=1e-5)

    # now levels reversed: suffix at level 0 must not attend to level-1 keys
    lev_hi = jnp.asarray([[1] * S1 + [0] * S2], jnp.int32)
    full_hi, _ = model.apply(params, x, pos, seg_ids=seg, levels=lev_hi,
                             causal=False, attn_impl="reference")
    cache2 = KVCache.create(cfg.num_layers, B, S1 + S2, cfg.num_kv_heads,
                            cfg.head_dim, jnp.float32)
    _, cache2 = model.apply(params, x[:, :S1], pos[:, :S1],
                            seg_ids=seg[:, :S1], levels=lev_hi[:, :S1],
                            cache=cache2, causal=False, attn_impl="reference")
    out_hi, _ = model.apply(params, x[:, S1:], pos[:, S1:],
                            seg_ids=seg[:, S1:], levels=lev_hi[:, S1:],
                            cache=cache2, causal=False, attn_impl="reference")
    np.testing.assert_allclose(np.asarray(out_hi),
                               np.asarray(full_hi[:, S1:]),
                               rtol=1e-5, atol=1e-5)


def test_sliding_window_forward_and_grad_parity():
    """Sliding-window mask (qwen2_packed_training_patch.py:70-96 semantics:
    causal + k >= q - window, composing with packed segment ids) — Pallas vs
    an explicit-mask numpy oracle, values and grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlaser_tpu.kernels.flash_attention import attention

    key = jax.random.PRNGKey(11)
    B, S, H, KVH, D = 1, 64, 2, 1, 16
    W = 10
    ks = jax.random.split(key, 3)
    rand = lambda k, s: jax.random.normal(k, s, jnp.float32) * 0.5
    q = rand(ks[0], (B, S, H, D))
    k = rand(ks[1], (B, S, KVH, D))
    v = rand(ks[2], (B, S, KVH, D))
    # two packed documents + padding tail
    seg = np.ones((B, S), np.int32)
    seg[:, 30:58] = 2
    seg[:, 58:] = 0
    seg = jnp.asarray(seg)

    # numpy oracle with the explicit [S, S] mask
    qn, kn, vn = (np.asarray(x, np.float64) for x in (q, k, v))
    kr = np.repeat(kn, H // KVH, axis=2)
    vr = np.repeat(vn, H // KVH, axis=2)
    logits = np.einsum("bqhd,bkhd->bhqk", qn, kr) / np.sqrt(D)
    pos = np.arange(S)
    segn = np.asarray(seg)
    mask = (pos[:, None] >= pos[None, :])  # causal
    mask &= (pos[:, None] - pos[None, :]) <= W  # window
    mask = mask[None, None] & (segn[:, None, :, None] == segn[:, None, None, :])
    mask &= (segn != 0)[:, None, None, :]
    logits = np.where(mask, logits, -1e30)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bkhd->bqhd", p, vr)

    for impl in ("reference", "pallas"):
        got = attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                        causal=True, window=W, impl=impl, interpret=True)
        valid = (segn != 0)[:, :, None, None]
        np.testing.assert_allclose(
            np.asarray(got) * valid, want * valid, rtol=2e-4, atol=2e-4,
            err_msg=impl,
        )

    def loss(q, k, v, impl):
        out = attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                        causal=True, window=W, impl=impl, interpret=True)
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) / out.size
        return jnp.sum(out * w * (seg != 0)[:, :, None, None])

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, "reference")
    g_pal = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, "pallas")
    for a, b, name in zip(g_pal, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"d{name} mismatch")

    # windowed != unwindowed (the mask actually bites at S >> W)
    full = attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                     causal=True, impl="reference", interpret=True)
    assert float(jnp.abs(full - attention(
        q, k, v, q_segment_ids=seg, kv_segment_ids=seg, causal=True,
        window=W, impl="reference", interpret=True,
    )).max()) > 1e-3


def test_per_row_q_offset_matches_scalar_rows():
    """Vector q_offset (the engine's speculative verify blocks): a [B] offset
    builds per-row causal masks — each row must equal a solo scalar-offset
    call at that row's own offset."""
    from vlaser_tpu.kernels.flash_attention import attention

    key = jax.random.PRNGKey(9)
    B, Sq, Skv, H, KVH, D = 3, 5, 32, 4, 2, 16
    ks = jax.random.split(key, 3)
    q = _rand(ks[0], (B, Sq, H, D))
    k = _rand(ks[1], (B, Skv, KVH, D))
    v = _rand(ks[2], (B, Skv, KVH, D))
    offs = jnp.asarray([7, 12, 20], jnp.int32)
    kv_seg = (jnp.arange(Skv)[None, :] < (offs + Sq)[:, None]).astype(
        jnp.int32
    )
    got = attention(q, k, v, kv_segment_ids=kv_seg, q_offset=offs,
                    causal=True)
    for b in range(B):
        solo = attention(
            q[b : b + 1], k[b : b + 1], v[b : b + 1],
            kv_segment_ids=kv_seg[b : b + 1],
            q_offset=jnp.int32(offs[b]), causal=True, impl="reference",
        )
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(solo[0]),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"row {b} diverged")


def test_per_row_q_offset_rejects_pallas():
    from vlaser_tpu.kernels.flash_attention import attention

    q = jnp.zeros((2, 4, 2, 8))
    kv = jnp.zeros((2, 16, 2, 8))
    with np.testing.assert_raises(AssertionError):
        attention(q, kv, kv, q_offset=jnp.zeros((2,), jnp.int32),
                  causal=True, impl="pallas")
