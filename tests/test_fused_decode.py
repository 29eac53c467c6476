"""Fused int8 decoder-stack kernel (kernels/fused_decode.py) vs a plain jnp
reference with identical semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.kernels.fused_decode import NEG_INF, fused_int8_stack


def _quant(w):
    s = np.abs(w).max(axis=0, keepdims=True) / 127.0 + 1e-12
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def _mk(rng, L, K, N):
    w = rng.standard_normal((L, K, N)).astype(np.float32) * 0.05
    qs = [_quant(w[l]) for l in range(L)]
    return (
        jnp.asarray(np.stack([q for q, _ in qs])),
        jnp.asarray(np.stack([s for _, s in qs])),
        np.stack([q.astype(np.float32) * s for q, s in qs]),  # dequant ref
    )


def _rope_np(v, cos, sin):
    d = v.shape[-1]
    rot = np.concatenate([-v[..., d // 2:], v[..., : d // 2]], axis=-1)
    return v * cos[:, None, :] + rot * sin[:, None, :]


def _reference(x, cos, sin, self_mask, ext_mask, ln1, ln2, bq, bk, bv,
               W, kext, vext, eps, heads, kv_heads, head_dim):
    """Float32 reference of the kernel's layer semantics (weights already
    dequantized)."""
    wq, wk, wv, wo, wg, wu, wd = W
    L = wq.shape[0]
    R = x.shape[0]
    groups = heads // kv_heads
    ext_len = kext.shape[1]
    x = x.astype(np.float32)
    k_out = np.zeros((L, R, kv_heads, head_dim), np.float32)
    v_out = np.zeros((L, R, kv_heads, head_dim), np.float32)

    def rms(h, w):
        var = (h**2).mean(-1, keepdims=True)
        return h / np.sqrt(var + eps) * w

    for l in range(L):
        h = rms(x, ln1[l])
        q = h @ wq[l] + bq[l]
        k = h @ wk[l] + bk[l]
        v = h @ wv[l] + bv[l]
        q = _rope_np(q.reshape(R, heads, head_dim), cos, sin)
        k = _rope_np(k.reshape(R, kv_heads, head_dim), cos, sin)
        v = v.reshape(R, kv_heads, head_dim)
        k_out[l], v_out[l] = k, v
        outs = []
        mask = np.concatenate(
            [np.broadcast_to(ext_mask, (R, ext_len)), self_mask], axis=1
        )
        for g in range(kv_heads):
            qg = q[:, g * groups:(g + 1) * groups].reshape(-1, head_dim)
            keys = np.concatenate([kext[l, :, g], k[:, g]], 0)
            s = qg @ keys.T * head_dim**-0.5
            m = np.repeat(mask, groups, axis=0)
            p = jax.nn.softmax(jnp.asarray(s + m), axis=-1)
            vals = np.concatenate([vext[l, :, g], v[:, g]], 0)
            outs.append((np.asarray(p) @ vals).reshape(R, groups, head_dim))
        attn = np.concatenate(outs, 1).reshape(R, heads * head_dim)
        x = x + attn @ wo[l]
        h2 = rms(x, ln2[l])
        g_ = h2 @ wg[l]
        u_ = h2 @ wu[l]
        x = x + ((g_ / (1 + np.exp(-g_))) * u_) @ wd[l]
    return x, k_out, v_out


@pytest.mark.parametrize("R,ext_len", [(1, 16), (4, 24)])
def test_fused_stack_matches_reference(R, ext_len):
    rng = np.random.default_rng(0)
    L, hidden, inter = 2, 256, 640
    heads, kv_heads, head_dim = 4, 2, 64
    q_dim, kv_dim = heads * head_dim, kv_heads * head_dim

    wq, sq, WQ = _mk(rng, L, hidden, q_dim)
    wk, sk, WK = _mk(rng, L, hidden, kv_dim)
    wv, sv, WV = _mk(rng, L, hidden, kv_dim)
    wo, so, WO = _mk(rng, L, q_dim, hidden)
    wg, sg, WG = _mk(rng, L, hidden, inter)
    wu, su, WU = _mk(rng, L, hidden, inter)
    wd, sd, WD = _mk(rng, L, inter, hidden)

    x = rng.standard_normal((R, hidden)).astype(np.float32) * 0.3
    pos = np.arange(R) + 7.0
    half = head_dim // 2
    freq = 1.0 / (10_000.0 ** (np.arange(0, head_dim, 2) / head_dim))
    ang = pos[:, None] * freq[None, :]
    cos = np.concatenate([np.cos(ang), np.cos(ang)], -1).astype(np.float32)
    sin = np.concatenate([np.sin(ang), np.sin(ang)], -1).astype(np.float32)

    ln1 = rng.uniform(0.7, 1.3, (L, hidden)).astype(np.float32)
    ln2 = rng.uniform(0.7, 1.3, (L, hidden)).astype(np.float32)
    bq = rng.standard_normal((L, q_dim)).astype(np.float32) * 0.02
    bk = rng.standard_normal((L, kv_dim)).astype(np.float32) * 0.02
    bv = rng.standard_normal((L, kv_dim)).astype(np.float32) * 0.02
    kext = rng.standard_normal((L, ext_len, kv_heads, head_dim)).astype(
        np.float32) * 0.3
    vext = rng.standard_normal((L, ext_len, kv_heads, head_dim)).astype(
        np.float32) * 0.3
    ext_mask = np.zeros((1, ext_len), np.float32)
    ext_mask[0, -3:] = NEG_INF  # a few masked (padding) external slots
    self_mask = np.zeros((R, R), np.float32)

    want_x, want_k, want_v = _reference(
        x, cos, sin, self_mask, ext_mask, ln1, ln2, bq, bk, bv,
        (WQ, WK, WV, WO, WG, WU, WD),
        kext, vext, 1e-6, heads, kv_heads, head_dim,
    )

    got_x, got_k, got_v = fused_int8_stack(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(cos), jnp.asarray(sin),
        jnp.asarray(self_mask), jnp.asarray(ext_mask),
        jnp.asarray(ln1), jnp.asarray(ln2),
        jnp.asarray(bq), jnp.asarray(bk), jnp.asarray(bv),
        wq, sq, wk, sk, wv, sv, wo, so, wg, sg, wu, su, wd, sd,
        jnp.asarray(kext, jnp.bfloat16), jnp.asarray(vext, jnp.bfloat16),
        mlp_tile=128,
        interpret=True,
    )
    # bf16 state across 2 layers: ~1% tolerance
    np.testing.assert_allclose(np.asarray(got_k, np.float32), want_k,
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(got_v, np.float32), want_v,
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(got_x, np.float32), want_x,
                               rtol=0.08, atol=0.08)

def test_fused_runner_matches_xla_decode():
    """fused_runner.fused_decode_step vs model.decode_step: same prefilled
    cache, same teacher-forced tokens, logits must agree (bf16 tolerance)."""
    import jax

    from vlaser_tpu.core.config import tiny_vlm
    from vlaser_tpu.core.quant import DEFAULT_PATTERNS, quantize_variables
    from vlaser_tpu.inference.fused_runner import (
        fused_decode_step, pack_qwen2_stack,
    )
    from vlaser_tpu.inference.kv_cache import KVCache
    from vlaser_tpu.models.vlm import InternVLChatModel

    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.bfloat16)
    n = 10
    ids = jnp.asarray(np.full((1, n), 5, np.int32))
    seg = jnp.ones((1, n), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids, None, seg)
    variables = quantize_variables(variables, DEFAULT_PATTERNS)

    new = 3
    llm = cfg.llm
    cache = KVCache.create(llm.num_layers, 1, n + new, llm.num_kv_heads,
                           llm.head_dim, dtype=jnp.bfloat16)
    logits, _, cache0 = model.apply(variables, ids, None, seg, cache,
                                    method=model.prefill)
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

    stack = pack_qwen2_stack(variables)
    q = variables["quant"]["language_model"]
    head = (("lm_head", q["lm_head"]["kernel_q"], q["lm_head"]["kernel_scale"])
            if "lm_head" in q else
            ("tied", q["embed_tokens"]["embedding_q"],
             q["embed_tokens"]["embedding_scale"]))

    cache_a, cache_b, t = cache0, cache0, tok
    for i in range(new):
        pos = jnp.asarray([n + i], jnp.int32)
        la, _, cache_a = model.apply(variables, t[:, None], cache_a,
                                     pos[:, None], method=model.decode_step)
        lb, cache_b = fused_decode_step(stack, q["embed_tokens"], head, llm,
                                        t, cache_b, pos)
        a = np.asarray(la[:, 0], np.float32)
        b = np.asarray(lb, np.float32)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 0.04, (i, np.abs(a - b).max())
        t = jnp.argmax(lb, -1).astype(jnp.int32)
