"""8-bit AdamW state (train/optim8bit.py — bnb AdamW8bit replacement)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vlaser_tpu.train.optim8bit import (
    MIN_8BIT_SIZE,
    Adam8bitLeaf,
    _dequant_signed,
    _dequant_unsigned,
    _quant_signed,
    _quant_unsigned,
    adamw8bit,
)


def test_quant_roundtrip_wide_dynamic_range():
    """v spans many decades inside one block — the float-code map must keep
    small entries alive (linear absmax codes underflow them to 0, which
    explodes 1/sqrt(v))."""
    rng = np.random.default_rng(0)
    v = (10.0 ** rng.uniform(-9, -1, 512)).astype(np.float32)
    q, s = _quant_unsigned(jnp.asarray(v))
    back = np.asarray(_dequant_unsigned(q, s, (512,)))
    rel = np.abs(back - v) / v
    assert rel.max() < 0.07, rel.max()  # <= half a fraction step everywhere

    m = (rng.standard_normal(512) * 10.0 ** rng.uniform(-3, 0, 512)).astype(
        np.float32
    )
    q, s = _quant_signed(jnp.asarray(m))
    back = np.asarray(_dequant_signed(q, s, (512,)))
    big = np.abs(m) > 1e-2 * np.abs(m).max()
    rel = np.abs(back[big] - m[big]) / np.abs(m[big])
    assert rel.max() < 0.05, rel.max()
    assert np.all(np.sign(back[big]) == np.sign(m[big]))


def test_adamw8bit_tracks_fp32():
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((64, 128)) * 0.1, jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    X = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
    Y = X @ jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)

    def loss(p):
        return jnp.mean((X @ p["w"] - Y) ** 2) + jnp.mean(p["b"] ** 2)

    def run(tx, steps=60):
        p = {"w": W, "b": b}
        st = tx.init(p)

        @jax.jit
        def step(p, st):
            l, g = jax.value_and_grad(loss)(p)
            u, st = tx.update(g, st, p)
            return optax.apply_updates(p, u), st, l

        for _ in range(steps):
            p, st, l = step(p, st)
        return float(l), st

    l32, _ = run(optax.adamw(1e-2, weight_decay=1e-3))
    l8, st8 = run(adamw8bit(1e-2, weight_decay=1e-3))
    start = float(loss({"w": W, "b": b}))
    # 8-bit must achieve >= 85% of fp32's loss reduction on this (aggressive
    # lr) stress problem
    assert (start - l8) / (start - l32) > 0.85, (l8, l32)

    leaf = st8[0].moments["w"]
    assert isinstance(leaf, Adam8bitLeaf)
    assert leaf.m_q.dtype == jnp.uint8 and leaf.v_q.dtype == jnp.uint8
    state_bytes = (leaf.m_q.nbytes + leaf.v_q.nbytes
                   + leaf.m_scale.nbytes + leaf.v_scale.nbytes)
    fp32_bytes = 2 * 4 * 64 * 128
    assert state_bytes < 0.35 * fp32_bytes
    # small leaves stay fp32 (bnb min_8bit_size behavior)
    assert b.size < MIN_8BIT_SIZE
    assert not isinstance(st8[0].moments["b"], Adam8bitLeaf)
