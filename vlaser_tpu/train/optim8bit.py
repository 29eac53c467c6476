"""Block-wise 8-bit AdamW state (the bitsandbytes AdamW8bit replacement).

Parity surface: Simpler/src/agent/train.py:251 uses bnb.optim.AdamW8bit for
both VLA optimizer groups. TPU-native equivalent: an optax transformation
that stores the Adam moments quantized — m (signed) as int8 and v
(non-negative) as uint8 — with one fp32 absmax scale per block of
`block_size` elements (bnb's block-wise dynamic quantization, block 256).
State memory per param: 2 bytes + 8/block_size vs 8 bytes for fp32 Adam.

The update dequantizes, applies standard AdamW with bias correction, and
requantizes — all inside the jitted step, so HBM holds only the int8 state.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

BLOCK = 256
SLAB_BLOCKS = 32_768  # 8.4M elements per scan step (~200 MB fp32 temps)


def _pad_len(n: int) -> int:
    return (-n) % BLOCK


def _numel(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


import numpy as _np


def _float_code_map(exp_bits: int, frac_bits: int) -> _np.ndarray:
    """Monotonic non-negative decode table (code 0 = exact zero): a
    float-like 2^e * (1 + f) grid normalized to max 1. This is the role of
    bitsandbytes' dynamic quantization map — linear absmax codes underflow on
    Adam's second moment (10+ decades of per-block dynamic range), exploding
    1/sqrt(v); a log-spaced code keeps relative error ~2^-frac_bits across
    the whole range."""
    n_exp, n_frac = 2**exp_bits, 2**frac_bits
    vals = [0.0]
    for e in range(n_exp):
        for f in range(n_frac):
            vals.append(2.0 ** (e - n_exp + 1) * (1 + f / n_frac))
    vals = _np.asarray(vals[: 256], _np.float64)
    return (vals / vals.max()).astype(_np.float32)


# unsigned (v): 5 exponent bits x 3 fraction bits -> ~9 decades, <=6% step
_UMAP = _float_code_map(5, 3)
# signed (m): magnitude table 3x4 + sign bit packed into uint8 (0..127 = +,
# 128..255 = -); finer fractions beat wider range for the first moment
# (measured on the regression test in tests/test_optim8bit.py)
_SMAP = _float_code_map(3, 4)[:128]


def _encode_table(r: jax.Array, table: jax.Array) -> jax.Array:
    """r in [0, 1] -> nearest code index in the sorted decode table."""
    mids = (table[1:] + table[:-1]) / 2.0
    return jnp.searchsorted(mids, r).astype(jnp.int32)


def _quant_unsigned(x: jax.Array):
    """non-negative fp32 -> (uint8 float-codes, per-block absmax scales)."""
    n = x.size
    xp = jnp.pad(x.reshape(-1), (0, _pad_len(n))).reshape(-1, BLOCK)
    scale = jnp.max(xp, axis=1, keepdims=True)
    scale = jnp.maximum(scale, 1e-32)
    table = jnp.asarray(_UMAP)
    q = _encode_table(xp / scale, table).astype(jnp.uint8)
    return q, scale.astype(jnp.float32)


def _dequant_unsigned(q, scale, shape):
    table = jnp.asarray(_UMAP)
    x = (table[q.astype(jnp.int32)] * scale).reshape(-1)
    return x[: _numel(shape)].reshape(shape)


def _quant_signed(x: jax.Array):
    """fp32 -> (uint8 sign+magnitude float-codes, per-block absmax scales)."""
    n = x.size
    xp = jnp.pad(x.reshape(-1), (0, _pad_len(n))).reshape(-1, BLOCK)
    scale = jnp.max(jnp.abs(xp), axis=1, keepdims=True)
    scale = jnp.maximum(scale, 1e-32)
    table = jnp.asarray(_SMAP)
    mag = _encode_table(jnp.abs(xp) / scale, table)
    sign = (xp < 0).astype(jnp.int32)
    return (mag + 128 * sign).astype(jnp.uint8), scale.astype(jnp.float32)


def _dequant_signed(q, scale, shape):
    table = jnp.asarray(_SMAP)
    qi = q.astype(jnp.int32)
    mag = table[qi % 128]
    sign = jnp.where(qi >= 128, -1.0, 1.0)
    x = (sign * mag * scale).reshape(-1)
    return x[: _numel(shape)].reshape(shape)


class Adam8bitLeaf(NamedTuple):
    m_q: jax.Array
    m_scale: jax.Array
    v_q: jax.Array
    v_scale: jax.Array


class Adam8bitState(NamedTuple):
    count: jax.Array
    moments: optax.Params  # pytree of Adam8bitLeaf


MIN_8BIT_SIZE = 4096  # bnb keeps small tensors in fp32 too


def scale_by_adam8bit(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """optax transform: Adam scaling with block-wise 8-bit moment storage.

    Leaves smaller than MIN_8BIT_SIZE keep fp32 moments (matching bnb's
    min_8bit_size behavior); chain with weight decay + lr like adamw.
    """

    def quant_leaf(g):
        if g.size < MIN_8BIT_SIZE:
            z = jnp.zeros(g.shape, jnp.float32)
            return (z, z)
        zq, zs = _quant_signed(jnp.zeros(g.shape, jnp.float32))
        vq, vs = _quant_unsigned(jnp.zeros(g.shape, jnp.float32))
        return Adam8bitLeaf(zq, zs, vq, vs)

    def init_fn(params):
        moments = jax.tree_util.tree_map(quant_leaf, params)
        return Adam8bitState(jnp.zeros((), jnp.int32), moments)

    def update_leaf(g, st, bc1, bc2, out_dtype):
        """One leaf's full chain (dequant -> adam -> requant -> update),
        kept as one unit so XLA's scheduler can free each leaf's fp32
        temporaries before the next — materializing every dequantized
        moment at once OOMs a 2B model on one 16G chip."""
        gf = g.astype(jnp.float32)
        if isinstance(st, tuple) and not isinstance(st, Adam8bitLeaf):
            m, v = st
            m = b1 * m + (1 - b1) * gf
            v = b2 * v + (1 - b2) * gf * gf
            upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            return upd.astype(out_dtype), (m, v)
        # slab-scan: process the leaf in fixed-size slabs so fp32/int32
        # temporaries stay bounded (~200 MB) no matter how large the leaf —
        # whole-leaf chains needed >10 GB of temps for the 2B MLP stacks
        nb = st.m_q.shape[0]  # [nb, BLOCK] quantized layout
        # keep the gradient in its own (bf16) dtype until inside each slab —
        # a whole-leaf fp32 copy is itself GBs for the 2B MLP stacks
        gp = jnp.pad(g.reshape(-1), (0, _pad_len(g.size))).reshape(nb, BLOCK)
        slab = max(1, min(nb, SLAB_BLOCKS))
        pad_b = (-nb) % slab
        def padb(x, value=0):
            return jnp.pad(x, ((0, pad_b),) + ((0, 0),) * (x.ndim - 1),
                           constant_values=value) if pad_b else x
        gps = padb(gp).reshape(-1, slab, BLOCK)
        mqs = padb(st.m_q).reshape(-1, slab, BLOCK)
        mss = padb(st.m_scale).reshape(-1, slab, 1)
        vqs = padb(st.v_q).reshape(-1, slab, BLOCK)
        vss = padb(st.v_scale).reshape(-1, slab, 1)
        stable = jnp.asarray(_SMAP)
        utable = jnp.asarray(_UMAP)

        def body(_, xs):
            g_s, mq_s, ms_s, vq_s, vs_s = xs
            g_s = g_s.astype(jnp.float32)
            qi = mq_s.astype(jnp.int32)
            m = jnp.where(qi >= 128, -1.0, 1.0) * stable[qi % 128] * ms_s
            m = b1 * m + (1 - b1) * g_s
            msc = jnp.maximum(jnp.max(jnp.abs(m), axis=1, keepdims=True), 1e-32)
            mag = _encode_table(jnp.abs(m) / msc, stable)
            mq2 = (mag + 128 * (m < 0).astype(jnp.int32)).astype(jnp.uint8)
            v = utable[vq_s.astype(jnp.int32)] * vs_s
            v = b2 * v + (1 - b2) * g_s * g_s
            vsc = jnp.maximum(jnp.max(v, axis=1, keepdims=True), 1e-32)
            vq2 = _encode_table(v / vsc, utable).astype(jnp.uint8)
            upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            return None, (upd.astype(out_dtype), mq2,
                          msc.astype(jnp.float32),
                          vq2, vsc.astype(jnp.float32))

        _, (upd, mq2, ms2, vq2, vs2) = jax.lax.scan(
            body, None, (gps, mqs, mss, vqs, vss)
        )
        def unpad(x, cols):
            return x.reshape(-1, cols)[:nb]
        upd = unpad(upd, BLOCK).reshape(-1)[: g.size].reshape(g.shape)
        return upd, Adam8bitLeaf(
            unpad(mq2, BLOCK), unpad(ms2, 1), unpad(vq2, BLOCK), unpad(vs2, 1)
        )

    def update_fn(updates, state, params=None):
        count = state.count + 1
        bc1 = 1 - b1**count.astype(jnp.float32)
        bc2 = 1 - b2**count.astype(jnp.float32)

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_s = treedef.flatten_up_to(state.moments)
        # serialize the big leaves' dequant->adam->requant chains with an
        # optimization-barrier token: XLA otherwise schedules every leaf's
        # fp32 moment temporaries concurrently, which OOMs a 2B model on one
        # 16G chip (measured: 26.2G requested vs ~14G serialized)
        token = count.astype(jnp.float32)
        new_updates = []
        new_moments = []
        order = sorted(range(len(flat_u)), key=lambda i: -flat_u[i].size)
        out_by_idx = {}
        for i in order:
            g = flat_u[i]
            if g.size >= MIN_8BIT_SIZE:
                g, token = jax.lax.optimization_barrier((g, token))
            upd, st = update_leaf(g, flat_s[i], bc1, bc2, flat_u[i].dtype)
            if flat_u[i].size >= MIN_8BIT_SIZE:
                upd, token = jax.lax.optimization_barrier((upd, token))
            out_by_idx[i] = (upd, st)
        for i in range(len(flat_u)):
            u, s = out_by_idx[i]
            new_updates.append(u)
            new_moments.append(s)
        return (
            jax.tree_util.tree_unflatten(treedef, new_updates),
            Adam8bitState(count, jax.tree_util.tree_unflatten(treedef, new_moments)),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adamw8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """bnb.optim.AdamW8bit equivalent (8-bit moments, decoupled decay)."""
    return optax.chain(
        scale_by_adam8bit(b1, b2, eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
