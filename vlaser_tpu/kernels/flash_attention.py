"""Pallas TPU flash attention.

One kernel family covers the reference's three flash-attn uses (SURVEY.md §2.9):
  (a) non-causal ViT attention (modeling_intern_vit.py:229-247),
  (b) causal packed-LLM attention with cu_seqlens -> segment ids here
      (qwen2_packed_training_patch.py:70-96),
  (c) the VLA joint block mask (pizero_internvl.py:517-587) -> "levels":
      img/text=0, proprio=1, action=2; allowed iff kv_level <= q_level.

Masking is composed from per-token int32 metadata (segment id + level packed
into one word) instead of materialized [B,1,S,S] masks — O(S) instead of O(S^2)
HBM traffic. fp32 online softmax in VMEM; bf16 in/out.

Layout: q [B, H, Sq, D], k/v [B, KVH, Skv, D] with GQA folded via block
index_map (no KV repetition in HBM). Grid (B, H, nq, nk); m/l/acc live in VMEM
scratch across the sequential nk dimension.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ops

LEVEL_BITS = 2
LEVEL_MASK = (1 << LEVEL_BITS) - 1
NEG_INF = -1e30


def pack_meta(segment_ids: jax.Array, levels: Optional[jax.Array] = None) -> jax.Array:
    """Pack per-token (segment, level) into one int32. segment 0 = padding."""
    meta = segment_ids.astype(jnp.int32) << LEVEL_BITS
    if levels is not None:
        meta = meta | levels.astype(jnp.int32)
    return meta


def _flash_fwd_kernel(
    # scalar prefetch
    q_offset_ref,
    # inputs
    q_ref,  # [1, 1, bq, D]
    k_ref,  # [1, 1, bk, D]
    v_ref,
    qm_ref,  # [1, 1, bq] int32 meta
    km_ref,  # [1, 1, bk]
    # outputs
    o_ref,  # [1, 1, bq, D]
    lse_ref,  # [1, 1, bq, 1]
    # scratch
    m_scr,  # [bq, 1] f32
    l_scr,  # [bq, 1] f32
    acc_scr,  # [bq, D] f32
    *,
    causal: bool,
    block_q: int,
    block_k: int,
    num_k_blocks: int,
    scale: float,
    softcap: Optional[float] = None,
    window: Optional[int] = None,
):
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    iq = pl.program_id(2)
    q_start = q_offset_ref[0] + iq * block_q
    k_start = ik * block_k

    run = True
    if causal:
        # skip blocks entirely above the diagonal
        run = k_start <= q_start + block_q - 1
    if window is not None:
        # sliding window: skip blocks entirely left of q_start - window
        run = jnp.logical_and(run, k_start + block_k - 1 >= q_start - window)

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32) * scale  # [bq, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [bk, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        if softcap is not None:
            # Gemma logit soft-clamp (joint_model.py:368-371)
            s = softcap * jnp.tanh(s / softcap)

        qm = qm_ref[0, 0]  # [bq] int32
        km = km_ref[0, 0]  # [bk]
        q_seg = (qm >> LEVEL_BITS)[:, None]
        k_seg = (km >> LEVEL_BITS)[None, :]
        q_lev = (qm & LEVEL_MASK)[:, None]
        k_lev = (km & LEVEL_MASK)[None, :]
        allowed = jnp.logical_and(q_seg == k_seg, k_seg != 0)
        allowed = jnp.logical_and(allowed, k_lev <= q_lev)
        if causal or window is not None:
            rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            if causal:
                allowed = jnp.logical_and(allowed, rows >= cols)
            if window is not None:
                # flash-attn left-window semantics: k >= q - window
                allowed = jnp.logical_and(allowed, rows - cols <= window)
        s = jnp.where(allowed, s, NEG_INF)

        m_prev = m_scr[:]  # [bq, 1]
        l_prev = l_scr[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # rows that are fully masked keep m = NEG_INF; guard exp overflow
        p = jnp.exp(s - m_new)
        p = jnp.where(allowed, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, 0].astype(jnp.float32)  # [bk, D]
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_new
        l_scr[:] = l_new

    @pl.when(ik == num_k_blocks - 1)
    def _finalize():
        l = l_scr[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[:] + jnp.log(safe_l)


def _pad_to(x: jax.Array, axis: int, multiple: int, value=0):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "interpret",
                     "softcap", "window"),
)
def flash_attention_fwd(
    q: jax.Array,  # [B, Sq, H, D]
    k: jax.Array,  # [B, Skv, KVH, D]
    v: jax.Array,
    q_meta: jax.Array,  # [B, Sq] int32 (pack_meta)
    kv_meta: jax.Array,  # [B, Skv]
    q_offset: jax.Array,  # [] int32 — global position of q[0] (decode)
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
    softcap: Optional[float] = None,
    window: Optional[int] = None,
):
    b, sq, h, d = q.shape
    skv, kvh = k.shape[1], k.shape[2]
    groups = h // kvh
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    block_q = min(block_q, max(16, _round_up(sq, 16)))
    block_k = min(block_k, max(128, _round_up(skv, 128)))
    if not causal and skv <= 2048:
        # non-causal short-KV (ViT tiles): one full-width K pass skips the
        # online-softmax rescales entirely (measured 1.5ms vs 4.0ms for the
        # 1025-token tile at batch 8 on v5e)
        block_k = _round_up(skv, 128)

    # [B, H, S, D] layout for clean (sublane=seq, lane=head_dim) tiling
    qt = _pad_to(jnp.transpose(q, (0, 2, 1, 3)), 2, block_q)
    kt = _pad_to(jnp.transpose(k, (0, 2, 1, 3)), 2, block_k)
    vt = _pad_to(jnp.transpose(v, (0, 2, 1, 3)), 2, block_k)
    qm = _pad_to(q_meta, 1, block_q)[:, None, :]  # pad meta=0 -> seg 0 (masked)
    km = _pad_to(kv_meta, 1, block_k)[:, None, :]
    sq_p, skv_p = qt.shape[2], kt.shape[2]
    nq, nk = sq_p // block_q, skv_p // block_k

    grid = (b, h, nq, nk)
    kernel = functools.partial(
        _flash_fwd_kernel,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
        num_k_blocks=nk,
        scale=scale,
        softcap=softcap,
        window=window,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ik, *refs: (b, h, iq, 0)),
                pl.BlockSpec(
                    (1, 1, block_k, d),
                    lambda b, h, iq, ik, *refs, groups=groups: (b, h // groups, ik, 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_k, d),
                    lambda b, h, iq, ik, *refs, groups=groups: (b, h // groups, ik, 0),
                ),
                pl.BlockSpec((1, 1, block_q), lambda b, h, iq, ik, *refs: (b, 0, iq)),
                pl.BlockSpec((1, 1, block_k), lambda b, h, iq, ik, *refs: (b, 0, ik)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ik, *refs: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b, h, iq, ik, *refs: (b, h, iq, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq_p, 1), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.atleast_1d(q_offset).astype(jnp.int32), qt, kt, vt, qm, km)
    out = jnp.transpose(out[:, :, :sq], (0, 2, 1, 3))
    return out, lse[:, :, :sq, 0]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Pallas backward: dq kernel (grid b,h,nq,nk) + dkv kernel (grid b,kvh,nk,
# groups*nq) recomputing probabilities from saved lse — O(S) memory, the
# flash-attn-2 backward structure.
# ---------------------------------------------------------------------------


def _bwd_mask(qm, km, q_start, k_start, block_q, block_k, causal, window=None):
    q_seg = (qm >> LEVEL_BITS)[:, None]
    k_seg = (km >> LEVEL_BITS)[None, :]
    q_lev = (qm & LEVEL_MASK)[:, None]
    k_lev = (km & LEVEL_MASK)[None, :]
    allowed = jnp.logical_and(q_seg == k_seg, k_seg != 0)
    allowed = jnp.logical_and(allowed, k_lev <= q_lev)
    if causal or window is not None:
        rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        if causal:
            allowed = jnp.logical_and(allowed, rows >= cols)
        if window is not None:
            allowed = jnp.logical_and(allowed, rows - cols <= window)
    return allowed


def _bwd_mask_t(qm, km, q_start, k_start, block_q, block_k, causal,
                window=None):
    """[bk, bq] mask built directly — Mosaic cannot legalize transposing an
    i1 vector (tpu.transpose on vector<...xi1>), so the dkv kernel gets the
    transposed layout natively instead of `allowed.T`."""
    q_seg = (qm >> LEVEL_BITS)[None, :]
    k_seg = (km >> LEVEL_BITS)[:, None]
    q_lev = (qm & LEVEL_MASK)[None, :]
    k_lev = (km & LEVEL_MASK)[:, None]
    allowed = jnp.logical_and(q_seg == k_seg, k_seg != 0)
    allowed = jnp.logical_and(allowed, k_lev <= q_lev)
    if causal or window is not None:
        cols_q = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 1)
        rows_k = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 0)
        if causal:
            allowed = jnp.logical_and(allowed, cols_q >= rows_k)
        if window is not None:
            allowed = jnp.logical_and(allowed, cols_q - rows_k <= window)
    return allowed


def _flash_bwd_dq_kernel(
    q_offset_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qm_ref, km_ref,
    dq_ref,
    dq_scr,
    *, causal, block_q, block_k, num_k_blocks, scale, softcap=None,
    window=None,
):
    ik = pl.program_id(3)
    iq = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q_start = q_offset_ref[0] + iq * block_q
    k_start = ik * block_k
    run = True
    if causal:
        run = k_start <= q_start + block_q - 1
    if window is not None:
        run = jnp.logical_and(run, k_start + block_k - 1 >= q_start - window)

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32) * scale
        k = k_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if softcap is not None:
            t_cap = jnp.tanh(s / softcap)
            s = softcap * t_cap
        allowed = _bwd_mask(qm_ref[0, 0], km_ref[0, 0], q_start, k_start,
                            block_q, block_k, causal, window)
        lse = lse_ref[0, 0]  # [bq, 1]
        p = jnp.where(allowed, jnp.exp(s - lse), 0.0)
        do = do_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        delta = delta_ref[0, 0]  # [bq, 1]
        ds = p * (dp - delta)
        if softcap is not None:
            ds = ds * (1.0 - t_cap * t_cap)  # d/ds softcap*tanh(s/softcap)
        dq_scr[:] = dq_scr[:] + scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(ik == num_k_blocks - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_offset_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qm_ref, km_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, causal, block_q, block_k, num_q_blocks, num_inner, scale, softcap=None,
    window=None,
):
    t = pl.program_id(3)
    ik = pl.program_id(2)
    iq = t % num_q_blocks

    @pl.when(t == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q_start = q_offset_ref[0] + iq * block_q
    k_start = ik * block_k
    run = True
    if causal:
        run = k_start <= q_start + block_q - 1
    if window is not None:
        run = jnp.logical_and(run, k_start + block_k - 1 >= q_start - window)

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32) * scale
        k = k_ref[0, 0].astype(jnp.float32)
        # s^T [bk, bq]
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if softcap is not None:
            t_cap = jnp.tanh(st / softcap)
            st = softcap * t_cap
        allowed_t = _bwd_mask_t(qm_ref[0, 0], km_ref[0, 0], q_start, k_start,
                                block_q, block_k, causal, window)
        lse = lse_ref[0, 0][:, 0]  # [bq]
        pt = jnp.where(allowed_t, jnp.exp(st - lse[None, :]), 0.0)  # [bk, bq]
        do = do_ref[0, 0].astype(jnp.float32)  # [bq, D]
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            pt, do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        v = v_ref[0, 0].astype(jnp.float32)  # [bk, D]
        dpt = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, bq]
        delta = delta_ref[0, 0][:, 0]  # [bq]
        dst = pt * (dpt - delta[None, :])
        if softcap is not None:
            dst = dst * (1.0 - t_cap * t_cap)
        dk_scr[:] = dk_scr[:] + scale * jax.lax.dot_general(
            dst, q / scale, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(t == num_inner - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "interpret",
                     "softcap", "window"),
)
def flash_attention_bwd(
    q, k, v, q_meta, kv_meta, q_offset, out, lse, dout,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
    softcap: Optional[float] = None,
    window: Optional[int] = None,
):
    b, sq, h, d = q.shape
    skv, kvh = k.shape[1], k.shape[2]
    groups = h // kvh
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    block_q = min(block_q, max(16, _round_up(sq, 16)))
    block_k = min(block_k, max(128, _round_up(skv, 128)))

    qt = _pad_to(jnp.transpose(q, (0, 2, 1, 3)), 2, block_q)
    kt = _pad_to(jnp.transpose(k, (0, 2, 1, 3)), 2, block_k)
    vt = _pad_to(jnp.transpose(v, (0, 2, 1, 3)), 2, block_k)
    dot = _pad_to(jnp.transpose(dout, (0, 2, 1, 3)), 2, block_q)
    qm = _pad_to(q_meta, 1, block_q)[:, None, :]
    km = _pad_to(kv_meta, 1, block_k)[:, None, :]
    lse_p = _pad_to(lse, 2, block_q)[..., None]  # [B, H, Sq_p, 1]
    delta = jnp.sum(
        dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # [B, Sq, H]
    delta = _pad_to(jnp.transpose(delta, (0, 2, 1)), 2, block_q)[..., None]
    sq_p, skv_p = qt.shape[2], kt.shape[2]
    nq, nk = sq_p // block_q, skv_p // block_k
    offs = jnp.atleast_1d(q_offset).astype(jnp.int32)

    # ---- dq ----
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, causal=causal, block_q=block_q,
            block_k=block_k, num_k_blocks=nk, scale=scale, softcap=softcap,
            window=window,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, nq, nk),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ik, *r: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda b, h, iq, ik, *r, g=groups: (b, h // g, ik, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda b, h, iq, ik, *r, g=groups: (b, h // g, ik, 0)),
                pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ik, *r: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b, h, iq, ik, *r: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b, h, iq, ik, *r: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, block_q), lambda b, h, iq, ik, *r: (b, 0, iq)),
                pl.BlockSpec((1, 1, block_k), lambda b, h, iq, ik, *r: (b, 0, ik)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, d), lambda b, h, iq, ik, *r: (b, h, iq, 0)
            ),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        interpret=interpret,
    )(offs, qt, kt, vt, dot, lse_p, delta, qm, km)

    # ---- dk/dv ---- grid inner dim walks (g, iq) pairs for one kv head
    num_inner = groups * nq

    def q_ix(bb, kh, ik, t, *r, g=groups, nq=nq):
        return (bb, kh * g + t // nq, t % nq, 0)

    def qm_ix(bb, kh, ik, t, *r, nq=nq):
        return (bb, 0, t % nq)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, causal=causal, block_q=block_q,
            block_k=block_k, num_q_blocks=nq, num_inner=num_inner, scale=scale,
            softcap=softcap, window=window,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, kvh, nk, num_inner),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), q_ix),
                pl.BlockSpec((1, 1, block_k, d), lambda b, kh, ik, t, *r: (b, kh, ik, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b, kh, ik, t, *r: (b, kh, ik, 0)),
                pl.BlockSpec((1, 1, block_q, d), q_ix),
                pl.BlockSpec((1, 1, block_q, 1), q_ix),
                pl.BlockSpec((1, 1, block_q, 1), q_ix),
                pl.BlockSpec((1, 1, block_q), qm_ix),
                pl.BlockSpec((1, 1, block_k), lambda b, kh, ik, t, *r: (b, 0, ik)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_k, d), lambda b, kh, ik, t, *r: (b, kh, ik, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b, kh, ik, t, *r: (b, kh, ik, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, kvh, skv_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, kvh, skv_p, d), v.dtype),
        ],
        interpret=interpret,
    )(offs, qt, kt, vt, dot, lse_p, delta, qm, km)

    dq = jnp.transpose(dq[:, :, :sq], (0, 2, 1, 3))
    dk = jnp.transpose(dk[:, :, :skv], (0, 2, 1, 3))
    dv = jnp.transpose(dv[:, :, :skv], (0, 2, 1, 3))
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public entry: differentiable attention. Pallas fwd+bwd (flash) or XLA
# reference, chosen by impl/auto heuristics.
# ---------------------------------------------------------------------------


def _ref_attention(q, k, v, q_meta, kv_meta, q_offset, causal, scale,
                   softcap=None, window=None):
    b, sq = q.shape[0], q.shape[1]
    skv = k.shape[1]
    mask = ops.make_attention_mask(
        batch=b,
        q_len=sq,
        kv_len=skv,
        causal=causal,
        q_offset=q_offset,
        q_segment_ids=q_meta >> LEVEL_BITS,
        kv_segment_ids=kv_meta >> LEVEL_BITS,
        q_levels=q_meta & LEVEL_MASK,
        kv_levels=kv_meta & LEVEL_MASK,
        window=window,
    )
    return ops.attention_reference(q, k, v, mask=mask, scale=scale,
                                   softcap=softcap)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _attention(q, k, v, q_meta, kv_meta, q_offset, causal, scale, use_pallas,
               interpret=False, softcap=None, window=None):
    if use_pallas:
        out, _ = flash_attention_fwd(
            q, k, v, q_meta, kv_meta, q_offset, causal=causal, scale=scale,
            interpret=interpret, softcap=softcap, window=window,
        )
        return out
    return _ref_attention(q, k, v, q_meta, kv_meta, q_offset, causal, scale,
                          softcap, window)


def _attention_fwd(q, k, v, q_meta, kv_meta, q_offset, causal, scale,
                   use_pallas, interpret=False, softcap=None, window=None):
    if use_pallas:
        out, lse = flash_attention_fwd(
            q, k, v, q_meta, kv_meta, q_offset, causal=causal, scale=scale,
            interpret=interpret, softcap=softcap, window=window,
        )
        return out, (q, k, v, q_meta, kv_meta, q_offset, out, lse)
    out = _ref_attention(q, k, v, q_meta, kv_meta, q_offset, causal, scale,
                         softcap, window)
    return out, (q, k, v, q_meta, kv_meta, q_offset, None, None)


def _attention_bwd(causal, scale, use_pallas, interpret, softcap, window,
                   res, g):
    q, k, v, q_meta, kv_meta, q_offset, out, lse = res
    if use_pallas:
        dq, dk, dv = flash_attention_bwd(
            q, k, v, q_meta, kv_meta, q_offset, out, lse, g,
            causal=causal, scale=scale, interpret=interpret, softcap=softcap,
            window=window,
        )
    else:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _ref_attention(
                q_, k_, v_, q_meta, kv_meta, q_offset, causal, scale, softcap,
                window,
            ),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None, None


_attention.defvjp(_attention_fwd, _attention_bwd)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    q_levels: Optional[jax.Array] = None,
    kv_levels: Optional[jax.Array] = None,
    q_offset: jax.Array | int = 0,
    causal: bool = False,
    scale: Optional[float] = None,
    impl: str = "auto",  # auto | pallas | reference
    interpret: bool = False,
    softcap: Optional[float] = None,
    window: Optional[int] = None,
) -> jax.Array:
    """Unified attention entry. q [B,Sq,H,D]; k/v [B,Skv,KVH,D] (GQA).

    Segment id 0 marks padding keys. Levels implement the VLA block rule.
    window: sliding-window size in flash-attn left-window semantics
    (k allowed iff q_pos - k_pos <= window), composing with causal + segment
    ids — the packed-patch capability of qwen2_packed_training_patch.py:70-96
    (`window_size=(config.sliding_window,)*2` + causal).
    """
    if window is not None:
        assert causal, "sliding window is defined for the causal LLM path"
    b, sq = q.shape[0], q.shape[1]
    skv = k.shape[1]
    if q_segment_ids is None:
        q_segment_ids = jnp.ones((b, sq), jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = jnp.ones((b, skv), jnp.int32)
    q_meta = pack_meta(q_segment_ids, q_levels)
    kv_meta = pack_meta(kv_segment_ids, kv_levels)
    if getattr(q_offset, "ndim", 0) == 1:
        # per-row q offsets (engine speculative decode blocks): the Pallas
        # kernel reads a scalar offset, so this shape routes to the XLA
        # reference path — the right call anyway at its [B, K+1, max_len]
        # logit sizes.
        assert impl != "pallas", (
            "per-row q_offset is unsupported by the Pallas kernel"
        )
        impl = "reference"
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        # Measured on v5e (round 1): XLA's fused attention wins when the
        # logits tensor is small (ViT tile at batch 1), this kernel wins when
        # it is large — long packed-SFT sequences (8k causal H=12 D=128: fwd
        # 7.75ms vs 13.9ms, fwd+bwd 12.5ms vs 32.1ms) and batched ViT
        # (1025 tok x 16 heads @ batch 8: 1.5ms vs 2.5ms) — while keeping
        # O(S) memory where XLA materializes [B,H,Sq,Skv] fp32 logits.
        logits_bytes = b * q.shape[2] * sq * skv * 4
        impl = (
            "pallas"
            if (on_tpu and (sq >= 2048 or logits_bytes > 128 * 2**20))
            else "reference"
        )
    use_pallas = impl == "pallas"
    return _attention(
        q, k, v, q_meta, kv_meta, jnp.asarray(q_offset, jnp.int32),
        causal, scale, use_pallas, interpret, softcap, window,
    )
