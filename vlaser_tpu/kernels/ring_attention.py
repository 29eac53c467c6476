"""Ring attention: context-parallel flash attention over a mesh axis.

The reference has NO context/sequence parallelism — it scales sequence
length only by packing + token reduction (SURVEY.md §5 long-context:
"no ring attention, context parallel, blockwise attention, or Ulysses
anywhere in the tree"), capping max_seq at 16384 on one device. This
module exceeds that surface the TPU-native way: the sequence axis is
sharded over a `context` mesh axis and K/V chunks rotate around the ring
via `lax.ppermute` (one ICI hop per step), with online-softmax merging of
per-chunk partials — O(S/n) activation memory per chip and compute that
overlaps the collective (RingAttention, Liu et al. 2023; the
jax-ml scaling-book collective model).

Semantics match kernels/flash_attention.attention exactly (fp32 softmax,
GQA, causal, packed segment ids, VLA levels, softcap) minus sliding
window — tested for fwd+grad parity on an 8-virtual-device mesh in
tests/test_ring_attention.py.

Two entry points:
  - ring_attention(...): per-device function; call inside shard_map with
    the sequence dim sharded over `axis_name`.
  - context_parallel_attention(...): drop-in wrapper that installs the
    shard_map (partial-auto: only the context axis manual), usable inside
    a jitted GSPMD computation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .flash_attention import LEVEL_BITS, LEVEL_MASK, pack_meta

NEG_INF = -1e30


def _pvary(x, axis_name):
    """Mark a locally-constructed array as device-varying over the manual
    axis (required for scan carries under shard_map's vma checking)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (axis_name,), to="varying")
    return jax.lax.pvary(x, (axis_name,))


def _chunk_mask(q_meta, kv_meta, q_pos, kv_pos, causal):
    """[B, Sq, Sk] bool mask between a local q chunk and a visiting kv
    chunk with explicit global positions (q_pos [Sq], kv_pos [Sk] — offsets
    + arange for contiguous layout, interleaved blocks for zigzag).
    Mirrors ops.make_attention_mask rules (segment-equal, seg 0 = padding,
    kv_level <= q_level, causal on global positions)."""
    q_seg = q_meta >> LEVEL_BITS
    k_seg = kv_meta >> LEVEL_BITS
    allowed = jnp.logical_and(
        q_seg[:, :, None] == k_seg[:, None, :], (k_seg != 0)[:, None, :]
    )
    allowed = jnp.logical_and(
        allowed,
        (kv_meta & LEVEL_MASK)[:, None, :] <= (q_meta & LEVEL_MASK)[:, :, None],
    )
    if causal:
        allowed = jnp.logical_and(
            allowed, (q_pos[:, None] >= kv_pos[None, :])[None]
        )
    return allowed


def _positions(rank, n, chunk, layout):
    """Global positions [chunk] of a device's sequence slice.

    'contiguous': slice r holds [r*chunk, (r+1)*chunk).
    'zigzag': slice r holds half-blocks r and 2n-1-r (RingAttention load
    balancing for causal masks — every rank then carries an equal share of
    the lower triangle instead of later ranks owning almost all of it).
    The wrapper permutes the sequence into this layout outside the ring.
    """
    if layout == "contiguous":
        return rank * chunk + jnp.arange(chunk)
    return _zig_positions(rank, n, chunk)


def _zig_positions(rank, n, chunk):
    half = chunk // 2
    first = rank * half + jnp.arange(half)
    second = (2 * n - 1 - rank) * half + jnp.arange(half)
    return jnp.concatenate([first, second])


def zigzag_indices(n: int, seq_len: int):
    """Permutation taking a contiguous [S] sequence to the zigzag layout
    (device r gets half-blocks r and 2n-1-r) and its inverse."""
    half = seq_len // (2 * n)
    order = []
    for r in range(n):
        order.extend(range(r * half, (r + 1) * half))
        order.extend(range((2 * n - 1 - r) * half, (2 * n - r) * half))
    import numpy as _np

    fwd = _np.asarray(order, _np.int32)
    inv = _np.empty_like(fwd)
    inv[fwd] = _np.arange(seq_len, dtype=_np.int32)
    return fwd, inv


def _chunk_parts(q, k, v, mask, scale, softcap):
    """Unnormalized flash partials for one kv chunk.

    q [B,Sq,H,D], k/v [B,Sk,KVH,D], mask [B,Sq,Sk] ->
      o_un [B,Sq,H,D] f32 (sum p·v in the chunk-max frame),
      m    [B,H,Sq] f32 chunk row max,
      l    [B,H,Sq] f32 chunk row sum.
    """
    b, sq, h, d = q.shape
    kvh = k.shape[2]
    g = h // kvh
    qf = q.astype(jnp.float32).reshape(b, sq, kvh, g, d)
    logits = jnp.einsum("bqkgd,bskd->bkgqs", qf * scale,
                        k.astype(jnp.float32))
    if softcap is not None:
        logits = softcap * jnp.tanh(logits / softcap)
    logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    m = jnp.max(logits, axis=-1)                      # [B,KVH,G,Sq]
    p = jnp.where(mask[:, None, None, :, :],
                  jnp.exp(logits - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    o_un = jnp.einsum("bkgqs,bskd->bqkgd", p, v.astype(jnp.float32))
    return (
        o_un.reshape(b, sq, h, d),
        m.reshape(b, kvh * g, sq),
        l.reshape(b, kvh * g, sq),
    )


def _ring_perm(n):
    return [(j, (j + 1) % n) for j in range(n)]


def _ring_fwd_impl(q, k, v, q_meta, kv_meta, causal, scale, softcap,
                   axis_name, layout):
    n = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    b, sq, h, d = q.shape
    chunk = sq  # local chunk length (uniform shards)
    q_pos = _positions(rank, n, chunk, layout)
    perm = _ring_perm(n)

    acc = _pvary(jnp.zeros((b, sq, h, d), jnp.float32), axis_name)
    m_run = _pvary(jnp.full((b, h, sq), NEG_INF, jnp.float32), axis_name)
    l_run = _pvary(jnp.zeros((b, h, sq), jnp.float32), axis_name)

    def body(carry, _):
        (kc, vc, kvm, src), (acc, m_run, l_run) = carry
        kv_pos = _positions(src, n, chunk, layout)
        mask = _chunk_mask(q_meta, kvm, q_pos, kv_pos, causal)
        o_un, mc, lc = _chunk_parts(q, kc, vc, mask, scale, softcap)
        m_new = jnp.maximum(m_run, mc)
        alpha = jnp.exp(m_run - m_new)
        beta = jnp.exp(mc - m_new)
        acc = acc * alpha.transpose(0, 2, 1)[..., None] \
            + o_un * beta.transpose(0, 2, 1)[..., None]
        l_new = l_run * alpha + lc * beta
        ring = jax.lax.ppermute((kc, vc, kvm, src), axis_name, perm)
        return (ring, (acc, m_new, l_new)), None

    init = ((k, v, kv_meta, rank), (acc, m_run, l_run))
    (_, (acc, m_run, l_run)), _ = jax.lax.scan(body, init, None, length=n)
    out = acc / jnp.maximum(l_run, 1e-37).transpose(0, 2, 1)[..., None]
    lse = m_run + jnp.log(jnp.maximum(l_run, 1e-37))
    return out.astype(q.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _ring(q, k, v, q_meta, kv_meta, causal, scale, softcap, axis_name,
          layout):
    out, _ = _ring_fwd_impl(q, k, v, q_meta, kv_meta, causal, scale,
                            softcap, axis_name, layout)
    return out


def _ring_fwd(q, k, v, q_meta, kv_meta, causal, scale, softcap, axis_name,
              layout):
    out, lse = _ring_fwd_impl(q, k, v, q_meta, kv_meta, causal, scale,
                              softcap, axis_name, layout)
    return out, (q, k, v, q_meta, kv_meta, out, lse)


def _ring_bwd(causal, scale, softcap, axis_name, layout, res, dout):
    q, k, v, q_meta, kv_meta, out, lse = res
    n = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    b, sq, h, d = q.shape
    kvh = k.shape[2]
    g = h // kvh
    chunk = sq
    q_pos = _positions(rank, n, chunk, layout)
    perm = _ring_perm(n)

    doutf = dout.astype(jnp.float32)
    # delta_i = sum_j dout_ij * out_ij  (flash-attn-2 backward)
    delta = jnp.sum(doutf * out.astype(jnp.float32), axis=-1)  # [B,Sq,H]
    delta = delta.transpose(0, 2, 1).reshape(b, kvh, g, sq)
    lse_r = lse.reshape(b, kvh, g, sq)
    qf = q.astype(jnp.float32).reshape(b, sq, kvh, g, d)
    dout_r = doutf.reshape(b, sq, kvh, g, d)

    dq = _pvary(jnp.zeros((b, sq, kvh, g, d), jnp.float32), axis_name)
    dk0 = _pvary(jnp.zeros((b, chunk, kvh, d), jnp.float32), axis_name)
    dv0 = _pvary(jnp.zeros((b, chunk, kvh, d), jnp.float32), axis_name)

    def body(carry, _):
        (kc, vc, kvm, src, dkc, dvc), dq = carry
        kv_pos = _positions(src, n, chunk, layout)
        mask = _chunk_mask(q_meta, kvm, q_pos, kv_pos, causal)
        kf = kc.astype(jnp.float32)
        vf = vc.astype(jnp.float32)
        raw = jnp.einsum("bqkgd,bskd->bkgqs", qf * scale, kf)
        if softcap is not None:
            t = jnp.tanh(raw / softcap)
            logits = softcap * t
        else:
            logits = raw
        logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
        p = jnp.where(mask[:, None, None, :, :],
                      jnp.exp(logits - lse_r[..., None]), 0.0)
        dvc = dvc + jnp.einsum("bkgqs,bqkgd->bskd", p, dout_r)
        dp = jnp.einsum("bqkgd,bskd->bkgqs", dout_r, vf)
        ds = p * (dp - delta[..., None])
        if softcap is not None:
            ds = ds * (1.0 - t * t)
        dq = dq + jnp.einsum("bkgqs,bskd->bqkgd", ds, kf) * scale
        dkc = dkc + jnp.einsum("bkgqs,bqkgd->bskd", ds, qf) * scale
        ring = jax.lax.ppermute((kc, vc, kvm, src, dkc, dvc), axis_name,
                                perm)
        return (ring, dq), None

    init = ((k, v, kv_meta, rank, dk0, dv0), dq)
    ((_, _, _, _, dk, dv), dq), _ = jax.lax.scan(body, init, None, length=n)
    return (
        dq.reshape(b, sq, h, d).astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        None,
        None,
    )


_ring.defvjp(_ring_fwd, _ring_bwd)


def ring_attention(
    q: jax.Array,   # [B, S_local, H, D]
    k: jax.Array,   # [B, S_local, KVH, D]
    v: jax.Array,
    *,
    axis_name: str,
    q_segment_ids: Optional[jax.Array] = None,  # [B, S_local]
    kv_segment_ids: Optional[jax.Array] = None,
    q_levels: Optional[jax.Array] = None,
    kv_levels: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    softcap: Optional[float] = None,
    layout: str = "contiguous",
) -> jax.Array:
    """Per-device ring attention; call inside shard_map with the sequence
    dim sharded over `axis_name`. Shards must be equal-length; layout
    'contiguous' means chunk i = global positions [i*S_local,(i+1)*S_local),
    'zigzag' means slice i = half-blocks i and 2n-1-i (causal load
    balancing; permute with zigzag_indices first)."""
    b, s = q.shape[0], q.shape[1]
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    if q_segment_ids is None:
        q_segment_ids = jnp.ones((b, s), jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = q_segment_ids
    q_meta = pack_meta(q_segment_ids, q_levels)
    kv_meta = pack_meta(kv_segment_ids, kv_levels)
    return _ring(q, k, v, q_meta, kv_meta, causal, scale, softcap, axis_name,
                 layout)


def context_parallel_attention(
    q: jax.Array,   # [B, S, H, D] (global/logical sequence)
    k: jax.Array,
    v: jax.Array,
    *,
    axis: str = "context",
    mesh=None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    q_levels: Optional[jax.Array] = None,
    kv_levels: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    softcap: Optional[float] = None,
    layout: str = "contiguous",
) -> jax.Array:
    """shard_map wrapper: shards the sequence dim over `axis` (partial-auto
    — every other mesh axis stays under GSPMD), runs ring_attention, and
    returns the logical result. Drop-in inside a jitted computation.

    layout='zigzag' permutes the sequence into interleaved half-blocks
    before the ring and back after — with a causal mask this balances the
    lower-triangle work evenly across ranks (contiguous chunks leave rank 0
    ~idle and rank n-1 doing ~2x the mean)."""
    b, s = q.shape[0], q.shape[1]
    if q_segment_ids is None:
        q_segment_ids = jnp.ones((b, s), jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = q_segment_ids

    has_lv = q_levels is not None
    if not has_lv:
        q_levels = jnp.zeros((b, s), jnp.int32)
        kv_levels = jnp.zeros((b, s), jnp.int32)

    inv = None
    if layout == "zigzag":
        if mesh is not None:
            n = mesh.shape[axis]
        else:
            n = jax.sharding.get_abstract_mesh().shape[axis]
        assert s % (2 * n) == 0, (s, n)
        fwd_ix, inv_ix = zigzag_indices(n, s)
        fwd_ix = jnp.asarray(fwd_ix)
        inv = jnp.asarray(inv_ix)
        take = lambda a: jnp.take(a, fwd_ix, axis=1)
        q, k, v = take(q), take(k), take(v)
        q_segment_ids, kv_segment_ids = take(q_segment_ids), take(kv_segment_ids)
        q_levels, kv_levels = take(q_levels), take(kv_levels)

    def inner(q, k, v, qs, ks, ql, kl):
        return ring_attention(
            q, k, v, axis_name=axis,
            q_segment_ids=qs, kv_segment_ids=ks,
            q_levels=ql if has_lv else None,
            kv_levels=kl if has_lv else None,
            causal=causal, scale=scale, softcap=softcap, layout=layout,
        )

    seq4 = P(None, axis, None, None)
    seq2 = P(None, axis)
    fn = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(seq4, seq4, seq4, seq2, seq2, seq2, seq2),
        out_specs=seq4,
        axis_names={axis},
        check_vma=False,
    )
    # partial-auto shard_map only canonicalizes correctly under a jit trace
    # (eagerly, the unmentioned auto axes leak into the out_specs check);
    # inside an outer jit this inlines, eagerly (e.g. model.init) it compiles
    out = jax.jit(fn)(q, k, v, q_segment_ids, kv_segment_ids, q_levels,
                      kv_levels)
    if inv is not None:
        out = jnp.take(out, inv, axis=1)
    return out
