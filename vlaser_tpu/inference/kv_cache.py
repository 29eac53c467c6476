"""HBM-resident functional KV cache.

Unlike the reference's per-layer Python list of tensors (src/model/kv_cache.py:6-46)
this is a static-shape pytree threaded through jitted scan loops: [L, B, max_len,
KVH, D] buffers plus per-slot segment ids and a scalar fill length. Static shapes
mean one compilation for the whole decode; validity is data (segment id 0 = empty
slot), not shape.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class KVCache:
    k: jax.Array  # [L, B, max_len, KVH, D]
    v: jax.Array  # [L, B, max_len, KVH, D]
    seg: jax.Array  # [B, max_len] int32; 0 = empty/padding
    lev: jax.Array  # [B, max_len] int32 — VLA block-mask levels (0 default)
    length: jax.Array  # [] int32 next write offset, or [B] int32 per-row
    # offsets (continuous-batching engine: rows admitted at different times
    # decode at different fill depths; see serve/engine.py)

    @classmethod
    def create(
        cls,
        num_layers: int,
        batch: int,
        max_len: int,
        num_kv_heads: int,
        head_dim: int,
        dtype=jnp.bfloat16,
    ) -> "KVCache":
        shape = (num_layers, batch, max_len, num_kv_heads, head_dim)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            seg=jnp.zeros((batch, max_len), jnp.int32),
            lev=jnp.zeros((batch, max_len), jnp.int32),
            length=jnp.zeros((), jnp.int32),
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def write_meta(self, seg_ids: jax.Array, levels=None) -> "KVCache":
        """Record segment ids (+ optional levels) for the next `S` slots
        (call once per step).

        With per-row `length` ([B]) every row writes at its own offset and
        only rows whose incoming seg ids are nonzero advance — an inactive
        engine slot (seg 0) neither pollutes its metadata nor drifts.
        """
        s = seg_ids.shape[1]
        if self.length.ndim == 1:
            # Per-row offsets advance by the count of NONZERO incoming seg
            # ids while the kv/meta writes are S contiguous slots, so the
            # caller contract for S>1 is: each row's nonzero seg ids must be
            # a contiguous PREFIX of the S slots (all-or-nothing per row in
            # practice). The engine's speculative decode step writes full
            # [B, K+1] blocks for alive rows and all-zero rows for dead
            # ones, then rolls `length` back to base+accepted itself
            # (serve/engine.py); interior padding would desynchronize the
            # offsets and is a caller bug.
            new_seg = _write_rows_2d(self.seg, seg_ids, self.length)
            new_lev = self.lev
            if levels is not None:
                new_lev = _write_rows_2d(
                    self.lev, levels.astype(jnp.int32), self.length
                )
            advance = jnp.sum((seg_ids != 0).astype(jnp.int32), axis=1)
            return self.replace(seg=new_seg, lev=new_lev,
                                length=self.length + advance)
        new_seg = jax.lax.dynamic_update_slice(self.seg, seg_ids, (0, self.length))
        new_lev = self.lev
        if levels is not None:
            new_lev = jax.lax.dynamic_update_slice(
                self.lev, levels.astype(jnp.int32), (0, self.length)
            )
        return self.replace(seg=new_seg, lev=new_lev, length=self.length + s)

    # kept for callers written against the round-1 API
    def write_seg(self, seg_ids: jax.Array) -> "KVCache":
        return self.write_meta(seg_ids)


def _write_rows_2d(buf: jax.Array, new: jax.Array, offsets: jax.Array) -> jax.Array:
    """buf [B, max] <- new [B, S] at per-row positions offsets [B]."""
    return jax.vmap(
        lambda b, n, o: jax.lax.dynamic_update_slice(b, n, (o,))
    )(buf, new, offsets)


def write_kv(buf: jax.Array, new: jax.Array, offset: jax.Array) -> jax.Array:
    """buf [B, max, KVH, D] <- new [B, S, KVH, D] at position `offset`.

    A rank-1 offset ([B]) writes each row at its own position (the
    continuous-batching decode path)."""
    new = new.astype(buf.dtype)
    if getattr(offset, "ndim", 0) == 1:
        return jax.vmap(
            lambda b, n, o: jax.lax.dynamic_update_slice(b, n, (o, 0, 0))
        )(buf, new, offset)
    return jax.lax.dynamic_update_slice(buf, new, (0, offset, 0, 0))
