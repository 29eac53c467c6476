"""XLA-level ops shared by models: norms, rotary, pixel-shuffle, masks.

These are the numerics-bearing primitives; each matches the reference's
behavior (fp32 statistics inside bf16 flows) so golden tests can hold tight
tolerances. Hot paths get Pallas implementations in kernels/flash_attention.py
and kernels/rmsnorm.py; everything here is the always-correct XLA fallback that
XLA already fuses well.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rms_norm(
    x: jax.Array, weight: jax.Array, eps: float = 1e-6, plus_one: bool = False
) -> jax.Array:
    """RMSNorm with fp32 statistics (modeling_intern_vit.py:99-111 semantics).
    plus_one: Gemma convention, scale by (1 + weight)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    w = weight + 1.0 if plus_one else weight
    return (w * xf.astype(dtype)).astype(dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-6
) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * weight + bias).astype(dtype)


# ---------------------------------------------------------------------------
# Rotary position embeddings (Qwen2 / NeoX rotate-half convention)
# ---------------------------------------------------------------------------


def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables in fp32. positions [..., S] -> [..., S, head_dim]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., S, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rope_cos_sin_su(
    positions: jax.Array,
    head_dim: int,
    theta: float,
    short_factor,
    long_factor,
    original_max_position: int,
    max_position: int,
) -> Tuple[jax.Array, jax.Array]:
    """Phi3 su/longrope-scaled rotary (modeling_phi3.py:139-178): per-frequency
    extension factors (short within the original context, long beyond) and a
    sqrt(1 + ln(scale)/ln(orig)) amplitude on cos/sin when extended."""
    idx = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    base = theta**idx
    short = jnp.asarray(short_factor, jnp.float32)
    long = jnp.asarray(long_factor, jnp.float32)
    use_long = (jnp.max(positions) + 1) > original_max_position
    ext = jnp.where(use_long, long, short)
    inv_freq = 1.0 / (ext * base)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    scale = max_position / original_max_position
    scaling = (
        math.sqrt(1 + math.log(scale) / math.log(original_max_position))
        if scale > 1.0
        else 1.0
    )
    return jnp.cos(emb) * scaling, jnp.sin(emb) * scaling


def apply_rope(
    x: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """x [B, S, H, D]; cos/sin [B, S, D] (or [S, D])."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if cos.ndim == x.ndim - 1:
        cos = cos[..., :, None, :]
        sin = sin[..., :, None, :]
    half = x.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos + rotated * sin).astype(dtype)


# ---------------------------------------------------------------------------
# Pixel shuffle (InternVL token reduction; modeling_internvl_chat.py:257-272)
# ---------------------------------------------------------------------------


def pixel_shuffle(x: jax.Array, scale_factor: float = 0.5, version: str = "v2") -> jax.Array:
    """[N, W, H, C] -> [N, H*s, W*s, C/s^2] with InternVL's permute order."""
    n, w, h, c = x.shape
    x = x.reshape(n, w, int(h * scale_factor), int(c / scale_factor))
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(
        n, int(h * scale_factor), int(w * scale_factor), int(c / (scale_factor**2))
    )
    if version == "v2":
        x = jnp.transpose(x, (0, 2, 1, 3))
    return x


# ---------------------------------------------------------------------------
# Reference attention (pure XLA). Pallas flash attention mirrors this mask
# semantics; tests assert equivalence.
# ---------------------------------------------------------------------------

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def make_attention_mask(
    *,
    batch: int,
    q_len: int,
    kv_len: int,
    causal: bool = False,
    q_offset: int | jax.Array = 0,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    q_levels: Optional[jax.Array] = None,
    kv_levels: Optional[jax.Array] = None,
    kv_valid: Optional[jax.Array] = None,
    window: Optional[int] = None,
) -> Optional[jax.Array]:
    """Boolean [B, Sq, Skv] mask (True = attend) from composable rules.

    - causal: global q position (q_offset + i) >= kv position j.
      q_offset may be a [B] vector (per-row fill depths — the engine's
      multi-token speculative decode step); the mask is then built per row.
    - segment ids: equal ids attend; id 0 is padding (masked as K)
    - levels: kv_level <= q_level — encodes the VLA block mask
      (pizero_internvl.py:517-587): img/text=0, proprio=1, action=2
    - kv_valid: explicit padding mask over keys
    """
    allowed = None

    def _and(a, b):
        return b if a is None else jnp.logical_and(a, b)

    if causal or window is not None:
        if getattr(q_offset, "ndim", 0) == 1:
            # per-row offsets: [B, Sq, 1] global q positions
            qpos = q_offset[:, None, None] + jnp.arange(q_len)[None, :, None]
            kpos = jnp.arange(kv_len)[None, None, :]
        else:
            qpos = (q_offset + jnp.arange(q_len)[:, None])[None]
            kpos = jnp.arange(kv_len)[None, None, :]
        if causal:
            allowed = _and(allowed, qpos >= kpos)
        if window is not None:
            # flash-attn left-window: k allowed iff q_pos - k_pos <= window
            allowed = _and(allowed, qpos - kpos <= window)
    if q_segment_ids is not None or kv_segment_ids is not None:
        assert q_segment_ids is not None and kv_segment_ids is not None
        same = q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]
        same = jnp.logical_and(same, (kv_segment_ids != 0)[:, None, :])
        allowed = _and(allowed, same)
    if q_levels is not None or kv_levels is not None:
        assert q_levels is not None and kv_levels is not None
        ok = kv_levels[:, None, :] <= q_levels[:, :, None]
        allowed = _and(allowed, ok)
    if kv_valid is not None:
        allowed = _and(allowed, kv_valid[:, None, :])
    if allowed is not None and allowed.shape[0] == 1 and batch > 1:
        allowed = jnp.broadcast_to(allowed, (batch, q_len, kv_len))
    return allowed


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    softcap: Optional[float] = None,
) -> jax.Array:
    """q [B, Sq, H, D], k/v [B, Skv, KVH, D] (GQA), mask [B, Sq, Skv] bool.

    fp32 softmax regardless of input dtype (flash-attn semantics).
    """
    b, sq, h, d = q.shape
    kvh = k.shape[2]
    assert h % kvh == 0
    groups = h // kvh
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    qf = qf.reshape(b, sq, kvh, groups, d)
    logits = jnp.einsum("bqkgd,bskd->bkgqs", qf, kf)
    if softcap is not None:
        # Gemma tanh soft-clamp (joint_model.py:368-371)
        logits = softcap * jnp.tanh(logits / softcap)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkgqs,bskd->bqkgd", probs, vf)
    return out.reshape(b, sq, h, d).astype(q.dtype)


def _cubic_weight(x: float, a: float = -0.75) -> float:
    ax = abs(x)
    if ax <= 1.0:
        return (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0
    if ax < 2.0:
        return a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a
    return 0.0


def bicubic_resize_matrix(n_in: int, n_out: int) -> "np.ndarray":
    """Torch-parity bicubic (a=-0.75, align_corners=False, border-replicate)
    as a dense [n_out, n_in] interpolation matrix.

    torch.nn.functional.interpolate(mode='bicubic') uses the Keys kernel with
    a=-0.75 (jax.image.resize uses a=-0.5), so pos-emb interpolation
    (modeling_intern_vit.py:154-174) must NOT go through jax.image.resize if
    real-weight parity at non-native resolutions matters. Static matrices keep
    this a pair of matmuls under jit.
    """
    import numpy as np

    m = np.zeros((n_out, n_in), np.float64)
    scale = n_in / n_out
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        x0 = math.floor(x)
        for t in range(-1, 3):
            idx = x0 + t
            w = _cubic_weight(x - idx)
            m[i, min(max(idx, 0), n_in - 1)] += w
    return m.astype(np.float32)


def bicubic_resize_2d(grid: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """[B, H, W, C] -> [B, out_h, out_w, C], torch-bicubic parity, fp32."""
    h, w = grid.shape[1], grid.shape[2]
    mh = jnp.asarray(bicubic_resize_matrix(h, out_h))
    mw = jnp.asarray(bicubic_resize_matrix(w, out_w))
    g = grid.astype(jnp.float32)
    g = jnp.einsum("oh,bhwc->bowc", mh, g)
    return jnp.einsum("pw,bowc->bopc", mw, g)
