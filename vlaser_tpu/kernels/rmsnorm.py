"""Fused RMSNorm Pallas kernel (forward + custom VJP).

Replaces apex FusedRMSNorm / liger-kernel RMSNorm (SURVEY.md §2.9.2;
modeling_intern_vit.py:113-124, internvl_chat_finetune.py:884-890). One HBM
pass per direction: rows stream through VMEM, statistics in fp32. The
backward fuses dx and accumulates dw across row blocks in a revisited output
block (TPU grids are sequential, so the accumulation is race-free).

XLA already fuses the naive rms_norm well; `rms_norm(impl="auto")` keeps the
XLA path unless measurements for a shape say otherwise — the kernel exists so
the fused op is first-party, benchmarkable, and tunable.

Math (y = w * x / rms, rms = sqrt(mean(x^2) + eps)):
  dx = (g*w)/rms - x * sum(g*w*x, -1) / (H * rms^3)
  dw = sum_rows g * x / rms
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import ops


def _fwd_kernel(x_ref, w_ref, y_ref, rrms_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    rrms = jax.lax.rsqrt(var + eps)
    w = w_ref[:].astype(jnp.float32)
    y_ref[:] = (x * rrms * w[None, :]).astype(y_ref.dtype)
    rrms_ref[:] = rrms


def _bwd_kernel(x_ref, w_ref, g_ref, rrms_ref, dx_ref, dw_ref, *, hidden):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)
    rrms = rrms_ref[:]  # [bs, 1]
    gw = g * w[None, :]
    dot = jnp.sum(gw * x, axis=-1, keepdims=True)
    dx = gw * rrms - x * (dot * rrms**3 / hidden)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dw_ref[:] = dw_ref[:] + jnp.sum(g * x * rrms, axis=0, keepdims=True)


def _pad_rows(x, block):
    pad = (-x.shape[0]) % block
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


@functools.partial(jax.jit, static_argnames=("eps", "block", "interpret"))
def _rms_fwd(x2, w, eps, block, interpret):
    n, h = x2.shape
    xp = _pad_rows(x2, block)
    grid = (xp.shape[0] // block,)
    y, rrms = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, h), lambda i: (i, 0)),
            pl.BlockSpec((h,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((block, h), lambda i: (i, 0)),
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xp.shape, x2.dtype),
            jax.ShapeDtypeStruct((xp.shape[0], 1), jnp.float32),
        ],
        interpret=interpret,
    )(xp, w)
    return y[:n], rrms[:n]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _rms_bwd(x2, w, g2, rrms, block, interpret):
    n, h = x2.shape
    xp, gp = _pad_rows(x2, block), _pad_rows(g2, block)
    rp = _pad_rows(rrms, block)
    grid = (xp.shape[0] // block,)
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, hidden=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, h), lambda i: (i, 0)),
            pl.BlockSpec((h,), lambda i: (0,)),
            pl.BlockSpec((block, h), lambda i: (i, 0)),
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block, h), lambda i: (i, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),  # revisited accumulator
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xp.shape, x2.dtype),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ],
        interpret=interpret,
    )(xp, w, gp, rp)
    return dx[:n], dw[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_rms_norm(x, w, eps: float = 1e-6, block: int = 256,
                   interpret: bool = False):
    """x [..., H], w [H] -> RMSNorm(x) * w (no plus-one variant)."""
    shape = x.shape
    y, _ = _rms_fwd(x.reshape(-1, shape[-1]), w, eps, block, interpret)
    return y.reshape(shape)


def _fused_fwd(x, w, eps, block, interpret):
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    y, rrms = _rms_fwd(x2, w, eps, block, interpret)
    return y.reshape(shape), (x2, w, rrms, shape)


def _fused_bwd(eps, block, interpret, res, g):
    x2, w, rrms, shape = res
    dx, dw = _rms_bwd(x2, w, g.reshape(-1, shape[-1]), rrms, block, interpret)
    return dx.reshape(shape), dw.astype(w.dtype)


fused_rms_norm.defvjp(_fused_fwd, _fused_bwd)


def rms_norm(x, w, eps: float = 1e-6, impl: str = "auto",
             interpret: bool = False):
    """Dispatcher. Measured on v5e (bf16 rows x hidden):
      385x1536: xla 39us / pallas 49us; 8192x1536: xla 144us / pallas 56us;
      8192x4096: xla 213us / pallas 364us (block 256 VMEM pressure).
    -> Pallas for many rows at moderate hidden (the packed-SFT shape)."""
    if impl == "auto":
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        h = x.shape[-1]
        on_tpu = jax.default_backend() == "tpu"
        impl = "pallas" if (on_tpu and rows >= 2048 and h <= 2048) else "reference"
    if impl == "pallas":
        return fused_rms_norm(x, w, eps, 256, interpret)
    return ops.rms_norm(x, w, eps)
