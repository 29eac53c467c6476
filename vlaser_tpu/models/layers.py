"""Shared flax building blocks with HF-compatible parameter naming."""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from ..kernels import ops


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32
    plus_one: bool = False  # Gemma: scale by (1 + weight), zero-init param

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.plus_one else nn.initializers.ones
        weight = self.param("weight", init, (self.dim,), self.param_dtype)
        if self.plus_one:
            return ops.rms_norm(x, weight.astype(x.dtype), self.eps, True)
        from ..kernels.rmsnorm import rms_norm as fused

        return fused(x, weight.astype(x.dtype), self.eps)


class LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), self.param_dtype)
        return ops.layer_norm(x, weight.astype(jnp.float32), bias.astype(jnp.float32), self.eps)


# Minimum static row count (product of batch/seq dims) for a kernel_aq-
# flagged Dense to take the int8-MXU w8a8 path; below it, weight-only
# streaming wins (GEMV regime, measured in docs/STATUS.md).
ACT_QUANT_MIN_ROWS = 128


@jax.custom_vjp
def w8a8_dot(x, kq, ks):
    """Per-token symmetric int8 activation quant -> int8 MXU dot (2x bf16
    peak on v5e) -> fp32 rescale: y ~= x @ (kq * ks), returned fp32.

    custom_vjp (straight-through estimator): the naive autodiff gradient
    through jnp.round is zero everywhere — backprop through a w8a8 layer
    would silently cut the gradient to every upstream layer. The STE
    backward is the dequantized-path gradient dx = g @ (kq*ks)^T computed
    in g's dtype (bf16 in training), i.e. exactly the weight-only path's
    activation gradient — which makes w8a8 usable as a TRAINING forward
    (w8a8-fwd / bf16-bwd; the quantized kernel itself is frozen in QLoRA,
    so no weight cotangent is needed and the returned zeros are DCE'd).
    """
    xf = x.astype(jnp.float32)
    am = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-9)
    qa = jnp.round(xf * (127.0 / am)).astype(jnp.int8)
    o = jax.lax.dot_general(
        qa, kq, (((qa.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (o.astype(jnp.float32) * (am * (1.0 / 127.0))
            * ks.astype(jnp.float32))


def _w8a8_dot_fwd(x, kq, ks):
    # zero-size dtype token: residuals must be JAX types, and only x's
    # dtype is needed for the backward
    return w8a8_dot(x, kq, ks), (jnp.zeros((0,), jnp.asarray(x).dtype),
                                 kq, ks)


def _w8a8_dot_bwd(res, g):
    # backward runs in the layer's compute dtype (x's dtype): bf16 in
    # training — the fp32 cotangent of the rescaled output would otherwise
    # drag the whole backward dot to fp32 (2x the MXU cost)
    x_tok, kq, ks = res
    x_dtype = x_tok.dtype
    w = kq.astype(x_dtype) * ks.astype(x_dtype)  # [in, out]
    dx = jax.lax.dot_general(
        g.astype(x_dtype), w, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x_dtype,
    )
    return dx, jnp.zeros_like(kq), jnp.zeros_like(ks)


w8a8_dot.defvjp(_w8a8_dot_fwd, _w8a8_dot_bwd)


class Dense(nn.Module):
    """nn.Dense with explicit dtypes; kernel layout [in, out] (HF weight.T).

    If an int8 kernel is present in the `quant` collection (produced by
    core/quant.quantize_variables), it is dequantized inline — XLA fuses the
    int8->bf16 convert+scale into the dot's HBM read, halving streamed bytes
    (the weight-only-quant serving path; measured 1.65x on the denoise step).
    """

    features: int
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = None
        if self.has_variable("quant", "kernel_q"):
            kq = self.get_variable("quant", "kernel_q")
            ks = self.get_variable("quant", "kernel_scale")
            rows = 1
            for d in x.shape[:-1]:
                rows *= d
            if self.has_variable("quant", "kernel_aq") and \
                    rows >= ACT_QUANT_MIN_ROWS:
                # w8a8: per-token symmetric int8 activations -> int8 MXU
                # dot (2x bf16 peak on v5e) -> fp32 rescale. Flagged
                # kernels only (core/quant act_quant_patterns), and only
                # at large-row call sites — 1..8-row decode/denoise GEMVs
                # are weight-streaming-bound, where the dequantize-inline
                # path below measures faster (docs/STATUS.md). The rows
                # check is on STATIC shapes, so each call site traces one
                # consistent mode. w8a8_dot carries an STE custom_vjp, so
                # this branch is also the TRAINING forward for w8a8 SFT
                # (train/trainer.py quant_forward="w8a8").
                y = w8a8_dot(
                    x.astype(self.compute_dtype), kq, ks
                ).astype(self.compute_dtype)
            else:
                kernel = kq.astype(self.compute_dtype) \
                    * ks.astype(self.compute_dtype)
        else:
            kernel = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (x.shape[-1], self.features),
                self.param_dtype,
            ).astype(self.compute_dtype)
        if y is None:
            y = jnp.dot(
                x.astype(self.compute_dtype),
                kernel,
                preferred_element_type=self.compute_dtype,
            )
        if self.has_variable("lora", "a"):
            # QLoRA-style activation-path low-rank adapter: y += s*(x A)B.
            # Never materializes base+delta, so it composes with the int8
            # base above (train/lora.py init_qlora_collection).
            a = self.get_variable("lora", "a").astype(self.compute_dtype)
            b = self.get_variable("lora", "b").astype(self.compute_dtype)
            # alpha/r is folded into `a` at init (scalars can't ride a
            # scanned collection)
            y = y + jnp.dot(
                jnp.dot(x.astype(self.compute_dtype), a,
                        preferred_element_type=self.compute_dtype),
                b, preferred_element_type=self.compute_dtype,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            y = y + bias.astype(y.dtype)
        return y


class Embed(nn.Module):
    """Token embedding with the nn.Embed param layout ('embedding' [V, H])
    plus a quant-aware logits matmul (`attend`) for tied-weight decode.

    The tied logits matmul streams the full [V, H] table every decode step —
    per-row int8 (core/quant.quantize_variables) halves that traffic; lookups
    gather int8 rows + their scales.
    """

    num_embeddings: int
    features: int
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.bfloat16

    def _quant(self):
        if self.has_variable("quant", "embedding_q"):
            return (
                self.get_variable("quant", "embedding_q"),
                self.get_variable("quant", "embedding_scale"),
            )
        return None

    @nn.compact
    def __call__(self, ids):
        q = self._quant()
        if q is not None:
            eq, es = q  # [V, H] int8, [V, 1] f32
            rows = jnp.take(eq, ids, axis=0).astype(self.dtype)
            sc = jnp.take(es, ids, axis=0).astype(self.dtype)
            return rows * sc
        emb = self.param(
            "embedding",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal", out_axis=0),
            (self.num_embeddings, self.features),
            self.param_dtype,
        )
        return jnp.take(emb, ids, axis=0).astype(self.dtype)

    def attend(self, hidden):
        """hidden [..., H] -> logits [..., V] against the (tied) table."""
        q = self._quant()
        if q is not None:
            eq, es = q
            y = jnp.dot(
                hidden.astype(self.dtype), eq.T.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            return y * es[:, 0].astype(jnp.float32)
        emb = self.get_variable("params", "embedding")
        return jnp.dot(
            hidden.astype(self.dtype), emb.T.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )


class AdaptiveRMSNorm(nn.Module):
    """Time-conditioned RMSNorm (adaLN): norm(x) * sigmoid(W_g cond) + W_b cond
    (src/model/vla/modules.py:78-99)."""

    dim: int
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cond):
        from ..kernels import ops

        normed = ops.rms_norm(x, jnp.ones((self.dim,), x.dtype), self.eps)
        if cond.ndim == 2:
            cond = cond[:, None, :]
        gamma = jax.nn.sigmoid(
            Dense(self.dim, use_bias=True, param_dtype=self.param_dtype,
                  compute_dtype=self.compute_dtype, name="to_gamma")(cond)
        )
        beta = Dense(self.dim, use_bias=False, param_dtype=self.param_dtype,
                     compute_dtype=self.compute_dtype, name="to_beta")(cond)
        return normed * gamma.astype(normed.dtype) + beta.astype(normed.dtype)


class AdaptiveLayerscale(nn.Module):
    """adaLN-Zero residual gate: x * sigmoid(Linear(cond)), zero-init weight,
    bias -2 => gates open slowly from ~0.12 (modules.py:102-117)."""

    dim: int
    bias_init: float = -2.0
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cond):
        if cond.ndim == 2:
            cond = cond[:, None, :]
        kernel = self.param(
            "kernel", nn.initializers.zeros,
            (cond.shape[-1], self.dim), self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.constant(self.bias_init),
            (self.dim,), self.param_dtype,
        )
        gamma = (
            jnp.dot(cond.astype(self.compute_dtype),
                    kernel.astype(self.compute_dtype))
            + bias.astype(self.compute_dtype)
        )
        return x * jax.nn.sigmoid(gamma).astype(x.dtype)
