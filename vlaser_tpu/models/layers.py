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


class Dense(nn.Module):
    """nn.Dense with explicit dtypes; kernel layout [in, out] (HF weight.T)."""

    features: int
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            self.param_dtype,
        )
        y = jnp.dot(
            x.astype(self.compute_dtype),
            kernel.astype(self.compute_dtype),
            preferred_element_type=self.compute_dtype,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            y = y + bias.astype(y.dtype)
        return y
