"""Dtype policy: bf16 compute on the MXU, fp32 params/accumulation.

The reference trains bf16 with fp32 master weights via DeepSpeed and evaluates
the VLA in fp32 (slurm/eval_simpler_bridge.sh `use_bf16: False`). On TPU we
keep params in fp32 (or bf16 for serving), cast activations to bf16 at matmul
boundaries, and run softmax/normalization statistics in fp32.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # softmax / norm statistics always fp32 inside kernels

    def cast_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_param(self, x):
        return jnp.asarray(x, self.param_dtype)


DEFAULT = Policy()
SERVE_BF16 = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
TRAIN = Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)
FP32 = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
