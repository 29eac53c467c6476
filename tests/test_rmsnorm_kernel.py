"""Fused RMSNorm Pallas kernel vs the XLA reference (values + gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.kernels import ops
from vlaser_tpu.kernels.rmsnorm import fused_rms_norm


@pytest.mark.parametrize("shape", [(2, 5, 256), (3, 128)])
def test_forward_matches(shape):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, shape)
    w = jax.random.normal(jax.random.PRNGKey(1), (shape[-1],)) * 0.1 + 1.0
    got = fused_rms_norm(x, w, 1e-6, 8, True)
    want = ops.rms_norm(x, w, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match():
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (4, 17, 128))
    w = jax.random.normal(jax.random.PRNGKey(3), (128,)) * 0.1 + 1.0
    tgt = jax.random.normal(jax.random.PRNGKey(4), x.shape)

    def loss_fused(x, w):
        return jnp.sum((fused_rms_norm(x, w, 1e-6, 8, True) - tgt) ** 2)

    def loss_ref(x, w):
        return jnp.sum((ops.rms_norm(x, w, 1e-6) - tgt) ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)
