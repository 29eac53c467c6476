"""Fused ViT encoder stack: the whole InternViT layer loop in ONE
pallas_call (batch-1 serving prefill).

Why: at batch 1 the 24-layer InternViT-300M pass measures ~6.7 ms on v5e
vs a ~3.5 ms MXU roofline — the gap is XLA's separate elementwise/reduce
fusions between the matmuls (profiled: ~80 us/layer of LayerNorm stats,
residual+layerscale adds, and layout copies; docs/STATUS.md). This kernel
keeps the activations VMEM-resident across the whole stack, computes the
norms/residuals in-register between MXU ops, and double-buffers each
layer's bf16 weights (~25 MB) against the previous layer's compute.

Semantics match models/internvit.InternVisionLayer exactly (parity-tested):
pre-LN blocks with layer-scale, fused-QKV projection, full-hidden
QK-RMSNorm (modeling_intern_vit.py:216-219), non-causal 16-head attention,
exact-erf GELU MLP. LayerNorm statistics and softmax run in fp32; matmuls
accumulate fp32 and round to bf16 like models/layers.Dense.

Scope: one fixed sequence (448px tile -> 1025 tokens), select_layer=-1
(the Vlaser-2B serving config); training and other select_layers stay on
the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# DMA semaphores: qkv, proj, fc1, fc2 x 2 slots
SEM_N = 8


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * w.astype(jnp.float32) + b.astype(jnp.float32)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)


def _erf(x):
    """erf for the exact-GELU: Mosaic has no erf primitive, so use the
    Abramowitz & Stegun 7.1.26 rational approximation (|error| <= 1.5e-7 —
    far inside bf16 activation noise; parity-tested vs jax.lax.erf)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _make_kernel(*, L, S, hidden, inter, heads, head_dim, eps, qk_norm):
    assert heads * head_dim == hidden

    def kernel(
        x_ref,
        ln1w_ref, ln1b_ref, ln2w_ref, ln2b_ref, ls1_ref, ls2_ref,
        qnw_ref, knw_ref,
        qkvb_ref, projb_ref, fc1b_ref, fc2b_ref,
        qkvw_ref, projw_ref, fc1w_ref, fc2w_ref,  # HBM [L, ...] bf16
        xo_ref,
        x_s,       # [S, hidden] bf16 residual stream
        w_qkv,     # [2, hidden, 3*hidden] bf16
        w_proj,    # [2, hidden, hidden]
        w_fc1,     # [2, hidden, inter]
        w_fc2,     # [2, inter, hidden]
        sem,
    ):
        x_s[...] = x_ref[...]

        def copies(l, slot):
            return (
                pltpu.make_async_copy(qkvw_ref.at[l], w_qkv.at[slot],
                                      sem.at[4 * slot + 0]),
                pltpu.make_async_copy(projw_ref.at[l], w_proj.at[slot],
                                      sem.at[4 * slot + 1]),
                pltpu.make_async_copy(fc1w_ref.at[l], w_fc1.at[slot],
                                      sem.at[4 * slot + 2]),
                pltpu.make_async_copy(fc2w_ref.at[l], w_fc2.at[slot],
                                      sem.at[4 * slot + 3]),
            )

        for c in copies(0, 0):
            c.start()

        def dot(a, w):
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def layer_body(l, _):
            slot = jax.lax.rem(l, 2)
            for c in copies(l, slot):
                c.wait()
            # next layer's weights stream under this layer's compute
            @pl.when(l + 1 < L)
            def _():
                for c in copies(l + 1, 1 - slot):
                    c.start()

            x = x_s[...]
            h = _layer_norm(x, ln1w_ref[l], ln1b_ref[l], eps)
            qkv = dot(h, w_qkv[slot]) + qkvb_ref[l].astype(jnp.float32)
            q, k = qkv[:, :hidden], qkv[:, hidden : 2 * hidden]
            if qk_norm:
                # full-flattened-dim QK-RMSNorm (the 6B variant;
                # modeling_intern_vit.py:216-219). 300M: off.
                q = _rms(q, qnw_ref[l], eps)
                k = _rms(k, knw_ref[l], eps)
            v = qkv[:, 2 * hidden :].astype(jnp.bfloat16)

            scale = head_dim**-0.5
            outs = []
            for hd in range(heads):
                sl = slice(hd * head_dim, (hd + 1) * head_dim)
                qh = (q[:, sl] * scale).astype(jnp.bfloat16)
                kh = k[:, sl].astype(jnp.bfloat16)
                s_ = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [S, S]
                p = jax.nn.softmax(s_, axis=-1).astype(jnp.bfloat16)
                outs.append(
                    jax.lax.dot_general(
                        p, v[:, sl], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.bfloat16)
                )
            attn = jnp.concatenate(outs, axis=1)

            o = dot(attn, w_proj[slot]) + projb_ref[l].astype(jnp.float32)
            x = (
                x.astype(jnp.float32)
                + o.astype(jnp.bfloat16).astype(jnp.float32)
                * ls1_ref[l].astype(jnp.float32)
            ).astype(jnp.bfloat16)

            h2 = _layer_norm(x, ln2w_ref[l], ln2b_ref[l], eps)
            m = dot(h2, w_fc1[slot]) + fc1b_ref[l].astype(jnp.float32)
            # exact-erf GELU (reference nn.GELU; parity with the XLA path)
            m = 0.5 * m * (1.0 + _erf(m * (2.0**-0.5)))
            m2 = dot(m.astype(jnp.bfloat16), w_fc2[slot]) \
                + fc2b_ref[l].astype(jnp.float32)
            x_s[...] = (
                x.astype(jnp.float32)
                + m2.astype(jnp.bfloat16).astype(jnp.float32)
                * ls2_ref[l].astype(jnp.float32)
            ).astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, L, layer_body, 0, unroll=False)
        xo_ref[...] = x_s[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "qk_norm",
                                              "interpret"))
def fused_vit_stack(
    x,  # [S, hidden] bf16 (embeddings + pos, CLS included)
    ln1w, ln1b, ln2w, ln2b, ls1, ls2, qnw, knw,
    qkvb, projb, fc1b, fc2b,
    qkvw, projw, fc1w, fc2w,  # [L, ...] bf16
    num_heads: int = 16,  # InternViT-300M (modeling_intern_vit.py:177)
    eps: float = 1e-6,
    qk_norm: bool = False,
    interpret: bool = False,
):
    """-> x_out [S, hidden] bf16 after the full L-layer stack."""
    S, hidden = x.shape
    L = qkvw.shape[0]
    inter = fc1w.shape[-1]
    heads = num_heads
    head_dim = hidden // heads

    kernel = _make_kernel(
        L=L, S=S, hidden=hidden, inter=inter, heads=heads,
        head_dim=head_dim, eps=eps, qk_norm=qk_norm,
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pltpu.ANY)
    return pl.pallas_call(
        kernel,
        in_specs=[vmem()] * 13 + [hbm()] * 4,
        out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((S, hidden), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((S, hidden), jnp.bfloat16),
            pltpu.VMEM((2, hidden, 3 * hidden), jnp.bfloat16),
            pltpu.VMEM((2, hidden, hidden), jnp.bfloat16),
            pltpu.VMEM((2, hidden, inter), jnp.bfloat16),
            pltpu.VMEM((2, inter, hidden), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((SEM_N,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x, ln1w, ln1b, ln2w, ln2b, ls1, ls2, qnw, knw,
        qkvb, projb, fc1b, fc2b, qkvw, projw, fc1w, fc2w,
    )


def pack_vit_stack(variables, dtype=jnp.bfloat16):
    """InternVisionModel scanned params -> fused kernel layout. The nn.scan
    layout already stacks every per-layer tensor on [L]; this is dict
    plumbing plus dtype casts (ViT weights stay bf16 — the pass is
    MXU-bound, int8 is measured-neutral; docs/STATUS.md)."""
    enc = variables["params"]["vision_model"]["encoder"] \
        if "vision_model" in variables["params"] \
        else variables["params"]["encoder"]
    att = enc["attn"]
    L, hidden = enc["norm1"]["weight"].shape
    # 300M has no QK-norm (qk_normalization=False) — pass ones; the kernel
    # skips the normalization entirely when qk_norm=False
    ones = jnp.ones((L, hidden), jnp.float32)
    return dict(
        ln1w=enc["norm1"]["weight"].astype(jnp.float32),
        ln1b=enc["norm1"]["bias"].astype(jnp.float32),
        ln2w=enc["norm2"]["weight"].astype(jnp.float32),
        ln2b=enc["norm2"]["bias"].astype(jnp.float32),
        ls1=enc["ls1"].astype(jnp.float32),
        ls2=enc["ls2"].astype(jnp.float32),
        qnw=(att["q_norm"]["weight"].astype(jnp.float32)
             if "q_norm" in att else ones),
        knw=(att["k_norm"]["weight"].astype(jnp.float32)
             if "k_norm" in att else ones),
        qkvb=att["qkv"]["bias"].astype(jnp.float32),
        projb=att["proj"]["bias"].astype(jnp.float32),
        fc1b=enc["mlp"]["fc1"]["bias"].astype(jnp.float32),
        fc2b=enc["mlp"]["fc2"]["bias"].astype(jnp.float32),
        qkvw=att["qkv"]["kernel"].astype(dtype),
        projw=att["proj"]["kernel"].astype(dtype),
        fc1w=enc["mlp"]["fc1"]["kernel"].astype(dtype),
        fc2w=enc["mlp"]["fc2"]["kernel"].astype(dtype),
    )
