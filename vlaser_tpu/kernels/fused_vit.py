"""Fused ViT encoder stack: the whole InternViT layer loop in ONE
pallas_call (serving prefill, batch 1-8).

Why: the 24-layer InternViT-300M pass is far off its MXU roofline under
XLA — at batch 1 ~6.7 ms vs ~3.5 (separate elementwise/reduce fusions
between the matmuls), and at batch 8 ~79 ms vs ~24 (the same elementwise
now HBM-bound at 20 ms/pass, plus 26 ms of head_dim-64 attention
dispatches; profiled in docs/STATUS.md). This kernel keeps activations
VMEM-resident across the whole stack, computes norms/residuals/softmax
in-register between MXU ops, and double-buffers each layer's bf16 weights
(~25 MB) against the previous layer's compute.

Layout: samples are concatenated on the sublane axis — x is [B*Sp, hidden]
with each sample padded to Sp rows (16-aligned); attention runs per sample
over static row slices; padded K/V rows are zeroed and the softmax
denominator corrected in closed form (see _make_kernel). All per-sample
intermediates stay <= ~17 MB so B=8 fits VMEM alongside the weight
buffers.

Semantics match models/internvit.InternVisionLayer exactly (parity-tested):
pre-LN blocks with layer-scale, fused-QKV projection, optional full-hidden
QK-RMSNorm (modeling_intern_vit.py:216-219), non-causal multi-head
attention, exact-erf GELU (in-kernel polynomial erf — Mosaic has no erf
primitive; |err| <= 6e-6, see _gelu). LayerNorm statistics and softmax run
in fp32; matmuls accumulate fp32 and round to bf16 like models/layers.Dense.

Scope: fixed sequence per tile (448px -> 1025 tokens), select_layer=-1
(the Vlaser serving config); training and other select_layers stay on the
XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# DMA semaphores: qkv, proj, fc1, fc2 x 2 slots + activation in/out
SEM_N = 9


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


# Exact-GELU erf: erf(z) ~= z * P(t), t = 2 z^2/A^2 - 1, |z| clamped to A
# (erf(A) = 1 - 4.3e-6, so the clamp is exact to that). P is a degree-11
# Chebyshev least-squares fit evaluated by Horner in the shifted variable;
# measured fp32 |erf error| <= 6e-6 and GELU abs error <= 2.4e-5 over
# |x| < 8 (relative <= 1.8e-4 everywhere) — far inside bf16 activation
# rounding (~4e-3 relative). Replaces the previous A&S 7.1.26 rational
# form: pure multiply-add, no VPU reciprocal and no exp, measured ~2x
# cheaper in-kernel (the GELU ablation in scripts/profile_control_step.py).
_GELU_A = 3.25
_GELU_P = (
    0.43464031973696543, -0.21445103956175698, 0.15327205599486016,
    -0.1143730509310583, 0.082322492089922261, -0.055628370384091817,
    0.035289982881279394, -0.019862196034020164, 0.0090013830274342718,
    -0.0047249101491130107, 0.003507270815361369, -0.0013034086001326379,
)


def _gelu(x):
    """0.5 * x * (1 + erf(x / sqrt(2))) in fp32, division/exp-free."""
    z = jnp.clip(x * (2.0 ** -0.5), -_GELU_A, _GELU_A)
    t = z * z * (2.0 / (_GELU_A * _GELU_A)) - 1.0
    p = jnp.float32(_GELU_P[-1])
    for c in _GELU_P[-2::-1]:
        p = p * t + c
    return 0.5 * x * (1.0 + z * p)


def _make_kernel(*, L, B, S, Sp, hidden, inter, heads, head_dim, eps,
                 qk_norm, ablate=""):
    """`ablate` is a PROFILING-ONLY hook (scripts/profile_control_step.py)
    that voids one compute stage to locate where kernel time goes; every
    production call site passes the default "" (parity-gated on-chip in
    bench.py). Values: nogelu | nosoftmax | noattn."""
    assert heads * head_dim == hidden
    assert ablate in ("", "nogelu", "nosoftmax", "noattn")
    npad = Sp - S  # padded key rows per sample (B>1 only; 16-row alignment)

    def kernel(
        x_ref,          # [B*Sp, hidden] bf16 (HBM; DMA'd into x_s)
        ln1w_ref, ln1b_ref, ln2w_ref, ln2b_ref, ls1_ref, ls2_ref,
        qnw_ref, knw_ref,
        qkvb_ref, projb_ref, fc1b_ref, fc2b_ref,
        qkvw_ref, projw_ref, fc1w_ref, fc2w_ref,  # HBM [L, ...] bf16
        xo_ref,
        x_s,       # [B*Sp, hidden] bf16 residual stream
        w_qkv,     # [2, hidden, 3*hidden] bf16
        w_proj,    # [2, hidden, hidden]
        w_fc1,     # [2, hidden, inter]
        w_fc2,     # [2, inter, hidden]
        sem,
    ):
        # activations ride HBM<->VMEM DMAs so the in/out buffers don't
        # triple-count the [B*Sp, hidden] stream against the VMEM budget
        cp_in = pltpu.make_async_copy(x_ref, x_s, sem.at[SEM_N - 1])
        cp_in.start()

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
        cp_in.wait()

        def dot(a, w):
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # [Sp, 1] 1/0 row-validity mask: pad K/V rows are zeroed instead of
        # adding a NEG_INF [Sp, Sp] score mask — the denominator of the
        # softmax is then corrected analytically (see attention below),
        # turning an O(Sp^2)-per-head VPU add into an O(Sp*hidden) multiply
        # per sample-layer.
        if npad:
            vmask = (
                jax.lax.broadcasted_iota(jnp.int32, (Sp, 1), 0) < S
            ).astype(jnp.bfloat16)

        def layer_body(l, _):
            slot = jax.lax.rem(l, 2)
            for c in copies(l, slot):
                c.wait()
            # next layer's weights stream under this layer's compute
            @pl.when(l + 1 < L)
            def _():
                for c in copies(l + 1, 1 - slot):
                    c.start()

            # per-sample pipeline (the sample loop stays rolled — a python
            # loop over B explodes Mosaic compile time at B=8): every
            # intermediate stays [Sp, ...] so the f32 working set is
            # bounded regardless of B. Sp is 16-aligned so the dynamic
            # sublane starts are legal.
            def sample_body(b, _):
                rows = pl.ds(b * Sp, Sp)
                x = x_s[rows, :]
                h = _layer_norm(x, ln1w_ref[l], ln1b_ref[l], eps)
                qkv = dot(h, w_qkv[slot]) + qkvb_ref[l].astype(jnp.float32)
                q, k = qkv[:, :hidden], qkv[:, hidden : 2 * hidden]
                if qk_norm:
                    # full-flattened-dim QK-RMSNorm (the 6B variant;
                    # modeling_intern_vit.py:216-219). 300M: off.
                    q = _rms(q, qnw_ref[l], eps)
                    k = _rms(k, knw_ref[l], eps)
                scale = head_dim**-0.5

                # unrolled per-head attention with a 2-deep software
                # pipeline: head h+1's QK^T (MXU) is issued before head h's
                # softmax (VPU) so the units overlap. The head loop is
                # python-unrolled over static VALUE slices; only the sample
                # loop is rolled, so Mosaic compiles ONE body regardless of
                # B (the round-2 form staged qkv in VMEM and rolled the
                # heads at B>1 — measured ~5 ms slower per batch-8 pass than
                # this pipeline, and the freed staging buffers pay for the
                # two live [Sp, Sp] f32 score blocks, ~8.7 MB at Sp=1040).
                #
                # Padded key rows (B>1, Sp > S): K/V pad rows are zeroed,
                # so pads contribute exp(-m) each to the softmax denominator
                # (s_pad = q . 0 = 0) and nothing to the numerator
                # (v_pad = 0); the denominator subtracts npad * exp(-m) in
                # closed form — exact, no [Sp, Sp] score-mask add. The
                # divide stays on the probability matrix (NOT deferred to
                # the [Sp, head_dim] output): the deferred form keeps an
                # extra f32 [Sp, Sp] block live per pipelined head and
                # blows the 120 MB scoped-VMEM stack at B=1 (measured
                # 122.8 MB on v5e).
                qs = (q * scale).astype(jnp.bfloat16)
                ks = k.astype(jnp.bfloat16)
                vs = qkv[:, 2 * hidden :].astype(jnp.bfloat16)
                if npad:
                    ks = ks * vmask
                    vs = vs * vmask

                def qk(hd):
                    sl = slice(hd * head_dim, (hd + 1) * head_dim)
                    return jax.lax.dot_general(
                        qs[:, sl], ks[:, sl], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [Sp, Sp] f32

                def av(p, hd):
                    sl = slice(hd * head_dim, (hd + 1) * head_dim)
                    return jax.lax.dot_general(
                        p, vs[:, sl], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [Sp, head_dim] f32

                if ablate == "noattn":
                    attn = vs
                else:
                    outs = []
                    s_cur = qk(0)
                    for hd in range(heads):
                        s_nxt = qk(hd + 1) if hd + 1 < heads else None
                        if ablate == "nosoftmax":
                            p = (s_cur * 0.001).astype(jnp.bfloat16)
                            outs.append(av(p, hd).astype(jnp.bfloat16))
                        elif npad:
                            m = jnp.max(s_cur, axis=-1, keepdims=True)
                            e = jnp.exp(s_cur - m)
                            d = jnp.sum(e, axis=-1, keepdims=True) \
                                - npad * jnp.exp(-m)
                            p = (e / d).astype(jnp.bfloat16)
                            outs.append(av(p, hd).astype(jnp.bfloat16))
                        else:
                            # no pad rows: jax.nn.softmax lowers ~3% faster
                            # than the manual m/e/d form (measured at B=1)
                            p = jax.nn.softmax(s_cur, axis=-1).astype(
                                jnp.bfloat16
                            )
                            outs.append(av(p, hd).astype(jnp.bfloat16))
                        s_cur = s_nxt
                    attn = jnp.concatenate(outs, axis=1)

                o = dot(attn, w_proj[slot]) \
                    + projb_ref[l].astype(jnp.float32)
                x = (
                    x.astype(jnp.float32)
                    + o.astype(jnp.bfloat16).astype(jnp.float32)
                    * ls1_ref[l].astype(jnp.float32)
                ).astype(jnp.bfloat16)

                h2 = _layer_norm(x, ln2w_ref[l], ln2b_ref[l], eps)
                h2b = h2.astype(jnp.bfloat16)
                # batched: MLP in two inter-dim chunks — halves the peak
                # f32 working set (a full [Sp, inter] f32 value pushes
                # B=8 past VMEM); B=1 has headroom, keep it single-chunk
                n_chunks = 1 if B == 1 else 2
                half = inter // n_chunks
                m2 = fc2b_ref[l].astype(jnp.float32)
                for c in range(n_chunks):
                    ch = slice(c * half, (c + 1) * half)
                    m = jax.lax.dot_general(
                        h2b, w_fc1[slot][:, ch], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + fc1b_ref[l][ch].astype(jnp.float32)
                    # exact-erf GELU (reference nn.GELU; parity w/ XLA)
                    if ablate != "nogelu":
                        m = _gelu(m)
                    m2 = m2 + jax.lax.dot_general(
                        m.astype(jnp.bfloat16), w_fc2[slot][ch, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                x_s[rows, :] = (
                    x.astype(jnp.float32)
                    + m2.astype(jnp.bfloat16).astype(jnp.float32)
                    * ls2_ref[l].astype(jnp.float32)
                ).astype(jnp.bfloat16)
                return 0

            if B == 1:
                sample_body(0, 0)
            else:
                jax.lax.fori_loop(0, B, sample_body, 0)
            return 0

        jax.lax.fori_loop(0, L, layer_body, 0, unroll=False)
        cp_out = pltpu.make_async_copy(x_s, xo_ref, sem.at[SEM_N - 1])
        cp_out.start()
        cp_out.wait()

    return kernel


def _pad_rows(s: int) -> int:
    """bf16 sublane tile is 16 rows."""
    return ((s + 15) // 16) * 16


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "qk_norm",
                                              "interpret", "ablate"))
def fused_vit_stack(
    x,  # [B, S, hidden] or [S, hidden] bf16 (embeddings + pos, CLS incl.)
    ln1w, ln1b, ln2w, ln2b, ls1, ls2, qnw, knw,
    qkvb, projb, fc1b, fc2b,
    qkvw, projw, fc1w, fc2w,  # [L, ...] bf16
    num_heads: int = 16,  # InternViT-300M (modeling_intern_vit.py:177)
    eps: float = 1e-6,
    qk_norm: bool = False,
    interpret: bool = False,
    ablate: str = "",  # profiling only — see _make_kernel
):
    """-> x_out (same leading shape as x) after the full L-layer stack."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    B, S, hidden = x.shape
    # B=1 needs no row padding (the only sublane slice starts at 0);
    # batched samples pad to 16-aligned rows for the dynamic sample slices
    Sp = S if B == 1 else _pad_rows(S)
    L = qkvw.shape[0]
    inter = fc1w.shape[-1]
    heads = num_heads
    head_dim = hidden // heads

    xp = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0))).reshape(B * Sp, hidden)

    kernel = _make_kernel(
        L=L, B=B, S=S, Sp=Sp, hidden=hidden, inter=inter, heads=heads,
        head_dim=head_dim, eps=eps, qk_norm=qk_norm, ablate=ablate,
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pltpu.ANY)
    out = pl.pallas_call(
        kernel,
        in_specs=[hbm()] + [vmem()] * 12 + [hbm()] * 4,
        out_specs=hbm(),
        out_shape=jax.ShapeDtypeStruct((B * Sp, hidden), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((B * Sp, hidden), jnp.bfloat16),
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
        xp, ln1w, ln1b, ln2w, ln2b, ls1, ls2, qnw, knw,
        qkvb, projb, fc1b, fc2b, qkvw, projw, fc1w, fc2w,
    )
    out = out.reshape(B, Sp, hidden)[:, :S]
    return out[0] if squeeze else out


def supports_fused_vit(vision_cfg) -> bool:
    """Dispatch guard shared by every fused-ViT call site: the kernel
    implements LayerNorm-with-bias blocks and a biased fused-QKV (the
    300M/6B-448 InternViT layouts); rms_norm-block or bias-free variants
    stay on the XLA encoder."""
    return (getattr(vision_cfg, "norm_type", "layer_norm") == "layer_norm"
            and getattr(vision_cfg, "qkv_bias", True))


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
