"""Fused int8 decoder-stack kernel: the weight-streaming hot loop in ONE
pallas_call.

Both serving hot paths — VLM autoregressive decode and the VLA denoise
suffix — are HBM-bound GEMV chains over the whole layer stack. XLA's fused
dequant-dot path reaches ~568 GB/s on int8 weights while a raw Pallas
stream reaches ~743 GB/s on this chip (measured; docs/STATUS.md), so this
kernel owns the stream: weights stay int8 in HBM and every DMA is software-
pipelined against compute (measured v5e: decode-shape 653 GB/s vs XLA 568;
denoise-shape 574 GB/s, XLA parity) —

  - layer l+1's q/k/v/o matrices are prefetched while layer l runs its MLP,
  - gate/up tiles run with one-pair lookahead (4 rotating slots),
  - down tiles double-buffer,
  - the external K/V block loads under the q/k/v GEMVs.

R-row GEMVs (R = batch*tokens: 1 for decode, 4 for the denoise suffix) with
attention + norms + residuals computed in-kernel between them; one launch
per token / denoise step replaces ~200 XLA ops.

Scope: Qwen2-family layers (RMSNorm, q/k/v bias, GQA, rope, SiLU MLP),
non-causal attention over [external KV (additive-masked) | self block] —
decode (external = running cache window) and the VLA suffix (external =
prefix KV). New self K/V rows are returned; decode's cache append is a
cheap dynamic_update_slice outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(
        jnp.bfloat16
    )


def _rope(v, cos, sin):
    """v [R, H, D]; cos/sin [R, D] — rotate-half (kernels/ops.apply_rope)."""
    d = v.shape[-1]
    v1, v2 = v[..., : d // 2], v[..., d // 2 :]
    rot = jnp.concatenate([-v2, v1], axis=-1)
    return v * cos[:, None, :] + rot * sin[:, None, :]


# semaphore map
SEM_GU = (0, 1, 2, 3)   # gate/up pair slots
SEM_DOWN = (4, 5)
SEM_KV = (6, 7)
SEM_QKV = (8, 9, 10)    # q | k | v prefetch
SEM_O = 11


def _make_kernel(
    *, L, R, hidden, inter, heads, kv_heads, head_dim, ext_len, eps, mlp_tile,
):
    q_dim = heads * head_dim
    kv_dim = kv_heads * head_dim
    groups = heads // kv_heads
    n_mlp_tiles = inter // mlp_tile
    assert inter % mlp_tile == 0, (inter, mlp_tile)
    assert n_mlp_tiles == 1 or mlp_tile % 128 == 0, (
        f"mlp_tile {mlp_tile} must be lane-aligned (Mosaic dynamic-slice "
        "starts must be multiples of 128; a single tile always starts at 0)"
    )
    # single-tile MLP streams (the fastest configuration when VMEM allows:
    # one DMA each for gate/up/down) never touch the lookahead pair — the
    # scratch allocation below shrinks to 2 gate/up slots in that case

    def kernel(
        x_ref, cos_ref, sin_ref, selfm_ref, extm_ref,
        ln1_ref, ln2_ref, bq_ref, bk_ref, bv_ref,
        wq_ref, sq_ref, wk_ref, sk_ref, wv_ref, sv_ref, wo_ref, so_ref,
        wg_ref, sg_ref, wu_ref, su_ref, wd_ref, sd_ref,
        kext_ref, vext_ref,
        xo_ref, ko_ref, vo_ref,
        x_s,      # [R, hidden] bf16
        qkv_s,    # [hidden, q_dim + 2*kv_dim] int8
        o_s,      # [q_dim, hidden] int8
        gu_w,     # [4, hidden, mlp_tile] int8
        dn_w,     # [2, mlp_tile, hidden] int8
        gu_s,     # [R, inter] f32 staging
        kv_s,     # [2, ext_len, kv_heads, head_dim] bf16
        sem,      # DMA sems (12,)
    ):
        x_s[...] = x_ref[...]

        def qkvo_prefetch(l):
            pltpu.make_async_copy(
                wq_ref.at[l], qkv_s.at[:, pl.ds(0, q_dim)], sem.at[SEM_QKV[0]]
            ).start()
            pltpu.make_async_copy(
                wk_ref.at[l], qkv_s.at[:, pl.ds(q_dim, kv_dim)],
                sem.at[SEM_QKV[1]],
            ).start()
            pltpu.make_async_copy(
                wv_ref.at[l], qkv_s.at[:, pl.ds(q_dim + kv_dim, kv_dim)],
                sem.at[SEM_QKV[2]],
            ).start()
            pltpu.make_async_copy(wo_ref.at[l], o_s, sem.at[SEM_O]).start()

        def qkvo_wait(l):
            pltpu.make_async_copy(
                wq_ref.at[l], qkv_s.at[:, pl.ds(0, q_dim)], sem.at[SEM_QKV[0]]
            ).wait()
            pltpu.make_async_copy(
                wk_ref.at[l], qkv_s.at[:, pl.ds(q_dim, kv_dim)],
                sem.at[SEM_QKV[1]],
            ).wait()
            pltpu.make_async_copy(
                wv_ref.at[l], qkv_s.at[:, pl.ds(q_dim + kv_dim, kv_dim)],
                sem.at[SEM_QKV[2]],
            ).wait()
            pltpu.make_async_copy(wo_ref.at[l], o_s, sem.at[SEM_O]).wait()

        def gu_get_s(l, j, pair):
            # sems 0..3 = gate/up slots; index arithmetically (pair may be
            # a traced loop value)
            g = pltpu.make_async_copy(
                wg_ref.at[l, :, pl.ds(j * mlp_tile, mlp_tile)],
                gu_w.at[2 * pair], sem.at[2 * pair],
            )
            u = pltpu.make_async_copy(
                wu_ref.at[l, :, pl.ds(j * mlp_tile, mlp_tile)],
                gu_w.at[2 * pair + 1], sem.at[2 * pair + 1],
            )
            return g, u

        def dn_get(l, j, slot):
            return pltpu.make_async_copy(
                wd_ref.at[l, pl.ds(j * mlp_tile, mlp_tile), :],
                dn_w.at[slot], sem.at[SEM_DOWN[0] + slot],
            )

        qkvo_prefetch(0)

        def layer_body(l, _):
            # external KV streams under the attention phase
            cpk = pltpu.make_async_copy(kext_ref.at[l], kv_s.at[0],
                                        sem.at[SEM_KV[0]])
            cpv = pltpu.make_async_copy(vext_ref.at[l], kv_s.at[1],
                                        sem.at[SEM_KV[1]])
            cpk.start()
            cpv.start()

            h = _rms(x_s[...], ln1_ref[l], eps)
            qkvo_wait(l)

            def dq_dot(xin, w8, sc):
                # scale is per-output-channel: apply it to the [R, N] output,
                # not the [K, N] weight tile — halves the VPU dequant work,
                # which otherwise caps the stream below HBM speed
                y = jax.lax.dot_general(
                    xin, w8.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return y * sc.astype(jnp.float32)

            q = dq_dot(h, qkv_s[:, pl.ds(0, q_dim)], sq_ref[l]) \
                + bq_ref[l][None, :]
            k = dq_dot(h, qkv_s[:, pl.ds(q_dim, kv_dim)], sk_ref[l]) \
                + bk_ref[l][None, :]
            v = dq_dot(h, qkv_s[:, pl.ds(q_dim + kv_dim, kv_dim)],
                       sv_ref[l]) + bv_ref[l][None, :]

            q = _rope(q.reshape(R, heads, head_dim).astype(jnp.bfloat16),
                      cos_ref[...], sin_ref[...]).astype(jnp.bfloat16)
            k = _rope(k.reshape(R, kv_heads, head_dim).astype(jnp.bfloat16),
                      cos_ref[...], sin_ref[...]).astype(jnp.bfloat16)
            v = v.reshape(R, kv_heads, head_dim).astype(jnp.bfloat16)
            ko_ref[pl.ds(l, 1)] = k[None]
            vo_ref[pl.ds(l, 1)] = v[None]

            # start the first gate/up pair while attention runs
            g0, u0 = gu_get_s(l, 0, 0)
            g0.start()
            u0.start()

            cpk.wait()
            cpv.wait()
            scale = head_dim**-0.5
            mask = jnp.concatenate(
                [jnp.broadcast_to(extm_ref[...], (R, ext_len)),
                 selfm_ref[...]],
                axis=1,
            )
            outs = []
            for g in range(kv_heads):
                qg = (
                    q[:, g * groups : (g + 1) * groups, :]
                    .reshape(R * groups, head_dim)
                    .astype(jnp.float32)
                    * scale
                )
                keys = jnp.concatenate(
                    [kv_s[0, :, g, :], k[:, g, :]], axis=0
                ).astype(jnp.float32)
                s_ = jax.lax.dot_general(
                    qg, keys, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m = jnp.broadcast_to(
                    mask[:, None, :], (R, groups, ext_len + R)
                ).reshape(R * groups, ext_len + R)
                p = jax.nn.softmax(s_ + m, axis=-1)
                vals = jnp.concatenate(
                    [kv_s[1, :, g, :], v[:, g, :]], axis=0
                ).astype(jnp.float32)
                og = jax.lax.dot_general(
                    p, vals, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                outs.append(og.reshape(R, groups, head_dim))
            attn = (
                jnp.concatenate(outs, axis=1)
                .reshape(R, q_dim)
                .astype(jnp.bfloat16)
            )

            o = dq_dot(attn, o_s[...], so_ref[l])
            x_new = (x_s[...].astype(jnp.float32) + o).astype(jnp.bfloat16)
            h2 = _rms(x_new, ln2_ref[l], eps)

            # down tile 0 prefetch under the gate/up phase
            dn_get(l, 0, 0).start()

            def gu_body(j, _):
                pair = jax.lax.rem(j, 2)
                nxt_pair = jax.lax.rem(j + 1, 2)

                @pl.when(j + 1 < n_mlp_tiles)
                def _():
                    g_n, u_n = gu_get_s(l, j + 1, nxt_pair)
                    g_n.start()
                    u_n.start()

                g_c, u_c = gu_get_s(l, j, pair)
                g_c.wait()
                gt = dq_dot(
                    h2, gu_w[2 * pair],
                    sg_ref[l, :, pl.ds(j * mlp_tile, mlp_tile)],
                )
                u_c.wait()
                up = dq_dot(
                    h2, gu_w[2 * pair + 1],
                    su_ref[l, :, pl.ds(j * mlp_tile, mlp_tile)],
                )
                gu_s[:, pl.ds(j * mlp_tile, mlp_tile)] = (
                    gt * jax.nn.sigmoid(gt) * up
                )
                return 0

            jax.lax.fori_loop(0, n_mlp_tiles, gu_body, 0)

            # prefetch the NEXT layer's q/k/v/o while 'down' streams
            @pl.when(l + 1 < L)
            def _():
                qkvo_prefetch(l + 1)

            def down_body(j, acc):
                slot = jax.lax.rem(j, 2)
                nxt = jax.lax.rem(j + 1, 2)

                @pl.when(j + 1 < n_mlp_tiles)
                def _():
                    dn_get(l, j + 1, nxt).start()

                dn_get(l, j, slot).wait()
                hj = gu_s[:, pl.ds(j * mlp_tile, mlp_tile)].astype(
                    jnp.bfloat16
                )
                y = jax.lax.dot_general(
                    hj, dn_w[slot].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return acc + y * sd_ref[l].astype(jnp.float32)

            d = jax.lax.fori_loop(
                0, n_mlp_tiles, down_body,
                jnp.zeros((R, hidden), jnp.float32),
            )
            x_s[...] = (x_new.astype(jnp.float32) + d).astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, L, layer_body, 0)
        xo_ref[...] = x_s[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("eps", "mlp_tile", "interpret"))
def fused_int8_stack(
    x, cos, sin, self_mask, ext_mask,
    ln1, ln2, bq, bk, bv,
    wq, sq, wk, sk, wv, sv, wo, so, wg, sg, wu, su, wd, sd,
    k_ext, v_ext,
    eps: float = 1e-6,
    mlp_tile: int = 4480,
    interpret: bool = False,
):
    """-> (x_out [R, hidden] bf16, k_self [L, R, KVH, D], v_self [...]).

    Weight layouts: w* [L, K, N] int8 (weight-only-quant serving; the
    dequant rides the dot) OR bf16 (compute-bound R: the int8->bf16 VPU
    convert costs more than the halved stream buys — pass unit scales);
    s* f32 [L, 1, N]; sd [L, 1, hidden]. k_ext/v_ext bf16
    [L, ext_len, kv_heads, head_dim]. Masks are additive f32 (0 = attend,
    NEG_INF = blocked); self rows always see themselves.
    """
    wdt = wq.dtype
    R, hidden = x.shape
    L, _, q_dim = wq.shape
    kv_dim = wk.shape[-1]
    inter = wg.shape[-1]
    head_dim = cos.shape[-1]
    kv_heads = k_ext.shape[2]
    ext_len = k_ext.shape[1]

    kernel = _make_kernel(
        L=L, R=R, hidden=hidden, inter=inter, heads=q_dim // head_dim,
        kv_heads=kv_heads, head_dim=head_dim, ext_len=ext_len, eps=eps,
        mlp_tile=mlp_tile,
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pltpu.ANY)
    return pl.pallas_call(
        kernel,
        in_specs=[
            vmem(), vmem(), vmem(), vmem(), vmem(),
            vmem(), vmem(), vmem(), vmem(), vmem(),
            hbm(), vmem(), hbm(), vmem(), hbm(), vmem(), hbm(), vmem(),
            hbm(), vmem(), hbm(), vmem(), hbm(), vmem(),
            hbm(), hbm(),
        ],
        out_specs=(vmem(), vmem(), vmem()),
        out_shape=(
            jax.ShapeDtypeStruct((R, hidden), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, R, kv_heads, head_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, R, kv_heads, head_dim), jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, hidden), jnp.bfloat16),
            pltpu.VMEM((hidden, q_dim + 2 * kv_dim), wdt),
            pltpu.VMEM((q_dim, hidden), wdt),
            pltpu.VMEM((2 if inter == mlp_tile else 4, hidden, mlp_tile),
                       wdt),
            pltpu.VMEM((2, mlp_tile, hidden), wdt),
            pltpu.VMEM((R, inter), jnp.float32),
            pltpu.VMEM((2, ext_len, kv_heads, head_dim), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((12,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # v5e VMEM is 128MB; the R=384 prefix configuration peaks at
            # ~107MB of scoped allocation (single-tile MLP stream + R-row
            # f32 staging)
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x, cos, sin, self_mask, ext_mask, ln1, ln2, bq, bk, bv,
        wq, sq, wk, sk, wv, sv, wo, so, wg, sg, wu, su, wd, sd,
        k_ext, v_ext,
    )
