"""Ring attention (context parallelism) parity vs full attention.

The reference has no CP/ring attention (SURVEY.md §5); this validates the
TPU-native capability on an 8-virtual-device mesh: fwd + grads match the
single-device reference implementation with causal + packed segment ids +
VLA levels + softcap composed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from vlaser_tpu.kernels.flash_attention import attention
from vlaser_tpu.kernels.ring_attention import (
    context_parallel_attention,
    ring_attention,
)


def _mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _inputs(b=2, s=256, h=4, kvh=2, d=16, seed=0, levels=False):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kvh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kvh, d)), jnp.float32)
    # several packed segments incl. trailing padding (seg 0)
    bounds = sorted(rng.choice(np.arange(8, s - 8), size=3, replace=False))
    seg = np.zeros((b, s), np.int32)
    for bi in range(b):
        prev, sid = 0, 1
        for e in list(bounds) + [s - 4]:
            seg[bi, prev:e] = sid
            prev, sid = e, sid + 1
    seg = jnp.asarray(seg)
    # fully-masked (padding) query rows are implementation-defined: the
    # reference softmax degrades to uniform, flash/ring emit zeros — compare
    # valid rows only
    valid = (seg != 0).astype(jnp.float32)[:, :, None, None]
    lev = None
    if levels:
        lv = np.zeros((b, s), np.int32)
        lv[:, s // 2 : 3 * s // 4] = 1
        lv[:, 3 * s // 4 :] = 2
        lev = jnp.asarray(lv)
    return q, k, v, seg, lev, valid


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("levels", [False, True])
def test_ring_matches_full(causal, levels):
    q, k, v, seg, lev, valid = _inputs(levels=levels)
    ref = attention(
        q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
        q_levels=lev, kv_levels=lev, causal=causal, impl="reference",
    )
    mesh = _mesh((8,), ("context",))
    with jax.set_mesh(mesh):
        out = jax.jit(
            lambda q, k, v, s: context_parallel_attention(
                q, k, v, axis="context", q_segment_ids=s, kv_segment_ids=s,
                q_levels=lev, kv_levels=lev, causal=causal,
            )
        )(q, k, v, seg)
    np.testing.assert_allclose(np.asarray(out * valid),
                               np.asarray(ref * valid),
                               atol=2e-5, rtol=2e-5)


def test_ring_grad_matches_full():
    q, k, v, seg, lev, valid = _inputs(levels=True)
    gw = jnp.asarray(
        np.random.default_rng(7).standard_normal(q.shape), jnp.float32
    ) * valid

    def loss_ref(q, k, v):
        out = attention(
            q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
            q_levels=lev, kv_levels=lev, causal=True, impl="reference",
        )
        return jnp.sum(out * gw)

    mesh = _mesh((8,), ("context",))

    def loss_ring(q, k, v):
        out = context_parallel_attention(
            q, k, v, axis="context",
            q_segment_ids=seg, kv_segment_ids=seg,
            q_levels=lev, kv_levels=lev, causal=True,
        )
        return jnp.sum(out * gw)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with jax.set_mesh(mesh):
        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(g_ref, g_ring, "qkv"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5, rtol=3e-5,
            err_msg=f"d{name}",
        )


def test_ring_softcap_and_2d_mesh():
    """softcap path + CP composed with a data axis under GSPMD."""
    q, k, v, seg, _, valid = _inputs(s=128, seed=3)
    ref = attention(
        q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
        causal=True, softcap=30.0, impl="reference",
    )
    mesh = _mesh((2, 4), ("data", "context"))
    with jax.set_mesh(mesh):
        qs = jax.device_put(
            q, NamedSharding(mesh, P("data", "context", None, None))
        )
        out = jax.jit(
            lambda q, k, v, s: context_parallel_attention(
                q, k, v, axis="context", q_segment_ids=s,
                kv_segment_ids=s, causal=True, softcap=30.0,
            )
        )(qs, k, v, seg)
    np.testing.assert_allclose(np.asarray(out * valid),
                               np.asarray(ref * valid),
                               atol=2e-5, rtol=2e-5)


def test_ring_attention_inside_shard_map_direct():
    """Direct per-device entry: uniform contiguous shards, no wrapper."""
    q, k, v, seg, _, valid = _inputs(b=1, s=128, seed=5)
    ref = attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                    causal=True, impl="reference")
    mesh = _mesh((4,), ("context",))
    spec = P(None, "context", None, None)
    fn = jax.shard_map(
        lambda q, k, v, s: ring_attention(
            q, k, v, axis_name="context",
            q_segment_ids=s, kv_segment_ids=s, causal=True,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None, "context")),
        out_specs=spec,
    )
    with jax.set_mesh(mesh):
        out = jax.jit(fn)(q, k, v, seg)
    np.testing.assert_allclose(np.asarray(out * valid),
                               np.asarray(ref * valid),
                               atol=2e-5, rtol=2e-5)


def test_context_parallel_llm_stack_parity():
    """cfg.context_parallel_axis drives the whole scanned Qwen2 stack
    through ring attention; loss + grads match the plain stack."""
    import dataclasses

    from vlaser_tpu.core import mesh as mesh_lib
    from vlaser_tpu.core.config import tiny_llm
    from vlaser_tpu.models.qwen2 import Qwen2ForCausalLM

    cfg = tiny_llm()
    cfg_cp = dataclasses.replace(cfg, context_parallel_axis="context")
    model = Qwen2ForCausalLM(cfg, compute_dtype=jnp.float32)
    model_cp = Qwen2ForCausalLM(cfg_cp, compute_dtype=jnp.float32)

    rng = np.random.default_rng(0)
    b, s = 2, 64
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, s)), jnp.int32)
    # packed segments with trailing padding
    seg = np.ones((b, s), np.int32)
    seg[:, s // 2 :] = 2
    seg[:, -4:] = 0
    seg = jnp.asarray(seg)
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, s)), jnp.int32)
    lmask = (seg != 0).astype(jnp.float32)

    params = model.init(jax.random.PRNGKey(0), ids, seg_ids=seg)

    def loss(params, model):
        logits, _, _ = model.apply(
            params, ids, seg_ids=seg, attn_impl="reference"
        )
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, labels[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * lmask) / jnp.sum(lmask)

    l_ref, g_ref = jax.value_and_grad(loss)(params, model)

    mesh = mesh_lib.make_mesh(dp=1, fsdp=1, tp=1, cp=8)
    assert mesh.shape["context"] == 8
    with jax.set_mesh(mesh):
        l_cp, g_cp = jax.jit(
            jax.value_and_grad(lambda p: loss(p, model_cp))
        )(params)
    np.testing.assert_allclose(float(l_cp), float(l_ref), rtol=1e-6)
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_c = jax.tree_util.tree_leaves(g_cp)
    for (path, a), c in zip(flat_r, flat_c):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), atol=1e-5, rtol=1e-4,
            err_msg=str(path),
        )


def test_context_parallel_sft_train_step_parity():
    """Full SFT train step (make_sft_loss + AdamW) on a (data x context)
    mesh with the VLM's LLM running ring attention — loss matches the
    plain single-device step (the scripts/train_sft.py --cp path)."""
    import dataclasses

    from vlaser_tpu.core import mesh as mesh_lib
    from vlaser_tpu.core.config import tiny_vlm
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.train.losses import make_sft_loss
    from vlaser_tpu.train.optim import make_optimizer
    from vlaser_tpu.train.train_step import (
        TrainState, make_train_step, shard_train_state,
    )

    cfg = tiny_vlm()
    cfg_cp = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm,
                                     context_parallel_axis="context"))
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    model_cp = InternVLChatModel(cfg_cp, compute_dtype=jnp.float32,
                                 attn_impl="reference")
    rng = np.random.default_rng(0)
    B, S = 2, 32
    ids = rng.integers(1, 400, (B, S))
    ids[:, 1] = cfg.img_context_token_id
    labels = ids.copy()
    labels[:, :4] = -100
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "loss_weight": jnp.asarray((labels != -100).astype(np.float32)),
        "seg_ids": jnp.ones((B, S), jnp.int32),
        "pixel_values": jnp.asarray(rng.standard_normal(
            (B, cfg.vision.image_size, cfg.vision.image_size, 3)
        ).astype(np.float32)),
        "image_flags": jnp.ones((B,), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"][:1],
                        batch["pixel_values"][:1], batch["image_flags"][:1])
    tx = make_optimizer(1e-4, frozen_patterns=(r"vision_model/",),
                        params=params)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    step = make_train_step(make_sft_loss(model), tx, donate=False)
    _, m_ref = step(state, batch, jax.random.PRNGKey(1))

    mesh = mesh_lib.make_mesh(dp=-1, fsdp=1, tp=1, cp=4)
    state2 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    with jax.set_mesh(mesh):
        state2, _ = shard_train_state(state2, mesh)
        sbatch = jax.device_put(batch, mesh_lib.shard_batch(batch, mesh))
        step_cp = make_train_step(make_sft_loss(model_cp), tx, donate=False)
        _, m_cp = step_cp(state2, sbatch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_cp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)


def test_ring_zigzag_layout_matches_full():
    """layout='zigzag' (causal load-balanced half-block interleave) is a
    pure re-permutation: outputs and grads match the contiguous reference
    exactly."""
    q, k, v, seg, lev, valid = _inputs(levels=True)
    gw = jnp.asarray(
        np.random.default_rng(9).standard_normal(q.shape), jnp.float32
    ) * valid
    ref = attention(
        q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
        q_levels=lev, kv_levels=lev, causal=True, impl="reference",
    )
    mesh = _mesh((8,), ("context",))

    def zz(q, k, v, s):
        return context_parallel_attention(
            q, k, v, axis="context", q_segment_ids=s, kv_segment_ids=s,
            q_levels=lev, kv_levels=lev, causal=True, layout="zigzag",
        )

    with jax.set_mesh(mesh):
        out = jax.jit(zz)(q, k, v, seg)
        g_zz = jax.jit(
            jax.grad(lambda q, k, v: jnp.sum(zz(q, k, v, seg) * gw),
                     argnums=(0, 1, 2))
        )(q, k, v)
    np.testing.assert_allclose(np.asarray(out * valid),
                               np.asarray(ref * valid),
                               atol=2e-5, rtol=2e-5)

    def loss_ref(q, k, v):
        out = attention(
            q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
            q_levels=lev, kv_levels=lev, causal=True, impl="reference",
        )
        return jnp.sum(out * gw)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ref, g_zz, "qkv"):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-5, rtol=3e-5, err_msg=f"d{name}")
