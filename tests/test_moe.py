"""Sparse MoE (models/moe.py) golden + expert-parallel tests.

The reference is dense-only; the MoE tier targets InternVL3.5's Qwen3-MoE
backbones. Golden surface: HF transformers' own Qwen3MoeForCausalLM run on
CPU with converted random weights (same technique as
tests/test_golden_vs_reference.py), including the router aux loss.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import LLMConfig
from vlaser_tpu.models.qwen2 import Qwen2ForCausalLM
from vlaser_tpu.utils.hf_convert import convert_qwen2


def _tiny_moe_cfg(capacity=None):
    return LLMConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=8,
        rope_theta=10_000.0,
        attention_bias=False,
        qk_norm=True,
        num_experts=8,
        num_experts_per_tok=2,
        moe_intermediate_size=16,
        norm_topk_prob=True,
        moe_capacity_factor=capacity,
    )


def _hf_model():
    import torch
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    torch.manual_seed(0)
    hf_cfg = Qwen3MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=16, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, num_experts=8,
        num_experts_per_tok=2, decoder_sparse_step=1, mlp_only_layers=[],
        norm_topk_prob=True, rope_theta=10_000.0, attention_bias=False,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    return Qwen3MoeForCausalLM(hf_cfg).eval(), hf_cfg


@pytest.fixture(scope="module")
def moe_pair():
    import torch

    hf, hf_cfg = _hf_model()
    cfg = _tiny_moe_cfg()
    model = Qwen2ForCausalLM(cfg, compute_dtype=jnp.float32)
    sd = {k: v for k, v in hf.state_dict().items()}
    params = {"params": convert_qwen2(sd, cfg.num_layers)}
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 127, (2, 16)).astype(np.int32)
    with torch.no_grad():
        out = hf(torch.from_numpy(ids.astype(np.int64)),
                 output_router_logits=True)
    return cfg, model, params, ids, out, hf_cfg


def test_moe_logits_match_hf(moe_pair):
    cfg, model, params, ids, hf_out, _ = moe_pair
    logits, _, _ = model.apply(
        params, jnp.asarray(ids), attn_impl="reference"
    )
    np.testing.assert_allclose(
        np.asarray(logits), hf_out.logits.numpy(), atol=2e-5, rtol=2e-4
    )


def test_moe_router_aux_matches_hf(moe_pair):
    import torch
    from transformers.models.qwen3_moe.modeling_qwen3_moe import (
        load_balancing_loss_func,
    )

    from vlaser_tpu.models.moe import router_aux_loss

    cfg, model, params, ids, hf_out, hf_cfg = moe_pair
    _, state = model.apply(
        params, jnp.asarray(ids), attn_impl="reference",
        mutable=["intermediates"],
    )
    inter = state["intermediates"]["model"]["layers"]["mlp"]
    ours = float(router_aux_loss(inter["router_f"][0], inter["router_p"][0]))
    ref = float(load_balancing_loss_func(
        hf_out.router_logits, hf_cfg.num_experts,
        hf_cfg.num_experts_per_tok,
    ))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_moe_capacity_lossless_vs_generous(moe_pair):
    """A generous finite capacity factor reproduces the lossless path."""
    cfg, model, params, ids, hf_out, _ = moe_pair
    cfg_cap = _tiny_moe_cfg(capacity=8.0)  # C = 8*T*k/E = 2T >= T
    model_cap = Qwen2ForCausalLM(cfg_cap, compute_dtype=jnp.float32)
    a, _, _ = model.apply(params, jnp.asarray(ids), attn_impl="reference")
    b, _, _ = model_cap.apply(params, jnp.asarray(ids), attn_impl="reference")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_moe_capacity_drop_is_bounded():
    """Tight capacity drops overflow tokens (weight-0 combine) but keeps
    the computation finite and the kept tokens exact-shaped."""
    cfg = _tiny_moe_cfg(capacity=0.5)
    model = Qwen2ForCausalLM(cfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 127, (2, 16)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits, _, _ = model.apply(params, ids, attn_impl="reference")
    assert np.isfinite(np.asarray(logits)).all()


def test_moe_expert_parallel_matches_single_device(moe_pair):
    """EP via GSPMD: expert params sharded over the tensor axis (leading
    [E] dim, core/mesh.py rules) reproduce single-device logits."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vlaser_tpu.core import mesh as mesh_lib

    cfg, model, params, ids, hf_out, _ = moe_pair
    ref, _, _ = model.apply(params, jnp.asarray(ids), attn_impl="reference")

    mesh = mesh_lib.make_mesh(dp=2, fsdp=2, tp=2)
    rules = mesh_lib.default_param_rules()
    sh = mesh_lib.tree_shardings(params, mesh, rules)
    # the experts really shard over tensor (E=8 % 2 == 0)
    espec = sh["params"]["model"]["layers"]["mlp"]["experts_gate_proj"].spec
    assert espec[1] == mesh_lib.TENSOR_AXIS, espec
    sparams = jax.device_put(params, sh)
    sids = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P()))
    out = jax.jit(
        lambda p, i: model.apply(p, i, attn_impl="reference")[0]
    )(sparams, sids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_moe_grads_flow():
    cfg = _tiny_moe_cfg()
    model = Qwen2ForCausalLM(cfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(1, 127, (2, 8)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)

    def loss(p):
        logits, _, _ = model.apply(p, ids, attn_impl="reference")
        return jnp.mean(logits ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves_with_path(g)
    # router and experts both receive gradient
    touched = {"gate": False, "experts_gate_proj": False}
    for path, leaf in flat:
        name = str(getattr(path[-1], "key", path[-1]))
        if name in touched:
            touched[name] |= bool(np.abs(np.asarray(leaf)).max() > 0)
        assert np.isfinite(np.asarray(leaf)).all(), path
    assert all(touched.values()), touched


def test_moe_sft_aux_loss_wiring():
    """make_sft_loss(moe_aux_coef>0) adds exactly coef * (HF-semantics
    router aux) to the CE loss for an MoE-backed VLM."""
    import dataclasses

    from vlaser_tpu.core.config import tiny_vlm
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.models.moe import router_aux_loss
    from vlaser_tpu.train.losses import make_sft_loss

    vcfg = tiny_vlm()
    vcfg = dataclasses.replace(
        vcfg, llm=dataclasses.replace(
            vcfg.llm, num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=16,
        ))
    model = InternVLChatModel(vcfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    rng = np.random.default_rng(0)
    B, S = 2, 12
    ids = rng.integers(1, 400, (B, S))
    ids[:, 1] = vcfg.img_context_token_id
    labels = ids.copy()
    labels[:, :3] = -100
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "loss_weight": jnp.asarray((labels != -100).astype(np.float32)),
        "seg_ids": jnp.ones((B, S), jnp.int32),
        "pixel_values": jnp.asarray(rng.standard_normal(
            (B, vcfg.vision.image_size, vcfg.vision.image_size, 3)
        ).astype(np.float32)),
        "image_flags": jnp.ones((B,), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"][:1],
                        batch["pixel_values"][:1], batch["image_flags"][:1])

    base = float(make_sft_loss(model)(params, batch, None))
    withaux = float(make_sft_loss(model, moe_aux_coef=0.1)(params, batch,
                                                           None))
    _, state = model.apply(
        params, batch["input_ids"], batch["pixel_values"],
        batch["image_flags"], seg_ids=batch["seg_ids"],
        mutable=["intermediates"],
    )
    inter = state["intermediates"]["language_model"]["model"]["layers"]["mlp"]
    aux = float(router_aux_loss(inter["router_f"][0], inter["router_p"][0]))
    np.testing.assert_allclose(withaux, base + 0.1 * aux, rtol=1e-5)
