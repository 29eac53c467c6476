"""LoRA + MPO tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import tiny_llm, tiny_vlm
from vlaser_tpu.models.qwen2 import Qwen2ForCausalLM
from vlaser_tpu.models.vlm import InternVLChatModel
from vlaser_tpu.train.lora import (
    LLM_TARGETS,
    apply_lora,
    count_lora_params,
    init_lora_params,
    merge_lora,
)
from vlaser_tpu.train.mpo import (
    MPOConfig,
    RunningMoments,
    make_mpo_loss,
    sequence_logprobs,
)


@pytest.fixture(scope="module")
def llm():
    cfg = tiny_llm()
    model = Qwen2ForCausalLM(cfg, compute_dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 500, (2, 8)))
    params = model.init(jax.random.PRNGKey(0), input_ids=ids, attn_impl="reference")
    return cfg, model, params, ids


def test_lora_init_and_zero_delta(llm):
    cfg, model, params, ids = llm
    lora = init_lora_params(jax.random.PRNGKey(1), params, LLM_TARGETS, r=4)
    assert len(lora) == 7  # q,k,v,o,gate,up,down (scanned stacks)
    # scanned kernels get [L, ., r] factors
    key = next(k for k in lora if "q_proj" in k)
    assert lora[key]["a"].shape[0] == cfg.num_layers
    assert count_lora_params(lora) > 0

    # b=0 -> apply_lora is identity
    eff = apply_lora(params, lora, alpha=8, r=4)
    base, _, _ = model.apply(params, input_ids=ids, attn_impl="reference")
    out, _, _ = model.apply(eff, input_ids=ids, attn_impl="reference")
    np.testing.assert_allclose(np.asarray(base), np.asarray(out), rtol=1e-6)


def test_lora_training_changes_output_and_merges(llm):
    cfg, model, params, ids = llm
    lora = init_lora_params(jax.random.PRNGKey(1), params, LLM_TARGETS, r=4)

    def loss(lora):
        eff = apply_lora(params, lora, alpha=8, r=4)
        logits, _, _ = model.apply(eff, input_ids=ids, attn_impl="reference")
        return jnp.mean(logits**2)

    g = jax.grad(loss)(lora)
    # gradient flows into B even though delta starts at 0
    key = next(k for k in g if "q_proj" in k)
    assert float(jnp.abs(g[key]["b"]).max()) > 0
    # one SGD step then merged == effective
    lora2 = jax.tree_util.tree_map(lambda x, gg: x - 0.1 * gg, lora, g)
    eff = apply_lora(params, lora2, alpha=8, r=4)
    merged = merge_lora(params, lora2, alpha=8, r=4)
    a, _, _ = model.apply(eff, input_ids=ids, attn_impl="reference")
    b, _, _ = model.apply(merged, input_ids=ids, attn_impl="reference")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    base, _, _ = model.apply(params, input_ids=ids, attn_impl="reference")
    assert np.abs(np.asarray(a) - np.asarray(base)).max() > 1e-6


def test_sequence_logprobs_masks():
    logits = jnp.zeros((1, 4, 10))  # uniform -> logp = -log(10) per token
    labels = jnp.asarray([[-100, 2, 3, -100]])
    lp = sequence_logprobs(logits, labels)
    np.testing.assert_allclose(lp, [2 * -np.log(10)], rtol=1e-5)


def test_mpo_loss_prefers_chosen():
    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    rng = np.random.default_rng(0)
    B, N = 2, 10
    chosen = rng.integers(1, 400, (B, N))
    rejected = rng.integers(1, 400, (B, N))
    labels_c = chosen.copy()
    labels_c[:, :4] = -100
    labels_r = rejected.copy()
    labels_r[:, :4] = -100
    seg = np.ones((B, N), np.int32)
    pixels = np.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3), np.float32)
    flags = np.zeros(1, np.int32)
    batch = {
        "chosen_input_ids": jnp.asarray(chosen),
        "chosen_labels": jnp.asarray(labels_c),
        "chosen_seg_ids": jnp.asarray(seg),
        "rejected_input_ids": jnp.asarray(rejected),
        "rejected_labels": jnp.asarray(labels_r),
        "rejected_seg_ids": jnp.asarray(seg),
        "pixel_values": jnp.asarray(pixels),
        "image_flags": jnp.asarray(flags),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["chosen_input_ids"], batch["pixel_values"],
        batch["image_flags"],
    )
    loss_fn = make_mpo_loss(model, MPOConfig())
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, params, batch, jnp.zeros(())
    )
    assert np.isfinite(float(loss))
    # with ref == policy, margins are 0 and dpo loss is log(2)
    np.testing.assert_allclose(float(metrics["dpo_loss"]), np.log(2), rtol=1e-4)
    np.testing.assert_allclose(float(metrics["reward_margin"]), 0, atol=1e-5)
    assert all(np.all(np.isfinite(x)) for x in jax.tree_util.tree_leaves(grads))

    rm = RunningMoments()
    d = rm.update(np.asarray(metrics["rewards"]))
    assert np.isfinite(d)


def test_qlora_over_int8_base():
    """QLoRA analogue: LoRA collection over a quantized base — adapters
    change outputs (starting from exactly the base output at init), grads
    flow only to the lora collection, and merge_qlora_into_quant exports a
    plain fp tree matching quant+lora."""
    import dataclasses

    from vlaser_tpu.core.config import tiny_llm
    from vlaser_tpu.core.quant import quantize_variables
    from vlaser_tpu.models.qwen2 import Qwen2ForCausalLM
    from vlaser_tpu.train.lora import (
        init_qlora_collection, merge_qlora_into_quant,
    )

    cfg = dataclasses.replace(tiny_llm(), num_layers=2)
    model = Qwen2ForCausalLM(cfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 200, (1, 6)))
    variables = model.init(jax.random.PRNGKey(0), input_ids=ids)
    qvars = quantize_variables(
        variables, (r"(^|/)layers/.*kernel$",)
    )
    base_logits, _, _ = model.apply(qvars, input_ids=ids, attn_impl="reference")

    lora = init_qlora_collection(jax.random.PRNGKey(1), qvars, r=4, alpha=8.0)
    # every quantized layer kernel got an adapter ([L, in, r] factors)
    flat = jax.tree_util.tree_leaves_with_path(lora)
    assert any("q_proj" in str(p) for p, _ in flat)
    qvars_l = dict(qvars, lora=lora)

    # b = 0 at init -> identical to base
    out0, _, _ = model.apply(qvars_l, input_ids=ids, attn_impl="reference")
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base_logits),
                               rtol=1e-6, atol=1e-6)

    # grads flow to lora only; base params untouched by the quantized layers
    def loss(lora_tree):
        v = dict(qvars, lora=lora_tree)
        logits, _, _ = model.apply(v, input_ids=ids, attn_impl="reference")
        return jnp.mean(logits**2)

    g = jax.grad(loss)(lora)
    gb = [x for p, x in jax.tree_util.tree_leaves_with_path(g)
          if getattr(p[-1], "key", None) == "b"]
    assert gb and max(float(jnp.abs(x).max()) for x in gb) > 0

    # train a few steps and confirm the adapter moves the output
    import optax

    tx = optax.adam(1e-2)
    st = tx.init(lora)
    cur = lora
    for _ in range(3):
        gr = jax.grad(loss)(cur)
        up, st = tx.update(gr, st, cur)
        cur = optax.apply_updates(cur, up)
    out1, _, _ = model.apply(dict(qvars, lora=cur), input_ids=ids,
                             attn_impl="reference")
    assert float(jnp.abs(out1 - base_logits).max()) > 1e-3

    # merged export == quant base + adapters, as plain fp params
    merged = merge_qlora_into_quant(dict(qvars, lora=cur))
    assert "quant" not in merged
    out_m, _, _ = model.apply(merged, input_ids=ids, attn_impl="reference")
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out1),
                               rtol=2e-5, atol=2e-5)
