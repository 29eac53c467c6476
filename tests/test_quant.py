"""Int8 weight-only quantization (core/quant.py): serving parity guards.

The quantized path must (a) run through every model entry unchanged (the
`quant` collection rides along in the variables dict), (b) stay numerically
close to the bf16/fp32 path — weight-only int8 with per-channel scales is
~0.8% relative weight error, which the oracle tolerances below bound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import tiny_vla, tiny_vlm
from vlaser_tpu.core.quant import (
    DEFAULT_PATTERNS,
    POLICY_PATTERNS,
    quantize_int8,
    quantize_variables,
)
from vlaser_tpu.models.vlm import InternVLChatModel
from vlaser_tpu.policy.pizero import PiZeroVLA


def _rand_params(model, init_args, seed=0):
    variables = model.init(jax.random.PRNGKey(seed), *init_args)
    key = jax.random.PRNGKey(seed + 1)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(key, len(leaves))
    leaves = [
        (jax.random.normal(k, l.shape, jnp.float32) * 0.05).astype(l.dtype)
        for k, l in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def test_quantize_int8_roundtrip():
    w = np.random.default_rng(0).standard_normal((64, 128)).astype(np.float32)
    q, s = quantize_int8(jnp.asarray(w), reduce_axis=-2)
    assert q.dtype == jnp.int8 and s.shape == (1, 128)
    w_hat = np.asarray(q, np.float32) * np.asarray(s)
    rel = np.abs(w_hat - w).max() / np.abs(w).max()
    assert rel < 0.01


def test_vla_infer_action_quant_close():
    cfg = tiny_vla(max_image_text_tokens=16)
    model = PiZeroVLA(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    B, S = 1, cfg.max_image_text_tokens
    img = cfg.vlm.vision.image_size
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 400, (B, S))
    ids[:, 2] = cfg.vlm.img_context_token_id
    args = (
        jnp.asarray(ids),
        jnp.asarray(rng.standard_normal((B, img, img, 3)).astype(np.float32)),
        jnp.ones((B, S), jnp.int32),
        jnp.zeros((B, cfg.cond_steps, cfg.proprio_dim), jnp.float32),
        jnp.asarray(rng.standard_normal(
            (B, cfg.num_action_tokens, cfg.action_dim)).astype(np.float32)),
    )
    variables = _rand_params(
        model,
        (args[0], args[1], args[2], args[3],
         jnp.zeros((B, cfg.num_action_tokens, cfg.action_dim)),
         jnp.zeros((B,)), args[4]),
    )
    ref = model.apply(variables, *args, method=model.infer_action)

    qvars = quantize_variables(variables, POLICY_PATTERNS)
    assert "quant" in qvars, "no kernels matched the policy quant patterns"
    # every joint-layer kernel must have moved out of params
    flat = jax.tree_util.tree_leaves_with_path(qvars["params"])
    joint_kernels = [
        p for p, _ in flat
        if "joint" in str(p) and str(p).endswith("kernel']")
    ]
    out = model.apply(qvars, *args, method=model.infer_action)
    assert out.shape == ref.shape
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale < 0.15, (err, scale)
    # and it must actually be a different (quantized) computation
    assert err > 0


def test_vlm_logits_quant_close():
    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    B, N = 1, 24
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 400, (B, N))
    ids[:, 1] = cfg.img_context_token_id
    img = cfg.vision.image_size
    args = (
        jnp.asarray(ids),
        jnp.asarray(rng.standard_normal((B, img, img, 3)).astype(np.float32)),
        jnp.ones((B,), jnp.int32),
    )
    variables = _rand_params(model, args, seed=3)
    ref = model.apply(variables, *args)[0]
    qvars = quantize_variables(variables, DEFAULT_PATTERNS)
    assert "quant" in qvars
    out = model.apply(qvars, *args)[0]
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale < 0.1, (err, scale)


def test_quant_skips_vit_and_small_leaves():
    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    B, N = 1, 8
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 400, (B, N))
    ids[:, 1] = cfg.img_context_token_id
    img = cfg.vision.image_size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids),
        jnp.asarray(rng.standard_normal((B, img, img, 3)).astype(np.float32)),
        jnp.ones((B,), jnp.int32),
    )
    qvars = quantize_variables(variables, DEFAULT_PATTERNS)
    from flax import traverse_util

    qflat = traverse_util.flatten_dict(qvars.get("quant", {}))
    for key in qflat:
        path = "/".join(key)
        assert "vision_model" not in path, path

def test_dense_act_quant_flag_and_row_threshold():
    """kernel_aq-flagged Dense runs w8a8 at >=128 rows (close to the
    weight-only dequant result, not exact) and stays EXACTLY on the
    weight-only path below the threshold (GEMV regime)."""
    import jax
    import jax.numpy as jnp
    from flax.core import freeze, unfreeze

    from vlaser_tpu.core.quant import quantize_variables
    from vlaser_tpu.models.layers import ACT_QUANT_MIN_ROWS, Dense

    dense = Dense(features=96, compute_dtype=jnp.float32)
    rng = np.random.default_rng(11)
    x_big = jnp.asarray(
        rng.standard_normal((ACT_QUANT_MIN_ROWS, 64)).astype(np.float32))
    x_small = x_big[: ACT_QUANT_MIN_ROWS // 2]
    variables = dense.init(jax.random.PRNGKey(0), x_big)
    # the generic pattern matches the bare "kernel" path
    qv_wo = quantize_variables(variables, (r"kernel$",))
    qv_aq = quantize_variables(variables, (r"kernel$",),
                               act_quant_patterns=(r"kernel$",))
    assert "kernel_aq" in qv_aq["quant"] and \
        "kernel_aq" not in qv_wo["quant"]

    big_wo = dense.apply(qv_wo, x_big)
    big_aq = dense.apply(qv_aq, x_big)
    # w8a8 differs from weight-only by the activation rounding only
    assert not np.allclose(np.asarray(big_wo), np.asarray(big_aq),
                           atol=1e-7), "w8a8 path did not run"
    np.testing.assert_allclose(np.asarray(big_aq), np.asarray(big_wo),
                               rtol=0.05, atol=0.05)

    small_wo = dense.apply(qv_wo, x_small)
    small_aq = dense.apply(qv_aq, x_small)
    np.testing.assert_allclose(np.asarray(small_aq), np.asarray(small_wo),
                               atol=0)  # identical: flag ignored for GEMVs


def test_quantize_for_serving_plumbing():
    """round-4 VERDICT #2 pattern plumbing: the one-call serving helper
    (the entry scripts/eval_vlm.py --quantize and EngineChat(quantize=)
    use) builds the measured-best w8a8 collection — encoder kernels int8
    WITH kernel_aq flags (the fused-ViT w8a8 switch pack_vit_stack keys
    on), LLM layer kernels int8 with flags (w8a8 admission prefill),
    embeddings weight-only; "int8" mode carries no flags; an already-
    quantized tree passes through unchanged."""
    from flax import traverse_util

    from vlaser_tpu.core.quant import quantize_for_serving
    from vlaser_tpu.kernels.fused_vit import pack_vit_stack

    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 400, (1, 8))
    ids[:, 1] = cfg.img_context_token_id
    img = cfg.vision.image_size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids),
        jnp.asarray(rng.standard_normal((1, img, img, 3)).astype(np.float32)),
        jnp.ones((1,), jnp.int32),
    )
    # min_size=0: tiny-config kernels must not fall under the size floor
    # (production shapes are far above it)
    qv = quantize_for_serving(variables, target="vlm", mode="w8a8",
                              min_size=0)
    paths = {"/".join(k)
             for k in traverse_util.flatten_dict(qv["quant"]).keys()}
    # encoder: quantized AND activation-flagged (fused ViT w8a8)
    for site in ("attn/qkv", "attn/proj", "mlp/fc1", "mlp/fc2"):
        assert any(p.endswith(f"encoder/{site}/kernel_q") for p in paths), \
            site
        assert any(p.endswith(f"encoder/{site}/kernel_aq") for p in paths), \
            site
    # LLM layer kernels: quantized + flagged (w8a8 prefill batches)
    assert any(p.endswith("q_proj/kernel_q") for p in paths)
    assert any(p.endswith("q_proj/kernel_aq") for p in paths)
    # embedding: weight-only (streamed logits matmul)
    assert any(p.endswith("embed_tokens/embedding_q") for p in paths)
    # the fused-ViT packer must flip to the w8a8 kernel on this tree
    packed = pack_vit_stack(qv)
    assert packed.get("act_quant") is True
    # int8 (weight-only) mode: no activation flags anywhere
    qv_int8 = quantize_for_serving(variables, target="vlm", mode="int8",
                                   min_size=0)
    paths_int8 = {"/".join(k)
                  for k in traverse_util.flatten_dict(
                      qv_int8["quant"]).keys()}
    assert not any(p.endswith("kernel_aq") for p in paths_int8)
    # idempotent: a quantized tree passes through
    assert quantize_for_serving(qv, target="vlm", mode="w8a8") is qv
    # policy target plumbs the joint mixtures (smoke: patterns resolve)
    with pytest.raises(ValueError):
        quantize_for_serving(variables, target="nope")
    with pytest.raises(ValueError):
        quantize_for_serving(variables, target="vlm", mode="fp4")


def test_w8a8_forward_qlora_training_trajectory():
    """round-4 VERDICT #6 gradient-accuracy study: QLoRA SFT with the
    w8a8 training forward (int8-MXU fwd via layers.w8a8_dot's STE
    custom_vjp, bf16-class bwd) must track the weight-only-int8 baseline.
    Asserts: (a) LoRA gradients through w8a8 layers are nonzero (the
    naive round() gradient is zero — the STE is what makes this mode
    trainable at all); (b) over a 150-step tiny-config run both losses
    decrease and the trajectories stay close (same int8 base weights, so
    the only difference is per-token activation rounding in the forward).
    This is the in-suite assertion gating bench.py's w8a8 SFT forward."""
    import optax

    from vlaser_tpu.core.quant import (VLM_W8A8_ACT_PATTERNS,
                                       quantize_variables)
    from vlaser_tpu.models.layers import ACT_QUANT_MIN_ROWS
    from vlaser_tpu.train.lora import init_qlora_collection
    from vlaser_tpu.train.losses import make_sft_loss_chunked

    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    B, N = 4, 64
    assert B * N >= ACT_QUANT_MIN_ROWS  # the w8a8 branch must fire
    rng = np.random.default_rng(17)
    ids = rng.integers(1, 400, (B, N)).astype(np.int32)
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(
            np.concatenate([ids[:, 1:], np.full((B, 1), -100, np.int32)], 1)
        ),
        "seg_ids": jnp.ones((B, N), jnp.int32),
        "pixel_values": None,
    }
    variables = model.init(jax.random.PRNGKey(0), batch["input_ids"], None,
                           jnp.ones((B, N), jnp.int32))

    def train(act_patterns):
        qv = quantize_variables(variables, DEFAULT_PATTERNS,
                                act_quant_patterns=act_patterns, min_size=0)
        lora = init_qlora_collection(jax.random.PRNGKey(1), qv, r=4,
                                     alpha=8.0, dtype=jnp.float32)
        loss_fn = make_sft_loss_chunked(model, chunk=128)
        tx = optax.adamw(3e-3)
        opt = tx.init(lora)

        @jax.jit
        def step(lora_tree, opt):
            def f(lt):
                return loss_fn(dict(qv, lora=lt), batch, None)

            loss, grads = jax.value_and_grad(f)(lora_tree)
            upd, opt2 = tx.update(grads, opt, lora_tree)
            return optax.apply_updates(lora_tree, upd), opt2, loss, grads

        losses, g0 = [], None
        for _ in range(150):
            lora, opt, loss, grads = step(lora, opt)
            if g0 is None:
                g0 = grads
            losses.append(float(loss))
        return np.asarray(losses), g0

    losses_wo, _ = train(())
    losses_aq, g0_aq = train(VLM_W8A8_ACT_PATTERNS)

    # (a) STE: gradients through the w8a8 forward are alive
    gmax = max(float(jnp.abs(l).max())
               for l in jax.tree_util.tree_leaves(g0_aq))
    assert gmax > 1e-6, "w8a8 training gradients are dead"

    # (b) trajectory closeness: both decrease, curves track each other
    assert losses_wo[-1] < losses_wo[0] * 0.98
    assert losses_aq[-1] < losses_aq[0] * 0.98
    rel = np.abs(losses_aq - losses_wo) / np.maximum(np.abs(losses_wo), 1e-6)
    assert rel.mean() < 0.03, f"mean trajectory divergence {rel.mean():.4f}"
    assert rel[-1] < 0.05, f"final loss divergence {rel[-1]:.4f}"
