"""Multi-device tests on the virtual 8-CPU mesh: sharded VLA train step
(dp x fsdp x tp), sharding-rule engine, DP-invariance of the loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vlaser_tpu.core import mesh as mesh_lib
from vlaser_tpu.core.config import tiny_vla
from vlaser_tpu.policy.flow import make_flow_loss
from vlaser_tpu.policy.pizero import PiZeroVLA
from vlaser_tpu.train.optim import make_optimizer
from vlaser_tpu.train.train_step import TrainState, make_train_step, shard_train_state


def _batch(cfg, B, rng):
    S = cfg.max_image_text_tokens
    ids = rng.integers(1, 400, (B, S))
    ids[:, 2] = cfg.vlm.img_context_token_id
    mask = np.ones((B, S), np.int32)
    return {
        "input_ids": jnp.asarray(ids),
        "pixel_values": jnp.asarray(
            rng.standard_normal(
                (B, cfg.vlm.vision.image_size, cfg.vlm.vision.image_size, 3)
            ).astype(np.float32)
        ),
        "text_mask": jnp.asarray(mask),
        "proprios": jnp.asarray(
            rng.standard_normal((B, cfg.cond_steps, cfg.proprio_dim)).astype(np.float32)
        ),
        "actions": jnp.asarray(
            rng.standard_normal((B, cfg.num_action_tokens, cfg.action_dim)).astype(
                np.float32
            )
        ),
    }


def test_mesh_and_rules():
    assert len(jax.devices()) == 8
    mesh = mesh_lib.make_mesh(dp=2, fsdp=2, tp=2)
    assert mesh.shape == {"data": 2, "fsdp": 2, "tensor": 2}
    # rule engine degrades non-divisible dims to replication
    tree = {"layers": {"self_attn": {"q_proj": {"kernel": jnp.zeros((2, 64, 64))}}},
            "small": jnp.zeros((3,))}
    sh = mesh_lib.tree_shardings(tree, mesh, mesh_lib.default_param_rules())
    q = sh["layers"]["self_attn"]["q_proj"]["kernel"]
    assert q.spec == P(None, "fsdp", "tensor")
    assert sh["small"].spec in (P(), P(None))


def test_sharded_train_step_runs_and_matches_single_device():
    cfg = tiny_vla(max_image_text_tokens=16)
    model = PiZeroVLA(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    rng = np.random.default_rng(0)
    B = 8
    batch = _batch(cfg, B, rng)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"][:1], batch["pixel_values"][:1], batch["text_mask"][:1],
        batch["proprios"][:1], batch["actions"][:1],
        jnp.zeros((1,)), jnp.zeros((1, cfg.num_action_tokens, cfg.action_dim)),
    )
    loss_fn = make_flow_loss(model)
    tx = make_optimizer(1e-4, frozen_patterns=(r"vision_model/",), params=params)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(loss_fn, tx, donate=False)

    # single-device result
    s1, m1 = step(state, batch, jax.random.PRNGKey(1))

    # sharded over (2 data, 2 fsdp, 2 tensor)
    mesh = mesh_lib.make_mesh(dp=2, fsdp=2, tp=2)
    sstate, _ = shard_train_state(state, mesh)
    sbatch = jax.device_put(batch, mesh_lib.shard_batch(batch, mesh))
    s2, m2 = step(sstate, sbatch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    # frozen ViT params unchanged
    v1 = jax.tree_util.tree_leaves(s2.params["params"]["vision_model"])
    v0 = jax.tree_util.tree_leaves(params["params"]["vision_model"])
    for a, b in zip(v0, v1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # trained params moved
    q0 = params["params"]["joint"]["layers"]["expert"]["q_proj"]["kernel"]
    q2 = s2.params["params"]["joint"]["layers"]["expert"]["q_proj"]["kernel"]
    assert float(jnp.abs(q2 - q0).max()) > 0


def test_grad_accumulation_matches_large_batch():
    cfg = tiny_vla(max_image_text_tokens=16)
    model = PiZeroVLA(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    rng = np.random.default_rng(1)
    batch = _batch(cfg, 4, rng)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"][:1], batch["pixel_values"][:1], batch["text_mask"][:1],
        batch["proprios"][:1], batch["actions"][:1],
        jnp.zeros((1,)), jnp.zeros((1, cfg.num_action_tokens, cfg.action_dim)),
    )
    # deterministic loss (fixed t/x0) so accumulation comparison is exact
    def det_loss(params, b, rng):
        bs = b["input_ids"].shape[0]
        t = jnp.full((bs,), 0.5)
        x0 = jnp.ones((bs, cfg.num_action_tokens, cfg.action_dim)) * 0.1
        return model.apply(
            params, b["input_ids"], b["pixel_values"], b["text_mask"],
            b["proprios"], b["actions"], t, x0,
        )

    tx = make_optimizer(1e-3)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    s_full, m_full = make_train_step(det_loss, tx, donate=False)(
        state, batch, jax.random.PRNGKey(0)
    )
    micro = jax.tree_util.tree_map(
        lambda x: x.reshape((2, 2) + x.shape[1:]), batch
    )
    s_acc, m_acc = make_train_step(det_loss, tx, accum_steps=2, donate=False)(
        state, micro, jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(
        float(m_full["loss"]), float(m_acc["loss"]), rtol=1e-5
    )
    qf = s_full.params["params"]["joint"]["layers"]["expert"]["q_proj"]["kernel"]
    qa = s_acc.params["params"]["joint"]["layers"]["expert"]["q_proj"]["kernel"]
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qa), rtol=1e-4, atol=1e-6)


def test_no_involuntary_rematerialization_in_8dev_train_step(capfd):
    """Regression for the round-1 MULTICHIP gate warning: GSPMD must not
    fall back to replicate-then-repartition ("Involuntary full
    rematerialization") anywhere in the 2x2x2 flow-matching train step —
    the vit->mlp1 boundary used to trigger it (core/mesh.py mlp1 rule)."""
    cfg = tiny_vla(max_image_text_tokens=16)
    model = PiZeroVLA(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    rng = np.random.default_rng(0)
    batch = _batch(cfg, 8, rng)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"][:1], batch["pixel_values"][:1],
        batch["text_mask"][:1], batch["proprios"][:1], batch["actions"][:1],
        jnp.zeros((1,)), jnp.zeros((1, cfg.num_action_tokens, cfg.action_dim)),
    )
    mesh = mesh_lib.make_mesh(dp=2, fsdp=2, tp=2)
    tx = make_optimizer(1e-4, frozen_patterns=(r"vision_model/",), params=params)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state, _ = shard_train_state(state, mesh)
    sbatch = jax.device_put(batch, mesh_lib.shard_batch(batch, mesh))
    step = make_train_step(make_flow_loss(model), tx, donate=False)
    capfd.readouterr()  # drop anything buffered before the compile
    state, metrics = step(state, sbatch, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics["loss"])
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err[-2000:]
