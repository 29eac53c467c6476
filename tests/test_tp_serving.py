"""Tensor-parallel serving: TP-sharded infer_action over an 8-device mesh
matches the single-device result (GSPMD serving path, serve/policy_server.
shard_policy_params)."""

import jax
import jax.numpy as jnp
import numpy as np

from vlaser_tpu.core.config import tiny_vla
from vlaser_tpu.core.mesh import make_mesh
from vlaser_tpu.core.quant import POLICY_PATTERNS, quantize_variables
from vlaser_tpu.policy.pizero import PiZeroVLA
from vlaser_tpu.serve.policy_server import shard_policy_params


def test_tp_sharded_infer_action_matches_single_device():
    cfg = tiny_vla(max_image_text_tokens=16)
    model = PiZeroVLA(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    B, S = 1, cfg.max_image_text_tokens
    img = cfg.vlm.vision.image_size
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 400, (B, S)).astype(np.int32)
    ids[:, 2] = cfg.vlm.img_context_token_id
    args = (
        jnp.asarray(ids),
        jnp.asarray(rng.standard_normal((B, img, img, 3)).astype(np.float32)),
        jnp.ones((B, S), jnp.int32),
        jnp.asarray(rng.standard_normal(
            (B, cfg.cond_steps, cfg.proprio_dim)).astype(np.float32)),
    )
    noise = jnp.asarray(rng.standard_normal(
        (B, cfg.num_action_tokens, cfg.action_dim)).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), *args,
        jnp.zeros((B, cfg.num_action_tokens, cfg.action_dim)),
        jnp.zeros((B,)), noise,
    )
    qvars = quantize_variables(variables, POLICY_PATTERNS)

    want = np.asarray(model.apply(qvars, *args, noise,
                                  method=model.infer_action))

    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    sharded = shard_policy_params(qvars, mesh)
    # at least one kernel must actually be tensor-sharded (not all-replicated)
    leaves = jax.tree_util.tree_leaves(sharded)
    assert any(
        not l.sharding.is_fully_replicated for l in leaves
    ), "TP sharding produced only replicated params"

    got = np.asarray(jax.jit(
        lambda v, *a: model.apply(v, *a, method=model.infer_action)
    )(sharded, *args, noise))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_policy_server_fused_on_mesh_falls_back_and_matches():
    """PolicyServer(fused=True, mesh=8dev): the fused single-kernel path does
    not partition under GSPMD, so the server must explicitly fall back to the
    TP-sharded XLA path (serving_path == 'xla') and still produce the same
    action chunk as the single-chip fused server for the same noise seed."""
    from test_eval import STATS, TinyTok
    from vlaser_tpu.envs.adapters import BridgeSimplerAdapter
    from vlaser_tpu.policy.processing import InternVLAProcessor
    from vlaser_tpu.serve.policy_server import PolicyServer

    cfg = tiny_vla(max_image_text_tokens=32)
    model = PiZeroVLA(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    img = cfg.vlm.vision.image_size
    proc = InternVLAProcessor(TinyTok(),
                              num_image_tokens=cfg.vlm.num_image_token,
                              max_seq_len=32, pad_token_id=0)
    dummy = proc(["x"], np.zeros((1, 1, img, img, 3), np.uint8))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(dummy["input_ids"]),
        jnp.zeros((1, img, img, 3)), jnp.asarray(dummy["attention_mask"]),
        jnp.zeros((1, cfg.cond_steps, cfg.proprio_dim)),
        jnp.zeros((1, cfg.num_action_tokens, cfg.action_dim)),
        jnp.zeros((1,)), jnp.zeros((1, cfg.num_action_tokens, cfg.action_dim)),
    )
    qvars = quantize_variables(variables, POLICY_PATTERNS)
    obs = {"agent": {"eef_pos": np.zeros((8,), np.float32)}}
    frame = np.zeros((64, 48, 3), np.uint8)

    outs, paths = [], []
    for mesh in (None, make_mesh(dp=1, fsdp=2, tp=4)):
        adapter = BridgeSimplerAdapter(dataset_statistics=STATS,
                                       image_size=(img, img))
        server = PolicyServer(model, qvars, adapter, proc, act_steps=4,
                              seed=0, mesh=mesh, fused=True)
        paths.append(server.serving_path)
        server.reset("pick the cube")
        outs.append(server.step(obs, frame))
    assert paths == ["fused", "xla"]
    np.testing.assert_allclose(outs[0], outs[1], rtol=0.05, atol=0.05)
