"""Closed-loop eval harness tests with mock environments (no SAPIEN):
full integration PolicyServer + adapter + tiny VLA; RoboTwin one-pass policy;
point-grounding metric."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import tiny_vla, tiny_vlm
from vlaser_tpu.envs.adapters import BridgeSimplerAdapter
from vlaser_tpu.eval.point_eval import evaluate_points, parse_points, point_in_radius
from vlaser_tpu.eval.robotwin_eval import (
    RoboTwinEvalConfig,
    RoboTwinPolicy,
    eval_policy,
)
from vlaser_tpu.eval.simpler_eval import EvalConfig, EvalRunner, run_variant_aggregation
from vlaser_tpu.image.tiling import normalize_uint8
from vlaser_tpu.policy.parallel_decoding import (
    ParallelDecodingConfig,
    ParallelDecodingVLA,
    SequenceBuilder,
)
from vlaser_tpu.policy.pizero import PiZeroVLA
from vlaser_tpu.policy.processing import InternVLAProcessor
from vlaser_tpu.serve.policy_server import PolicyServer

STATS = {
    "action": {"p01": [-0.02] * 6 + [0.0], "p99": [0.02] * 6 + [1.0],
               "mean": [0.0] * 7, "std": [0.01] * 7},
    "proprio": {"p01": [-0.5] * 6 + [0.0], "p99": [0.5] * 6 + [1.0],
                "mean": [0.0] * 7, "std": [0.2] * 7},
}


class TinyTok:
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=False, **kw):
        ids = []
        i = 0
        while i < len(text):
            if text.startswith("<IMG_CONTEXT>", i):
                ids.append(500)
                i += len("<IMG_CONTEXT>")
            elif text.startswith("<img>", i):
                ids.append(498)
                i += 5
            elif text.startswith("</img>", i):
                ids.append(499)
                i += 6
            else:
                ids.append(ord(text[i]) % 490)
                i += 1
        return {"input_ids": ids}


class MockSimplerEnv:
    """Gym-like env: succeeds when cumulative |dx| motion exceeds a bound."""

    class _Unwrapped:
        def seed(self, s):
            self._seed = s

        def get_language_instruction(self):
            return "put the carrot on the plate"

    def __init__(self):
        self.unwrapped = self._Unwrapped()
        self.t = 0

    def reset(self):
        self.t = 0
        return self._obs(), {}

    def _obs(self):
        return {"agent": {"eef_pos": np.array([0.1, 0.0, 0.2, 1, 0, 0, 0, 0.5])}}

    def step(self, action):
        assert action.shape == (7,)
        self.t += 1
        truncated = self.t >= 12
        success = self.t >= 6
        return self._obs(), float(success), success, truncated, {"success": success}


@pytest.mark.filterwarnings("ignore")
def test_policy_server_closed_loop():
    cfg = tiny_vla(max_image_text_tokens=32)
    model = PiZeroVLA(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    img = cfg.vlm.vision.image_size
    proc = InternVLAProcessor(TinyTok(), num_image_tokens=cfg.vlm.num_image_token,
                              max_seq_len=32, pad_token_id=0)
    adapter = BridgeSimplerAdapter(dataset_statistics=STATS, image_size=(img, img))
    # init params via the training signature
    S = cfg.max_image_text_tokens
    dummy = proc(["x"], np.zeros((1, 1, img, img, 3), np.uint8))
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(dummy["input_ids"]),
        jnp.zeros((1, img, img, 3)), jnp.asarray(dummy["attention_mask"]),
        jnp.zeros((1, cfg.cond_steps, cfg.proprio_dim)),
        jnp.zeros((1, cfg.num_action_tokens, cfg.action_dim)),
        jnp.zeros((1,)), jnp.zeros((1, cfg.num_action_tokens, cfg.action_dim)),
    )
    server = PolicyServer(model, params, adapter, proc, act_steps=4)
    env = MockSimplerEnv()
    runner = EvalRunner(
        EvalConfig(task="mock", n_eval_episode=2, act_steps=4, max_steps=12),
        server, env=env,
        get_image=lambda env, obs: np.zeros((64, 48, 3), np.uint8),
    )
    summary = runner.run()
    assert summary["n_episodes"] == 2
    assert summary["success_rate"] == 1.0

    va = run_variant_aggregation(
        EvalConfig(task="mock", n_eval_episode=1, act_steps=4, max_steps=12),
        server,
        variants=[{"a": 1}, {"a": 2}],
        env_factory=lambda v: MockSimplerEnv(),
        get_image=lambda env, obs: np.zeros((64, 48, 3), np.uint8),
    )
    assert 0.0 <= va["variant_aggregation_success"] <= 1.0
    assert len(va["per_variant"]) == 2


class MockRoboTwinEnv:
    def __init__(self, expert_fail_eps=()):
        self.expert_fail_eps = set(expert_fail_eps)
        self.ep = -1
        self.moved = 0.0

    def reset_with_seed(self, seed):
        self.seed = seed
        self.ep += 1
        self.moved = 0.0

    def play_expert_once(self):
        return (self.seed % 7) not in self.expert_fail_eps

    def get_observation(self):
        return {
            "image": np.zeros((28, 28, 3), np.uint8),
            "qpos": np.zeros(6, np.float32),
            "instruction": "beat the block with the hammer",
        }

    def step_qpos(self, q):
        self.moved += 1

    def check_success(self):
        return self.moved >= 3


TOKENS = {
    "bos": 1, "eos": 2, "soi": 400, "eoi": 401, "sot": 402, "eot": 403,
    "left_arm_soa": 404, "left_arm_eoa": 405, "right_arm_soa": 406,
    "right_arm_eoa": 407, "left_arm_sost": 408, "left_arm_eost": 409,
    "right_arm_sost": 410, "right_arm_eost": 411, "img_context": 500,
}


def test_robotwin_eval_loop():
    cfg = ParallelDecodingConfig(
        vlm=tiny_vlm(), action_chunk=4, action_dim=6, state_dim=6,
        state_vocab_size=16, max_text_tokens=8, head_hidden=32,
    )
    model = ParallelDecodingVLA(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    builder = SequenceBuilder(cfg, TOKENS, state_token_start=420, pad_token_id=0)
    tok = TinyTok()
    text = np.zeros((1, 8), np.int64)
    ids, mask = builder.build(text, np.zeros((1, 6)))
    img = cfg.vlm.vision.image_size
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids),
        jnp.zeros((1, img, img, 3)), jnp.asarray(mask),
    )

    def norm(images):  # resize mock 28x28 already correct
        return normalize_uint8(images)

    policy = RoboTwinPolicy(model, params, builder, tok, norm)
    env = MockRoboTwinEnv(expert_fail_eps={0})
    res = eval_policy(
        RoboTwinEvalConfig(test_num=3, step_lim=8, chunk_exec=4), env, policy
    )
    assert res["evaluated"] >= 1
    assert 0.0 <= res["success_rate"] <= 1.0
    skipped = [e for e in res["episodes"] if e.get("skipped")]
    assert len(skipped) + res["evaluated"] == 3


def test_point_metrics():
    assert point_in_radius((10, 10), [(30, 10)], radius=25)
    assert not point_in_radius((10, 10), [(40, 10)], radius=25)
    assert parse_points("the point is [123, 45] ok [6,7]") == [(123, 45), (6, 7)]
    gt = {("img.jpg", "red cup"): [(100, 100)]}
    preds = [
        {"image": "img.jpg", "expression": "red cup", "response": "[105, 98]",
         "width": 640, "height": 480},
        {"image": "img.jpg", "expression": "red cup", "response": "[400, 400]",
         "width": 640, "height": 480},
    ]
    res = evaluate_points(preds, gt)
    assert res["num_evaluated"] == 2 and res["num_correct"] == 1
    assert res["accuracy"] == 0.5


def test_episodes_for_spec_protocol_counts():
    """Episode enumeration matches the reference protocol: VM coke-can =
    5x5 object grid per spec; VM move-near = 60 object episodes per spec."""
    from vlaser_tpu.eval.simpler_eval import episodes_for_spec, fractal_variant_specs

    vm_coke = fractal_variant_specs("google_robot_pick_coke_can", "vm")
    eps = episodes_for_spec(vm_coke[0])
    assert len(eps) == 25  # 1 robot pose x 5x5 obj grid
    assert "robot_init_options" in eps[0] and "obj_init_options" in eps[0]
    assert eps[0]["obj_init_options"]["init_xy"].shape == (2,)

    vm_mn = fractal_variant_specs("google_robot_move_near_v0", "vm")
    eps = episodes_for_spec(vm_mn[0])
    assert len(eps) == 60
    assert eps[0]["obj_init_options"] == {"episode_id": 0}
    assert eps[-1]["obj_init_options"] == {"episode_id": 59}

    # VA drawer: 3x3 robot poses, single obj position
    va_drawer = fractal_variant_specs("google_robot_open_drawer", "va")
    eps = episodes_for_spec(va_drawer[0])
    assert len(eps) == 9


def test_run_fractal_protocol_with_mock_env():
    """The full VM sweep drives a mock env once per protocol episode."""
    from vlaser_tpu.eval.simpler_eval import EvalConfig, run_fractal_protocol

    class MockEnv:
        def __init__(self, spec):
            self.spec_seen = spec
            self.resets = []
            self.unwrapped = self

        def get_language_instruction(self):
            return "pick the coke can"

        def reset(self, options=None):
            self.resets.append(options)
            return {"obs": 0}, {}

        def step(self, action):
            return {"obs": 0}, 1.0, True, True, {"success": True}

        def seed(self, s):
            pass

        def close(self):
            pass

    class MockPolicy:
        def reset(self, instruction):
            self.instruction = instruction

        def step(self, obs, image):
            import numpy as np

            return np.zeros((4, 7), np.float32)

    envs = []

    def factory(spec):
        e = MockEnv(spec)
        envs.append(e)
        return e

    out = run_fractal_protocol(
        EvalConfig(act_steps=4), MockPolicy(), "google_robot_move_near_v0",
        protocol="vm", env_factory=factory,
        get_image=lambda env, obs: __import__("numpy").zeros((8, 8, 3)),
    )
    assert out["aggregate_success"] == 1.0
    assert len(envs) == 4  # 4 urdf variants
    # every env saw all 60 protocol episodes with reset options
    assert all(len(e.resets) == 60 for e in envs)
    assert envs[0].resets[0] is not None
    assert "robot_init_options" in envs[0].resets[0]


@pytest.mark.filterwarnings("ignore")
def test_policy_server_fused_path_matches_xla():
    """PolicyServer(fused=True): the fused serving step (policy/fused_infer,
    interpret on CPU) returns the same action chunk as the XLA path for the
    same deterministic noise key."""
    from vlaser_tpu.core.quant import POLICY_PATTERNS, quantize_variables

    cfg = tiny_vla(max_image_text_tokens=32)
    model = PiZeroVLA(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    img = cfg.vlm.vision.image_size
    proc = InternVLAProcessor(TinyTok(),
                              num_image_tokens=cfg.vlm.num_image_token,
                              max_seq_len=32, pad_token_id=0)
    dummy = proc(["x"], np.zeros((1, 1, img, img, 3), np.uint8))
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(dummy["input_ids"]),
        jnp.zeros((1, img, img, 3)), jnp.asarray(dummy["attention_mask"]),
        jnp.zeros((1, cfg.cond_steps, cfg.proprio_dim)),
        jnp.zeros((1, cfg.num_action_tokens, cfg.action_dim)),
        jnp.zeros((1,)), jnp.zeros((1, cfg.num_action_tokens, cfg.action_dim)),
    )
    qparams = quantize_variables(params, POLICY_PATTERNS)
    obs = {"agent": {"eef_pos": np.zeros((8,), np.float32)}}
    frame = np.zeros((64, 48, 3), np.uint8)

    outs = []
    for fused in (False, True):
        adapter = BridgeSimplerAdapter(dataset_statistics=STATS,
                                       image_size=(img, img))
        server = PolicyServer(model, qparams, adapter, proc, act_steps=4,
                              seed=0, fused=fused)
        server.reset("pick the cube")
        outs.append(server.step(obs, frame))
    np.testing.assert_allclose(outs[0], outs[1], rtol=0.05, atol=0.05)
