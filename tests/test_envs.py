"""Geometry + env adapter + processor + checkpoint tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.envs import geometry as geo
from vlaser_tpu.envs.adapters import (
    BridgeSimplerAdapter,
    EDRSimplerAdapter,
    denormalize_bound,
    normalize_bound,
)


class TestGeometry:
    def test_euler_mat_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            e = rng.uniform(-1.2, 1.2, 3)
            M = geo.euler2mat(*e)
            back = geo.mat2euler(M)
            np.testing.assert_allclose(back, e, atol=1e-9)

    def test_quat_mat_roundtrip(self):
        rng = np.random.default_rng(1)
        for _ in range(20):
            q = rng.standard_normal(4)
            q /= np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            M = geo.quat2mat(q)
            back = geo.mat2quat(M)
            np.testing.assert_allclose(back, q, atol=1e-8)
            assert np.allclose(M @ M.T, np.eye(3), atol=1e-10)

    def test_euler2axangle_consistency(self):
        """axis*angle rotation must reproduce the euler rotation matrix."""
        rng = np.random.default_rng(2)
        for _ in range(20):
            e = rng.uniform(-1.0, 1.0, 3)
            axis, angle = geo.euler2axangle(*e)
            q = geo.axangle2quat(axis, angle)
            np.testing.assert_allclose(
                geo.quat2mat(q), geo.euler2mat(*e), atol=1e-9
            )

    def test_scipy_cross_check(self):
        pytest.importorskip("scipy")
        from scipy.spatial.transform import Rotation as R

        e = [0.3, -0.5, 0.9]
        np.testing.assert_allclose(
            geo.euler2mat(*e), R.from_euler("xyz", e).as_matrix(), atol=1e-10
        )


STATS = {
    "action": {
        "p01": [-0.02] * 6 + [0.0],
        "p99": [0.02] * 6 + [1.0],
        "mean": [0.0] * 7,
        "std": [0.01] * 7,
    },
    "proprio": {
        "p01": [-0.5] * 6 + [0.0],
        "p99": [0.5] * 6 + [1.0],
        "mean": [0.0] * 7,
        "std": [0.2] * 7,
    },
}


class TestAdapters:
    def test_normalize_roundtrip(self):
        x = np.array([0.01, -0.005, 0.0])
        lo, hi = np.array([-0.02] * 3), np.array([0.02] * 3)
        n = normalize_bound(x, lo, hi)
        # the reference's normalize adds eps to the range but denormalize does
        # not (env_adapter/base.py) -> roundtrip exact only to ~1e-7
        np.testing.assert_allclose(denormalize_bound(n, lo, hi), x, atol=1e-7)

    def test_bridge_postprocess(self):
        ad = BridgeSimplerAdapter(dataset_statistics=STATS, image_size=(448, 448))
        acts = np.zeros((4, 7))
        acts[:, -1] = [0.2, 0.6, 0.9, 0.4]
        out = ad.postprocess(acts)
        assert out.shape == (4, 7)
        np.testing.assert_array_equal(out[:, -1], [-1.0, 1.0, 1.0, -1.0])

    def test_bridge_proprio_topdown_frame(self):
        ad = BridgeSimplerAdapter(dataset_statistics=STATS)
        # identity orientation -> rotated by default_rot.T
        obs = {"agent": {"eef_pos": np.array([0.1, 0.2, 0.3, 1, 0, 0, 0, 0.7])}}
        raw = ad.preprocess_proprio(obs)
        want_rpy = geo.mat2euler(np.eye(3) @ ad.DEFAULT_ROT.T)
        np.testing.assert_allclose(raw[3:6], want_rpy, atol=1e-10)
        assert raw[-1] == 0.7

    def test_edr_sticky_gripper(self):
        ad = EDRSimplerAdapter(dataset_statistics=STATS)
        ad.reset()
        # strong close command triggers sticky mode
        first = ad.postprocess_gripper(1.0)  # a=1 -> relative=-1 (sticky on)
        assert first == -1.0
        # subsequent weak commands keep returning the sticky action
        for _ in range(13):
            assert ad.postprocess_gripper(0.5) == -1.0
        # 15th repeat resets
        assert ad.postprocess_gripper(0.5) == -1.0
        assert ad.sticky_action_is_on is False


class DummyTokenizer:
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=False):
        # crude: map each '<IMG_CONTEXT>' to id 9, other chars to bytes
        ids = []
        i = 0
        while i < len(text):
            if text.startswith("<IMG_CONTEXT>", i):
                ids.append(9)
                i += len("<IMG_CONTEXT>")
            else:
                ids.append(min(255, ord(text[i])))
                i += 1
        return {"input_ids": ids}


class TestProcessor:
    def test_prompt_and_padding(self):
        from vlaser_tpu.policy.processing import InternVLAProcessor

        proc = InternVLAProcessor(DummyTokenizer(), num_image_tokens=4, max_seq_len=64)
        prompt = proc.build_prompt("pick up the spoon")
        assert prompt.count("<IMG_CONTEXT>") == 4
        assert prompt.startswith("<|im_start|>system\nNone<|im_end|>\n")
        assert prompt.endswith("<|im_start|>assistant\n")
        out = proc(["pick"], np.zeros((1, 1, 8, 8, 3), np.uint8))
        assert out["input_ids"].shape == (1, 64)
        assert out["attention_mask"].sum() > 0
        assert (out["input_ids"] == 9).sum() == 4
        assert out["pixel_values"].shape == (1, 8, 8, 3)


def test_checkpoint_roundtrip(tmp_path):
    import optax

    from vlaser_tpu.train.train_step import TrainState
    from vlaser_tpu.utils.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    tx = optax.adam(1e-3)
    state = TrainState(params, tx.init(params), jnp.asarray(5, jnp.int32))
    save_checkpoint(str(tmp_path / "ckpt"), 5, state, data_state={"epoch": 2})
    assert latest_step(str(tmp_path / "ckpt")) == 5
    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored, data = restore_checkpoint(str(tmp_path / "ckpt"), zero)
    np.testing.assert_array_equal(restored.params["w"], params["w"])
    assert int(restored.step) == 5
