"""RLDS pipeline tests on synthetic trajectory datasets (host tf.data)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from vlaser_tpu.data.rlds import (
    RLDSDatasetConfig,
    RLDSInterleavedIterator,
    apply_frame_transforms,
    apply_trajectory_transforms,
    compute_dataset_statistics,
    make_dataset_from_rlds,
    make_interleaved_dataset,
)


def _synthetic_traj_ds(n_traj=4, traj_len=10, action_dim=7, seed=0):
    rng = np.random.default_rng(seed)
    trajs = []
    for _ in range(n_traj):
        trajs.append(
            {
                "observation": {
                    "image_primary": rng.integers(
                        0, 255, (traj_len, 16, 16, 3), np.uint8
                    ),
                    "proprio": rng.standard_normal((traj_len, 7)).astype(np.float32),
                },
                "action": rng.standard_normal((traj_len, action_dim)).astype(
                    np.float32
                ),
                "language_instruction": np.array(
                    [b"pick up the block"] * traj_len
                ),
            }
        )

    def gen():
        yield from trajs

    spec = {
        "observation": {
            "image_primary": tf.TensorSpec((None, 16, 16, 3), tf.uint8),
            "proprio": tf.TensorSpec((None, 7), tf.float32),
        },
        "action": tf.TensorSpec((None, action_dim), tf.float32),
        "language_instruction": tf.TensorSpec((None,), tf.string),
    }
    return tf.data.Dataset.from_generator(gen, output_signature=spec), trajs


def test_statistics_and_normalization(tmp_path):
    ds, trajs = _synthetic_traj_ds()
    cache = str(tmp_path / "stats.json")
    cfg = RLDSDatasetConfig(
        name="synthetic", statistics_path=cache,
        norm_mask=[True] * 6 + [False],  # gripper not normalized
    )
    out, stats = make_dataset_from_rlds(cfg, trajectory_ds=ds)
    assert "p01" in stats["action"]
    assert stats["num_transitions"] == 40
    tr = next(out.as_numpy_iterator())
    assert tr["action"][:, :6].min() >= -1.0 and tr["action"][:, :6].max() <= 1.0
    # gripper dim untouched
    raw = trajs[0]["action"][:, 6]
    np.testing.assert_allclose(tr["action"][:, 6], raw, rtol=1e-5)
    # cached stats load
    import os
    assert os.path.exists(cache)
    _, stats2 = make_dataset_from_rlds(cfg, trajectory_ds=_synthetic_traj_ds()[0])
    assert stats2["action"]["p01"] == stats["action"]["p01"]


def test_trajectory_chunking():
    ds, trajs = _synthetic_traj_ds(n_traj=1, traj_len=6)
    cfg = RLDSDatasetConfig(name="s", action_normalization="none",
                            proprio_normalization="none")
    out, _ = make_dataset_from_rlds(cfg, trajectory_ds=ds, statistics={"action": {}})
    frames = list(
        apply_trajectory_transforms(out, window_size=2, action_horizon=3)
        .as_numpy_iterator()
    )
    assert len(frames) == 6
    f0 = frames[0]
    assert f0["observation"]["image_primary"].shape == (2, 16, 16, 3)
    assert f0["action"].shape == (3, 7)
    # first frame history clamps to t=0
    np.testing.assert_array_equal(
        f0["observation"]["image_primary"][0], f0["observation"]["image_primary"][1]
    )
    # last frame's future actions padded (clamped) + mask marks invalid
    flast = frames[-1]
    assert flast["action_pad_mask"].tolist() == [True, False, False]
    np.testing.assert_array_equal(flast["action"][1], flast["action"][0])


def test_interleaved_batches():
    ds1, _ = _synthetic_traj_ds(seed=1)
    ds2, _ = _synthetic_traj_ds(seed=2)
    cfg = RLDSDatasetConfig(name="s", action_normalization="none",
                            proprio_normalization="none")
    frames = []
    for d in (ds1, ds2):
        out, _ = make_dataset_from_rlds(cfg, trajectory_ds=d, statistics={"action": {}})
        f = apply_trajectory_transforms(out, window_size=1, action_horizon=4)
        f = apply_frame_transforms(f, resize=(8, 8))
        frames.append(f)
    mixed = make_interleaved_dataset(
        frames, weights=[0.7, 0.3], shuffle_buffer_size=64, batch_size=8
    )
    it = iter(RLDSInterleavedIterator(mixed))
    batch = next(it)
    assert batch["observation"]["image_primary"].shape == (8, 1, 8, 8, 3)
    assert batch["action"].shape == (8, 4, 7)
    batch2 = next(it)  # repeats forever
    assert batch2["action"].shape == (8, 4, 7)


def test_binarize_gripper_reverse_scan():
    from vlaser_tpu.data.rlds import binarize_gripper_actions

    # open(1.0) -> intermediates -> closed(0.0): intermediates take the NEXT
    # settled state (0), trailing intermediates take the final raw action
    acts = tf.constant([1.0, 0.6, 0.4, 0.0, 0.0, 0.5], tf.float32)
    out = binarize_gripper_actions(acts).numpy()
    np.testing.assert_allclose(out, [1, 0, 0, 0, 0, 0.5])


def test_rel2abs_gripper():
    from vlaser_tpu.data.rlds import rel2abs_gripper_actions

    # relative: +1 close at t=2 -> closed (0) from then on; starts open (1)
    acts = tf.constant([0.0, 0.0, 1.0, 0.0, -1.0, 0.0], tf.float32)
    out = rel2abs_gripper_actions(acts).numpy()
    np.testing.assert_allclose(out, [1, 1, 0, 0, 1, 1])


def test_relabel_actions_movement_delta():
    from vlaser_tpu.data.rlds import relabel_actions

    state = np.zeros((4, 7), np.float32)
    state[:, 0] = [0.0, 1.0, 3.0, 6.0]  # x moves by 1, 2, 3
    traj = {
        "observation": {"state": tf.constant(state)},
        "action": tf.constant(np.ones((4, 7), np.float32)),
    }
    out = relabel_actions(traj)
    acts = out["action"].numpy()
    assert acts.shape == (3, 7)  # last step dropped
    np.testing.assert_allclose(acts[:, 0], [1, 2, 3])
    np.testing.assert_allclose(acts[:, -1], 1)  # gripper passthrough


def test_quaternion_to_euler_matches_geometry():
    from vlaser_tpu.data.rlds import quaternion_to_euler
    from vlaser_tpu.envs.geometry import euler2quat

    rng = np.random.default_rng(0)
    for _ in range(20):
        rpy = rng.uniform(-1.2, 1.2, 3)  # avoid gimbal lock region
        q_wxyz = euler2quat(*rpy)
        q_xyzw = np.array([q_wxyz[1], q_wxyz[2], q_wxyz[3], q_wxyz[0]])
        out = quaternion_to_euler(tf.constant(q_xyzw[None], tf.float32)).numpy()[0]
        np.testing.assert_allclose(out, rpy, atol=1e-5)


def test_augmentation_changes_image_deterministically():
    from vlaser_tpu.data.rlds import AUGMENT_KWARGS_PRIMARY, augment_image

    rng = np.random.default_rng(0)
    img = tf.constant(rng.integers(0, 255, (32, 32, 3), np.uint8))
    a = augment_image(img, tf.constant([3, 7]), AUGMENT_KWARGS_PRIMARY).numpy()
    b = augment_image(img, tf.constant([3, 7]), AUGMENT_KWARGS_PRIMARY).numpy()
    c = augment_image(img, tf.constant([9, 1]), AUGMENT_KWARGS_PRIMARY).numpy()
    assert a.shape == (32, 32, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)  # same seed -> same augmentation
    assert (a != c).any()  # different seed -> different
    assert (a != img.numpy()).any()  # actually augmented


def test_frame_transforms_with_augmentation():
    from vlaser_tpu.data.rlds import AUGMENT_KWARGS_PRIMARY

    ds, _ = _synthetic_traj_ds()
    frames = apply_trajectory_transforms(ds, window_size=2, action_horizon=4)
    out = apply_frame_transforms(
        frames, resize=(24, 24), train=True,
        image_augment_kwargs=AUGMENT_KWARGS_PRIMARY,
    )
    f = next(iter(out.as_numpy_iterator()))
    assert f["observation"]["image_primary"].shape == (2, 24, 24, 3)
    assert f["observation"]["image_primary"].dtype == np.uint8


def test_goal_relabel_uniform():
    from vlaser_tpu.data.rlds import goal_relabel_uniform

    ds, trajs = _synthetic_traj_ds(n_traj=1, traj_len=10)
    traj = next(iter(ds))
    out = goal_relabel_uniform(traj, max_goal_distance=3, seed=0)
    assert "task" in out
    goal_prop = out["task"]["proprio"].numpy()
    prop = trajs[0]["observation"]["proprio"]
    # every goal must be a real future observation within distance 3
    for t in range(10):
        dists = np.abs(prop[t : t + 4] - goal_prop[t]).sum(axis=1)
        assert dists.min() < 1e-6, t


def test_chunking_carries_task():
    from vlaser_tpu.data.rlds import goal_relabel_uniform

    ds, _ = _synthetic_traj_ds(n_traj=1, traj_len=6)
    frames = apply_trajectory_transforms(
        ds, window_size=1, action_horizon=2,
        goal_relabeling_strategy="uniform",
        goal_relabeling_kwargs={"seed": 0},
    )
    f = next(iter(frames.as_numpy_iterator()))
    assert "task" in f and f["task"]["proprio"].shape == (7,)


def test_skip_unlabeled():
    ds, _ = _synthetic_traj_ds(n_traj=1, traj_len=4)

    def clear_lang(t):
        t = dict(t)
        t["language_instruction"] = tf.fill(
            tf.shape(t["language_instruction"]), ""
        )
        return t

    unlabeled = ds.map(clear_lang)
    frames = apply_trajectory_transforms(unlabeled, skip_unlabeled=True)
    assert len(list(frames.as_numpy_iterator())) == 0


def test_bridge_standardize_binarizes_and_relabels():
    from vlaser_tpu.data.rlds import bridge_standardize

    T = 5
    state = np.zeros((T, 7), np.float32)
    state[:, 1] = np.arange(T)  # y moves 1/step
    raw = {
        "observation": {
            "image_0": np.zeros((T, 8, 8, 3), np.uint8),
            "state": tf.constant(state),
        },
        "action": tf.constant(
            np.concatenate(
                [np.zeros((T, 6), np.float32),
                 np.array([[1.0], [0.5], [0.0], [0.0], [1.0]], np.float32)],
                axis=1,
            )
        ),
        "language_instruction": tf.constant([b"x"] * T),
    }
    out = bridge_standardize(raw)
    acts = out["action"].numpy()
    assert acts.shape == (T - 1, 7)  # relabel drops last step
    np.testing.assert_allclose(acts[:, 1], 1.0)  # movement from state deltas
    # gripper binarized: 1.0, 0.5->next settled (0), 0, 0
    np.testing.assert_allclose(acts[:, -1], [1, 0, 0, 0])


def test_fractal_standardize_proprio_euler():
    from vlaser_tpu.data.rlds import fractal_standardize
    from vlaser_tpu.envs.geometry import euler2quat

    T = 3
    rpy = np.array([0.1, -0.2, 0.3])
    q_wxyz = euler2quat(*rpy)
    q_xyzw = np.array([q_wxyz[1], q_wxyz[2], q_wxyz[3], q_wxyz[0]], np.float32)
    pose = np.concatenate([np.arange(3, dtype=np.float32), q_xyzw])
    raw = {
        "observation": {
            "image": np.zeros((T, 8, 8, 3), np.uint8),
            "base_pose_tool_reached": tf.constant(np.tile(pose, (T, 1))),
            "gripper_closed": tf.constant(np.zeros((T, 1), np.float32)),
            "natural_language_instruction": tf.constant([b"y"] * T),
        },
        "action": {
            "world_vector": tf.constant(np.ones((T, 3), np.float32)),
            "rotation_delta": tf.constant(np.zeros((T, 3), np.float32)),
            "gripper_closedness_action": tf.constant(
                np.array([[0.0], [1.0], [0.0]], np.float32)
            ),
        },
    }
    out = fractal_standardize(raw)
    prop = out["observation"]["proprio"].numpy()
    assert prop.shape == (T, 7)
    np.testing.assert_allclose(prop[0, :3], [0, 1, 2], atol=1e-6)
    np.testing.assert_allclose(prop[0, 3:6], rpy, atol=1e-5)  # quat -> euler
    acts = out["action"].numpy()
    # rel2abs: starts open (1), closes at t=1 -> 0
    np.testing.assert_allclose(acts[:, -1], [1, 0, 0])
