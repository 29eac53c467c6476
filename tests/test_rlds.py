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
