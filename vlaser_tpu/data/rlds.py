"""RLDS / Open-X-Embodiment data pipeline (tf.data on host CPU -> numpy feed).

Parity surface: Simpler/src/data/dataset.py —
- make_dataset_from_rlds (:258): restructure episodes to a standard schema
  {observation: {image_primary, proprio}, action, language_instruction},
  normalize action/proprio (bound p01/p99 or gaussian), dataset-statistics
  computation with JSON caching
- apply_trajectory_transforms (:33): window chunking (obs history window_size,
  action future horizon), per-transition padding masks, subsampling
- apply_frame_transforms (:179): image decode + resize (+ optional augment)
- make_interleaved_dataset (:497): weighted mixture over datasets, shuffle,
  repeat, batch
- agent/dataset.py TorchRLDSInterleavedDataset -> here a numpy iterator that
  feeds jax.device_put directly (no torch bridge needed).

The reference's dlimp dependency is replaced by plain tf.data ops.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


def _tf():
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    return tf


@dataclass
class RLDSDatasetConfig:
    name: str
    data_dir: str = ""
    image_key: str = "image_primary"
    # standardize_fn: raw trajectory dict -> {observation:{image, proprio},
    # action, language_instruction}
    standardize_fn: Optional[Callable] = None
    action_normalization: str = "bound"  # bound | gaussian | none
    proprio_normalization: str = "bound"
    norm_mask: Optional[Sequence[bool]] = None  # dims to normalize (gripper off)
    statistics_path: Optional[str] = None
    weight: float = 1.0


def compute_dataset_statistics(ds, cache_path: Optional[str] = None) -> Dict:
    """p01/p99/mean/std over action and proprio; JSON-cached
    (dataset.py:258 stats cache behavior)."""
    if cache_path and os.path.exists(cache_path):
        with open(cache_path) as f:
            return json.load(f)
    actions, proprios = [], []
    for traj in ds.as_numpy_iterator():
        actions.append(traj["action"].reshape(-1, traj["action"].shape[-1]))
        if "proprio" in traj["observation"]:
            proprios.append(
                traj["observation"]["proprio"].reshape(
                    -1, traj["observation"]["proprio"].shape[-1]
                )
            )
    acts = np.concatenate(actions, 0)
    stats = {
        "action": {
            "p01": np.percentile(acts, 1, axis=0).tolist(),
            "p99": np.percentile(acts, 99, axis=0).tolist(),
            "mean": acts.mean(0).tolist(),
            "std": acts.std(0).tolist(),
        },
        "num_transitions": int(acts.shape[0]),
    }
    if proprios:
        pr = np.concatenate(proprios, 0)
        stats["proprio"] = {
            "p01": np.percentile(pr, 1, axis=0).tolist(),
            "p99": np.percentile(pr, 99, axis=0).tolist(),
            "mean": pr.mean(0).tolist(),
            "std": pr.std(0).tolist(),
        }
    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        with open(cache_path, "w") as f:
            json.dump(stats, f)
    return stats


def _normalize(tensor, stats, kind: str, mask=None):
    tf = _tf()
    if kind == "none":
        return tensor
    if kind == "bound":
        lo = tf.constant(stats["p01"], tf.float32)
        hi = tf.constant(stats["p99"], tf.float32)
        normed = tf.clip_by_value(2.0 * (tensor - lo) / (hi - lo + 1e-8) - 1.0, -1, 1)
    else:
        mean = tf.constant(stats["mean"], tf.float32)
        std = tf.constant(stats["std"], tf.float32)
        normed = (tensor - mean) / (std + 1e-8)
    if mask is not None:
        m = tf.constant(np.asarray(mask, bool))
        normed = tf.where(m, normed, tensor)
    return normed


def make_dataset_from_rlds(
    cfg: RLDSDatasetConfig,
    *,
    train: bool = True,
    builder=None,
    trajectory_ds=None,
    statistics: Optional[Dict] = None,
):
    """-> (trajectory tf.data.Dataset, statistics dict).

    `trajectory_ds` lets tests inject synthetic episode datasets; otherwise
    `builder` (a tfds builder) or cfg.name/data_dir is used.
    """
    tf = _tf()
    if trajectory_ds is None:
        import tensorflow_datasets as tfds

        if builder is None:
            builder = tfds.builder(cfg.name, data_dir=cfg.data_dir)
        split = "train" if train else "val"
        ds = builder.as_dataset(split=split, shuffle_files=train)

        def to_traj(ep):
            steps = ep["steps"].batch(int(1e9)).get_single_element()
            return steps

        ds = ds.map(to_traj, num_parallel_calls=tf.data.AUTOTUNE)
    else:
        ds = trajectory_ds

    if cfg.standardize_fn is not None:
        ds = ds.map(cfg.standardize_fn, num_parallel_calls=tf.data.AUTOTUNE)

    if statistics is None:
        statistics = compute_dataset_statistics(ds, cfg.statistics_path)

    def normalize(traj):
        traj = dict(traj)
        traj["action"] = _normalize(
            tf.cast(traj["action"], tf.float32),
            statistics["action"], cfg.action_normalization, cfg.norm_mask,
        )
        obs = dict(traj["observation"])
        if "proprio" in obs and "proprio" in statistics:
            obs["proprio"] = _normalize(
                tf.cast(obs["proprio"], tf.float32),
                statistics["proprio"], cfg.proprio_normalization, None,
            )
        traj["observation"] = obs
        return traj

    return ds.map(normalize, num_parallel_calls=tf.data.AUTOTUNE), statistics


def apply_trajectory_transforms(
    ds,
    *,
    window_size: int = 1,
    action_horizon: int = 4,
    subsample_length: Optional[int] = None,
    seed: int = 0,
):
    """Chunk trajectories into per-frame windows (dataset.py:33-178):
    observation history of `window_size`, future action chunk of
    `action_horizon`, with validity masks at episode boundaries."""
    tf = _tf()

    def chunk(traj):
        traj_len = tf.shape(traj["action"])[0]
        # history indices [t-window+1 ... t], clamped at 0
        hist = tf.range(traj_len)[:, None] + tf.range(
            -window_size + 1, 1
        )[None, :]
        hist = tf.maximum(hist, 0)
        # future action indices [t ... t+horizon-1], clamped at end
        fut = tf.range(traj_len)[:, None] + tf.range(action_horizon)[None, :]
        pad_mask = fut < traj_len
        fut = tf.minimum(fut, traj_len - 1)

        obs = {
            k: tf.gather(v, hist) for k, v in traj["observation"].items()
        }
        out = {
            "observation": obs,
            "action": tf.gather(traj["action"], fut),  # [T, horizon, dim]
            "action_pad_mask": pad_mask,
            "language_instruction": traj["language_instruction"],
        }
        return tf.data.Dataset.from_tensor_slices(out)

    ds = ds.flat_map(chunk)
    if subsample_length is not None:
        ds = ds.shuffle(1000, seed=seed).take(subsample_length)
    return ds


def apply_frame_transforms(ds, *, resize: Optional[Sequence[int]] = None,
                           image_key: str = "image_primary"):
    """Decode + resize images per frame (dataset.py:179-257)."""
    tf = _tf()

    def fr(frame):
        obs = dict(frame["observation"])
        img = obs[image_key]
        if img.dtype == tf.string:
            img = tf.map_fn(
                lambda x: tf.io.decode_image(x, 3, expand_animations=False),
                img, fn_output_signature=tf.uint8,
            )
        if resize is not None:
            img = tf.cast(
                tf.image.resize(
                    tf.cast(img, tf.float32), resize, method="lanczos3"
                ),
                tf.uint8,
            )
        obs[image_key] = img
        frame = dict(frame)
        frame["observation"] = obs
        return frame

    return ds.map(fr, num_parallel_calls=tf.data.AUTOTUNE)


def make_interleaved_dataset(
    datasets: List,  # list of frame-level tf.data.Datasets
    weights: Optional[Sequence[float]] = None,
    *,
    shuffle_buffer_size: int = 10_000,
    batch_size: int = 32,
    seed: int = 0,
):
    """Weighted mixture + shuffle + repeat + batch (dataset.py:497-553)."""
    tf = _tf()
    datasets = [d.repeat() for d in datasets]
    if len(datasets) == 1:
        ds = datasets[0]
    else:
        w = np.asarray(
            weights if weights is not None else [1.0] * len(datasets), np.float64
        )
        w = (w / w.sum()).tolist()
        ds = tf.data.Dataset.sample_from_datasets(datasets, w, seed=seed)
    ds = ds.shuffle(shuffle_buffer_size, seed=seed)
    ds = ds.batch(batch_size, drop_remainder=True)
    return ds.prefetch(tf.data.AUTOTUNE)


class RLDSInterleavedIterator:
    """Numpy feed for JAX (TorchRLDSInterleavedDataset analogue,
    agent/dataset.py:14 — minus the torch hop)."""

    def __init__(self, ds):
        self.ds = ds

    def __iter__(self):
        return self.ds.as_numpy_iterator()


# --- standardization transforms (oxe_standardization_transforms.py) --------


def bridge_standardize(traj):
    """bridge_dataset: obs {image_0, state[7]}, action [dx dy dz dr dp dy g]."""
    tf = _tf()
    obs = traj["observation"]
    return {
        "observation": {
            "image_primary": obs["image_0"],
            "proprio": tf.cast(obs["state"], tf.float32),
        },
        "action": tf.cast(traj["action"], tf.float32),
        "language_instruction": traj["language_instruction"],
    }


def fractal_standardize(traj):
    """fractal20220817_data: world-vector/rotation-delta/gripper composite
    action -> 7-dim; proprio from base_pose_tool_reached + gripper closed."""
    tf = _tf()
    obs = traj["observation"]
    act = traj["action"]
    action = tf.concat(
        [
            tf.cast(act["world_vector"], tf.float32),
            tf.cast(act["rotation_delta"], tf.float32),
            tf.cast(act["gripper_closedness_action"], tf.float32),
        ],
        axis=-1,
    )
    proprio = tf.concat(
        [
            tf.cast(obs["base_pose_tool_reached"], tf.float32),
            tf.cast(obs["gripper_closed"], tf.float32),
        ],
        axis=-1,
    )
    return {
        "observation": {"image_primary": obs["image"], "proprio": proprio},
        "action": action,
        "language_instruction": traj["natural_language_instruction"]
        if "natural_language_instruction" in traj
        else obs.get("natural_language_instruction"),
    }


OXE_STANDARDIZATION_TRANSFORMS = {
    "bridge_dataset": bridge_standardize,
    "fractal20220817_data": fractal_standardize,
}

# bridge + fractal mixture used by Vlaser-VLA (oxe_dataset_mixes.py)
OXE_SIMPLE_MIX = [("bridge_dataset", 1.0), ("fractal20220817_data", 1.0)]
