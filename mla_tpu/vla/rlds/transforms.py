"""Trajectory/frame transforms (tf graph ops).

Parity targets:
  * chunk_act_obs — vla/datasets/rlds/traj_transforms.py:14-100
  * normalize_action_and_proprio, binarize/invert/rel2abs gripper —
    vla/datasets/rlds/utils/data_utils.py:49-160
  * decode_and_resize — vla/datasets/rlds/obs_transforms.py
  * get_dataset_statistics — utils/data_utils.py:185-273 (hash-cached)
"""

from __future__ import annotations

import hashlib
import json
from enum import Enum
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np


class NormalizationType(str, Enum):
    NORMAL = "normal"
    BOUNDS = "bounds"
    BOUNDS_Q99 = "bounds_q99"


def _tf():
    import tensorflow as tf

    return tf


# --------------------------------------------------------------------------- #
# normalization
# --------------------------------------------------------------------------- #


def normalize_action_and_proprio(traj: Dict, metadata: Dict, normalization_type: NormalizationType) -> Dict:
    """Normalize traj['action'] and traj['observation']['proprio'] in place
    (reference data_utils.py:61-104, dlimp-free)."""
    tf = _tf()

    def norm(x, stats):
        mask = tf.convert_to_tensor(stats.get("mask", np.ones_like(np.asarray(stats["q01"] if "q01" in stats else stats["mean"]), bool)))
        if normalization_type == NormalizationType.NORMAL:
            return tf.where(mask, (x - stats["mean"]) / (stats["std"] + 1e-8), x)
        low = np.asarray(stats["min"] if normalization_type == NormalizationType.BOUNDS else stats["q01"])
        high = np.asarray(stats["max"] if normalization_type == NormalizationType.BOUNDS else stats["q99"])
        y = tf.where(mask, tf.clip_by_value(2 * (x - low) / (high - low + 1e-8) - 1, -1, 1), x)
        zeros_mask = np.asarray(stats["min"]) == np.asarray(stats["max"]) if "min" in stats else np.zeros_like(low, bool)
        return tf.where(zeros_mask, tf.zeros_like(y), y)

    traj["action"] = norm(traj["action"], {k: np.asarray(v) for k, v in metadata["action"].items()})
    if "proprio" in traj.get("observation", {}):
        traj["observation"]["proprio"] = norm(
            traj["observation"]["proprio"], {k: np.asarray(v) for k, v in metadata["proprio"].items()}
        )
    return traj


def binarize_gripper_actions(actions):
    """Continuous [0,1] gripper -> binary via future-state relabeling
    (reference data_utils.py:106-133)."""
    tf = _tf()
    open_mask, closed_mask = actions > 0.95, actions < 0.05
    in_between = tf.logical_not(tf.logical_or(open_mask, closed_mask))
    is_open_float = tf.cast(open_mask, tf.float32)

    def scan_fn(carry, i):
        return tf.cond(in_between[i], lambda: tf.cast(carry, tf.float32), lambda: is_open_float[i])

    return tf.scan(scan_fn, tf.range(tf.shape(actions)[0]), actions[-1], reverse=True)


def invert_gripper_actions(actions):
    return 1 - actions


def rel2abs_gripper_actions(actions):
    """Relative (+1 close, -1 open) -> absolute (0 closed, 1 open)
    (reference data_utils.py:141-165)."""
    tf = _tf()
    opening_mask, closing_mask = actions < -0.1, actions > 0.1
    thresholded = tf.where(opening_mask, 1, tf.where(closing_mask, -1, 0))

    def scan_fn(carry, i):
        return tf.cond(thresholded[i] == 0, lambda: carry, lambda: thresholded[i])

    start = -1 * thresholded[tf.argmax(thresholded != 0, axis=0)]
    start = tf.cond(start == 0, lambda: 1, lambda: start)
    new_actions = tf.scan(scan_fn, tf.range(tf.shape(actions)[0]), start)
    return tf.cast(new_actions, tf.float32) / 2 + 0.5


# --------------------------------------------------------------------------- #
# trajectory chunking
# --------------------------------------------------------------------------- #


def chunk_act_obs(
    traj: Dict,
    window_size: int,
    future_action_window_size: int = 0,
    dataset_statistics: Optional[Dict] = None,
) -> Dict:
    """Window/future-chunk observations and actions with edge padding and
    neutral-action masking (reference traj_transforms.py:14-100)."""
    tf = _tf()
    traj_len = tf.shape(traj["action"])[0]

    chunk_indices = tf.broadcast_to(tf.range(-window_size + 1, 1), [traj_len, window_size]) + tf.broadcast_to(
        tf.range(traj_len)[:, None], [traj_len, window_size]
    )
    action_chunk_indices = tf.broadcast_to(
        tf.range(-window_size + 1, 1 + future_action_window_size),
        [traj_len, window_size + future_action_window_size],
    ) + tf.broadcast_to(tf.range(traj_len)[:, None], [traj_len, window_size + future_action_window_size])

    floored_chunk_indices = tf.maximum(chunk_indices, 0)
    goal_timestep = traj["task"]["timestep"] if "timestep" in traj.get("task", {}) else tf.fill([traj_len], traj_len - 1)
    floored_action_chunk_indices = tf.minimum(tf.maximum(action_chunk_indices, 0), goal_timestep[:, None])

    traj["observation"] = _tf().nest.map_structure(
        lambda x: tf.gather(x, floored_chunk_indices), traj["observation"]
    )
    traj["action"] = tf.gather(traj["action"], floored_action_chunk_indices)
    traj["observation"]["pad_mask"] = chunk_indices >= 0

    if dataset_statistics is not None:
        # neutral actions past the goal timestep: the normalized zero action
        # under BOUNDS_Q99 (reference traj_transforms.py:66-83)
        action_dim = traj["action"].shape[-1]
        absolute_action_mask = traj.get(
            "absolute_action_mask", tf.zeros([traj_len, action_dim], dtype=tf.bool)
        )
        low = np.asarray(dataset_statistics["action"]["q01"])
        high = np.asarray(dataset_statistics["action"]["q99"])
        norm_zero = 2 * (0 - low) / (high - low + 1e-8) - 1
        expanded = tf.cast(tf.broadcast_to(norm_zero, tf.shape(traj["action"])), traj["action"].dtype)
        neutral_actions = tf.where(absolute_action_mask[:, None, :], traj["action"], expanded)
        past_goal = action_chunk_indices > goal_timestep[:, None]
        traj["action"] = tf.where(past_goal[:, :, None], neutral_actions, traj["action"])
    return traj


def subsample(traj: Dict, subsample_length: int) -> Dict:
    """Random frame subsampling (reference traj_transforms.py subsample)."""
    tf = _tf()
    traj_len = tf.shape(traj["action"])[0]
    if subsample_length is None:
        return traj
    indices = tf.cond(
        traj_len > subsample_length,
        lambda: tf.sort(tf.random.shuffle(tf.range(traj_len))[:subsample_length]),
        lambda: tf.range(traj_len),
    )
    return _tf().nest.map_structure(lambda x: tf.gather(x, indices), traj)


# --------------------------------------------------------------------------- #
# frame transforms
# --------------------------------------------------------------------------- #


def decode_and_resize_image(image, size: int = 672):
    """bytes/uint8 -> uint8 [size, size, 3] (reference obs_transforms.py:17-45)."""
    tf = _tf()
    if image.dtype == tf.string:
        image = tf.io.decode_image(image, expand_animations=False, channels=3)
    image = tf.image.resize(tf.cast(image, tf.float32), (size, size), method="lanczos3")
    return tf.cast(tf.clip_by_value(tf.round(image), 0, 255), tf.uint8)


def augment_image(image, seed, brightness=0.1, contrast=(0.9, 1.1)):
    """Light photometric augmentation (subset of reference augment kwargs)."""
    tf = _tf()
    image = tf.cast(image, tf.float32) / 255.0
    image = tf.image.stateless_random_brightness(image, brightness, seed)
    image = tf.image.stateless_random_contrast(image, contrast[0], contrast[1], seed)
    return tf.cast(tf.clip_by_value(image, 0, 1) * 255.0, tf.uint8)


# --------------------------------------------------------------------------- #
# dataset statistics
# --------------------------------------------------------------------------- #


def compute_dataset_statistics(actions: np.ndarray, proprios: np.ndarray) -> Dict:
    """q01/q99/mean/std/min/max over concatenated transitions
    (reference get_dataset_statistics, data_utils.py:185-273)."""

    def stats(x):
        return {
            "mean": x.mean(0).tolist(),
            "std": x.std(0).tolist(),
            "max": x.max(0).tolist(),
            "min": x.min(0).tolist(),
            "q01": np.quantile(x, 0.01, axis=0).tolist(),
            "q99": np.quantile(x, 0.99, axis=0).tolist(),
        }

    return {
        "action": stats(np.asarray(actions, np.float64)),
        "proprio": stats(np.asarray(proprios, np.float64)),
        "num_transitions": int(len(actions)),
    }


def cached_dataset_statistics(cache_dir, cache_key: str, compute_fn) -> Dict:
    """JSON cache keyed by a content hash (reference caches by dataset hash,
    data_utils.py:214-230)."""
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    h = hashlib.sha256(cache_key.encode()).hexdigest()[:16]
    path = cache_dir / f"dataset_statistics_{h}.json"
    if path.exists():
        return json.loads(path.read_text())
    stats = compute_fn()
    path.write_text(json.dumps(stats))
    return stats
