"""Trajectory/frame transforms (tf graph ops).

Parity targets:
  * chunk_act_obs, add_pad_mask_dict, subsample —
    vla/datasets/rlds/traj_transforms.py
  * normalize_action_and_proprio, binarize/invert/rel2abs gripper,
    to_padding, tree_merge, allocate_threads —
    vla/datasets/rlds/utils/data_utils.py
  * goal_relabel_uniform — vla/datasets/rlds/utils/goal_relabeling.py
  * delete_task_conditioning — vla/datasets/rlds/utils/task_augmentation.py
  * decode_and_resize, augment — vla/datasets/rlds/obs_transforms.py (+ the
    dlimp augment_image kwargs vocabulary)
  * get_dataset_statistics — utils/data_utils.py:185-273 (full-pass,
    hash-keyed JSON cache)
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
# padding / tree utilities (reference data_utils.py:24-46)
# --------------------------------------------------------------------------- #


def to_padding(tensor):
    """The padding value for a tensor: zeros for numerics, "" for strings."""
    tf = _tf()
    if tensor.dtype == tf.string:
        return tf.fill(tf.shape(tensor), "")
    return tf.zeros_like(tensor)


def tree_merge(*trees: Dict) -> Dict:
    """Right-biased nested-dict merge."""
    merged: Dict = {}
    for tree in trees:
        for k, v in tree.items():
            merged[k] = tree_merge(merged.get(k, {}), v) if isinstance(v, dict) else v
    return merged


def add_pad_mask_dict(traj: Dict) -> Dict:
    """Mark padded (empty-string) observation/task entries
    (reference traj_transforms.py:104-124)."""
    tf = _tf()
    traj_len = tf.shape(traj["action"])[0]
    for group in ("observation", "task"):
        masks = {}
        for key, val in traj[group].items():
            if val.dtype == tf.string:
                masks[key] = tf.strings.length(val) != 0
            else:
                masks[key] = tf.ones([traj_len], dtype=tf.bool)
        traj[group]["pad_mask_dict"] = masks
    return traj


# --------------------------------------------------------------------------- #
# goal relabeling / task augmentation
# --------------------------------------------------------------------------- #


def goal_relabel_uniform(traj: Dict) -> Dict:
    """Mirror each observation key into `task` at a goal index drawn
    uniformly from the strict future (reference goal_relabeling.py:15-31)."""
    tf = _tf()
    traj_len = tf.shape(tf.nest.flatten(traj["observation"])[0])[0]
    low = tf.cast(tf.range(traj_len) + 1, tf.float32)
    high = tf.cast(traj_len, tf.float32)
    goal_idxs = tf.cast(tf.random.uniform([traj_len]) * (high - low) + low, tf.int32)
    goal_idxs = tf.minimum(goal_idxs, traj_len - 1)  # guard fp round-up
    goal = tf.nest.map_structure(lambda x: tf.gather(x, goal_idxs), traj["observation"])
    traj["task"] = tree_merge(traj["task"], goal)
    return traj


def delete_task_conditioning(traj: Dict, keep_image_prob: float) -> Dict:
    """Per-frame, keep either the goal images (p=keep_image_prob) or the
    language instruction, padding out the other
    (reference task_augmentation.py:14-56)."""
    tf = _tf()
    task = traj["task"]
    if "language_instruction" not in task:
        return traj
    image_keys = {k for k in task if k.startswith("image_") or k.startswith("depth_")}
    if not image_keys:
        return traj

    traj_len = tf.shape(traj["action"])[0]
    keep_images = tf.random.uniform([traj_len]) < keep_image_prob
    # frames with no language label always keep the images
    keep_images |= ~task["pad_mask_dict"]["language_instruction"]

    for key in image_keys | {"language_instruction"}:
        keep = keep_images if key in image_keys else ~keep_images
        task[key] = tf.where(keep, task[key], to_padding(task[key]))
        task["pad_mask_dict"][key] = tf.where(
            keep, task["pad_mask_dict"][key], tf.zeros_like(task["pad_mask_dict"][key])
        )
    if "timestep" in task:
        # dropped goal images => the goal becomes the final timestep
        task["timestep"] = tf.where(keep_images, task["timestep"], traj_len - 1)
    return traj


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
        # ... and BEFORE the trajectory start (reference :85-87): with
        # window_size > 1 the first frames' pre-start chunk slots would
        # otherwise repeat action[0] instead of the neutral action
        before_start = action_chunk_indices < 0
        traj["action"] = tf.where(before_start[:, :, None], neutral_actions, traj["action"])
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


def decode_and_resize_image(image, size=672):
    """bytes/uint8 -> uint8 [h, w, 3]; empty strings (padding views) decode
    to zeros (reference obs_transforms.py:45-77)."""
    tf = _tf()
    if isinstance(size, int):
        size = (size, size)
    if image.dtype == tf.string:
        image = tf.cond(
            tf.strings.length(image) == 0,
            lambda: tf.zeros((*size, 3), tf.uint8),
            lambda: tf.io.decode_image(image, expand_animations=False, channels=3, dtype=tf.uint8),
        )
    image = tf.image.resize(tf.cast(image, tf.float32), size, method="lanczos3")
    return tf.cast(tf.clip_by_value(tf.round(image), 0, 255), tf.uint8)


def _random_resized_crop(image, scale, ratio, seed):
    """Sample an area-scale/aspect-ratio crop and resize back to the input
    size (dlimp's random_resized_crop semantics)."""
    tf = _tf()
    shape = tf.shape(image)
    height = tf.cast(shape[-3], tf.float32)
    width = tf.cast(shape[-2], tf.float32)

    s = tf.random.stateless_uniform([], seed, scale[0], scale[1])
    log_r = tf.random.stateless_uniform(
        [], seed + 1, _np_log(ratio[0]), _np_log(ratio[1])
    )
    r = tf.exp(log_r)
    # crop area = s * H * W with aspect ratio r = w/h
    crop_h = tf.sqrt(s * height * width / r)
    crop_w = crop_h * r
    crop_h = tf.minimum(crop_h, height)
    crop_w = tf.minimum(crop_w, width)

    off_y = tf.random.stateless_uniform([], seed + 2, 0.0, height - crop_h + 1e-6)
    off_x = tf.random.stateless_uniform([], seed + 3, 0.0, width - crop_w + 1e-6)
    box = tf.stack([off_y / (height - 1), off_x / (width - 1),
                    (off_y + crop_h - 1) / (height - 1), (off_x + crop_w - 1) / (width - 1)])
    cropped = tf.image.crop_and_resize(
        image[None] if image.shape.ndims == 3 else image,
        box[None], [0], (shape[-3], shape[-2])
    )
    out = cropped[0] if image.shape.ndims == 3 else cropped
    return tf.cast(tf.clip_by_value(out, 0, 255), image.dtype)


def _np_log(x):
    import math

    return math.log(x)


def augment_image(image, seed, **augment_kwargs):
    """Photometric/geometric augmentation with the dlimp kwargs vocabulary
    (the reference feeds `dl.transforms.augment_image` from
    datasets.py:248-262: random_resized_crop / brightness / contrast /
    saturation / hue / flip, applied in `augment_order`)."""
    tf = _tf()
    if not augment_kwargs:
        augment_kwargs = {
            "random_brightness": [0.1],
            "random_contrast": [0.9, 1.1],
            "augment_order": ["random_brightness", "random_contrast"],
        }
    order = augment_kwargs.get("augment_order", [k for k in augment_kwargs])
    in_dtype = image.dtype
    image = tf.cast(image, tf.float32)
    if in_dtype == tf.uint8:
        image = image / 255.0
    for i, op in enumerate(order):
        if op not in augment_kwargs:
            continue
        args = augment_kwargs[op]
        op_seed = tf.convert_to_tensor(seed, tf.int32) + 7 * i
        if op == "random_resized_crop":
            image = tf.cast(
                _random_resized_crop(image, args["scale"], args["ratio"], op_seed), tf.float32
            )
        elif op == "random_brightness":
            image = tf.image.stateless_random_brightness(image, args[0], op_seed)
        elif op == "random_contrast":
            image = tf.image.stateless_random_contrast(image, args[0], args[1], op_seed)
        elif op == "random_saturation":
            image = tf.image.stateless_random_saturation(image, args[0], args[1], op_seed)
        elif op == "random_hue":
            image = tf.image.stateless_random_hue(image, args[0], op_seed)
        elif op == "random_flip":
            image = tf.image.stateless_random_flip_left_right(image, op_seed)
        else:
            raise ValueError(f"Unknown augmentation op: {op}")
    image = tf.clip_by_value(image, 0, 1)
    if in_dtype == tf.uint8:
        # scale-and-ROUND like dlimp's convert_image_dtype(saturate=True) —
        # a truncating cast would darken every pixel by ~0.5 LSB on average
        return tf.image.convert_image_dtype(image, tf.uint8, saturate=True)
    return tf.cast(image, in_dtype)


# --------------------------------------------------------------------------- #
# dataset statistics
# --------------------------------------------------------------------------- #


def compute_dataset_statistics(actions: np.ndarray, proprios: np.ndarray,
                               num_trajectories: Optional[int] = None) -> Dict:
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

    out = {
        "action": stats(np.asarray(actions, np.float64)),
        "proprio": stats(np.asarray(proprios, np.float64)),
        "num_transitions": int(len(actions)),
    }
    if num_trajectories is not None:
        out["num_trajectories"] = int(num_trajectories)
    return out


def cached_dataset_statistics(cache_dir, hash_dependencies: Sequence[str], compute_fn) -> Dict:
    """JSON cache keyed by a sha256 over the dependency strings (reference
    data_utils.py:199-230 keys on builder info + state keys + transform
    source, so edits to any of them invalidate the cache)."""
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    h = hashlib.sha256("".join(hash_dependencies).encode("utf-8")).hexdigest()[:32]
    path = cache_dir / f"dataset_statistics_{h}.json"
    if path.exists():
        return json.loads(path.read_text())
    stats = compute_fn()
    path.write_text(json.dumps(stats))
    return stats


def get_dataset_statistics(ds, cache_dir, hash_dependencies: Sequence[str],
                           sample_trajectories: Optional[int] = None) -> Dict:
    """Full-pass (default) statistics over a standardized trajectory dataset,
    hash-cached (reference get_dataset_statistics, data_utils.py:185-273).
    `sample_trajectories` bounds the pass for quick experiments — it is part
    of the cache key so sampled stats never shadow full ones."""

    def compute():
        source = ds.take(sample_trajectories) if sample_trajectories else ds
        acts, props, n_traj = [], [], 0
        for traj in source.as_numpy_iterator():
            acts.append(np.asarray(traj["action"]).reshape(-1, np.asarray(traj["action"]).shape[-1]))
            prop = traj["observation"]["proprio"] if "proprio" in traj["observation"] else np.zeros_like(acts[-1])
            props.append(np.asarray(prop).reshape(-1, np.asarray(prop).shape[-1]))
            n_traj += 1
        return compute_dataset_statistics(
            np.concatenate(acts), np.concatenate(props), num_trajectories=n_traj
        )

    deps = list(hash_dependencies) + ([f"sample={sample_trajectories}"] if sample_trajectories else [])
    return cached_dataset_statistics(cache_dir, deps, compute)


def allocate_threads(n: Optional[int], weights: np.ndarray) -> np.ndarray:
    """Distribute `n` threads across datasets proportional to weights, at
    least 1 each (reference data_utils.py allocate_threads)."""
    if n is None:
        return np.array([-1] * len(weights))  # tf.data.AUTOTUNE sentinel
    if len(weights) > n:
        raise ValueError("Not enough threads to give each dataset at least one.")
    weights = np.asarray(weights, np.float64) / np.sum(weights)
    alloc = np.zeros(len(weights), dtype=np.int64)
    while True:
        # datasets whose proportional share would round to zero get exactly 1
        mask = (weights * n < 1) & (weights > 0)
        if not mask.any():
            break
        n -= int(mask.sum())
        alloc += mask.astype(np.int64)
        weights[mask] = 0
        weights = weights / weights.sum()
    fractional, integral = np.modf(weights * n)
    alloc += integral.astype(np.int64)
    n -= int(integral.sum())
    for i in np.argsort(fractional)[::-1][:n]:
        alloc[i] += 1
    return alloc
