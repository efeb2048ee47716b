"""RLDS dataset graph construction (tfds-gated at the builder edge).

Parity target: vla/datasets/rlds/dataset.py —
  * make_dataset_from_rlds (:39-293): tfds builder -> restructure into
    {observation, task, action} with MLA's point-cloud / tactile /
    gripper_xyz passthrough keys (:179-188; the reference's
    next_tactile_left copy-bug at :188 is fixed here), normalization.
  * apply_trajectory_transforms (:294-410): window/future chunking, skip
    unlabeled, subsample.
  * apply_frame_transforms (:411-468): decode/resize/augment.
  * make_interleaved_dataset (:499-635): weighted sampling, shuffle,
    per-host sharding (explicit `shard(process_count, process_index)` —
    deliberate replacement for the reference's per-rank independent
    shuffles).

Dataset standardization configs live in OXE_DATASET_CONFIGS (parity with
vla/datasets/rlds/oxe/configs.py:58-66 'rlbench' incl. next_primary keys).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from mla_tpu.vla.rlds import transforms as T
from mla_tpu.utils.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)

# --- OXE dataset configs (oxe/configs.py) -----------------------------------
OXE_DATASET_CONFIGS: Dict[str, Dict[str, Any]] = {
    "rlbench": {
        "image_obs_keys": {"primary": "front_rgb", "next_primary": "next_front_rgb"},
        "depth_obs_keys": {},
        "pointcloud_obs_keys": {"point_cloud": "point_cloud", "next_point_cloud": "next_point_cloud"},
        "tactile_obs_keys": {},
        "proprio_obs_key": "proprio",
        "language_key": "language_instruction",
        "action_proprio_normalization_type": T.NormalizationType.BOUNDS_Q99,
    },
    "franka": {
        "image_obs_keys": {"primary": "front_rgb", "next_primary": "next_front_rgb",
                           "wrist_right": "wrist_right_rgb"},
        "depth_obs_keys": {},
        "pointcloud_obs_keys": {"point_cloud": "point_cloud", "next_point_cloud": "next_point_cloud"},
        "tactile_obs_keys": {
            "tactile_right": "tactile_right", "tactile_left": "tactile_left",
            "next_tactile_right": "next_tactile_right", "next_tactile_left": "next_tactile_left",
            "gripper_xyz": "gripper_xyz",
        },
        "proprio_obs_key": "proprio",
        "language_key": "language_instruction",
        "action_proprio_normalization_type": T.NormalizationType.BOUNDS_Q99,
    },
}

def _simple_cfg(primary="image", proprio="state"):
    return {
        "image_obs_keys": {"primary": primary},
        "depth_obs_keys": {},
        "pointcloud_obs_keys": {},
        "tactile_obs_keys": {},
        "proprio_obs_key": proprio,
        "language_key": "language_instruction",
        "action_proprio_normalization_type": T.NormalizationType.BOUNDS_Q99,
    }


# common OXE datasets (key maps per oxe/configs.py)
OXE_DATASET_CONFIGS.update(
    {
        "bridge_orig": _simple_cfg("image_0", "state"),
        "fractal20220817_data": _simple_cfg("image", "base_pose_tool_reached"),
        "taco_play": _simple_cfg("rgb_static", "robot_obs"),
        "jaco_play": _simple_cfg("image", "state"),
        "kuka": _simple_cfg("image", "state"),
        "berkeley_autolab_ur5": _simple_cfg("image", "state"),
        "viola": _simple_cfg("agentview_rgb", "joint_states"),
        "toto": _simple_cfg("image", "state"),
        "stanford_hydra_dataset": _simple_cfg("image", "state"),
        "austin_buds_dataset": _simple_cfg("image", "state"),
        "droid": _simple_cfg("exterior_image_1_left", "proprio"),
    }
)

# --- data mixtures (oxe/mixtures.py:11-14) ----------------------------------
OXE_NAMED_MIXTURES: Dict[str, List[Tuple[str, float]]] = {
    "rlbench": [("rlbench", 1.0)],
    "franka": [("franka", 1.0)],
    "bridge": [("bridge_orig", 1.0)],
    # OXE magic-soup-style multi-robot mixture (subset of the reference's)
    "oxe_magic_soup": [
        ("fractal20220817_data", 0.54),
        ("kuka", 0.83),
        ("bridge_orig", 1.0),
        ("taco_play", 2.0),
        ("jaco_play", 1.0),
        ("berkeley_autolab_ur5", 2.0),
        ("viola", 2.0),
        ("toto", 1.0),
        ("stanford_hydra_dataset", 4.0),
        ("austin_buds_dataset", 1.0),
    ],
}


def make_dataset_from_rlds(
    name: str,
    data_dir: str,
    *,
    train: bool = True,
    load_pointcloud: bool = True,
    load_tactile: bool = False,
    dataset_statistics: Optional[Dict] = None,
    stats_cache_dir: str = "~/.cache/mla_tpu",
    shard_by_host: bool = True,
):
    """Build one standardized trajectory dataset. Requires tensorflow_datasets
    for the builder; everything downstream is plain tf.data."""
    import tensorflow as tf

    try:
        import tensorflow_datasets as tfds
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "tensorflow_datasets is required to read RLDS builders. "
            "Install it on the host, or use the dummy data path."
        ) from e

    cfg = OXE_DATASET_CONFIGS[name]
    builder = tfds.builder(name, data_dir=data_dir)
    split = "train" if train else "val"
    ds = builder.as_dataset(split=split, shuffle_files=train, decoders={"steps": tfds.decode.SkipDecoding()})

    if shard_by_host:
        import jax

        if jax.process_count() > 1:
            ds = ds.shard(jax.process_count(), jax.process_index())

    from mla_tpu.vla.rlds.oxe_transforms import get_standardization_transform

    standardize = get_standardization_transform(name)

    def restructure(episode):
        steps = episode["steps"]

        def to_traj(batched):
            obs = {}
            for new_key, src in cfg["image_obs_keys"].items():
                obs[f"image_{new_key}"] = batched["observation"][src]
            if load_pointcloud:
                for new_key, src in cfg["pointcloud_obs_keys"].items():
                    obs[new_key] = batched["observation"][src]
            if load_tactile:
                for new_key, src in cfg["tactile_obs_keys"].items():
                    obs[new_key] = batched["observation"][src]
            obs["proprio"] = tf.cast(batched["observation"][cfg["proprio_obs_key"]], tf.float32)
            task = {"language_instruction": batched[cfg["language_key"]]}
            return {
                "observation": obs,
                "task": task,
                "action": tf.cast(batched["action"], tf.float32),
                "dataset_name": tf.fill([tf.shape(batched["action"])[0]], name),
            }

        batched = tf.data.experimental.get_single_element(steps.batch(int(1e9)))
        return to_traj(standardize(dict(batched)))

    ds = ds.map(restructure, num_parallel_calls=tf.data.AUTOTUNE)

    if dataset_statistics is None:
        # one pass over (a sample of) the data to compute q01/q99 stats
        def compute():
            acts, props = [], []
            for traj in ds.take(500).as_numpy_iterator():
                acts.append(traj["action"].reshape(-1, traj["action"].shape[-1]))
                props.append(traj["observation"]["proprio"].reshape(-1, traj["observation"]["proprio"].shape[-1]))
            return T.compute_dataset_statistics(np.concatenate(acts), np.concatenate(props))

        from pathlib import Path

        dataset_statistics = T.cached_dataset_statistics(
            Path(stats_cache_dir).expanduser(), f"{name}:{data_dir}", compute
        )

    norm_type = cfg["action_proprio_normalization_type"]
    ds = ds.map(lambda traj: T.normalize_action_and_proprio(traj, dataset_statistics, norm_type),
                num_parallel_calls=tf.data.AUTOTUNE)
    return ds, dataset_statistics


def apply_trajectory_transforms(
    ds,
    *,
    window_size: int = 1,
    future_action_window_size: int = 15,
    skip_unlabeled: bool = True,
    subsample_length: Optional[int] = None,
    dataset_statistics: Optional[Dict] = None,
    train: bool = True,
):
    import tensorflow as tf

    if skip_unlabeled:
        ds = ds.filter(lambda traj: tf.math.reduce_any(traj["task"]["language_instruction"] != ""))
    ds = ds.map(
        lambda traj: T.chunk_act_obs(traj, window_size, future_action_window_size, dataset_statistics),
        num_parallel_calls=tf.data.AUTOTUNE,
    )
    if train and subsample_length is not None:
        ds = ds.map(lambda traj: T.subsample(traj, subsample_length), num_parallel_calls=tf.data.AUTOTUNE)
    return ds


def flatten_to_frames(ds):
    import tensorflow as tf

    return ds.flat_map(tf.data.Dataset.from_tensor_slices)


def apply_frame_transforms(ds, *, image_size: int = 672, train: bool = True, augment: bool = False):
    import tensorflow as tf

    def fn(frame):
        obs = dict(frame["observation"])
        for k in list(obs):
            if k.startswith("image_"):
                img = obs[k]
                # chunked obs have a window axis; decode each
                img = tf.map_fn(
                    lambda im: T.decode_and_resize_image(im, image_size), img,
                    fn_output_signature=tf.uint8,
                )
                if train and augment:
                    seed = tf.random.uniform([2], 0, 2**31 - 1, dtype=tf.int32)
                    img = tf.map_fn(
                        lambda im: T.augment_image(im, seed), img, fn_output_signature=tf.uint8
                    )
                obs[k] = img
        frame["observation"] = obs
        return frame

    return ds.map(fn, num_parallel_calls=tf.data.AUTOTUNE)


def make_interleaved_dataset(
    data_mix: str,
    data_dir: str,
    *,
    train: bool = True,
    shuffle_buffer_size: int = 10_000,
    window_size: int = 1,
    future_action_window_size: int = 15,
    load_pointcloud: bool = True,
    load_tactile: bool = False,
    image_size: int = 672,
    augment: bool = False,
    seed: int = 0,
):
    """Weighted interleave of the mixture's datasets -> frame stream
    (reference make_interleaved_dataset, dataset.py:499-635)."""
    import tensorflow as tf

    mixture = OXE_NAMED_MIXTURES[data_mix]
    weights = np.asarray([w for _, w in mixture], np.float32)
    weights = weights / weights.sum()

    datasets, all_stats = [], {}
    for ds_name, _ in mixture:
        ds, stats = make_dataset_from_rlds(
            ds_name, data_dir, train=train,
            load_pointcloud=load_pointcloud, load_tactile=load_tactile,
        )
        all_stats[ds_name] = stats
        ds = apply_trajectory_transforms(
            ds, window_size=window_size, future_action_window_size=future_action_window_size,
            dataset_statistics=stats, train=train,
        )
        ds = flatten_to_frames(ds)
        datasets.append(ds.repeat() if train else ds)

    if len(datasets) == 1:
        ds = datasets[0]
    else:
        ds = tf.data.Dataset.sample_from_datasets(datasets, weights.tolist(), seed=seed)
    if train:
        ds = ds.shuffle(shuffle_buffer_size, seed=seed)
    ds = apply_frame_transforms(ds, image_size=image_size, train=train, augment=augment)
    ds = ds.prefetch(tf.data.AUTOTUNE)
    return ds, all_stats


class RLDSDataset:
    """Iterable frame-stream dataset (reference RLDSDataset,
    vla/datasets/datasets.py:187-303): wraps the interleaved tf.data graph
    and yields numpy frames for the host batch transform."""

    def __init__(self, data_root_dir: str, data_mix: str, *, train: bool = True,
                 shuffle_buffer_size: int = 10_000, future_action_window_size: int = 15,
                 load_pointcloud: bool = True, load_tactile: bool = False,
                 image_size: int = 672, augment: bool = False, seed: int = 0) -> None:
        self.dataset, self.dataset_statistics = make_interleaved_dataset(
            data_mix, data_root_dir, train=train,
            shuffle_buffer_size=shuffle_buffer_size,
            future_action_window_size=future_action_window_size,
            load_pointcloud=load_pointcloud, load_tactile=load_tactile,
            image_size=image_size, augment=augment, seed=seed,
        )

    def __iter__(self):
        return self.dataset.as_numpy_iterator()


class EpisodicRLDSDataset:
    """Episode-level iteration (reference EpisodicRLDSDataset): yields whole
    trajectories (chunked, normalized, frame-transformed) instead of a
    flattened frame stream — used for evaluation-style replay."""

    def __init__(self, data_root_dir: str, dataset_name: str, *, train: bool = False,
                 future_action_window_size: int = 15, load_pointcloud: bool = True,
                 load_tactile: bool = False, image_size: int = 672) -> None:
        ds, stats = make_dataset_from_rlds(
            dataset_name, data_root_dir, train=train,
            load_pointcloud=load_pointcloud, load_tactile=load_tactile,
        )
        ds = apply_trajectory_transforms(
            ds, future_action_window_size=future_action_window_size,
            dataset_statistics=stats, train=train,
        )
        # frame transforms applied per-trajectory (no flattening)
        self.dataset = apply_frame_transforms(ds, image_size=image_size, train=train)
        self.dataset_statistics = stats

    def __iter__(self):
        return self.dataset.as_numpy_iterator()
