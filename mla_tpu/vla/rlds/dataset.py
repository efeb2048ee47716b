"""RLDS dataset graph construction (tfds-gated at the builder edge).

Parity target: vla/datasets/rlds/dataset.py —
  * make_dataset_from_rlds (:39-293): tfds builder -> restructure into
    {observation, task, action} via the per-dataset standardization
    transform (oxe/transforms.py), camera-view key maps with None->padding,
    `state_obs_keys` proprio concatenation, MLA point-cloud / tactile
    passthrough (:179-188; the reference's next_tactile_left copy-bug at
    :188 is fixed here), absolute/normalization masks, full-pass hash-cached
    statistics, BOUNDS_Q99 normalization.
  * apply_trajectory_transforms (:294-393): pad-mask dict, goal relabeling,
    task augmentation, window/future chunking, filters, subsample.
  * apply_frame_transforms (:411-468): decode/resize/augment with per-key
    kwargs, padding-aware.
  * make_interleaved_dataset (:499-635): size-balanced weighted sampling,
    thread allocation, per-dataset frame filters, shuffle, val caching.

Dataset configs/mixtures/transforms live in `mla_tpu.vla.rlds.oxe`.
"""

from __future__ import annotations

import inspect
from functools import partial
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from mla_tpu.utils.overwatch import initialize_overwatch
from mla_tpu.vla.rlds import transforms as T
from mla_tpu.vla.rlds.oxe import (
    OXE_DATASET_CONFIGS,
    OXE_NAMED_MIXTURES,
    POINTCLOUD_KEYS,
    TACTILE_KEYS,
    get_oxe_dataset_kwargs_and_weights,
    get_standardization_transform,
)

overwatch = initialize_overwatch(__name__)

_DEFAULT_STATS_CACHE = "~/.cache/mla_tpu"


def make_restructure_fn(
    name: str,
    standardize_fn: Callable[[Dict], Dict],
    image_obs_keys: Dict[str, Optional[str]],
    depth_obs_keys: Dict[str, Optional[str]],
    state_obs_keys: Sequence[Optional[str]],
    language_key: Optional[str],
    load_pointcloud: bool,
    load_tactile: bool,
    absolute_action_mask: Optional[Sequence[bool]] = None,
    absolute_proprio_mask: Optional[Sequence[bool]] = None,
) -> Callable[[Dict], Dict]:
    """The raw-trajectory -> standardized-schema map (reference
    dataset.py:137-232). Module-level so tests can feed each dataset's raw
    builder feature structure through it without a tfds builder."""
    import tensorflow as tf

    def restructure(traj: Dict) -> Dict:
        traj = standardize_fn(dict(traj))
        for required in ("observation", "action"):
            if required not in traj:
                raise ValueError(f"standardize_fn for `{name}` must produce `{required}`")

        traj_len = tf.shape(traj["action"])[0]
        old_obs = traj["observation"]
        obs: Dict[str, Any] = {}
        for new, old in image_obs_keys.items():
            obs[f"image_{new}"] = tf.repeat("", traj_len) if old is None else old_obs[old]
        for new, old in depth_obs_keys.items():
            obs[f"depth_{new}"] = tf.repeat("", traj_len) if old is None else old_obs[old]

        # proprio: a standardized `proprio` key wins; otherwise concatenate
        # state_obs_keys (None -> one zero column). The reference overwrites
        # with old_obs["proprio"] unconditionally (dataset.py:178), which
        # crashes every dataset without that key — fixed here.
        if "proprio" in old_obs:
            obs["proprio"] = tf.cast(old_obs["proprio"], tf.float32)
        elif any(k is not None for k in state_obs_keys):
            obs["proprio"] = tf.concat(
                [
                    tf.zeros((traj_len, 1), tf.float32) if key is None
                    else tf.cast(old_obs[key], tf.float32)
                    for key in state_obs_keys
                ],
                axis=1,
            )
        elif state_obs_keys:
            obs["proprio"] = tf.zeros((traj_len, len(state_obs_keys)), tf.float32)
        else:
            obs["proprio"] = tf.zeros([traj_len, tf.shape(traj["action"])[-1]], tf.float32)
        obs["timestep"] = tf.range(traj_len)

        if load_pointcloud:
            for key in POINTCLOUD_KEYS:
                obs[key] = tf.cast(old_obs[key], tf.float32)
        if load_tactile:
            for key in TACTILE_KEYS:
                obs[key] = tf.cast(old_obs[key], tf.float32)

        task: Dict[str, Any] = {}
        if language_key is not None:
            lang = traj[language_key] if language_key in traj else old_obs[language_key]
            task["language_instruction"] = lang

        out = {
            "observation": obs,
            "task": task,
            "action": tf.cast(traj["action"], tf.float32),
            "dataset_name": tf.repeat(name, traj_len),
        }
        if absolute_action_mask is not None:
            out["absolute_action_mask"] = tf.tile(
                tf.convert_to_tensor(absolute_action_mask, tf.bool)[None], [traj_len, 1]
            )
        if absolute_proprio_mask is not None:
            out["absolute_proprio_mask"] = tf.tile(
                tf.convert_to_tensor(absolute_proprio_mask, tf.bool)[None], [traj_len, 1]
            )
        return out

    return restructure


def make_dataset_from_rlds(
    name: str,
    data_dir: str,
    *,
    train: bool = True,
    standardize_fn: Optional[Callable[[Dict], Dict]] = None,
    shuffle: bool = True,
    image_obs_keys: Optional[Dict[str, Optional[str]]] = None,
    depth_obs_keys: Optional[Dict[str, Optional[str]]] = None,
    state_obs_keys: Optional[Sequence[Optional[str]]] = None,
    language_key: Optional[str] = "language_instruction",
    action_proprio_normalization_type: T.NormalizationType = T.NormalizationType.BOUNDS_Q99,
    dataset_statistics: Optional[Dict] = None,
    absolute_action_mask: Optional[Sequence[bool]] = None,
    absolute_proprio_mask: Optional[Sequence[bool]] = None,
    action_normalization_mask: Optional[Sequence[bool]] = None,
    proprio_normalization_mask: Optional[Sequence[bool]] = None,
    load_pointcloud: bool = True,
    load_tactile: bool = False,
    load_all_data_for_training: bool = True,
    num_parallel_reads: Optional[int] = None,
    num_parallel_calls: Optional[int] = None,
    stats_cache_dir: str = _DEFAULT_STATS_CACHE,
    stats_sample_trajectories: Optional[int] = None,
    shard_by_host: bool = True,
    dataset_frame_transform_kwargs: Optional[Dict] = None,  # consumed upstream
) -> Tuple[Any, Dict]:
    """Build one standardized trajectory dataset. Requires
    tensorflow_datasets for the builder; everything downstream is plain
    tf.data. Key-map kwargs default to the OXE config matrix entry."""
    import tensorflow as tf

    try:
        import tensorflow_datasets as tfds

        skip_decoding = {"steps": tfds.decode.SkipDecoding()}
    except ImportError:
        # hosts without the tensorflow_datasets package read the same
        # TFDS-layout directories through the compat reader; images stay
        # encoded bytes either way (SkipDecoding semantics — the frame
        # transforms decode them)
        from mla_tpu.vla.rlds import tfds_compat as tfds  # type: ignore[no-redef]

        skip_decoding = None

    cfg = OXE_DATASET_CONFIGS.get(name, {})
    if standardize_fn is None:
        standardize_fn = get_standardization_transform(name)
    if image_obs_keys is None:
        # default mode drops padded (None) views so the frame schema stays tight
        image_obs_keys = {k: v for k, v in cfg.get("image_obs_keys", {}).items() if v is not None}
    if depth_obs_keys is None:
        depth_obs_keys = {}
    if state_obs_keys is None:
        state_obs_keys = cfg.get("state_obs_keys", [])

    autotune = tf.data.AUTOTUNE
    n_reads = autotune if num_parallel_reads in (None, -1) else num_parallel_reads
    n_calls = autotune if num_parallel_calls in (None, -1) else num_parallel_calls

    restructure = make_restructure_fn(
        name, standardize_fn, image_obs_keys, depth_obs_keys, state_obs_keys,
        language_key, load_pointcloud, load_tactile,
        absolute_action_mask, absolute_proprio_mask,
    )

    builder = tfds.builder(name, data_dir=data_dir)

    def episodes_to_trajs(ds):
        def flatten_episode(episode):
            steps = episode["steps"]
            batched = tf.data.experimental.get_single_element(steps.batch(int(1e9)))
            return restructure(dict(batched))

        return ds.map(flatten_episode, num_parallel_calls=n_calls)

    if dataset_statistics is None:
        # full pass over ALL splits (reference dataset.py:239 uses
        # split="all" — train-only stats would shift q01/q99 vs reference
        # checkpoints when a val split exists), hash-cached on builder info
        # + split + state keys + the transform's source
        stats_split = "all"
        stats_ds = episodes_to_trajs(
            builder.as_dataset(split=stats_split, shuffle_files=False,
                               decoders=skip_decoding)
        )
        dataset_statistics = T.get_dataset_statistics(
            stats_ds,
            cache_dir=Path(stats_cache_dir).expanduser(),
            hash_dependencies=(
                str(builder.info),
                stats_split,
                str(list(state_obs_keys)),
                inspect.getsource(standardize_fn) if standardize_fn is not None else "",
            ),
            sample_trajectories=stats_sample_trajectories,
        )
    dataset_statistics = {
        k: ({kk: np.asarray(vv) for kk, vv in v.items()} if isinstance(v, dict) else v)
        for k, v in dataset_statistics.items()
    }
    if action_normalization_mask is not None:
        dataset_statistics["action"]["mask"] = np.asarray(action_normalization_mask)
    if proprio_normalization_mask is not None:
        dataset_statistics["proprio"]["mask"] = np.asarray(proprio_normalization_mask)

    if "val" not in builder.info.splits:
        split = "train[:95%]" if train else "train[95%:]"
    else:
        split = "train" if train else "val"
    if load_all_data_for_training and train:
        split = "train"

    multihost = False
    if shard_by_host:
        import jax

        multihost = jax.process_count() > 1
    # multi-host shards are carved from the CANONICAL (unshuffled) file
    # order: an unseeded per-host file shuffle would make shard(P, i) take
    # every P-th element of P DIFFERENT permutations — overlapping shards
    # and silently dropped episodes. Episode mixing then comes from the
    # interleave + frame-level shuffle buffer downstream.
    ds = builder.as_dataset(split=split,
                            shuffle_files=shuffle and train and not multihost,
                            decoders=skip_decoding)
    if multihost:
        import jax

        ds = ds.shard(jax.process_count(), jax.process_index())

    ds = episodes_to_trajs(ds)
    ds = ds.map(
        partial(T.normalize_action_and_proprio, metadata=dataset_statistics,
                normalization_type=action_proprio_normalization_type),
        num_parallel_calls=n_calls,
    )
    return ds, dataset_statistics


def apply_trajectory_transforms(
    ds,
    *,
    train: bool = True,
    window_size: int = 1,
    future_action_window_size: int = 15,
    skip_unlabeled: bool = True,
    max_action: Optional[float] = None,
    max_proprio: Optional[float] = None,
    goal_relabeling_strategy: Optional[str] = None,
    task_augment_strategy: Optional[str] = None,
    task_augment_kwargs: Optional[Dict] = None,
    subsample_length: Optional[int] = None,
    dataset_statistics: Optional[Dict] = None,
    num_parallel_calls: Optional[int] = None,
):
    """Trajectory-level relabeling/chunking (reference dataset.py:294-393)."""
    import tensorflow as tf

    n_calls = tf.data.AUTOTUNE if num_parallel_calls in (None, -1) else num_parallel_calls

    if skip_unlabeled:
        ds = ds.filter(lambda traj: tf.math.reduce_any(traj["task"]["language_instruction"] != ""))
    if max_action is not None:
        ds = ds.filter(lambda traj: tf.math.reduce_all(tf.math.abs(traj["action"]) <= max_action))
    if max_proprio is not None:
        ds = ds.filter(
            lambda traj: tf.math.reduce_all(tf.math.abs(traj["observation"]["proprio"]) <= max_proprio)
        )

    ds = ds.map(T.add_pad_mask_dict, num_parallel_calls=n_calls)

    if goal_relabeling_strategy is not None:
        relabel = {"uniform": T.goal_relabel_uniform}[goal_relabeling_strategy]
        ds = ds.map(relabel, num_parallel_calls=n_calls)
    if train and task_augment_strategy is not None:
        augment = {"delete_task_conditioning": T.delete_task_conditioning}[task_augment_strategy]
        ds = ds.map(partial(augment, **(task_augment_kwargs or {})), num_parallel_calls=n_calls)

    ds = ds.map(
        lambda traj: T.chunk_act_obs(traj, window_size, future_action_window_size, dataset_statistics),
        num_parallel_calls=n_calls,
    )
    if train and subsample_length is not None:
        ds = ds.map(lambda traj: T.subsample(traj, subsample_length), num_parallel_calls=n_calls)
    return ds


def flatten_to_frames(ds, num_parallel_calls: Optional[int] = None):
    import tensorflow as tf

    del num_parallel_calls  # sequential flattening keeps frame order deterministic
    return ds.flat_map(tf.data.Dataset.from_tensor_slices)


def apply_per_dataset_frame_transforms(ds, chunk_filter_fn: Optional[Callable] = None):
    """Per-dataset frame-level hooks (reference dataset.py:396-407), e.g.
    DROID's normalized-zero-action filter."""
    if chunk_filter_fn is not None:
        ds = ds.filter(chunk_filter_fn)
    return ds


# default train-time augmentation set (reference vla/datasets/datasets.py:248-262)
DEFAULT_IMAGE_AUGMENT_KWARGS: Dict[str, Any] = {
    "random_resized_crop": {"scale": [0.9, 0.9], "ratio": [1.0, 1.0]},
    "random_brightness": [0.2],
    "random_contrast": [0.8, 1.2],
    "random_saturation": [0.8, 1.2],
    "random_hue": [0.05],
    "augment_order": [
        "random_resized_crop", "random_brightness", "random_contrast",
        "random_saturation", "random_hue",
    ],
}


def apply_frame_transforms(
    ds,
    *,
    image_size: int = 672,
    resize_size: Optional[Dict[str, Tuple[int, int]]] = None,
    train: bool = True,
    augment: bool = False,
    image_augment_kwargs: Optional[Dict] = None,
    num_parallel_calls: Optional[int] = None,
):
    """Frame-level decode/resize/augment (reference dataset.py:411-468).

    `resize_size` maps image-key suffixes to (h, w); unlisted keys use
    `image_size` square. Augmentation kwargs follow the dlimp vocabulary
    (per-key dict or one dict with `augment_order`), share one seed per
    frame, and skip padding images.
    """
    import tensorflow as tf

    n_calls = tf.data.AUTOTUNE if num_parallel_calls in (None, -1) else num_parallel_calls
    aug_kwargs = image_augment_kwargs if image_augment_kwargs is not None else (
        DEFAULT_IMAGE_AUGMENT_KWARGS if augment else None
    )

    def _size_for(key: str) -> Tuple[int, int]:
        if resize_size and key in resize_size:
            return tuple(resize_size[key])
        return (image_size, image_size)

    def _kwargs_for(key: str) -> Optional[Dict]:
        if aug_kwargs is None:
            return None
        if "augment_order" in aug_kwargs:
            return aug_kwargs
        return aug_kwargs.get(key)

    def _transform_image_dict(d, seed):
        """Decode/resize/augment every image_* key of one dict. Observation
        images carry a [window] (or [T, window]) leading dim; task/goal
        images (goal relabeling mirrors obs keys into frame['task']) are
        single [H, W, C] / scalar encoded strings — the flatten handles all
        of them."""
        pad_masks = d.get("pad_mask_dict", {})
        for i, k in enumerate(sorted(d)):
            if not k.startswith("image_"):
                continue
            size = _size_for(k[len("image_"):])
            raw = d[k]
            # encoded strings are all-leading-dims; decoded uint8 arrays
            # keep their [H, W, C] tail
            n_lead = raw.shape.ndims if raw.dtype == tf.string else raw.shape.ndims - 3
            lead = tf.shape(raw)[:n_lead]
            flat = tf.reshape(
                raw, tf.concat([[-1], tf.shape(raw)[n_lead:]], axis=0)
            )
            img = tf.map_fn(
                lambda im: T.decode_and_resize_image(im, size), flat,
                fn_output_signature=tf.uint8,
            )
            img = tf.reshape(img, tf.concat([lead, [size[0], size[1], 3]], axis=0))
            # augmentation operates on single [H,W,3] frames — the flattened
            # frame path (window dim, n_lead==1) and goal images (n_lead==0)
            # reach it; the trajectory-level path (EpisodicRLDSDataset,
            # n_lead==2) is eval-only. The shared per-frame seed (+ the same
            # key index for the mirrored task keys) matches the reference's
            # same-seed-for-all-images design (dataset.py:458-462).
            kw = _kwargs_for(k[len("image_"):]) if train and n_lead <= 1 else None
            if kw:
                if n_lead == 0:
                    img = T.augment_image(img, seed + i, **kw)
                else:
                    img = tf.map_fn(
                        lambda im: T.augment_image(im, seed + i, **kw), img,
                        fn_output_signature=tf.uint8,
                    )
                    if k in pad_masks:
                        # zero out augmented padding frames (window axis)
                        mask = tf.reshape(tf.cast(pad_masks[k], img.dtype), [-1, 1, 1, 1])
                        img = img * mask
            d[k] = img
        return d

    def fn(frame):
        seed = tf.random.uniform([2], 0, 2**31 - 1, dtype=tf.int32)
        frame["observation"] = _transform_image_dict(dict(frame["observation"]), seed)
        if "task" in frame and isinstance(frame["task"], dict):
            # reference apply_obs_transform runs the same fn over the task
            # dict (goal images), dataset.py:443-446
            frame["task"] = _transform_image_dict(dict(frame["task"]), seed)
        return frame

    return ds.map(fn, num_parallel_calls=n_calls)


def _dataset_kwargs_for_mix(
    data_mix: str,
    data_dir: str,
    *,
    load_camera_views: Optional[Sequence[str]],
    load_pointcloud: bool,
    load_tactile: bool,
) -> Tuple[List[Dict], List[float]]:
    mixture = OXE_NAMED_MIXTURES.get(data_mix, [(data_mix, 1.0)])
    if load_camera_views is None:
        # whatever views each dataset actually has (padding-free default)
        per_dataset_kwargs, weights = [], []
        seen = set()
        for ds_name, w in mixture:
            if ds_name in seen:
                overwatch.warning(f"Skipping duplicate dataset `{(ds_name, w)}`")
                continue
            seen.add(ds_name)
            per_dataset_kwargs.append(
                {"name": ds_name, "data_dir": data_dir,
                 "load_pointcloud": load_pointcloud, "load_tactile": load_tactile}
            )
            weights.append(w)
        return per_dataset_kwargs, weights
    return get_oxe_dataset_kwargs_and_weights(
        data_dir, mixture,
        load_camera_views=load_camera_views,
        load_pointcloud=load_pointcloud, load_tactile=load_tactile,
        action_proprio_normalization_type=T.NormalizationType.BOUNDS_Q99,
    )


def compute_sample_weights(
    raw_weights: Sequence[float], sizes: Sequence[int], balance: bool
) -> Tuple[np.ndarray, int]:
    """Normalized sampling weights + effective dataset length (reference
    dataset.py:550-575). With `balance`, raw weights are multiplied by each
    dataset's transition count before normalization. The effective length is
    the expected number of samples until every *primary* dataset (raw
    weight == 1.0) completes one epoch."""
    weights = np.asarray(raw_weights, np.float64)
    primary = np.nonzero(weights == 1.0)[0]
    if balance:
        weights = weights * np.asarray(sizes, np.float64)
    weights = weights / weights.sum()
    if primary.size == 0:
        primary = np.arange(len(weights))
    dataset_len = int((np.asarray(sizes, np.float64) / weights)[primary].max())
    return weights, dataset_len


def make_interleaved_dataset(
    data_mix: str,
    data_dir: str,
    *,
    train: bool = True,
    shuffle_buffer_size: int = 10_000,
    window_size: int = 1,
    future_action_window_size: int = 15,
    load_camera_views: Optional[Sequence[str]] = None,
    load_pointcloud: bool = True,
    load_tactile: bool = False,
    image_size: int = 672,
    resize_size: Optional[Dict[str, Tuple[int, int]]] = None,
    augment: bool = False,
    image_augment_kwargs: Optional[Dict] = None,
    balance_weights: bool = True,
    goal_relabeling_strategy: Optional[str] = None,
    task_augment_strategy: Optional[str] = None,
    task_augment_kwargs: Optional[Dict] = None,
    subsample_length: Optional[int] = None,
    max_action: Optional[float] = None,
    max_proprio: Optional[float] = None,
    traj_transform_threads: Optional[int] = None,
    traj_read_threads: Optional[int] = None,
    stats_sample_trajectories: Optional[int] = None,
    stats_cache_dir: str = _DEFAULT_STATS_CACHE,
    seed: int = 0,
) -> Tuple[Any, int, Dict]:
    """Weighted frame-level interleave of the mixture's datasets
    (reference make_interleaved_dataset, dataset.py:499-635). Returns
    (dataset, effective_length, per-dataset statistics).

    With `balance_weights` (the reference training default) each dataset's
    raw mixture weight is multiplied by its transition count before
    normalization, so equal weights mean one epoch of each dataset per
    epoch of the mixture in expectation."""
    import tensorflow as tf

    per_dataset_kwargs, raw_weights = _dataset_kwargs_for_mix(
        data_mix, data_dir,
        load_camera_views=load_camera_views,
        load_pointcloud=load_pointcloud, load_tactile=load_tactile,
    )
    if not per_dataset_kwargs:
        raise ValueError(f"Mixture `{data_mix}` resolved to zero loadable datasets")

    # pass 1: statistics (cached) -> dataset sizes for balancing
    all_stats: Dict[str, Dict] = {}
    sizes = []
    for kwargs in per_dataset_kwargs:
        clean = {k: v for k, v in kwargs.items() if k != "dataset_frame_transform_kwargs"}
        _, stats = make_dataset_from_rlds(
            **clean, train=train, stats_sample_trajectories=stats_sample_trajectories,
            stats_cache_dir=stats_cache_dir,
        )
        all_stats[kwargs["name"]] = stats
        sizes.append(int(stats["num_transitions"]))

    weights, dataset_len = compute_sample_weights(raw_weights, sizes, balance_weights)

    threads_per = T.allocate_threads(traj_transform_threads, np.array(weights))
    reads_per = T.allocate_threads(traj_read_threads, np.array(weights))

    datasets = []
    for kwargs, n_threads, n_reads in zip(per_dataset_kwargs, threads_per, reads_per):
        frame_kwargs = kwargs.get("dataset_frame_transform_kwargs", {})
        clean = {k: v for k, v in kwargs.items() if k != "dataset_frame_transform_kwargs"}
        ds, stats = make_dataset_from_rlds(
            **clean, train=train,
            dataset_statistics=all_stats[kwargs["name"]],
            num_parallel_calls=int(n_threads), num_parallel_reads=int(n_reads),
        )
        ds = apply_trajectory_transforms(
            ds.repeat() if train else ds,
            train=train,
            window_size=window_size,
            future_action_window_size=future_action_window_size,
            goal_relabeling_strategy=goal_relabeling_strategy,
            task_augment_strategy=task_augment_strategy,
            task_augment_kwargs=task_augment_kwargs,
            subsample_length=subsample_length,
            max_action=max_action, max_proprio=max_proprio,
            dataset_statistics=stats,
            num_parallel_calls=int(n_threads),
        )
        ds = flatten_to_frames(ds, num_parallel_calls=int(n_threads))
        ds = apply_per_dataset_frame_transforms(ds, **frame_kwargs)
        datasets.append(ds)

    if len(datasets) == 1:
        ds = datasets[0]
    else:
        ds = tf.data.Dataset.sample_from_datasets(datasets, weights.tolist(), seed=seed)

    if not train:
        # fix one buffer of validation data and cache it (reference :607-609)
        ds = ds.take(shuffle_buffer_size).cache()
    ds = ds.shuffle(shuffle_buffer_size, seed=seed)
    ds = apply_frame_transforms(
        ds, image_size=image_size, resize_size=resize_size, train=train,
        augment=augment, image_augment_kwargs=image_augment_kwargs,
    )
    ds = ds.prefetch(tf.data.AUTOTUNE)
    return ds, dataset_len, all_stats


class RLDSDataset:
    """Iterable frame-stream dataset (reference RLDSDataset,
    vla/datasets/datasets.py:187-303): wraps the interleaved tf.data graph
    and yields numpy frames for the host batch transform."""

    def __init__(self, data_root_dir: str, data_mix: str, *, train: bool = True,
                 shuffle_buffer_size: int = 10_000, future_action_window_size: int = 15,
                 load_pointcloud: bool = True, load_tactile: bool = False,
                 image_size: int = 672, augment: bool = False, seed: int = 0,
                 balance_weights: bool = True,
                 load_camera_views: Optional[Sequence[str]] = None) -> None:
        self.dataset, self.dataset_length, self.dataset_statistics = make_interleaved_dataset(
            data_mix, data_root_dir, train=train,
            shuffle_buffer_size=shuffle_buffer_size,
            future_action_window_size=future_action_window_size,
            load_pointcloud=load_pointcloud, load_tactile=load_tactile,
            image_size=image_size, augment=augment, seed=seed,
            balance_weights=balance_weights, load_camera_views=load_camera_views,
        )

    def __iter__(self):
        return self.dataset.as_numpy_iterator()

    def __len__(self) -> int:
        return self.dataset_length


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
