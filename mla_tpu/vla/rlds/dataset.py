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

def _cfg(primary, proprio, secondary=None, wrist=None, next_primary=None):
    """Key map for one OXE dataset (camera names + proprio source are facts
    of the published RLDS builders, oxe/configs.py). None proprio -> the
    restructure step fills zeros."""
    imgs = {"primary": primary, "secondary": secondary, "wrist": wrist,
            "next_primary": next_primary}
    return {
        "image_obs_keys": {k: v for k, v in imgs.items() if v is not None},
        "depth_obs_keys": {},
        "pointcloud_obs_keys": {},
        "tactile_obs_keys": {},
        "proprio_obs_key": proprio,
        "language_key": "language_instruction",
        "action_proprio_normalization_type": T.NormalizationType.BOUNDS_Q99,
    }


# full Open-X-Embodiment matrix (key maps per oxe/configs.py; each entry is
# (primary, proprio[, secondary, wrist]) with dataset-builder key names)
OXE_DATASET_CONFIGS.update(
    {
        # MLA-added suites
        "metaworld": _cfg("image_third", "proprio", next_primary="next_image_third"),
        "franka_dual": {
            "image_obs_keys": {"primary": "image_third", "next_primary": "next_image_third",
                               "wrist_right": "image_wrist_right", "wrist_left": "image_wrist_left"},
            "depth_obs_keys": {},
            "pointcloud_obs_keys": {},
            "tactile_obs_keys": {},
            "proprio_obs_key": "proprio",
            "language_key": "language_instruction",
            "action_proprio_normalization_type": T.NormalizationType.BOUNDS_Q99,
        },
        "rtx_dataset": _cfg("image", "proprio", next_primary="next_image"),
        # Google robots
        "fractal20220817_data": _cfg("image", "base_pose_tool_reached"),
        "kuka": _cfg("image", "clip_function_input/base_pose_tool_reached"),
        "custom_finetuning": _cfg("image", "base_pose_tool_reached"),
        # Bridge V2 variants
        "bridge_oxe": _cfg("image", "EEF_state", secondary="image_1"),
        "bridge_orig": _cfg("image_0", "EEF_state", secondary="image_1"),
        "bridge_dataset": _cfg("image_0", "EEF_state", secondary="image_1"),
        # moderate-scale labs
        "taco_play": _cfg("rgb_static", "state_eef", wrist="rgb_gripper"),
        "jaco_play": _cfg("image", "state_eef", wrist="image_wrist"),
        "berkeley_cable_routing": _cfg("image", "robot_state", secondary="top_image", wrist="wrist45_image"),
        "roboturk": _cfg("front_rgb", None),
        "nyu_door_opening_surprising_effectiveness": _cfg(None, None, wrist="image"),
        "viola": _cfg("agentview_rgb", "joint_states", wrist="eye_in_hand_rgb"),
        "berkeley_autolab_ur5": _cfg("image", "state", wrist="hand_image"),
        "toto": _cfg("image", "state"),
        "language_table": _cfg("rgb", "effector_translation"),
        "columbia_cairlab_pusht_real": _cfg("image", "robot_state", wrist="wrist_image"),
        "stanford_kuka_multimodal_dataset_converted_externally_to_rlds": _cfg("image", "ee_position"),
        "nyu_rot_dataset_converted_externally_to_rlds": _cfg("image", "eef_state"),
        "stanford_hydra_dataset_converted_externally_to_rlds": _cfg("image", "eef_state", wrist="wrist_image"),
        "austin_buds_dataset_converted_externally_to_rlds": _cfg("image", "state", wrist="wrist_image"),
        "nyu_franka_play_dataset_converted_externally_to_rlds": _cfg("image", "eef_state", secondary="image_additional_view"),
        "maniskill_dataset_converted_externally_to_rlds": _cfg("image", "tcp_pose", wrist="wrist_image"),
        "furniture_bench_dataset_converted_externally_to_rlds": _cfg("image", "state", wrist="wrist_image"),
        "cmu_franka_exploration_dataset_converted_externally_to_rlds": _cfg("highres_image", None),
        "ucsd_kitchen_dataset_converted_externally_to_rlds": _cfg("image", "joint_state"),
        "ucsd_pick_and_place_dataset_converted_externally_to_rlds": _cfg("image", "eef_state"),
        "austin_sailor_dataset_converted_externally_to_rlds": _cfg("image", "state", wrist="wrist_image"),
        "austin_sirius_dataset_converted_externally_to_rlds": _cfg("image", "state", wrist="wrist_image"),
        "bc_z": _cfg("image", "present/xyz"),
        "utokyo_pr2_opening_fridge_converted_externally_to_rlds": _cfg("image", "eef_state"),
        "utokyo_pr2_tabletop_manipulation_converted_externally_to_rlds": _cfg("image", "eef_state"),
        "utokyo_xarm_pick_and_place_converted_externally_to_rlds": _cfg("image", "end_effector_pose", secondary="image2", wrist="hand_image"),
        "utokyo_xarm_bimanual_converted_externally_to_rlds": _cfg("image", "pose_r"),
        "robo_net": _cfg("image", "eef_state", secondary="image1"),
        "berkeley_mvp_converted_externally_to_rlds": _cfg(None, "pose", wrist="hand_image"),
        "berkeley_rpt_converted_externally_to_rlds": _cfg(None, "joint_pos", wrist="hand_image"),
        "kaist_nonprehensile_converted_externally_to_rlds": _cfg("image", "state"),
        "stanford_mask_vit_converted_externally_to_rlds": _cfg("image", "eef_state"),
        "tokyo_u_lsmo_converted_externally_to_rlds": _cfg("image", "eef_state"),
        "dlr_sara_pour_converted_externally_to_rlds": _cfg("image", "state"),
        "dlr_sara_grid_clamp_converted_externally_to_rlds": _cfg("image", "state"),
        "dlr_edan_shared_control_converted_externally_to_rlds": _cfg("image", "state"),
        "asu_table_top_converted_externally_to_rlds": _cfg("image", "eef_state"),
        "stanford_robocook_converted_externally_to_rlds": _cfg("image_1", "eef_state", secondary="image_2"),
        "imperialcollege_sawyer_wrist_cam": _cfg("image", "state", wrist="wrist_image"),
        "iamlab_cmu_pickup_insert_converted_externally_to_rlds": _cfg("image", "joint_state", wrist="wrist_image"),
        "uiuc_d3field": _cfg("image_1", None, secondary="image_2"),
        "utaustin_mutex": _cfg("image", "state", wrist="wrist_image"),
        "berkeley_fanuc_manipulation": _cfg("image", "joint_state", wrist="wrist_image"),
        "cmu_playing_with_food": _cfg("image", "state", wrist="finger_vision_1"),
        "cmu_play_fusion": _cfg("image", "state"),
        "cmu_stretch": _cfg("image", "eef_state"),
        "berkeley_gnm_recon": _cfg(None, "state", wrist="image"),
        "berkeley_gnm_cory_hall": _cfg(None, "state", wrist="image"),
        "berkeley_gnm_sac_son": _cfg(None, "state", wrist="image"),
        "droid": _cfg("exterior_image_1_left", "proprio", secondary="exterior_image_2_left", wrist="wrist_image_left"),
        "droid_wipe": _cfg("exterior_image_2_left", "proprio", wrist="wrist_image_left"),
        "fmb_dataset": _cfg("image_side_1", "proprio", secondary="image_side_2", wrist="image_wrist_1"),
        "dobbe": _cfg("wrist_image", "proprio"),
        "roboset": _cfg("image_left", "proprio", secondary="image_right", wrist="image_wrist"),
        "rh20t": _cfg("image_front", "proprio", secondary="image_side_right", wrist="image_wrist"),
        "tdroid_carrot_in_bowl": _cfg("static_image", "EEF_state"),
        "tdroid_pour_corn_in_pot": _cfg("static_image", "EEF_state"),
        "tdroid_flip_pot_upright": _cfg("static_image", "EEF_state"),
        "tdroid_move_object_onto_plate": _cfg("static_image", "EEF_state"),
        "tdroid_knock_object_over": _cfg("static_image", "EEF_state"),
        "tdroid_cover_object_with_towel": _cfg("static_image", "EEF_state"),
        # short aliases kept from earlier revisions (same key maps)
        "stanford_hydra_dataset": _cfg("image", "eef_state", wrist="wrist_image"),
        "austin_buds_dataset": _cfg("image", "state", wrist="wrist_image"),
        "nyu_franka_play_dataset": _cfg("image", "eef_state", secondary="image_additional_view"),
        "ucsd_kitchen_dataset": _cfg("image", "joint_state"),
        "austin_sailor_dataset": _cfg("image", "state", wrist="wrist_image"),
        "austin_sirius_dataset": _cfg("image", "state", wrist="wrist_image"),
        "dlr_edan_shared_control": _cfg("image", "state"),
        "iamlab_cmu_pickup_insert": _cfg("image", "joint_state", wrist="wrist_image"),
    }
)

# --- data mixtures (oxe/mixtures.py:11-210, weight-for-weight) ---------------
_MAGIC_SOUP_CORE: List[Tuple[str, float]] = [
    ("fractal20220817_data", 0.54087122203),
    ("kuka", 0.8341046294),
    ("bridge_orig", 1.0),
    ("taco_play", 2.0),
    ("jaco_play", 1.0),
    ("berkeley_cable_routing", 1.0),
    ("roboturk", 2.0),
    ("viola", 2.0),
    ("berkeley_autolab_ur5", 2.0),
    ("toto", 1.0),
    ("stanford_hydra_dataset_converted_externally_to_rlds", 2.0),
    ("austin_buds_dataset_converted_externally_to_rlds", 1.0),
    ("nyu_franka_play_dataset_converted_externally_to_rlds", 3.0),
    ("furniture_bench_dataset_converted_externally_to_rlds", 0.1),
    ("ucsd_kitchen_dataset_converted_externally_to_rlds", 2.0),
    ("austin_sailor_dataset_converted_externally_to_rlds", 1.0),
    ("austin_sirius_dataset_converted_externally_to_rlds", 1.0),
    ("dlr_edan_shared_control_converted_externally_to_rlds", 1.0),
    ("iamlab_cmu_pickup_insert_converted_externally_to_rlds", 1.0),
    ("utaustin_mutex", 1.0),
    ("berkeley_fanuc_manipulation", 2.0),
    ("cmu_stretch", 1.0),
]
_MAGIC_SOUP_PLUS_EXTRA: List[Tuple[str, float]] = [
    ("bc_z", 0.2),
    ("fmb_dataset", 1.0),
    ("dobbe", 0.2),
]

OXE_NAMED_MIXTURES: Dict[str, List[Tuple[str, float]]] = {
    "rlbench": [("rlbench", 1.0)],
    "metaworld": [("metaworld", 1.0)],
    "franka": [("franka", 1.0)],
    "franka_dual": [("franka_dual", 1.0)],
    "rtx_dataset": [("rtx_dataset", 1.0)],
    "bridge": [("bridge_orig", 1.0)],
    "bridge_rt_1": [("bridge_orig", 1.0), ("fractal20220817_data", 1.0)],
    "oxe_magic_soup": [
        ("fractal20220817_data", 0.54087122203),
        ("kuka", 0.8341046294),
        ("bridge_orig", 1.0),
        ("taco_play", 2.0),
        ("jaco_play", 2.0),
        ("berkeley_cable_routing", 3.0),
        ("roboturk", 1.0),
        ("viola", 2.0),
        ("berkeley_autolab_ur5", 1.0),
        ("toto", 1.0),
        ("taco_play", 1.0),
        ("berkeley_cable_routing", 1.0),
        ("viola", 1.0),
        ("toto", 1.0),
        ("stanford_hydra_dataset_converted_externally_to_rlds", 1.0),
        ("austin_buds_dataset_converted_externally_to_rlds", 3.0),
        ("nyu_franka_play_dataset_converted_externally_to_rlds", 3.0),
        ("maniskill_dataset_converted_externally_to_rlds", 0.1),
        ("furniture_bench_dataset_converted_externally_to_rlds", 0.1),
        ("cmu_franka_exploration_dataset_converted_externally_to_rlds", 5.0),
        ("austin_sailor_dataset_converted_externally_to_rlds", 1.0),
        ("austin_sirius_dataset_converted_externally_to_rlds", 1.0),
        ("berkeley_rpt_converted_externally_to_rlds", 1.0),
        ("kaist_nonprehensile_converted_externally_to_rlds", 3.0),
        ("stanford_robocook_converted_externally_to_rlds", 1.0),
        ("iamlab_cmu_pickup_insert_converted_externally_to_rlds", 1.0),
        ("utaustin_mutex", 1.0),
        ("cmu_play_fusion", 1.0),
    ],
    "oxe_magic_soup_plus": (
        _MAGIC_SOUP_CORE + [("language_table", 0.1)] + _MAGIC_SOUP_PLUS_EXTRA
        + [("droid", 0.06)]
    ),
    "oxe_magic_soup_plus_minus": (
        [("fractal20220817_data", 1.0)] + _MAGIC_SOUP_CORE[1:] + _MAGIC_SOUP_PLUS_EXTRA
    ),
    "tdroid_carrot_in_bowl": [("tdroid_carrot_in_bowl", 1.0)],
    "tdroid_pour_corn_in_pot": [("tdroid_pour_corn_in_pot", 1.0)],
    "tdroid_flip_pot_upright": [("tdroid_flip_pot_upright", 1.0)],
    "tdroid_move_object_onto_plate": [("tdroid_move_object_onto_plate", 1.0)],
    "tdroid_knock_object_over": [("tdroid_knock_object_over", 1.0)],
    "tdroid_cover_object_with_towel": [("tdroid_cover_object_with_towel", 1.0)],
    "droid_wipe": [("droid_wipe", 1.0)],
    "custom_finetuning": [("custom_finetuning", 1.0)],
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
            if cfg["proprio_obs_key"] is not None:
                obs["proprio"] = tf.cast(batched["observation"][cfg["proprio_obs_key"]], tf.float32)
            else:
                # datasets without proprio (e.g. roboturk) get zeros so the
                # downstream schema stays fixed-shape
                n = tf.shape(batched["action"])[0]
                obs["proprio"] = tf.zeros([n, tf.shape(batched["action"])[-1]], tf.float32)
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
