"""Per-dataset standardization transforms for Open-X-Embodiment mixtures.

Parity target: reference vla/datasets/rlds/oxe/transforms.py (:897,971 —
the registry of dataset-specific functions that map each raw RLDS
trajectory onto the standardized {observation, task, action} schema, fixing
gripper conventions and action layouts) and oxe/configs.py key maps.

Each transform takes a raw trajectory dict (tf tensors, leading dim = T)
and returns it standardized: action = [dxyz(3), drpy(3), gripper(1)] with
gripper in ABSOLUTE 0=closed / 1=open convention.
"""

from __future__ import annotations

from typing import Callable, Dict

from mla_tpu.vla.rlds import transforms as T


def _tf():
    import tensorflow as tf

    return tf


def rlbench_transform(traj: Dict) -> Dict:
    """RLBench next-frame variant (reference rlbench_transform_next :826):
    actions already [dxyz, drpy, gripper(0/1 absolute)]."""
    return traj


def bridge_transform(traj: Dict) -> Dict:
    """BridgeData V2: continuous [0,1] gripper -> binarized absolute."""
    tf = _tf()
    act = traj["action"]
    grip = T.binarize_gripper_actions(act[:, -1])
    traj["action"] = tf.concat([act[:, :6], grip[:, None]], axis=1)
    return traj


def rt1_transform(traj: Dict) -> Dict:
    """RT-1 (fractal20220817): relative gripper (+1 close / -1 open) ->
    absolute 0/1."""
    tf = _tf()
    act = traj["action"]
    grip = T.rel2abs_gripper_actions(act[:, -1])
    traj["action"] = tf.concat([act[:, :6], grip[:, None]], axis=1)
    return traj


def taco_play_transform(traj: Dict) -> Dict:
    """TACO Play: gripper in {-1, 1} -> {0, 1} via invert+shift."""
    tf = _tf()
    act = traj["action"]
    grip = (act[:, -1] + 1.0) / 2.0
    traj["action"] = tf.concat([act[:, :6], grip[:, None]], axis=1)
    return traj


def jaco_play_transform(traj: Dict) -> Dict:
    """Jaco Play: inverted continuous gripper."""
    tf = _tf()
    act = traj["action"]
    grip = T.binarize_gripper_actions(T.invert_gripper_actions(act[:, -1]))
    traj["action"] = tf.concat([act[:, :6], grip[:, None]], axis=1)
    return traj


def invert_transform(traj: Dict) -> Dict:
    """Datasets whose gripper signal is inverted (1=closed): flip to the
    0=closed / 1=open absolute convention."""
    tf = _tf()
    act = traj["action"]
    grip = T.invert_gripper_actions(tf.clip_by_value(act[:, -1], 0.0, 1.0))
    traj["action"] = tf.concat([act[:, :6], grip[:, None]], axis=1)
    return traj


def identity_transform(traj: Dict) -> Dict:
    return traj


# gripper-convention family per dataset (reference
# OXE_STANDARDIZATION_TRANSFORMS, transforms.py:897-971: which of the
# binarize / rel2abs / invert helpers each per-dataset fn applies)
_BINARIZE = [
    "bridge_oxe", "bridge_orig", "bridge_dataset",
    "tdroid_carrot_in_bowl", "tdroid_pour_corn_in_pot",
    "tdroid_flip_pot_upright", "tdroid_move_object_onto_plate",
    "tdroid_knock_object_over", "tdroid_cover_object_with_towel",
    "droid", "droid_wipe",
]
_REL2ABS = [
    "fractal20220817_data", "kuka", "jaco_play",
    "nyu_door_opening_surprising_effectiveness", "berkeley_autolab_ur5",
    "custom_finetuning",
]
_INVERT = [
    "roboturk", "viola",
    "stanford_hydra_dataset_converted_externally_to_rlds",
    "austin_buds_dataset_converted_externally_to_rlds",
    "furniture_bench_dataset_converted_externally_to_rlds",
    "austin_sailor_dataset_converted_externally_to_rlds",
    "austin_sirius_dataset_converted_externally_to_rlds",
    "bc_z", "dlr_edan_shared_control_converted_externally_to_rlds",
    "utaustin_mutex", "berkeley_fanuc_manipulation", "roboset",
    # short aliases
    "stanford_hydra_dataset", "austin_buds_dataset", "austin_sailor_dataset",
    "austin_sirius_dataset", "dlr_edan_shared_control",
]
_IDENTITY = [
    "metaworld", "franka_dual", "rtx_dataset",
    "berkeley_cable_routing", "toto", "language_table",
    "columbia_cairlab_pusht_real",
    "stanford_kuka_multimodal_dataset_converted_externally_to_rlds",
    "nyu_rot_dataset_converted_externally_to_rlds",
    "nyu_franka_play_dataset_converted_externally_to_rlds",
    "maniskill_dataset_converted_externally_to_rlds",
    "cmu_franka_exploration_dataset_converted_externally_to_rlds",
    "ucsd_kitchen_dataset_converted_externally_to_rlds",
    "ucsd_pick_and_place_dataset_converted_externally_to_rlds",
    "utokyo_pr2_opening_fridge_converted_externally_to_rlds",
    "utokyo_pr2_tabletop_manipulation_converted_externally_to_rlds",
    "utokyo_xarm_pick_and_place_converted_externally_to_rlds",
    "utokyo_xarm_bimanual_converted_externally_to_rlds",
    "robo_net", "berkeley_mvp_converted_externally_to_rlds",
    "berkeley_rpt_converted_externally_to_rlds",
    "kaist_nonprehensile_converted_externally_to_rlds",
    "stanford_mask_vit_converted_externally_to_rlds",
    "tokyo_u_lsmo_converted_externally_to_rlds",
    "dlr_sara_pour_converted_externally_to_rlds",
    "dlr_sara_grid_clamp_converted_externally_to_rlds",
    "asu_table_top_converted_externally_to_rlds",
    "stanford_robocook_converted_externally_to_rlds",
    "imperialcollege_sawyer_wrist_cam",
    "iamlab_cmu_pickup_insert_converted_externally_to_rlds",
    "uiuc_d3field", "cmu_playing_with_food", "cmu_play_fusion",
    "cmu_stretch", "berkeley_gnm_recon", "berkeley_gnm_cory_hall",
    "berkeley_gnm_sac_son", "fmb_dataset", "dobbe", "rh20t",
    # short aliases
    "nyu_franka_play_dataset", "ucsd_kitchen_dataset",
    "iamlab_cmu_pickup_insert",
]

# dataset name -> standardization fn (reference OXE_STANDARDIZATION_TRANSFORMS)
OXE_STANDARDIZATION_TRANSFORMS: Dict[str, Callable] = {
    "rlbench": rlbench_transform,
    "franka": rlbench_transform,
    "taco_play": taco_play_transform,
    **{name: bridge_transform for name in _BINARIZE},
    **{name: rt1_transform for name in _REL2ABS},
    **{name: invert_transform for name in _INVERT},
    **{name: identity_transform for name in _IDENTITY},
}


def get_standardization_transform(name: str) -> Callable:
    return OXE_STANDARDIZATION_TRANSFORMS.get(name, identity_transform)
