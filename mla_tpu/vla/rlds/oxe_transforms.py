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


def identity_transform(traj: Dict) -> Dict:
    return traj


# dataset name -> standardization fn (reference OXE_STANDARDIZATION_TRANSFORMS)
OXE_STANDARDIZATION_TRANSFORMS: Dict[str, Callable] = {
    "rlbench": rlbench_transform,
    "franka": rlbench_transform,
    "bridge_orig": bridge_transform,
    "bridge_dataset": bridge_transform,
    "fractal20220817_data": rt1_transform,
    "taco_play": taco_play_transform,
    "jaco_play": jaco_play_transform,
    "kuka": rt1_transform,
    "berkeley_autolab_ur5": rt1_transform,
    "roboturk": identity_transform,
    "viola": rt1_transform,
    "toto": identity_transform,
    "stanford_hydra_dataset": bridge_transform,
    "austin_buds_dataset": bridge_transform,
    "nyu_franka_play_dataset": identity_transform,
    "ucsd_kitchen_dataset": identity_transform,
    "austin_sailor_dataset": bridge_transform,
    "austin_sirius_dataset": bridge_transform,
    "dlr_edan_shared_control": identity_transform,
    "iamlab_cmu_pickup_insert": bridge_transform,
    "utaustin_mutex": bridge_transform,
    "berkeley_fanuc_manipulation": jaco_play_transform,
    "cmu_stretch": bridge_transform,
    "bc_z": identity_transform,
    "fmb_dataset": bridge_transform,
    "dobbe": identity_transform,
    "droid": bridge_transform,
}


def get_standardization_transform(name: str) -> Callable:
    return OXE_STANDARDIZATION_TRANSFORMS.get(name, identity_transform)
