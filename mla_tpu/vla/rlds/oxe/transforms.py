"""Per-dataset Open-X-Embodiment standardization transforms.

Parity target: reference vla/datasets/rlds/oxe/transforms.py:30-977 (and
oxe/utils/droid_utils.py for the DROID entries). Each function takes one raw
RLDS trajectory (dict of tf tensors, leading dim = time) exactly as the
tfds builder yields it — structured action dicts, zlib-compressed proprio,
unicode-codepoint instructions — and standardizes it:

  * ``action`` becomes a flat float32 [T, 7] (or 8 for joint-space robots)
    tensor laid out [translation(3) | rotation(3) | gripper(1)], with the
    gripper in the ABSOLUTE 0=closed / 1=open convention.
  * proprio source keys referenced by ``configs.py state_obs_keys``
    (``eef_state``, ``gripper_state``, ``joint_state``, ``proprio``...) are
    synthesized from the raw state layout.
  * ``language_instruction`` is lifted out of the observation when the
    builder stores it per-step.

All ops are plain TensorFlow graph ops (these run on the host in tf.data,
not on the TPU), and each function documents which reference function it
mirrors so action semantics can be audited line-by-line.
"""

from __future__ import annotations

from typing import Callable, Dict

from mla_tpu.vla.rlds.transforms import (
    binarize_gripper_actions,
    invert_gripper_actions,
    rel2abs_gripper_actions,
)


def _tf():
    import tensorflow as tf

    return tf


# --------------------------------------------------------------------------- #
# shared building blocks
# --------------------------------------------------------------------------- #


def _cat(*parts):
    return _tf().concat(list(parts), axis=-1)


def _zeros(x, n: int):
    """n zero columns with x's leading dim/dtype."""
    return _tf().zeros_like(x[:, :n])


def _lift_language(traj: Dict, key: str = "natural_language_instruction") -> Dict:
    traj["language_instruction"] = traj["observation"][key]
    return traj


def quat_to_euler(q):
    """Quaternion (x, y, z, w) -> roll/pitch/yaw for R = Rz(y)·Ry(p)·Rx(r).

    TF-math replacement for tensorflow_graphics
    ``euler.from_quaternion`` used by the reference (transforms.py:428,643,
    706); tfg is not vendored here. pitch's sine is clamped to keep asin
    finite at gimbal lock.
    """
    tf = _tf()
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = tf.atan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = tf.asin(tf.clip_by_value(2.0 * (w * y - z * x), -1.0, 1.0))
    yaw = tf.atan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return tf.stack([roll, pitch, yaw], axis=-1)


def _unzip_floats(blob, width: int):
    """ZLIB-compressed float32 bytes -> [T, width] tensor (kuka proprio)."""
    tf = _tf()
    raw = tf.io.decode_raw(tf.io.decode_compressed(blob, compression_type="ZLIB"), tf.float32)
    return tf.reshape(raw, (-1, width))


def _drop_first_step(traj: Dict, nested_action: bool) -> Dict:
    """Remove timestep 0 everywhere (Bridge V2's first action is all-zero,
    reference transforms.py:36-44/66-74). `nested_action` also slices inside
    the action dict (the OXE copy stores actions as a dict)."""
    tf = _tf()
    out = {}
    for key, val in traj.items():
        if key == "traj_metadata":
            out[key] = val
        elif key == "observation" or (key == "action" and nested_action):
            out[key] = {k: v[1:] for k, v in val.items()}
        else:
            out[key] = val[1:]
    return out


def _eef_gripper_from_state(traj: Dict, src: str = "state", eef_key: str = "eef_state",
                            eef_dims=slice(None, 6), grip_dims=slice(-1, None)) -> Dict:
    """Synthesize `eef_state`/`gripper_state` views over a packed state."""
    state = traj["observation"][src]
    traj["observation"][eef_key] = state[:, eef_dims]
    traj["observation"]["gripper_state"] = state[:, grip_dims]
    return traj


def _next_frame_keys(traj: Dict, keys) -> Dict:
    """Append next-timestep copies of `keys` (last frame repeats itself) —
    the MLA-suite `*_transform_next` pattern (reference transforms.py:806-885)."""
    tf = _tf()
    obs = traj["observation"]
    for k in keys:
        v = obs[k]
        obs[f"next_{k}"] = tf.concat([v[1:], v[-1:]], axis=0)
    return traj


# --------------------------------------------------------------------------- #
# Bridge V2 (reference transforms.py:30-86 + data_utils.relabel_bridge_actions)
# --------------------------------------------------------------------------- #


def relabel_bridge_actions(traj: Dict) -> Dict:
    """Replace translation/rotation actions with reached-state deltas and
    drop the final (actionless) step (reference data_utils.py:167-175)."""
    tf = _tf()
    reached = traj["observation"]["state"]
    deltas = reached[1:, :6] - reached[:-1, :6]
    grip = traj["action"][:-1, -1:]
    out = tf.nest.map_structure(lambda x: x[:-1], traj)
    out["action"] = tf.concat([deltas, grip], axis=1)
    return out


def bridge_oxe_transform(traj: Dict) -> Dict:
    """Open-X copy of Bridge V2: dict actions (reference transforms.py:30-57)."""
    tf = _tf()
    traj = _drop_first_step(traj, nested_action=True)
    act = traj["action"]
    traj["action"] = _cat(act["world_vector"], act["rotation_delta"],
                          tf.cast(act["open_gripper"][:, None], tf.float32))
    traj = _lift_language(traj)
    traj = relabel_bridge_actions(traj)
    return _eef_gripper_from_state(traj, eef_key="EEF_state")


def bridge_orig_transform(traj: Dict) -> Dict:
    """Project-website Bridge V2: flat actions (reference transforms.py:60-86)."""
    traj = _drop_first_step(traj, nested_action=False)
    act = traj["action"]
    traj["action"] = _cat(act[:, :6], binarize_gripper_actions(act[:, -1])[:, None])
    traj = relabel_bridge_actions(traj)
    return _eef_gripper_from_state(traj, eef_key="EEF_state")


def ppgm_transform(traj: Dict) -> Dict:
    """(reference transforms.py:89-99)"""
    act = traj["action"]
    traj["action"] = _cat(act[:, :6], binarize_gripper_actions(act[:, -1])[:, None])
    traj["observation"]["EEF_state"] = traj["observation"]["cartesian_position"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["gripper_position"][:, -1:]
    return traj


# --------------------------------------------------------------------------- #
# Google robots (reference transforms.py:102-146)
# --------------------------------------------------------------------------- #


def rt1_transform(traj: Dict) -> Dict:
    """RT-1 / fractal: relative dict gripper -> absolute."""
    act = traj["action"]
    grip = rel2abs_gripper_actions(act["gripper_closedness_action"][:, 0])
    traj["action"] = _cat(act["world_vector"], act["rotation_delta"], grip[:, None])
    return _lift_language(traj)


def kuka_transform(traj: Dict) -> Dict:
    """Kuka: RT-1 action assembly + zlib-compressed proprio decode."""
    act = traj["action"]
    grip = rel2abs_gripper_actions(act["gripper_closedness_action"][:, 0])
    traj["action"] = _cat(act["world_vector"], act["rotation_delta"], grip[:, None])
    obs = traj["observation"]
    obs["clip_function_input/base_pose_tool_reached"] = _unzip_floats(
        obs["clip_function_input/base_pose_tool_reached"], 7)
    obs["gripper_closed"] = _unzip_floats(obs["gripper_closed"], 1)
    return _lift_language(traj)


# --------------------------------------------------------------------------- #
# moderate-scale labs (reference transforms.py:149-520)
# --------------------------------------------------------------------------- #


def taco_play_transform(traj: Dict) -> Dict:
    tf = _tf()
    obs = traj["observation"]
    obs["state_eef"] = obs["robot_obs"][:, :6]
    obs["state_gripper"] = obs["robot_obs"][:, 7:8]
    act = traj["action"]["rel_actions_world"]
    traj["action"] = _cat(act[:, :6], tf.clip_by_value(act[:, -1:], 0, 1))
    return _lift_language(traj)


def jaco_play_transform(traj: Dict) -> Dict:
    obs = traj["observation"]
    obs["state_eef"] = obs["end_effector_cartesian_pos"][:, :6]
    obs["state_gripper"] = obs["end_effector_cartesian_pos"][:, -1:]
    act = traj["action"]
    grip = rel2abs_gripper_actions(act["gripper_closedness_action"][:, 0])
    wv = act["world_vector"]
    traj["action"] = _cat(wv, _tf().zeros_like(wv), grip[:, None])
    return _lift_language(traj)


def berkeley_cable_routing_transform(traj: Dict) -> Dict:
    act = traj["action"]
    traj["action"] = _cat(act["world_vector"], act["rotation_delta"],
                          _zeros(act["world_vector"], 1))
    return _lift_language(traj)


def roboturk_transform(traj: Dict) -> Dict:
    tf = _tf()
    act = traj["action"]
    grip = invert_gripper_actions(tf.clip_by_value(act["gripper_closedness_action"], 0, 1))
    traj["action"] = _cat(act["world_vector"], act["rotation_delta"], grip)
    return _lift_language(traj)


def nyu_door_opening_transform(traj: Dict) -> Dict:
    act = traj["action"]
    grip = rel2abs_gripper_actions(act["gripper_closedness_action"][:, 0])
    traj["action"] = _cat(act["world_vector"], act["rotation_delta"], grip[:, None])
    return _lift_language(traj)


def viola_transform(traj: Dict) -> Dict:
    tf = _tf()
    act = traj["action"]
    grip = invert_gripper_actions(tf.clip_by_value(act["gripper_closedness_action"][:, None], 0, 1))
    traj["action"] = _cat(act["world_vector"], act["rotation_delta"], grip)
    return _lift_language(traj)


def berkeley_autolab_ur5_transform(traj: Dict) -> Dict:
    obs = traj["observation"]
    obs["state"] = obs["robot_state"][:, 6:14]
    obs["depth"] = obs.pop("image_with_depth")
    act = traj["action"]
    grip = rel2abs_gripper_actions(act["gripper_closedness_action"])
    traj["action"] = _cat(act["world_vector"], act["rotation_delta"], grip[:, None])
    return _lift_language(traj)


def toto_transform(traj: Dict) -> Dict:
    tf = _tf()
    act = traj["action"]
    traj["action"] = _cat(act["world_vector"], act["rotation_delta"],
                          tf.cast(act["open_gripper"][:, None], tf.float32))
    return _lift_language(traj)


def language_table_transform(traj: Dict) -> Dict:
    """2-DoF pusher: pad translation-only actions to 7-DoF (gripper held
    open); decode unicode-codepoint instructions (reference :301-320)."""
    tf = _tf()
    act = traj["action"]
    traj["action"] = _cat(act, tf.zeros_like(act), tf.zeros_like(act),
                          tf.ones_like(act[:, :1]))
    codepoints = traj["observation"]["instruction"]
    text = tf.strings.unicode_encode(codepoints, output_encoding="UTF-8")
    traj["language_instruction"] = tf.strings.split(text, "\x00")[:, :1].to_tensor()[:, 0]
    return traj


def pusht_transform(traj: Dict) -> Dict:
    act = traj["action"]
    traj["action"] = _cat(act["world_vector"], act["rotation_delta"],
                          act["gripper_closedness_action"][:, None])
    return _lift_language(traj)


def stanford_kuka_multimodal_transform(traj: Dict) -> Dict:
    traj["observation"]["depth_image"] = traj["observation"]["depth_image"][..., 0]
    act = traj["action"]
    traj["action"] = _cat(act[:, :3], _zeros(act, 3), act[:, -1:])
    return traj


def nyu_rot_transform(traj: Dict) -> Dict:
    traj = _eef_gripper_from_state(traj)
    traj["action"] = traj["action"][..., :7]
    return traj


def stanford_hydra_transform(traj: Dict) -> Dict:
    act = traj["action"]
    traj["action"] = _cat(act[:, :6], invert_gripper_actions(act[:, -1:]))
    state = traj["observation"]["state"]
    traj["observation"]["eef_state"] = _cat(state[:, :3], state[:, 7:10])
    traj["observation"]["gripper_state"] = state[:, -3:-2]
    return traj


def _clip_invert_gripper(traj: Dict) -> Dict:
    """act[:, :6] | invert(clip(act[:, -1:], 0, 1)) — the shared austin/
    mutex/furniture gripper convention (reference :378-...)."""
    tf = _tf()
    act = traj["action"]
    traj["action"] = _cat(act[:, :6], invert_gripper_actions(tf.clip_by_value(act[:, -1:], 0, 1)))
    return traj


def austin_buds_transform(traj: Dict) -> Dict:
    traj = _clip_invert_gripper(traj)
    traj["observation"]["state"] = traj["observation"]["state"][:, :8]
    return traj


def nyu_franka_play_transform(traj: Dict) -> Dict:
    tf = _tf()
    obs = traj["observation"]
    obs["depth"] = tf.cast(obs["depth"][..., 0], tf.float32)
    obs["depth_additional_view"] = tf.cast(obs["depth_additional_view"][..., 0], tf.float32)
    obs["eef_state"] = obs["state"][:, -6:]
    act = traj["action"]
    traj["action"] = _cat(act[:, -8:-2], tf.clip_by_value(act[:, -2:-1], 0, 1))
    return traj


def maniskill_transform(traj: Dict) -> Dict:
    traj["observation"]["gripper_state"] = traj["observation"]["state"][..., 7:8]
    return traj


def furniture_bench_transform(traj: Dict) -> Dict:
    tf = _tf()
    state = traj["observation"]["state"]
    traj["observation"]["state"] = _cat(state[:, :7], state[:, -1:])
    act = traj["action"]
    traj["action"] = _cat(act[:, :3], quat_to_euler(act[:, 3:7]),
                          invert_gripper_actions(tf.clip_by_value(act[:, -1:], 0, 1)))
    return traj


def cmu_franka_exploration_transform(traj: Dict) -> Dict:
    traj["action"] = traj["action"][..., :-1]
    return traj


def ucsd_kitchen_transform(traj: Dict) -> Dict:
    traj["observation"]["joint_state"] = traj["observation"]["state"][:, :7]
    traj["action"] = traj["action"][..., :-1]
    return traj


def ucsd_pick_place_transform(traj: Dict) -> Dict:
    traj = _eef_gripper_from_state(traj)
    act = traj["action"]
    traj["action"] = _cat(act[:, :3], _zeros(act, 3), act[:, -1:])
    return traj


def bc_z_transform(traj: Dict) -> Dict:
    """Actions assembled from the future-residual dict (reference :500-510)."""
    tf = _tf()
    act = traj["action"]
    traj["action"] = _cat(
        act["future/xyz_residual"][:, :3],
        act["future/axis_angle_residual"][:, :3],
        invert_gripper_actions(tf.cast(act["future/target_close"][:, :1], tf.float32)),
    )
    return _lift_language(traj)


def tokyo_pr2_transform(traj: Dict) -> Dict:
    traj = _eef_gripper_from_state(traj)
    traj["action"] = traj["action"][..., :-1]
    return traj


def utokyo_xarm_pick_place_transform(traj: Dict) -> Dict:
    return traj


def utokyo_xarm_bimanual_transform(traj: Dict) -> Dict:
    traj["action"] = traj["action"][..., -7:]
    return traj


def robo_net_transform(traj: Dict) -> Dict:
    state = traj["observation"]["state"]
    traj["observation"]["eef_state"] = _cat(state[:, :4], _zeros(state, 2))
    traj["observation"]["gripper_state"] = state[:, -1:]
    act = traj["action"]
    traj["action"] = _cat(act[:, :4], _zeros(act, 2), act[:, -1:])
    return traj


def identity_transform(traj: Dict) -> Dict:
    return traj


def kaist_nonprehensile_transform(traj: Dict) -> Dict:
    traj["observation"]["state"] = traj["observation"]["state"][:, -7:]
    act = traj["action"]
    traj["action"] = _cat(act[:, :6], _zeros(act, 1))
    return traj


def stanford_mask_vit_transform(traj: Dict) -> Dict:
    pose = traj["observation"]["end_effector_pose"]
    traj["observation"]["eef_state"] = _cat(pose[:, :4], _zeros(pose, 2))
    traj["observation"]["gripper_state"] = pose[:, -1:]
    act = traj["action"]
    traj["action"] = _cat(act[:, :4], _zeros(act, 2), act[:, -1:])
    return traj


def tokyo_lsmo_transform(traj: Dict) -> Dict:
    return _eef_gripper_from_state(traj)


def dlr_sara_grid_clamp_transform(traj: Dict) -> Dict:
    traj["observation"]["state"] = traj["observation"]["state"][:, :6]
    return traj


def dlr_edan_transform(traj: Dict) -> Dict:
    act = traj["action"]
    traj["action"] = _cat(act[:, :6], invert_gripper_actions(act[:, -1:]))
    return traj


def asu_table_top_transform(traj: Dict) -> Dict:
    traj["observation"]["eef_state"] = traj["ground_truth_states"]["EE"]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, -1:]
    return traj


def robocook_transform(traj: Dict) -> Dict:
    return _eef_gripper_from_state(traj)


def imperial_wristcam_transform(traj: Dict) -> Dict:
    traj["action"] = traj["action"][..., :-1]
    return traj


def iamlab_pick_insert_transform(traj: Dict) -> Dict:
    obs = traj["observation"]
    obs["joint_state"] = obs["state"][:, :7]
    obs["gripper_state"] = obs["state"][:, 7:8]
    act = traj["action"]
    traj["action"] = _cat(act[:, :3], quat_to_euler(act[:, 3:7]), act[:, 7:8])
    return traj


def uiuc_d3field_transform(traj: Dict) -> Dict:
    tf = _tf()
    act = traj["action"]
    traj["action"] = _cat(act, tf.zeros_like(act), _zeros(act, 1))
    return traj


def utaustin_mutex_transform(traj: Dict) -> Dict:
    traj["observation"]["state"] = traj["observation"]["state"][:, :8]
    return _clip_invert_gripper(traj)


def berkeley_fanuc_transform(traj: Dict) -> Dict:
    """No stored gripper actions — derive from (inverted) gripper state."""
    obs = traj["observation"]
    obs["joint_state"] = obs["state"][:, :6]
    obs["gripper_state"] = obs["state"][:, 6:7]
    traj["action"] = _cat(traj["action"], invert_gripper_actions(obs["gripper_state"]))
    return traj


def cmu_playing_with_food_transform(traj: Dict) -> Dict:
    act = traj["action"]
    traj["action"] = _cat(act[:, :3], quat_to_euler(act[:, 3:7]), act[:, -1:])
    return traj


def playfusion_transform(traj: Dict) -> Dict:
    act = traj["action"]
    traj["action"] = _cat(act[:, :3], act[:, -4:])
    return traj


def cmu_stretch_transform(traj: Dict) -> Dict:
    state = traj["observation"]["state"]
    traj["observation"]["eef_state"] = _cat(state[:, :3], _zeros(state, 3))
    traj["observation"]["gripper_state"] = state[:, -1:]
    traj["action"] = traj["action"][..., :-1]
    return traj


def gnm_transform(traj: Dict) -> Dict:
    tf = _tf()
    obs = traj["observation"]
    obs["state"] = _cat(obs["position"], _zeros(obs["state"], 3), obs["yaw"])
    act = traj["action"]
    traj["action"] = _cat(act, tf.zeros_like(act), tf.zeros_like(act), _zeros(act, 1))
    return traj


# --------------------------------------------------------------------------- #
# DROID (reference oxe/utils/droid_utils.py)
# --------------------------------------------------------------------------- #


def _euler_to_rmat(e):
    """R = Rz(yaw)·Ry(pitch)·Rx(roll) — inverse of quat_to_euler's mapping
    (tensorflow_graphics rotation_matrix_3d.from_euler convention)."""
    tf = _tf()
    r, p, y = e[..., 0], e[..., 1], e[..., 2]
    cr, sr = tf.cos(r), tf.sin(r)
    cp, sp = tf.cos(p), tf.sin(p)
    cy, sy = tf.cos(y), tf.sin(y)
    row0 = tf.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1)
    row1 = tf.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1)
    row2 = tf.stack([-sp, cp * sr, cp * cr], axis=-1)
    return tf.stack([row0, row1, row2], axis=-2)


def _rmat_to_rot6d(mat):
    """First two rows, flattened (reference droid_utils.rotmat_to_rot6d)."""
    tf = _tf()
    return tf.concat([mat[..., 0, :], mat[..., 1, :]], axis=-1)


def velocity_act_to_wrist_frame(velocity, wrist_pose):
    """Rotate a base-frame 6-DoF velocity into the wrist frame, rotation as
    R6 (reference droid_utils.velocity_act_to_wrist_frame)."""
    tf = _tf()
    R = _euler_to_rmat(wrist_pose[:, 3:6])
    R_inv = tf.linalg.matrix_transpose(R)
    vel_t = tf.linalg.matvec(R_inv, velocity[:, :3])
    dR = R_inv @ (_euler_to_rmat(velocity[:, 3:6]) @ R)
    return tf.concat([vel_t, _rmat_to_rot6d(dR)], axis=-1)


def _droid_action_and_proprio(traj: Dict) -> Dict:
    vel = traj["action_dict"]["cartesian_velocity"]
    traj["action"] = _cat(vel[:, :3], vel[:, 3:6],
                          1 - traj["action_dict"]["gripper_position"])
    traj["observation"]["proprio"] = _cat(
        traj["observation"]["cartesian_position"],
        traj["observation"]["gripper_position"],
    )
    return traj


def droid_baseact_transform(traj: Dict) -> Dict:
    """Base-frame DROID actions + random exterior-camera swap."""
    tf = _tf()
    traj = _droid_action_and_proprio(traj)
    obs = traj["observation"]
    img1, img2 = obs["exterior_image_1_left"], obs["exterior_image_2_left"]
    obs["exterior_image_1_left"], obs["exterior_image_2_left"] = tf.cond(
        tf.random.uniform([]) > 0.5, lambda: (img1, img2), lambda: (img2, img1)
    )
    return traj


def droid_finetuning_transform(traj: Dict) -> Dict:
    """Base-frame DROID actions, fixed camera (droid_wipe finetuning)."""
    return _droid_action_and_proprio(traj)


def droid_zero_action_filter(frame: Dict) -> "object":
    """Drop frames whose (normalized) 6-DoF action is exactly the normalized
    zero action (reference droid_utils.zero_action_filter). Returns tf.bool."""
    tf = _tf()
    q01 = tf.constant([-0.7776297926902771, -0.5803514122962952, -0.5795090794563293,
                       -0.6464047729969025, -0.7041108310222626, -0.8895104378461838])
    q99 = tf.constant([0.7597932070493698, 0.5726242214441299, 0.7351000607013702,
                       0.6705610305070877, 0.6464948207139969, 0.8897542208433151])
    norm_zero = 2 * (tf.zeros_like(frame["action"][:, :6]) - q01) / (q99 - q01 + 1e-8) - 1
    return tf.reduce_any(tf.abs(frame["action"][:, :6] - norm_zero) > 1e-5)


def roboset_transform(traj: Dict) -> Dict:
    tf = _tf()
    traj["observation"]["proprio"] = traj["observation"]["state"]
    act = traj["action"]
    grip = invert_gripper_actions(tf.clip_by_value(act[:, -1:], 0, 1))
    traj["action"] = _cat(act[:, :7], grip)
    return traj


def fmb_transform(traj: Dict) -> Dict:
    obs = traj["observation"]
    obs["proprio"] = _cat(obs["eef_pose"], obs["state_gripper_pose"][..., None])
    return traj


def dobbe_transform(traj: Dict) -> Dict:
    traj["observation"]["proprio"] = traj["observation"]["state"]
    return traj


def rh20t_transform(traj: Dict) -> Dict:
    tf = _tf()
    act = traj["action"]
    traj["action"] = _cat(act["tcp_base"], tf.cast(act["gripper"][:, None], tf.float32))
    obs = traj["observation"]
    obs["proprio"] = _cat(obs["tcp_base"], obs["gripper_width"][..., None])
    return traj


def tdroid_transform(traj: Dict) -> Dict:
    act = traj["action"]
    traj["action"] = _cat(act[:, :6], binarize_gripper_actions(act[:, -1])[:, None])
    traj["observation"]["EEF_state"] = traj["observation"]["cartesian_position"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["gripper_position"][:, -1:]
    return traj


# --------------------------------------------------------------------------- #
# MLA suites: next-frame synthesis (reference transforms.py:806-899)
# --------------------------------------------------------------------------- #


def rlbench_transform(traj: Dict) -> Dict:
    return _next_frame_keys(traj, ["front_image", "point_cloud"])


def metaworld_transform(traj: Dict) -> Dict:
    return _next_frame_keys(traj, ["image_third", "point_cloud"])


def franka_transform(traj: Dict) -> Dict:
    return _next_frame_keys(traj, ["image_third", "point_cloud", "tactile_right", "tactile_left"])


def agilex_transform(traj: Dict) -> Dict:
    return _next_frame_keys(traj, ["image_head", "image_right", "image_left"])


def rtx_dataset_transform(traj: Dict) -> Dict:
    return _next_frame_keys(traj, ["image"])


# --------------------------------------------------------------------------- #
# registry (reference OXE_STANDARDIZATION_TRANSFORMS, transforms.py:902-977)
# --------------------------------------------------------------------------- #

OXE_STANDARDIZATION_TRANSFORMS: Dict[str, Callable] = {
    "bridge_oxe": bridge_oxe_transform,
    "bridge_orig": bridge_orig_transform,
    "bridge_dataset": bridge_orig_transform,
    "ppgm": ppgm_transform,
    "ppgm_static": ppgm_transform,
    "ppgm_wrist": ppgm_transform,
    "fractal20220817_data": rt1_transform,
    "kuka": kuka_transform,
    "taco_play": taco_play_transform,
    "jaco_play": jaco_play_transform,
    "berkeley_cable_routing": berkeley_cable_routing_transform,
    "roboturk": roboturk_transform,
    "nyu_door_opening_surprising_effectiveness": nyu_door_opening_transform,
    "viola": viola_transform,
    "berkeley_autolab_ur5": berkeley_autolab_ur5_transform,
    "toto": toto_transform,
    "language_table": language_table_transform,
    "columbia_cairlab_pusht_real": pusht_transform,
    "stanford_kuka_multimodal_dataset_converted_externally_to_rlds": stanford_kuka_multimodal_transform,
    "nyu_rot_dataset_converted_externally_to_rlds": nyu_rot_transform,
    "stanford_hydra_dataset_converted_externally_to_rlds": stanford_hydra_transform,
    "austin_buds_dataset_converted_externally_to_rlds": austin_buds_transform,
    "nyu_franka_play_dataset_converted_externally_to_rlds": nyu_franka_play_transform,
    "maniskill_dataset_converted_externally_to_rlds": maniskill_transform,
    "furniture_bench_dataset_converted_externally_to_rlds": furniture_bench_transform,
    "cmu_franka_exploration_dataset_converted_externally_to_rlds": cmu_franka_exploration_transform,
    "ucsd_kitchen_dataset_converted_externally_to_rlds": ucsd_kitchen_transform,
    "ucsd_pick_and_place_dataset_converted_externally_to_rlds": ucsd_pick_place_transform,
    "austin_sailor_dataset_converted_externally_to_rlds": _clip_invert_gripper,
    "austin_sirius_dataset_converted_externally_to_rlds": _clip_invert_gripper,
    "bc_z": bc_z_transform,
    "utokyo_pr2_opening_fridge_converted_externally_to_rlds": tokyo_pr2_transform,
    "utokyo_pr2_tabletop_manipulation_converted_externally_to_rlds": tokyo_pr2_transform,
    "utokyo_xarm_pick_and_place_converted_externally_to_rlds": utokyo_xarm_pick_place_transform,
    "utokyo_xarm_bimanual_converted_externally_to_rlds": utokyo_xarm_bimanual_transform,
    "robo_net": robo_net_transform,
    "berkeley_mvp_converted_externally_to_rlds": identity_transform,
    "berkeley_rpt_converted_externally_to_rlds": identity_transform,
    "kaist_nonprehensile_converted_externally_to_rlds": kaist_nonprehensile_transform,
    "stanford_mask_vit_converted_externally_to_rlds": stanford_mask_vit_transform,
    "tokyo_u_lsmo_converted_externally_to_rlds": tokyo_lsmo_transform,
    "dlr_sara_pour_converted_externally_to_rlds": identity_transform,
    "dlr_sara_grid_clamp_converted_externally_to_rlds": dlr_sara_grid_clamp_transform,
    "dlr_edan_shared_control_converted_externally_to_rlds": dlr_edan_transform,
    "asu_table_top_converted_externally_to_rlds": asu_table_top_transform,
    "stanford_robocook_converted_externally_to_rlds": robocook_transform,
    "imperialcollege_sawyer_wrist_cam": imperial_wristcam_transform,
    "iamlab_cmu_pickup_insert_converted_externally_to_rlds": iamlab_pick_insert_transform,
    "uiuc_d3field": uiuc_d3field_transform,
    "utaustin_mutex": utaustin_mutex_transform,
    "berkeley_fanuc_manipulation": berkeley_fanuc_transform,
    "cmu_playing_with_food": cmu_playing_with_food_transform,
    "cmu_play_fusion": playfusion_transform,
    "cmu_stretch": cmu_stretch_transform,
    "berkeley_gnm_recon": gnm_transform,
    "berkeley_gnm_cory_hall": gnm_transform,
    "berkeley_gnm_sac_son": gnm_transform,
    "droid": droid_baseact_transform,
    "fmb_dataset": fmb_transform,
    "dobbe": dobbe_transform,
    "roboset": roboset_transform,
    "rh20t": rh20t_transform,
    "tdroid_carrot_in_bowl": tdroid_transform,
    "tdroid_pour_corn_in_pot": tdroid_transform,
    "tdroid_flip_pot_upright": tdroid_transform,
    "tdroid_move_object_onto_plate": tdroid_transform,
    "tdroid_knock_object_over": tdroid_transform,
    "tdroid_cover_object_with_towel": tdroid_transform,
    "droid_wipe": droid_finetuning_transform,
    "custom_finetuning": identity_transform,
    "rlbench": rlbench_transform,
    "metaworld": metaworld_transform,
    "franka": franka_transform,
    "franka_dual": franka_transform,
    "agilex": agilex_transform,
    "rtx_dataset": rtx_dataset_transform,
}

# frame-level filters referenced by configs' aux_kwargs (string names so the
# config table stays JSON-serializable)
FRAME_FILTERS: Dict[str, Callable] = {
    "droid_zero_action_filter": droid_zero_action_filter,
}


def get_standardization_transform(name: str) -> Callable:
    return OXE_STANDARDIZATION_TRANSFORMS.get(name, identity_transform)
