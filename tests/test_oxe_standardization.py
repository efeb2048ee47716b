"""Per-dataset OXE standardization: raw builder feature structures (dict
actions, compressed proprio, unicode instructions) -> standardized 7-DoF
actions, verified numerically against independent numpy implementations.

Parity targets: reference vla/datasets/rlds/oxe/transforms.py,
oxe/utils/droid_utils.py, oxe/mixtures.py, oxe/configs.py.
"""

import importlib.util
import sys
import types
import zlib

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from mla_tpu.vla.rlds.dataset import make_restructure_fn
from mla_tpu.vla.rlds.oxe import (
    OXE_DATASET_CONFIGS,
    OXE_NAMED_MIXTURES,
    OXE_STANDARDIZATION_TRANSFORMS,
    make_oxe_dataset_kwargs,
)
from mla_tpu.vla.rlds.oxe import transforms as ox

REFERENCE_OXE = "/root/reference/vla/datasets/rlds/oxe"


# --------------------------------------------------------------------------- #
# independent numpy gripper-convention implementations
# --------------------------------------------------------------------------- #


def np_binarize(a):
    out = np.empty(len(a), np.float32)
    carry = a[-1]
    for i in reversed(range(len(a))):
        if not (0.05 <= a[i] <= 0.95):
            carry = float(a[i] > 0.95)
        out[i] = carry
    return out


def np_rel2abs(a):
    thresh = np.where(np.asarray(a) < -0.1, 1, np.where(np.asarray(a) > 0.1, -1, 0))
    nz = np.nonzero(thresh != 0)[0]
    start = -thresh[nz[0]] if len(nz) else 1
    out = np.empty(len(a), np.float32)
    carry = start
    for i in range(len(a)):
        if thresh[i] != 0:
            carry = thresh[i]
        out[i] = carry
    return out / 2 + 0.5


def np_quat_to_euler(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1, 1))
    yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return np.stack([roll, pitch, yaw], axis=-1)


# --------------------------------------------------------------------------- #
# registry-level parity vs the reference files
# --------------------------------------------------------------------------- #


def _load_reference_module(path, name):
    # stub the reference's internal imports so the file loads standalone
    stubs = ["vla", "vla.datasets", "vla.datasets.rlds", "vla.datasets.rlds.oxe",
             "vla.datasets.rlds.oxe.utils"]
    for s in stubs:
        sys.modules.setdefault(s, types.ModuleType(s))
    droid_stub = types.ModuleType("vla.datasets.rlds.oxe.utils.droid_utils")
    droid_stub.zero_action_filter = lambda x: x
    sys.modules["vla.datasets.rlds.oxe.utils.droid_utils"] = droid_stub
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_mixtures_match_reference():
    """Every reference mixture exists name-for-name, weight-for-weight, in
    order (including duplicate entries)."""
    ref = _load_reference_module(f"{REFERENCE_OXE}/mixtures.py", "ref_mixtures")
    for mix_name, members in ref.OXE_NAMED_MIXTURES.items():
        assert mix_name in OXE_NAMED_MIXTURES, f"missing mixture {mix_name}"
        assert OXE_NAMED_MIXTURES[mix_name] == [tuple(m) for m in members], mix_name


def test_configs_match_reference():
    """Camera/depth/state key maps match the reference matrix for every
    dataset it defines (our matrix may add padded None views and the agilex
    entry the reference forgot)."""
    ref = _load_reference_module(f"{REFERENCE_OXE}/configs.py", "ref_configs")
    for name, rcfg in ref.OXE_DATASET_CONFIGS.items():
        ours = OXE_DATASET_CONFIGS.get(name)
        assert ours is not None, f"missing config {name}"
        for group in ("image_obs_keys", "depth_obs_keys"):
            for view, src in rcfg[group].items():
                if src is not None:
                    assert ours[group].get(view) == src, f"{name}.{group}.{view}"
            extra = set(ours[group]) - set(rcfg[group])
            assert all(ours[group][v] is None for v in extra), f"{name}.{group} extras"
        assert list(ours["state_obs_keys"]) == list(rcfg["state_obs_keys"]), name
        assert int(ours["state_encoding"]) == int(rcfg["state_encoding"]), name
        assert int(ours["action_encoding"]) == int(rcfg["action_encoding"]), name


def test_transform_registry_matches_reference_names():
    ref_src = open(f"{REFERENCE_OXE}/transforms.py").read()
    start = ref_src.index("OXE_STANDARDIZATION_TRANSFORMS = {")
    ref_names = set()
    for line in ref_src[start:].splitlines():
        line = line.strip()
        if line.startswith('"') and '":' in line:
            ref_names.add(line.split('"')[1])
    assert ref_names <= set(OXE_STANDARDIZATION_TRANSFORMS), (
        ref_names - set(OXE_STANDARDIZATION_TRANSFORMS)
    )


def test_every_mixture_member_loadable():
    for mix, members in OXE_NAMED_MIXTURES.items():
        for name, w in members:
            assert w > 0
            assert name in OXE_DATASET_CONFIGS, f"{mix}: {name}"
            assert name in OXE_STANDARDIZATION_TRANSFORMS, f"{mix}: {name}"


# --------------------------------------------------------------------------- #
# raw-schema fixtures
# --------------------------------------------------------------------------- #

T_LEN = 6
RNG = np.random.default_rng(7)


def _f(*shape):
    return RNG.normal(size=(T_LEN, *shape)).astype(np.float32)


def _img():
    return RNG.integers(0, 255, (T_LEN, 8, 8, 3), dtype=np.uint8).astype(np.uint8)


def _lang():
    return np.asarray([b"wipe the table"] * T_LEN)


def _grip01():
    return np.asarray([1.0, 0.97, 0.5, 0.03, 0.0, 0.0], np.float32)[:T_LEN]


def _griprel():
    return np.asarray([0.0, 1.0, 0.0, -1.0, 0.0, 1.0], np.float32)[:T_LEN]


def _dict_action(grip, grip_shape=(T_LEN, 1)):
    return {
        "world_vector": _f(3),
        "rotation_delta": _f(3),
        "gripper_closedness_action": np.reshape(grip, grip_shape),
    }


def _run(name, raw, **kwargs_overrides):
    """Feed a raw trajectory through the full kwargs -> restructure path."""
    kwargs = make_oxe_dataset_kwargs(name, "/tmp/none", load_camera_views=("primary",),
                                     load_proprio=True, load_pointcloud=False)
    kwargs.update(kwargs_overrides)
    fn = make_restructure_fn(
        name,
        kwargs["standardize_fn"],
        {k: v for k, v in kwargs["image_obs_keys"].items()},
        kwargs.get("depth_obs_keys", {}),
        kwargs.get("state_obs_keys", []),
        kwargs.get("language_key"),
        load_pointcloud=False,
        load_tactile=False,
        absolute_action_mask=kwargs.get("absolute_action_mask"),
    )
    raw_tf = tf.nest.map_structure(tf.convert_to_tensor, raw)
    return tf.nest.map_structure(
        lambda x: x.numpy() if hasattr(x, "numpy") else x, fn(raw_tf)
    )


def test_rt1_fractal_raw_schema():
    raw = {
        "observation": {"image": _img(), "natural_language_instruction": _lang(),
                        "base_pose_tool_reached": _f(7), "gripper_closed": _f(1)},
        "action": _dict_action(_griprel()),
    }
    out = _run("fractal20220817_data", raw)
    exp_grip = np_rel2abs(raw["action"]["gripper_closedness_action"][:, 0])
    np.testing.assert_allclose(out["action"][:, :3], raw["action"]["world_vector"], rtol=1e-6)
    np.testing.assert_allclose(out["action"][:, 3:6], raw["action"]["rotation_delta"], rtol=1e-6)
    np.testing.assert_allclose(out["action"][:, 6], exp_grip, rtol=1e-6)
    assert out["observation"]["proprio"].shape == (T_LEN, 8)
    assert out["task"]["language_instruction"][0] == b"wipe the table"
    # absolute_action_mask: gripper only
    assert out["absolute_action_mask"][0].tolist() == [False] * 6 + [True]


def test_kuka_compressed_proprio_raw_schema():
    pose = RNG.normal(size=(T_LEN, 7)).astype(np.float32)
    grip_state = RNG.normal(size=(T_LEN, 1)).astype(np.float32)
    raw = {
        "observation": {
            "image": _img(),
            "natural_language_instruction": _lang(),
            "clip_function_input/base_pose_tool_reached": np.asarray(
                [zlib.compress(p.tobytes()) for p in pose]
            ),
            "gripper_closed": np.asarray([zlib.compress(g.tobytes()) for g in grip_state]),
        },
        "action": _dict_action(_griprel()),
    }
    out = _run("kuka", raw)
    np.testing.assert_allclose(out["observation"]["proprio"][:, :7], pose, rtol=1e-6)
    np.testing.assert_allclose(out["observation"]["proprio"][:, 7:], grip_state, rtol=1e-6)
    np.testing.assert_allclose(
        out["action"][:, 6], np_rel2abs(raw["action"]["gripper_closedness_action"][:, 0])
    )


def test_bridge_orig_raw_schema():
    state = _f(7)
    flat_act = np.concatenate([_f(6), _grip01()[:, None]], axis=1)
    flat_act[0] = 0.0  # bridge's all-zero first action
    raw = {
        "observation": {"image_0": _img(), "image_1": _img(), "state": state},
        "action": flat_act,
        "language_instruction": _lang(),
    }
    out = _run("bridge_orig", raw)
    # first step dropped, actions relabeled to reached-state deltas, last step dropped
    assert out["action"].shape[0] == T_LEN - 2
    exp_deltas = state[2:, :6] - state[1:-1, :6]
    np.testing.assert_allclose(out["action"][:, :6], exp_deltas, rtol=1e-5)
    exp_grip = np_binarize(flat_act[1:, 6])[:-1]
    np.testing.assert_allclose(out["action"][:, 6], exp_grip)
    # proprio = EEF_state(6) | pad(1) | gripper_state(1)
    np.testing.assert_allclose(out["observation"]["proprio"][:, :6], state[1:-1, :6], rtol=1e-6)
    np.testing.assert_allclose(out["observation"]["proprio"][:, 6], 0.0)
    np.testing.assert_allclose(out["observation"]["proprio"][:, 7], state[1:-1, -1], rtol=1e-6)


def test_bridge_oxe_dict_action_raw_schema():
    state = _f(7)
    raw = {
        "observation": {"image": _img(), "image_1": _img(), "state": state,
                        "natural_language_instruction": _lang()},
        "action": {"world_vector": _f(3), "rotation_delta": _f(3),
                   "open_gripper": RNG.integers(0, 2, (T_LEN,)).astype(bool)},
        "traj_metadata": np.zeros(3, np.float32),
    }
    out = _run("bridge_oxe", raw)
    assert out["action"].shape == (T_LEN - 2, 7)
    exp_deltas = state[2:, :6] - state[1:-1, :6]
    np.testing.assert_allclose(out["action"][:, :6], exp_deltas, rtol=1e-5)
    np.testing.assert_allclose(
        out["action"][:, 6], raw["action"]["open_gripper"][1:-1].astype(np.float32)
    )


def test_taco_play_raw_schema():
    robot_obs = _f(15)
    rel = np.concatenate([_f(6), np.linspace(-1, 1, T_LEN, dtype=np.float32)[:, None]], axis=1)
    raw = {
        "observation": {"rgb_static": _img(), "robot_obs": robot_obs,
                        "natural_language_instruction": _lang()},
        "action": {"rel_actions_world": rel},
    }
    out = _run("taco_play", raw)
    np.testing.assert_allclose(out["action"][:, :6], rel[:, :6], rtol=1e-6)
    np.testing.assert_allclose(out["action"][:, 6], np.clip(rel[:, 6], 0, 1), rtol=1e-6)
    np.testing.assert_allclose(out["observation"]["proprio"][:, :6], robot_obs[:, :6], rtol=1e-6)
    np.testing.assert_allclose(out["observation"]["proprio"][:, 7], robot_obs[:, 7], rtol=1e-6)


def test_jaco_play_raw_schema():
    eef = _f(7)
    raw = {
        "observation": {"image": _img(), "end_effector_cartesian_pos": eef,
                        "natural_language_instruction": _lang()},
        "action": _dict_action(_griprel()),
    }
    out = _run("jaco_play", raw)
    np.testing.assert_allclose(out["action"][:, 3:6], 0.0)  # no rotation channel
    np.testing.assert_allclose(
        out["action"][:, 6], np_rel2abs(raw["action"]["gripper_closedness_action"][:, 0])
    )


def test_roboturk_and_viola_invert_clip():
    for name, grip_shape in (("roboturk", (T_LEN, 1)), ("viola", (T_LEN,))):
        grip = np.asarray([-0.4, 0.0, 0.6, 1.0, 1.3, 0.2], np.float32)[:T_LEN]
        raw = {
            "observation": {OXE_DATASET_CONFIGS[name]["image_obs_keys"]["primary"]: _img(),
                            "joint_states": _f(7), "gripper_states": _f(1),
                            "natural_language_instruction": _lang()},
            "action": _dict_action(grip, grip_shape),
        }
        out = _run(name, raw)
        np.testing.assert_allclose(out["action"][:, 6], 1 - np.clip(grip, 0, 1), rtol=1e-6,
                                   err_msg=name)


def test_berkeley_autolab_ur5_raw_schema():
    robot_state = _f(15)
    raw = {
        "observation": {"image": _img(), "robot_state": robot_state,
                        "image_with_depth": _f(8, 8, 1),
                        "natural_language_instruction": _lang()},
        "action": {"world_vector": _f(3), "rotation_delta": _f(3),
                   "gripper_closedness_action": _griprel()},
    }
    out = _run("berkeley_autolab_ur5", raw)
    np.testing.assert_allclose(out["action"][:, 6], np_rel2abs(_griprel()))
    np.testing.assert_allclose(out["observation"]["proprio"], robot_state[:, 6:14], rtol=1e-6)


def test_language_table_unicode_and_padding():
    text = "push the red block"
    codes = np.zeros((T_LEN, 32), np.int32)
    codes[:, : len(text)] = [ord(c) for c in text]
    act2 = _f(2)
    raw = {
        "observation": {"rgb": _img(), "instruction": codes,
                        "effector_translation": _f(2)},
        "action": act2,
    }
    out = _run("language_table", raw)
    assert out["action"].shape == (T_LEN, 7)
    np.testing.assert_allclose(out["action"][:, :2], act2, rtol=1e-6)
    np.testing.assert_allclose(out["action"][:, 6], 1.0)  # gripper held open
    assert out["task"]["language_instruction"][0].decode() == text


def test_stanford_hydra_state_synthesis():
    state = _f(27)
    act = np.concatenate([_f(6), _grip01()[:, None]], axis=1)
    raw = {"observation": {"image": _img(), "state": state},
           "action": act, "language_instruction": _lang()}
    out = _run("stanford_hydra_dataset_converted_externally_to_rlds", raw)
    np.testing.assert_allclose(out["action"][:, 6], 1 - act[:, 6], rtol=1e-6)
    prop = out["observation"]["proprio"]
    np.testing.assert_allclose(prop[:, :3], state[:, :3], rtol=1e-6)
    np.testing.assert_allclose(prop[:, 3:6], state[:, 7:10], rtol=1e-6)
    np.testing.assert_allclose(prop[:, 7], state[:, -3], rtol=1e-6)


def test_nyu_franka_play_action_slice():
    act = _f(15)
    raw = {
        "observation": {"image": _img(), "image_additional_view": _img(),
                        "depth": RNG.integers(0, 1000, (T_LEN, 8, 8, 1)).astype(np.int32),
                        "depth_additional_view": RNG.integers(0, 1000, (T_LEN, 8, 8, 1)).astype(np.int32),
                        "state": _f(13)},
        "action": act, "language_instruction": _lang(),
    }
    out = _run("nyu_franka_play_dataset_converted_externally_to_rlds", raw)
    np.testing.assert_allclose(out["action"][:, :6], act[:, -8:-2], rtol=1e-6)
    np.testing.assert_allclose(out["action"][:, 6], np.clip(act[:, -2], 0, 1), rtol=1e-6)


def test_furniture_bench_quat_action():
    quat = RNG.normal(size=(T_LEN, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    act = np.concatenate([_f(3), quat, _grip01()[:, None]], axis=1)
    raw = {"observation": {"image": _img(), "state": _f(35)},
           "action": act, "language_instruction": _lang()}
    out = _run("furniture_bench_dataset_converted_externally_to_rlds", raw)
    np.testing.assert_allclose(out["action"][:, 3:6], np_quat_to_euler(quat), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["action"][:, 6], 1 - np.clip(act[:, 7], 0, 1), rtol=1e-6)


def test_iamlab_quat_action_and_joint_state():
    quat = RNG.normal(size=(T_LEN, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    act = np.concatenate([_f(3), quat, _grip01()[:, None]], axis=1)
    state = _f(10)
    raw = {"observation": {"image": _img(), "state": state},
           "action": act, "language_instruction": _lang()}
    out = _run("iamlab_cmu_pickup_insert_converted_externally_to_rlds", raw)
    np.testing.assert_allclose(out["action"][:, 3:6], np_quat_to_euler(quat), rtol=1e-4, atol=1e-5)
    prop = out["observation"]["proprio"]
    np.testing.assert_allclose(prop[:, :7], state[:, :7], rtol=1e-6)
    np.testing.assert_allclose(prop[:, 7], state[:, 7], rtol=1e-6)


def test_bc_z_future_residual_actions():
    raw = {
        "observation": {"image": _img(), "natural_language_instruction": _lang(),
                        "present/xyz": _f(3), "present/axis_angle": _f(3),
                        "present/sensed_close": _f(1)},
        "action": {"future/xyz_residual": _f(10), "future/axis_angle_residual": _f(10),
                   "future/target_close": RNG.integers(0, 2, (T_LEN, 10)).astype(np.int64)},
    }
    out = _run("bc_z", raw)
    np.testing.assert_allclose(out["action"][:, :3], raw["action"]["future/xyz_residual"][:, :3], rtol=1e-6)
    np.testing.assert_allclose(
        out["action"][:, 6], 1 - raw["action"]["future/target_close"][:, 0].astype(np.float32)
    )
    assert out["observation"]["proprio"].shape == (T_LEN, 8)


def test_berkeley_fanuc_gripper_from_state():
    state = _f(7)
    act = _f(6)
    raw = {"observation": {"image": _img(), "state": state},
           "action": act, "language_instruction": _lang()}
    out = _run("berkeley_fanuc_manipulation", raw)
    np.testing.assert_allclose(out["action"][:, :6], act, rtol=1e-6)
    np.testing.assert_allclose(out["action"][:, 6], 1 - state[:, 6], rtol=1e-6)


def test_droid_base_frame_actions():
    vel = _f(6)
    grip = np.abs(_f(1))
    raw = {
        "observation": {"exterior_image_1_left": _img(), "exterior_image_2_left": _img(),
                        "wrist_image_left": _img(), "cartesian_position": _f(6),
                        "gripper_position": grip},
        "action_dict": {"cartesian_velocity": vel, "gripper_position": grip},
        "action": _f(7),
        "language_instruction": _lang(),
    }
    out = _run("droid", raw)
    np.testing.assert_allclose(out["action"][:, :6], vel, rtol=1e-6)
    np.testing.assert_allclose(out["action"][:, 6:], 1 - grip, rtol=1e-6)
    assert out["observation"]["proprio"].shape == (T_LEN, 7)


def test_droid_wipe_no_camera_swap():
    vel, grip = _f(6), np.abs(_f(1))
    raw = {
        "observation": {"exterior_image_2_left": _img(), "wrist_image_left": _img(),
                        "cartesian_position": _f(6), "gripper_position": grip},
        "action_dict": {"cartesian_velocity": vel, "gripper_position": grip},
        "action": _f(7),
        "language_instruction": _lang(),
    }
    out = _run("droid_wipe", raw)
    np.testing.assert_allclose(out["action"][:, :6], vel, rtol=1e-6)


def test_tdroid_binarize():
    act = np.concatenate([_f(6), _grip01()[:, None]], axis=1)
    raw = {"observation": {"static_image": _img(), "cartesian_position": _f(6),
                           "gripper_position": _f(1)},
           "action": act, "language_instruction": _lang()}
    out = _run("tdroid_carrot_in_bowl", raw)
    np.testing.assert_allclose(out["action"][:, 6], np_binarize(act[:, 6]))


def test_rh20t_tcp_actions():
    tcp = _f(6)
    grip = RNG.integers(0, 2, (T_LEN,)).astype(np.int64)
    raw = {
        "observation": {"image_front": _img(), "tcp_base": _f(6),
                        "gripper_width": _f()},
        "action": {"tcp_base": tcp, "gripper": grip},
        "language_instruction": _lang(),
    }
    out = _run("rh20t", raw)
    np.testing.assert_allclose(out["action"][:, :6], tcp, rtol=1e-6)
    np.testing.assert_allclose(out["action"][:, 6], grip.astype(np.float32))
    assert out["observation"]["proprio"].shape == (T_LEN, 7)


def test_gnm_padded_actions():
    act = _f(2)
    raw = {"observation": {"image": _img(), "position": _f(2), "yaw": _f(1),
                           "state": _f(5)},
           "action": act, "language_instruction": _lang()}
    out = _run("berkeley_gnm_recon", raw, image_obs_keys={"wrist": "image"})
    assert out["action"].shape == (T_LEN, 7)
    np.testing.assert_allclose(out["action"][:, :2], act, rtol=1e-6)
    np.testing.assert_allclose(out["action"][:, 2:], 0.0)


def test_simple_slice_family():
    """Datasets standardized by plain slicing: cmu_stretch, ucsd_kitchen,
    kaist, utokyo_xarm_bimanual, cmu_franka_exploration, play_fusion."""
    act8 = _f(8)
    state = _f(8)
    cases = {
        "cmu_stretch": ({"image": _img(), "state": state}, act8, act8[:, :7]),
        "ucsd_kitchen_dataset_converted_externally_to_rlds": (
            {"image": _img(), "state": state}, act8, act8[:, :7]),
        "cmu_franka_exploration_dataset_converted_externally_to_rlds": (
            {"highres_image": _img()}, act8, act8[:, :7]),
        "utokyo_xarm_bimanual_converted_externally_to_rlds": (
            {"image": _img(), "pose_r": _f(7)}, _f(14), None),
        "cmu_play_fusion": ({"image": _img(), "state": _f(8)}, act8,
                            np.concatenate([act8[:, :3], act8[:, -4:]], axis=1)),
        "kaist_nonprehensile_converted_externally_to_rlds": (
            {"image": _img(), "state": _f(21)}, act8,
            np.concatenate([act8[:, :6], np.zeros((T_LEN, 1), np.float32)], axis=1)),
    }
    for name, (obs, act, expected) in cases.items():
        raw = {"observation": obs, "action": act, "language_instruction": _lang()}
        if name == "cmu_franka_exploration_dataset_converted_externally_to_rlds":
            raw["observation"]["natural_language_instruction"] = _lang()
        out = _run(name, raw)
        if expected is None:
            expected = act[:, -7:]
        np.testing.assert_allclose(out["action"], expected, rtol=1e-6, err_msg=name)


def test_quat_euler_rmat_roundtrip():
    """quat_to_euler and _euler_to_rmat agree: R(euler(q)) == R(q)."""
    q = RNG.normal(size=(32, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    e = ox.quat_to_euler(tf.constant(q, tf.float64)).numpy()
    R_from_euler = ox._euler_to_rmat(tf.constant(e, tf.float64)).numpy()
    # rotation matrix directly from quaternion (x,y,z,w)
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R_from_quat = np.stack([
        np.stack([1 - 2 * (y**2 + z**2), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
        np.stack([2 * (x * y + z * w), 1 - 2 * (x**2 + z**2), 2 * (y * z - x * w)], -1),
        np.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x**2 + y**2)], -1),
    ], axis=-2)
    np.testing.assert_allclose(R_from_euler, R_from_quat, atol=1e-8)


def test_droid_wrist_frame_velocity():
    """Wrist-frame translation is R^T v; rotation R6 is the first two rows
    of R^-1 dR R."""
    vel = RNG.normal(size=(4, 6))
    pose = RNG.normal(size=(4, 6))
    out = ox.velocity_act_to_wrist_frame(
        tf.constant(vel, tf.float64), tf.constant(pose, tf.float64)
    ).numpy()
    assert out.shape == (4, 9)
    R = ox._euler_to_rmat(tf.constant(pose[:, 3:6], tf.float64)).numpy()
    exp_t = np.einsum("bji,bj->bi", R, vel[:, :3])
    np.testing.assert_allclose(out[:, :3], exp_t, atol=1e-10)


def test_droid_zero_action_filter():
    q01 = np.array([-0.7776297926902771, -0.5803514122962952, -0.5795090794563293,
                    -0.6464047729969025, -0.7041108310222626, -0.8895104378461838])
    q99 = np.array([0.7597932070493698, 0.5726242214441299, 0.7351000607013702,
                    0.6705610305070877, 0.6464948207139969, 0.8897542208433151])
    norm_zero = 2 * (0 - q01) / (q99 - q01 + 1e-8) - 1
    zero_frame = {"action": tf.constant(np.concatenate(
        [norm_zero, [0.5]]).astype(np.float32)[None])}
    real_frame = {"action": tf.constant(np.ones((1, 7), np.float32))}
    assert not bool(ox.droid_zero_action_filter(zero_frame))
    assert bool(ox.droid_zero_action_filter(real_frame))


# --------------------------------------------------------------------------- #
# remaining mixture-member datasets (round 2: every dataset appearing in a
# shipped mixture has a raw-schema test)
# --------------------------------------------------------------------------- #


def _invert01(a):
    return 1.0 - np.clip(np.asarray(a), 0.0, 1.0)


def test_austin_buds_sailor_sirius_mutex_raw_schema():
    """The four clip+invert-gripper LIBERO-style datasets (reference
    transforms.py:376-498,668-684): action[:, :6] passthrough, gripper
    inverted after [0,1] clip; buds/mutex additionally slice state[:, :8]."""
    for name, state_dim in (
        ("austin_buds_dataset_converted_externally_to_rlds", 24),
        ("austin_sailor_dataset_converted_externally_to_rlds", 8),
        ("austin_sirius_dataset_converted_externally_to_rlds", 8),
        ("utaustin_mutex", 24),
    ):
        act = _f(7)
        raw = {
            "observation": {"image": _img(), "wrist_image": _img(),
                            "state": _f(state_dim)},
            "action": act,
            "language_instruction": _lang(),
        }
        out = _run(name, raw)
        np.testing.assert_allclose(out["action"][:, :6], act[:, :6], atol=1e-6)
        np.testing.assert_allclose(
            out["action"][:, 6], _invert01(act[:, 6]), atol=1e-6, err_msg=name
        )
        assert out["observation"]["proprio"].shape[-1] == 8, name


def test_berkeley_cable_routing_raw_schema():
    """Dict action without a gripper channel -> zeros appended
    (transforms.py:187-201); instruction lifted from the observation."""
    wv, rd = _f(3), _f(3)
    raw = {
        "observation": {"image": _img(), "top_image": _img(), "wrist45_image": _img(),
                        "robot_state": _f(7),
                        "natural_language_instruction": _lang()},
        "action": {"world_vector": wv, "rotation_delta": rd},
    }
    out = _run("berkeley_cable_routing", raw)
    np.testing.assert_allclose(out["action"][:, :3], wv, atol=1e-6)
    np.testing.assert_allclose(out["action"][:, 3:6], rd, atol=1e-6)
    np.testing.assert_allclose(out["action"][:, 6], 0.0)


def test_toto_raw_schema():
    """Bool open_gripper cast to float as the gripper channel
    (transforms.py:283-296)."""
    wv, rd = _f(3), _f(3)
    grip = np.asarray([True, False, True, True, False, False])[:T_LEN]
    raw = {
        "observation": {"image": _img(), "state": _f(7),
                        "natural_language_instruction": _lang()},
        "action": {"world_vector": wv, "rotation_delta": rd, "open_gripper": grip},
    }
    out = _run("toto", raw)
    np.testing.assert_allclose(out["action"][:, 6], grip.astype(np.float32))


def test_berkeley_rpt_rejected_like_reference():
    """berkeley_rpt carries JOINT_POS actions; the reference materializer
    only supports EEF-style encodings (oxe/materialize.py:35) and raises —
    ours matches that contract."""
    with pytest.raises(ValueError, match="EEF"):
        make_oxe_dataset_kwargs("berkeley_rpt_converted_externally_to_rlds", "/tmp/none")


def test_dlr_edan_raw_schema():
    """Gripper inverted WITHOUT clipping (transforms.py:611-621)."""
    act = _f(7)
    raw = {
        "observation": {"image": _img(), "state": _f(8)},
        "action": act,
        "language_instruction": _lang(),
    }
    out = _run("dlr_edan_shared_control_converted_externally_to_rlds", raw)
    np.testing.assert_allclose(out["action"][:, 6], 1.0 - act[:, 6], atol=1e-6)


def test_dobbe_and_fmb_raw_schema():
    """Batched-feature datasets: dobbe proprio = state (transforms.py:772);
    fmb proprio = eef_pose | state_gripper_pose[..., None] (:760-770)."""
    act = _f(7)
    raw = {
        "observation": {"wrist_image": _img(), "state": _f(8)},
        "action": act,
        "language_instruction": _lang(),
    }
    out = _run("dobbe", raw)
    np.testing.assert_allclose(out["observation"]["proprio"], raw["observation"]["state"], atol=1e-6)

    eef = _f(6)
    gp = RNG.normal(size=(T_LEN,)).astype(np.float32)
    raw = {
        "observation": {"image_side_1": _img(), "image_side_2": _img(),
                        "image_wrist_1": _img(), "eef_pose": eef,
                        "state_gripper_pose": gp},
        "action": act,
        "language_instruction": _lang(),
    }
    out = _run("fmb_dataset", raw)
    np.testing.assert_allclose(out["observation"]["proprio"][:, :6], eef, atol=1e-6)
    np.testing.assert_allclose(out["observation"]["proprio"][:, 6], gp, atol=1e-6)


def test_maniskill_raw_schema():
    """gripper_state synthesized from state[..., 7:8] (transforms.py:415-417)
    and concatenated behind tcp_pose in the proprio."""
    act = _f(7)
    state = _f(10)
    tcp = _f(7)
    raw = {
        "observation": {"image": _img(), "wrist_image": _img(),
                        "state": state, "tcp_pose": tcp},
        "action": act,
        "language_instruction": _lang(),
    }
    out = _run("maniskill_dataset_converted_externally_to_rlds", raw)
    np.testing.assert_allclose(out["observation"]["proprio"][:, :7], tcp, atol=1e-6)
    np.testing.assert_allclose(out["observation"]["proprio"][:, 7], state[:, 7], atol=1e-6)


def test_stanford_robocook_raw_schema():
    """eef_state/gripper_state synthesized from state slices
    (transforms.py:629-633), padded proprio via the None column."""
    act = _f(7)
    state = _f(7)
    raw = {
        "observation": {"image_1": _img(), "image_2": _img(), "state": state},
        "action": act,
        "language_instruction": _lang(),
    }
    out = _run("stanford_robocook_converted_externally_to_rlds", raw)
    prop = out["observation"]["proprio"]
    np.testing.assert_allclose(prop[:, :6], state[:, :6], atol=1e-6)
    np.testing.assert_allclose(prop[:, 6], 0.0)  # None column pads with zeros
    np.testing.assert_allclose(prop[:, 7], state[:, -1], atol=1e-6)
