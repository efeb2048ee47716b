"""RLDS pipeline graph end-to-end on synthetic tf.data trajectories
(everything downstream of the tfds builder edge: chunking, normalization,
flattening, frame transforms, interleaving, batch transform)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from mla_tpu.vla.rlds import transforms as T
from mla_tpu.vla.rlds.dataset import (
    apply_frame_transforms,
    apply_trajectory_transforms,
    flatten_to_frames,
)


def _synthetic_traj_dataset(n_traj=3, traj_len=10, with_pc=True):
    def gen():
        rng = np.random.default_rng(0)
        for i in range(n_traj):
            obs = {
                "image_primary": rng.integers(0, 255, (traj_len, 32, 32, 3), dtype=np.uint8),
                "proprio": rng.normal(size=(traj_len, 7)).astype(np.float32),
            }
            if with_pc:
                obs["point_cloud"] = rng.normal(size=(traj_len, 64, 3)).astype(np.float32)
            yield {
                "observation": obs,
                # RLDS carries the instruction per step
                "task": {"language_instruction": np.asarray([b"stack the blocks"] * traj_len)},
                "action": rng.uniform(-1, 1, (traj_len, 7)).astype(np.float32),
            }

    sig = {
        "observation": {
            "image_primary": tf.TensorSpec((traj_len, 32, 32, 3), tf.uint8),
            "proprio": tf.TensorSpec((traj_len, 7), tf.float32),
        },
        "task": {"language_instruction": tf.TensorSpec((traj_len,), tf.string)},
        "action": tf.TensorSpec((traj_len, 7), tf.float32),
    }
    if with_pc:
        sig["observation"]["point_cloud"] = tf.TensorSpec((traj_len, 64, 3), tf.float32)
    return tf.data.Dataset.from_generator(gen, output_signature=sig)


def test_pipeline_to_frames():
    ds = _synthetic_traj_dataset()
    stats = {"action": {"q01": [-1.0] * 7, "q99": [1.0] * 7}}
    ds = apply_trajectory_transforms(
        ds, window_size=1, future_action_window_size=15, dataset_statistics=stats,
        skip_unlabeled=True, train=True,
    )
    ds = flatten_to_frames(ds)
    ds = apply_frame_transforms(ds, image_size=64, train=True, augment=False)

    frames = list(ds.take(100).as_numpy_iterator())
    assert len(frames) == 30  # 3 trajectories x 10 frames
    f = frames[0]
    assert f["action"].shape == (16, 7)  # window 1 + future 15
    assert f["observation"]["image_primary"].shape == (1, 64, 64, 3)
    assert f["observation"]["image_primary"].dtype == np.uint8
    assert f["observation"]["pad_mask"].shape == (1,)
    # feed through the host batch transform + collator
    from mla_tpu.vla.action_tokenizer import ActionTokenizer
    from mla_tpu.vla.datasets import PaddedCollatorForActionPrediction, RLDSBatchTransform
    from mla_tpu.vla.tokenizer import SimpleTokenizer

    tok = SimpleTokenizer()
    xf = RLDSBatchTransform(
        action_tokenizer=ActionTokenizer(tok, vocab_size=32000), base_tokenizer=tok,
        image_size=64, use_pointcloud=True, num_points=64,
    )
    inst = xf(f)
    batch = PaddedCollatorForActionPrediction(max_prompt_len=192)([inst])
    assert batch["images"]["front_image"].shape == (1, 4, 64, 64)
    assert batch["point_cloud"].shape == (1, 64, 3)
    assert batch["actions"].shape == (1, 16, 7)


def test_interleave_weights():
    ds_a = _synthetic_traj_dataset(n_traj=2, with_pc=False).repeat()
    ds_b = _synthetic_traj_dataset(n_traj=2, with_pc=False).repeat()

    def tag(ds, name):
        def fn(traj):
            traj = dict(traj)
            traj["dataset_name"] = tf.constant(name)
            return traj

        return ds.map(fn)

    mixed = tf.data.Dataset.sample_from_datasets(
        [tag(ds_a, "a"), tag(ds_b, "b")], [0.8, 0.2], seed=0
    )
    names = [t["dataset_name"].decode() for t in mixed.take(100).as_numpy_iterator()]
    frac_a = names.count("a") / len(names)
    assert 0.6 < frac_a < 0.95


def test_oxe_standardization_transforms():
    from mla_tpu.vla.rlds.oxe_transforms import (
        bridge_transform,
        get_standardization_transform,
        rt1_transform,
        taco_play_transform,
    )

    act = tf.constant(
        np.concatenate([np.zeros((5, 6), np.float32),
                        np.array([[1.0], [0.98], [0.5], [0.02], [0.01]], np.float32)], axis=1)
    )
    out = bridge_transform({"action": act})["action"].numpy()
    np.testing.assert_allclose(out[:, 6], [1, 1, 0, 0, 0])

    rel = tf.constant(
        np.concatenate([np.zeros((5, 6), np.float32),
                        np.array([[0.0], [1.0], [0.0], [-1.0], [0.0]], np.float32)], axis=1)
    )
    out = rt1_transform({"action": rel})["action"].numpy()
    np.testing.assert_allclose(out[:, 6], [1, 0, 0, 1, 1])

    pm = tf.constant(
        np.concatenate([np.zeros((2, 6), np.float32), np.array([[-1.0], [1.0]], np.float32)], axis=1)
    )
    out = taco_play_transform({"action": pm})["action"].numpy()
    np.testing.assert_allclose(out[:, 6], [0, 1])

    assert get_standardization_transform("unknown_dataset")({"action": act})["action"] is act


def test_oxe_configs_registered():
    from mla_tpu.vla.rlds.dataset import OXE_DATASET_CONFIGS, OXE_NAMED_MIXTURES

    assert "bridge_orig" in OXE_DATASET_CONFIGS
    assert "oxe_magic_soup" in OXE_NAMED_MIXTURES
    for name, _w in OXE_NAMED_MIXTURES["oxe_magic_soup"]:
        assert name in OXE_DATASET_CONFIGS, name


def test_oxe_full_matrix_consistency():
    """Full OXE matrix: every mixture member has a dataset config, every
    config has a standardization transform, configs are well-formed
    (reference oxe/configs.py x oxe/transforms.py x oxe/mixtures.py)."""
    from mla_tpu.vla.rlds.dataset import OXE_DATASET_CONFIGS, OXE_NAMED_MIXTURES
    from mla_tpu.vla.rlds.oxe_transforms import OXE_STANDARDIZATION_TRANSFORMS

    assert len(OXE_DATASET_CONFIGS) >= 70
    for mix, members in OXE_NAMED_MIXTURES.items():
        for name, w in members:
            assert name in OXE_DATASET_CONFIGS, f"{mix}: {name}"
            assert w > 0
    for name, cfg in OXE_DATASET_CONFIGS.items():
        assert name in OXE_STANDARDIZATION_TRANSFORMS, name
        assert "image_obs_keys" in cfg and "proprio_obs_key" in cfg
        assert None not in cfg["image_obs_keys"].values(), name
    # the reference's headline mixtures are present weight-for-weight
    plus = dict(OXE_NAMED_MIXTURES["oxe_magic_soup_plus"])
    assert plus["fractal20220817_data"] == 0.54087122203
    assert plus["droid"] == 0.06 and plus["bc_z"] == 0.2
    minus = dict(OXE_NAMED_MIXTURES["oxe_magic_soup_plus_minus"])
    assert minus["fractal20220817_data"] == 1.0 and "droid" not in minus


def test_invert_transform_convention():
    import tensorflow as tf

    from mla_tpu.vla.rlds.oxe_transforms import invert_transform

    act = tf.constant([[0, 0, 0, 0, 0, 0, 1.0], [0, 0, 0, 0, 0, 0, 0.0]])
    out = invert_transform({"action": act})["action"].numpy()
    assert out[0, -1] == 0.0 and out[1, -1] == 1.0
