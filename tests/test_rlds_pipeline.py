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


def test_oxe_full_matrix_consistency():
    """Full OXE matrix: every mixture member has a dataset config, every
    config has a standardization transform, configs are well-formed
    (reference oxe/configs.py x oxe/transforms.py x oxe/mixtures.py).
    Detailed value-for-value parity vs the reference files lives in
    tests/test_oxe_standardization.py."""
    from mla_tpu.vla.rlds.dataset import OXE_DATASET_CONFIGS, OXE_NAMED_MIXTURES
    from mla_tpu.vla.rlds.oxe_transforms import OXE_STANDARDIZATION_TRANSFORMS

    assert len(OXE_DATASET_CONFIGS) >= 72
    for mix, members in OXE_NAMED_MIXTURES.items():
        for name, w in members:
            assert name in OXE_DATASET_CONFIGS, f"{mix}: {name}"
            assert w > 0
    for name, cfg in OXE_DATASET_CONFIGS.items():
        assert name in OXE_STANDARDIZATION_TRANSFORMS, name
        assert "image_obs_keys" in cfg and "state_obs_keys" in cfg
    # the reference's headline mixtures are present weight-for-weight
    plus = dict(OXE_NAMED_MIXTURES["oxe_magic_soup_plus"])
    assert plus["fractal20220817_data"] == 0.54087122203
    assert plus["droid"] == 0.06 and plus["bc_z"] == 0.2
    assert plus["language_table"] == 0.1
    minus = dict(OXE_NAMED_MIXTURES["oxe_magic_soup_plus_minus"])
    assert minus["fractal20220817_data"] == 1.0 and "droid" not in minus
    assert "language_table" not in minus
    # rtx_franka keeps the reference's duplicate entries
    rtx_franka = OXE_NAMED_MIXTURES["rtx_franka"]
    assert [w for n, w in rtx_franka if n == "taco_play"] == [2.0, 1.0]


def test_gripper_convention_helpers():
    from mla_tpu.vla.rlds.transforms import (
        binarize_gripper_actions,
        invert_gripper_actions,
        rel2abs_gripper_actions,
    )

    cont = tf.constant([1.0, 0.98, 0.5, 0.02, 0.01])
    np.testing.assert_allclose(binarize_gripper_actions(cont).numpy(), [1, 1, 0, 0, 0])

    rel = tf.constant([0.0, 1.0, 0.0, -1.0, 0.0])
    np.testing.assert_allclose(rel2abs_gripper_actions(rel).numpy(), [1, 0, 0, 1, 1])

    np.testing.assert_allclose(
        invert_gripper_actions(tf.constant([1.0, 0.0])).numpy(), [0.0, 1.0]
    )


def test_full_pass_statistics_and_cache(tmp_path):
    """Full-pass stats match a brute-force pass and are cache-hit on re-run
    (reference data_utils.get_dataset_statistics, :185-273)."""
    from mla_tpu.vla.rlds.transforms import get_dataset_statistics

    rng = np.random.default_rng(3)
    trajs = [
        {"action": rng.normal(size=(n, 7)).astype(np.float32),
         "observation": {"proprio": rng.normal(size=(n, 8)).astype(np.float32)}}
        for n in (5, 9, 13)
    ]

    def gen():
        yield from trajs

    sig = {"action": tf.TensorSpec((None, 7), tf.float32),
           "observation": {"proprio": tf.TensorSpec((None, 8), tf.float32)}}
    ds = tf.data.Dataset.from_generator(gen, output_signature=sig)

    stats = get_dataset_statistics(ds, tmp_path, hash_dependencies=("unit", "test"))
    all_acts = np.concatenate([t["action"] for t in trajs])
    np.testing.assert_allclose(stats["action"]["q01"], np.quantile(all_acts, 0.01, axis=0), rtol=1e-6)
    np.testing.assert_allclose(stats["action"]["q99"], np.quantile(all_acts, 0.99, axis=0), rtol=1e-6)
    np.testing.assert_allclose(stats["action"]["mean"], all_acts.mean(0), rtol=1e-5)
    assert stats["num_transitions"] == 27 and stats["num_trajectories"] == 3

    # cache hit: poison the dataset; cached stats must come back unchanged
    empty = tf.data.Dataset.from_generator(lambda: iter(()), output_signature=sig)
    again = get_dataset_statistics(empty, tmp_path, hash_dependencies=("unit", "test"))
    assert again["action"]["q99"] == stats["action"]["q99"]
    # different hash deps -> different cache entry (recompute happens)
    sampled = get_dataset_statistics(ds, tmp_path, hash_dependencies=("unit", "test"),
                                     sample_trajectories=1)
    assert sampled["num_transitions"] == 5


def test_balance_weights_math():
    from mla_tpu.vla.rlds.dataset import compute_sample_weights

    # balanced: weights scale with dataset size
    w, length = compute_sample_weights([1.0, 1.0], [1000, 9000], balance=True)
    np.testing.assert_allclose(w, [0.1, 0.9])
    assert length == 10000  # one epoch of each primary dataset in expectation
    # unbalanced: raw weights only
    w2, _ = compute_sample_weights([3.0, 1.0], [1000, 9000], balance=False)
    np.testing.assert_allclose(w2, [0.75, 0.25])
    # non-1.0 weights: fall back to all datasets for the epoch bound
    _, l3 = compute_sample_weights([2.0, 0.5], [100, 100], balance=False)
    assert l3 == 500


def test_allocate_threads():
    from mla_tpu.vla.rlds.transforms import allocate_threads

    alloc = allocate_threads(10, np.array([0.5, 0.3, 0.1, 0.05, 0.05]))
    assert alloc.sum() == 10 and (alloc >= 1).all()
    assert alloc[0] >= alloc[1] >= alloc[2]
    np.testing.assert_array_equal(allocate_threads(None, np.array([1.0, 1.0])), [-1, -1])


def test_goal_relabel_uniform_future_only():
    from mla_tpu.vla.rlds.transforms import add_pad_mask_dict, goal_relabel_uniform

    n = 12
    traj = {
        "observation": {"image_primary": tf.range(n), "timestep": tf.range(n)},
        "task": {"language_instruction": tf.constant([b"x"] * n)},
        "action": tf.zeros([n, 7]),
    }
    traj = add_pad_mask_dict(traj)
    tf.random.set_seed(0)
    out = goal_relabel_uniform(traj)
    goals = out["task"]["image_primary"].numpy()
    idx = np.arange(n)
    assert (goals >= np.minimum(idx + 1, n - 1)).all() and (goals <= n - 1).all()
    assert "timestep" in out["task"]


def test_delete_task_conditioning_drops_one_modality():
    from mla_tpu.vla.rlds.transforms import (
        add_pad_mask_dict,
        delete_task_conditioning,
        goal_relabel_uniform,
    )

    n = 64
    traj = {
        "observation": {"image_primary": tf.constant([b"img"] * n), "timestep": tf.range(n)},
        "task": {"language_instruction": tf.constant([b"do it"] * n)},
        "action": tf.zeros([n, 7]),
    }
    traj = add_pad_mask_dict(traj)
    traj = goal_relabel_uniform(traj)
    tf.random.set_seed(1)
    out = delete_task_conditioning(dict(traj), keep_image_prob=0.5)
    lang = out["task"]["language_instruction"].numpy()
    img = out["task"]["image_primary"].numpy()
    kept_lang = lang != b""
    kept_img = img != b""
    # exactly one modality survives per frame
    assert (kept_lang ^ kept_img).all()
    assert kept_lang.any() and kept_img.any()
    # pad masks follow the deletion
    np.testing.assert_array_equal(out["task"]["pad_mask_dict"]["language_instruction"].numpy(), kept_lang)
    # frames that dropped images move the goal timestep to the end
    ts = out["task"]["timestep"].numpy()
    assert (ts[~kept_img] == n - 1).all()


def test_augment_image_full_kwargs_deterministic():
    from mla_tpu.vla.rlds.dataset import DEFAULT_IMAGE_AUGMENT_KWARGS
    from mla_tpu.vla.rlds.transforms import augment_image

    img = tf.constant(np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8))
    a = augment_image(img, seed=[3, 4], **DEFAULT_IMAGE_AUGMENT_KWARGS).numpy()
    b = augment_image(img, seed=[3, 4], **DEFAULT_IMAGE_AUGMENT_KWARGS).numpy()
    c = augment_image(img, seed=[5, 6], **DEFAULT_IMAGE_AUGMENT_KWARGS).numpy()
    assert a.shape == (32, 32, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)  # same seed -> same augmentation
    assert (a != c).any()


def test_frame_transforms_pad_image_decodes_to_zeros():
    from mla_tpu.vla.rlds.transforms import decode_and_resize_image

    out = decode_and_resize_image(tf.constant("", tf.string), (16, 16)).numpy()
    assert out.shape == (16, 16, 3) and (out == 0).all()
