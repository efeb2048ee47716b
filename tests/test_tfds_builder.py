"""The on-disk TFDS builder edge (VERDICT r2 #3): real tfrecord shards in a
TFDS-layout directory -> builder -> episode->trajectory flattening ->
restructure -> stats -> normalize -> chunk -> interleave -> frame transforms
-> batch transform -> collator -> one train step, with ZERO synthetic-graph
injection.

Parity target: reference vla/datasets/rlds/dataset.py:39-135 (the
`tfds.builder(...)`-driven head of `make_dataset_from_rlds`). This host has
no `tensorflow_datasets` package; the pipeline reads TFDS-layout
directories through `mla_tpu.vla.rlds.tfds_compat` (same `builder()`
surface, same on-disk format), which these tests also exercise directly.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from mla_tpu.vla.rlds import tfds_compat
from mla_tpu.vla.rlds.dataset import make_dataset_from_rlds, make_interleaved_dataset

REPO = Path(__file__).resolve().parent.parent


# --------------------------------------------------------------------------- #
# fixtures: tiny on-disk datasets in the raw builder schemas
# --------------------------------------------------------------------------- #


def _png(rng, h=24, w=24):
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    return tf.io.encode_png(img).numpy()


def write_rlbench_fixture(data_dir, n_episodes=3, lens=(10, 12, 8), num_shards=2):
    """rlbench raw schema: front_image (encoded), point_cloud, proprio
    (7-dim, action-shaped), 7-DoF action, per-step language_instruction."""
    rng = np.random.default_rng(0)
    episodes = []
    for e in range(n_episodes):
        T_len = lens[e % len(lens)]
        episodes.append({
            "steps": {
                "observation": {
                    "front_image": np.asarray([_png(rng) for _ in range(T_len)], object),
                    "point_cloud": rng.normal(size=(T_len, 48, 3)).astype(np.float32),
                    "proprio": rng.normal(size=(T_len, 7)).astype(np.float32),
                },
                "action": rng.uniform(-1, 1, (T_len, 7)).astype(np.float32),
                "language_instruction": np.asarray([b"close the jar"] * T_len, object),
                "is_first": (np.arange(T_len) == 0),
                "is_last": (np.arange(T_len) == T_len - 1),
            },
            "episode_id": e,
        })
    tfds_compat.write_rlds_dataset(data_dir, "rlbench", episodes, num_shards=num_shards)
    return episodes


def write_franka_fixture(data_dir, n_episodes=2, T_len=6):
    """franka raw schema adds wrist camera + tactile arrays (the MLA
    touch suite; reference franka_transform_next)."""
    rng = np.random.default_rng(1)
    episodes = []
    for e in range(n_episodes):
        episodes.append({
            "steps": {
                "observation": {
                    "image_third": np.asarray([_png(rng) for _ in range(T_len)], object),
                    "image_wrist": np.asarray([_png(rng) for _ in range(T_len)], object),
                    "point_cloud": rng.normal(size=(T_len, 32, 3)).astype(np.float32),
                    "proprio": rng.normal(size=(T_len, 7)).astype(np.float32),
                    "gripper_xyz": rng.normal(size=(T_len, 3)).astype(np.float32),
                    "tactile_right": rng.uniform(0, 200, (T_len, 16)).astype(np.float32),
                    "tactile_left": rng.uniform(0, 200, (T_len, 16)).astype(np.float32),
                },
                "action": rng.uniform(-1, 1, (T_len, 7)).astype(np.float32),
                "language_instruction": np.asarray([b"wipe the table"] * T_len, object),
            },
        })
    tfds_compat.write_rlds_dataset(data_dir, "franka", episodes)
    return episodes


# --------------------------------------------------------------------------- #
# builder surface
# --------------------------------------------------------------------------- #


def test_builder_roundtrip_and_splits(tmp_path):
    eps = write_rlbench_fixture(tmp_path, num_shards=2)
    b = tfds_compat.builder("rlbench", tmp_path)
    assert b.info.splits["train"].num_examples == 3
    assert sum(b.info.splits["train"].shard_lengths) == 3

    got = list(b.as_dataset(split="train"))
    assert len(got) == 3
    # steps come back as a nested per-step tf.data.Dataset (TFDS convention)
    steps = list(got[0]["steps"])
    written = eps[0]["steps"]
    assert len(steps) == written["action"].shape[0]
    np.testing.assert_allclose(
        np.stack([s["action"].numpy() for s in steps]), written["action"], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.stack([s["observation"]["point_cloud"].numpy() for s in steps]),
        written["observation"]["point_cloud"], rtol=1e-6,
    )
    # images round-trip as the exact encoded bytes (SkipDecoding semantics)
    assert steps[0]["observation"]["front_image"].numpy() == written["observation"]["front_image"][0]
    assert steps[2]["language_instruction"].numpy() == b"close the jar"
    assert got[0]["episode_metadata"]["episode_id"].numpy() == 0

    # percent-split grammar used by make_dataset_from_rlds (dataset.py:226-231)
    assert len(list(b.as_dataset(split="train[:95%]"))) == 2
    assert len(list(b.as_dataset(split="train[95%:]"))) == 1
    with pytest.raises(ValueError):
        b.as_dataset(split="test")


def test_builder_missing_dataset_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        tfds_compat.builder("nope", tmp_path)


# --------------------------------------------------------------------------- #
# make_dataset_from_rlds head: builder -> flatten -> restructure -> normalize
# --------------------------------------------------------------------------- #


def test_make_dataset_from_rlds_on_disk(tmp_path):
    eps = write_rlbench_fixture(tmp_path)
    ds, stats = make_dataset_from_rlds(
        "rlbench", str(tmp_path), train=True, shuffle=False,
        load_pointcloud=True, stats_cache_dir=str(tmp_path / "cache"),
    )
    assert int(stats["num_trajectories"]) == 3
    assert int(stats["num_transitions"]) == 10 + 12 + 8
    assert stats["action"]["q99"].shape == (7,)

    trajs = list(ds.as_numpy_iterator())
    # load_all_data_for_training + train -> split="train" (all episodes)
    assert len(trajs) == 3
    t0 = trajs[0]
    T_len = eps[0]["steps"]["action"].shape[0]
    obs = t0["observation"]
    # episode -> trajectory flattening preserved per-step alignment
    assert obs["image_primary"].shape == (T_len,)  # still-encoded bytes
    assert obs["image_primary"][0] == eps[0]["steps"]["observation"]["front_image"][0]
    # next-frame synthesis from the standardization transform: shift by one,
    # last repeats
    assert obs["image_next_primary"][0] == eps[0]["steps"]["observation"]["front_image"][1]
    assert obs["image_next_primary"][-1] == eps[0]["steps"]["observation"]["front_image"][-1]
    np.testing.assert_allclose(
        obs["point_cloud"], eps[0]["steps"]["observation"]["point_cloud"], rtol=1e-6
    )
    np.testing.assert_allclose(
        obs["next_point_cloud"][:-1], eps[0]["steps"]["observation"]["point_cloud"][1:],
        rtol=1e-6,
    )
    # actions came back BOUNDS_Q99-normalized; invert with the stats
    lo, hi = stats["action"]["q01"], stats["action"]["q99"]
    denorm = (t0["action"] + 1) / 2 * (hi - lo) + lo
    raw = np.asarray(eps[0]["steps"]["action"])
    clipped = np.clip(raw, lo, hi)
    np.testing.assert_allclose(denorm, clipped, atol=1e-5)
    assert t0["dataset_name"][0] == b"rlbench"

    # statistics were cached on disk; a second build reuses them
    assert any((tmp_path / "cache").iterdir())
    _, stats2 = make_dataset_from_rlds(
        "rlbench", str(tmp_path), train=True, shuffle=False,
        load_pointcloud=True, stats_cache_dir=str(tmp_path / "cache"),
    )
    np.testing.assert_allclose(stats2["action"]["q99"], stats["action"]["q99"])


def test_franka_tactile_on_disk(tmp_path):
    write_franka_fixture(tmp_path)
    ds, _ = make_dataset_from_rlds(
        "franka", str(tmp_path), train=True, shuffle=False,
        load_pointcloud=True, load_tactile=True,
        stats_cache_dir=str(tmp_path / "cache"),
    )
    t0 = next(iter(ds.as_numpy_iterator()))
    obs = t0["observation"]
    for k in ("tactile_right", "tactile_left", "next_tactile_right",
              "next_tactile_left", "gripper_xyz"):
        assert k in obs, k
    # next_tactile_left is the shift of tactile_LEFT (the reference copies
    # tactile_right here — its :188 copy-bug, fixed in this rebuild)
    np.testing.assert_allclose(obs["next_tactile_left"][:-1], obs["tactile_left"][1:], rtol=1e-6)
    assert obs["image_wrist_right"].dtype.kind in ("S", "O")  # still-encoded bytes


# --------------------------------------------------------------------------- #
# full frame pipeline off disk: interleave -> decode/resize -> frames
# --------------------------------------------------------------------------- #


def test_interleaved_frames_off_disk(tmp_path):
    write_rlbench_fixture(tmp_path)
    ds, dataset_len, all_stats = make_interleaved_dataset(
        "rlbench", str(tmp_path), train=True, shuffle_buffer_size=16,
        load_pointcloud=True, image_size=32,
        stats_cache_dir=str(tmp_path / "cache"),
    )
    assert dataset_len == 30
    frames = list(ds.take(5).as_numpy_iterator())
    f = frames[0]
    # frame transforms decoded + resized the stored PNG bytes
    assert f["observation"]["image_primary"].shape == (1, 32, 32, 3)
    assert f["observation"]["image_primary"].dtype == np.uint8
    assert f["observation"]["image_next_primary"].shape == (1, 32, 32, 3)
    # window=1, future=15 chunking
    assert f["action"].shape == (16, 7)
    assert f["observation"]["point_cloud"].shape == (1, 48, 3)
    assert f["task"]["language_instruction"] == b"close the jar"


# --------------------------------------------------------------------------- #
# the whole production stack: train CLI against the on-disk data root
# --------------------------------------------------------------------------- #


def test_train_cli_on_disk_data_root(tmp_path):
    """scripts/train.py --data_root_dir <tfds dir>: builder -> pipeline ->
    RLDSBatchTransform -> collator -> one real train step."""
    write_rlbench_fixture(tmp_path / "data")
    run_root = tmp_path / "runs"
    cmd = [
        sys.executable, "scripts/train.py",
        "--vla.type", "mla-tiny-debug",
        "--data_root_dir", str(tmp_path / "data"),
        "--data_mix", "rlbench",
        "--shuffle_buffer_size", "16",
        "--max_steps", "1", "--save_interval", "1",
        "--per_device_batch_size", "1", "--global_batch_size", "2",
        "--use_contrastive", "false",
        "--run_root_dir", str(run_root), "--run_id", "ondisk",
    ]
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-4000:]
    ckpts = list((run_root / "ondisk" / "checkpoints").glob("step-*"))
    assert ckpts, proc.stderr[-2000:]


def test_rlds_dataset_classes_off_disk(tmp_path):
    """The two user-facing dataset classes run against the on-disk root:
    RLDSDataset (interleaved frame stream) and EpisodicRLDSDataset (whole
    chunked trajectories; reference EpisodicRLDSDataset)."""
    from mla_tpu.vla.rlds.dataset import EpisodicRLDSDataset, RLDSDataset

    write_rlbench_fixture(tmp_path)

    ds = RLDSDataset(str(tmp_path), "rlbench", train=True, shuffle_buffer_size=16,
                     load_pointcloud=True, image_size=32)
    assert len(ds) == 30
    assert "rlbench" in ds.dataset_statistics
    it = iter(ds)
    f = next(it)
    assert f["observation"]["image_primary"].shape == (1, 32, 32, 3)
    assert f["action"].shape == (16, 7)

    eds = EpisodicRLDSDataset(str(tmp_path), "rlbench", train=False,
                              load_pointcloud=True, image_size=32)
    trajs = list(iter(eds))
    # val split = train[95%:] -> 1 of the 3 episodes
    assert len(trajs) == 1
    t = trajs[0]
    T_len = t["action"].shape[0]
    assert t["action"].shape == (T_len, 16, 7)  # per-step chunked windows
    assert t["observation"]["image_primary"].shape[0] == T_len


def test_percent_splits_partition_even_with_file_shuffling(tmp_path):
    """train[:95%] and train[95%:] must partition the episode set exactly —
    even when the training read requests shuffle_files=True (percent
    sub-splits resolve on the canonical sorted order, like real tfds;
    shuffling files first would leak episodes across the split boundary)."""
    write_rlbench_fixture(tmp_path, n_episodes=6, lens=(4, 5, 6), num_shards=3)
    b = tfds_compat.builder("rlbench", tmp_path)

    def episode_keys(split, shuffle):
        out = []
        for ep in b.as_dataset(split=split, shuffle_files=shuffle):
            steps = list(ep["steps"])
            out.append(tuple(np.asarray(steps[0]["action"]).round(5).tolist()))
        return out

    train = episode_keys("train[:95%]", True)
    val = episode_keys("train[95%:]", False)
    everything = episode_keys("train", False)
    assert len(train) == 5 and len(val) == 1
    assert set(train) | set(val) == set(everything)
    assert not (set(train) & set(val))


def test_shuffle_files_reorders_between_calls(tmp_path):
    """shuffle_files must actually vary the file-level read order across
    calls (real tfds shuffles nondeterministically) — including on percent
    sub-splits — while never changing the episode SET. A fixed or dropped
    shuffle would feed the same correlated episode order every epoch."""
    write_rlbench_fixture(tmp_path, n_episodes=12, lens=(4,), num_shards=6)
    b = tfds_compat.builder("rlbench", tmp_path)

    def order(split, shuffle):
        out = []
        for ep in b.as_dataset(split=split, shuffle_files=shuffle):
            steps = list(ep["steps"])
            out.append(tuple(np.asarray(steps[0]["action"]).round(5).tolist()))
        return out

    canonical = order("train", False)
    draws = [tuple(order("train", True)) for _ in range(6)]
    assert all(set(d) == set(canonical) for d in draws)
    # 6 shards -> 720 possible orders; 6 draws all identical is ~1e-17
    assert len(set(draws)) > 1, "full-split file shuffle is a no-op"

    sub_canonical = order("train[:50%]", False)
    sub_draws = [tuple(order("train[:50%]", True)) for _ in range(6)]
    assert all(set(d) == set(sub_canonical) for d in sub_draws)
    assert len(set(sub_draws)) > 1, "sub-split file shuffle is a no-op"
