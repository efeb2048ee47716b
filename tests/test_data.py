"""Data pipeline tests: tf transforms, batch transform, collator, and a
2-step end-to-end train CLI smoke run on dummy data."""

import numpy as np
import pytest

from mla_tpu.vla.action_tokenizer import ActionTokenizer
from mla_tpu.vla.datasets import (
    PaddedCollatorForActionPrediction,
    RLDSBatchTransform,
    clip_preprocess,
)
from mla_tpu.vla.tokenizer import SimpleTokenizer

from tiny import tiny_config


# --------------------------------------------------------------------------- #
# tf-graph transforms
# --------------------------------------------------------------------------- #


def test_chunk_act_obs_semantics():
    tf = pytest.importorskip("tensorflow")
    from mla_tpu.vla.rlds import transforms as T

    T0 = 6
    traj = {
        "action": tf.constant(np.arange(T0 * 2, dtype=np.float32).reshape(T0, 2)),
        "observation": {"proprio": tf.constant(np.arange(T0, dtype=np.float32)[:, None])},
        "task": {},
    }
    stats = {"action": {"q01": [-1.0, -1.0], "q99": [1.0, 1.0]}}
    out = T.chunk_act_obs(dict(traj), window_size=1, future_action_window_size=2, dataset_statistics=stats)
    act = out["action"].numpy()  # [T, 3, 2]
    assert act.shape == (T0, 3, 2)
    # frame 0 holds actions [a0, a1, a2]
    np.testing.assert_allclose(act[0, :, 0], [0, 2, 4])
    # past-goal actions at the trajectory tail become the neutral action
    # (normalized zero under q01/q99 [-1,1] -> 0 - eps)
    np.testing.assert_allclose(act[-1, 1:], np.full((2, 2), -1e-8), atol=1e-6)
    assert out["observation"]["pad_mask"].numpy().all()

    # window_size > 1: PRE-START chunk slots also get the neutral action
    # (reference traj_transforms.py:85-87), not a repeat of action[0]
    out2 = T.chunk_act_obs(
        {"action": tf.constant(np.arange(T0 * 2, dtype=np.float32).reshape(T0, 2)),
         "observation": {"proprio": tf.constant(np.arange(T0, dtype=np.float32)[:, None])},
         "task": {}},
        window_size=3, future_action_window_size=1, dataset_statistics=stats,
    )
    act2 = out2["action"].numpy()  # [T, 4, 2]: chunk indices [-2,-1,0,1]
    np.testing.assert_allclose(act2[0, :2], np.full((2, 2), -1e-8), atol=1e-6)
    np.testing.assert_allclose(act2[0, 2, 0], 0.0)  # the real a0 stays
    assert not out2["observation"]["pad_mask"].numpy()[0].all()


def test_collator_rejects_overlong_prompt():
    from mla_tpu.vla.datasets import PaddedCollatorForActionPrediction

    col = PaddedCollatorForActionPrediction(max_prompt_len=8)
    inst = {
        "input_ids": np.arange(1, 12, dtype=np.int32),  # 11 > 8
        "labels": np.arange(1, 12, dtype=np.int32),
        "images": {}, "actions": np.zeros((16, 7), np.float32),
        "proprio": np.zeros((1, 7), np.float32),
    }
    with pytest.raises(ValueError, match="exceeds"):
        col([inst])


def test_binarize_gripper():
    tf = pytest.importorskip("tensorflow")
    from mla_tpu.vla.rlds import transforms as T

    a = tf.constant([1.0, 0.98, 0.5, 0.02, 0.01, 0.5, 0.99], tf.float32)
    out = T.binarize_gripper_actions(a).numpy()
    np.testing.assert_allclose(out, [1, 1, 0, 0, 0, 1, 1])


def test_rel2abs_gripper():
    tf = pytest.importorskip("tensorflow")
    from mla_tpu.vla.rlds import transforms as T

    # +1 = closing, -1 = opening -> absolute 0 closed / 1 open
    a = tf.constant([0.0, 1.0, 0.0, -1.0, 0.0], tf.float32)
    out = T.rel2abs_gripper_actions(a).numpy()
    np.testing.assert_allclose(out, [1, 0, 0, 1, 1])


def test_normalize_q99():
    tf = pytest.importorskip("tensorflow")
    from mla_tpu.vla.rlds import transforms as T

    traj = {
        "action": tf.constant([[0.0, 5.0], [10.0, 10.0]], tf.float32),
        "observation": {"proprio": tf.constant([[0.0], [5.0]], tf.float32)},
    }
    meta = {
        "action": {"q01": [0.0, 0.0], "q99": [10.0, 10.0], "min": [0.0, 0.0], "max": [10.0, 10.0]},
        "proprio": {"q01": [0.0], "q99": [10.0], "min": [0.0], "max": [10.0]},
    }
    out = T.normalize_action_and_proprio(traj, meta, T.NormalizationType.BOUNDS_Q99)
    np.testing.assert_allclose(out["action"].numpy(), [[-1, 0], [1, 1]], atol=1e-6)


def test_compute_dataset_statistics():
    from mla_tpu.vla.rlds import transforms as T

    rng = np.random.default_rng(0)
    acts = rng.normal(size=(1000, 7))
    stats = T.compute_dataset_statistics(acts, acts)
    assert len(stats["action"]["q01"]) == 7
    assert stats["num_transitions"] == 1000
    assert stats["action"]["q01"][0] < stats["action"]["q99"][0]


# --------------------------------------------------------------------------- #
# batch transform + collator
# --------------------------------------------------------------------------- #


def _fake_frame(cfg, with_actions=True):
    rng = np.random.default_rng(0)
    T_o = 1
    return {
        "observation": {
            "image_primary": rng.integers(0, 255, (T_o, 100, 120, 3), dtype=np.uint8),
            "proprio": rng.normal(size=(T_o, 7)).astype(np.float32),
            "point_cloud": rng.normal(size=(T_o, cfg.point.input_points + 13, 3)).astype(np.float32),
        },
        "task": {"language_instruction": b"Close The Box"},
        "action": rng.uniform(-1, 1, size=(16, 7)).astype(np.float32),
        "dataset_name": "rlbench",
    }


def test_batch_transform_and_collator():
    cfg = tiny_config()
    tok = SimpleTokenizer()
    at = ActionTokenizer(tok, vocab_size=32000)
    xf = RLDSBatchTransform(
        action_tokenizer=at, base_tokenizer=tok, image_size=cfg.vision.image_size,
        use_pointcloud=True, num_points=cfg.point.input_points,
    )
    inst = xf(_fake_frame(cfg))
    assert inst["images"]["front_image"].shape == (4, cfg.vision.image_size, cfg.vision.image_size)
    assert inst["point_cloud"].shape == (cfg.point.input_points, 3)
    assert inst["input_ids"][0] == 1
    assert inst["input_ids"][-1] == 2  # EOS
    # label masking: only the last action_dim+1 positions supervised
    sup = (inst["labels"] != -100).sum()
    assert sup == 8
    # the last 8 ids: 7 action tokens + EOS; action tokens in the top-256 band
    assert (inst["input_ids"][-8:-1] >= 31744).all()
    # prompt contains BOD/EOD markers
    assert 32001 in inst["input_ids"] and 32002 in inst["input_ids"]

    coll = PaddedCollatorForActionPrediction(max_prompt_len=192, training=True)
    batch = coll([inst, inst])
    assert batch["input_ids"].shape == (2, 192)
    assert batch["actions"].shape == (2, 16, 7)
    assert batch["proprio"].shape == (2, 1, 7)
    # splice at the last EOS
    n = len(inst["input_ids"])
    assert batch["splice_idx"][0] == n - 1
    assert batch["attention_mask"][0, : n].all() and not batch["attention_mask"][0, n:].any()


def test_clip_preprocess_range():
    img = np.full((50, 80, 3), 128, np.uint8)
    out = clip_preprocess(img, 32)
    assert out.shape == (3, 32, 32)
    # 128/255 normalized by CLIP stats: channel 0 ~ (0.502-0.481)/0.269
    assert abs(out[0, 16, 16] - (128 / 255 - 0.48145466) / 0.26862954) < 1e-5


def test_action_token_roundtrip_through_prompt():
    """Action -> glyph string -> tokenizer -> ids -> ActionTokenizer decode
    must recover the action within bin width (the AR supervision path)."""
    tok = SimpleTokenizer()
    at = ActionTokenizer(tok, vocab_size=32000)
    a = np.array([-0.9, -0.3, 0.0, 0.2, 0.5, 0.77, 1.0])
    text = at(a)
    ids = tok(text, add_special_tokens=False)["input_ids"]
    back = at.decode_token_ids_to_actions(np.asarray(ids))
    assert np.abs(back - a).max() <= 2.0 / 255


# --------------------------------------------------------------------------- #
# end-to-end CLI smoke (dummy data, 8 virtual devices)
# --------------------------------------------------------------------------- #


def test_train_cli_smoke(tmp_path):
    import sys

    sys.path.insert(0, "scripts")
    import importlib

    train_mod = importlib.import_module("train")
    train_mod.main([
        "--vla.type", "mla-tiny-debug",
        "--max_steps", "2",
        "--save_interval", "2",
        "--per_device_batch_size", "1",
        "--global_batch_size", "8",
        "--run_root_dir", str(tmp_path),
        "--use_contrastive", "false",
        "--async_checkpoints", "true",
    ])
    runs = list(tmp_path.iterdir())
    assert len(runs) == 1
    assert (runs[0] / "config.json").exists()
    assert (runs[0] / "dataset_statistics.json").exists()
    ckpts = list((runs[0] / "checkpoints").glob("step-*"))
    assert ckpts, "checkpoint should be saved at step cadence"
    jsonl = list(runs[0].glob("*.jsonl"))
    assert jsonl


def test_train_cli_resume(tmp_path):
    """Kill-and-resume contract: a second invocation with --is_resume picks up
    from the latest checkpoint's step counter and trains on to max_steps
    (reference scripts/train.py:214-222 resume branch)."""
    import sys

    sys.path.insert(0, "scripts")
    import importlib

    train_mod = importlib.import_module("train")
    common = [
        "--vla.type", "mla-tiny-debug",
        "--run_id", "resume-e2e",
        "--save_interval", "2",
        "--per_device_batch_size", "1",
        "--global_batch_size", "8",
        "--run_root_dir", str(tmp_path),
        "--use_contrastive", "false",
    ]
    train_mod.main(common + ["--max_steps", "2"])
    run_dir = tmp_path / "resume-e2e"
    first = {d.name for d in (run_dir / "checkpoints").glob("step-*") if d.is_dir()}
    assert any(n.startswith("step-000002") for n in first)

    train_mod.main(common + ["--max_steps", "4", "--is_resume", "true"])
    after = {d.name for d in (run_dir / "checkpoints").glob("step-*") if d.is_dir()}
    assert any(n.startswith("step-000004") for n in after), after
    # the resumed run continued from step 2, not from scratch: the step-2
    # checkpoint from the first run is untouched (same name, no duplicate)
    assert first <= after
