"""Prompt builders, DiT action model, CFG, and the dual-head policy path."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.diffusion import gaussian as gd
from mla_tpu.models import action_model as am
from mla_tpu.models import mla as mla_mod
from mla_tpu.models import prompting

from tiny import tiny_batch, tiny_config, tiny_model


def test_pure_prompt_builder_format():
    pb = prompting.get_prompt_builder("openvla")
    pb.add_turn("human", "What action should the robot take to close the box?")
    prompt = pb.get_prompt()
    assert prompt == "In: What action should the robot take to close the box?\nOut:"
    pb.add_turn("gpt", "<BOD><EOD>abc")
    assert pb.get_prompt().endswith("<BOD><EOD>abc</s>")


def test_chat_and_vicuna_builders():
    pb = prompting.get_prompt_builder("llama2-chat", system_prompt="sys")
    pb.add_turn("human", "hello")
    # reference training format: '<<SYS>' opening tag (single '>', the
    # typo preserved in its training data), no per-turn '<s>'
    assert pb.get_prompt() == "[INST] <<SYS>\nsys\n<</SYS>>\n\nhello [/INST]"
    pb.add_turn("gpt", "resp")
    pb.add_turn("human", "again")
    assert "</s>[INST] again [/INST]" in pb.get_prompt()
    assert "<s>" not in pb.get_prompt()
    # no system prompt -> the default prismatic system block, never empty
    pbd = prompting.get_prompt_builder("llama2-chat")
    pbd.add_turn("human", "hello")
    assert "<<SYS>\nYou are a helpful language and vision assistant." in pbd.get_prompt()
    pb2 = prompting.get_prompt_builder("vicuna-v15")
    pb2.add_turn("human", "hello")
    assert "USER: hello ASSISTANT:" in pb2.get_prompt()
    pb3 = prompting.get_prompt_builder("mistral-instruct")
    pb3.add_turn("human", "hi")
    assert pb3.get_prompt().startswith("[INST] hi [/INST]")
    # empty assistant turns become ' ' (reference wrap_gpt) — note the
    # resulting double space before </s> is the reference's exact string
    pb3.add_turn("gpt", "")
    assert pb3.get_prompt().endswith("[INST] hi [/INST]  </s>")
    # phi: explicit BOS on the FIRST human turn (CodeGen tokenizer inserts
    # none itself — reference phi_prompter.py 'IMPORTANT' note)
    pb4 = prompting.get_prompt_builder("phi-2")
    pb4.add_turn("human", "hi")
    assert pb4.get_prompt() == "<|endoftext|>Input: hi\nOutput:"


def test_dit_action_model_shapes_and_loss():
    cfg = am.dit_config("DiT-S", token_size=64, in_channels=7, future_action_window_size=15)
    params = am.dit_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 7))
    t = jnp.array([3, 50])
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 64))
    eps = am.dit_forward(params, cfg, x, t, z)
    assert eps.shape == (2, 16, 7)

    sched = gd.create_schedule("", diffusion_steps=100)
    loss = am.dit_loss(params, cfg, sched, x, z, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss)) and float(loss) > 0

    # CFG: doubled batch returns identical guided halves
    x2 = jnp.concatenate([x, x], 0)
    t2 = jnp.concatenate([t, t], 0)
    z2 = jnp.concatenate([z, jnp.zeros_like(z)], 0)
    out = am.dit_forward_with_cfg(params, cfg, x2, t2, z2, cfg_scale=2.0)
    np.testing.assert_allclose(np.asarray(out[:2]), np.asarray(out[2:]), atol=1e-6)


@pytest.fixture(scope="module")
def policy():
    cfg = tiny_config()
    params, state = tiny_model(cfg)
    stats = {
        "rlbench": {
            "action": {"q01": [-1.0] * 7, "q99": [1.0] * 7},
            "proprio": {"q01": [-1.0] * 7, "q99": [1.0] * 7},
        }
    }
    return mla_mod.MLAPolicy(params, state, cfg, tokenizer=None, norm_stats=stats, num_ddim_steps=2)


def _obs(cfg):
    rng = np.random.default_rng(0)
    img = np.concatenate(
        [rng.normal(size=(3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32),
         np.ones((1, cfg.vision.image_size, cfg.vision.image_size), np.float32)]
    )
    pc = rng.uniform(-0.3, 0.7, size=(cfg.point.input_points, 3)).astype(np.float32)
    return img, pc


def test_cfg_guided_diffusion_runs():
    cfg = tiny_config()
    params, state = tiny_model(cfg)
    # final_layer.fc2 is zero-init (so eps would be conditioning-independent);
    # randomize it so CFG guidance has an observable effect
    params["final_layer"]["mlp"]["fc2"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(42), params["final_layer"]["mlp"]["fc2"]["w"].shape) * 0.02
    )
    stats = {"rlbench": {"action": {"q01": [-1.0] * 7, "q99": [1.0] * 7},
                         "proprio": {"q01": [-1.0] * 7, "q99": [1.0] * 7}}}
    pol = mla_mod.MLAPolicy(params, state, cfg, norm_stats=stats, num_ddim_steps=2)
    img, pc = _obs(cfg)
    ids = np.array([[1, 500, 600, 700, 29871]], dtype=np.int32)
    act = pol.predict_action_diff(img, pc, "x", input_ids=ids, cfg_scale=1.5)
    assert act.shape == (cfg.action_horizon, cfg.action_dim)
    assert np.isfinite(act).all()
    # cfg path must differ from unguided (uncondition row changes the eps)
    act0 = pol.predict_action_diff(img, pc, "x", input_ids=ids, cfg_scale=0.0)
    assert np.abs(act - act0).max() > 1e-6


def test_predict_action_diff_ar(policy):
    from mla_tpu.vla.tokenizer import SimpleTokenizer

    policy.tokenizer = SimpleTokenizer()
    img, pc = _obs(policy.cfg)
    out = policy.predict_action_diff_ar(img, pc, "close the box", num_ddim_steps=2)
    assert out["actions"].shape == (policy.cfg.action_horizon, policy.cfg.action_dim)
    assert out["ar_actions"].shape == (policy.cfg.action_dim,)
    assert len(out["timings"]) == 2 and all(t > 0 for t in out["timings"])
    # AR confidences: one valid probability per decoded action token
    # (reference model_mla.py:901-907)
    probs = out["ar_max_probs"]
    assert len(probs) == policy.cfg.action_dim
    assert all(0.0 < p <= 1.0 for p in probs)


def test_predict_action_batch_with_dit(policy):
    cfg = policy.cfg
    dit_cfg = am.dit_config("DiT-S", token_size=cfg.token_size, in_channels=cfg.action_dim,
                            future_action_window_size=cfg.future_action_window_size)
    dit_params = am.dit_init(jax.random.PRNGKey(9), dit_cfg)
    img, pc = _obs(cfg)
    from mla_tpu.vla.tokenizer import SimpleTokenizer

    policy.tokenizer = SimpleTokenizer()
    acts = policy.predict_action_batch(
        [img, img], [pc, pc], ["close the box", "open the drawer"],
        action_model_params=dit_params, action_model_cfg=dit_cfg, cfg_scale=1.5,
        num_ddim_steps=2,
    )
    assert acts.shape == (2, cfg.action_horizon, cfg.action_dim)
    assert np.isfinite(acts).all()


def test_build_prompt_ids_surgery():
    from mla_tpu.vla.tokenizer import SimpleTokenizer

    tok = SimpleTokenizer()
    ids_ar = mla_mod.build_prompt_ids(tok, "Close the Box", mode="ar")[0]
    assert ids_ar[0] == 1 and ids_ar[-1] == 29871
    ids_diff = mla_mod.build_prompt_ids(tok, "Close the Box", mode="diff")[0]
    # append [29871, 32001, 32002, 29871] then strip 3 -> ends with one 29871
    assert ids_diff[-1] == 29871 and 32001 not in ids_diff.tolist()
    assert len(ids_diff) == len(ids_ar)


def test_predict_action_diff_batched(policy):
    img, pc = _obs(policy.cfg)
    imgs = np.repeat(img[None], 4, axis=0)
    pcs = np.repeat(pc[None], 4, axis=0)
    ids = np.array([[1, 500, 600, 700, 29871]], dtype=np.int32)
    acts = policy.predict_action_diff_batched(imgs, pcs, "x", input_ids=ids)
    assert acts.shape == (4, policy.cfg.action_horizon, policy.cfg.action_dim)
    assert np.isfinite(acts).all()
    # identical observations + shared noise seed path -> per-sample noise
    # differs only through the rng split; rows are valid action chunks
    assert set(np.unique(acts[:, :, 6])) <= {0.0, 1.0}


def test_eval_rlbench_offline_trace(tmp_path):
    """scripts/eval_rlbench.py --offline_trace e2e: tiny run dir + recorded
    npz trace -> predicted_actions.npz with one chunk per frame (the
    simulator-free half of the reference's test_rlbench.py harness)."""
    import importlib
    import json
    import sys

    from mla_tpu.conf.vla import get_vla_config
    from mla_tpu.training import checkpointing as ckpt
    from mla_tpu.training import optim, strategy

    cfg = tiny_config()
    params, mstate = tiny_model(cfg)
    tx, _, _ = optim.make_optimizer(params, num_training_steps=10)
    state = strategy.init_train_state(params, tx, mstate)
    run_dir = tmp_path / "run"
    stats = {"rlbench": {"action": {"q01": [-1.0] * 7, "q99": [1.0] * 7},
                         "proprio": {"q01": [-1.0] * 7, "q99": [1.0] * 7}}}
    ckpt.write_run_metadata(run_dir, get_vla_config("mla-tiny-debug"), cfg, stats)
    ckpt.save_checkpoint(run_dir, state, step=1, epoch=0, loss=0.5)

    rng = np.random.default_rng(0)
    trace = tmp_path / "trace.npz"
    np.savez(
        trace,
        images=rng.integers(0, 255, size=(2, 96, 128, 3), dtype=np.uint8),
        point_clouds=rng.uniform(-0.3, 0.7, size=(2, cfg.point.input_points, 3)).astype(np.float32),
        instruction="close the box",
    )

    sys.path.insert(0, "scripts")
    eval_mod = importlib.import_module("eval_rlbench")
    rc = eval_mod.main([
        "--run_dir", str(run_dir), "--model", "mla-tiny",
        "--offline_trace", str(trace), "--output_dir", str(tmp_path / "out"),
        "--unnorm_key", "rlbench",
    ])
    assert rc == 0
    blob = np.load(tmp_path / "out" / "predicted_actions.npz")
    assert blob["actions"].shape == (2, cfg.action_horizon, cfg.action_dim)
    assert np.isfinite(blob["actions"]).all()
    assert blob["latencies"].shape == (2,)
    # per-episode media dumps, reference test_rlbench.py:185-196 layout
    media = tmp_path / "out" / "offline"
    pngs = sorted(p.name for p in (media / "images" / "episode0").glob("*.png"))
    assert pngs == ["frame_0000.png", "frame_0001.png"]
    video = media / "videos" / "episode0_video_steps.mp4"
    assert video.exists() and video.stat().st_size > 0


def test_save_episode_media_prefers_env_recorder(tmp_path):
    """When the env is a lift3d VideoWrapper (save_video/save_images/
    save_depths), the eval loop must route dumps through it — the sim
    recorder captures every cinematic frame, not just policy steps."""
    import importlib
    import sys

    sys.path.insert(0, "scripts")
    eval_mod = importlib.import_module("eval_rlbench")

    calls = {}

    class FakeRecorderEnv:
        def save_video(self, path):
            calls["video"] = path
            Path(path).write_bytes(b"mp4")

        def save_images(self, d, quiet=False):
            calls["images"] = d

        def save_depths(self, d, quiet=False):
            calls["depths"] = d

    frames = [np.zeros((8, 8, 3), np.uint8)]
    eval_mod.save_episode_media(tmp_path, "close_box", 3, frames, [], env=FakeRecorderEnv())
    assert calls["video"].endswith("close_box/videos/episode3_video_steps.mp4")
    assert calls["images"].endswith("close_box/images/episode3")
    assert calls["depths"].endswith("close_box/depths/episode3")
    # env recorder used -> the loop-collected frames are NOT double-written
    assert not list((tmp_path / "close_box" / "images" / "episode3").glob("*.png"))


def test_eval_rlbench_offline_trace_dpm_and_voxel(tmp_path):
    """The new serving CLI paths through the offline harness: DPM-Solver
    sampling (--sampler dpm) and raw-cloud preprocessing (--voxel_cell on
    oversized clouds)."""
    import importlib
    import sys

    from mla_tpu.conf.vla import get_vla_config
    from mla_tpu.training import checkpointing as ckpt
    from mla_tpu.training import optim, strategy

    cfg = tiny_config()
    params, mstate = tiny_model(cfg)
    tx, _, _ = optim.make_optimizer(params, num_training_steps=10)
    state = strategy.init_train_state(params, tx, mstate)
    run_dir = tmp_path / "run"
    stats = {"rlbench": {"action": {"q01": [-1.0] * 7, "q99": [1.0] * 7},
                         "proprio": {"q01": [-1.0] * 7, "q99": [1.0] * 7}}}
    ckpt.write_run_metadata(run_dir, get_vla_config("mla-tiny-debug"), cfg, stats)
    ckpt.save_checkpoint(run_dir, state, step=1, epoch=0, loss=0.5)

    rng = np.random.default_rng(1)
    trace = tmp_path / "trace.npz"
    np.savez(
        trace,
        images=rng.integers(0, 255, size=(1, 96, 128, 3), dtype=np.uint8),
        # RAW oversized clouds: 3x the model's input_points
        point_clouds=rng.uniform(-0.3, 0.7, size=(1, 3 * cfg.point.input_points, 3)).astype(np.float32),
        instruction="close the box",
    )

    sys.path.insert(0, "scripts")
    eval_mod = importlib.import_module("eval_rlbench")
    rc = eval_mod.main([
        "--run_dir", str(run_dir), "--model", "mla-tiny",
        "--offline_trace", str(trace), "--output_dir", str(tmp_path / "out"),
        "--unnorm_key", "rlbench", "--sampler", "dpm", "--num_dpm_steps", "3",
        "--voxel_cell", "0.02",
    ])
    assert rc == 0
    blob = np.load(tmp_path / "out" / "predicted_actions.npz")
    assert blob["actions"].shape == (1, cfg.action_horizon, cfg.action_dim)
    assert np.isfinite(blob["actions"]).all()


def test_eval_rlbench_sim_loop_with_fake_env(tmp_path):
    """Drive run_simulator_eval end-to-end with a stub RLBenchEnv (the real
    one is an external CoppeliaSim dependency, as in the reference): closed
    loop over both predict modes' episode accounting, the dual-head
    telemetry lines, media dumps, success-rate artifacts, and env teardown."""
    import importlib
    import json
    import sys
    import types

    from mla_tpu.conf.vla import get_vla_config
    from mla_tpu.training import checkpointing as ckpt
    from mla_tpu.training import optim, strategy

    cfg = tiny_config()
    params, mstate = tiny_model(cfg)
    tx, _, _ = optim.make_optimizer(params, num_training_steps=10)
    state = strategy.init_train_state(params, tx, mstate)
    run_dir = tmp_path / "run"
    stats = {"rlbench": {"action": {"q01": [-1.0] * 7, "q99": [1.0] * 7},
                         "proprio": {"q01": [-1.0] * 7, "q99": [1.0] * 7}}}
    ckpt.write_run_metadata(run_dir, get_vla_config("mla-tiny-debug"), cfg, stats)
    ckpt.save_checkpoint(run_dir, state, step=1, epoch=0, loss=0.5)

    rng = np.random.default_rng(3)
    obs = {
        "image": rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8),
        "point_cloud": rng.uniform(-0.3, 0.7, size=(cfg.point.input_points, 3)).astype(np.float32),
        "instruction": "close the box",
        "robot_state": np.zeros(7, np.float32),
    }
    teardowns = []

    class FakeEnv:
        def __init__(self, task_name, camera_name):
            self.task, self.t = task_name, 0

        def reset(self):
            self.t = 0
            return dict(obs)

        def step(self, action):
            assert np.asarray(action).shape == (cfg.action_dim,)
            self.t += 1
            done = self.t >= 2
            return dict(obs), float(done), done, {"success": True}

        def shutdown(self):
            teardowns.append(self.task)

    pkg = types.ModuleType("lift3d")
    envs = types.ModuleType("lift3d.envs")
    mod = types.ModuleType("lift3d.envs.rlbench_env")
    mod.RLBenchEnv = FakeEnv
    sys.modules.update(
        {"lift3d": pkg, "lift3d.envs": envs, "lift3d.envs.rlbench_env": mod}
    )
    try:
        sys.path.insert(0, "scripts")
        eval_mod = importlib.import_module("eval_rlbench")
        out = tmp_path / "out"
        rc = eval_mod.main([
            "--run_dir", str(run_dir), "--model", "mla-tiny",
            "--tasks", "close_box", "--num_episodes", "1", "--max_steps", "3",
            "--unnorm_key", "rlbench", "--predict_mode", "diff_ar",
            "--output_dir", str(out),
        ])
    finally:
        for name in ("lift3d", "lift3d.envs", "lift3d.envs.rlbench_env"):
            sys.modules.pop(name, None)
    assert rc == 0
    assert teardowns == ["close_box"]
    assert json.loads((out / "results.json").read_text()) == {"close_box": 1.0}
    assert (out / "close_box_success_rate.txt").read_text().strip() == "1.0000"
    log = (out / "eval.log").read_text()
    assert "average ar infer time" in log and "average diff infer time" in log
    # per-episode media in the reference layout
    frames = list((out / "close_box" / "images" / "episode0").glob("*.png"))
    assert len(frames) == 2
    assert (out / "close_box" / "videos" / "episode0_video_steps.mp4").exists()


def test_compiler_options_env_hook_and_cache_signature(policy, monkeypatch):
    """MLA_XLA_OPTIONS contract (docs/kernels.md 'XLA scheduling-option
    sweep'): lazy env resolution at construction, library default None
    (conftest pins the var empty for the whole suite), and the option set
    entering every _jit_cache signature so flipping the attribute on a
    warmed policy recompiles instead of serving a stale graph."""
    # suite-wide default: stock scheduler
    assert mla_mod.serving_compiler_options_from_env() is None
    assert policy.compiler_options is None

    monkeypatch.setenv("MLA_XLA_OPTIONS", '{"xla_tpu_enable_latency_hiding_scheduler": "true"}')
    assert mla_mod.serving_compiler_options_from_env() == {
        "xla_tpu_enable_latency_hiding_scheduler": "true"
    }
    # already-constructed policies are not retroactively flipped
    assert policy.compiler_options is None

    # the sig must differ per option set (and be hashable/cacheable)
    base_sig = policy._opts_sig()
    policy.compiler_options = {"xla_tpu_enable_latency_hiding_scheduler": "true"}
    try:
        assert policy._opts_sig() != base_sig
        assert hash(policy._opts_sig()) is not None
        ids = np.asarray([[1, 5, 7, 29871]], dtype=np.int32)
        before = set(policy._jit_cache)
        # building the graph object under the new options must create a NEW
        # cache entry, not reuse a stock-scheduler one (CPU: no execution)
        policy._diff_fn(ids.shape[1] - 1, 1, use_ddpm=False)
        new_keys = set(policy._jit_cache) - before
        assert len(new_keys) == 1
        assert next(iter(new_keys))[-1] == policy._opts_sig()
    finally:
        policy.compiler_options = None
