"""RLBench closed-loop evaluation harness.

Parity target: reference scripts/test_rlbench.py (:55-203) — load policy,
roll out N episodes per task in CoppeliaSim via LIFT3D's RLBenchEnv,
per-step predict_action_diff, success-rate logging, media dumps.

The simulator stack (RLBench/CoppeliaSim/lift3d) is an external GPU-
workstation dependency, exactly as in the reference; this harness gates the
import and keeps the loop logic (episode control, EE-pose conversion hooks,
success accounting, artifact writing) framework-side so a machine with the
simulator can run it unchanged:

    python scripts/eval_rlbench.py --run_dir runs/<id> --task close_box \
        --num_episodes 20 --output_dir eval_out

Without a simulator, --offline_trace <npz> replays recorded observations
through the policy and writes predicted actions (latency + smoke tests).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# 12 tasks from the reference sweep (scripts/test_rlbench.sh)
RLBENCH_TASKS = [
    "close_box", "close_laptop_lid", "toilet_seat_down", "sweep_to_dustpan",
    "close_fridge", "phone_on_base", "take_umbrella_out_of_umbrella_stand",
    "frame_off_hanger", "take_frame_off_hanger", "put_books_on_bookshelf",
    "slide_block_to_target", "unplug_charger",
]


def setup_logging(output_dir: Path) -> logging.Logger:
    output_dir.mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger("eval_rlbench")
    logger.setLevel(logging.INFO)
    for h in (logging.StreamHandler(), logging.FileHandler(output_dir / "eval.log")):
        h.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        logger.addHandler(h)
    return logger


def _write_video(frames, path: Path, fps: int = 10) -> bool:
    """Write an episode rollout video (reference test_rlbench.py:193
    `env.save_video(.../episode{i}_video_steps.mp4)`). Tries cv2's mp4
    writer, then imageio; returns False (and leaves no file) when neither
    backend can encode on this machine."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        return False
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        import cv2

        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if vw.isOpened():
            for f in frames:
                vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            vw.release()
            if path.exists() and path.stat().st_size > 0:
                return True
    except Exception:
        pass
    try:
        import imageio

        imageio.mimsave(str(path), frames, fps=fps)
        return True
    except Exception:
        return False


def _write_frames(frames, frame_dir: Path) -> None:
    """Per-step RGB frame dump (reference `env.save_images(image_dir)`)."""
    from PIL import Image

    frame_dir.mkdir(parents=True, exist_ok=True)
    for j, f in enumerate(frames):
        Image.fromarray(np.asarray(f)).save(frame_dir / f"frame_{j:04d}.png")


def _write_depths(depths, depth_dir: Path) -> None:
    """Per-step depth dump (reference `env.save_depths(depth_dir)`); saved
    lossless as .npy (the reference's lift3d wrapper quantizes to images)."""
    depth_dir.mkdir(parents=True, exist_ok=True)
    for j, d in enumerate(depths):
        np.save(depth_dir / f"depth_{j:04d}.npy", np.asarray(d))


def save_episode_media(out_root: Path, task: str, episode: int, frames, depths,
                       env=None, logger=None) -> None:
    """Reference media layout (scripts/test_rlbench.py:185-196):

        <out>/<task>/videos/episode{i}_video_steps.mp4
        <out>/<task>/images/episode{i}/frame_{j:04d}.png
        <out>/<task>/depths/episode{i}/depth_{j:04d}.npy

    Prefers the env's own cinematic recorder (lift3d VideoWrapper
    save_video/save_images/save_depths) when present — it records
    every sim frame, not just policy steps — else writes the frames
    collected in the eval loop."""
    base = Path(out_root) / task
    video_path = base / "videos" / f"episode{episode}_video_steps.mp4"
    image_dir = base / "images" / f"episode{episode}"
    depth_dir = base / "depths" / f"episode{episode}"
    used_env = False
    if env is not None and hasattr(env, "save_video"):
        try:
            video_path.parent.mkdir(parents=True, exist_ok=True)
            env.save_video(str(video_path))
            if hasattr(env, "save_images"):
                image_dir.mkdir(parents=True, exist_ok=True)
                env.save_images(str(image_dir), quiet=True)
            if hasattr(env, "save_depths"):
                depth_dir.mkdir(parents=True, exist_ok=True)
                env.save_depths(str(depth_dir), quiet=True)
            used_env = True
        except Exception as e:  # recorder broken mid-episode: fall back
            if logger:
                logger.warning(f"env recorder failed ({e}); writing collected frames")
    if not used_env:
        # media dumps are telemetry — a missing codec/PIL or a full disk must
        # never abort the eval sweep and discard completed rollouts
        try:
            if _write_video(frames, video_path) and logger:
                logger.info(f"video saved to {video_path}")
            _write_frames(frames, image_dir)
            if depths:
                _write_depths(depths, depth_dir)
        except Exception as e:
            if logger:
                logger.warning(f"episode media dump failed ({e}); continuing eval")


def load_policy(args):
    from mla_tpu.models.load import load_vla
    from mla_tpu.vla.tokenizer import SimpleTokenizer, load_llama_tokenizer

    tokenizer = (
        load_llama_tokenizer(args.tokenizer) if args.tokenizer else SimpleTokenizer()
    )
    return load_vla(args.run_dir, model_id=args.model, tokenizer=tokenizer)


def run_simulator_eval(args, logger):
    try:
        from lift3d.envs.rlbench_env import RLBenchEnv  # type: ignore
    except ImportError:
        logger.error(
            "RLBench/lift3d not available on this machine. Run on a simulator "
            "workstation (Xvfb + CoppeliaSim), or use --offline_trace."
        )
        return 1

    from mla_tpu.vla.datasets import add_mask_channel, clip_preprocess

    policy = load_policy(args)
    results = {}
    for task in args.tasks:
        env = RLBenchEnv(task_name=task, camera_name=args.camera_name)
        try:
            successes = 0
            for ep in range(args.num_episodes):
                obs = env.reset()
                done, success = False, False
                ep_frames, ep_depths = [], []
                ar_time_sum = diff_time_sum = ar_conf_sum = 0.0
                n_steps = 0
                for step in range(args.max_steps):
                    if args.save_media:
                        ep_frames.append(np.asarray(obs["image"]))
                        if "depth" in obs:
                            ep_depths.append(np.asarray(obs["depth"]))
                    pc = _prep_pc(obs["point_cloud"], policy, args)
                    # simulator frames are raw HWC uint8 at camera resolution:
                    # run the SAME resize+CLIP-normalize+mask prep as training
                    # (the policy's uint8 fast path expects preprocessed CHW)
                    img = add_mask_channel(
                        clip_preprocess(
                            np.asarray(obs["image"]), policy.cfg.vision.image_size
                        )
                    )
                    if args.predict_mode == "diff_ar":
                        # dual-head step (reference test_rlbench.py AR+diff
                        # logging): diffusion chunk executes, AR head runs
                        # for its confidence + timing telemetry
                        out = policy.predict_action_diff_ar(
                            img, pc, obs["instruction"],
                            cur_robot_state=obs.get("robot_state"),
                            unnorm_key=args.unnorm_key,
                            sampler=args.sampler,
                            num_dpm_steps=args.num_dpm_steps,
                        )
                        action_chunk = out["actions"]
                        ar_time_sum += out["timings"][0]
                        diff_time_sum += out["timings"][1]
                        ar_conf_sum += float(np.mean(out["ar_max_probs"]))
                    else:
                        t0 = time.perf_counter()
                        action_chunk = policy.predict_action_diff(
                            image=img,
                            pointcloud=pc,
                            instruction=obs["instruction"],
                            cur_robot_state=obs.get("robot_state"),
                            unnorm_key=args.unnorm_key,
                            sampler=args.sampler,
                            num_dpm_steps=args.num_dpm_steps,
                        )
                        diff_time_sum += time.perf_counter() - t0
                    n_steps += 1
                    # execute the first action of the chunk (closed loop)
                    obs, reward, done, info = env.step(action_chunk[0])
                    if done:
                        success = bool(info.get("success", reward > 0))
                        break
                successes += int(success)
                if n_steps:
                    # per-episode telemetry, reference test_rlbench.py:178-181
                    if args.predict_mode == "diff_ar":
                        logger.info(f"average ar_sum = {ar_conf_sum / n_steps:.6f}")
                        logger.info(f"average ar infer time = {ar_time_sum / n_steps:.6f}")
                    logger.info(f"average diff infer time = {diff_time_sum / n_steps:.6f}")
                if args.save_media:
                    save_episode_media(
                        Path(args.output_dir), task, ep, ep_frames, ep_depths,
                        env=env, logger=logger,
                    )
                logger.info(f"[{task}] episode {ep}: success={success}")
            rate = successes / args.num_episodes
            results[task] = rate
            logger.info(f"[{task}] success rate: {rate:.3f}")
        finally:
            # PyRep/CoppeliaSim requires an explicit teardown before the next
            # task's env launch (leaked sims break or OOM multi-task sweeps)
            for closer in ("shutdown", "close"):
                if hasattr(env, closer):
                    try:
                        getattr(env, closer)()
                    except Exception:
                        pass
                    break
        (Path(args.output_dir) / f"{task}_success_rate.txt").write_text(f"{rate:.4f}\n")
    (Path(args.output_dir) / "results.json").write_text(json.dumps(results, indent=2))
    return 0


def _prep_pc(pc, policy, args):
    """Raw sensor cloud -> exactly cfg.point.input_points points (voxel
    subsample + exact-count adjust); no-op when the cloud already matches."""
    pc = np.asarray(pc, np.float32)
    target = policy.cfg.point.input_points
    if pc.ndim == 2 and (pc.shape[0] != target or args.voxel_cell is not None):
        from mla_tpu.native.pointops_host import prepare_pointcloud

        pc = prepare_pointcloud(pc, target, cell=args.voxel_cell)
    return pc


def run_offline_trace(args, logger):
    policy = load_policy(args)
    trace = np.load(args.offline_trace, allow_pickle=True)
    images = trace["images"]  # [N, H, W, 3] uint8
    pointclouds = trace["point_clouds"]  # [N, P, 3]
    instruction = str(trace["instruction"]) if "instruction" in trace else "close the box"

    from mla_tpu.vla.datasets import add_mask_channel, clip_preprocess

    latencies, actions = [], []
    for i in range(len(images)):
        img = add_mask_channel(clip_preprocess(images[i], policy.cfg.vision.image_size))
        t0 = time.perf_counter()
        act = policy.predict_action_diff(
            img, _prep_pc(pointclouds[i], policy, args), instruction,
            unnorm_key=args.unnorm_key, sampler=args.sampler,
            num_dpm_steps=args.num_dpm_steps,
        )
        latencies.append(time.perf_counter() - t0)
        actions.append(act)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    np.savez(out / "predicted_actions.npz", actions=np.stack(actions), latencies=np.asarray(latencies))
    if args.save_media:
        # replay media parity: the trace's raw frames as episode0 video +
        # frame strip (no sim, so no depth unless the trace recorded one)
        depths = list(trace["depths"]) if "depths" in trace.files else []
        save_episode_media(out, "offline", 0, list(images), depths, logger=logger)
    warm = latencies[1:] if len(latencies) > 1 else latencies  # drop compile step
    logger.info(
        f"offline trace: {len(images)} steps, p50 latency "
        f"{np.percentile(warm, 50) * 1e3:.1f} ms"
    )
    return 0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--model", default="mla-7b")
    p.add_argument("--tokenizer", default=None, help="HF tokenizer path")
    p.add_argument("--tasks", nargs="+", default=["close_box"], choices=RLBENCH_TASKS + ["all"])
    p.add_argument("--num_episodes", type=int, default=20)
    p.add_argument("--max_steps", type=int, default=200)
    p.add_argument("--camera_name", default="rlbench_front")
    p.add_argument("--unnorm_key", default=None)
    p.add_argument("--output_dir", default="eval_out")
    p.add_argument("--offline_trace", default=None)
    p.add_argument(
        "--sampler", default="ddim", choices=["ddim", "dpm"],
        help="dpm = DPM-Solver++(2M), half the denoise cost of DDIM-8 at "
             "better ODE accuracy (beyond-parity serving mode)",
    )
    p.add_argument("--num_dpm_steps", type=int, default=4)
    p.add_argument(
        "--predict_mode", default="diff", choices=["diff", "diff_ar"],
        help="diff = diffusion chunk only (reference default); diff_ar = "
             "dual-head step with AR confidence + per-phase timing telemetry "
             "(reference test_rlbench.py ar_sum / ar infer time logging)",
    )
    p.add_argument(
        "--save_media", action=argparse.BooleanOptionalAction, default=True,
        help="per-episode video/frame/depth dumps under <output_dir>/<task>/ "
             "(reference test_rlbench.py:185-196 layout)",
    )
    p.add_argument(
        "--voxel_cell", type=float, default=None,
        help="voxel-grid cell size (m) for raw-cloud preprocessing; clouds "
             "are then sampled to the model's input_points (the reference's "
             "dormant grid_subsampling C++ made active, csrc/pointops_host.cpp)",
    )
    args = p.parse_args(argv)
    if "all" in args.tasks:
        # expand wherever it appears — 'all' mixed with explicit tasks would
        # otherwise reach RLBenchEnv as a literal task name after minutes of
        # policy loading
        expanded = [t for t in args.tasks if t != "all"]
        args.tasks = expanded + [t for t in RLBENCH_TASKS if t not in expanded]

    logger = setup_logging(Path(args.output_dir))
    if args.offline_trace:
        return run_offline_trace(args, logger)
    return run_simulator_eval(args, logger)


if __name__ == "__main__":
    sys.exit(main())
