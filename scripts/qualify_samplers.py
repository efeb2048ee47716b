"""Qualify DPM-Solver++(2M) against DDIM on the REAL composed model
(VERDICT r2 #2).

The serving question: is `sampler='dpm', num_dpm_steps=4` (4 model evals,
~2x DDIM-8's throughput) at least as faithful to the diffusion process as
the reference-exact DDIM-8 path?  The fidelity yardstick is DDIM-100 — the
full 100-step respacing of the same schedule (reference
gaussian_diffusion.py:608-681 semantics) — run on the SAME weights, SAME
observations, SAME initial noise.

A FRESH model is no testbed: the reference zero-initializes the eps head
(prismatic.py:320-321, every sampler trivially agrees on eps==0), and a
RANDOM head gives a non-diffusion eps field whose DDIM trajectories diverge
geometrically (measured: DDIM-50 still ~97% away from DDIM-100, raw sample
rms ~2e3 — the landscape is chaotic and sampler deltas are noise).  So this
script first TRAINS the model on the real diffusion objective
(--train_steps of the production train step on synthetic batches) until the
eps head predicts a consistent noise field; then sample magnitudes stay
O(1), DDIM converges with step count, and sampler fidelity is meaningful.
Several independent weight seeds guard against a lucky landscape.

Metrics are computed on the RAW normalized chunk (`return_normalized=True`,
the space the samplers integrate in, BEFORE the [-1,1] clip that saturates
untrained-model outputs and would mask sampler differences):
  * rms / max abs delta vs DDIM-100 over the continuous dims
  * gripper agreement (the post-processed, binarized last dim) vs DDIM-100

Usage:
  python scripts/qualify_samplers.py                     # mla-tiny, CPU ok
  python scripts/qualify_samplers.py --trace obs.npz     # real observations
  python scripts/qualify_samplers.py --compare_int8      # + W8A8 fidelity

7B-scale runs need a multi-chip mesh or --train_steps 0 with already-
trained weights: the default training phase holds bf16 params + fp32 Adam
state, which does not fit the single 16 GB dev chip at 7B (no trained 7B
checkpoint exists in this environment; see PARITY.md known gaps).

Emits one JSON line per (sampler, aggregate) and a summary table; the
headline numbers are recorded in docs/kernels.md.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def trained_model(model_id: str, weight_seed: int, train_steps: int = 0,
                  optimizer: str = "adamw"):
    import jax

    from mla_tpu.conf.models import get_model_config
    from mla_tpu.models import prismatic

    cfg = get_model_config(model_id.removesuffix("-int8"), use_contrastive=False)
    params, state = prismatic.mla_model_init(jax.random.PRNGKey(weight_seed), cfg)
    if train_steps:
        params, state = _train(params, state, cfg, train_steps, weight_seed,
                               optimizer=optimizer)
    return params, state, cfg


def make_policy(params, state, cfg, quantize: bool = False, scores_dtype=None):
    """Qualification policies PIN the prefill-scores dtype (default
    fp32-exact) rather than inheriting the ambient MLA_PREFILL_SCORES env —
    otherwise running this under the published serving env would compare
    bf16 against itself and vacuously 'qualify' the exact lever the
    --compare_bf16s flag exists to measure."""
    from mla_tpu.models.mla import MLAPolicy
    from mla_tpu.vla.tokenizer import SimpleTokenizer

    if quantize:
        from mla_tpu.ops.quantization import quantize_llama

        params = {**params, "llm_backbone": quantize_llama(params["llm_backbone"])}
    stats = {"qualify": {
        "action": {"q01": [-1.0] * cfg.action_dim, "q99": [1.0] * cfg.action_dim},
        "proprio": {"q01": [-1.0] * cfg.action_dim, "q99": [1.0] * cfg.action_dim},
    }}
    return MLAPolicy(params, state, cfg, tokenizer=SimpleTokenizer(),
                     norm_stats=stats, prefill_scores_dtype=scores_dtype)


def build_policy(model_id: str, weight_seed: int, train_steps: int = 0,
                 optimizer: str = "adamw"):
    params, state, cfg = trained_model(model_id, weight_seed, train_steps,
                                       optimizer=optimizer)
    return make_policy(params, state, cfg, quantize=model_id.endswith("-int8"))


def _train(params, mstate, cfg, steps: int, seed: int, optimizer: str = "adamw"):
    """Run the production train step on synthetic batches until the eps
    head predicts a consistent noise field (loss ~ the 1.0 floor)."""
    import jax
    import jax.numpy as jnp

    from mla_tpu.diffusion import gaussian as gd
    from mla_tpu.parallel import make_mesh, shard_batch
    from mla_tpu.training import optim, strategy
    from mla_tpu.vla.dummy import synthetic_batch

    sched = gd.create_schedule("", diffusion_steps=100)
    tcfg = strategy.TrainConfig(
        learning_rate=1e-3, grad_accumulation_steps=1, repeated_diffusion_steps=1,
        enable_gradient_checkpointing=False, num_training_steps=steps,
    )
    # adafactor is the scale-ladder rung for the large models: fp32 Adam
    # moments at mla-2b (~15 GB over 1.9B trainable params) do not fit the
    # 16 GB dev chip beside the bf16 params; factored second moments do.
    tx, _, _ = optim.make_optimizer(
        params, learning_rate=1e-3, num_training_steps=steps, optimizer=optimizer,
    )
    mesh = make_mesh()
    state = strategy.shard_train_state(strategy.init_train_state(params, tx, mstate), mesh)
    step_fn = strategy.make_train_step(cfg, tcfg, tx, sched, mesh)
    B = max(len(jax.devices()), 2)
    for i in range(steps):
        batch = jax.tree_util.tree_map(
            jnp.asarray, synthetic_batch(cfg, B=B, L=16, seed=seed * 10_000 + i, training=True)
        )
        state, metrics = step_fn(state, shard_batch(batch, mesh), jax.random.PRNGKey(i))
        if i % 25 == 0 or i == steps - 1:
            print(f"  train[{i}] loss {float(metrics['total_loss']):.4f}", file=sys.stderr)
    # the train step donates its inputs — hand back fresh host copies of
    # both params and model_state (the originals' buffers are deleted)
    return jax.device_get(state["params"]), jax.device_get(state["model_state"])


def make_scenarios(policy, n: int, trace_path: str | None):
    """(image, pointcloud, proprio) observation tuples — seeded synthetic,
    or real recorded observations via --trace (eval_rlbench npz schema)."""
    from mla_tpu.vla.datasets import add_mask_channel, clip_preprocess

    cfg = policy.cfg
    out = []
    if trace_path:
        trace = np.load(trace_path, allow_pickle=True)
        for i in range(min(n, len(trace["images"]))):
            img = add_mask_channel(clip_preprocess(trace["images"][i], cfg.vision.image_size))
            out.append((img, np.asarray(trace["point_clouds"][i], np.float32), None))
        return out
    for i in range(n):
        rng = np.random.default_rng(7000 + i)
        raw = rng.integers(0, 255, (cfg.vision.image_size, cfg.vision.image_size, 3), np.uint8)
        img = add_mask_channel(clip_preprocess(raw, cfg.vision.image_size))
        pc = rng.normal(size=(cfg.point.input_points, 3)).astype(np.float32)
        proprio = rng.uniform(-0.8, 0.8, cfg.action_dim).astype(np.float32)
        out.append((img, pc, proprio))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="mla-small")
    p.add_argument("--scenarios", type=int, default=6)
    p.add_argument("--weight_seeds", type=int, nargs="+", default=[0, 1])
    p.add_argument("--trace", default=None, help="npz with images/point_clouds")
    p.add_argument("--train_steps", type=int, default=120,
                   help="diffusion-objective train steps before measuring")
    p.add_argument("--optimizer", default="adamw", choices=["adamw", "adafactor"],
                   help="adafactor fits the mla-2b rung on one 16 GB chip")
    p.add_argument("--compare_int8", action="store_true",
                   help="also measure W8A8-int8 vs bf16 serving fidelity "
                        "(same trained weights, same noise, DDIM-8)")
    p.add_argument("--compare_bf16s", action="store_true",
                   help="also measure bf16-prefill-scores vs fp32-scores "
                        "serving fidelity (the prefill bandwidth lever, "
                        "models/mla.py serving_scores_dtype_from_env)")
    p.add_argument("--out", default=None, help="write full JSON here")
    p.add_argument("--samplers", nargs="+", default=None,
                   help="subset of candidate samplers to run (each distinct "
                        "step count is a separate compile — the mla-2b "
                        "scale-ladder rung runs just ddim8+dpm4)")
    args = p.parse_args(argv)

    candidates = [
        ("ddim8", dict(num_ddim_steps=8)),
        ("ddim4", dict(num_ddim_steps=4)),              # DDIM at DPM-4's cost
        ("dpm2", dict(sampler="dpm", num_dpm_steps=2)),  # floor probe
        ("dpm3", dict(sampler="dpm", num_dpm_steps=3)),  # below-DPM-4 probe
        ("dpm4", dict(sampler="dpm", num_dpm_steps=4)),
        ("dpm6", dict(sampler="dpm", num_dpm_steps=6)),
    ]
    if args.samplers:
        unknown = set(args.samplers) - {n for n, _ in candidates}
        if unknown:
            p.error(f"unknown samplers: {sorted(unknown)}")
        candidates = [(n, kw) for n, kw in candidates if n in args.samplers]
    deltas = {name: [] for name, _ in candidates}
    grip = {name: [] for name, _ in candidates}

    int8_deltas, int8_grip = [], []
    bf16s_deltas, bf16s_grip = [], []
    for wseed in args.weight_seeds:
        tparams, tstate, tcfg = trained_model(args.model, wseed, args.train_steps,
                                              optimizer=args.optimizer)
        policy = make_policy(tparams, tstate, tcfg,
                             quantize=args.model.endswith("-int8"))
        int8_policy = (
            make_policy(tparams, tstate, tcfg, quantize=True)
            if args.compare_int8 and not args.model.endswith("-int8")
            else None
        )
        bf16s_policy = None
        if args.compare_bf16s:
            import jax.numpy as jnp

            bf16s_policy = make_policy(tparams, tstate, tcfg,
                                       quantize=args.model.endswith("-int8"),
                                       scores_dtype=jnp.bfloat16)
        scenarios = make_scenarios(policy, args.scenarios, args.trace)
        for si, (img, pc, proprio) in enumerate(scenarios):
            noise = np.random.default_rng(9000 + si).normal(
                size=(policy.cfg.action_horizon, policy.cfg.action_dim)
            ).astype(np.float32)
            common = dict(
                cur_robot_state=proprio, unnorm_key="qualify", noise=noise,
                instruction="close the jar", return_normalized=True,
            )
            from mla_tpu.models.mla import unnormalize_actions

            stats = policy.get_action_stats("qualify")
            ref = policy.predict_action_diff(img, pc, num_ddim_steps=100, **common)
            ref_post = unnormalize_actions(ref, stats)
            ref_scale = max(float(np.sqrt(np.mean(ref[:, :-1] ** 2))), 1e-9)
            for name, kw in candidates:
                a = policy.predict_action_diff(img, pc, **common, **kw)
                deltas[name].append(np.abs(a[:, :-1] - ref[:, :-1]) / ref_scale)
                a_post = unnormalize_actions(a, stats)
                grip[name].append(np.mean(a_post[:, -1] == ref_post[:, -1]))

            if int8_policy is not None:
                # serving-quantization fidelity: W8A8 int8 vs bf16 on the
                # SAME weights / observations / noise, reference-exact
                # DDIM-8 on both sides, normalized-chunk space
                a16 = policy.predict_action_diff(img, pc, num_ddim_steps=8, **common)
                a8 = int8_policy.predict_action_diff(img, pc, num_ddim_steps=8, **common)
                scale16 = max(float(np.sqrt(np.mean(a16[:, :-1] ** 2))), 1e-9)
                int8_deltas.append(np.abs(a8[:, :-1] - a16[:, :-1]) / scale16)
                int8_grip.append(np.mean(
                    unnormalize_actions(a8, stats)[:, -1]
                    == unnormalize_actions(a16, stats)[:, -1]
                ))

            if bf16s_policy is not None:
                # prefill-score-dtype fidelity: bf16 scores vs fp32 scores,
                # same weights / observations / noise, reference-exact DDIM-8
                a32 = policy.predict_action_diff(img, pc, num_ddim_steps=8, **common)
                ab = bf16s_policy.predict_action_diff(img, pc, num_ddim_steps=8, **common)
                s32 = max(float(np.sqrt(np.mean(a32[:, :-1] ** 2))), 1e-9)
                bf16s_deltas.append(np.abs(ab[:, :-1] - a32[:, :-1]) / s32)
                bf16s_grip.append(np.mean(
                    unnormalize_actions(ab, stats)[:, -1]
                    == unnormalize_actions(a32, stats)[:, -1]
                ))

    summary = {}
    for name, _ in candidates:
        d = np.stack(deltas[name])
        summary[name] = {
            # relative to the DDIM-100 chunk's own rms (scale-free)
            "rel_rms_vs_ddim100": float(np.sqrt(np.mean(d**2))),
            "rel_max_vs_ddim100": float(d.max()),
            "gripper_agree": float(np.mean(grip[name])),
        }
    result = {
        "model": args.model, "scenarios": args.scenarios,
        "weight_seeds": args.weight_seeds, "trace": bool(args.trace),
        "train_steps": args.train_steps, "optimizer": args.optimizer,
        "samplers": summary,
    }
    if "dpm4" in summary and "ddim8" in summary:
        result["dpm4_vs_ddim8_rms_ratio"] = summary["dpm4"]["rel_rms_vs_ddim100"] / max(
            summary["ddim8"]["rel_rms_vs_ddim100"], 1e-12
        )
    if int8_deltas:
        d = np.stack(int8_deltas)
        result["int8_vs_bf16"] = {
            "rel_rms": float(np.sqrt(np.mean(d**2))),
            "rel_max": float(d.max()),
            "gripper_agree": float(np.mean(int8_grip)),
        }
    if bf16s_deltas:
        d = np.stack(bf16s_deltas)
        result["bf16_scores_vs_fp32"] = {
            "rel_rms": float(np.sqrt(np.mean(d**2))),
            "rel_max": float(d.max()),
            "gripper_agree": float(np.mean(bf16s_grip)),
        }
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
