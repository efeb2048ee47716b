"""Single-chip TPU smoke + training measurement: real-size train steps.

Validates on actual hardware what the CPU test suite runs in interpret
mode (flash-attention fwd+bwd Mosaic lowering, the fused train step with
remat + optimizer), and is the source of the bench JSON `training` block:
step time (gross AND net of the dev tunnel's per-dispatch RTT), tokens/s,
and training MFU via the shared accounting in
`training/metrics.decoder_flops_per_token` (one source of truth with
scripts/train.py and bench.py).

    python scripts/tpu_smoke.py --model mla-small --batch 8 --steps 6
    python scripts/tpu_smoke.py --model mla-2b --optimizer adafactor --batch 8
    python scripts/tpu_smoke.py --model mla-small --batch 8 --profile

--profile additionally times the loss FORWARD alone and the multimodal
front-end (vision + point tokenizers) alone, decomposing the step into
frontend / decoder-fwd / bwd+optimizer shares — the diagnostic for why a
small decoder's MFU is low (the front-ends are constant-cost per frame and
are NOT in the MFU numerator, by convention).

Timing rules for this box (CLAUDE.md): completion is forced by fetching a
scalar (block_until_ready can return early on the tunnel backend), one
input varies per call (the remote execution layer serves identical
(executable, inputs) pairs from a result cache — the train step is immune
because params change every step, but the fwd-only probes are not), and
the fixed per-dispatch tunnel RTT is measured with a trivial op and
reported separately (a colocated host does not pay it).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mla_tpu_jax_cache_tpu")

# env setdefault alone is DEAD in-process on this box (the axon .pth imports
# jax at interpreter startup, freezing env-derived config defaults) — the
# helper force-enables the cache via jax.config.update. Kept env vars above
# so spawned subprocesses inherit them at startup, where they DO work.
from mla_tpu.utils.compile_cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()


def _measure_rtt(jax, jnp):
    """Fixed per-dispatch tunnel RTT via a trivial op (bench.py method)."""
    import numpy as np

    null_fn = jax.jit(lambda a: (a * 2.0).sum())
    null_in = jnp.zeros((8, 128), jnp.float32)
    float(jax.device_get(null_fn(null_in)))  # compile + warm
    rtts = []
    for i in range(8):
        nv = null_in + jnp.float32(i)
        nv.block_until_ready()
        t0 = time.perf_counter()
        float(jax.device_get(null_fn(nv)))
        rtts.append(time.perf_counter() - t0)
    return float(np.percentile(rtts, 50))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="mla-2b")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--optimizer", default="adamw", choices=["adamw", "adafactor"],
                   help="adafactor (factored second moments) fits mla-2b "
                        "training on the single 16 GB dev chip")
    p.add_argument("--profile", action="store_true",
                   help="also time loss-forward-only and front-end-only "
                        "graphs to decompose the step")
    p.add_argument("--text_len", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mla_tpu.conf.models import get_model_config
    from mla_tpu.diffusion import gaussian as gd
    from mla_tpu.models import mla as mla_mod
    from mla_tpu.models import prismatic
    from mla_tpu.training import metrics as metrics_mod
    from mla_tpu.training import optim, strategy
    from mla_tpu.vla.dummy import synthetic_batch

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    on_tpu = jax.default_backend() == "tpu"
    cfg = get_model_config(args.model)
    t0 = time.time()
    params, mstate = prismatic.mla_model_init(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)
    print(f"init: {time.time() - t0:.1f}s")

    # the MFU numerator is frozen BEFORE training state is built (the train
    # step donates its inputs)
    flops_per_token = metrics_mod.decoder_flops_per_token(
        params["llm_backbone"], cfg.use_diff
    )

    tcfg = strategy.TrainConfig(
        learning_rate=1e-5, grad_accumulation_steps=1, repeated_diffusion_steps=1,
        enable_gradient_checkpointing=True, num_training_steps=10,
    )
    tx, _, _ = optim.make_optimizer(params, learning_rate=1e-5, num_training_steps=10,
                                    optimizer=args.optimizer)
    sched = gd.create_schedule("", diffusion_steps=100)
    step_fn = strategy.make_train_step(cfg, tcfg, tx, sched, mesh=None)

    batch = synthetic_batch(cfg, B=args.batch, L=args.text_len)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    rtt_s = _measure_rtt(jax, jnp) if on_tpu else 0.0
    if on_tpu:
        print(f"dispatch RTT: {rtt_s * 1e3:.1f} ms")

    # --- optional decomposition, BEFORE training consumes params ----------
    profile = {}
    if args.profile:
        def timed(fn, make_args, n=5, warm=1):
            for _ in range(warm):
                float(jax.device_get(fn(*make_args(0))))
            ts = []
            for i in range(n):
                a = make_args(i + 1)
                jax.block_until_ready(a)
                t0 = time.perf_counter()
                float(jax.device_get(fn(*a)))
                ts.append(time.perf_counter() - t0)
            return max(float(np.percentile(ts, 50)) - rtt_s, 0.0)

        # loss forward only (same remat config as the step's fwd pass)
        fwd = jax.jit(lambda p, s, b, r: mla_mod.mla_train_loss(
            p, s, cfg, sched, b, r,
            repeated_diffusion_steps=tcfg.repeated_diffusion_steps,
            remat=tcfg.enable_gradient_checkpointing,
        )[0])
        profile["fwd_ms"] = timed(
            fwd, lambda i: (params, mstate, batch, jax.random.PRNGKey(100 + i))
        ) * 1e3

        # multimodal front-end only (vision + point tokenizers + projectors)
        fe = jax.jit(lambda p, s, im, pc: sum(
            x.astype(jnp.float32).sum()
            for x in jax.tree_util.tree_leaves(prismatic.get_fused_tokens(
                p, s, cfg, im, pc, None, None, training=False
            )["fused"])
        ))
        profile["frontend_ms"] = timed(
            fe,
            lambda i: (params, mstate,
                       {"front_image": batch["images"]["front_image"] + jnp.float32(i) * 1e-6},
                       batch["point_cloud"]),
        ) * 1e3

    state = strategy.init_train_state(params, tx, mstate)
    del params, mstate

    times = []
    for i in range(args.steps):
        t0 = time.time()
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        loss = float(metrics["total_loss"])  # blocks (device_get of a scalar)
        dt = time.time() - t0
        times.append(dt)
        print(f"step {i}: loss={loss:.4f} grad_norm={float(metrics['grad_norm']):.4f} "
              f"({dt:.2f}s)")
        assert loss == loss, "NaN loss"
    print("TRAIN STEP OK")

    if len(times) > 1:
        warm = times[1:]
        # tokens processed per optimizer step: B x seq (text+fused+diff) x
        # repeated_diffusion_steps
        seq = args.text_len + cfg.fused_len + cfg.diff_block_len
        toks = args.batch * seq * tcfg.repeated_diffusion_steps
        p50_gross = sorted(warm)[len(warm) // 2]
        p50 = max(p50_gross - rtt_s, 1e-9)
        mfu = None
        if on_tpu:
            mfu = (toks / p50) * flops_per_token / (
                metrics_mod.TPU_V5E_BF16_PEAK_FLOPS * jax.device_count()
            )
        out = {
            "train_step_p50_s": round(p50, 4),
            "train_step_p50_gross_s": round(p50_gross, 4),
            "dispatch_rtt_ms": round(rtt_s * 1e3, 2),
            "train_tokens_per_sec": round(toks / p50, 1),
            "train_mfu": round(mfu, 4) if mfu is not None else None,
            "model": args.model, "batch": args.batch, "seq": seq,
            "optimizer": args.optimizer, "backend": jax.default_backend(),
            "n_steps_timed": len(warm),
        }
        if profile:
            out.update({k: round(v, 2) for k, v in profile.items()})
            out["bwd_plus_optim_ms"] = round(p50 * 1e3 - profile["fwd_ms"], 2)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
